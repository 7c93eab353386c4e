"""Query plans: the reference's documented corpus + pushdown planning."""
