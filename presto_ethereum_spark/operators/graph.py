"""Graph operators over transfer/interaction edge lists.

The chain tables induce natural graphs (tx_from -> tx_to, erc20_from ->
erc20_to); these operators answer "which addresses matter" questions the
reference's SQL corpus gestures at but cannot express without iteration.

Determinism contract: iterative fp aggregation is order-dependent, so
per-edge contributions are quantized to fixed-point integers
(``floor(x * SCALE)``) before summation — integer sums are exact under any
partitioning/accumulation order, and an independent engine (the DuckDB
oracle) reproduces the doubles bit-for-bit.  SCALE=1e15 keeps ~8
significant digits for rank-magnitude values while bounding any node's
in-sum below 2^63 (max in-degree x 1e15 << 9.2e18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pagerank"]

FIXED_POINT_SCALE = 1_000_000_000_000_000.0  # 1e15


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    cache: bool = True,
) -> DataFrame:
    """Simplified PageRank (dangling mass dropped, fixed iteration count)
    over a distinct edge list: ``rank(v) = (1-d)/N + d * sum_in
    rank(u)/outdeg(u)``.

    Scale: per iteration, ONE shuffle — contributions grouped by dst (the
    ranks->edges join broadcasts when the active-source set is small, as in
    sender-skewed transfer graphs; otherwise both sides hash-partition on
    the address and the partitioning is reused across iterations).  The
    node set, edge list, and out-degrees are loop invariants.  Iterations
    are a fixed small count (the training-pipeline "importance score" use
    case), so lineage depth stays bounded without checkpointing.

    ``cache`` persists the two loop invariants (degree-annotated edge list,
    node set) so each iteration reuses them instead of replaying the
    scan + distinct per iteration — the standard iterative-graph trade
    (GraphX does the same); pass False where the edge list is too large to
    persist and a re-scan per iteration is cheaper than the spill.

    Out-degree is folded onto the edge list ONCE with a window count over
    ``src`` (no separate outdeg join inside the loop) — at any scale that
    drops one join stage per iteration with identical values (integer
    quantization makes the sum order-free).

    Setup: dedup is a two-phase aggregate (map-side combine shrinks the raw
    edge stream before its (src,dst) shuffle — the property that matters at
    100 TB where the duplicate rate is high), then the degree window
    re-clusters the much smaller distinct list by ``src``; ``nodes`` is
    derived from the persisted edge list instead of re-running the upstream
    scan (which, for chain tables, is a full decode pass)."""
    e_deg = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
    )
    if cache:
        e_deg = e_deg.persist()
    nodes = (
        e_deg.select(F.col("src").alias("addr"))
        .union(e_deg.select(F.col("dst").alias("addr")))
        .distinct()
    )
    if cache:
        nodes = nodes.persist()
    tot = nodes.agg(F.count("*").alias("n"))
    # (1.0 - damping) evaluated in Python fp64 == the same expression in the
    # oracle SQL — keep the *expression*, not a pre-simplified constant
    q = 1.0 - damping

    def _quant(rank_col):
        return F.floor(rank_col / F.col("deg") * F.lit(FIXED_POINT_SCALE)).alias("c")

    # rank(v) from the previous iteration's in-sums (NULL s == no in-edges);
    # bit-identical to materializing a rank column first: same fp64 ops in
    # the same order, so the oracle's unrolled-CTE doubles match exactly.
    rank_from_s = F.lit(q) / F.col("n") + F.lit(damping) * (
        F.coalesce(F.col("s"), F.lit(0)).cast("double") / F.lit(FIXED_POINT_SCALE)
    )

    if iterations <= 0:
        return nodes.crossJoin(F.broadcast(tot)).select(
            "addr", (F.lit(1.0) / F.col("n")).alias("rank")
        )

    # Per-iteration work is join + grouped-sum ONLY: a contribution needs
    # rank(src), and rank(src) is fully determined by src's previous in-sum
    # (coalesced to 0), so the nodes-side left join never has to run inside
    # the loop — only once at the end to restore sink-only nodes.  That is
    # one fewer sequential stage per iteration at any scale.
    sums = (
        e_deg.crossJoin(F.broadcast(tot))
        .select(F.col("dst").alias("addr"), _quant(F.lit(1.0) / F.col("n")))
        .groupBy("addr")
        .agg(F.sum("c").alias("s"))
    )
    for _ in range(iterations - 1):
        sums = (
            e_deg.join(sums, e_deg["src"] == sums["addr"], "left")
            .crossJoin(F.broadcast(tot))
            .select(F.col("dst").alias("addr"), _quant(rank_from_s))
            .groupBy("addr")
            .agg(F.sum("c").alias("s"))
        )
    return (
        nodes.join(sums, "addr", "left")
        .crossJoin(F.broadcast(tot))
        .select("addr", rank_from_s.alias("rank"))
    )
