"""Data sources: fixture-backed chain snapshot and live JSON-RPC."""
