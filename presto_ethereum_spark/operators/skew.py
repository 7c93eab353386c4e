"""Skew-resilient aggregation: explicit two-phase (salted) groupBy.

AQE's skew-join splitting handles *join* skew at runtime; for *aggregation*
hot keys (a handful of keys carrying most of 100 TB) the classic fix is to
salt: pre-aggregate on (key, salt) so every reducer sees at most
1/``salt_buckets`` of a hot key's rows, then combine the partials on the key
alone.  Spark's hash aggregate already does map-side partials per task; the
explicit salt additionally bounds the *reduce-side* partition of a hot key,
which matters when one key exceeds a single executor's memory.

Both phases are algebraic (sum/count/min/max), so the composition is exactly
equal to the unsalted groupBy — asserted by the DuckDB oracle in
plans/battery.py (eth/rel query `rel_salted_agg`) and by tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "skew_report"]

# (partial expr builder, final combiner) per supported algebraic aggregate
_ALGEBRAIC = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str | Column, str]],
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation over possibly-skewed ``keys``.

    ``aggs`` is a list of (fn, column, alias) with fn in sum/count/min/max.
    ``salt_on`` names a column whose hash spreads a hot key's rows across
    ``salt_buckets`` partial groups (defaults to a row-random-free,
    deterministic spread via the whole row's first agg column).

    Equivalent to ``df.groupBy(keys).agg(...)`` for algebraic aggregates —
    the point is the *shuffle shape*: phase 1 exchanges (keys, salt) with at
    most 1/salt_buckets of any key per reducer; phase 2 exchanges the tiny
    partial table.
    """
    for fn, _, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {fn!r}; use groupBy directly")
    spread_col = salt_on or str(aggs[0][1])
    salt = F.pmod(F.hash(F.col(spread_col)), F.lit(salt_buckets)).alias("_salt")

    partial_exprs = [
        _ALGEBRAIC[fn][0](col).alias(f"_p{i}") for i, (fn, col, _) in enumerate(aggs)
    ]
    partial = df.groupBy(*keys, salt).agg(*partial_exprs)

    final_exprs = [
        _ALGEBRAIC[fn][1](F.col(f"_p{i}")).alias(alias)
        for i, (fn, _, alias) in enumerate(aggs)
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    spread_on: str | None = None,
) -> DataFrame:
    """Inner equi-join with explicit key salting for hot join keys.

    The left (large, skewed) side gets a deterministic salt in
    ``[0, salt_buckets)`` hashed from ``spread_on`` (default: all left
    columns); the right side is replicated once per salt value.  The join
    key becomes (on, salt), so a hot key's rows spread across
    ``salt_buckets`` reducers instead of landing on one.  Result is
    row-for-row equal to ``left.join(right, on)`` — each left row matches
    exactly the one replica carrying its salt.

    AQE's skew-join split covers most cases at runtime; the explicit form
    is for when skew is KNOWN and extreme (one key > executor memory), when
    AQE is unavailable (streaming joins), or when the downstream stage must
    inherit the finer partitioning.  Cost: right side is shuffled
    ``salt_buckets``x — size the bucket count to the skew ratio, not above
    it."""
    spread = [F.col(c) for c in ([spread_on] if spread_on else left.columns)]
    l_s = left.withColumn("_salt", F.pmod(F.hash(*spread), F.lit(salt_buckets)))
    r_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return l_s.join(r_s, [on, "_salt"], "inner").drop("_salt")


def skew_report(df: DataFrame, key: str, top_k: int = 5) -> DataFrame:
    """Join/aggregation key-skew diagnosis — the measurement that decides
    whether :func:`salted_agg` / :func:`salted_join` (or AQE skew split)
    is worth its overhead: ONE row with the key-frequency distribution
    shape plus the top offenders.

    ``(n_rows, n_keys, max_freq, avg_freq_x100, skew_factor_x100,
    top_keys)`` — ``skew_factor`` = max/avg frequency (1.0 = perfectly
    uniform; a 1000x factor means one reducer gets 1000x the average
    partition's work).  Ratios ride as integer-x100 (exact under any
    partitioning); ``top_keys`` lists the ``top_k`` hottest keys in
    (freq desc, key) order.

    Two aggregations over the key-count table (itself one map-side
    combined shuffle); the report is one row at any scale."""
    counts = df.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count("*").alias("freq")
    )
    top = (
        counts.orderBy(F.col("freq").desc(), "k")
        .limit(top_k)
        .agg(F.collect_list("k").alias("top_keys"))
    )
    return (
        counts.agg(
            F.sum("freq").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.max("freq").alias("max_freq"),
        )
        .crossJoin(F.broadcast(top))
        .select(
            "n_rows",
            "n_keys",
            "max_freq",
            F.expr("(100 * n_rows) DIV n_keys").alias("avg_freq_x100"),
            F.expr("(100 * max_freq * n_keys) DIV n_rows").alias(
                "skew_factor_x100"
            ),
            "top_keys",
        )
    )
