"""The reference's documented query corpus, Spark-first.

Sources: /root/reference/use-cases.sql:4-42 and README.md:116-127 — the
de-facto acceptance suite of the reference (it ships no tests).

Each query comes in two shapes:

- ``*_literal``: the reference SQL translated 1:1 (self-joins and all) —
  used for golden-output parity;
- the default (idiomatic) shape: the plan you'd actually want on a cluster —
  e.g. the inter-block delta self-join becomes ``lag() OVER (ORDER BY
  block_number)``, halving the scan count and removing a shuffle join.

Scale note: the reference queries impose a GLOBAL ordering (deltas over the
whole chain, ntile over all rows).  A truly global window cannot be
parallelized without a range-partitioned two-pass plan; for the documented
block ranges (<=100k rows) a single-partition window is correct and cheap.
For chain-scale variants use ``block_time_deltas_scalable`` which
range-partitions by block bucket and computes the cross-boundary delta via a
shifted join of bucket-edge rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def block_time_deltas(block: DataFrame, lo: int = 1, hi: int = 50) -> DataFrame:
    """use-cases.sql:4-15 — per-block time delta, idiomatic: one scan + lead.

    Output matches the reference exactly: (bn, delta) for bn in [lo, hi]
    with delta = timestamp(bn+1) - timestamp(bn) (the reference's ``b`` is
    the next block re-keyed by ``block_number - 1`` and the output column is
    the joined key ``b.bn``).  The self-join becomes a single-scan window.
    """
    w = Window.orderBy("block_number")
    return (
        block.where(F.col("block_number").between(lo, hi + 1))
        .select("block_number", "block_timestamp")
        .withColumn("delta", F.lead("block_timestamp").over(w) - F.col("block_timestamp"))
        .where(F.col("block_number").between(lo, hi) & F.col("delta").isNotNull())
        .select(F.col("block_number").alias("bn"), "delta")
        .orderBy("bn")
    )


def block_time_deltas_literal(block: DataFrame, lo: int = 1, hi: int = 50) -> DataFrame:
    """use-cases.sql:4-15 translated 1:1 (self-join of shifted ranges)."""
    a = (
        block.where((F.col("block_number") >= lo) & (F.col("block_number") <= hi))
        .select(F.col("block_number").alias("bn"), "block_timestamp")
    )
    b = (
        block.where((F.col("block_number") >= lo + 1) & (F.col("block_number") <= hi + 1))
        .select((F.col("block_number") - 1).alias("bn"), F.col("block_timestamp").alias("ts_b"))
    )
    return (
        a.join(b, "bn")
        .select("bn", (F.col("ts_b") - F.col("block_timestamp")).alias("delta"))
        .orderBy("bn")
    )


def avg_block_time_by_chunk(
    block: DataFrame, lo: int = 1, hi: int = 10000, chunk_size: int = 200
) -> DataFrame:
    """use-cases.sql:17-34 — ntile-bucketed average block time.

    CTE X = deltas over [lo, hi]; ntile(n_chunks) over bn; per-chunk
    (min(bn) AS chunkstart, avg(delta) AS avg_delta) ordered by chunkstart.
    """
    n_chunks = max(1, (hi - lo + 1) // chunk_size)
    deltas = block_time_deltas(block, lo, hi)  # bn in [lo, hi]
    w = Window.orderBy("bn")
    return (
        deltas.withColumn("chunk", F.ntile(n_chunks).over(w))
        .groupBy("chunk")
        .agg(F.min("bn").alias("chunkstart"), F.avg("delta").alias("avg_delta"))
        .select("chunkstart", "avg_delta")
        .orderBy("chunkstart")
    )


def top_miners(block: DataFrame, max_block: int = 100000, k: int = 15) -> DataFrame:
    """use-cases.sql:36-42 — biggest miners: count + share, top-k.

    Spark plans this as partial-agg -> shuffle by miner -> final agg ->
    TakeOrderedAndProject: no global sort materialization.  Secondary sort on
    miner makes the top-k deterministic under count ties.
    """
    return (
        block.where(F.col("block_number") <= max_block)
        .groupBy("block_miner")
        .agg(F.count("*").alias("num"))
        .withColumn("percent", F.col("num") / float(max_block))
        .orderBy(F.desc("num"), "block_miner")
        .limit(k)
    )


def erc20_token_movement(erc20: DataFrame, lo: int, hi: int) -> DataFrame:
    """README.md:123-127 — SUM(erc20_value) per token over a block range."""
    return (
        erc20.where(F.col("erc20_blocknumber").between(lo, hi))
        .groupBy("erc20_token")
        .agg(F.sum("erc20_value").alias("total_value"))
        .orderBy("erc20_token")
    )


def block_time_deltas_scalable(block: DataFrame, bucket_size: int = 1_000_000) -> DataFrame:
    """Chain-scale variant of the delta query: window partitioned by block
    bucket (parallel), with cross-boundary deltas recovered by joining each
    bucket's first row against the previous bucket's last block — O(#buckets)
    extra rows instead of a single-partition global window."""
    bucketed = block.select(
        "block_number",
        "block_timestamp",
        (F.col("block_number") / bucket_size).cast("long").alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("block_number")
    intra = bucketed.withColumn(
        "delta", F.col("block_timestamp") - F.lag("block_timestamp").over(w)
    )
    # boundary rows: first block of each bucket joins the previous block.
    firsts = intra.where(F.col("delta").isNull() & (F.col("block_number") > 1))
    prev = bucketed.select(
        (F.col("block_number") + 1).alias("block_number"),
        F.col("block_timestamp").alias("prev_ts"),
    )
    fixed = (
        firsts.join(prev, "block_number")
        .select(
            "block_number",
            "block_timestamp",
            "bucket",
            (F.col("block_timestamp") - F.col("prev_ts")).alias("delta"),
        )
    )
    return (
        intra.where(F.col("delta").isNotNull())
        .select("block_number", "block_timestamp", "bucket", "delta")
        .unionByName(fixed)
        .select(F.col("block_number").alias("bn"), "delta")
    )
