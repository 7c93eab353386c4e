"""Deterministic hash-based sampling and dataset splitting.

Training pipelines need reproducible train/val/test assignment and
stratified subsampling that survive re-runs, repartitioning, and engine
changes.  ``rand()``-based sampling fails all three (seeded RNG is tied to
partition layout), so everything here keys off a **content hash**:

    bucket(row) = int(md5(salt || key)[:8 hex], 16) % buckets

- pure map-side column expression — zero shuffle, trivially parallel at any
  scale, and the same row lands in the same split on 1 or 1000 executors;
- ``salt`` versions the assignment: bump it to draw a fresh split without
  touching the data;
- md5 is available in every engine (Spark, DuckDB, Presto, Python), so an
  independent oracle can replay the assignment exactly — sampling becomes a
  *graded* operator rather than an article of faith.

``stratified_take`` adds per-stratum top-n selection in hash order: a
window row_number per stratum, which Spark executes with WindowGroupLimit
(partial top-n per map task before the one shuffle on the stratum key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "split_assign",
    "stratified_take",
    "cap_by_budget",
    "pack_sequences",
    "weighted_sample",
    "curriculum_interleave",
]


def hash_bucket(key: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, buckets)`` from md5 of the key.

    The first 8 hex chars (32 bits) go through ``conv`` (fits in its 64-bit
    range) — uniform enough for split assignment and far below conv's
    overflow cap."""
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets).alias(
        "bucket"
    )


def split_assign(
    df: DataFrame,
    key: str,
    weights: dict[str, int] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with probability proportional to
    its integer weight (e.g. ``{"train": 90, "val": 5, "test": 5}``).

    Assignment is a function of (salt, row key) only: total (every row gets
    exactly one split), disjoint, reproducible, and stable under any
    repartitioning — properties a seeded ``randomSplit`` does not have.
    """
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    total = sum(weights.values())
    b = hash_bucket(F.col(key), buckets=total, salt=salt)
    expr = None
    hi = 0
    for name, w in weights.items():
        hi += w
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(split_col, expr)


def cluster_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    weights: dict[str, int] | None = None,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: assignment is keyed by the
    near-dup CLUSTER id, not the document id, so every member of a
    duplicate cluster lands in the SAME split by construction — the fix
    for the contamination :func:`split_assign` alone cannot prevent
    (near-identical documents straddling train and test inflate eval;
    ``doc_split_leakage`` MEASURES that leakage, this op makes it zero).

    ``clusters`` is :func:`operators.dedup.dup_clusters` output
    ``(doc_id, cluster_id, cluster_size)`` — deliberately sparse (only
    documents that appear in some near-dup pair); documents absent from
    it are singletons and key their split by their own id
    (cluster_id = doc_id, size 1), so the split stays total over the
    corpus.

    Scale: the membership join is one id equi-join against the (small)
    cluster table — the corpus-sized side never shuffles if the pair
    list broadcasts (AQE decides) — and the assignment itself is the
    same pure map-side md5-bucket expression as :func:`split_assign`:
    stable under any partitioning, engine-reproducible.

    Returns ``(doc_id, cluster_id, cluster_size, split)``."""
    full = (
        docs.select(F.col(id_col))
        .join(clusters, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1)).cast("long").alias(
                "cluster_size"
            ),
        )
    )
    return split_assign(full, "cluster_id", weights, salt=salt)


def stratified_take(
    df: DataFrame,
    strata: str,
    key: str,
    n: int,
    salt: str = "",
    rank_col: str = "rank",
) -> DataFrame:
    """Take a deterministic pseudo-random ``n`` rows per stratum: rows rank
    by (md5 hash, key) inside each stratum and the top ``n`` survive.

    One shuffle on the stratum key; WindowGroupLimit keeps at most ``n``
    rows per stratum per map task before the exchange, so the shuffle
    volume is ``n * strata``, not the input size."""
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(strata).orderBy(h, F.col(key))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n)
    )


def cap_by_budget(
    df: DataFrame,
    strata: str,
    key: str,
    cost_col: str,
    budget: int,
    salt: str = "",
    keep_col: str = "kept",
) -> DataFrame:
    """Per-stratum BUDGET cap: rows are ordered pseudo-randomly (md5 hash,
    then key) inside each stratum and survive while their cumulative
    ``cost_col`` stays within ``budget`` — the "cap every domain at X
    bytes/tokens" rule of web-corpus curation (a count cap is
    ``stratified_take``; this is the size-aware variant, and the two differ
    whenever document lengths are skewed).

    A row is kept iff the running INCLUSIVE sum of its stratum's costs, in
    hash order, is <= budget — so selection is greedy-prefix: the first
    document that would overflow the budget is dropped, as is everything
    after it.  (Greedy-prefix, not best-fit: order is the deterministic
    hash order, which keeps the decision a pure function of (salt, key)
    and independent of partitioning.)

    PRECONDITION: ``key`` must be unique within each stratum — two rows
    sharing a key sort identically, so their relative order (and, at a
    budget boundary, which of them is kept) would depend on partition
    layout, voiding the determinism contract.

    Scale: one shuffle on the stratum key; the cumulative sum is a running
    window aggregate (no buffering of the stratum beyond the sort), and
    costs are summed as BIGINT so the cut point is exact in any engine.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = (
        Window.partitionBy(strata)
        .orderBy(h, F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(cost_col).cast("long")).over(w)
    return df.withColumn(keep_col, run <= F.lit(int(budget)))


_U_DENOM = float(2**52 + 1)  # hash-uniform denominator; 2^52+1 is double-exact


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    salt: str = "",
    rank_col: str = "rank",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws a deterministic hash-uniform ``u`` in (0,1) and the k
    rows with the smallest priority ``-ln(u) / w`` survive — exactly the
    distribution of sequentially drawing k rows with probability
    proportional to weight.  The quality-weighted subsampling primitive
    ("sample 1B docs, favoring high-quality ones") that ``rand()`` cannot
    provide reproducibly.

    u derives from 52 bits of md5 (``(h52 + 1) / (2^52 + 1)`` — strictly
    inside (0,1), so ln is finite), making the sample a pure function of
    (salt, key, weight): stable under repartitioning and replayable by an
    independent engine.

    Scale: priority is a map-side expression; the rank<=k filter over a
    global order is planned as WindowGroupLimit — each map task keeps its
    local top-k before the single k*tasks-row merge.  Weights must be > 0."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("long") + F.lit(1)).cast(
        "double"
    ) / F.lit(_U_DENOM)
    pri = -F.log(u) / F.col(weight_col)
    w = Window.orderBy(pri, F.col(key))
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Sequence packing: assign each document to a fixed-token-budget pack
    (the LLM-training preprocessing step that concatenates documents into
    full training sequences).  Returns (doc_id, shard, n_tokens, pack_id);
    a pack is identified by (shard, pack_id).

    Semantics: documents are sharded by content hash (deterministic,
    engine-replayable — same family as ``split_assign``), then packed
    greedily in ``doc_id`` order by cumulative token count:
    ``pack_id = floor(cum_tokens_before_doc / budget)``.  Fixed-boundary
    chunking, so a pack may overflow by less than one document — the
    trade accepted for a one-pass, shuffle-light plan.

    Why sharded: exact global greedy packing is inherently sequential (each
    pack depends on every earlier document).  Sharding makes each window
    partition an independent packing problem: one shuffle on the shard key,
    ~|docs|/n_shards rows per window state, and adding executors scales
    linearly.  n_shards is the parallelism dial; at 100 TB pick
    n_shards >> cores so AQE can balance them."""
    from presto_ethereum_spark.operators.text import token_count_ws

    d = df.select(
        F.col(id_col).alias("doc_id"),
        token_count_ws(F.col(text_col)).cast("long").alias("n_tokens"),
        hash_bucket(F.col(id_col), buckets=n_shards, salt=salt).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn("cum_prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn(
            "pack_id", F.floor(F.col("cum_prev") / F.lit(float(budget))).cast("long")
        )
        .select("doc_id", "shard", "n_tokens", "pack_id")
    )


def negative_samples(
    df: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: ``k``
    pseudo-random negatives per anchor, drawn by hashing (anchor, i) into
    the id space — reproducible across engines/epochs with no RNG, so a
    resumed training job redraws identical negatives.

    Assumes contiguous ids ``[0, n)`` — exactly what ``corpus_shuffle`` /
    pack-position assignment produces upstream in this pipeline.  A draw
    that lands on the anchor itself advances by one (mod n); draws for the
    same anchor may collide with each other (k << n makes this rare, and
    contrastive losses tolerate it).

    Scale: the draw is a narrow map (hash + mod against a broadcast 1-row
    count); fetching the negatives' payload is ONE equi-join on the id —
    shuffle of (k·n) skinny rows against the corpus, or a storage-bucketed
    join when the corpus is bucketed by id (sources/sink.py)."""
    from presto_ethereum_spark.operators.dedup import hash60

    tot = df.agg(F.count("*").alias("n"))
    draws = (
        df.select(F.col(id_col).alias("anchor_id"))
        .withColumn("sample_idx", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "h",
            hash60(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("sample_idx").cast("string"),
                )
            )
            % F.col("n"),
        )
        .withColumn(
            "neg_id",
            F.when(F.col("h") == F.col("anchor_id"), (F.col("h") + 1) % F.col("n"))
            .otherwise(F.col("h")),
        )
        .select("anchor_id", F.col("sample_idx").cast("int").alias("sample_idx"), "neg_id")
    )
    if not payload_cols:
        return draws
    payload = df.select(
        F.col(id_col).alias("neg_id"),
        *[F.col(c).alias(f"neg_{c}") for c in payload_cols],
    )
    return draws.join(payload, "neg_id").select(
        "anchor_id", "sample_idx", "neg_id",
        *[f"neg_{c}" for c in payload_cols],
    )


def curriculum_interleave(
    df: DataFrame,
    score_col: str,
    key: str,
    n_buckets: int = 10,
    salt: str = "",
) -> DataFrame:
    """Curriculum ordering: place every row in a difficulty ``bucket``
    (0 = highest score) and give it a per-bucket ``slot`` in deterministic
    hash order; training consumes rows sorted by ``(slot, bucket)``, which
    interleaves one row from each difficulty level per cycle — each
    training window sees the full difficulty mix while the schedule stays
    a pure function of (salt, data).

    Buckets come from the EXACT score distribution, not a global ntile: a
    global ``ntile()`` window drags the whole table through one partition,
    while the distribution table (count per distinct score) is tiny — the
    one single-partition window here runs over DISTINCT SCORES (bounded:
    quality scores are rounded), and rows join back to their bucket by
    score.  bucket(s) = (n_buckets * ranked-rows-before-s) DIV total,
    capped at n_buckets - 1 — integer arithmetic, one right answer in any
    engine.  Ties in score share a bucket (equal difficulty is not
    splittable deterministically).

    Returns ``df`` + ``(bucket int, slot long)``.

    Shuffles: score-count aggregation (map-side combined), broadcast join
    of the tiny distribution table, one hash shuffle on ``bucket`` for the
    slot window.  PRECONDITION: ``key`` unique per row (same contract as
    ``cap_by_budget``).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # collision-proof temp names (same contract as write_zordered)
    cs, cn, ct, cb = "_cs", "_cn", "_ct", "_cb"
    while any(c in df.columns for c in (cs, cn, ct, cb)):
        cs, cn, ct, cb = (c + "_" for c in (cs, cn, ct, cb))
    s = F.col(score_col)
    dist = df.groupBy(s.alias(cs)).agg(F.count("*").alias(cn))
    # desc_nulls_last: a NULL score is "unknown difficulty" and lands
    # deterministically in the LAST bucket region rather than vanishing
    w_cum = Window.orderBy(F.col(cs).desc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = dist.agg(F.sum(cn).alias(ct))
    buckets = (
        dist.withColumn(cb, F.coalesce(F.sum(cn).over(w_cum), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .select(
            cs,
            F.least(
                F.lit(n_buckets - 1),
                F.expr(f"({n_buckets} * {cb}) DIV {ct}").cast("int"),
            ).alias("bucket"),
        )
    )
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w_slot = Window.partitionBy("bucket").orderBy(h, F.col(key))
    return (
        # null-safe equality: NULL-scored rows keep their bucket instead of
        # dropping out of the inner join
        df.join(F.broadcast(buckets), s.eqNullSafe(F.col(cs)))
        .drop(cs)
        .withColumn("slot", F.row_number().over(w_slot).cast("long"))
    )
