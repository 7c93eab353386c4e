"""Frequent-item mining at corpus scale: EXACT heavy hitters without a
full-vocabulary shuffle.

The naive plan — ``groupBy(value).count().where(n > threshold)`` —
shuffles one row per DISTINCT value; on a web-scale token stream that is
billions of grouping keys moved to find the few thousand frequent ones.
The classic two-phase alternative:

1. **Candidate generation, zero shuffle**: each partition summarizes its
   stream with a Misra–Gries summary of k counters (merged batch-wise —
   MG summaries are mergeable, Agarwal et al., "Mergeable Summaries",
   PODS'12).  MG guarantees any item with partition frequency
   > n_p/(k+1) survives its partition summary, and by averaging any item
   with GLOBAL frequency > n/(k+1) must exceed n_p/(k+1) in at least one
   partition — so the union of per-partition candidates is a SUPERSET of
   the true heavy hitters.  At most k values leave each partition.
2. **Exact verification, candidate-sized shuffle**: a broadcast semi-join
   keeps only candidate rows, and an ordinary groupBy counts them
   exactly.  The shuffle moves candidate rows only.

Because phase 1 is a guaranteed superset and phase 2 is exact, the final
``count > floor(n * threshold_frac)`` filter equals the naive plan's
answer row-for-row — approximate machinery, EXACT result, which is why
the operator is oracle-gradeable against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "count_min_sketch", "cms_estimate", "cms_hash", "bloom_bits", "bloom_might_contain", "cooccurrence_overlap", "kmv_distinct", "kmv_set_ops", "histogram_quantiles"]


def _mg_summary(vals: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
    """ONE corpus pass producing the Misra–Gries candidate union and the
    exact total row count — the shared summarization step behind
    :func:`heavy_hitters` (fraction threshold) and
    :func:`misra_gries_heavy` (N/(k+1) threshold).  Each partition folds
    its rows into a k-counter MG summary (per Arrow batch, value_counts
    merges into the counter table; when it exceeds k entries, subtract
    the (k+1)-th largest count from all and drop non-positives — the
    PODS'12 reduce).  Candidate rows carry ``v``; ONE trailing row per
    partition carries the partition's row count under ``v = NULL``, so
    n_total rides the same pass instead of a second corpus scan.  The
    summary (<= (k+1) x partitions rows) is persisted so its two
    consumers (candidate broadcast, total) read the materialized result
    instead of re-running the corpus pass per consumer."""

    def summarize(batches):
        import pandas as pd

        counters = None
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            c = pdf["v"].value_counts()
            counters = c if counters is None else counters.add(c, fill_value=0)
            if len(counters) > k:
                # PODS'12 reduce: subtract the (k+1)-th largest count from
                # every counter, keep the strictly-positive ones (<= k
                # survive; total deduction per element <= N_p/(k+1))
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        cand = [] if counters is None else list(counters.index)
        yield pd.DataFrame(
            {"v": cand + [None], "n_part": [0] * len(cand) + [n_part]}
        )

    # LAZY persist: materializes on the first action and is reused by the
    # second consumer.  persist over localCheckpoint because the summary's
    # lineage stays RECOMPUTABLE — localCheckpoint stores unreplicated
    # executor-local blocks, so on a real cluster one executor loss after
    # materialization would kill the query instead of recomputing the
    # lost partitions (the loop operators that NEED lineage truncation
    # document that trade explicitly; this reuse point does not).
    from pyspark import StorageLevel

    summary = vals.mapInPandas(summarize, "v string, n_part long").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = summary.where(F.col("v").isNotNull()).select("v").distinct()
    total = summary.where(F.col("v").isNull()).agg(
        F.sum("n_part").alias("n_total")
    )
    return cand, total


def heavy_hitters(
    df: DataFrame,
    col: Column | str,
    threshold_frac: float = 0.005,
) -> DataFrame:
    """All values of ``col`` occurring in MORE than ``threshold_frac`` of
    rows, with their exact counts: ``(value, n)``, exactly equal to the
    full groupBy formulation (see module docstring for why the
    approximate candidate phase cannot lose a true heavy hitter).

    The count threshold is ``floor(total * threshold_frac)`` compared
    strictly, computed in integer arithmetic (the fraction is taken as an
    exact rational over 1e9) so the cut is engine-exact.  NULL values are
    ignored — they are not counted as a groupable item.
    """
    if not (0.0 < threshold_frac < 1.0):
        raise ValueError(f"threshold_frac must be in (0,1), got {threshold_frac}")
    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.cast("string").alias("v")).where(
        F.col("v").isNotNull()
    )
    # k such that global freq > n/(k+1) covers freq > n*threshold_frac:
    # need n/(k+1) <= n*threshold_frac  =>  k >= 1/threshold_frac - 1
    k = int(1.0 / threshold_frac) + 1
    cands, tot = _mg_summary(vals, k)
    num = int(round(threshold_frac * 1_000_000_000))
    # the product n_total * num is computed in DECIMAL(38,0): BIGINT
    # arithmetic would overflow (and silently wrap under non-ANSI Spark)
    # past n_total ~ 2^63/num — a few TB of token positions, squarely the
    # scale this operator targets.  The DIV quotient is back under 2^63.
    thresh = F.expr(
        f"CAST(n_total AS DECIMAL(38,0)) * {num} DIV 1000000000"
    )
    return (
        vals.join(F.broadcast(cands), "v")
        .groupBy("v")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("n") > thresh)
        .select(F.col("v").alias("value"), "n")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
    n_partials: int = 16,
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group, computed the
    MERGEABLE way: ``n_partials`` deterministic salt shards each keep
    their k smallest distinct 60-bit key hashes (the per-executor
    combiner at scale), then the shard survivors merge to the global k
    smallest — provably identical to a single-pass KMV (the k smallest
    of a union are among each part's k smallest), so the merge is
    lossless by construction.

    The estimator is the classic ``D-hat = (k-1) * 2^60 / h_(k)`` over
    the k-th smallest hash, evaluated as an exact DECIMAL(38,0) integer
    floor-division — unlike HLL there is NO float anywhere: the sketch
    content (hash values) and the estimate are both integers a second
    engine reproduces bit-for-bit (``hash60`` md5 prefixes).  Groups
    with fewer than k distinct hashes report their exact hash count
    (the standard small-cardinality KMV fallback).

    Scale: one map-side-combined distinct on (group, salt, hash) — 8-byte
    hashes on the wire, never keys — two WindowGroupLimit top-k passes
    (per-shard, then per-group over <= n_partials*k survivors), and one
    exact count_distinct per group carried alongside for the accuracy
    report.  Returns ``(group, exact_distinct, n_hashes, kth_min,
    est_distinct)``."""
    from presto_ethereum_spark.operators.dedup import hash60

    hv = (
        df.select(
            F.col(group_col).alias("g"),
            hash60(F.col(key_col).cast("string")).alias("hv"),
        )
        .withColumn("salt", F.pmod(F.col("hv"), F.lit(n_partials)))
        .distinct()
    )
    w_shard = Window.partitionBy("g", "salt").orderBy("hv")
    shard_topk = (
        hv.withColumn("rn", F.row_number().over(w_shard))
        .where(F.col("rn") <= k)
        .drop("rn", "salt")
    )
    w_g = Window.partitionBy("g").orderBy("hv")
    merged = shard_topk.withColumn("rn", F.row_number().over(w_g)).where(
        F.col("rn") <= k
    )
    kth = merged.where(F.col("rn") == k).select(
        "g", F.col("hv").alias("kth_min")
    )
    n_hashes = hv.groupBy("g").agg(F.count_distinct("hv").alias("n_hashes"))
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count_distinct(key_col).alias("exact_distinct")
    )
    est = F.when(
        F.col("kth_min").isNotNull(),
        F.expr(
            f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * 1152921504606846976 "
            "div CAST(kth_min AS DECIMAL(38,0)) AS BIGINT)"
        ),
    ).otherwise(F.col("n_hashes"))
    return (
        exact.join(n_hashes, "g")
        .join(kth, "g", "left")
        .select(
            F.col("g").alias(group_col),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.col("n_hashes").cast("long").alias("n_hashes"),
            F.col("kth_min").cast("long").alias("kth_min"),
            est.cast("long").alias("est_distinct"),
        )
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    key_col: str,
    group_a: str,
    group_b: str,
    k: int = 64,
) -> DataFrame:
    """Theta-sketch-style set operations from two KMV sketches: estimate
    |A ∪ B|, |A ∩ B|, and Jaccard(A, B) of two groups' key sets from
    their k-minimum-values summaries alone — the sketch-algebra
    counterpart of :func:`kmv_distinct` (union/intersection over sketches
    is what lets a 100-TB pipeline answer audience-overlap questions from
    per-partition summaries without ever co-shuffling the raw keys).

    Estimator (Dasgupta et al.'s theta-sketch framing of Beyer et al.'s
    KMV): theta = k-th smallest hash of the UNION of the two sketches'
    contents.  theta <= each sketch's own k-th min, so every hash below
    theta was necessarily retained by BOTH sketches when it belongs to
    both sets — the intersection sample below theta is unbiased.  With
    c = |{h < theta : h in sketch_A AND h in sketch_B}|:

        est_union = (k-1) * 2^60 div theta
        est_inter =   c   * 2^60 div theta
        est_jaccard_e6 = half-up(c / (k-1))   [c of the k-1 union survivors]

    all INTEGER arithmetic over 60-bit md5-prefix hashes — the sketch,
    the threshold, and every estimate are bit-reproducible in a second
    engine, so the gate hashes the estimators themselves.  When the union
    of sketch contents has fewer than k distinct hashes the sketches ARE
    the sets and all three estimates fall back to the exact values (the
    standard small-cardinality KMV degeneration).

    Exact |A|, |B|, |A ∩ B|, |A ∪ B| and exact Jaccard are carried
    alongside (computed on the raw keys) so the output doubles as the
    sketch-accuracy report.  Plan: one distinct on (group, hash) — 8-byte
    hashes on the wire — two WindowGroupLimit top-k passes, and 1-row
    broadcast scalar attaches; the exact side is one additional
    two-group aggregation.  Returns one row."""
    from presto_ethereum_spark.operators.dedup import hash60

    sel = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.when(F.col(group_col) == group_a, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        F.col(key_col).alias("key"),
    )
    # --- exact side (raw keys; hash collisions cannot touch it) ---
    per_key = sel.groupBy("key").agg(
        F.max(F.when(F.col("g") == "a", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("g") == "b", 1).otherwise(0)).alias("in_b"),
    )
    exact = per_key.agg(
        F.sum("in_a").alias("exact_a"),
        F.sum("in_b").alias("exact_b"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("exact_inter"),
        F.count("*").alias("exact_union"),
    )
    # --- sketch side ---
    hv = sel.select("g", hash60(F.col("key").cast("string")).alias("hv")).distinct()
    w_g = Window.partitionBy("g").orderBy("hv")
    sk = hv.withColumn("rn", F.row_number().over(w_g)).where(F.col("rn") <= k)
    uni = sk.select("hv").distinct()
    w_u = Window.orderBy("hv")
    ranked = uni.withColumn("urn", F.row_number().over(w_u))
    theta = ranked.where(F.col("urn") == k).select(F.col("hv").alias("theta"))
    both = sk.groupBy("hv").agg(F.count("*").alias("n_g")).where(F.col("n_g") == 2)
    common = (
        both.crossJoin(F.broadcast(theta))
        .where(F.col("hv") < F.col("theta"))
        .agg(F.count("*").alias("n_common"))
    )
    row = exact.crossJoin(
        F.broadcast(theta.agg(F.max("theta").alias("theta")))
    ).crossJoin(F.broadcast(common))
    two60 = 1152921504606846976  # 2^60
    est_union = F.when(
        F.col("theta").isNotNull(),
        F.expr(f"CAST({k - 1} AS DECIMAL(38,0)) * {two60} div CAST(theta AS DECIMAL(38,0))"),
    ).otherwise(F.col("exact_union"))
    # Small-cardinality fallback (theta NULL: the union of sketch contents
    # has < k hashes, so the sketches ARE the sets): fall back to the EXACT
    # raw-key values on every estimator — n_both_all (distinct 60-bit
    # hashes in both sketches) would equal exact_inter only absent hash
    # collisions, so mixing it with the raw-key exact_union denominator
    # made "falls back to the exact values" only collision-probably true.
    # exact_union = 0 (both groups empty) guards to explicit NULL rather
    # than a silent NULL-by-division.
    est_inter = F.when(
        F.col("theta").isNotNull(),
        F.expr(f"CAST(n_common AS DECIMAL(38,0)) * {two60} div CAST(theta AS DECIMAL(38,0))"),
    ).otherwise(F.col("exact_inter"))
    est_jac = F.when(
        F.col("theta").isNotNull(),
        F.expr(f"(2 * CAST(n_common AS BIGINT) * 1000000 + {k - 1}) div {2 * (k - 1)}"),
    ).when(
        F.col("exact_union") > 0,
        F.expr("(2 * exact_inter * 1000000 + exact_union) div (2 * exact_union)"),
    )
    exact_jac = F.when(
        F.col("exact_union") > 0,
        F.expr("(2 * exact_inter * 1000000 + exact_union) div (2 * exact_union)"),
    )
    return row.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        F.lit(k).cast("int").alias("k"),
        F.col("theta").cast("long").alias("theta"),
        F.col("n_common").cast("long").alias("n_common"),
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.col("exact_inter").cast("long").alias("exact_inter"),
        F.col("exact_union").cast("long").alias("exact_union"),
        est_union.cast("long").alias("est_union"),
        est_inter.cast("long").alias("est_inter"),
        est_jac.cast("long").alias("est_jaccard_e6"),
        exact_jac.cast("long").alias("exact_jaccard_e6"),
    )


def misra_gries_heavy(
    df: DataFrame,
    value_col: str,
    k: int = 96,
) -> DataFrame:
    """VERIFIED heavy hitters via Misra–Gries summaries (Misra & Gries,
    "Finding repeated elements", Sci.Comp.Prog.'82; merge/reduce per
    Agarwal et al., "Mergeable summaries", PODS'12): every value whose
    exact count exceeds ``N / (k+1)`` — with its exact count.

    The missing member of the sketch family next to CMS (point
    estimates), HLL/KMV (distinct counts), and Bloom (membership): a
    deterministic heavy-hitter summary whose state is ``k`` counters per
    partition REGARDLESS of cardinality.  Each partition folds its rows
    into a k-counter MG summary (vectorized: per Arrow batch,
    value_counts merges into the counter table; when it exceeds k
    entries, subtract the (k+1)-th largest count from all and drop
    non-positives — the PODS'12 reduce).  The per-partition guarantee —
    undercount <= N_p/(k+1) — gives the global one by pigeonhole: any
    value with total count > N/(k+1) = Σ N_p/(k+1) beats the bound in at
    least one partition and survives that summary.  The candidate union
    (<= k per partition) is then verified with EXACT counts and the
    threshold filter, so the OUTPUT is deterministic — independent of
    partitioning and batch boundaries even though each summary is not —
    which is what makes an approximate structure hash-gradeable (the
    repo's sketch contract).

    Plan: one corpus pass (shared :func:`_mg_summary`, materialized once)
    emits <= k candidates + one count row per partition (mapInPandas,
    O(k) state); n_total sums the count rows; the verification pass
    re-scans filtered by the broadcast candidate set into a
    map-side-combined exact count.  Nothing proportional to
    cardinality ever shuffles — the CMS/top-k alternative
    (``doc_heavy_tokens``) shuffles sketch cells; this shuffles
    candidates.

    Returns ``(value, n, n_total, share_e6)``, share in half-up
    micro-units."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vals = df.select(F.col(value_col).cast("string").alias("v")).where(
        F.col(value_col).isNotNull()
    )

    cand, total = _mg_summary(vals, k)
    return (
        vals.join(F.broadcast(cand), "v")
        .groupBy("v")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        # threshold and share in DECIMAL(38,0): n * (k+1) and
        # 2*n*1e6 wrap int64 past ~4.6e12 rows under non-ANSI Spark —
        # the crawl scale this operator targets (same overflow class the
        # benford/rake fixes closed; the DuckDB oracle auto-promotes to
        # HUGEINT, so only the Spark side would wrap)
        .where(F.expr(f"CAST(n AS DECIMAL(38,0)) * {k + 1}") > F.col("n_total"))
        .select(
            F.col("v").alias("value"),
            F.col("n").cast("long").alias("n"),
            F.col("n_total").cast("long").alias("n_total"),
            F.expr(
                "CAST((2 * CAST(n AS DECIMAL(38,0)) * 1000000 + n_total)"
                " div (2 * CAST(n_total AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("share_e6"),
        )
    )


def _hash_mod(value: Column, prefix: str, modulus: int) -> Column:
    """First 8 md5 hex digits of (prefix || value) mod ``modulus`` — the
    one seedable, engine-portable hash construction behind the CMS rows
    AND the Bloom bits (sampling.hash_bucket is the same shape).  A single
    definition so build and probe can never drift apart."""
    h = F.md5(F.concat(F.lit(prefix), value.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(modulus)


def cms_hash(value: Column, seed: int, width: int) -> Column:
    """Deterministic CMS column index for ``value`` under hash row
    ``seed``."""
    return _hash_mod(value, f"cms{seed}:", width).alias("col")


def count_min_sketch(
    df: DataFrame, value_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-min sketch of a value stream (Cormode & Muthukrishnan, "An
    improved data stream summary: the count-min sketch and its
    applications", J.Algorithms'05): ``depth`` hash rows x ``width``
    columns of counters; every occurrence increments one cell per row.

    Returns the sketch as ``(row, col, cnt)`` — at most depth*width rows
    REGARDLESS of stream size or cardinality, which is the point: the
    shuffle carries cell partials (map-side combined), never the
    vocabulary, and two sketches of the same shape merge by adding cells
    (the mergeable-summary property streaming aggregation needs).

    Estimates (:func:`cms_estimate`) never undercount; overcount is
    bounded by e/width * N per the standard analysis.  CONTRACT: probe
    with the SAME (width, depth) the sketch was built with — a mismatch
    addresses rows/columns the sketch never populated, which is
    indistinguishable from an empty cell and silently breaks the
    never-undercount guarantee (the parameters are part of the sketch's
    identity, like a hash seed).  Hashes are
    md5-derived (no RNG), so the sketch — and therefore the estimate — is
    bit-reproducible by an independent engine, making an APPROXIMATE
    structure exactly gradeable."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}x{depth}")
    v = F.col(value_col)
    # ONE pass: all depth cell addresses per value ride a posexplode'd
    # array (a unionAll-per-row variant re-scans the stream depth times —
    # the dominant cost for the streams this structure exists for)
    return (
        df.select(
            F.posexplode(
                F.array(*[cms_hash(v, r, width) for r in range(depth)])
            ).alias("row", "col")
        )
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the estimate is
    the MIN over hash rows of the addressed cells.  The sketch (at most
    depth*width rows) broadcasts; per key this is depth lookups + one
    min — no scan of the original stream."""
    k = keys.select(F.col(key_col).alias("key")).distinct()
    addr = k.select(
        "key",
        F.posexplode(
            F.array(*[cms_hash(F.col("key"), r, width) for r in range(depth)])
        ).alias("row", "col"),
    )
    return (
        addr.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_bits(
    df: DataFrame, key_col: str, m_bits: int = 8192, k_hashes: int = 5
) -> DataFrame:
    """Bloom filter of a key set as a DISTINCT bit-index table (at most
    ``m_bits`` rows): each key sets ``k_hashes`` md5-derived bits — the
    compact membership summary that prunes a join when broadcasting the
    key SET itself is too large (bits ~ 1.2 bytes/key at 1% fp vs tens of
    bytes per raw key).  Deterministic (no RNG), mergeable (union of bit
    tables = bloom of the union), and therefore exactly reproducible by a
    SQL oracle."""
    if m_bits < 1 or k_hashes < 1:
        raise ValueError(f"m_bits/k_hashes must be >= 1, got {m_bits}/{k_hashes}")
    v = F.col(key_col)
    # one pass over the key set; explode the k bit addresses per key
    return (
        df.select(
            F.explode(
                F.array(
                    *[_hash_mod(v, f"bf{s}:", m_bits) for s in range(k_hashes)]
                )
            ).alias("bit")
        )
        .distinct()
    )


def bloom_might_contain(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k_hashes: int = 5,
) -> DataFrame:
    """Membership test: for each distinct probe key, ``might_contain`` is
    true iff ALL its ``k_hashes`` bits are set.  The bit table broadcasts
    (bounded by ``m_bits`` rows); per probe this is k lookups + one
    count — no scan of the original key set.  No false negatives by
    construction; false positives at the standard (1-e^{-kn/m})^k rate."""
    k = probes.select(F.col(key_col).alias("key")).distinct()
    # DISTINCT on both sides makes membership robust to (a) bit tables
    # merged with bag-semantics union (duplicate bits would multiply the
    # hit count past k and flip a PRESENT key to false — a false negative)
    # and (b) two seeds colliding to the same bit for one key
    addr = k.select(
        "key",
        F.explode(
            F.array(
                *[
                    _hash_mod(F.col("key"), f"bf{s}:", m_bits)
                    for s in range(k_hashes)
                ]
            )
        ).alias("bit"),
    ).distinct()
    hit = bits.select("bit").distinct().withColumn("_hit", F.lit(1))
    return (
        addr.join(F.broadcast(hit), "bit", "left")
        .groupBy("key")
        .agg((F.count("_hit") == F.count("*")).alias("might_contain"))
    )


def cooccurrence_overlap(
    df: DataFrame,
    entity_col: str,
    item_col: str,
) -> DataFrame:
    """Exact item co-occurrence / audience-overlap matrix: for every item
    pair (a < b), how many entities touch BOTH, each item's distinct
    entity reach, and the Jaccard overlap — the audience/segment-overlap
    report (and the co-click / co-purchase matrix) that drives mixture
    and dedup decisions between corpus sources.

    Returns ``(item_a, item_b, n_both, n_a, n_b, jaccard)`` with jaccard
    = round6_ratio(n_both, n_a + n_b - n_both).

    Scale: ONE corpus shuffle — groupBy(entity) collapses the event
    stream to per-entity distinct item arrays (bounded by the item
    vocabulary, not event volume); pairs explode JVM-side from the
    sorted array (t² terms where t <= |items| per entity) into a
    map-side-combined pair count; per-item reach aggregates from the
    same arrays and joins back as a broadcast (item-vocabulary-sized).
    The classic self-join-on-entity formulation the oracle uses shuffles
    the distinct (entity, item) table twice and fans out in the join."""
    from presto_ethereum_spark.operators.dedup import round6_ratio

    ent = df.groupBy(F.col(entity_col).alias("ent")).agg(
        F.array_sort(F.collect_set(F.col(item_col))).alias("items")
    )
    pairs = ent.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("items"), i + 2, F.size("items") - i - 1
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    both = pairs.groupBy("a", "b").agg(F.count("*").cast("long").alias("n_both"))
    reach = (
        ent.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        both.join(
            F.broadcast(reach.withColumnsRenamed({"item": "a", "n": "n_a"})), "a"
        )
        .join(
            F.broadcast(reach.withColumnsRenamed({"item": "b", "n": "n_b"})), "b"
        )
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            "n_both",
            "n_a",
            "n_b",
            round6_ratio(
                F.col("n_both"), F.col("n_a") + F.col("n_b") - F.col("n_both")
            ).alias("jaccard"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 64,
    quantiles: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """Quantile estimation from a MERGEABLE equi-width histogram, with an
    exact referee that never sorts the full table — the quantile member
    of the sketch family next to CMS (frequency), HLL/KMV (distinct),
    Bloom (membership), and Misra–Gries (heavy hitters).

    Plan: (1) one aggregate for (min, max, n); (2) one map-side pass
    assigns each row an integer bucket ``(x - min) div w`` — the
    ``groupBy(bucket)`` histogram is the sketch, and Spark's partial
    aggregation IS the mergeable-summary step (per-partition partials of
    <= n_buckets counters, merged by sum: exactly how the histogram
    would merge across days/shards); (3) each requested quantile finds
    its bucket from the <= n_buckets cumulative rows and reports the
    bucket's exact integer bounds and midpoint as the estimate (error
    <= w/2 by construction); (4) the EXACT value at the target rank is
    recovered by sorting ONLY the selected buckets (expected n/n_buckets
    rows each), never the corpus — rank-within-bucket = target rank
    minus the cumulative count below the bucket.  All arithmetic is
    integer (target rank = ceil(q*n/100) via (q*n + 99) div 100), so the
    report is hash-exact across engines.

    At 100 TB: phases 1-2 are two linear scans with counter-sized
    shuffles (the histogram could be maintained incrementally per
    ingest batch and merged — same counters); the referee narrows the
    only sort to ~n/n_buckets rows per quantile.  err_cents (estimate -
    exact) IS the diagnostic: it verifies the histogram's error bound
    holds on real data rather than assuming it."""
    if n_buckets < 1:
        # mirrors jaccard_threshold_curve's guard: n_buckets=0 would put a
        # div-by-zero in the width expression (ANSI: runtime error;
        # non-ANSI: silently-NULL width and an empty report)
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    v = df.select(F.col(value_col).cast("bigint").alias("x")).where(
        # NULLs are neither rankable nor bucketable: without this filter
        # they inflate n (shifting every target rank) and form a NULL
        # bucket that can win the cumulative-crossing predicate and then
        # silently drop the quantile row at the equality join
        F.col("x").isNotNull()
    )
    b = v.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count("*").alias("n")
    ).select(
        "mn", "mx", "n", (F.expr(f"(mx - mn) div {n_buckets}") + 1).alias("w")
    )
    vb = v.crossJoin(F.broadcast(b)).select(
        F.expr("(x - mn) div w").alias("bucket"), "x"
    )
    hist = vb.groupBy("bucket").agg(F.count("*").alias("cnt"))
    hc = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qs = df.sparkSession.createDataFrame(
        [(int(q),) for q in quantiles], "qpct int"
    )
    tr = qs.crossJoin(F.broadcast(b)).select(
        "qpct", F.expr("(qpct * n + 99) div 100").alias("r"), "mn", "w"
    )
    sel = tr.join(
        F.broadcast(hc),
        (F.col("cum") >= F.col("r"))
        & (F.col("cum") - F.col("cnt") < F.col("r")),
    ).select(
        "qpct",
        "bucket",
        "mn",
        "w",
        "cnt",
        (F.col("r") - (F.col("cum") - F.col("cnt"))).alias("rr"),
    )
    rows = vb.join(F.broadcast(sel.select("qpct", "bucket", "rr")), "bucket")
    exact = (
        rows.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("qpct").orderBy("x")),
        )
        .where(F.col("rn") == F.col("rr"))
        .select("qpct", F.col("x").alias("exact_cents"))
    )
    lo = F.col("mn") + F.col("bucket") * F.col("w")
    # quantile-count-sized join: broadcast so the 5-row report never plans
    # a sort-merge exchange
    return sel.join(F.broadcast(exact), "qpct").select(
        F.col("qpct").cast("int").alias("qpct"),
        F.col("bucket").cast("int").alias("bucket"),
        lo.alias("lo_cents"),
        (lo + F.col("w") - 1).alias("hi_cents"),
        (lo + F.expr("(w - 1) div 2")).alias("est_mid_cents"),
        F.col("cnt").cast("bigint").alias("bucket_n"),
        "exact_cents",
        (lo + F.expr("(w - 1) div 2") - F.col("exact_cents")).alias(
            "err_cents"
        ),
    )
