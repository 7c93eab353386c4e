"""The driver-facing query battery: one entry per operator/capability from
SURVEY.md §2, each as (Spark callable, DuckDB oracle SQL).

Design rules for exact cross-engine determinism:

- every computed column is aliased identically on both sides (the driver
  hash-compares by sorted column name);
- SUMs of doubles either have a dominant-magnitude distribution and are
  ROUND()ed, or are cast to DECIMAL(38,x) pre-sum (exact, order-independent)
  and back to double after — double summation order differs between engines
  and would otherwise flip low bits;
- erc20 value sums (magnitudes up to ~1e107, where ROUND is a no-op) are
  narrowed to float32 on both sides: a deterministic 7-significant-digit
  representation that absorbs order noise;
- windows always carry a total ordering (ties broken by a unique key);
- timestamps: events.ts is read as epoch-nanosecond longs on the Spark side
  (spark.sql.legacy.parquet.nanosAsLong) and via epoch_ns() in DuckDB;
- integer sums that exceed 2^53 must pass through CAST(... AS BIGINT)
  BEFORE any CAST AS DOUBLE in the oracle: DuckDB's HUGEINT->DOUBLE
  conversion rounds differently from int64->double in that range (found
  as a 1-ulp divergence in emb_dim_stats at sf0.1).

Scale annotations accompany each query: what shuffles, what broadcasts, and
why the plan survives 1000 executors.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent.parent
ETH = REPO / "fixtures" / "eth"
MEDIA = REPO / "fixtures" / "media"

SparkQuery = Callable[[SparkSession, str], DataFrame]

# registry: name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def q(name: str, oracle: str | None):
    def deco(fn: SparkQuery):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def battery_oracle(name: str) -> str:
    """The registered oracle SQL for ``name`` — for queries whose Spark
    path IS ``spark.sql`` of the same ANSI text (correlated-subquery
    shapes the DataFrame API cannot express).  The differential then
    pins that both engines agree on the same SQL, dialect-neutrally."""
    return _REGISTRY[name][1]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver-provided table, normalizing ``events.ts`` to epoch-ns
    longs whatever the physical parquet type is: timestamp[ns] arrives as
    long via nanosAsLong, timestamp[us]/[ms] arrive as TIMESTAMP(_NTZ) and
    are converted with a tz-independent timestampdiff (every downstream
    query derives µs via ``ts DIV 1000``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = dict(df.dtypes).get("ts", "bigint")
        if dt == "timestamp":
            # TIMESTAMP_LTZ (isAdjustedToUTC parquet): unix_micros reads
            # the instant directly — an LTZ->NTZ cast here would shift by
            # the session timezone on non-UTC drivers
            df = df.withColumn("ts", F.expr("unix_micros(ts) * 1000"))
        elif dt != "bigint":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                    " cast(ts as timestamp_ntz)) * 1000"
                ),
            )
    return df


def t_spread(
    spark: SparkSession, sf_dir: str, name: str, parts: int | None = None
) -> DataFrame:
    """``t`` + spread for CPU-heavy map stages (hashing/shingling/folding).

    A small single-file parquet arrives as ONE input partition, which
    serializes an embarrassingly-parallel operator onto one core (measured:
    simhash pairs at sf0.1 went >9 min -> 7 s with 32 partitions).  The
    repartition is CONDITIONAL: at real scale the scan already has >= cores
    partitions (maxPartitionBytes), so this is a no-op there — we never
    force a shuffle of 100 TB of text.

    ``parts`` caps the spread below full parallelism: Arrow-kernel stages
    (mapInPandas) pay a per-task Python round-trip, so a tiny input split
    32 ways spends more on task scheduling than compute (measured: the
    IVF index pass at sf0.1's 2000 vectors, 1.9 s at 32 parts vs 1.1 s
    at 8) — while text folds with real per-row CPU still want every
    core."""
    df = t(spark, sf_dir, name)
    p = spark.sparkContext.defaultParallelism
    if parts is not None:
        p = min(parts, p)
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


# ---------------------------------------------------------------------------
# Relational coverage over the driver tables (SURVEY.md §2.B)
# ---------------------------------------------------------------------------


@q(
    "rel_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           CAST((2 * sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100) AS BIGINT))
                              AS HUGEINT)) + 100) // 200 AS DOUBLE) / 100
                                                                        AS sum_disc_price,
           CAST((2 * sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100) AS BIGINT))
                              * (100 + CAST(round(l_tax * 100) AS BIGINT))
                              AS HUGEINT)) + 10000) // 20000 AS DOUBLE) / 100
                                                                        AS sum_charge,
           CAST(sum(CAST(l_quantity      AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_price,
           CAST(sum(CAST(l_discount      AS DECIMAL(18,8))) AS DOUBLE)/count(*) AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash agg.  Partial aggregation is
    map-side (6 groups), so the shuffle carries ~#partitions*6 rows — scale
    invariant.  Filter + 7-column projection push to the parquet scan.

    sum_disc_price/sum_charge accumulate EXACTLY: their true values have
    scale 4/6, so a double-space round(,2) can land on a decimal tie
    (x.xx50…) where Spark (shortest-repr half-up) and other engines
    (binary-value round) disagree — the doc_bigram_fluency failure class.
    The exact path is integer micro-units: per-row LONG multiplies
    (cents x (100-disc) [x (100+tax)] — codegen'd long arithmetic, ~free
    vs the 5x-slower DECIMAL-multiply chain that was here first), summed
    into DECIMAL(38,0) because the e4/e6 unit sums overflow INT64 around
    TPC-H sf~300/sf~100 and a 100 TB corpus needs the wide accumulator
    regardless; the half-up round back to scale 2 is a DECIMAL DIV
    (ROUNDING_AUDIT.md pattern).  sum_qty (integer quantities) and
    sum_base_price (scale-2 prices) cannot tie at digit 3 and stay on
    the cheap double path."""
    li = t(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    t100 = F.round(F.col("l_tax") * 100).cast("long")
    e4 = cents * (100 - d100)
    e6 = e4 * (100 + t100)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(e4.cast("decimal(38,0)")).alias("_s_e4"),
            F.sum(e6.cast("decimal(38,0)")).alias("_s_e6"),
            # avgs of decimal-valued data: exact decimal sum / count —
            # order-independent, no rounding-tie risk (money-like values make
            # round(avg) land exactly on rounding boundaries).
            (F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(18,8)")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            # half-up back to scale 2 via DECIMAL DIV on the exact sums,
            # then /100 of the exact quotient — identical nearest double
            # in every engine
            (
                F.expr("(2 * _s_e4 + 100) DIV 200").cast("double") / 100
            ).alias("sum_disc_price"),
            (
                F.expr("(2 * _s_e6 + 10000) DIV 20000").cast("double") / 100
            ).alias("sum_charge"),
            "avg_qty",
            "avg_price",
            "avg_disc",
            "count_order",
        )
    )


@q(
    "rel_top_customers",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_spent,
           count(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spent DESC, c_custkey
    LIMIT 20
    """,
)
def rel_top_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Join + agg + top-k.  Catalyst broadcasts customer when small; at
    100 TB both sides shuffle on custkey but the agg pre-shrinks; top-k is
    TakeOrderedAndProject (no global sort materialization)."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double") / 100)
            .alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(20)
    )


@q(
    "rel_regional_revenue",
    """
    SELECT r_name,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
           count(DISTINCT c_custkey)   AS n_customers,
           count(*)                    AS n_orders
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    GROUP BY r_name
    """,
)
def rel_regional_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Star-join: region and nation are broadcast explicitly (they are
    O(10-100) rows at ANY scale factor — never shuffle a fact table to join
    a dimension).  Only the customer⋈orders equi-join shuffles."""
    r, n = F.broadcast(t(spark, sf, "region")), F.broadcast(t(spark, sf, "nation"))
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy("r_name")
        .agg(
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double") / 100)
            .alias("revenue"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@q(
    "rel_orders_per_customer",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def rel_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join preserving zero-order customers; count(col) skips the
    nulls the outer join introduces."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@q(
    "rel_semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def rel_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS -> left_semi: no row multiplication, the probe side streams."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return c.join(
        o.where(F.col("o_orderstatus") == "F"),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_name")


@q(
    "rel_anti_join",
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def rel_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@q(
    "rel_full_outer_nation_counts",
    """
    SELECT coalesce(s.nk, c.nk) AS nationkey,
           coalesce(s.n_suppliers, 0) AS n_suppliers,
           coalesce(c.n_customers, 0) AS n_customers
    FROM (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
    FULL OUTER JOIN
         (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY c_nationkey) c
    ON s.nk = c.nk
    """,
)
def rel_full_outer_nation_counts(spark: SparkSession, sf: str) -> DataFrame:
    s = (
        t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    c = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    return s.join(c, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
    )


@q(
    "rel_event_deltas",
    """
    SELECT user_id, event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS delta_us
    FROM events
    QUALIFY delta_us IS NOT NULL
    """,
)
def rel_event_deltas(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user inter-event gap — the Ethereum block-delta pattern on a
    partitionable key: the window parallelizes across users (no global
    sort), unlike the reference's chain-global self-join.  Deltas are in
    microseconds: DuckDB timestamps are µs-precision, so the ns tail of the
    parquet values exists only on the Spark side and must be truncated."""
    ev = t(spark, sf, "events")
    us = F.expr("ts DIV 1000")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    return (
        ev.withColumn("us", us)
        .withColumn("delta_us", F.col("us") - F.lag("us").over(w))
        .where(F.col("delta_us").isNotNull())
        .select("user_id", "event_id", "delta_us")
    )


@q(
    "rel_event_ntile",
    """
    SELECT bucket, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_value,
           min(value) AS min_value, max(value) AS max_value
    FROM (SELECT value, event_id, ntile(10) OVER (ORDER BY value, event_id) AS bucket FROM events)
    GROUP BY bucket
    """,
)
def rel_event_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """ntile bucketing (use-cases.sql:32 pattern).  Total order tie-broken by
    event_id; global window is inherent to ntile semantics."""
    ev = t(spark, sf, "events")
    w = Window.orderBy("value", "event_id")
    return (
        ev.withColumn("bucket", F.ntile(10).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@q(
    "rel_window_topn",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def rel_window_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Top-N per group via row_number: Spark's WindowGroupLimit pushes the
    rn<=3 limit into the shuffle (partial top-k per map task)."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@q(
    "rel_window_running",
    """
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 AS cum_spend
    FROM orders
    """,
)
def rel_window_running(spark: SparkSession, sf: str) -> DataFrame:
    """Running total with an explicit ROWS frame: accumulation order is fixed
    by the frame, so double results are bit-stable across engines."""
    o = t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w).cast("double") / 100)
        .alias("cum_spend"),
    )


@q(
    "rel_rollup_revenue",
    """
    SELECT r_name, n_name, count(*) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100 AS acctbal_sum
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rel_rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    r, n = F.broadcast(t(spark, sf, "region")), F.broadcast(t(spark, sf, "nation"))
    c = t(spark, sf, "customer")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double") / 100)
            .alias("acctbal_sum"),
        )
    )


@q(
    "rel_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def rel_cube_orders(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double") / 100)
        .alias("total"),
    )


@q(
    "rel_distinct_segments",
    """
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey) AS n_nations,
           count(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def rel_distinct_segments(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


@q(
    "rel_set_ops",
    """
    SELECT custkey FROM (
      (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
      INTERSECT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
      EXCEPT
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    )
    """,
)
def rel_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """UNION/INTERSECT/EXCEPT with set (distinct) semantics, composed in SQL
    evaluation order: ((A UNION B) INTERSECT C) EXCEPT D."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    pos = c.where(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    auto = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    return a.union(b).distinct().intersect(pos).subtract(auto)


@q(
    "rel_scalar_subquery",
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def rel_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    avg_bal = c.select(F.avg("c_acctbal").alias("a"))
    return c.join(avg_bal).where(F.col("c_acctbal") > F.col("a")).select(
        "c_custkey", "c_acctbal"
    )


@q(
    "rel_expr_project",
    """
    SELECT o_orderkey,
           year(o_orderdate)  AS order_year,
           month(o_orderdate) AS order_month,
           CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent'
                WHEN o_orderpriority LIKE '2%' THEN 'high'
                ELSE 'normal' END AS pri_class,
           lower(o_orderstatus) AS status_lower,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_bucket,
           substr(o_orderpriority, 1, 1) AS pri_digit
    FROM orders
    """,
)
def rel_expr_project(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-function surface: date parts, CASE, LIKE, string ops,
    arithmetic — all whole-stage-codegen'd, no shuffle at all."""
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.when(F.col("o_orderpriority").like("1%"), "urgent")
        .when(F.col("o_orderpriority").like("2%"), "high")
        .otherwise("normal")
        .alias("pri_class"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_bucket"),
        F.substring("o_orderpriority", 1, 1).alias("pri_digit"),
    )


@q(
    "rel_having",
    """
    SELECT n_name, count(*) AS n_customers
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING count(*) > 5
    """,
)
def rel_having(spark: SparkSession, sf: str) -> DataFrame:
    n, c = F.broadcast(t(spark, sf, "nation")), t(spark, sf, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .where(F.col("n_customers") > 5)
    )


@q(
    "rel_stats",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(stddev_samp(l_extendedprice), 4)      AS price_stddev,
           CAST(sum(CAST(l_tax AS DECIMAL(18,8))) AS DOUBLE)/count(*) AS avg_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rel_stats(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        (F.sum(F.col("l_tax").cast("decimal(18,8)")).cast("double") / F.count("*")).alias("avg_tax"),
    )


@q(
    "rel_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS DOUBLE)/count(*) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def rel_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured extraction from the JSON-ish props column via regexp
    (portable across both engines without a JSON extension)."""
    ev = t(spark, sf, "events")
    k = F.regexp_extract("props", r"([0-9]+)", 1).cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        # integer sums are exact in double; plain division is deterministic
        (F.sum(k).cast("double") / F.count("*")).alias("avg_k"),
    )


@q(
    "rel_grouping_sets",
    """
    SELECT r_name, n_name,
           grouping(r_name) AS g_r, grouping(n_name) AS g_n,
           count(*) AS n_customers
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((r_name), (n_name), (r_name, n_name), ())
    """,
)
def rel_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() markers (distinguishes rollup
    nulls from data nulls) — via Spark SQL over temp views."""
    t(spark, sf, "region").createOrReplaceTempView("v_region")
    t(spark, sf, "nation").createOrReplaceTempView("v_nation")
    t(spark, sf, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT r_name, n_name,
               grouping(r_name) AS g_r, grouping(n_name) AS g_n,
               count(*) AS n_customers
        FROM v_region
        JOIN v_nation   ON n_regionkey = r_regionkey
        JOIN v_customer ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((r_name), (n_name), (r_name, n_name), ())
        """
    ).select(
        "r_name",
        "n_name",
        F.col("g_r").cast("int").alias("g_r"),
        F.col("g_n").cast("int").alias("g_n"),
        "n_customers",
    )


@q(
    "rel_lateral_topn",
    """
    SELECT n.n_name, t.o_orderkey, t.o_totalprice
    FROM nation n,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    """,
)
def rel_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table; Spark
    3.4+ lateral join support): per-nation top-2 orders by total price,
    expressed as a dependent subquery instead of a rank window — the
    other standard spelling of grouped top-k, exercised so users
    migrating LATERAL-heavy SQL keep their queries verbatim.  Catalyst
    rewrites the correlated limit into a window-style grouped-limit plan
    (no per-row re-execution); o_totalprice passes through unmodified
    (stored doubles, bit-stable on both engines); tie-break on orderkey
    keeps the top-2 deterministic."""
    t(spark, sf, "nation").createOrReplaceTempView("v_nation")
    t(spark, sf, "orders").createOrReplaceTempView("v_orders")
    t(spark, sf, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM v_nation n,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )


@q(
    "rel_in_exists_subqueries",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 50000)
    """,
)
def rel_in_exists_subqueries(spark: SparkSession, sf: str) -> DataFrame:
    """Uncorrelated IN + correlated EXISTS — both plan as semi-joins."""
    c, n, o = t(spark, sf, "customer"), t(spark, sf, "nation"), t(spark, sf, "orders")
    nat = n.where(F.col("n_regionkey") <= 1).select("n_nationkey")
    big = o.where(F.col("o_totalprice") > 50000)
    return (
        c.join(nat, c.c_nationkey == nat.n_nationkey, "left_semi")
        .join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@q(
    "rel_union_all_bag",
    """
    SELECT custkey, count(*) AS appearances FROM (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
      UNION ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY custkey
    """,
)
def rel_union_all_bag(spark: SparkSession, sf: str) -> DataFrame:
    """UNION ALL bag semantics (vs the set-semantic rel_set_ops)."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    u = c.where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey")
    ).unionAll(
        o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    )
    return u.groupBy("custkey").agg(F.count("*").alias("appearances"))


@q(
    "rel_string_funcs",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           concat_ws('|', p_brand, p_type) AS brand_type,
           len(string_split(p_name, ' ')) AS name_words,
           substr(p_name, 1, 10) AS name_prefix,
           contains(p_type, 'BRASS') AS is_brass
    FROM part
    """,
)
def rel_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split("p_name", " ", -1)).alias("name_words"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
    )


@q(
    "rel_date_arith",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           quarter(o_orderdate) AS q,
           datediff('day', TIMESTAMP '2020-01-01', o_orderdate) AS days_since_2020,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders
    """,
)
def rel_date_arith(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.quarter("o_orderdate").alias("q"),
        F.datediff(F.col("o_orderdate"), F.lit("2020-01-01").cast("timestamp_ntz"))
        .alias("days_since_2020"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).cast("date").alias("due_date"),
    )


@q(
    "rel_pivot_status_priority",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
)
def rel_pivot_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot shape via conditional aggregation (portable across engines,
    and what Spark's pivot() lowers to anyway)."""
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_orderstatus") == "P").alias("n_pending"),
    )


# ---------------------------------------------------------------------------
# Ethereum-domain golden queries (SURVEY.md §2.B corpus) — Spark derives the
# tables from the NESTED chain snapshot through the full decode pipeline; the
# oracle reads the independently-generated golden parquet.  This makes the
# driver's t2 gate a differential test of the whole connector-equivalent path.
# ---------------------------------------------------------------------------


def _eth_tables(spark: SparkSession):
    from presto_ethereum_spark.sources.fixture import EthereumFixtureSource

    src = EthereumFixtureSource(spark, str(ETH / "chain_blocks.parquet"))
    return src


@q(
    "eth_block_time_deltas",
    f"""
    SELECT b.bn, (b.block_timestamp - a.block_timestamp) AS delta
    FROM (SELECT block_number AS bn, block_timestamp
          FROM read_parquet('{ETH}/block.parquet')
          WHERE block_number>=1 AND block_number<=50) AS a
    JOIN (SELECT (block_number-1) AS bn, block_timestamp
          FROM read_parquet('{ETH}/block.parquet')
          WHERE block_number>=2 AND block_number<=51) AS b
    ON a.bn = b.bn
    """,
)
def eth_block_time_deltas(spark: SparkSession, sf: str) -> DataFrame:
    from presto_ethereum_spark.plans import golden

    return golden.block_time_deltas(_eth_tables(spark).table("block"), 1, 50)


@q(
    "eth_avg_block_time_chunks",
    f"""
    WITH X AS (
      SELECT b.bn, (b.block_timestamp - a.block_timestamp) AS delta
      FROM (SELECT block_number AS bn, block_timestamp
            FROM read_parquet('{ETH}/block.parquet')
            WHERE block_number>=1 AND block_number<=2000) AS a
      JOIN (SELECT (block_number-1) AS bn, block_timestamp
            FROM read_parquet('{ETH}/block.parquet')
            WHERE block_number>=2 AND block_number<=2001) AS b
      ON a.bn = b.bn)
    SELECT min(bn) AS chunkstart, avg(delta) AS avg_delta
    FROM (SELECT ntile(10) OVER (ORDER BY bn) AS chunk, * FROM X) AS T
    GROUP BY chunk
    """,
)
def eth_avg_block_time_chunks(spark: SparkSession, sf: str) -> DataFrame:
    from presto_ethereum_spark.plans import golden

    return golden.avg_block_time_by_chunk(_eth_tables(spark).table("block"), 1, 2000, 200)


@q(
    "eth_top_miners",
    f"""
    SELECT block_miner, count(*) AS num,
           CAST(count(*) AS DOUBLE)/100000.0 AS percent
    FROM read_parquet('{ETH}/block.parquet')
    WHERE block_number <= 100000
    GROUP BY block_miner
    ORDER BY num DESC, block_miner
    LIMIT 15
    """,
)
def eth_top_miners(spark: SparkSession, sf: str) -> DataFrame:
    from presto_ethereum_spark.plans import golden

    return golden.top_miners(_eth_tables(spark).table("block"), 100000, 15)


@q(
    "eth_erc20_movement",
    f"""
    SELECT erc20_token,
           printf('%.6e', sum(erc20_value)) AS total_value
    FROM read_parquet('{ETH}/erc20.parquet')
    WHERE erc20_blocknumber >= 100 AND erc20_blocknumber <= 600
    GROUP BY erc20_token
    """,
)
def eth_erc20_movement(spark: SparkSession, sf: str) -> DataFrame:
    """README.md:123-127.  Value magnitudes span 1..1e107 (whole-data parses
    exceed float32 range), so the per-token sum is canonicalized to a
    7-significant-digit scientific string on both sides — absorbs
    engine-specific double summation order."""
    erc20 = _eth_tables(spark).table_for_block_range("erc20", 100, 600)
    return (
        erc20.where(F.col("erc20_blocknumber").between(100, 600))
        .groupBy("erc20_token")
        .agg(F.format_string("%.6e", F.sum("erc20_value")).alias("total_value"))
    )


@q(
    "eth_erc20_movement_getlogs",
    f"""
    SELECT erc20_token,
           printf('%.6e', sum(erc20_value)) AS total_value
    FROM read_parquet('{ETH}/erc20.parquet')
    WHERE erc20_blocknumber >= 100 AND erc20_blocknumber <= 600
    GROUP BY erc20_token
    """,
)
def eth_erc20_movement_getlogs(spark: SparkSession, sf: str) -> DataFrame:
    """The README erc20 aggregation through the LIVE DataSource's bulk
    ``logs_mode=eth_getLogs`` path: one filtered eth_getLogs RPC per
    block-range partition instead of one receipt per transaction
    (EthereumLogLazyIterator.java:39-42) — the cost model a chain-scale
    scan needs.  Same oracle as eth_erc20_movement: the two paths must
    decode identically."""
    from presto_ethereum_spark.sources.rpc import EthereumDataSource

    spark.dataSource.register(EthereumDataSource)
    erc20 = (
        spark.read.format("ethereum")
        .option("table", "erc20")
        .option("path", str(ETH / "chain_blocks.parquet"))
        .option("start_block", 100)
        .option("end_block", 600)
        .option("logs_mode", "eth_getLogs")
        # one partition: the parquet TRANSPORT loads the whole nested
        # fixture per task (a stand-in for a node, not a columnar scan), so
        # more partitions just repeat that load.  A LIVE url= source wants
        # the default 200-block partitions — the RPC cost dominates there.
        .option("blocks_per_partition", 501)
        .load()
    )
    return (
        erc20.groupBy("erc20_token")
        .agg(F.format_string("%.6e", F.sum("erc20_value")).alias("total_value"))
    )


@q(
    "eth_single_token_tail",
    f"""
    SELECT erc20_to AS holder,
           printf('%.6e', sum(erc20_value)) AS total_in,
           CAST(count(*) AS BIGINT) AS n_transfers
    FROM read_parquet('{ETH}/erc20.parquet')
    WHERE erc20_token = 'Xaurum'
    GROUP BY erc20_to
    """,
)
def eth_single_token_tail(spark: SparkSession, sf: str) -> DataFrame:
    """ONE token's transfers over the WHOLE chain through SERVER-side
    address pushdown (VERDICT r11 #4, the reference README's single-token
    use-case, README.md:124-127): ``logs_mode=eth_getLogs`` +
    ``logs_address=<contract>`` puts the emitting-contract filter in the
    RPC request itself, so the scan costs one filtered eth_getLogs per
    block-range partition and only the MATCHING token's logs ever cross
    the wire — no block bodies, no receipts, no client-side discard of
    other tokens' events (rpc.py get_logs; the per-partition RPC count is
    pinned by TestBulkGetLogs.test_single_token_address_pushdown_cost).
    The oracle filters the golden full decode by the token's symbol
    (Xaurum = 0x4df812f6064def1e5e029f1ca858777cc98d2d81, symbols are
    unique in the 42-entry map), so the gate proves the pushed-down read
    decodes bit-identically to filter-after-decode — including the
    fixture's case-varied address spellings, which the transport matches
    case-insensitively like a real node."""
    from presto_ethereum_spark.sources.rpc import EthereumDataSource

    spark.dataSource.register(EthereumDataSource)
    erc20 = (
        spark.read.format("ethereum")
        .option("table", "erc20")
        .option("path", str(ETH / "chain_blocks.parquet"))
        .option("logs_mode", "eth_getLogs")
        .option("logs_address", "0x4df812f6064def1e5e029f1ca858777cc98d2d81")
        # one partition: the parquet transport loads the nested fixture
        # per task (see eth_erc20_movement_getlogs); a live url= source
        # wants the default 200-block partitions
        .option("blocks_per_partition", 4000)
        .load()
    )
    return (
        erc20.groupBy(F.col("erc20_to").alias("holder"))
        .agg(
            F.format_string("%.6e", F.sum("erc20_value")).alias("total_in"),
            F.count("*").alias("n_transfers"),
        )
    )


@q(
    "eth_erc20_value_hex_rows",
    f"""
    WITH lg AS (
      SELECT unnest(t.logs) AS l
      FROM (SELECT unnest(transactions) AS t
            FROM read_parquet('{ETH}/chain_blocks.parquet'))
    ),
    raw AS (
      SELECT l.topics AS topics, l.data AS data,
             l.transactionhash AS txh, l.blocknumber AS bn,
             len(l.topics) AS nt, (length(l.data) - 2) // 64 AS nw
      FROM lg
      WHERE lower(l.topics[1]) =
            '0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef'
    ),
    kept AS (
      SELECT *,
             CASE WHEN nt >= 3 THEN data
                  ELSE concat('0x', substr(data, 3 + 64 * (3 - nt), 64))
             END AS vword,
             CASE WHEN nt >= 2 THEN topics[2]
                  ELSE concat('0x', substr(data, 3, 64)) END AS from32,
             CASE WHEN nt >= 3 THEN topics[3]
                  WHEN nt = 2 THEN concat('0x', substr(data, 3, 64))
                  ELSE concat('0x', substr(data, 67, 64)) END AS to32
      FROM raw
      WHERE nt >= 3 OR nt + nw = 4
    )
    SELECT txh AS erc20_txhash, bn AS erc20_blocknumber,
           concat('0x', substr(from32, length(from32) - 39, 40)) AS erc20_from,
           concat('0x', substr(to32, length(to32) - 39, 40)) AS erc20_to,
           CASE WHEN regexp_matches(lower(substr(vword, 3)),
                                    '^[0-9a-f]{{1,64}}$')
                THEN concat('0x', lpad(lower(substr(vword, 3)), 64, '0'))
                ELSE NULL END AS erc20_value_hex
    FROM kept
    """,
)
def eth_erc20_value_hex_rows(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT uint256 through the REGISTERED TABLE SURFACE (VERDICT r12
    #4): ``value_mode=u256_hex`` on the live ``ethereum`` format appends
    the canonical ``erc20_value_hex`` column (0x + 64 lowercase hex — the
    same representation the limb-ledger family consumes), so SQL users
    get exactness without importing Python helpers, surfaced exactly the
    way logs_mode/logs_address are.  The column is NULL where the wire
    carries no exact uint256 (empty ERC-721 id-in-data payloads, >64-digit
    bodies) while the reference-parity double column keeps its lossy
    0.0/huge fallbacks — the two contracts side by side, per row.  Graded
    ROW-LEVEL over the full fixture chain: the DuckDB oracle re-derives
    the entire cursor semantics (case-insensitive topic match, weird-event
    drop via nt+nw==4, unindexed-param promotion with the value taken
    from the post-promotion word, h32->h20 narrowing) independently from
    the nested chain parquet — all 5808 golden rows, all four wire
    shapes.  Scale: a pure per-row projection on the scan (no shuffle);
    the hex canonicalization is O(word) string work in the same pass that
    decodes the double."""
    from presto_ethereum_spark.sources.rpc import EthereumDataSource

    spark.dataSource.register(EthereumDataSource)
    erc20 = (
        spark.read.format("ethereum")
        .option("table", "erc20")
        .option("path", str(ETH / "chain_blocks.parquet"))
        .option("value_mode", "u256_hex")
        # one partition: the parquet transport loads the nested fixture
        # per task (see eth_erc20_movement_getlogs); a live url= source
        # wants the default 200-block partitions
        .option("blocks_per_partition", 4000)
        .load()
    )
    return erc20.select(
        "erc20_txhash",
        "erc20_blocknumber",
        "erc20_from",
        "erc20_to",
        "erc20_value_hex",
    )


@q(
    "eth_top_senders",
    f"""
    SELECT tx_from,
           CAST(sum(CAST(tx_value AS DECIMAL(38, 0))) AS DOUBLE) AS total_wei,
           count(*) AS n_tx
    FROM read_parquet('{ETH}/transaction.parquet')
    GROUP BY tx_from
    ORDER BY total_wei DESC, tx_from
    LIMIT 20
    """,
)
def eth_top_senders(spark: SparkSession, sf: str) -> DataFrame:
    """Exact order-independent wei sums: cast to DECIMAL(38,0) pre-sum (tx
    values <= ~1e21, sums << 1e38), narrow to double only for output."""
    tx = _eth_tables(spark).table("transaction")
    return (
        tx.groupBy("tx_from")
        .agg(
            F.sum(F.col("tx_value").cast("decimal(38,0)"))
            .cast("double")
            .alias("total_wei"),
            F.count("*").alias("n_tx"),
        )
        .orderBy(F.desc("total_wei"), "tx_from")
        .limit(20)
    )


@q(
    "eth_gas_by_block_bucket",
    f"""
    SELECT CAST(floor(tx_blocknumber / 100) AS BIGINT) AS bucket,
           count(*) AS n_tx,
           sum(tx_gasprice)/count(*) AS avg_gasprice,
           sum(tx_gas)/count(*) AS avg_gas
    FROM read_parquet('{ETH}/transaction.parquet')
    GROUP BY bucket
    """,
)
def eth_gas_by_block_bucket(spark: SparkSession, sf: str) -> DataFrame:
    tx = _eth_tables(spark).table("transaction")
    return (
        tx.groupBy(
            F.floor(F.col("tx_blocknumber") / 100).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_tx"),
            # gas/gasprice are integer-valued doubles; per-bucket sums stay
            # below 2^53 so the double sum is exact and division-deterministic
            (F.sum("tx_gasprice") / F.count("*")).alias("avg_gasprice"),
            (F.sum("tx_gas") / F.count("*")).alias("avg_gas"),
        )
    )


@q(
    "eth_contract_creations",
    f"""
    SELECT tx_blocknumber, count(*) AS n_creations
    FROM read_parquet('{ETH}/transaction.parquet')
    WHERE tx_to IS NULL
    GROUP BY tx_blocknumber
    """,
)
def eth_contract_creations(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-semantics check: contract creations are the rows where the
    reference's getTo() returns null (EthereumMetadata.java:130)."""
    tx = _eth_tables(spark).table("transaction")
    return (
        tx.where(F.col("tx_to").isNull())
        .groupBy("tx_blocknumber")
        .agg(F.count("*").alias("n_creations"))
    )


@q(
    "eth_token_flows",
    f"""
    SELECT erc20_token, erc20_from, erc20_to, count(*) AS n_transfers
    FROM read_parquet('{ETH}/erc20.parquet')
    WHERE erc20_token NOT LIKE 'ERC20(%'
    GROUP BY erc20_token, erc20_from, erc20_to
    HAVING count(*) >= 1
    """,
)
def eth_token_flows(spark: SparkSession, sf: str) -> DataFrame:
    erc20 = _eth_tables(spark).table("erc20")
    return (
        erc20.where(~F.col("erc20_token").like("ERC20(%"))
        .groupBy("erc20_token", "erc20_from", "erc20_to")
        .agg(F.count("*").alias("n_transfers"))
    )


def _erc20_transfer_deltas(chain: DataFrame) -> DataFrame:
    """Shared ledger-delta decode for the balance family — lives in
    sources/decode.py so the streaming balance upsert reuses the identical
    exact-Decimal path (one decode, three graded consumers)."""
    from presto_ethereum_spark.sources.decode import erc20_transfer_deltas

    return erc20_transfer_deltas(chain)


_BALANCES_ORACLE = f"""
    WITH lg AS (
      SELECT unnest(t.logs) AS l
      FROM (SELECT unnest(transactions) AS t
            FROM read_parquet('{ETH}/chain_blocks.parquet'))
    ),
    tr AS (
      SELECT l.address AS token_address,
             concat('0x', substr(l.topics[2], length(l.topics[2]) - 39, 40))
               AS from_addr,
             concat('0x', substr(l.topics[3], length(l.topics[3]) - 39, 40))
               AS to_addr,
             CAST(CAST(concat('0x', substr(l.data, 37, 15)) AS BIGINT)
                  AS HUGEINT) * 1152921504606846976
               + CAST(CAST(concat('0x', substr(l.data, 52, 15)) AS BIGINT)
                      AS HUGEINT) AS wei
      FROM lg
      WHERE lower(l.topics[1]) =
            '0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef'
        AND len(l.topics) >= 3
        AND length(l.data) = 66
        AND substr(l.data, 3, 34) = repeat('0', 34)
    ),
    d AS (
      SELECT token_address, to_addr AS holder, wei AS delta, 1 AS is_in
      FROM tr
      UNION ALL
      SELECT token_address, from_addr, -wei, 0 FROM tr
    )
    SELECT token_address, holder,
           CAST(sum(is_in) AS BIGINT) AS n_in,
           CAST(sum(1 - is_in) AS BIGINT) AS n_out,
           CAST(CAST(sum(delta) AS DECIMAL(38,0)) AS VARCHAR) AS balance_wei
    FROM d GROUP BY token_address, holder
    """


@q("eth_erc20_balances", _BALANCES_ORACLE)
def eth_erc20_balances(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(token, holder) LEDGER RECONSTRUCTION from standard Transfer
    events — the chain-accounting read-out the reference's ERC-20 view
    feeds (credit each `to`, debit each `from`, exact DECIMAL(38,0) wei
    per eth_erc20_exact_flows' Decimal-mode contract, so balances carry
    no double mantissa loss at any holder size; the final read-out is the
    canonical DIGIT STRING of that exact decimal — engines disagree on how
    they surface 128-bit decimals to clients (DuckDB's pandas bridge
    narrows them to float64, CORRECTNESS_r09), and a plain base-10 string
    is the one representation every client hashes identically).  Negative
    balances are
    REPORTED, not dropped: a holder spending more than the scanned range
    credited is the standard evidence the scan's block range starts
    after the holder's funding (mints from the zero address show up as
    the zero address's negative ledger by the same rule).  Addresses
    narrow h32->h20 exactly as the connector decode does
    (decode.h32_to_h20_col).  One union of two projections over the same
    decoded scan, one (token, holder) shuffle with map-side partials —
    at chain scale this is the incremental balance-snapshot job: merge
    yesterday's balances with today's deltas by the same additive
    state."""
    d = _erc20_transfer_deltas(_eth_tables(spark).chain)
    return d.groupBy("token_address", "holder").agg(
        F.sum("is_in").cast("long").alias("n_in"),
        F.sum(1 - F.col("is_in")).cast("long").alias("n_out"),
        F.sum("delta").cast("decimal(38,0)").cast("string").alias("balance_wei"),
    )


@q("stream_erc20_balance_upsert", _BALANCES_ORACLE)
def stream_erc20_balance_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """The balance ledger as a STANDING PIPELINE
    (streaming/chain.run_balance_upsert): raw-block micro-batches decode
    through the same exact-Decimal path as eth_erc20_balances, reduce to
    additive per-(token, holder) partials, and foreachBatch-merge into a
    compact-and-swap state table — graded against the identical one-pass
    oracle, so the hash gate proves settled-stream == batch ledger.  The
    graded run streams the snapshot as THREE block-range micro-batches
    (maxFilesPerTrigger=1), exercising a real multi-generation merge;
    addition's commutativity makes the result split-invariant by the
    same algebra as the batch snapshot-merge entry."""
    from presto_ethereum_spark.streaming.chain import run_balance_upsert

    return run_balance_upsert(spark, str(ETH / "chain_blocks.parquet"))


@q("stream_balance_rpc_tail", _BALANCES_ORACLE)
def stream_balance_rpc_tail(spark: SparkSession, sf: str) -> DataFrame:
    """The balance ledger fed by the RPC SOURCE (VERDICT r10 #4): the
    ethereum-stream data source's raw-log table tails Transfer logs
    through the canned parquet transport — each micro-batch is ONE bulk
    eth_getLogs per block range, wire shape untouched — and
    run_balance_upsert merges them through
    decode.erc20_transfer_deltas_from_logs, the SAME exact-Decimal rules
    the fixture-side entries use.  Graded against the identical one-pass
    oracle as eth_erc20_balances, so the hash gate proves the standing
    pipeline is source-agnostic: chain-dump micro-batches
    (stream_erc20_balance_upsert) and live-RPC log micro-batches settle
    to the same ledger bit-for-bit.  max_blocks_per_batch=800 over the
    2,400-block fixture makes a REAL 3-generation merge under the
    incremental-batch schedule (drain_runs=3: one availableNow run per
    rate-limited micro-batch, each resuming the shared checkpoint — a
    genuine restart-recovery per batch); cost per batch is one filtered
    eth_getLogs (no block bodies, no receipts —
    TestBalanceUpsertRpcTail pins the count)."""
    from presto_ethereum_spark.sources.decode import (
        erc20_transfer_deltas_from_logs,
    )
    from presto_ethereum_spark.streaming.chain import (
        EthereumStreamDataSource,
        run_balance_upsert,
    )

    spark.dataSource.register(EthereumStreamDataSource)
    stream = (
        spark.readStream.format("ethereum-stream")
        .option("path", str(ETH / "chain_blocks.parquet"))
        .option("table", "log")
        .option("max_blocks_per_batch", 800)
        .load()
    )
    return run_balance_upsert(
        spark,
        "",
        source=stream,
        deltas_fn=erc20_transfer_deltas_from_logs,
        drain_runs=3,
    )


@q("stream_balance_restart", _BALANCES_ORACLE)
def stream_balance_restart(spark: SparkSession, sf: str) -> DataFrame:
    """DURABLE KILL-AND-RESUME for the balance pipeline (VERDICT r11 #2):
    drain 2 of 4 block-range micro-batches with a persistent state root,
    DISCARD the query and all driver-side Python state, stage the
    remaining ranges, and resume from the same checkpoint + recovered
    generation chain in a brand-new run
    (streaming/chain.run_balance_restart).  Graded against the identical
    one-pass batch oracle as eth_erc20_balances: dropped recovered state
    would lose the early blocks' transfers, a failed checkpoint resume
    would double-count the drained files — either is a hash mismatch, so
    the gate covers both halves of the durability contract.  This
    upgrades the balance family's documented weakest link (within-run
    idempotency only) to the full production claim."""
    from presto_ethereum_spark.streaming.chain import run_balance_restart

    return run_balance_restart(
        spark, str(ETH / "chain_blocks.parquet"), split_ranges=4, kill_after=2
    )


@q(
    "eth_balance_snapshot_merge",
    f"""
    WITH lg AS (
      SELECT unnest(t.logs) AS l
      FROM (SELECT unnest(transactions) AS t
            FROM read_parquet('{ETH}/chain_blocks.parquet'))
    ),
    tr AS (
      SELECT l.address AS token_address,
             concat('0x', substr(l.topics[2], length(l.topics[2]) - 39, 40))
               AS from_addr,
             concat('0x', substr(l.topics[3], length(l.topics[3]) - 39, 40))
               AS to_addr,
             CAST(CAST(concat('0x', substr(l.data, 37, 15)) AS BIGINT)
                  AS HUGEINT) * 1152921504606846976
               + CAST(CAST(concat('0x', substr(l.data, 52, 15)) AS BIGINT)
                      AS HUGEINT) AS wei,
             l.blocknumber AS bn
      FROM lg
      WHERE lower(l.topics[1]) =
            '0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef'
        AND len(l.topics) >= 3
        AND length(l.data) = 66
        AND substr(l.data, 3, 34) = repeat('0', 34)
    ),
    mid AS (SELECT max(bn) // 2 AS m FROM tr),
    d AS (
      SELECT token_address, to_addr AS holder, wei AS delta, bn FROM tr
      UNION ALL
      SELECT token_address, from_addr, -wei, bn FROM tr
    )
    SELECT token_address, holder,
           CAST(sum(CASE WHEN bn <= m THEN 1 ELSE 0 END) AS BIGINT)
             AS n_snapshot_events,
           CAST(sum(CASE WHEN bn > m THEN 1 ELSE 0 END) AS BIGINT)
             AS n_incremental_events,
           CAST(CAST(sum(delta) AS DECIMAL(38,0)) AS VARCHAR) AS balance_wei
    FROM d, mid GROUP BY token_address, holder
    """,
)
def eth_balance_snapshot_merge(spark: SparkSession, sf: str) -> DataFrame:
    """INCREMENTAL balance maintenance: aggregate the ledger up to the
    chain midpoint into a snapshot state, aggregate the blocks after it
    into a delta state, and MERGE the two by re-aggregating the additive
    (count, exact-wei-sum) pairs — the daily job that keeps a 100 TB
    chain's balance table fresh without rescanning history.  The oracle
    computes the same (token, holder) ledger in ONE pass over the full
    range, so the hash gate is the algebraic claim itself: merged
    partial states == direct recompute, for every holder, at exact
    DECIMAL(38,0) precision (canonical digit-string read-out, the
    eth_erc20_balances contract).  At scale both legs shuffle once on
    (token, holder) with map-side partials and the merge is a union of
    two already-aggregated tables — the snapshot leg is yesterday's
    materialization read back, not a rescan."""
    d = _erc20_transfer_deltas(_eth_tables(spark).chain)
    mid = d.agg(
        F.floor(F.max("block_number") / 2).cast("long").alias("m")
    )
    parts = []
    for tag, cond in (
        ("snap", F.col("block_number") <= F.col("m")),
        ("inc", F.col("block_number") > F.col("m")),
    ):
        leg = (
            d.join(F.broadcast(mid))
            .where(cond)
            .groupBy("token_address", "holder")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("delta").alias("part_wei"),
            )
            .select(
                "token_address",
                "holder",
                (F.col("n_events") if tag == "snap" else F.lit(0)).alias(
                    "n_snapshot_events"
                ),
                (F.col("n_events") if tag == "inc" else F.lit(0)).alias(
                    "n_incremental_events"
                ),
                "part_wei",
            )
        )
        parts.append(leg)
    merged = parts[0].unionByName(parts[1])
    return merged.groupBy("token_address", "holder").agg(
        F.sum("n_snapshot_events").cast("long").alias("n_snapshot_events"),
        F.sum("n_incremental_events").cast("long").alias("n_incremental_events"),
        F.sum("part_wei").cast("decimal(38,0)").cast("string").alias("balance_wei"),
    )


# Shared DuckDB-side u256 limb machinery (the oracle half of the 5-limb
# representation; the Spark half is sources/decode.hex_to_u256_limb_cols).
# _U256_TR_CTE: wire logs -> per-transfer limbs; _u256_carry_chain: floored
# carry normalization over grouped limb sums (DuckDB // truncates, so the
# floored div is built from the non-negative mod); _U256_HEX: canonical
# 0x + 64-hex read-out.  Base 16^15 = 1152921504606846976; every
# intermediate fits HUGEINT.
_U256_TR_CTE = f"""
    tr AS (
      SELECT address AS token_address,
             concat('0x', substr(topics[2], length(topics[2]) - 39, 40))
               AS from_addr,
             concat('0x', substr(topics[3], length(topics[3]) - 39, 40))
               AS to_addr,
             CAST(CAST(concat('0x', substr(data, 3, 4)) AS BIGINT)
                  AS HUGEINT) AS l4,
             CAST(CAST(concat('0x', substr(data, 7, 15)) AS BIGINT)
                  AS HUGEINT) AS l3,
             CAST(CAST(concat('0x', substr(data, 22, 15)) AS BIGINT)
                  AS HUGEINT) AS l2,
             CAST(CAST(concat('0x', substr(data, 37, 15)) AS BIGINT)
                  AS HUGEINT) AS l1,
             CAST(CAST(concat('0x', substr(data, 52, 15)) AS BIGINT)
                  AS HUGEINT) AS l0,
             blocknumber
      FROM read_parquet('{ETH}/u256_logs.parquet')
      WHERE lower(topics[1]) =
            '0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef'
        AND len(topics) >= 3
        AND length(data) = 66
    )"""

_U256_B = "1152921504606846976"


def _u256_carry_chain(src: str, s: str = "s", m: str = "m", v: str = "v",
                      n: str = "n") -> str:
    """CTE chain {n}0..{n}4 over ``src`` (which must expose {s}0..{s}4 limb
    sums): floored carries low->top, yielding {m}0..{m}3 in [0, 16^15) and
    {v}4.  Name prefixes are parametrized so the SIGNED read-out oracle can
    run the chain twice in one WITH-list (as-is for the sign, negated for
    the magnitude) without a self-join."""
    B = _U256_B
    return f"""
    {n}0 AS (
      SELECT *, (({s}0 % {B} + {B}) % {B}) AS {m}0 FROM {src}
    ),
    {n}1 AS (
      SELECT *, {s}1 + ({s}0 - {m}0) // {B} AS {v}1 FROM {n}0
    ),
    {n}2 AS (
      SELECT *,
             (({v}1 % {B} + {B}) % {B}) AS {m}1,
             {s}2 + ({v}1 - (({v}1 % {B} + {B}) % {B})) // {B} AS {v}2
      FROM {n}1
    ),
    {n}3 AS (
      SELECT *,
             (({v}2 % {B} + {B}) % {B}) AS {m}2,
             {s}3 + ({v}2 - (({v}2 % {B} + {B}) % {B})) // {B} AS {v}3
      FROM {n}2
    ),
    {n}4 AS (
      SELECT *,
             (({v}3 % {B} + {B}) % {B}) AS {m}3,
             {s}4 + ({v}3 - (({v}3 % {B} + {B}) % {B})) // {B} AS {v}4
      FROM {n}3
    )"""


_U256_HEX = """
           concat('0x',
                  lpad(printf('%x', CAST(v4 AS BIGINT)), 4, '0'),
                  lpad(printf('%x', CAST(m3 AS BIGINT)), 15, '0'),
                  lpad(printf('%x', CAST(m2 AS BIGINT)), 15, '0'),
                  lpad(printf('%x', CAST(m1 AS BIGINT)), 15, '0'),
                  lpad(printf('%x', CAST(m0 AS BIGINT)), 15, '0'))"""

_U256_BALANCES_ORACLE = f"""
    WITH {_U256_TR_CTE},
    d AS (
      SELECT token_address, to_addr AS holder, l4, l3, l2, l1, l0 FROM tr
      UNION ALL
      SELECT token_address, from_addr, -l4, -l3, -l2, -l1, -l0 FROM tr
    ),
    s AS (
      SELECT token_address, holder,
             sum(l4) AS s4, sum(l3) AS s3, sum(l2) AS s2,
             sum(l1) AS s1, sum(l0) AS s0,
             CAST(count(*) AS BIGINT) AS n_transfers
      FROM d
      WHERE holder <> concat('0x', repeat('0', 40))
      GROUP BY token_address, holder
    ),
    {_u256_carry_chain('s')}
    SELECT token_address, holder,
           {_U256_HEX} AS balance_hex,
           n_transfers
    FROM n4
    """


_U256_STREAM_ORACLE = f"""
    WITH {_U256_TR_CTE},
    d AS (
      SELECT token_address, to_addr AS holder, 1 AS is_in,
             l4, l3, l2, l1, l0 FROM tr
      UNION ALL
      SELECT token_address, from_addr, 0, -l4, -l3, -l2, -l1, -l0 FROM tr
    ),
    s AS (
      SELECT token_address, holder,
             CAST(sum(is_in) AS BIGINT) AS n_in,
             CAST(sum(1 - is_in) AS BIGINT) AS n_out,
             sum(l4) AS s4, sum(l3) AS s3, sum(l2) AS s2,
             sum(l1) AS s1, sum(l0) AS s0
      FROM d
      WHERE holder <> concat('0x', repeat('0', 40))
      GROUP BY token_address, holder
    ),
    {_u256_carry_chain('s')}
    SELECT token_address, holder, n_in, n_out,
           {_U256_HEX} AS balance_hex
    FROM n4
    """


@q("stream_u256_balance_upsert", _U256_STREAM_ORACLE)
def stream_u256_balance_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """The FULL-uint256 ledger as a STANDING PIPELINE: wire-log
    micro-batches decode through erc20_transfer_deltas_u256 (5 signed
    base-16^15 limbs, no magnitude guard) and foreachBatch-merge into
    limb-sum state (streaming/chain.u256_state_spec) — per-limb addition
    is commutative/associative, so the settled state equals the one-pass
    batch ledger under ANY micro-batch split, with carry normalization
    applied ONCE at read-out.  This marries the round's two claims: the
    exact-uint256 representation AND the mergeable-state streaming
    algebra, graded against an independent DuckDB HUGEINT recompute on
    values up to within 2^16 of uint256-max.  The graded run streams the
    log fixture as THREE pmod-staged micro-batches
    (maxFilesPerTrigger=1), a real multi-generation merge."""
    import shutil
    import tempfile

    from presto_ethereum_spark.sources.decode import erc20_transfer_deltas_u256
    from presto_ethereum_spark.streaming.chain import (
        run_balance_upsert,
        u256_state_spec,
    )

    logs = spark.read.parquet(str(ETH / "u256_logs.parquet"))
    schema = logs.schema
    zero = "0x" + "0" * 40
    root = tempfile.mkdtemp(prefix="u256_stream_")
    try:
        for i in range(3):
            logs.where(F.pmod(F.col("blocknumber"), F.lit(3)) == i).coalesce(
                1
            ).write.mode("overwrite").parquet(f"{root}/in/part_{i}")
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(f"{root}/in")
        )
        return run_balance_upsert(
            spark,
            str(ETH / "u256_logs.parquet"),
            source=src,
            deltas_fn=lambda df: erc20_transfer_deltas_u256(df).where(
                F.col("holder") != zero
            ),
            state_spec=u256_state_spec(),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@q("stream_u256_balance_restart", _U256_STREAM_ORACLE)
def stream_u256_balance_restart(spark: SparkSession, sf: str) -> DataFrame:
    """KILL-AND-RESUME for the FULL-uint256 ledger (VERDICT r12 #3): the
    durable-restart contract graded for the DECIMAL(38,0) algebra by
    stream_balance_restart, re-run with the u256 state spec — 4 staged
    wire-log micro-batches, a hard kill after 2 (query object and driver-
    side generation list discarded; only the on-disk checkpoint + the
    _SUCCESS-marked generation chain survive), then a brand-new
    run_balance_upsert call resumes from the same state root.  The
    settled ledger must hash-equal the one-pass DuckDB HUGEINT batch
    oracle: dropped generations lose early transfers, a replayed file
    double-counts limbs — either is a mismatch, so the gate covers both
    halves of durability ON the 5-limb algebra (whose merge is plain
    per-limb SUM; carry normalization happens once, at read-out, AFTER
    the resume).  Scale: recovery is one directory listing; steady-state
    per-batch work is identical to stream_u256_balance_upsert."""
    from presto_ethereum_spark.sources.decode import erc20_transfer_deltas_u256
    from presto_ethereum_spark.streaming.chain import (
        run_balance_restart,
        u256_state_spec,
    )

    zero = "0x" + "0" * 40
    return run_balance_restart(
        spark,
        str(ETH / "u256_logs.parquet"),
        split_ranges=4,
        kill_after=2,
        deltas_fn=lambda df: erc20_transfer_deltas_u256(df).where(
            F.col("holder") != zero
        ),
        state_spec=u256_state_spec(),
        block_col="blocknumber",
    )


@q("eth_erc20_balances_u256", _U256_BALANCES_ORACLE)
def eth_erc20_balances_u256(spark: SparkSession, sf: str) -> DataFrame:
    """FULL-RANGE exact uint256 balance ledger (VERDICT r11 #3): decode
    Transfer values as five base-16^15 limbs (hex_to_u256_limb_cols — pure
    JVM conv/substring, exact for ANY uint256, no >2^120 exclusion),
    signed per-limb deltas, one (token, holder) hash aggregation with
    map-side partials, then a single carry-normalized canonical hex
    read-out per group (u256_limb_sums_to_hex).  The fixture's balances
    reach within 2^16 of uint256-max (fixtures/generate_u256_fixture.py);
    the DuckDB oracle recomputes the same ledger independently in HUGEINT
    limb arithmetic with a floored carry chain — a true cross-engine
    differential on 256-bit exactness, with no 256-bit type anywhere.
    Scale: one shuffle on the group key, limb sums are plain DECIMAL
    partials (each limb < 2^60, ~8.7e19 rows of headroom per group), the
    zero mint/burn address is excluded from the ledger as on-chain
    convention.  Output is DECIMAL-free: the balance is the canonical
    0x + 64-hex string."""
    from presto_ethereum_spark.sources.decode import (
        erc20_transfer_deltas_u256,
        u256_limb_sums_to_hex,
    )

    logs = spark.read.parquet(str(ETH / "u256_logs.parquet"))
    d = erc20_transfer_deltas_u256(logs)
    s = (
        d.where(F.col("holder") != "0x" + "0" * 40)
        .groupBy("token_address", "holder")
        .agg(
            *[F.sum(f"l{i}").alias(f"s{i}") for i in range(5)],
            F.count("*").cast("long").alias("n_transfers"),
        )
    )
    return s.select(
        "token_address",
        "holder",
        u256_limb_sums_to_hex([F.col(f"s{i}") for i in range(5)]).alias(
            "balance_hex"
        ),
        "n_transfers",
    )


@q(
    "eth_u256_top_holders",
    f"""
    WITH b AS ({_U256_BALANCES_ORACLE})
    SELECT * FROM (
      SELECT token_address, holder, balance_hex,
             CAST(row_number() OVER (
               PARTITION BY token_address
               ORDER BY balance_hex DESC, holder
             ) AS BIGINT) AS rnk
      FROM b
    ) WHERE rnk <= 5
    """,
)
def eth_u256_top_holders(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 holders per token ORDERED BY a 256-bit quantity: the
    canonical fixed-width lowercase hex read-out is order-isomorphic to
    the unsigned integer it encodes, so ranking the hex STRING ranks the
    u256 balance exactly — no 256-bit comparator needed in either engine
    (the 5-limb analogue of the DECIMAL family's digit-string bridge
    contract).  Plan: the one balance aggregation, then a per-token
    rank window (WindowGroupLimit-eligible top-k, partition count =
    token count); holder tie-break keeps the output deterministic."""
    from presto_ethereum_spark.sources.decode import (
        erc20_transfer_deltas_u256,
        u256_limb_sums_to_hex,
    )

    logs = spark.read.parquet(str(ETH / "u256_logs.parquet"))
    d = erc20_transfer_deltas_u256(logs)
    bal = (
        d.where(F.col("holder") != "0x" + "0" * 40)
        .groupBy("token_address", "holder")
        .agg(*[F.sum(f"l{i}").alias(f"s{i}") for i in range(5)])
        .select(
            "token_address",
            "holder",
            u256_limb_sums_to_hex([F.col(f"s{i}") for i in range(5)]).alias(
                "balance_hex"
            ),
        )
    )
    w = Window.partitionBy("token_address").orderBy(
        F.col("balance_hex").desc(), "holder"
    )
    return bal.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= 5
    )


@q(
    "eth_u256_largest_transfers",
    f"""
    SELECT address AS token_address,
           concat('0x', substr(topics[2], length(topics[2]) - 39, 40))
             AS from_addr,
           concat('0x', substr(topics[3], length(topics[3]) - 39, 40))
             AS to_addr,
           concat('0x', lower(substr(data, 3, 64))) AS value_hex,
           blocknumber,
           CAST(row_number() OVER (
             PARTITION BY address
             ORDER BY lower(substr(data, 3, 64)) DESC, blocknumber,
                      topics[2], topics[3]
           ) AS BIGINT) AS rnk
    FROM read_parquet('{ETH}/u256_logs.parquet')
    WHERE lower(topics[1]) =
          '0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef'
      AND len(topics) >= 3
      AND length(data) = 66
    QUALIFY rnk <= 3
    """,
)
def eth_u256_largest_transfers(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 transfers per token by RAW uint256 value, with zero value
    arithmetic anywhere: a standard Transfer's data word is already the
    zero-padded 64-hex big-endian value, so lowercasing it IS the sortable
    canonical form (the same order isomorphism the top-holders entry uses
    after aggregation, applied here straight off the wire — whale-alert
    monitoring without decoding).  One rank window per token,
    WindowGroupLimit-eligible; deterministic tie-break on
    (block, from, to)."""
    from presto_ethereum_spark.constants import TRANSFER_EVENT_TOPIC
    from presto_ethereum_spark.sources.decode import h32_to_h20_col

    logs = spark.read.parquet(str(ETH / "u256_logs.parquet"))
    tr = logs.where(
        (F.lower(F.col("topics")[0]) == TRANSFER_EVENT_TOPIC)
        & (F.size("topics") >= 3)
        & (F.length("data") == 66)
    ).select(
        F.col("address").alias("token_address"),
        h32_to_h20_col(F.col("topics")[1]).alias("from_addr"),
        h32_to_h20_col(F.col("topics")[2]).alias("to_addr"),
        F.concat(
            F.lit("0x"), F.lower(F.substring("data", 3, 64))
        ).alias("value_hex"),
        "blocknumber",
    )
    w = Window.partitionBy("token_address").orderBy(
        F.col("value_hex").desc(),
        "blocknumber",
        F.col("from_addr"),
        F.col("to_addr"),
    )
    return tr.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= 3
    )


@q(
    "eth_u256_balance_asof",
    f"""
    WITH {_U256_TR_CTE},
    d AS (
      SELECT token_address, to_addr AS holder, blocknumber,
             l4, l3, l2, l1, l0
      FROM tr
      UNION ALL
      SELECT token_address, from_addr, blocknumber,
             -l4, -l3, -l2, -l1, -l0 FROM tr
    ),
    ck(asof_block) AS (VALUES (100), (200), (300)),
    s AS (
      SELECT token_address, holder, CAST(asof_block AS BIGINT) AS asof_block,
             sum(l4) AS s4, sum(l3) AS s3, sum(l2) AS s2,
             sum(l1) AS s1, sum(l0) AS s0,
             CAST(count(*) AS BIGINT) AS n_events
      FROM d CROSS JOIN ck
      WHERE holder <> concat('0x', repeat('0', 40))
        AND blocknumber < asof_block
      GROUP BY token_address, holder, asof_block
    ),
    {_u256_carry_chain('s')}
    SELECT token_address, holder, asof_block,
           {_U256_HEX} AS balance_hex,
           n_events
    FROM n4
    """,
)
def eth_u256_balance_asof(spark: SparkSession, sf: str) -> DataFrame:
    """TIME-TRAVEL ledger read-out at full uint256 exactness: each
    (token, holder) balance AS OF three block checkpoints — the audit /
    reconciliation query ("what did this wallet hold at block N") that a
    balance table must answer without replaying history per request.
    Plan: the signed limb deltas broadcast-join a 3-row checkpoint spine
    (each delta contributes to every checkpoint past its block), then ONE
    hash aggregation on (token, holder, checkpoint) — at scale the spine
    join multiplies rows by |checkpoints| before the shuffle, the
    standard cumulative-snapshot trade (for many checkpoints, switch to a
    cumulative window over block-ordered partials; the 3-point spine is
    the broadcast-cheap shape).  Carry normalization and hex read-out per
    group, as in the balances entry; holders funded only later are
    correctly ABSENT from earlier checkpoints (no zero-backfill —
    n_events counts contributing legs)."""
    from presto_ethereum_spark.sources.decode import (
        erc20_transfer_deltas_u256,
        u256_limb_sums_to_hex,
    )

    logs = spark.read.parquet(str(ETH / "u256_logs.parquet"))
    d = erc20_transfer_deltas_u256(logs)
    ck = spark.createDataFrame([(100,), (200,), (300,)], "asof_block long")
    s = (
        d.where(F.col("holder") != "0x" + "0" * 40)
        .crossJoin(F.broadcast(ck))
        .where(F.col("block_number") < F.col("asof_block"))
        .groupBy("token_address", "holder", "asof_block")
        .agg(
            *[F.sum(f"l{i}").alias(f"s{i}") for i in range(5)],
            F.count("*").cast("long").alias("n_events"),
        )
    )
    return s.select(
        "token_address",
        "holder",
        "asof_block",
        u256_limb_sums_to_hex([F.col(f"s{i}") for i in range(5)]).alias(
            "balance_hex"
        ),
        "n_events",
    )


@q(
    "eth_u256_supply",
    f"""
    WITH {_U256_TR_CTE},
    legs AS (
      SELECT token_address,
             CASE WHEN from_addr = concat('0x', repeat('0', 40))
                  THEN 1 ELSE 0 END AS is_mint,
             CASE WHEN to_addr = concat('0x', repeat('0', 40))
                  THEN 1 ELSE 0 END AS is_burn,
             l4, l3, l2, l1, l0
      FROM tr
      WHERE from_addr = concat('0x', repeat('0', 40))
         OR to_addr = concat('0x', repeat('0', 40))
    ),
    s AS (
      SELECT token_address,
             sum((is_mint - is_burn) * l4) AS s4,
             sum((is_mint - is_burn) * l3) AS s3,
             sum((is_mint - is_burn) * l2) AS s2,
             sum((is_mint - is_burn) * l1) AS s1,
             sum((is_mint - is_burn) * l0) AS s0,
             CAST(sum(is_mint) AS BIGINT) AS n_mints,
             CAST(sum(is_burn) AS BIGINT) AS n_burns
      FROM legs GROUP BY token_address
    ),
    {_u256_carry_chain('s')}
    SELECT token_address,
           {_U256_HEX} AS outstanding_hex,
           n_mints, n_burns
    FROM n4
    """,
)
def eth_u256_supply(spark: SparkSession, sf: str) -> DataFrame:
    """Per-token OUTSTANDING SUPPLY at full uint256 exactness: net of
    zero-address flows (mints credit supply, burns debit it), summed as
    signed limbs and read out canonically — the token-level consistency
    companion to the holder ledger (sum of holder balances == outstanding
    supply, an invariant the unit test checks across both entries).
    Scale: filters to zero-address legs BEFORE the shuffle (mint/burn
    events are a sliver of transfer volume), then one token-keyed
    aggregation."""
    from presto_ethereum_spark.sources.decode import (
        hex_to_u256_limb_cols,
        u256_limb_sums_to_hex,
    )
    from presto_ethereum_spark.sources.decode import (
        TRANSFER_EVENT_TOPIC,
        h32_to_h20_col,
    )

    zero = "0x" + "0" * 40
    logs = spark.read.parquet(str(ETH / "u256_logs.parquet"))
    limbs = hex_to_u256_limb_cols(F.col("data"))
    tr = logs.where(
        (F.lower(F.col("topics")[0]) == TRANSFER_EVENT_TOPIC)
        & (F.size("topics") >= 3)
        & (F.length("data") == 66)
    ).select(
        F.col("address").alias("token_address"),
        h32_to_h20_col(F.col("topics")[1]).alias("from_addr"),
        h32_to_h20_col(F.col("topics")[2]).alias("to_addr"),
        *[limb.alias(f"l{i}") for i, limb in enumerate(limbs)],
    )
    legs = tr.where(
        (F.col("from_addr") == zero) | (F.col("to_addr") == zero)
    ).select(
        "token_address",
        F.when(F.col("from_addr") == zero, 1).otherwise(0).alias("is_mint"),
        F.when(F.col("to_addr") == zero, 1).otherwise(0).alias("is_burn"),
        *[f"l{i}" for i in range(5)],
    )
    sign = (F.col("is_mint") - F.col("is_burn")).cast("decimal(38,0)")
    s = legs.groupBy("token_address").agg(
        *[F.sum(sign * F.col(f"l{i}")).alias(f"s{i}") for i in range(5)],
        F.sum("is_mint").cast("long").alias("n_mints"),
        F.sum("is_burn").cast("long").alias("n_burns"),
    )
    return s.select(
        "token_address",
        u256_limb_sums_to_hex([F.col(f"s{i}") for i in range(5)]).alias(
            "outstanding_hex"
        ),
        "n_mints",
        "n_burns",
    )


_U256_HEX_NEG = """
           concat('-0x',
                  lpad(printf('%x', CAST(w4 AS BIGINT)), 4, '0'),
                  lpad(printf('%x', CAST(p3 AS BIGINT)), 15, '0'),
                  lpad(printf('%x', CAST(p2 AS BIGINT)), 15, '0'),
                  lpad(printf('%x', CAST(p1 AS BIGINT)), 15, '0'),
                  lpad(printf('%x', CAST(p0 AS BIGINT)), 15, '0'))"""


@q(
    "eth_u256_range_positions",
    f"""
    WITH {_U256_TR_CTE},
    d AS (
      SELECT token_address, to_addr AS holder,
             l4, l3, l2, l1, l0, blocknumber FROM tr
      UNION ALL
      SELECT token_address, from_addr,
             -l4, -l3, -l2, -l1, -l0, blocknumber FROM tr
    ),
    s AS (
      SELECT token_address, holder,
             sum(l4) AS s4, sum(l3) AS s3, sum(l2) AS s2,
             sum(l1) AS s1, sum(l0) AS s0,
             CAST(count(*) AS BIGINT) AS n_transfers
      FROM d
      WHERE holder <> concat('0x', repeat('0', 40))
        AND blocknumber BETWEEN 150 AND 299
      GROUP BY token_address, holder
    ),
    sg AS (
      SELECT *, -s0 AS g0, -s1 AS g1, -s2 AS g2, -s3 AS g3, -s4 AS g4
      FROM s
    ),
    {_u256_carry_chain('sg')},
    {_u256_carry_chain('n4', s='g', m='p', v='w', n='k')}
    SELECT token_address, holder,
           CASE WHEN v4 < 0 THEN {_U256_HEX_NEG}
                ELSE {_U256_HEX} END AS position_hex,
           CASE WHEN v4 < 0 THEN -1
                WHEN v4 = 0 AND m3 = 0 AND m2 = 0 AND m1 = 0 AND m0 = 0
                  THEN 0
                ELSE 1 END AS sign,
           n_transfers
    FROM k4
    """,
)
def eth_u256_range_positions(spark: SparkSession, sf: str) -> DataFrame:
    """SIGNED partial-range ledger positions (VERDICT r12 #1): the
    reference's canonical access pattern is a block-range predicate
    (README.md:15 — "WHERE block.block_number > x AND block.block_number
    < y"), and over a truncated range a holder's in-range outflows
    routinely exceed its in-range inflows (this fixture slice: 18 of 44
    (token, holder) groups net NEGATIVE over blocks 150-299).  The strict
    read-out (u256_limb_sums_to_hex) would raise_error mid-aggregation;
    the signed read-out (u256_limb_sums_to_signed_hex) renders
    sign + 64-hex-digit magnitude — two's-complement-free, the magnitude
    chain running over negated limbs — so a range scan reports every
    holder's signed NET FLOW instead of dying.  The DuckDB oracle runs
    the floored carry chain twice (as-is for the sign, negated for the
    magnitude) in HUGEINT limb arithmetic — a cross-engine differential
    on signed 256-bit rendering.  Scale: identical plan shape to the
    full-history ledger (one group-key shuffle, map-side limb partials);
    the block-range filter sits before the shuffle and, on the live
    ``ethereum`` format, transposes to server-side scan pruning
    (plans/pushdown.py)."""
    from presto_ethereum_spark.sources.decode import (
        erc20_transfer_deltas_u256,
        u256_limb_sums_to_signed_hex,
    )

    logs = spark.read.parquet(str(ETH / "u256_logs.parquet")).where(
        F.col("blocknumber").between(150, 299)
    )
    d = erc20_transfer_deltas_u256(logs)
    s = (
        d.where(F.col("holder") != "0x" + "0" * 40)
        .groupBy("token_address", "holder")
        .agg(
            *[F.sum(f"l{i}").alias(f"s{i}") for i in range(5)],
            F.count("*").cast("long").alias("n_transfers"),
        )
    )
    pos = u256_limb_sums_to_signed_hex([F.col(f"s{i}") for i in range(5)])
    return s.select(
        "token_address",
        "holder",
        pos.alias("position_hex"),
        F.when(pos.startswith("-"), F.lit(-1))
        .when(pos == "0x" + "0" * 64, F.lit(0))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("sign"),
        "n_transfers",
    )


def _symmap_values() -> str:
    from presto_ethereum_spark.constants import ERC20_TOKEN_BY_ADDRESS

    return ", ".join(
        f"('{a}', '{s}')" for a, s in sorted(ERC20_TOKEN_BY_ADDRESS.items())
    )


@q(
    "eth_u256_balances_via_table",
    f"""
    WITH lg AS (
      SELECT unnest(t.logs) AS l
      FROM (SELECT unnest(transactions) AS t
            FROM read_parquet('{ETH}/chain_blocks.parquet'))
    ),
    raw AS (
      SELECT l.address AS address, l.topics AS topics, l.data AS data,
             len(l.topics) AS nt, (length(l.data) - 2) // 64 AS nw
      FROM lg
      WHERE lower(l.topics[1]) =
            '0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef'
    ),
    kept AS (
      SELECT *,
             CASE WHEN nt >= 3 THEN data
                  ELSE concat('0x', substr(data, 3 + 64 * (3 - nt), 64))
             END AS vword,
             CASE WHEN nt >= 2 THEN topics[2]
                  ELSE concat('0x', substr(data, 3, 64)) END AS from32,
             CASE WHEN nt >= 3 THEN topics[3]
                  WHEN nt = 2 THEN concat('0x', substr(data, 3, 64))
                  ELSE concat('0x', substr(data, 67, 64)) END AS to32
      FROM raw
      WHERE nt >= 3 OR nt + nw = 4
    ),
    symmap(addr, sym) AS (VALUES {_symmap_values()}),
    hx AS (
      SELECT coalesce(m.sym, concat('ERC20(', k.address, ')')) AS token,
             concat('0x', substr(from32, length(from32) - 39, 40))
               AS from_addr,
             concat('0x', substr(to32, length(to32) - 39, 40)) AS to_addr,
             concat('0x', lpad(lower(substr(vword, 3)), 64, '0')) AS vhex
      FROM kept k LEFT JOIN symmap m ON lower(k.address) = m.addr
      WHERE regexp_matches(lower(substr(vword, 3)), '^[0-9a-f]{{1,64}}$')
    ),
    tr AS (
      SELECT token, from_addr, to_addr,
             CAST(CAST(concat('0x', substr(vhex, 3, 4)) AS BIGINT)
                  AS HUGEINT) AS l4,
             CAST(CAST(concat('0x', substr(vhex, 7, 15)) AS BIGINT)
                  AS HUGEINT) AS l3,
             CAST(CAST(concat('0x', substr(vhex, 22, 15)) AS BIGINT)
                  AS HUGEINT) AS l2,
             CAST(CAST(concat('0x', substr(vhex, 37, 15)) AS BIGINT)
                  AS HUGEINT) AS l1,
             CAST(CAST(concat('0x', substr(vhex, 52, 15)) AS BIGINT)
                  AS HUGEINT) AS l0
      FROM hx
    ),
    d AS (
      SELECT token, to_addr AS holder, l4, l3, l2, l1, l0 FROM tr
      UNION ALL
      SELECT token, from_addr, -l4, -l3, -l2, -l1, -l0 FROM tr
    ),
    s AS (
      SELECT token AS erc20_token, holder,
             sum(l4) AS s4, sum(l3) AS s3, sum(l2) AS s2,
             sum(l1) AS s1, sum(l0) AS s0,
             CAST(count(*) AS BIGINT) AS n_transfers
      FROM d
      WHERE holder <> concat('0x', repeat('0', 40))
      GROUP BY token, holder
    ),
    sg AS (
      SELECT *, -s0 AS g0, -s1 AS g1, -s2 AS g2, -s3 AS g3, -s4 AS g4
      FROM s
    ),
    {_u256_carry_chain('sg')},
    {_u256_carry_chain('n4', s='g', m='p', v='w', n='k')}
    SELECT erc20_token, holder,
           CASE WHEN v4 < 0 THEN {_U256_HEX_NEG}
                ELSE {_U256_HEX} END AS position_hex,
           n_transfers
    FROM k4
    """,
)
def eth_u256_balances_via_table(spark: SparkSession, sf: str) -> DataFrame:
    """The EXACT LEDGER fed entirely from the REGISTERED TABLE SURFACE —
    the r13 pieces composed: the live ``ethereum`` format with
    ``value_mode=u256_hex`` supplies canonical value hex per transfer (no
    raw-log plumbing, no Python helpers), hex_to_u256_limb_cols decodes
    the COLUMN, and the SIGNED read-out renders each (token symbol,
    holder) net position — signed because the main chain fixture's
    synthetic transfers (unlike the mint-disciplined u256 fixture) give
    holders net-negative books, i.e. this entry grades the signed path on
    a SECOND, independent fixture.  Rows the wire gives no exact uint256
    for (ERC-721 id-in-data, >64-digit payloads) are excluded by the
    value_hex NULL contract — exactly the rows whose double decode is
    0.0/lossy.  The DuckDB oracle re-derives everything from the nested
    chain parquet: cursor semantics, the 42-entry symbol map as an
    inline VALUES table, HUGEINT limbs, and the dual floored carry chain
    for sign + magnitude.  Scale: scan -> narrow projection -> one
    (token, holder) hash aggregation with map-side limb partials — the
    balance-family plan shape on the SQL-user surface."""
    from presto_ethereum_spark.sources.decode import (
        hex_to_u256_limb_cols,
        u256_limb_sums_to_signed_hex,
    )
    from presto_ethereum_spark.sources.rpc import EthereumDataSource

    spark.dataSource.register(EthereumDataSource)
    erc20 = (
        spark.read.format("ethereum")
        .option("table", "erc20")
        .option("path", str(ETH / "chain_blocks.parquet"))
        .option("value_mode", "u256_hex")
        # one partition: the parquet transport loads the nested fixture
        # per task (see eth_erc20_movement_getlogs)
        .option("blocks_per_partition", 4000)
        .load()
    )
    limbs = hex_to_u256_limb_cols(F.col("erc20_value_hex"))
    tr = erc20.where(F.col("erc20_value_hex").isNotNull()).select(
        "erc20_token",
        "erc20_from",
        "erc20_to",
        *[limb.alias(f"l{i}") for i, limb in enumerate(limbs)],
    )
    names = [f"l{i}" for i in range(5)]
    d = tr.select(
        "erc20_token", F.col("erc20_to").alias("holder"), *names
    ).unionByName(
        tr.select(
            "erc20_token",
            F.col("erc20_from").alias("holder"),
            *[(-F.col(n)).alias(n) for n in names],
        )
    )
    s = (
        d.where(F.col("holder") != "0x" + "0" * 40)
        .groupBy("erc20_token", "holder")
        .agg(
            *[F.sum(f"l{i}").alias(f"s{i}") for i in range(5)],
            F.count("*").cast("long").alias("n_transfers"),
        )
    )
    return s.select(
        "erc20_token",
        "holder",
        u256_limb_sums_to_signed_hex(
            [F.col(f"s{i}") for i in range(5)]
        ).alias("position_hex"),
        "n_transfers",
    )


@q(
    "eth_log_topic_profile",
    f"""
    WITH lg AS (
      SELECT unnest(t.logs) AS l
      FROM (SELECT unnest(transactions) AS t
            FROM read_parquet('{ETH}/chain_blocks.parquet'))
    )
    SELECT lower(l.topics[1]) AS topic0,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT l.address) AS BIGINT) AS n_contracts,
           CAST(count(DISTINCT l.transactionhash) AS BIGINT) AS n_txs,
           CAST(count(DISTINCT l.blocknumber) AS BIGINT) AS n_blocks,
           CAST(min(l.blocknumber) AS BIGINT) AS first_block,
           CAST(max(l.blocknumber) AS BIGINT) AS last_block
    FROM lg WHERE len(l.topics) >= 1
    GROUP BY topic0
    """,
)
def eth_log_topic_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Event-signature census over the raw log stream: per topic0 (the
    keccak event signature the reference keys its Transfer filter on,
    EthereumRecordCursor.java:158-170), how many events fired, from how
    many distinct contracts / transactions / blocks, and the block span.
    The reconnaissance query that decides WHICH event decoders a chain
    pipeline needs before any decode is written.  Three distincts inside
    one grouped aggregate — Spark plans a single expand (x3) over the
    pruned (topics[0], address, txhash, block) projection; at 100 TB
    swap the exact distincts for approx_count_distinct and the expand
    disappears."""
    chain = _eth_tables(spark).chain
    logs = chain.select(F.explode("transactions").alias("t")).select(
        F.explode("t.logs").alias("l")
    )
    return (
        logs.where(F.size("l.topics") >= 1)
        .select(
            F.lower(F.col("l.topics")[0]).alias("topic0"),
            F.col("l.address").alias("address"),
            F.col("l.transactionHash").alias("txh"),
            F.col("l.blockNumber").alias("bn"),
        )
        .groupBy("topic0")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("address").alias("n_contracts"),
            F.count_distinct("txh").alias("n_txs"),
            F.count_distinct("bn").alias("n_blocks"),
            F.min("bn").alias("first_block"),
            F.max("bn").alias("last_block"),
        )
    )


@q(
    "eth_value_in_ether",
    f"""
    SELECT tx_hash, tx_value / 1e18 AS value_ether, tx_gasprice / 1e9 AS gasprice_gwei
    FROM read_parquet('{ETH}/transaction.parquet')
    WHERE tx_value >= 1e18
    """,
)
def eth_value_in_ether(spark: SparkSession, sf: str) -> DataFrame:
    """fromWei as used in SQL (udfs/EthereumUDFs.java:117-124): unit division
    is exact double math, so the vectorized UDF matches the oracle's literal
    division bit-for-bit."""
    from presto_ethereum_spark.functions.web3 import from_wei

    tx = _eth_tables(spark).table("transaction")
    return tx.where(F.col("tx_value") >= 1e18).select(
        "tx_hash",
        from_wei(F.col("tx_value"), F.lit("ETHER")).alias("value_ether"),
        from_wei(F.col("tx_gasprice"), F.lit("GWEI")).alias("gasprice_gwei"),
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------------


@q(
    "doc_fingerprints",
    """
    SELECT doc_id, md5(text) AS fingerprint, length(text) AS text_len
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Content fingerprinting: md5 is bit-identical across engines and is the
    exact-dedup key at any scale (hash-shuffle on fingerprint)."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fingerprint"),
        F.length("text").alias("text_len"),
    )


@q(
    "doc_exact_dedup",
    """
    SELECT fingerprint, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
    FROM (SELECT doc_id, md5(text) AS fingerprint FROM documents)
    GROUP BY fingerprint
    """,
)
def doc_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: group on content hash, keep min doc_id.  At 100 TB this
    is one hash shuffle on a 16-byte key; skew-free by construction."""
    d = t(spark, sf, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


@q(
    "doc_token_stats",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_computed
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace token counting (split keeps empty strings identically in
    both engines)."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


@q(
    "doc_lang_stats",
    """
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE)/count(*) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def doc_lang_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@q(
    "eth_block_tx_consistency",
    f"""
    SELECT b.block_number,
           len(b.block_transactions) AS n_embedded,
           coalesce(t.n_rows, 0) AS n_tx_rows
    FROM read_parquet('{ETH}/block.parquet') b
    LEFT JOIN (SELECT tx_blocknumber, count(*) AS n_rows
               FROM read_parquet('{ETH}/transaction.parquet')
               GROUP BY tx_blocknumber) t
    ON t.tx_blocknumber = b.block_number
    WHERE len(b.block_transactions) != coalesce(t.n_rows, 0)
    """,
)
def eth_block_tx_consistency(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-table invariant: the embedded tx-hash array of every block must
    agree with the exploded transaction table — returns violations (expected
    empty).  Exercises array functions + outer join + null handling."""
    src = _eth_tables(spark)
    b = src.table("block")
    tx_counts = (
        src.table("transaction")
        .groupBy("tx_blocknumber")
        .agg(F.count("*").alias("n_rows"))
    )
    return (
        b.join(tx_counts, b.block_number == tx_counts.tx_blocknumber, "left")
        .select(
            "block_number",
            F.size("block_transactions").alias("n_embedded"),
            F.coalesce("n_rows", F.lit(0)).alias("n_tx_rows"),
        )
        .where(F.col("n_embedded") != F.col("n_tx_rows"))
    )


@q(
    "eth_uncle_distribution",
    f"""
    SELECT len(block_uncles) AS n_uncles, count(*) AS n_blocks,
           CAST(sum(CAST(len(block_transactions) AS BIGINT)) AS BIGINT) AS total_txs
    FROM read_parquet('{ETH}/block.parquet')
    GROUP BY n_uncles
    """,
)
def eth_uncle_distribution(spark: SparkSession, sf: str) -> DataFrame:
    b = _eth_tables(spark).table("block")
    return (
        b.groupBy(F.size("block_uncles").alias("n_uncles"))
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.size("block_transactions").cast("bigint"))
            .cast("bigint")
            .alias("total_txs"),
        )
    )


@q(
    "eth_deltas_literal_selfjoin",
    f"""
    SELECT b.bn, (b.block_timestamp - a.block_timestamp) AS delta
    FROM (SELECT block_number AS bn, block_timestamp
          FROM read_parquet('{ETH}/block.parquet')
          WHERE block_number>=1 AND block_number<=200) AS a
    JOIN (SELECT (block_number-1) AS bn, block_timestamp
          FROM read_parquet('{ETH}/block.parquet')
          WHERE block_number>=2 AND block_number<=201) AS b
    ON a.bn = b.bn
    """,
)
def eth_deltas_literal_selfjoin(spark: SparkSession, sf: str) -> DataFrame:
    """The reference query translated 1:1 (shifted self-join) — alongside
    the idiomatic lead() shape in eth_block_time_deltas, proving both plans
    produce identical results."""
    from presto_ethereum_spark.plans import golden

    return golden.block_time_deltas_literal(_eth_tables(spark).table("block"), 1, 200)


# -- temporal operators -----------------------------------------------------


@q(
    "rel_asof_join",
    """
    WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
    ord AS (
      SELECT o_custkey, epoch_us(o_orderdate) AS o_us, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1)
    SELECT ev.event_id, ev.user_id,
           ord.o_us AS asof_o_us,
           ord.o_orderkey AS asof_o_orderkey,
           ord.o_totalprice AS asof_o_totalprice
    FROM ev ASOF LEFT JOIN ord
    ON ev.user_id = ord.o_custkey AND ev.t_us >= ord.o_us
    """,
)
def rel_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (most recent order at or before each event, per user) —
    an operator Spark lacks, composed as union + partitioned window
    (operators/temporal.py); the oracle is DuckDB's native ASOF JOIN."""
    from presto_ethereum_spark.operators.temporal import asof_join

    ev = t(spark, sf, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    ord_ = (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "o_custkey",
            (F.unix_timestamp("o_orderdate") * 1_000_000).alias("o_us"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    return asof_join(
        ev,
        ord_,
        on_left="user_id",
        on_right="o_custkey",
        left_time="t_us",
        right_time="o_us",
        right_value_cols=["o_orderkey", "o_totalprice"],
    ).select(
        "event_id", "user_id", "asof_o_us", "asof_o_orderkey", "asof_o_totalprice"
    )


@q(
    "rel_asof_join_forward",
    """
    WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
    ord AS (
      SELECT o_custkey, epoch_us(o_orderdate) AS o_us, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1)
    SELECT ev.event_id, ev.user_id,
           ord.o_us AS asof_o_us,
           ord.o_orderkey AS asof_o_orderkey,
           ord.o_totalprice AS asof_o_totalprice
    FROM ev ASOF LEFT JOIN ord
    ON ev.user_id = ord.o_custkey AND ev.t_us <= ord.o_us
    """,
)
def rel_asof_join_forward(spark: SparkSession, sf: str) -> DataFrame:
    """FORWARD as-of join (next order at or after each event, per user) —
    the other half of the direction surface: same union + partitioned
    window plan with the sort/tie order reversed (operators/temporal.py:
    asof_join, direction='forward'); the oracle is DuckDB's native ASOF
    with the inequality flipped."""
    from presto_ethereum_spark.operators.temporal import asof_join

    ev = t(spark, sf, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    ord_ = (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "o_custkey",
            (F.unix_timestamp("o_orderdate") * 1_000_000).alias("o_us"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    return asof_join(
        ev,
        ord_,
        on_left="user_id",
        on_right="o_custkey",
        left_time="t_us",
        right_time="o_us",
        right_value_cols=["o_orderkey", "o_totalprice"],
        direction="forward",
    ).select(
        "event_id", "user_id", "asof_o_us", "asof_o_orderkey", "asof_o_totalprice"
    )


@q(
    "rel_sessionize",
    """
    WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
    marked AS (
      SELECT event_id, user_id, t_us,
             CASE WHEN lag(t_us) OVER w IS NULL
                       OR t_us - lag(t_us) OVER w > 3600000000 THEN 1
                  ELSE 0 END AS is_session_start
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id))
    SELECT event_id, user_id, is_session_start,
           CAST(sum(is_session_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                AS BIGINT) AS session_id
    FROM marked
    """,
)
def rel_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (1-hour timeout) — lag marks session starts,
    a running sum numbers them; one shuffle on user_id."""
    from presto_ethereum_spark.operators.temporal import sessionize

    ev = t(spark, sf, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    return sessionize(
        ev, key="user_id", time_col="t_us", gap=3_600_000_000, order_tiebreak="event_id"
    ).select("event_id", "user_id", "is_session_start", "session_id")


@q(
    "rel_funnel_steps",
    """
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
    s1 AS (SELECT user_id, min(t_us) AS t FROM ev WHERE event_type = 'view'
           GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.t_us) AS t FROM ev e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.t_us > s1.t GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.t_us) AS t FROM ev e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.t_us > s2.t GROUP BY e.user_id)
    SELECT 1 AS stage, 'view' AS step, count(*) AS users FROM s1
    UNION ALL SELECT 2, 'click', count(*) FROM s2
    UNION ALL SELECT 3, 'purchase', count(*) FROM s3
    """,
)
def rel_funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered view->click->purchase funnel (operators/temporal.py:
    funnel_counts): step i+1 counts only events strictly after the user's
    first step-i completion.  Each stage is a groupBy-min over one
    event-type slice joined to the shrinking survivor set — |steps| cheap
    passes, no per-user sort of the log."""
    from presto_ethereum_spark.operators.temporal import funnel_counts

    ev = t(spark, sf, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("t_us")
    )
    return funnel_counts(ev, ["view", "click", "purchase"])


@q(
    "rel_retention_cohorts",
    """
    WITH fs AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS ew FROM events)
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, ew) / 7 AS INT) AS week_offset,
           count(DISTINCT ev.user_id) AS active_users
    FROM ev JOIN fs ON ev.user_id = fs.user_id
    WHERE date_diff('day', cohort_week, ew) / 7 < 8
    GROUP BY cohort_week, week_offset
    """,
)
def rel_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention triangle (operators/temporal.py:
    retention_cohorts): cohort = Monday of first event; active at offset k
    if any event falls in cohort_week + k.  groupBy-min for first-seen, one
    join of the log against the (user, cohort) map, distinct-count on a tiny
    composite key."""
    from presto_ethereum_spark.operators.temporal import retention_cohorts

    ev = t(spark, sf, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("ts_micros")
    )
    return retention_cohorts(ev, max_weeks=8)


# -- streaming --------------------------------------------------------------


@q(
    "stream_sessionized",
    """
    WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
    marked AS (
      SELECT user_id, t_us, event_id,
             CASE WHEN lag(t_us) OVER w IS NULL
                       OR t_us - lag(t_us) OVER w > 3600000000 THEN 1
                  ELSE 0 END AS is_start
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
    numbered AS (
      SELECT user_id, t_us,
             CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                  AS BIGINT) AS session_id
      FROM marked)
    SELECT user_id, session_id,
           min(t_us) AS session_start_us,
           max(t_us) AS session_end_us,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def stream_sessionized(spark: SparkSession, sf: str) -> DataFrame:
    """Custom STATEFUL streaming operator: gap-based sessionization via
    applyInPandasWithState run to completion (streaming/events.py); the
    oracle is the batch lag/cumsum sessionization in SQL."""
    from presto_ethereum_spark.streaming.events import run_sessionized

    return run_sessionized(spark, sf, gap_us=3_600_000_000)


@q(
    "rel_listagg_topk",
    """
    WITH ranked AS (
      SELECT n_name, c_name,
             row_number() OVER (PARTITION BY n_nationkey
                 ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                          c_name) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    SELECT n_name AS nation,
           string_agg(c_name, ',' ORDER BY rn) AS top_customers,
           CAST(count(*) AS BIGINT) AS n_listed
    FROM ranked WHERE rn <= 3 GROUP BY n_name
    """,
)
def rel_listagg_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg ... ORDER BY):
    per nation, the top-3 customers by account balance as one ordered
    CSV cell — the report-sheet shape engines expose as a dedicated
    aggregate.  Spark has no ordered listagg, so the plan composes it
    from primitives with the SAME determinism guarantee: rank inside a
    WindowGroupLimit (total order: balance cents desc, name), then
    ``array_join(transform(array_sort(collect_list(struct(rn, name)))))``
    — sorting the collected structs by rank makes the concatenation
    independent of row arrival order, which collect_list alone never
    promises.  One shuffle for the window (reused by the groupBy on its
    prefix key); the broadcast nation dim never moves the fact table."""
    c = t(spark, sf, "customer").select(
        "c_nationkey",
        "c_name",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"),
    )
    n = F.broadcast(t(spark, sf, "nation").select("n_nationkey", "n_name"))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("cents"), "c_name")
    ranked = (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return ranked.groupBy(F.col("n_name").alias("nation")).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "c_name"))),
                lambda s: s["c_name"],
            ),
            ",",
        ).alias("top_customers"),
        F.count("*").cast("long").alias("n_listed"),
    )


@q(
    "rel_window_distinct_range",
    """
    WITH ev AS (
      SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type
      FROM events)
    SELECT event_id, user_id, t_us,
           CAST(count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY t_us
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_types_1h
    FROM ev
    """,
)
def rel_window_distinct_range(spark: SparkSession, sf: str) -> DataFrame:
    """DISTINCT aggregate over a RANGE-framed window — per event, how many
    distinct event types its user produced in the trailing hour (the
    engagement-diversity feature).  Spark's window operator does not
    accept COUNT(DISTINCT ...) OVER, so the plan builds the same answer
    from primitives Catalyst DOES codegen: ``size(collect_set(type))``
    over the event-time RANGE frame — set semantics make the result
    independent of within-frame order, so the value is deterministic and
    hash-gated against DuckDB's native windowed DISTINCT.  One shuffle on
    user_id (the window's own exchange); the per-frame set is bounded by
    the event-type domain, so state never scales with frame row count —
    the reason collect_set here is safe where collect_list would not
    be."""
    ev = t(spark, sf, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us"), "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "t_us",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("n_types_1h"),
    )


@q(
    "stream_session_window",
    """
    WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
    marked AS (
      SELECT user_id, t_us,
             CASE WHEN lag(t_us) OVER w IS NULL
                       OR t_us - lag(t_us) OVER w > 3600000000 THEN 1
                  ELSE 0 END AS is_start
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
    numbered AS (
      SELECT user_id, t_us,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY t_us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked)
    SELECT user_id,
           min(t_us) AS session_start_us,
           max(t_us) AS session_end_us,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """NATIVE streaming session windows (F.session_window + watermark, run
    via availableNow in complete mode) — the engine-delegated twin of
    stream_sessionized's custom applyInPandasWithState operator, proving
    the two sessionization paths (JVM state-store interval merge vs
    Arrow-batch Python state) settle to the SAME gap sessions the batch
    lag/cumsum closed form defines.  Session end is last-event + gap in
    Spark's native definition; the operator subtracts the gap back out so
    all three implementations share one column contract.  Complete mode
    on purpose: availableNow's final watermark would hold back sessions
    ending within the delay in append mode (streaming/events.
    run_session_window)."""
    from presto_ethereum_spark.streaming.events import run_session_window

    return run_session_window(spark, sf)


@q(
    "stream_windowed_counts",
    """
    SELECT (epoch_us(ts) // 1000000) // 3600 * 3600 AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def stream_windowed_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming: event-time tumbling windows with watermark, run
    to completion via availableNow into a memory sink — the streaming result
    must equal the equivalent batch aggregation (streaming/events.py)."""
    from presto_ethereum_spark.streaming.events import run_windowed_counts

    return run_windowed_counts(spark, sf, window="1 hour")


# -- multimodal -------------------------------------------------------------


@q(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           length(text) AS n_bytes,
           sha256(text) AS sha,
           CAST(CASE WHEN length(text) = 0 THEN 0
                     ELSE length(text) % 1024 + 1 END AS INT) AS width,
           CAST(CASE WHEN length(text) = 0 THEN 0
                     ELSE ascii(substring(text, 1, 1)) + 1 END AS INT) AS height,
           CAST(512 AS INT) AS feature_dim
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal byte-column pipeline: synthetic media table -> Arrow-
    batched mapInPandas feature extraction (operators/multimodal.py).  The
    codec is stubbed (no image libs in this container) with a deterministic
    fake decode, which the oracle replicates closed-form (corpus texts are
    ASCII, so byte length == char length and first byte == ascii(first
    char)); the binary schema, Arrow batching, and digest path are real and
    hash-checked end-to-end."""
    from presto_ethereum_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )

    return extract_features(media_from_documents(t_spread(spark, sf, "documents")))


# -- text analysis ----------------------------------------------------------


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _doc_quality_ctes() -> str:
    """The WITH-body computing per-doc (doc_id, n_chars, n_tokens_regex,
    quality, s_<lang> scores) — shared by the doc_quality oracle and the
    quality-cutoff survival curve so both grade the identical formula."""
    from presto_ethereum_spark.operators.text import (
        EN_STOPWORDS,
        LANG_PROFILES,
        TOKEN_REGEX,
    )

    lang_score_cols = ",\n           ".join(
        f"len(list_filter(toks_l, t -> list_contains({_sql_list(words)}, t))) AS s_{lang}"
        for lang, words in LANG_PROFILES.items()
    )
    langs = list(LANG_PROFILES)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    return f"""base AS (
      SELECT doc_id, text,
             string_split(lower(text), ' ') AS toks_l,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tok,
             len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_tokens_regex,
             length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(replace(text, ' ', '')) AS n_nospace
      FROM documents),
    scored AS (
      SELECT doc_id, n_chars, n_tokens_regex,
             n_punct / greatest(n_chars, 1) AS pr,
             n_digit / greatest(n_chars, 1) AS dr,
             n_nospace / greatest(n_tok, 1) AS atl,
             len(list_filter(toks_l, t -> list_contains({_sql_list(EN_STOPWORDS)}, t)))
                 / greatest(n_tok, 1) AS swr,
             {lang_score_cols}
      FROM base),
    final AS (
      SELECT doc_id, n_chars, n_tokens_regex,
             0.35 * least(n_chars / 500.0, 1.0)
                 + 0.25 * (CASE WHEN atl >= 3 AND atl <= 10 THEN 1.0 ELSE 0.3 END)
                 + 0.2 * least(swr * 4, 1.0)
                 + 0.2 * (1 - least((pr + dr) * 3, 1.0)) AS quality,
             {best} AS best,
             {", ".join("s_" + lang for lang in langs)}
      FROM scored)"""


def _doc_quality_lang_case() -> str:
    from presto_ethereum_spark.operators.text import LANG_PROFILES

    langs = list(LANG_PROFILES)
    return (
        "CASE "
        + " ".join(
            f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'" for lang in langs
        )
        + " ELSE 'und' END"
    )


def _doc_quality_oracle() -> str:
    return f"""
    WITH {_doc_quality_ctes()}
    SELECT doc_id, n_chars, n_tokens_regex, quality,
           {_doc_quality_lang_case()} AS pred_lang
    FROM final
    """


@q("doc_quality", _doc_quality_oracle())
def doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document text analysis: BPE-ish token count, composite quality
    score, stopword-profile language ID — all JVM-side column expressions
    (operators/text.py), zero shuffles."""
    from presto_ethereum_spark.operators import text as T

    d = t(spark, sf, "documents")
    txt = F.col("text")
    return d.select(
        "doc_id",
        F.length(txt).alias("n_chars"),
        T.token_count_regex(txt).alias("n_tokens_regex"),
        T.quality_score(txt).alias("quality"),
        T.lang_id(txt).alias("pred_lang"),
    )


@q(
    "doc_top_terms",
    """
    WITH terms AS (
      SELECT unnest(list_distinct(string_split_regex(lower(text), '[^a-z]+'))) AS term
      FROM documents),
    tf AS (SELECT term, count(*) AS df_docs FROM terms WHERE term <> '' GROUP BY term),
    tot AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term, df_docs,
           round(ln((n_docs + 1.0) / (df_docs + 1.0)), 6) AS idf,
           CAST(row_number() OVER (ORDER BY df_docs DESC, term) AS INT) AS rank
    FROM tf, tot
    QUALIFY rank <= 25
    """,
)
def doc_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary/IDF build of a TF-IDF featurizer: top-25 terms by document
    frequency with smoothed IDF.  One explode + one partial-agg shuffle on
    the term; the global top-k plans as TakeOrderedAndProject (~k rows per
    task cross the final merge), so the full vocabulary is never sorted."""
    from presto_ethereum_spark.operators.text import top_terms

    return top_terms(t_spread(spark, sf, "documents"), k=25)


def _quality_weight_values() -> str:
    from presto_ethereum_spark.operators.text import quality_classifier_weights

    return ", ".join(
        f"({i}, {w})" for i, w in enumerate(quality_classifier_weights())
    )


@q(
    "doc_quality_classifier",
    f"""
    WITH w(i, wt) AS (VALUES {_quality_weight_values()}),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    feats AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS i
      FROM toks)
    SELECT f.doc_id,
           CAST(count(*) AS INT) AS n_tokens,
           CAST(sum(w.wt) AS BIGINT) AS score_e3,
           CAST(sum(w.wt) AS BIGINT) > 0 AS is_quality
    FROM feats f JOIN w USING (i)
    GROUP BY f.doc_id
    """,
)
def doc_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """fastText-style hashed linear quality gate (text.py
    quality_classifier_score): md5-hashed bag-of-words, mod-64 buckets, an
    integer milli-weight dot product, threshold at 0.  Integer accumulation
    keeps the score partition-order exact; the whole operator is one
    map-side projection (weights are a 64-literal array, element_at per
    token) — scan-speed at any corpus size."""
    from presto_ethereum_spark.operators.text import quality_classifier_score

    return quality_classifier_score(t_spread(spark, sf, "documents"))


@q(
    "doc_chunk_dedup_filter",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    chunks AS (
      SELECT doc_id, CAST(b AS INT) AS cidx,
             array_to_string(list_slice(ts, b*3 + 1, b*3 + 3), ' ') AS chunk
      FROM toks, range(0, 4096) r(b)
      WHERE b*3 < len(ts)),
    boiler AS (
      SELECT md5(chunk) AS h FROM chunks
      GROUP BY md5(chunk) HAVING count(*) >= 2),
    marked AS (
      SELECT c.doc_id, c.cidx, c.chunk, (b.h IS NOT NULL) AS dup
      FROM chunks c LEFT JOIN boiler b ON md5(c.chunk) = b.h)
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_chunks,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS INT) AS n_removed,
           coalesce(
             string_agg(CASE WHEN NOT dup THEN chunk END, ' ' ORDER BY cidx),
             '') AS kept_text
    FROM marked GROUP BY doc_id
    """,
)
def doc_chunk_dedup_filter(spark: SparkSession, sf: str) -> DataFrame:
    """C4/CCNet-style boilerplate removal (dedup.py duplicate_chunk_filter):
    drop every non-overlapping 3-token span occurring >= 2 times corpus-wide
    and reassemble each document from the survivors.  Raw text never rides a
    wide shuffle: the frequency count moves only 16-byte md5 fingerprints,
    the removal verdict returns as a per-doc int list, and chunking/filtering
    are map-side array transforms on the doc row."""
    from presto_ethereum_spark.operators.dedup import duplicate_chunk_filter

    return duplicate_chunk_filter(
        t_spread(spark, sf, "documents"), chunk_tokens=3, max_count=2
    )


# -- dedup ------------------------------------------------------------------

# DuckDB mirror of hash32 / affine minhash signature / band keys (dedup.py)


def _duck_sig_cte() -> str:
    from presto_ethereum_spark.operators.dedup import MINHASH_PRIME, _affine_params

    mins = ", ".join(
        f"list_min([({a} * h + {b}) % {MINHASH_PRIME} FOR h IN hs])"
        for a, b in _affine_params(16)
    )
    return f"""
    hashed AS (
      SELECT doc_id,
             [CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)
              FOR x IN shingles] AS hs
      FROM shingled WHERE len(shingles) > 0),
    sigs AS (
      SELECT doc_id, [{mins}] AS sig FROM hashed),
    banded AS (
      SELECT doc_id,
             b AS band,
             md5(concat(CAST(sig[4*b + 1] AS VARCHAR), ',', CAST(sig[4*b + 2] AS VARCHAR), ',',
                        CAST(sig[4*b + 3] AS VARCHAR), ',', CAST(sig[4*b + 4] AS VARCHAR))) AS key
      FROM sigs, range(0, 4) r(b))
"""


_DUCK_SIG = _duck_sig_cte()

_DUCK_SHINGLED = """
    shingled AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
"""

# The LSH quality family's SHARED truth pipeline — oracle twin of
# operators/dedup.jaccard_truth_pairs, used verbatim by doc_minhash_recall
# and doc_minhash_band_curve (and, via _sampled_oracle, their sampled
# variants), so a threshold change edits dedup.TRUTH_TENTHS plus this one
# constant pair and nothing else.  Unblocked df-capped (max_df=8)
# inverted-index pair counts; the truth cut is J >= _TRUTH_TENTHS/10 in
# exact integers.  r8's 0.3 cut was organically EMPTY at sf0.1 under the
# cap (vacuous recall gates there); 0.2 is non-empty at BOTH graded SFs
# (sf0.01: 25 truth pairs, sf0.1: 5).  doc_jaccard_threshold_curve is
# threshold-free (it sweeps every decile) and lang-blocked, so it keeps
# the _DUCK_JACCARD_IPAIRS constant instead.
_TRUTH_TENTHS = 2
_DUCK_TRUTH_TP = """
    ex0 AS (
      SELECT s.doc_id, len(s.shingles) AS sz, unnest(s.shingles) AS sh
      FROM shingled s),
    dfc AS (
      SELECT sh FROM (SELECT sh, count(*) AS df FROM ex0 GROUP BY sh)
      WHERE df <= 8),
    ex AS (SELECT e.* FROM ex0 e JOIN dfc USING (sh)),
    tp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS inter
      FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.sz, b.sz)
"""
_DUCK_TRUTH_COND = f"10 * inter >= {_TRUTH_TENTHS} * (sz_a + sz_b - inter)"

# Inverted-index exact-Jaccard pair counts inside language blocks — the
# oracle twin of operators/dedup.jaccard_pairs.  Result-identical to the
# naive `langd a JOIN langd b` all-pairs formulation for any threshold > 0
# (a pair with no shared shingle has J = 0 and can never pass), but the
# join work is sum-over-shingles of df², not block-size²: the sf0.1 gate's
# three pair-based oracles went from ~30 min each (2.5M list_intersect
# calls) to seconds.  `inter` equals len(list_intersect(..)) exactly
# (shingle lists are list_distinct'ed), so every downstream jaccard double
# is bit-identical to the old formulation's.
#
# Posting lists are df-CAPPED at max_df=8 within each language block (the
# dfc CTE), mirroring the max_df=8 every graded jaccard_pairs /
# containment_pairs call passes: shingles shared by more than 8 same-block
# documents leave the index before the pair join, so join work is bounded
# by max_df x total postings (LINEAR in corpus size) instead of the
# unbounded Sum df² a boilerplate shingle explodes at crawl scale.  Sizes
# (sz) stay FULL-count, so reported similarity is a lower bound on true
# Jaccard.  The cap FIRES at the sf0.1 gate (organic max df 14), so the
# lossy path itself is hash-verified.
_DUCK_JACCARD_IPAIRS = """
    ex0 AS (
      SELECT s.doc_id, d.lang, len(s.shingles) AS sz, unnest(s.shingles) AS sh
      FROM shingled s JOIN documents d USING (doc_id)),
    dfc AS (
      SELECT sh, lang FROM (
        SELECT sh, lang, count(*) AS df FROM ex0 GROUP BY sh, lang)
      WHERE df <= 8),
    ex AS (SELECT e.* FROM ex0 e JOIN dfc USING (sh, lang)),
    ipairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS inter
      FROM ex a JOIN ex b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.sz, b.sz)
"""


@q(
    "doc_minhash_lsh_pairs",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_SIG},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST((2 * inter * 1000000 + uni) // (2 * uni) AS DOUBLE) / 1000000
               AS jaccard_sim
    FROM (
      SELECT id_a, id_b,
             len(list_intersect(sa.shingles, sb.shingles)) AS inter,
             len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles)) AS uni
      FROM cand
      JOIN shingled sa ON sa.doc_id = id_a
      JOIN shingled sb ON sb.doc_id = id_b)
    WHERE inter::DOUBLE / uni >= 0.3
    """,
)
def doc_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup detection, exact-Jaccard verified at >= 0.3.
    Scale plan: narrow signature fold -> one shuffle on (band, key) ->
    verify only candidates (operators/dedup.py)."""
    from presto_ethereum_spark.operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(t_spread(spark, sf, "documents"), threshold=0.3)


@q(
    "doc_crosssource_dup_matrix",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_SIG},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    pairs AS (
      SELECT id_a, id_b
      FROM cand
      JOIN shingled sa ON sa.doc_id = id_a
      JOIN shingled sb ON sb.doc_id = id_b
      WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
            / (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles))) >= 0.3)
    SELECT least(da.source, db.source)    AS source_x,
           greatest(da.source, db.source) AS source_y,
           count(*) AS n_dup_pairs
    FROM pairs
    JOIN documents da ON da.doc_id = pairs.id_a
    JOIN documents db ON db.doc_id = pairs.id_b
    GROUP BY source_x, source_y
    """,
)
def doc_crosssource_dup_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source contamination matrix — WHERE duplicates live: near-dup
    pairs (MinHash+LSH, Jaccard >= 0.3) joined back to their sources and
    counted per unordered source pair.  The standard audit before mixing
    corpora (did crawl-B re-scrape corpus-A?).  Scale: the pair list is
    tiny next to the corpus; the two metadata joins broadcast the
    (doc_id, source) projection, then one ~|sources|² aggregation."""
    from presto_ethereum_spark.operators.dedup import minhash_dedup_pairs

    d = t_spread(spark, sf, "documents")
    pairs = minhash_dedup_pairs(d, threshold=0.3).select("id_a", "id_b")
    src = d.select("doc_id", "source")
    sa = src.withColumnRenamed("doc_id", "id_a").withColumnRenamed("source", "src_a")
    sb = src.withColumnRenamed("doc_id", "id_b").withColumnRenamed("source", "src_b")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
        .groupBy("source_x", "source_y")
        .agg(F.count("*").alias("n_dup_pairs"))
    )


@q(
    "doc_simhash_pairs",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
    h AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS hv FROM toks),
    bits AS (
      SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
      FROM h, range(0, 60) r(j) GROUP BY doc_id, j),
    sh AS (
      SELECT doc_id, sum(CASE WHEN c > 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS sh
      FROM bits GROUP BY doc_id),
    banded AS (
      SELECT doc_id, sh, b AS band, (sh >> (15 * b)) & 32767 AS key
      FROM sh, range(0, 4) r(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 6
    """,
)
def doc_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs: banded 15-bit blocking, Hamming <= 6
    verification (operators/dedup.py: one JVM fold per row, no explode)."""
    from presto_ethereum_spark.operators.dedup import simhash_dedup_pairs

    return simhash_dedup_pairs(t_spread(spark, sf, "documents"), max_hamming=6)


@q(
    "doc_fuzzy_hamming_pairs",
    r"""
    WITH keys AS (
      SELECT doc_id, lang,
             rpad(substr(regexp_replace(lower(text),
                  '[ ' || chr(9) || chr(10) || chr(13) || ']+', ' ', 'g'),
                  1, 24), 24, '#') AS key
      FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, hamming(a.key, b.key) AS ham
    FROM keys a JOIN keys b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE hamming(a.key, b.key) <= 3
    """,
)
def doc_fuzzy_hamming_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Record-linkage fuzzy pairs: same-language documents whose 24-char
    normalized prefix keys are within Hamming distance 3, via LOSSLESS
    pigeonhole blocking (operators/dedup.fuzzy_hamming_pairs: 4 chunks of
    6 chars — <= 3 substitutions must leave one chunk untouched).

    The oracle is deliberately the BRUTE-FORCE all-pairs join: Spark finds
    the pairs through the inverted chunk index, DuckDB through O(n²)
    verification, so hash equality *proves* the blocking drops nothing.
    Scale: the chunk index shuffles (chunk, id) — 4 short strings per doc —
    and pair work is per-bucket C(n,2); the all-pairs formulation exists
    only oracle-side."""
    from presto_ethereum_spark.operators.dedup import fuzzy_hamming_pairs

    return fuzzy_hamming_pairs(
        t_spread(spark, sf, "documents"), max_hamming=3, blocking_cols=["lang"]
    )


@q(
    "doc_ngram_jaccard_block",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_JACCARD_IPAIRS}
    SELECT id_a, id_b,
           CAST((2 * inter * 1000000 + (sz_a + sz_b - inter))
                // (2 * (sz_a + sz_b - inter)) AS DOUBLE) / 1000000
               AS jaccard_sim
    FROM ipairs
    WHERE inter::DOUBLE / (sz_a + sz_b - inter) >= 0.2
    """,
)
def doc_ngram_jaccard_block(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard pairs >= 0.2 blocked by language — the exact
    verifier that backs the LSH path, run inside blocking keys.  Posting
    lists df-capped at max_df=8 (language blocking does NOT bound
    boilerplate df within a language; the cap keeps join work linear in
    corpus size — see _shingle_postings), mirrored in the oracle's dfc
    CTE and firing at the sf0.1 gate (organic max df 14)."""
    from presto_ethereum_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(
        t_spread(spark, sf, "documents"),
        threshold=0.2,
        blocking_cols=["lang"],
        max_df=8,
    )


@q(
    "doc_dup_clusters",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLED},
    {_DUCK_JACCARD_IPAIRS},
    pairs AS (
      SELECT id_a, id_b FROM ipairs
      WHERE inter::DOUBLE / (sz_a + sz_b - inter) >= 0.2),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, root) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.root FROM reach r JOIN edges e ON e.s = r.id),
    comp AS (SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id)
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM comp
    """,
)
def doc_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive closure of the near-dup pairs into duplicate CLUSTERS
    (connected components; cluster_id = min doc_id = canonical survivor).
    Pairwise dedup alone cannot answer "keep one per group": A~B and B~C
    must collapse {A,B,C} even though A~C was never emitted.

    Spark side is iterative min-label propagation with pointer jumping
    (O(log n) rounds, localCheckpoint-truncated lineage; see
    operators/dedup.connected_components) — the oracle is a recursive CTE
    computing min reachable id, which is exactly the fixpoint the
    propagation converges to.  The pair stage is df-capped at max_df=8
    (oracle-mirrored; the same linear-join-work bound as
    doc_ngram_jaccard_block)."""
    from presto_ethereum_spark.operators.dedup import dup_clusters, jaccard_pairs

    pairs = jaccard_pairs(
        t_spread(spark, sf, "documents"),
        threshold=0.2,
        blocking_cols=["lang"],
        max_df=8,
    )
    return dup_clusters(pairs.select("id_a", "id_b"))


# -- similarity search ------------------------------------------------------

_DUCK_COSINE = """
      list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
"""


@q(
    "emb_knn_bruteforce",
    f"""
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round({_DUCK_COSINE}, 6) AS sim,
           CAST(row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_DUCK_COSINE} DESC, b.vec_id) AS INT) AS rank
    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
    WHERE a.vec_id < 5
    QUALIFY rank <= 10
    """,
)
def emb_knn_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors: broadcast queries, one corpus
    scan, WindowGroupLimit top-k (operators/similarity.py)."""
    from presto_ethereum_spark.operators.similarity import brute_force_topk

    e = t_spread(spark, sf, "embeddings", parts=8)
    return brute_force_topk(e, e.where(F.col("vec_id") < 5), k=10)


@q(
    "emb_knn_label_purity",
    f"""
    WITH nn AS (
      SELECT a.vec_id AS qid, a.label AS qlabel, b.label AS nlabel,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY {_DUCK_COSINE} DESC, b.vec_id) AS rank
      FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
    k AS (
      SELECT qid, qlabel,
             sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS m
      FROM nn WHERE rank <= 10 GROUP BY qid, qlabel)
    SELECT qlabel AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(m) AS BIGINT) AS n_label_matches,
           CAST((2 * sum(m) * 1000000 + count(*) * 10)
                // (2 * count(*) * 10) AS BIGINT) AS purity_e6
    FROM k GROUP BY qlabel
    """,
)
def emb_knn_label_purity(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-quality EVAL: for every vector, how many of its 10 exact
    cosine neighbors share its label — per-label kNN purity, the standard
    sanity metric before an embedding column is trusted for clustering or
    near-dup work (low purity = the space does not separate the labels).
    Reuses the brute-force top-k kernel (queries broadcast, WindowGroupLimit
    per-partition top-k) with both label joins broadcast; purity is an
    exact half-up e6 over integer match counts — no float aggregation
    anywhere past the audited cosine ordering.  At 100 TB the eval runs on
    a fixed sample of queries against the full corpus (the
    emb_ivf_recall_sampled pattern); the metric's algebra is unchanged."""
    from presto_ethereum_spark.operators.similarity import brute_force_topk

    e = t_spread(spark, sf, "embeddings", parts=8)
    nn = brute_force_topk(e, e, k=10)
    labels = e.select("vec_id", "label")
    q = F.broadcast(
        labels.select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
        )
    )
    n = F.broadcast(
        labels.select(
            F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
        )
    )
    per_q = (
        nn.join(q, "query_id")
        .join(n, "neighbor_id")
        .groupBy("query_id", "qlabel")
        .agg(
            F.sum(
                F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0)
            ).alias("m")
        )
    )
    return per_q.groupBy(F.col("qlabel").alias("label")).agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("m").cast("long").alias("n_label_matches"),
        F.expr(
            "CAST((2 * sum(m) * 1000000 + count(*) * 10)"
            " DIV (2 * count(*) * 10) AS BIGINT)"
        ).alias("purity_e6"),
    )


@q(
    "emb_similar_pairs",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_DUCK_COSINE}, 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_DUCK_COSINE} >= 0.3
    """,
)
def emb_similar_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact, >= 0.3) via the broadcast
    block-GEMM kernel (operators/similarity.cosine_pairs_gemm): the corpus
    streams map-only against a broadcast matrix; the O(N²) pair set never
    materializes as rows, and the column-ordered numpy accumulation is
    bit-identical to the expression fold, so the oracle hash is unchanged."""
    from presto_ethereum_spark.operators.similarity import cosine_pairs_gemm

    return cosine_pairs_gemm(t_spread(spark, sf, "embeddings", parts=8), threshold=0.3)


@q(
    "emb_dup_threshold_curve",
    f"""
    WITH p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DUCK_COSINE}, 6) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {_DUCK_COSINE} >= 0.2),
    bkt AS (
      SELECT CAST(floor(sim * 10) AS INT) AS bucket, id_a, id_b FROM p),
    hist AS (SELECT bucket, count(*) AS n_pairs FROM bkt GROUP BY bucket),
    docs AS (
      SELECT bucket, count(DISTINCT doc) AS n_docs FROM (
        SELECT bucket, id_a AS doc FROM bkt
        UNION ALL SELECT bucket, id_b FROM bkt) GROUP BY bucket)
    SELECT s.bucket,
           CAST(s.bucket AS DOUBLE) / 10 AS cos_lo,
           CAST(coalesce(h.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(d.n_docs, 0) AS BIGINT) AS n_docs_in_band,
           CAST(sum(coalesce(h.n_pairs, 0)) OVER (
               ORDER BY s.bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_pairs_at_or_above
    FROM (SELECT CAST(unnest(range(2, 11)) AS INT) AS bucket) s
    LEFT JOIN hist h USING (bucket)
    LEFT JOIN docs d USING (bucket)
    """,
)
def emb_dup_threshold_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Threshold-tuning curve for SEMANTIC dedup — the embedding twin of
    doc_jaccard_threshold_curve: pair counts per cosine band (0.2..1.0 in
    0.1 steps, floor of the round-6 sim), distinct docs touched per band,
    and the cumulative "pairs a threshold t would emit" tail, all read
    off ONE broadcast block-GEMM pass (the exact kernel emb_similar_pairs
    gates) instead of one corpus pass per candidate threshold.  Band
    membership uses the ROUNDED sim, pair admission the raw >= 0.2 filter
    — both mirrored in the oracle.  The 9-row spine reports empty bands;
    at 100 TB the sweep inherits the kernel's tiling/LSH escape hatches
    unchanged."""
    from presto_ethereum_spark.operators.similarity import cosine_pairs_gemm

    pairs = cosine_pairs_gemm(
        t_spread(spark, sf, "embeddings", parts=8), threshold=0.2
    )
    b = pairs.select(
        F.floor(F.col("sim") * 10).cast("int").alias("bucket"), "id_a", "id_b"
    )
    hist = b.groupBy("bucket").agg(F.count("*").alias("n_pairs"))
    docs = (
        b.select("bucket", F.explode(F.array("id_a", "id_b")).alias("doc"))
        .groupBy("bucket")
        .agg(F.count_distinct("doc").alias("n_docs"))
    )
    spine = spark.range(2, 11).select(F.col("id").cast("int").alias("bucket"))
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(hist, "bucket", "left")
        .join(docs, "bucket", "left")
        .select(
            "bucket",
            (F.col("bucket").cast("double") / 10).alias("cos_lo"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs_in_band"),
        )
        .withColumn(
            "n_pairs_at_or_above", F.sum("n_pairs").over(w).cast("long")
        )
    )


_IVF_CODEBOOKS: dict[str, list] = {}


def _duck_cos(x: str, y: str) -> str:
    """DuckDB cosine between two embedding column refs (double math, same
    accumulation as operators/similarity.cosine -> bit-stable ordering)."""
    return (
        f"(list_dot_product(CAST({x} AS DOUBLE[]), CAST({y} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST({x} AS DOUBLE[]), CAST({x} AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST({y} AS DOUBLE[]), CAST({y} AS DOUBLE[])))))"
    )


@q(
    "emb_ivf_topk",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_duck_cos('c.cvec', 'e.embedding')} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, embedding AS qvec, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored WHERE vec_id < 5) WHERE rnk <= 2
    )
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round({_duck_cos('p.qvec', 'a.embedding')}, 6) AS sim,
           CAST(row_number() OVER (PARTITION BY p.query_id
                                   ORDER BY {_duck_cos('p.qvec', 'a.embedding')} DESC,
                                            a.vec_id) AS INT) AS rank
    FROM probe p JOIN assign a ON a.cid = p.cid AND a.vec_id != p.query_id
    QUALIFY rank <= 10
    """,
)
def emb_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN, the cell-partitioned scale path (operators/similarity.py):
    codebook = 8 seed centroids inlined as a plan literal, corpus cell
    assignment is a pure map-side expression (zero shuffle), each query
    probes its 2 closest cells, exact cosine re-rank inside probed cells.
    The oracle replicates the entire pipeline closed-form in SQL, so this is
    an exact differential test of an *approximate* index."""
    from presto_ethereum_spark.operators.similarity import ivf_topk, seed_centroids

    e = t_spread(spark, sf, "embeddings", parts=8)
    # codebook build is a one-time index step — memoize per dataset so
    # repeated serving queries skip the driver-side collect job
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    return ivf_topk(
        e, e.where(F.col("vec_id") < 5), centroids=cents, nprobe=2, k=10
    )


@q(
    "emb_norms",
    """
    SELECT vec_id, label,
           round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 4) AS l2_norm
    FROM embeddings
    """,
)
def emb_norms(spark: SparkSession, sf: str) -> DataFrame:
    """L2 norms via in-order double folds on both engines (identical
    accumulation sequence -> bit-stable before rounding)."""
    e = t(spark, sf, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select("vec_id", "label", F.round(F.sqrt(dot), 4).alias("l2_norm"))


# ---------------------------------------------------------------------------
# Additional SQL-surface coverage (percentiles, arrays, range frames,
# navigation window functions, selector decode)
# ---------------------------------------------------------------------------


@q(
    "rel_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(min(l_extendedprice), 4) AS lo,
           round(max(l_extendedprice), 4) AS hi
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rel_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (Presto's percentile family -> Spark
    ``percentile``; both engines use the linear-interpolation definition).
    At scale the approx_percentile sketch replaces this plan one-for-one."""
    li = t(spark, sf, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            pct.alias("pct"),
            F.round(F.min("l_extendedprice"), 4).alias("lo"),
            F.round(F.max("l_extendedprice"), 4).alias("hi"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("pct")[0], 4).alias("p25"),
            F.round(F.col("pct")[1], 4).alias("p50"),
            F.round(F.col("pct")[2], 4).alias("p75"),
            "lo",
            "hi",
        )
    )


@q(
    "rel_token_explode",
    """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
          FROM documents WHERE lang = 'en')
    WHERE token != ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def rel_token_explode(spark: SparkSession, sf: str) -> DataFrame:
    """Array explode (Presto UNNEST / Spark explode) into a frequency agg —
    the generator runs inside whole-stage codegen, no Python row path."""
    docs = t(spark, sf, "documents")
    return (
        docs.where(F.col("lang") == "en")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


@q(
    "rel_window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS spend_30d
    FROM orders
    """,
)
def rel_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame over a day-number axis: trailing-30-day spend per
    customer.  Decimal accumulation inside the frame -> order-independent
    exact sums on both engines."""
    o = t(spark, sf, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


@q(
    "rel_window_navigation",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey)  OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key,
           round(percent_rank() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey), 6)
               AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def rel_window_navigation(spark: SparkSession, sf: str) -> DataFrame:
    """Navigation window family (first/last/nth value, percent_rank) with an
    explicit unbounded ROWS frame and a total tie-broken ordering."""
    o = t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rank = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        F.round(F.percent_rank().over(w_rank), 6).alias("pct_rank"),
    )


@q(
    "eth_method_selectors",
    f"""
    SELECT substr(tx_input, 1, 10) AS selector, count(*) AS n_calls
    FROM read_parquet('{ETH}/transaction.parquet')
    WHERE tx_input != '0x' AND tx_to IS NOT NULL
    GROUP BY selector
    """,
)
def eth_method_selectors(spark: SparkSession, sf: str) -> DataFrame:
    """4-byte function-selector histogram over calldata — the standard
    contract-usage query the reference corpus implies (tx_input,
    EthereumMetadata.java:134); '0x' = plain value transfer, excluded."""
    tx = _eth_tables(spark).table("transaction")
    return (
        tx.where((F.col("tx_input") != "0x") & F.col("tx_to").isNotNull())
        .groupBy(F.substring("tx_input", 1, 10).alias("selector"))
        .agg(F.count("*").alias("n_calls"))
    )


@q(
    "eth_selector_gas_economics",
    f"""
    WITH tx AS (
      SELECT substr(tx_input, 1, 10) AS selector,
             CAST(tx_gas AS HUGEINT) AS g,
             CAST(tx_gas AS HUGEINT) * CAST(tx_gasprice AS HUGEINT) AS fee
      FROM read_parquet('{ETH}/transaction.parquet')
      WHERE tx_input != '0x' AND tx_to IS NOT NULL),
    tot AS (SELECT sum(g) AS tg FROM tx),
    per AS (
      SELECT selector, count(*) AS n_calls, sum(g) AS sg, sum(fee) AS sfee
      FROM tx GROUP BY selector)
    SELECT selector,
           CAST(n_calls AS BIGINT) AS n_calls,
           CAST(sg AS BIGINT) AS gas_total,
           CAST(CAST(sfee AS DECIMAL(38,0)) AS VARCHAR) AS fee_wei_total,
           CAST((2 * sg * 1000000 + tg) // (2 * tg) AS BIGINT)
             AS gas_share_ppm
    FROM per, tot
    """,
)
def eth_selector_gas_economics(spark: SparkSession, sf: str) -> DataFrame:
    """Gas economics per 4-byte method selector — which contract methods
    consume the chain: call counts, exact total gas, exact total fee
    (gas x gasprice as DECIMAL(38,0) products — the integral-wei-double
    discipline of eth_address_ledger; the fee total is read out as the
    canonical digit string since it outgrows int64 on real chains), and
    each selector's half-up ppm share of all contract-call gas.  One
    grouped aggregate plus a broadcast 1-row total — the
    eth_method_selectors histogram upgraded into the fee-market report.

    Scale honesty, gas_share_ppm term: the half-up numerator
    ``2*sg*1e6 + tg`` stays in DECIMAL(38,0) while sg < ~5e31 gas units
    — fourteen orders of magnitude above all gas ever burned on mainnet
    (~1e17), so the bound is documentation, not a risk; past it,
    non-ANSI Spark would NULL the term while a HUGEINT oracle keeps
    computing (the fee_wei_total divergence class)."""
    tx = _eth_tables(spark).table("transaction")
    g = F.col("tx_gas").cast("decimal(38,0)")
    fee = g * F.col("tx_gasprice").cast("decimal(38,0)")
    base = tx.where(
        (F.col("tx_input") != "0x") & F.col("tx_to").isNotNull()
    ).select(
        F.substring("tx_input", 1, 10).alias("selector"),
        g.alias("g"),
        fee.alias("fee"),
    )
    tot = base.agg(F.sum("g").cast("decimal(38,0)").alias("tg"))
    return (
        base.groupBy("selector")
        .agg(
            F.count("*").alias("n_calls"),
            F.sum("g").alias("sg"),
            F.sum("fee").cast("decimal(38,0)").alias("sfee"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "selector",
            F.col("n_calls").cast("long").alias("n_calls"),
            F.col("sg").cast("long").alias("gas_total"),
            F.col("sfee").cast("string").alias("fee_wei_total"),
            F.expr(
                "CAST((2 * CAST(sg AS DECIMAL(38,0)) * 1000000 + tg)"
                " div (2 * tg) AS BIGINT)"
            ).alias("gas_share_ppm"),
        )
    )


@q(
    "rel_cross_join",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def rel_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit cartesian product (Presto CROSS JOIN) — Spark plans a
    BroadcastNestedLoopJoin when one side is small."""
    return (
        t(spark, sf, "region")
        .crossJoin(t(spark, sf, "nation"))
        .select("r_name", "n_name")
    )


@q(
    "rel_right_join",
    """
    SELECT c_custkey, c_mktsegment, o_orderkey
    FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c_acctbal < -900
    """,
)
def rel_right_join(spark: SparkSession, sf: str) -> DataFrame:
    """RIGHT OUTER join: customers with no qualifying (>450k) order are
    preserved with null o_orderkey — completes the outer-join family next to
    left/full/semi/anti coverage."""
    o, c = t(spark, sf, "orders"), t(spark, sf, "customer")
    big = o.where(F.col("o_totalprice") > 450000)
    return (
        big.join(c, big["o_custkey"] == c["c_custkey"], "right")
        .where(F.col("c_acctbal") < -900)
        .select("c_custkey", "c_mktsegment", "o_orderkey")
    )


@q(
    "rel_salted_agg",
    """
    SELECT event_type,
           count(event_id) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def rel_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py) over the hot-keyed
    event_type column.  The oracle is the PLAIN group-by: salting must be
    invisible in the result — decimal sums make the claim exact, not
    approximate, under the extra reorder."""
    from presto_ethereum_spark.operators.skew import salted_agg

    ev = t(spark, sf, "events")
    return salted_agg(
        ev,
        keys=["event_type"],
        aggs=[
            ("count", F.col("event_id"), "n"),
            ("sum", F.col("value").cast("decimal(18,6)"), "total_value"),
            ("min", F.col("value"), "min_value"),
            ("max", F.col("value"), "max_value"),
        ],
        salt_buckets=16,
        salt_on="event_id",
    ).withColumn("total_value", F.col("total_value").cast("double"))


@q(
    "eth_chain_state_udf",
    f"""
    SELECT tx_from AS address,
           count(*) AS n_sent,
           CAST(count(*) AS BIGINT) AS udf_tx_count
    FROM read_parquet('{ETH}/transaction.parquet')
    GROUP BY tx_from
    """,
)
def eth_chain_state_udf(spark: SparkSession, sf: str) -> DataFrame:
    """Chain-state UDF differential (SURVEY §2.C): eth_getTransactionCount
    over a FixtureBackend whose state is the actual per-sender transaction
    count of the chain — the Arrow-batched UDF lookup path must reproduce the
    SQL aggregation exactly.  The backend receives its state dict driver-side
    (the same shape an RPC node would return); the UDF runs distributed.

    DO NOT copy the ``.collect()`` below into production code: it exists
    only to SIMULATE an archive node for the graded differential (the
    collected dict is O(distinct senders) and would not fit the driver at
    chain scale).  The production backend is ``RpcBackend``
    (functions/web3.py), which holds NO driver state — each executor
    batch issues its own eth_getTransactionCount calls; this fixture
    entry grades the UDF plumbing, not the backend.
    """
    from presto_ethereum_spark.functions.web3 import (
        FixtureBackend,
        make_chain_state_udfs,
    )

    tx = _eth_tables(spark).table("transaction")
    sent = tx.groupBy("tx_from").agg(F.count("*").alias("n_sent"))
    state = {
        r["tx_from"]: {"tx_count": r["n_sent"]} for r in sent.collect()
    }
    udfs = make_chain_state_udfs(FixtureBackend(state))
    return sent.select(
        F.col("tx_from").alias("address"),
        "n_sent",
        udfs["eth_getTransactionCount"](F.col("tx_from"), F.lit("latest")).alias(
            "udf_tx_count"
        ),
    )


@q(
    "eth_chain_state_historical",
    f"""
    SELECT tx_from AS address,
           count(*) FILTER (WHERE tx_blocknumber <= 800) AS n_upto_800,
           CAST(count(*) FILTER (WHERE tx_blocknumber <= 800) AS BIGINT)
             AS udf_count_800,
           count(*) FILTER (WHERE tx_blocknumber <= 1600) AS n_upto_1600,
           CAST(count(*) FILTER (WHERE tx_blocknumber <= 1600) AS BIGINT)
             AS udf_count_1600,
           count(*) AS n_total,
           CAST(count(*) AS BIGINT) AS udf_count_latest
    FROM read_parquet('{ETH}/transaction.parquet')
    GROUP BY tx_from
    """,
)
def eth_chain_state_historical(spark: SparkSession, sf: str) -> DataFrame:
    """Historical-block chain-state overloads (udfs/EthereumUDFs.java:75-94:
    ``eth_getTransactionCount(addr, blockNumber)``): the FixtureBackend
    holds per-block state CHECKPOINTS (nonce = txs sent at-or-before the
    checkpoint block), and the UDF's numeric block argument must resolve
    each address to the right snapshot — differentially pinned against the
    conditional-count SQL at blocks 800, 1600, and latest.

    The state dicts are built driver-side (they simulate what an archive
    node holds); the UDF lookups run distributed over Arrow batches.
    As in eth_chain_state_udf: the ``.collect()`` is the fixture's
    archive-node simulation, NOT a pattern to copy — production uses the
    driver-stateless ``RpcBackend``."""
    from presto_ethereum_spark.functions.web3 import (
        FixtureBackend,
        make_chain_state_udfs,
    )

    tx = _eth_tables(spark).table("transaction")
    per_sender = tx.groupBy("tx_from").agg(
        F.sum(F.when(F.col("tx_blocknumber") <= 800, 1).otherwise(0)).alias("c800"),
        F.sum(F.when(F.col("tx_blocknumber") <= 1600, 1).otherwise(0)).alias(
            "c1600"
        ),
        F.count("*").alias("ctot"),
    )
    rows = per_sender.collect()
    ck = {
        b: {
            r["tx_from"]: {"tx_count": int(r[c])}
            for r in rows
            if int(r[c]) > 0  # archive nodes don't store untouched accounts
        }
        for b, c in ((800, "c800"), (1600, "c1600"))
    }
    head_state = {r["tx_from"]: {"tx_count": int(r["ctot"])} for r in rows}
    udfs = make_chain_state_udfs(
        FixtureBackend(head_state, head=2400, checkpoints=ck)
    )
    nonce = udfs["eth_getTransactionCount"]
    return per_sender.select(
        F.col("tx_from").alias("address"),
        F.col("c800").alias("n_upto_800"),
        nonce(F.col("tx_from"), F.lit(800)).alias("udf_count_800"),
        F.col("c1600").alias("n_upto_1600"),
        nonce(F.col("tx_from"), F.lit(1600)).alias("udf_count_1600"),
        F.col("ctot").alias("n_total"),
        nonce(F.col("tx_from"), F.lit("latest")).alias("udf_count_latest"),
    )


@q(
    "doc_winnow_fps",
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents),
    grams AS (
      SELECT n.doc_id, r.i,
             CAST(concat('0x', substr(md5(substr(n.t, CAST(r.i AS INT), 8)), 1, 15)) AS BIGINT) AS hv,
             length(n.t) - 7 AS m
      FROM norm n, unnest(range(1, greatest(length(n.t) - 7, 0) + 1)) AS r(i)),
    wins AS (
      SELECT doc_id, i, m,
             min(hv) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM grams)
    SELECT DISTINCT doc_id, fp FROM wins WHERE i <= m - 3
    """,
)
def doc_winnow_fps(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing (MOSS rolling-hash) fingerprints, k=8 w=4
    (operators/text.py): any shared >=11-char normalized substring yields a
    shared fingerprint, so overlap detection is a join on small integers.
    The whole selection runs as one JVM expression per document; the oracle
    recomputes it with window minima over exploded grams — two independent
    formulations of the same algorithm."""
    from presto_ethereum_spark.operators.text import winnow_fingerprints

    docs = t_spread(spark, sf, "documents")
    return (
        winnow_fingerprints(docs)
        .select("doc_id", F.explode_outer("fps").alias("fp"))
        .where(F.col("fp").isNotNull())
    )


@q(
    "stream_dedup_keys",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_keys(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicates over projected keys, run to
    completion with availableNow — must equal batch SELECT DISTINCT under
    any arrival order (streaming/events.py)."""
    from presto_ethereum_spark.streaming.events import run_stream_dedup

    return run_stream_dedup(spark, sf)


@q(
    "doc_winnow_overlap",
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents),
    grams AS (
      SELECT n.doc_id, r.i,
             CAST(concat('0x', substr(md5(substr(n.t, CAST(r.i AS INT), 8)), 1, 15)) AS BIGINT) AS hv,
             length(n.t) - 7 AS m
      FROM norm n, unnest(range(1, greatest(length(n.t) - 7, 0) + 1)) AS r(i)),
    wins AS (
      SELECT doc_id, i, m,
             min(hv) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM grams),
    fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE i <= m - 3)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY id_a, id_b
    HAVING count(*) >= 5
    """,
)
def doc_winnow_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Containment/boilerplate detection: pairs sharing >= 5 winnowing
    fingerprints (operators/dedup.winnow_overlap_pairs) — catches shared
    substrings that global-Jaccard methods miss."""
    from presto_ethereum_spark.operators.dedup import winnow_overlap_pairs

    return winnow_overlap_pairs(t_spread(spark, sf, "documents"), min_shared=5)


@q(
    "stream_static_join",
    """
    SELECT c_mktsegment,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static enrichment join run to completion (availableNow): the
    customer dimension broadcasts per micro-batch, so the streaming result
    must equal the batch join+aggregate exactly (streaming/events.py)."""
    from presto_ethereum_spark.streaming.events import run_stream_static_join

    return run_stream_static_join(spark, sf)


@q(
    "stream_stream_join",
    """
    WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us
                FROM events)
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           p.t_us - c.t_us AS delta_us
    FROM ev c JOIN ev p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.t_us >= c.t_us AND p.t_us <= c.t_us + 3600000000
    """,
)
def stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked STREAM-STREAM join run to completion: clicks matched to
    the same user's purchases within an hour — both sides watermarked and
    the interval condition bounds the buffered state (streaming/events.py:
    stream_stream_join).  The settled availableNow result must equal the
    batch interval self-join exactly."""
    from presto_ethereum_spark.streaming.events import run_stream_stream_join

    return run_stream_stream_join(spark, sf)


@q(
    "rel_grouped_median_udaf",
    """
    SELECT c_mktsegment,
           count(*) AS n,
           median(c_acctbal) AS median_acctbal
    FROM customer GROUP BY c_mktsegment
    """,
)
def rel_grouped_median_udaf(spark: SparkSession, sf: str) -> DataFrame:
    """Custom aggregate via a GROUPED-AGG pandas UDF — the UDAF face of
    the Python surface (SURVEY §2.C anticipates scalar UDFs; this is the
    aggregation analogue): per-segment median account balance, Arrow
    batch in, scalar out.  pandas' even-n interpolation ((a+b)/2 of the
    two middles) is the same fp64 op DuckDB's median performs, so the
    differential is exact.  Scale: grouped-agg UDFs shuffle the group's
    column to one executor — right for bounded groups (segments); an
    unbounded-group median belongs to approx_percentile instead."""
    from presto_ethereum_spark.functions.udaf import count_udaf, median_udaf

    c = t(spark, sf, "customer")
    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg, so the count rides a pandas UDAF too
    return c.groupBy("c_mktsegment").agg(
        count_udaf()(F.col("c_acctbal")).alias("n"),
        median_udaf()(F.col("c_acctbal")).alias("median_acctbal"),
    )


def _sql_views(spark: SparkSession, sf: str) -> None:
    """Register the testdata tables as temp views for queries exercised
    through ``spark.sql`` — the correlated-subquery shapes below go through
    Catalyst's decorrelation, which the DataFrame API cannot express."""
    from presto_ethereum_spark.session import register_testdata_views

    register_testdata_views(spark, sf)


@q(
    "doc_semantic_dedup",
    f"""
    WITH RECURSIVE de AS (
      SELECT d.doc_id, d.source, e.embedding
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM de a JOIN de b ON a.doc_id < b.doc_id
      WHERE {_duck_cos('a.embedding', 'b.embedding')} >= 0.3),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, root) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.root FROM reach r JOIN edges e ON e.s = r.id),
    comp AS (SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id)
    SELECT c.doc_id, c.cluster_id,
           count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
           c.doc_id = c.cluster_id AS is_keeper,
           de.source
    FROM comp c JOIN de ON de.doc_id = c.doc_id
    """,
)
def doc_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SEMANTIC dedup end to end — the embedding-cosine near-dup pipeline
    bridged to the document corpus: embeddings join their documents, exact
    cosine pairs (broadcast GEMM kernel) feed the connected-components
    closure, and each cluster elects its min-id keeper with source
    metadata attached.  This is the full "drop semantic duplicates before
    training" shape; the lexical families (MinHash/SimHash/Jaccard) catch
    re-crawls, this catches paraphrases."""
    from presto_ethereum_spark.operators.dedup import dup_clusters
    from presto_ethereum_spark.operators.similarity import cosine_pairs_gemm

    d = t(spark, sf, "documents").select("doc_id", "source")
    e = t_spread(spark, sf, "embeddings", parts=8)
    joined = (
        e.join(d, e["vec_id"] == d["doc_id"])
        .select("doc_id", "source", "embedding")
    )
    pairs = cosine_pairs_gemm(
        joined, threshold=0.3, id_col="doc_id", vec_col="embedding"
    ).select("id_a", "id_b")
    clusters = dup_clusters(pairs)
    return clusters.join(d, "doc_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
        "source",
    )


@q(
    "rel_partitioned_write_roundtrip",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def rel_partitioned_write_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """The WRITE path on the oracle gate: orders land as Hive-partitioned
    parquet (sources/sink.write_partitioned, partitioned by order status),
    are read back through a partition-pruned scan (only the 'F' directory
    is touched — the write-side complement of the scan's block-range
    pushdown), and the aggregate over the round-trip must equal the
    direct SQL.  DECIMAL sum keeps the comparison exact."""
    import tempfile

    from presto_ethereum_spark.sources.sink import write_partitioned

    o = t(spark, sf, "orders")
    path = tempfile.mkdtemp(prefix="pes_roundtrip_") + "/orders_part"
    write_partitioned(o, path, ["o_orderstatus"])
    back = spark.read.parquet(path)
    return (
        back.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@q(
    "rel_salted_skew_join",
    """
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def rel_salted_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    """Manual skew-salted equi-join (operators/joins.salted_join, 8
    salts): the probe side gets a deterministic per-row salt, the build
    side replicates once per salt, the join keys on (key, salt) — so a
    hot key spreads over 8 reducers instead of serializing one.  The
    oracle is the PLAIN join: hash equality is the standing proof that
    salting is result-invariant (each probe row meets exactly the one
    replica carrying its salt).  AQE's runtime skew split is the first
    choice; the manual form exists for plans AQE can't rewrite (pinned
    partitioning into stateful streams/bucketed writes, non-AQE
    engines) — see the joins.py cost model: salt the join, not the
    corpus, and replicate the smaller side."""
    from presto_ethereum_spark.operators.joins import salted_join

    ev = t(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    cust = t(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        ev, cust, on="user_id", salt_from=F.col("event_id"), n_salts=8
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


@q(
    "rel_text_formats_roundtrip",
    """
    WITH ev AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_json,
           CAST(count(*) AS BIGINT) AS n_csv,
           CAST(sum(cents) AS BIGINT) AS sum_cents_json,
           CAST(sum(cents) AS BIGINT) AS sum_cents_csv
    FROM ev GROUP BY event_type
    """,
)
def rel_text_formats_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Text source formats on the oracle gate: the events slice lands as
    JSON-lines AND headered CSV, is read back through explicit-schema
    scans of each, and the per-type aggregates of BOTH round-trips must
    equal the direct parquet SQL — one entry proving the json/csv
    read+write surface end-to-end (schema projection, NULL round-trip:
    JSON drops null fields, CSV writes empty cells; both must come back
    as NULLs the aggregates skip identically).  Values travel as integer
    cents and epoch-µs longs — text formats get no float or timestamp
    formatting ambiguity to round-trip.  At scale both writers/readers
    are splittable line formats: a 100 TB JSONL drop scans with the same
    per-file parallelism as parquet, minus pushdown — which is exactly
    why the graded aggregate re-reads everything: text formats are the
    interchange surface, parquet stays the analytics layout."""
    import tempfile

    ev = t(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.expr("ts DIV 1000").alias("t_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    base = tempfile.mkdtemp(prefix="pes_textfmt_")
    ev.write.mode("overwrite").json(base + "/ev_json")
    ev.write.mode("overwrite").option("header", True).csv(base + "/ev_csv")
    schema = "event_id long, event_type string, t_us long, cents long"
    back_j = spark.read.schema(schema).json(base + "/ev_json")
    back_c = (
        spark.read.schema(schema).option("header", True).csv(base + "/ev_csv")
    )
    agg_j = back_j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_json"),
        F.sum("cents").cast("long").alias("sum_cents_json"),
    )
    agg_c = back_c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_csv"),
        F.sum("cents").cast("long").alias("sum_cents_csv"),
    )
    # inner join: both sides aggregate the SAME written rows, so the key
    # sets are identical by construction (a divergence would surface as a
    # row-count mismatch against the oracle, which is the point)
    return agg_j.join(agg_c, "event_type").select(
        "event_type", "n_json", "n_csv", "sum_cents_json", "sum_cents_csv"
    )


@q(
    "eth_nonce_gaps",
    f"""
    WITH seq AS (
      SELECT tx_from, tx_nonce,
             lag(tx_nonce) OVER (PARTITION BY tx_from
                                 ORDER BY tx_nonce, tx_hash) AS prev_nonce
      FROM read_parquet('{ETH}/transaction.parquet'))
    SELECT tx_from AS sender,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(tx_nonce - prev_nonce - 1) AS BIGINT) AS missing_nonces,
           CAST(min(prev_nonce + 1) AS BIGINT) AS first_missing
    FROM seq
    WHERE prev_nonce IS NOT NULL AND tx_nonce - prev_nonce > 1
    GROUP BY tx_from
    """,
)
def eth_nonce_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Nonce-gap detection per sender — the completeness audit for an
    ingested chain slice: a sender's nonces must be consecutive, so a gap
    means the scan missed transactions (or the range cut mid-account).
    One window over (sender, nonce) + a filtered aggregate; the window
    partitions by sender, so it parallelizes per account at any chain
    size."""
    tx = _eth_tables(spark).table("transaction")
    w = Window.partitionBy("tx_from").orderBy("tx_nonce", "tx_hash")
    seq = tx.select(
        "tx_from", "tx_nonce", F.lag("tx_nonce").over(w).alias("prev_nonce")
    )
    return (
        seq.where(
            F.col("prev_nonce").isNotNull()
            & (F.col("tx_nonce") - F.col("prev_nonce") > 1)
        )
        .groupBy(F.col("tx_from").alias("sender"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum(F.col("tx_nonce") - F.col("prev_nonce") - 1)
            .cast("bigint")
            .alias("missing_nonces"),
            F.min(F.col("prev_nonce") + 1).cast("bigint").alias("first_missing"),
        )
    )


@q(
    "eth_erc20_exact_flows",
    f"""
    WITH lg AS (
      SELECT unnest(t.logs) AS l
      FROM (SELECT unnest(transactions) AS t
            FROM read_parquet('{ETH}/chain_blocks.parquet'))
    ),
    tr AS (
      SELECT l.address AS token_address, l.data AS data
      FROM lg
      WHERE lower(l.topics[1]) =
            '0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef'
        AND len(l.topics) >= 3
        AND length(l.data) = 66
        AND substr(l.data, 3, 34) = repeat('0', 34)
    )
    SELECT token_address,
           count(*) AS n_transfers,
           CAST(CAST(sum(
             CAST(CAST(concat('0x', substr(data, 37, 15)) AS BIGINT) AS HUGEINT)
               * 1152921504606846976
             + CAST(CAST(concat('0x', substr(data, 52, 15)) AS BIGINT) AS HUGEINT)
           ) AS DECIMAL(38,0)) AS VARCHAR) AS total_wei_exact
    FROM tr GROUP BY token_address
    """,
)
def eth_erc20_exact_flows(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT token flows — the Decimal extension the survey's build plan
    reserves (SURVEY §7 "optional Decimal mode"): standard 3-topic
    Transfer events decode their value hex to DECIMAL(38,0)
    (decode.hex_to_decimal_col) and sum exactly — no double mantissa loss
    at any aggregation size, partition-order independent by construction.
    The oracle reassembles each value as hi*2^60 + lo HUGEINT chunks from
    the same hex.  Values needing > 120 bits are excluded by the
    leading-zero guard on BOTH engines (none exist in the fixture; the
    guard makes the contract explicit).  The exact total is read out as
    its canonical digit string: client bridges narrow wide decimals
    inconsistently (DuckDB pandas -> float64), and the base-10 string is
    the representation both engines agree on byte-for-byte
    (CORRECTNESS_r09's eth_erc20_balances hash finding)."""
    from presto_ethereum_spark.sources.decode import hex_to_decimal_col

    chain = _eth_tables(spark).chain
    logs = chain.select(F.explode("transactions").alias("t")).select(
        F.explode("t.logs").alias("l")
    )
    tr = logs.where(
        (
            F.lower(F.col("l.topics")[0])
            == "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
        )
        & (F.size("l.topics") >= 3)
        # standard single-field Transfer data only: fully-indexed events
        # with multi-field data (ERC-721-ish) put the id in data and parse
        # to values past Decimal(38) — outside the exact-mode contract
        & (F.length("l.data") == 66)
        & (F.substring(F.col("l.data"), 3, 34) == "0" * 34)
    ).select(
        F.col("l.address").alias("token_address"),
        hex_to_decimal_col(F.col("l.data")).alias("wei_exact"),
    )
    return tr.groupBy("token_address").agg(
        F.count("*").alias("n_transfers"),
        F.sum("wei_exact").cast("decimal(38,0)").cast("string").alias("total_wei_exact"),
    )


@q(
    "stream_ivf_ingest",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, c.cid, {_duck_cos('c.cvec', 'e.embedding')} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    )
    SELECT CAST(cid AS INT) AS cell, count(*) AS n_vectors
    FROM assign GROUP BY cid
    """,
)
def stream_ivf_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming ANN index ingest: the vector stream assigns IVF cells
    MAP-SIDE inside the micro-batch (ivf_assign is a pure projection, so
    it runs unchanged on a streaming DataFrame — zero state beyond the
    per-cell counters).  The settled per-cell histogram must equal the
    batch assignment exactly — pins that index maintenance can ride
    Structured Streaming without a separate code path."""
    from presto_ethereum_spark.operators.similarity import seed_centroids
    from presto_ethereum_spark.streaming.events import run_ivf_ingest

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    return run_ivf_ingest(spark, sf, cents)


@q(
    "doc_sentences_udtf",
    """
    SELECT d.doc_id,
           parts[CAST(r.i AS INT)] AS sentence,
           CAST(r.i - 1 AS INT) AS pos,
           CAST(len(string_split(parts[CAST(r.i AS INT)], ' ')) AS INT)
             AS n_words
    FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents) d,
         unnest(range(1, len(parts) + 1)) r(i)
    """,
)
def doc_sentences_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF through a LATERAL join — Spark 4's table-function
    surface (functions/udaf.split_sentences_udtf): each document expands
    to one row per sentence with position and word count, computed in
    Python per input row.  The oracle is the pure-SQL split+unnest."""
    from presto_ethereum_spark.functions.udaf import split_sentences_udtf

    _sql_views(spark, sf)
    spark.udtf.register("split_sentences", split_sentences_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence, s.pos, s.n_words
        FROM documents d, LATERAL split_sentences(d.text) s
        """
    )


@q(
    "rel_min_price_supplier",
    """
    SELECT p.p_partkey, p.p_name, s.s_name,
           l.l_extendedprice AS min_price
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 5
      AND l.l_extendedprice = (
            SELECT min(l2.l_extendedprice) FROM lineitem l2
            WHERE l2.l_partkey = p.p_partkey)
    """,
)
def rel_min_price_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2-shaped correlated SCALAR-MIN subquery: the cheapest
    supplier per small part, with the min correlated on the outer part
    key.  Catalyst decorrelates to an aggregate + join (no per-row
    re-execution); ties (two lineitems at the min price) surface in both
    engines identically because min is exact on stored doubles."""
    _sql_views(spark, sf)
    return spark.sql(battery_oracle("rel_min_price_supplier"))


@q(
    "rel_small_qty_revenue",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS small_qty_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
    """,
)
def rel_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17-shaped correlated AVG subquery (small-quantity-order
    revenue).  Exactness: l_quantity is integer-valued, so the correlated
    avg is order-free in fp64; the revenue sum rides DECIMAL."""
    _sql_views(spark, sf)
    return spark.sql(battery_oracle("rel_small_qty_revenue"))


@q(
    "rel_inactive_by_nation",
    """
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS a
      FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey AS nationkey,
           count(*) AS n_cust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def rel_inactive_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22-shaped: above-average-balance customers with NO orders,
    per nation — scalar subquery + anti-join (NOT EXISTS) + aggregate.
    The threshold average is computed through DECIMAL so the boundary
    comparison cannot flip on accumulation order."""
    _sql_views(spark, sf)
    return spark.sql(battery_oracle("rel_inactive_by_nation"))


@q(
    "rel_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def rel_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two fact joins -> grouped
    revenue -> global top-10.  Decimal revenue makes the ORDER BY
    deterministic under any partitioning (exact sums, no fp ordering
    races)."""
    c = t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = t(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Interval (range) join, approximate sketches as graded queries, LSH ANN
# ---------------------------------------------------------------------------

_HOUR_US = 3_600_000_000  # 1 hour in epoch-µs


@q(
    "rel_range_join",
    f"""
    WITH ev AS (SELECT event_id, epoch_us(ts) AS t_us, value FROM events),
    probes AS (
      SELECT event_id AS probe_id, t_us AS w_start, t_us + {_HOUR_US} AS w_end
      FROM ev WHERE event_id < 25
    )
    SELECT p.probe_id, count(*) AS n_in_window,
           CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM probes p JOIN ev e ON e.t_us >= p.w_start AND e.t_us < p.w_end
    GROUP BY p.probe_id
    """,
)
def rel_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Interval join (non-equi range predicate) via the bin-bucketed
    equi-join rewrite (operators/temporal.py:interval_join): 25 probe
    windows of 1 h over the event stream, aggregated per window.

    Scale: a raw ``t BETWEEN start AND end`` join plans as
    BroadcastNestedLoopJoin — O(|events| x |windows|) compared rows.  The
    rewrite keys both sides by hour bin, so Catalyst plans an ordinary
    equi-join (broadcast here since probes are tiny; shuffled hash at
    scale), and each event is compared only against windows in its own and
    the adjacent bin.  The residual filter re-applies the exact predicate —
    the same narrowing-only contract as the reference's unenforced pushdown
    (EthereumMetadata.java:236)."""
    from presto_ethereum_spark.operators.temporal import interval_join

    ev = t(spark, sf, "events").select(
        "event_id", F.expr("ts DIV 1000").alias("t_us"), "value"
    )
    probes = ev.where(F.col("event_id") < 25).select(
        F.col("event_id").alias("probe_id"),
        F.col("t_us").alias("w_start"),
        (F.col("t_us") + F.lit(_HOUR_US)).alias("w_end"),
    )
    joined = interval_join(
        ev.select("t_us", "value"),
        probes,
        point_time="t_us",
        start="w_start",
        end="w_end",
        bin_width=_HOUR_US,
    )
    return joined.groupBy("probe_id").agg(
        F.count("*").alias("n_in_window"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@q(
    "rel_approx_sketches",
    """
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_distinct,
           1 AS distinct_ok,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           1 AS p50_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rel_approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch aggregates as first-class graded queries: HLL++
    approx_count_distinct and GK approx_percentile run next to their exact
    counterparts, and the *tolerance verdict* (not the sketch value) is the
    hash-compared column — the oracle asserts the verdict is 1.

    Scale: the exact columns are the things that DON'T survive 100 TB
    (count(DISTINCT) re-shuffles per group; exact percentile materializes
    the full sorted column) — they exist here purely as the in-query
    referee.  The sketches are one-pass, mergeable, fixed-size state; at
    scale the sketch column replaces the exact one one-for-one.  HLL++ at
    rsd=2% and GK at accuracy=10000 sit far inside the 5%/2% gates for any
    SF, so the verdict is deterministic even though sketch internals are
    merge-order-dependent."""
    li = t(spark, sf, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_distinct"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_acd"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("_p50x"),
        F.expr("approx_percentile(l_extendedprice, 0.5D, 10000)").alias("_p50a"),
    )
    return g.select(
        "l_returnflag",
        "exact_distinct",
        (
            F.abs(F.col("_acd") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        )
        .cast("int")
        .alias("distinct_ok"),
        F.round("_p50x", 4).alias("p50"),
        (F.abs(F.col("_p50a") - F.col("_p50x")) <= 0.02 * F.abs(F.col("_p50x")))
        .cast("int")
        .alias("p50_ok"),
    )


@q(
    "rel_hll_partial_merge",
    """
    SELECT o_orderpriority,
           count(DISTINCT year(o_orderdate)) AS n_partials,
           count(DISTINCT o_custkey) AS exact_custs,
           1 AS hll_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def rel_hll_partial_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Two-level MERGEABLE sketch rollup — the pattern that replaces
    count(DISTINCT) at 100 TB: per (priority, year) partial HLL sketches
    (Datasketches binary state, ``hll_sketch_agg``), then a second
    aggregation unions the partials per priority (``hll_union_agg`` —
    register-max, merge-order independent) and estimates.  The graded
    columns are the partial count, the exact distinct (the in-query
    referee, same as rel_approx_sketches), and the tolerance VERDICT
    (|est - exact| <= 5% exact; lgConfigK=14 => rsd ~0.8%, so the verdict
    is deterministic with 6-sigma margin).

    Scale: the partial-sketch table is what you'd persist daily — a few KB
    per group — and the union re-aggregates sketches, never rows; exact
    count(DISTINCT) re-shuffles the raw keys and is the thing that dies
    first at scale."""
    o = t(spark, sf, "orders")
    partial = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    ).agg(F.hll_sketch_agg("o_custkey", 14).alias("sk"))
    merged = partial.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_partials"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_custs")
    )
    return merged.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "n_partials",
        "exact_custs",
        (F.abs(F.col("_est") - F.col("exact_custs")) <= 0.05 * F.col("exact_custs"))
        .cast("int")
        .alias("hll_ok"),
    )


def _lsh_sig_sql(dim: int, bits: int) -> str:
    """The DuckDB expression for the ``bits``-bit sign signature — the
    md5-derived hyperplanes inlined as literals (same constants as the
    Spark plan: both sides call similarity._hyperplane).  Shared by the
    LSH serving oracle and the bucket-balance oracle."""
    from presto_ethereum_spark.operators.similarity import _hyperplane

    sig_terms = []
    for p in range(bits):
        plane = ", ".join(repr(x) for x in _hyperplane(dim, p))
        sig_terms.append(
            f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),"
            f" [{plane}]) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
        )
    return " + ".join(sig_terms)


def _lsh_oracle(dim: int = 64, bands: int = 4, bits: int = 24, k: int = 10) -> str:
    """Closed-form DuckDB replica of operators/similarity.lsh_topk: the
    sign test and cosine use list_dot_product, whose in-order double
    accumulation is bit-identical to the Spark fold (see emb_norms)."""
    width = bits // bands
    sig = _lsh_sig_sql(dim, bits)
    cos = _duck_cos("q.embedding", "n.embedding")
    return f"""
    WITH sigs AS (
      SELECT vec_id AS id, ({sig}) AS sig FROM embeddings
    ),
    banded AS (
      SELECT id, band, (sig >> (band * {width})) & {(1 << width) - 1} AS key
      FROM sigs, (SELECT unnest(generate_series(0, {bands - 1})) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    sym AS (
      SELECT id_a AS query_id, id_b AS neighbor_id FROM cand
      UNION ALL
      SELECT id_b AS query_id, id_a AS neighbor_id FROM cand
    )
    SELECT s.query_id, s.neighbor_id,
           round({cos}, 6) AS sim,
           CAST(row_number() OVER (PARTITION BY s.query_id
                                   ORDER BY {cos} DESC, s.neighbor_id) AS INT) AS rank
    FROM sym s
    JOIN embeddings q ON q.vec_id = s.query_id
    JOIN embeddings n ON n.vec_id = s.neighbor_id
    WHERE s.query_id < 5
    QUALIFY rank <= {k}
    """


@q("emb_lsh_topk", _lsh_oracle())
def emb_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH ANN — the bucket-exchange scale path beside
    IVF's cell-partitioned one (operators/similarity.py:lsh_topk): 24-bit
    sign signatures from deterministic md5-derived hyperplanes, candidate
    pairs from 4 x 6-bit band agreement, exact cosine re-rank to top-10 for
    queries vec_id < 5.

    Scale: signatures are a pure map-side projection; the only exchange is
    the (band, key) self-join — bucket sizes, not corpus size, bound the
    pair fan-out, and band width tunes that directly.  The oracle replays
    the identical pipeline closed-form in SQL (hyperplanes inlined from the
    same generator), so the *approximate* index is graded exactly, like
    emb_ivf_topk."""
    from presto_ethereum_spark.operators.similarity import lsh_topk

    e = t_spread(spark, sf, "embeddings", parts=8)
    return lsh_topk(e, dim=64, k=10, bands=4, bits=24).where(F.col("query_id") < 5)


@q(
    "emb_quantize_mse",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
    s AS (SELECT vec_id, vv, list_min(vv) AS lo,
                 (list_max(vv) - list_min(vv)) / 255.0 AS sc FROM v)
    SELECT vec_id,
           round(CASE WHEN len(vv) = 0 OR sc = 0 THEN 0.0 ELSE
             list_sum(list_transform(vv,
               x -> (x - (lo + floor((x - lo) / sc + 0.5) * sc))
                  * (x - (lo + floor((x - lo) / sc + 0.5) * sc)))) / len(vv)
           END, 12) AS quant_mse
    FROM s
    """,
)
def emb_quantize_mse(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 scalar-quantization reconstruction error per vector — the error
    budget of compressing an ANN index 4x (operators/similarity.py:
    quantize_error).  One narrow JVM fold per row, zero shuffle; the oracle
    computes the identical floor-based snapping closed-form, so the
    compression loss itself is hash-graded."""
    from presto_ethereum_spark.operators.similarity import quantize_error

    return quantize_error(t(spark, sf, "embeddings")).withColumnRenamed("id", "vec_id")


# ---------------------------------------------------------------------------
# Deterministic hash sampling / dataset splitting (operators/sampling.py)
# ---------------------------------------------------------------------------

_DUCK_BUCKET = (
    "CAST(('0x' || substring(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))"
    " AS UBIGINT) % {buckets}"
)


@q(
    "doc_split_counts",
    f"""
    WITH b AS (
      SELECT lang, {_DUCK_BUCKET.format(salt="v1", key="doc_id", buckets=100)} AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           lang, count(*) AS n
    FROM b GROUP BY split, lang
    """,
)
def doc_split_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) from a salted
    content hash (operators/sampling.py:split_assign), audited per (split,
    language).

    Scale: assignment is a pure map-side expression — the only shuffle is
    the audit groupBy over ~|splits x langs| keys.  Unlike randomSplit, the
    same document lands in the same split on any cluster size, any
    partitioning, and any engine — the DuckDB oracle replays the md5 bucket
    arithmetic exactly."""
    from presto_ethereum_spark.operators.sampling import split_assign

    d = t(spark, sf, "documents")
    return (
        split_assign(d, "doc_id", {"train": 90, "val": 5, "test": 5}, salt="v1")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n"))
    )


@q(
    "doc_stratified_sample",
    """
    SELECT lang, doc_id, rank FROM (
      SELECT lang, doc_id,
             CAST(row_number() OVER (
                 PARTITION BY lang
                 ORDER BY md5('s1' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rank
      FROM documents)
    WHERE rank <= 5
    """,
)
def doc_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified pseudo-random sample: 5 documents per language, ranked by
    salted hash (operators/sampling.py:stratified_take) — the class-balanced
    subset primitive for training-data curation.

    Scale: WindowGroupLimit caps each map task's output at n rows per
    stratum before the single shuffle on the stratum key, so exchange volume
    is n x |strata| regardless of corpus size.  Hash-order ranking makes the
    sample identical across runs and engines (md5 hex strings compare
    lexicographically the same everywhere)."""
    from presto_ethereum_spark.operators.sampling import stratified_take

    d = t(spark, sf, "documents")
    return stratified_take(d, strata="lang", key="doc_id", n=5, salt="s1").select(
        "lang", "doc_id", "rank"
    )


@q(
    "doc_weighted_sample",
    """
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
             (CAST(('0x' || substring(md5('ws1' || CAST(doc_id AS VARCHAR)), 1, 13))
                   AS UBIGINT) + 1) / CAST(4503599627370497 AS DOUBLE) AS u
      FROM documents)
    SELECT doc_id, weight,
           CAST(row_number() OVER (ORDER BY -ln(u) / weight, doc_id) AS INT) AS rank
    FROM d QUALIFY rank <= 50
    """,
)
def doc_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis, 50 docs,
    weight = token count): the quality-weighted subsampling primitive,
    graded exactly because the per-row uniform is a 52-bit md5 hash rather
    than an RNG (operators/sampling.py:weighted_sample).

    Scale: priority is map-side; WindowGroupLimit keeps each task's local
    top-50 before the single merge — no global sort of the corpus."""
    from presto_ethereum_spark.operators.sampling import weighted_sample
    from presto_ethereum_spark.operators.text import token_count_ws

    d = t(spark, sf, "documents").select(
        "doc_id", token_count_ws(F.col("text")).cast("long").alias("weight")
    )
    return weighted_sample(d, key="doc_id", weight_col="weight", k=50, salt="ws1")


_BM25_TERMS = ("spark", "hash", "vector")
_BM25_K1, _BM25_B = 1.2, 0.75


def _duck_bm25_sql(terms: tuple[str, ...], k: int) -> str:
    """Replays operators/text.bm25_topk expression-for-expression; float
    constants are injected as repr'd Python doubles (string->double parse is
    correctly rounded) so both engines multiply the same bits."""
    k1 = f"CAST('{_BM25_K1!r}' AS DOUBLE)"
    k1p1 = f"CAST('{_BM25_K1 + 1.0!r}' AS DOUBLE)"
    omb = f"CAST('{1.0 - _BM25_B!r}' AS DOUBLE)"
    b = f"CAST('{_BM25_B!r}' AS DOUBLE)"
    tfs = ",\n".join(
        f"CAST(len(list_filter(string_split(text, ' '), x -> x = '{term}'))"
        f" AS BIGINT) AS tf{i}"
        for i, term in enumerate(terms)
    )
    dfs = ",".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    norm = f"({omb} + {b} * (CAST(d.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n)))"
    wts = " + ".join(
        f"(ln(1 + (CAST(s.n - s.df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(s.df{i} AS DOUBLE) + 0.5))"
        f" * ((CAST(tf{i} AS DOUBLE) * {k1p1}) / (tf{i} + {k1} * {norm})))"
        for i in range(len(terms))
    )
    return f"""
    WITH d AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl, {tfs}
      FROM documents),
    s AS (SELECT count(*) AS n, sum(dl) AS sum_dl, {dfs} FROM d),
    scored AS (SELECT d.doc_id, {wts} AS s_raw FROM d, s)
    SELECT doc_id, round(s_raw, 6) AS score,
           CAST(row_number() OVER (ORDER BY s_raw DESC, doc_id) AS INT) AS rank
    FROM scored QUALIFY rank <= {k}
    """


@q("doc_bm25_topk", _duck_bm25_sql(_BM25_TERMS, 20))
def doc_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-20 against a fixed bag-of-words query (operators/text.py:
    bm25_topk): lexical retrieval scoring for quality-targeted corpus
    selection.  Exact-graded: integer-exact corpus stats (N, sum_dl, df_t),
    left-to-right weight summation, and repr-injected float constants make
    the doubles reproducible on an independent engine.

    Scale: one narrow projection pass (|terms| array filters, no explode),
    one 1-row stats reduce broadcast back, WindowGroupLimit top-k."""
    from presto_ethereum_spark.operators.text import bm25_topk

    return bm25_topk(
        t(spark, sf, "documents"),
        terms=list(_BM25_TERMS),
        k=20,
        k1=_BM25_K1,
        b=_BM25_B,
    )


_RRF_TERMS_B = ("table", "scan", "filter")


@q(
    "doc_rrf_fusion",
    f"""
    WITH a AS ({_duck_bm25_sql(_BM25_TERMS, 100)}),
    b AS ({_duck_bm25_sql(_RRF_TERMS_B, 100)}),
    fused AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             coalesce(1000000000000 // (60 + a.rank), 0)
               + coalesce(1000000000000 // (60 + b.rank), 0) AS s_e12
      FROM a FULL JOIN b ON a.doc_id = b.doc_id)
    SELECT doc_id, CAST(s_e12 AS DOUBLE) / 1000000000000 AS rrf,
           CAST(row_number() OVER (ORDER BY s_e12 DESC, doc_id) AS INT) AS rank
    FROM fused QUALIFY rank <= 20
    """,
)
def doc_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion (rrf_k=60) of two BM25 candidate lists (two
    query formulations, top-100 each) — the score-free retrieval-fusion
    step of corpus selection (operators/text.py:rrf_fuse).  Exact-graded:
    only integer ranks enter the fused arithmetic.

    Scale: fusion touches only the two top-k lists; the corpus-sized work
    stays inside the two upstream BM25 passes."""
    from presto_ethereum_spark.operators.text import bm25_topk, rrf_fuse

    d = t(spark, sf, "documents")
    a = bm25_topk(d, list(_BM25_TERMS), k=100, k1=_BM25_K1, b=_BM25_B)
    bb = bm25_topk(d, list(_RRF_TERMS_B), k=100, k1=_BM25_K1, b=_BM25_B)
    return rrf_fuse([a, bb], k=20, rrf_k=60)


@q(
    "doc_pack_sequences",
    f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST({_DUCK_BUCKET.format(salt="p1", key="doc_id", buckets=32)} AS BIGINT)
                 AS shard
      FROM documents),
    c AS (
      SELECT doc_id, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      FROM d)
    SELECT doc_id, shard, n_tokens,
           CAST(floor(cum_prev / 2048.0) AS BIGINT) AS pack_id
    FROM c
    """,
)
def doc_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing (operators/sampling.py:pack_sequences): documents
    sharded by content hash, then greedily chunked into 2048-token packs in
    doc_id order.  The LLM-training step that turns a cleaned corpus into
    fixed-budget training sequences.

    Scale: exact global packing is sequential by definition; sharding makes
    each window partition an independent packing problem — one shuffle on
    the shard key, running-sum state per shard only, parallelism = n_shards.
    The oracle replays the md5 shard arithmetic and the same running-sum
    window, so pack assignment is engine-replayable, not an artifact of
    partition layout."""
    from presto_ethereum_spark.operators.sampling import pack_sequences

    return pack_sequences(
        t(spark, sf, "documents"), budget=2048, n_shards=32, salt="p1"
    )


@q(
    "doc_chunk_windows",
    """
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           substr(text, CAST(i AS INT) * 400 + 1, 500) AS chunk
    FROM (SELECT doc_id, text,
                 unnest(range(0, ((len(text) - 1) // 400) + 1)) AS i
          FROM documents WHERE len(text) > 0)
    """,
)
def doc_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping 500-char chunks with 100-char overlap
    (operators/text.py:chunk_documents) — the retrieval/context-window
    chunking step of a RAG or pretraining pipeline.  Pure map-side
    sequence + substring + posexplode: zero shuffle; chunk ids depend only
    on the text, so the oracle replays them with a lateral range join."""
    from presto_ethereum_spark.operators.text import chunk_documents

    return chunk_documents(
        t(spark, sf, "documents"), chunk_size=500, overlap=100
    )


@q(
    "rel_salted_join",
    """
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_items,
           CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(38, 4))), 2) AS DOUBLE)
               AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def rel_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicitly salted fact-dim join (operators/skew.py:salted_join):
    lineitem rows carry a deterministic salt, orders replicate once per salt
    value, and the join key becomes (orderkey, salt) — a hot orderkey spreads
    over salt_buckets reducers instead of one.  The oracle is the PLAIN
    join: salting must be a pure shuffle-shape change, row-for-row invisible
    in the result (the same contract rel_salted_agg pins for aggregation)."""
    from presto_ethereum_spark.operators.skew import salted_join

    li = t(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice", "l_linenumber")
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li, orders.withColumnRenamed("o_orderkey", "l_orderkey"), on="l_orderkey"
    )
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,4)")), 2)
        .cast("double")
        .alias("total_price"),
    )


@q(
    "emb_label_centroids",
    """
    SELECT label, CAST(pos AS INT) AS pos,
           round(avg(vv[CAST(pos AS INT) + 1]), 9) AS centroid_val,
           count(*) AS n_vectors
    FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS vv,
                 unnest(range(0, len(embedding))) AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def emb_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding centroids (operators/similarity.py:
    label_centroids) — class prototypes for nearest-centroid classification
    and codebook training.  posexplode to (label, pos, val) then one
    partial+final average on a tiny uniform (label, pos) key: map-side
    combine does the heavy lifting, the exchange carries |labels| x dim
    cells regardless of corpus size."""
    from presto_ethereum_spark.operators.similarity import label_centroids

    return label_centroids(t(spark, sf, "embeddings"))


@q(
    "rel_array_agg",
    """
    SELECT c_nationkey AS nationkey,
           list_sort(list(DISTINCT c_mktsegment)) AS segments,
           count(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def rel_array_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Array aggregation: per-nation sorted distinct market segments
    (collect_set + sort_array — sorted so the array value is deterministic
    under any partitioning; an unsorted collect_list would be
    partition-order-dependent and unfit for a distributed engine's
    contract)."""
    c = t(spark, sf, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.sort_array(F.collect_set("c_mktsegment")).alias("segments"),
        F.count("*").alias("n_customers"),
    )


@q(
    "rel_window_rank_family",
    """
    SELECT event_id, event_type,
           CASE WHEN n > 1
                THEN CAST((2 * (rn - 1) * 1000000 + (n - 1))
                          // (2 * (n - 1)) AS DOUBLE) / 1000000
                ELSE 0.0 END AS pct_rank,
           CAST((2 * rn * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000 AS cume,
           drank
    FROM (SELECT event_id, event_type,
                 row_number() OVER w AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n,
                 CAST(dense_rank() OVER w AS INT) AS drank
          FROM events
          WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id))
    """,
)
def rel_window_rank_family(spark: SparkSession, sf: str) -> DataFrame:
    """Remaining ranking-window family: percent_rank / cume_dist /
    dense_rank per event type with a total order (value, event_id).  One
    shuffle on the partition key; rank state is O(1) per row in the sorted
    stream.

    The graded pct_rank/cume doubles are computed as integer-half-up
    micro-unit ratios (round6_ratio) from row_number and the partition
    count — equal to percent_rank()/cume_dist() under this total order —
    because partition sizes grow with SF and round(double, 6) diverges
    between engines when (rank-1)/(n-1) ties at the 7th decimal
    (n-1 = 640-style denominators; the doc_bigram_fluency class)."""
    from presto_ethereum_spark.operators.dedup import round6_ratio

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    rn, n = F.row_number().over(w), F.count("*").over(wp)
    return t(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.when(n > 1, round6_ratio(rn - 1, n - 1))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        round6_ratio(rn, n).alias("cume"),
        F.dense_rank().over(w).cast("int").alias("drank"),
    )


@q(
    "multimodal_frames",
    """
    SELECT doc_id AS media_id,
           CAST(i AS INT) AS frame_index,
           CAST(i AS BIGINT) * 64 AS "offset",
           sha256(substr(text, CAST(i AS INT) * 64 + 1, 64)) AS frame_sha
    FROM (SELECT doc_id, text,
                 unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS i
          FROM documents WHERE len(text) > 0)
    """,
)
def multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling over binary media columns (operators/multimodal.py:
    sample_frames): the 1->N Arrow mapInPandas expansion used for video —
    one output row per fixed-size byte window.  Synthetic media bytes are
    document text (no codecs in this container), so the oracle replays the
    byte windows closed-form with substr; the Arrow batch shape, binary
    schema, and per-frame digests are real and hash-checked."""
    from presto_ethereum_spark.operators.multimodal import (
        media_from_documents,
        sample_frames,
    )

    media = media_from_documents(t(spark, sf, "documents"))
    return sample_frames(media, every_n_bytes=64).select(
        "media_id",
        "frame_index",
        "offset",
        F.sha2(F.col("frame_bytes"), 256).alias("frame_sha"),
    )


@q(
    "doc_repetition",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    uni AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_tokens,
             count(*) AS distinct_tokens, max(c) AS top_c
      FROM tc GROUP BY 1
    ),
    pos AS (
      SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents
            WHERE len(string_split(text, ' ')) >= 2)
    ),
    big AS (SELECT doc_id, l[i] || ' ' || l[i + 1] AS gram FROM pos),
    bc AS (SELECT doc_id, gram, count(*) AS c FROM big GROUP BY 1, 2),
    ba AS (
      SELECT doc_id, sum(c) AS total_bigrams,
             count(*) AS distinct_bigrams, max(c) AS top_bc
      FROM bc GROUP BY 1
    )
    SELECT u.doc_id, total_tokens,
           1.0 - distinct_tokens / CAST(total_tokens AS DOUBLE) AS dup_token_frac,
           top_c / CAST(total_tokens AS DOUBLE)                 AS top_token_frac,
           1.0 - distinct_bigrams / CAST(total_bigrams AS DOUBLE) AS dup_bigram_frac,
           top_bc / CAST(total_bigrams AS DOUBLE)               AS top_bigram_frac
    FROM uni u JOIN ba USING (doc_id)
    """,
)
def doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality signals (operators/text.py:
    repetition_signals): duplicate-token / top-token / duplicate-bigram /
    top-bigram fractions per document.  All four signals are per-row
    higher-order-function folds over the document's own token array —
    a narrow codegen map with ZERO shuffles, vs the oracle's two
    explode+groupBy passes over the whole token stream.  At 100 TB the
    operator runs at scan speed on every executor independently."""
    from presto_ethereum_spark.operators.text import repetition_signals

    return repetition_signals(t_spread(spark, sf, "documents"))


@q(
    "doc_decontaminate",
    """
    WITH pos AS (
      SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    ),
    grams AS (SELECT doc_id, array_to_string(l[i:i + 2], ' ') AS gram FROM pos),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
    hits AS (
      SELECT g.doc_id, count(DISTINCT g.gram) AS n_hit_grams
      FROM grams g JOIN bench b USING (gram)
      WHERE g.doc_id % 20 <> 0
      GROUP BY 1
    )
    SELECT doc_id, n_hit_grams FROM hits
    """,
)
def doc_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (operators/text.py: decontaminate):
    word-trigram overlap between the training slice and a deterministic
    held-out "benchmark" slice (doc_id % 20 == 0).  The benchmark side is
    deduped to distinct grams before the equi-join so rows never multiply;
    with a real (tiny) benchmark set the deduped grams broadcast and the
    whole pass is one shuffle-free broadcast join over the corpus scan."""
    from presto_ethereum_spark.operators.text import decontaminate

    return decontaminate(t_spread(spark, sf, "documents"), n=3, bench_mod=20)


@q(
    "rel_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT)
               AS rank
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    QUALIFY rank <= 100
    """,
)
def rel_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): fact self-aggregation with a
    HAVING filter, then join the surviving keys back to orders/customer,
    global top-100 by price.  Scale: the HAVING side reduces lineitem to a
    tiny key set (map-side partial sums, ~0.5% of orders survive), which
    AQE broadcasts into both joins — no fact-fact shuffle join.  The rank
    filter plans as WindowGroupLimit (per-partition top-k before the final
    single merge), so nothing is globally sorted.  sum(l_quantity) is a sum
    of small integral doubles — exact in fp64 under any accumulation
    order."""
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    w = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 100)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty", "rank",
        )
    )


@q(
    "doc_corpus_shuffle",
    """
    WITH h AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hkey
      FROM documents
    )
    SELECT doc_id,
           CAST(hkey % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hkey % 8
                                   ORDER BY hkey, doc_id) AS INT) AS pos_in_shard
    FROM h
    """,
)
def doc_corpus_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic corpus shuffle for training-order assignment: every
    document gets a (shard, position) from a portable md5-derived key — the
    reshuffle-between-epochs primitive of a training-data pipeline, fully
    reproducible across engines and runs (no RNG).

    Scale: ONE hash shuffle on the shard key, then per-shard sort inside
    each partition (window per shard, not a global row_number — a global
    ordering would serialize on a single reducer at 100 TB; 8 shards here,
    thousands in production)."""
    from presto_ethereum_spark.operators.dedup import hash60

    d = t_spread(spark, sf, "documents")
    h = d.select(
        "doc_id", hash60(F.col("doc_id").cast("string")).alias("hkey")
    )
    w = Window.partitionBy(F.col("hkey") % 8).orderBy("hkey", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hkey") % 8).cast("int").alias("shard"),
        F.row_number().over(w).cast("int").alias("pos_in_shard"),
    )


@q(
    "doc_mixture_weights",
    """
    WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                   count(*) AS n_sources FROM s)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           n_docs / CAST(total AS DOUBLE)                        AS actual_frac,
           (1.0 / n_sources) / (n_docs / CAST(total AS DOUBLE))  AS weight
    FROM s, tot
    """,
)
def doc_mixture_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Source-mixture reweighting: per-source sampling weight that moves the
    corpus to a uniform target mixture (the domain-reweighting step in
    front of training runs; a non-uniform target is a literal swap).
    Scale: one partial-agg shuffle to ~#sources rows, then a broadcast of
    the 1-row total — the corpus itself is touched once."""
    d = t(spark, sf, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = s.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_sources")
    )
    actual = F.col("n_docs") / F.col("total").cast("double")
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            actual.alias("actual_frac"),
            ((F.lit(1.0) / F.col("n_sources")) / actual).alias("weight"),
        )
    )


@q(
    "doc_rare_bigram_rate",
    """
    WITH grams AS (
      SELECT doc_id, substr(lower(text), CAST(i AS INT), 2) AS bg
      FROM documents, unnest(range(1, greatest(length(text) - 1, 0) + 1)) r(i)
    ),
    freq AS (SELECT bg, count(*) AS n FROM grams GROUP BY bg)
    SELECT g.doc_id,
           count(*) AS n_bigrams,
           CAST(sum(CASE WHEN f.n < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           CAST((2 * sum(CASE WHEN f.n < 50 THEN 1 ELSE 0 END) * 1000000000
                 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000000
               AS rare_rate
    FROM grams g JOIN freq f ON f.bg = g.bg
    GROUP BY g.doc_id
    """,
)
def doc_rare_bigram_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Character-bigram fluency score — the integer-exact stand-in for an
    n-gram-LM perplexity filter: a document whose bigrams are mostly rare
    in the corpus (count < 50) is likely garbled/boilerplate/not-language.
    All counting, no transcendental (a log-prob sum would differ in the
    last ulp between engines' libm).  Scale: one shuffle builds the
    corpus bigram table (~alphabet² rows — broadcastable at any corpus
    size), then the per-doc aggregation is map-side joined."""
    from presto_ethereum_spark.operators.dedup import roundN_ratio as _roundN_ratio

    d = t_spread(spark, sf, "documents")
    # substr with a dynamic start rides expr (F.substring wants literals)
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(lower(text)) - 1, 0)),"
                " i -> substr(lower(text), i, 2))"
            )
        ).alias("bg"),
    )
    freq = grams.groupBy("bg").agg(F.count("*").alias("n"))
    rare = F.when(F.col("n") < 50, 1).otherwise(0)
    return (
        grams.join(F.broadcast(freq), "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(rare).cast("bigint").alias("n_rare"),
            _roundN_ratio(F.sum(rare), F.count("*"), 9).alias("rare_rate"),
        )
    )


@q(
    "doc_length_buckets",
    """
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT CAST(length(bin(n_tokens)) - 1 AS INT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM toks GROUP BY bucket
    """,
)
def doc_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-length histogram on power-of-two buckets — the planning
    input for sequence packing (doc_pack_sequences): how much of the corpus
    sits in each length doubling decides context size and packing strategy.
    The bucket is ``len(bin(n)) - 1`` = integer floor(log2 n) — pure
    integer/string ops, no transcendental whose last-bit behavior could
    split engines at power-of-two boundaries.  One partial-agg shuffle to
    ~15 buckets."""
    d = t(spark, sf, "documents")
    n_tokens = F.size(F.split("text", " ", -1))
    return (
        d.select((F.length(F.bin(n_tokens.cast("long"))) - 1).cast("int").alias("bucket"),
                 n_tokens.alias("n_tokens"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
    )


@q(
    "doc_temperature_mixture",
    """
    WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM s),
    scaled AS (
      SELECT source, n_docs, total,
             sqrt(n_docs / CAST(total AS DOUBLE)) AS p_temp
      FROM s, tot),
    z AS (SELECT sum(p_temp) AS z FROM scaled)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST((2 * n_docs * 1000000000 + total) // (2 * total) AS DOUBLE)
             / 1000000000                                AS actual_frac,
           round(p_temp / z, 9)                          AS temp_frac,
           round((p_temp / z) / (n_docs / CAST(total AS DOUBLE)), 9)
             AS upsample_factor
    FROM scaled, z
    """,
)
def doc_temperature_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled source mixture (T=2, i.e. p^(1/2)) — the
    standard low-resource-upweighting sampler for multilingual/multi-source
    training: sampling fractions proportional to sqrt(p) flatten the
    distribution without going fully uniform.  sqrt (IEEE-exact) instead of
    pow keeps both engines bit-aligned; fractions round to 9 places to
    absorb the final 5-double sum's order sensitivity.  Plan: one
    partial-agg shuffle to #sources rows; two 1-row broadcasts."""
    from presto_ethereum_spark.operators.dedup import roundN_ratio as _roundN

    d = t(spark, sf, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = s.agg(F.sum("n_docs").alias("total"))
    scaled = s.crossJoin(F.broadcast(tot)).withColumn(
        "p_temp", F.sqrt(F.col("n_docs") / F.col("total").cast("double"))
    )
    z = scaled.agg(F.sum("p_temp").alias("z"))
    actual = F.col("n_docs") / F.col("total").cast("double")
    temp = F.col("p_temp") / F.col("z")
    return (
        scaled.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            # integer-space half-up: n_docs/total is a small-int ratio and
            # round(double, 9) can tie at digit 10 (ROUNDING_AUDIT.md);
            # temp_frac/upsample_factor involve sqrt -> irrational, where a
            # decimal tie has measure zero and round(double) is safe
            _roundN(F.col("n_docs"), F.col("total"), 9).alias("actual_frac"),
            F.round(temp, 9).alias("temp_frac"),
            F.round(temp / actual, 9).alias("upsample_factor"),
        )
    )


@q(
    "doc_negative_samples",
    """
    WITH tot AS (SELECT count(*) AS n FROM documents),
    anchors AS (
      SELECT doc_id AS anchor_id, unnest(generate_series(0, 3)) AS sample_idx
      FROM documents
    ),
    raw AS (
      SELECT anchor_id, sample_idx, n,
             CAST(concat('0x', substr(md5(concat(CAST(anchor_id AS VARCHAR), ':',
                                               CAST(sample_idx AS VARCHAR))), 1, 15))
                  AS BIGINT) % n AS h
      FROM anchors, tot
    ),
    negs AS (
      SELECT anchor_id, CAST(sample_idx AS INT) AS sample_idx,
             CASE WHEN h = anchor_id THEN (h + 1) % n ELSE h END AS neg_id
      FROM raw
    )
    SELECT anchor_id, sample_idx, neg_id, d.source AS neg_source
    FROM negs JOIN documents d ON d.doc_id = neg_id
    """,
)
def doc_negative_samples(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic contrastive negative sampling (operators/sampling.py:
    negative_samples): 4 hash-drawn negatives per anchor plus a payload
    fetch join.  The draw is a narrow map against a broadcast 1-row corpus
    count; the payload join is one id equi-join (bucketed-joinable at
    scale)."""
    from presto_ethereum_spark.operators.sampling import negative_samples

    return negative_samples(
        t(spark, sf, "documents"), k=4, payload_cols=["source"]
    )


@q(
    "doc_dedup_keepers",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLED},
    {_DUCK_JACCARD_IPAIRS},
    pairs AS (
      SELECT id_a, id_b FROM ipairs
      WHERE inter::DOUBLE / (sz_a + sz_b - inter) >= 0.2),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, root) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.root FROM reach r JOIN edges e ON e.s = r.id),
    comp AS (SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id),
    sized AS (
      SELECT doc_id, cluster_id,
             count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM comp)
    SELECT cluster_id, doc_id AS keeper_doc_id, n_chars AS keeper_n_chars,
           cluster_size
    FROM sized JOIN documents USING (doc_id)
    QUALIFY row_number() OVER (PARTITION BY cluster_id
                               ORDER BY n_chars DESC, doc_id) = 1
    """,
)
def doc_dedup_keepers(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end dedup pipeline: near-dup pairs -> connected-component
    clusters -> survivor per cluster (keep-longest, ties to lowest id;
    operators/dedup.py: cluster_keepers).  The keeper window reduces each
    cluster to one row map-side (WindowGroupLimit), so the final exchange
    carries #clusters rows — the corpus is only touched by the membership
    equi-join."""
    from presto_ethereum_spark.operators.dedup import (
        cluster_keepers,
        dup_clusters,
        jaccard_pairs,
    )

    docs = t_spread(spark, sf, "documents")
    pairs = jaccard_pairs(
        docs, threshold=0.2, blocking_cols=["lang"], max_df=8
    )
    clusters = dup_clusters(pairs.select("id_a", "id_b"))
    return cluster_keepers(clusters, docs, rank_col="n_chars")


@q(
    "multimodal_resize",
    """
    SELECT doc_id AS media_id,
           CAST(len(text) AS BIGINT) AS orig_len,
           CAST(length(o) AS BIGINT) AS out_len,
           sha256(o) AS out_sha
    FROM (
      SELECT doc_id, text,
             array_to_string(
               list_transform(
                 generate_series(1, len(text),
                                 greatest(1, CAST(ceil(len(text) / 64.0) AS BIGINT))),
                 i -> substr(text, CAST(i AS INT), 1)),
               '') AS o
      FROM documents)
    """,
)
def multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Resize/downsample over binary media columns (operators/multimodal.py:
    resize_media): deterministic byte-stride stand-in for the codec resize,
    streamed through Arrow mapInPandas.  The oracle replays the stride
    closed-form; digests pin the exact output bytes."""
    from presto_ethereum_spark.operators.multimodal import (
        media_from_documents,
        resize_media,
    )

    media = media_from_documents(t(spark, sf, "documents"))
    return resize_media(media, target_len=64).select(
        "media_id", "orig_len", "out_len",
        F.sha2(F.col("out_bytes"), 256).alias("out_sha"),
    )


@q(
    "doc_pii_mask",
    r"""
    WITH seeded AS (
      SELECT doc_id,
             concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                    '@mail.example.com or 10.0.', CAST(doc_id % 256 AS VARCHAR),
                    '.7 tel +1 (555) 010-',
                    CAST(1000 + doc_id % 9000 AS VARCHAR)) AS text
      FROM documents),
    m1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[EMAIL]', 'g') AS t1
      FROM seeded),
    m2 AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(t1, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ipv4,
             regexp_replace(t1, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b',
                            '[IPV4]', 'g') AS t2
      FROM m1),
    m3 AS (
      SELECT doc_id, n_email, n_ipv4,
             len(regexp_extract_all(t2, '\+?[0-9][0-9()\-\. ]{7,}[0-9]')) AS n_phone,
             regexp_replace(t2, '\+?[0-9][0-9()\-\. ]{7,}[0-9]',
                            '[PHONE]', 'g') AS masked
      FROM m2)
    SELECT doc_id, md5(masked) AS masked_md5, n_email, n_ipv4, n_phone FROM m3
    """,
)
def doc_pii_mask(spark: SparkSession, sf: str) -> DataFrame:
    """PII masking (operators/text.py: mask_pii) graded end-to-end: the
    corpus ships no PII, so the query deterministically seeds an email, an
    IPv4, and a phone span per document (pure closed-form concat both
    engines replay), then masks in pattern order (email first so phone-like
    digit runs inside addresses are already gone) and counts per kind.
    Output pins the exact masked text via md5.  Pure JVM regexp
    expressions — zero shuffle, scan-speed at any corpus size."""
    from presto_ethereum_spark.operators.text import mask_pii

    d = t(spark, sf, "documents")
    did = F.col("doc_id")
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), did.cast("string"),
            F.lit("@mail.example.com or 10.0."), (did % 256).cast("string"),
            F.lit(".7 tel +1 (555) 010-"), (1000 + did % 9000).cast("string"),
        ).alias("text"),
    )
    return mask_pii(seeded).select(
        "doc_id",
        F.md5(F.col("masked").cast("binary")).alias("masked_md5"),
        "n_email", "n_ipv4", "n_phone",
    )


@q(
    "rel_nation_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(date_part('year', l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM supplier s
    JOIN lineitem l ON s_suppkey = l_suppkey
    JOIN orders   o ON o_orderkey = l_orderkey
    JOIN customer c ON c_custkey = o_custkey
    JOIN nation  n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation  n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def rel_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): a 6-table join
    with a disjunctive cross-dimension predicate and year extraction.
    Scale: nation/supplier/customer broadcast (verified BHJ); the only fact
    shuffle is lineitem->orders, and AQE turns even that into a broadcast
    once the nation filter prunes the supplier side.  Revenue in DECIMAL
    pre-sum -> order-independent under any partitioning."""
    s = t(spark, sf, "supplier")
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@q(
    "eth_miner_time_window",
    f"""
    SELECT block_miner, count(*) AS n_blocks,
           min(block_number) AS first_block, max(block_number) AS last_block
    FROM read_parquet('{ETH}/block.parquet')
    WHERE block_timestamp >= 1438280000 AND block_timestamp <= 1438290000
    GROUP BY block_miner
    """,
)
def eth_miner_time_window(spark: SparkSession, sf: str) -> DataFrame:
    """Timestamp-range miner activity: the graded face of the reference's
    timestamp->block-range pushdown (EthereumMetadata.java:215-229,293-318).
    In fixture mode the timestamp predicate reaches the parquet scan
    (PushedFilters) and prunes row groups via min/max — zero planning RPCs
    vs the reference's O(log head) binary-search RPCs per bound."""
    b = _eth_tables(spark).table("block")
    return (
        b.where(
            (F.col("block_timestamp") >= 1438280000)
            & (F.col("block_timestamp") <= 1438290000)
        )
        .groupBy("block_miner")
        .agg(
            F.count("*").alias("n_blocks"),
            F.min("block_number").alias("first_block"),
            F.max("block_number").alias("last_block"),
        )
    )


@q(
    "eth_address_ledger",
    f"""
    WITH tx AS (SELECT * FROM read_parquet('{ETH}/transaction.parquet')),
    outs AS (
      SELECT tx_from AS addr, count(*) AS n_out,
             sum(CAST(tx_value AS DECIMAL(38,0))) AS out_wei
      FROM tx GROUP BY tx_from),
    ins AS (
      SELECT tx_to AS addr, count(*) AS n_in,
             sum(CAST(tx_value AS DECIMAL(38,0))) AS in_wei
      FROM tx WHERE tx_to IS NOT NULL GROUP BY tx_to)
    SELECT coalesce(o.addr, i.addr) AS addr,
           coalesce(o.n_out, 0) AS n_out,
           coalesce(i.n_in, 0) AS n_in,
           CAST(CAST(coalesce(i.in_wei, 0) - coalesce(o.out_wei, 0)
                     AS DOUBLE) AS REAL) AS net_wei
    FROM outs o FULL JOIN ins i ON o.addr = i.addr
    """,
)
def eth_address_ledger(spark: SparkSession, sf: str) -> DataFrame:
    """Account-balance reconstruction from the transfer stream: per-address
    inflow/outflow counts and exact net position — the ledger materialization
    every chain-analytics pipeline derives from `transaction`.  Values are
    integral wei-doubles, so DECIMAL(38,0) sums are EXACT (no fp ordering
    noise) under any partitioning; the net is a single decimal difference
    narrowed to float32 at the end (absorbs any last-bit divergence in the
    engines' int128->double casts).  Two partial-agg shuffles + one full
    outer join on the address."""
    tx = _eth_tables(spark).table("transaction")
    dec = F.col("tx_value").cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    outs = tx.groupBy(F.col("tx_from").alias("addr")).agg(
        F.count("*").alias("n_out"), F.sum(dec).alias("out_wei")
    )
    ins = (
        tx.where(F.col("tx_to").isNotNull())
        .groupBy(F.col("tx_to").alias("addr"))
        .agg(F.count("*").alias("n_in"), F.sum(dec).alias("in_wei"))
    )
    return (
        outs.withColumnRenamed("addr", "o_addr")
        .join(
            ins.withColumnRenamed("addr", "i_addr"),
            F.col("o_addr") == F.col("i_addr"),
            "full",
        )
        .select(
            F.coalesce(F.col("o_addr"), F.col("i_addr")).alias("addr"),
            F.coalesce(F.col("n_out"), F.lit(0)).alias("n_out"),
            F.coalesce(F.col("n_in"), F.lit(0)).alias("n_in"),
            (
                F.coalesce(F.col("in_wei"), zero)
                - F.coalesce(F.col("out_wei"), zero)
            )
            .cast("double")
            .cast("float")
            .alias("net_wei"),
        )
    )


def _duck_pagerank_oracle() -> str:
    """3 unrolled PageRank iterations with fixed-point (1e15) contribution
    quantization — expression-for-expression the same arithmetic as
    operators/graph.pagerank, so doubles match bit-for-bit."""
    S = "1000000000000000.0"
    it = """
    s{k} AS (
      SELECT e.dst AS addr,
             sum(CAST(floor(r.rank / d.deg * {S}) AS BIGINT)) AS s
      FROM r{p} r JOIN edges e ON e.src = r.addr
      JOIN outdeg d ON d.src = e.src
      GROUP BY e.dst),
    r{k} AS (
      SELECT n0.addr,
             (CAST(1.0 AS DOUBLE) - 0.85) / t.n
               + 0.85 * (CAST(coalesce(s.s, 0) AS DOUBLE) / {S}) AS rank
      FROM nodes n0 LEFT JOIN s{k} s ON s.addr = n0.addr, tot t)"""
    steps = ",".join(it.format(k=k, p=k - 1, S=S) for k in (1, 2, 3))
    return f"""
    WITH tx AS (SELECT * FROM read_parquet('{ETH}/transaction.parquet')),
    edges AS (SELECT DISTINCT tx_from AS src, tx_to AS dst
              FROM tx WHERE tx_to IS NOT NULL),
    nodes AS (SELECT src AS addr FROM edges UNION SELECT dst FROM edges),
    tot AS (SELECT count(*) AS n FROM nodes),
    outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT addr, 1.0 / t.n AS rank FROM nodes, tot t),
    {steps}
    SELECT addr, rank FROM r3
    """


def _duck_pagerank_redistribute_oracle() -> str:
    """3 unrolled iterations of the ``dangling="redistribute"`` variant:
    the dangling-mass scalar ``dm`` is itself fixed-point quantized, so
    every fp64 expression matches operators/graph._pagerank_redistribute
    term-for-term and the doubles hash-match bit-for-bit."""
    S = "1000000000000000.0"
    it = """
    s{k} AS (
      SELECT e.dst AS addr,
             sum(CAST(floor(r.rank / d.deg * {S}) AS BIGINT)) AS s
      FROM r{p} r JOIN edges e ON e.src = r.addr
      JOIN outdeg d ON d.src = e.src
      GROUP BY e.dst),
    d{p} AS (
      SELECT coalesce(sum(CAST(floor(r.rank * {S}) AS BIGINT)), 0) AS dm
      FROM r{p} r JOIN dang g ON g.addr = r.addr),
    r{k} AS (
      SELECT n0.addr,
             (CAST(1.0 AS DOUBLE) - 0.85) / t.n
               + 0.85 * (CAST(coalesce(s.s, 0) AS DOUBLE) / {S}
                         + CAST(dm.dm AS DOUBLE) / {S} / t.n) AS rank
      FROM nodes n0 LEFT JOIN s{k} s ON s.addr = n0.addr, tot t, d{p} dm)"""
    steps = ",".join(it.format(k=k, p=k - 1, S=S) for k in (1, 2, 3))
    return f"""
    WITH tx AS (SELECT * FROM read_parquet('{ETH}/transaction.parquet')),
    edges AS (SELECT DISTINCT tx_from AS src, tx_to AS dst
              FROM tx WHERE tx_to IS NOT NULL),
    nodes AS (SELECT src AS addr FROM edges UNION SELECT dst FROM edges),
    tot AS (SELECT count(*) AS n FROM nodes),
    outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    dang AS (SELECT addr FROM nodes n
             WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = n.addr)),
    r0 AS (SELECT addr, 1.0 / t.n AS rank FROM nodes, tot t),
    {steps}
    SELECT addr, rank FROM r3
    """


@q("eth_tx_pagerank_dangling", _duck_pagerank_redistribute_oracle())
def eth_tx_pagerank_dangling(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank with dangling-mass REDISTRIBUTION over the tx transfer
    graph — the standard formulation (transfer graphs are full of sink
    addresses whose rank the drop variant leaks, deflating everything).
    Same fixed-point exactness discipline as eth_tx_pagerank, extended to
    the per-iteration dangling scalar."""
    from presto_ethereum_spark.operators.graph import pagerank

    tx = _eth_tables(spark).table("transaction")
    edges = tx.where(F.col("tx_to").isNotNull()).select(
        F.col("tx_from").alias("src"), F.col("tx_to").alias("dst")
    )
    return pagerank(
        edges, iterations=3, damping=0.85, cache=True, dangling="redistribute"
    )


@q("eth_tx_pagerank", _duck_pagerank_oracle())
def eth_tx_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Address importance over the tx transfer graph (operators/graph.py:
    pagerank, 3 iterations, d=0.85): the iterative-algorithm face of the
    engine, exactly differential-tested against an unrolled SQL replica via
    fixed-point contribution sums (integer-exact under any shuffle
    order)."""
    from presto_ethereum_spark.operators.graph import pagerank

    tx = _eth_tables(spark).table("transaction")
    edges = tx.where(F.col("tx_to").isNotNull()).select(
        F.col("tx_from").alias("src"), F.col("tx_to").alias("dst")
    )
    # cache=True: since out-degree folded onto the cached edge list (one
    # persist instead of three), materialization beats the per-iteration
    # re-scan at fixture scale too (measured 2.7 s vs 4.1 s cold, equal
    # warm) — same setting production edge lists want
    return pagerank(edges, iterations=3, damping=0.85, cache=True)


# ---------------------------------------------------------------------------
# Round-2 additions: character diversity, prefix dedup, Lloyd refinement,
# TPC-H Q4-shaped EXISTS aggregation
# ---------------------------------------------------------------------------


@q(
    "doc_char_diversity",
    """
    WITH ex AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
    cc AS (SELECT doc_id, ch, count(*) AS c FROM ex GROUP BY doc_id, ch),
    agg AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS sum_sq,
                   count(*) AS n_distinct FROM cc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(length(d.text) AS INT) AS n_chars_total,
           CAST(a.n_distinct AS INT) AS distinct_chars,
           CAST(a.sum_sq AS DOUBLE)
             / CAST(CAST(length(d.text) AS BIGINT)
                    * CAST(length(d.text) AS BIGINT) AS DOUBLE) AS simpson
    FROM documents d JOIN agg a USING (doc_id)
    """,
)
def doc_char_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Character-level Simpson diversity index per document — a quality
    signal (low diversity = repeated-character junk) chosen over entropy
    because it is *rational*: integer char counts, an integer sum of
    squares, and one double division reproduce bit-identically on any
    engine (no transcendental whose libm rounding could differ).

    Scale: pure per-row map — the char array, its distinct set, and the
    count fold are staged attributes (no HOF re-evaluation, SCALE.md §6);
    zero shuffle, scan-speed at any corpus size.  The oracle pays two
    explode+groupBy passes over the whole char stream instead."""
    d = t_spread(spark, sf, "documents")
    staged = (
        d.select("doc_id", "text")
        .withColumn("chars", F.split("text", ""))
        .withColumn("dchars", F.array_distinct(F.col("chars")))
    )
    counts = F.transform(
        F.col("dchars"),
        lambda c: F.size(F.filter(F.col("chars"), lambda x: x == c)),
    )
    sum_sq = F.aggregate(
        counts, F.lit(0).cast("long"), lambda acc, c: acc + (c * c).cast("long")
    )
    n = F.length("text")
    return staged.select(
        "doc_id",
        n.alias("n_chars_total"),
        F.size("dchars").alias("distinct_chars"),
        (
            sum_sq.cast("double")
            / (n.cast("long") * n.cast("long")).cast("double")
        ).alias("simpson"),
    )


@q(
    "doc_prefix_dup",
    """
    WITH p AS (
      SELECT doc_id,
             md5(array_to_string((string_split(text, ' '))[1:16], ' ')) AS prefix_fp
      FROM documents)
    SELECT doc_id, prefix_fp,
           count(*) OVER (PARTITION BY prefix_fp) AS n_sharing
    FROM p
    """,
)
def doc_prefix_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix-fingerprint duplicate detection: documents sharing their first
    16 whitespace tokens (the boilerplate/header-dup signal exact hashing
    misses when tails differ).  One md5 per row map-side; the only shuffle
    carries (doc_id, 16-byte fingerprint) for the window count — never
    document bodies."""
    from presto_ethereum_spark.operators.text import tokens

    d = t_spread(spark, sf, "documents")
    pfx = F.md5(
        F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 16)).cast("binary")
    )
    w = Window.partitionBy("prefix_fp")
    return (
        d.select("doc_id", pfx.alias("prefix_fp"))
        .withColumn("n_sharing", F.count("*").over(w))
    )


_KMEANS_S = "1000000000000000.0"  # 1e15 fixed-point quantum (matches pagerank)


@q(
    "emb_diverse_sample",
    """
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, c.cid, {cos} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, CAST(cid AS INT) AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    )
    SELECT vec_id, cell, CAST(rank AS BIGINT) AS rank FROM (
      SELECT vec_id, cell,
             row_number() OVER (
               PARTITION BY cell
               ORDER BY md5('dv' || CAST(vec_id AS VARCHAR)), vec_id) AS rank
      FROM assign) WHERE rank <= 10
    """.replace("{cos}", _duck_cos("c.cvec", "e.embedding")),
)
def emb_diverse_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-balanced diversity sampling — the "spread the sample across
    embedding space" curation step (SemDeDup-adjacent): assign every
    vector to its nearest seed centroid (the map-only Arrow IVF kernel,
    bit-identical to ivf_assign) and keep a deterministic hash-ordered
    n=10 per cell via stratified_take (WindowGroupLimit caps shuffle
    volume at n x cells).  A pure composition of two graded operators —
    the pipeline pattern, not new machinery."""
    from presto_ethereum_spark.operators.sampling import stratified_take
    from presto_ethereum_spark.operators.similarity import (
        _ivf_corpus_index,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    idx = _ivf_corpus_index(e, cents, "vec_id", "embedding").select(
        F.col("neighbor_id").alias("vec_id"), F.col("cell").cast("int").alias("cell")
    )
    return stratified_take(idx, strata="cell", key="vec_id", n=10, salt="dv").select(
        "vec_id", "cell", F.col("rank").cast("long").alias("rank")
    )


@q(
    "emb_kmeans_step",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {{cos}} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    ex AS (
      SELECT CAST(cid AS INT) AS cell, CAST(i - 1 AS INT) AS dim,
             v[i] AS x
      FROM (SELECT cid, CAST(embedding AS DOUBLE[]) AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM assign)
    ),
    agg AS (
      SELECT cell, dim, count(*) AS n_members,
             CAST(sum(CAST(floor(x * {_KMEANS_S}) AS BIGINT)) AS BIGINT) AS qsum
      FROM ex GROUP BY cell, dim
    )
    SELECT cell, dim, n_members,
           (CAST(qsum AS DOUBLE) / {_KMEANS_S}) / n_members AS coord
    FROM agg
    """.replace("{cos}", _duck_cos("c.cvec", "e.embedding")),
)
def emb_kmeans_step(spark: SparkSession, sf: str) -> DataFrame:
    """One Lloyd iteration of k-means codebook refinement (the index-build
    step the IVF pipeline's ``seed_centroids`` contract anticipates):
    assign every vector to its nearest seed centroid — bit-identically to
    ``ivf_assign`` via the Arrow index kernel — then recompute each cell's
    centroid as the member mean per dimension.

    Determinism: per-dimension coordinates are summed as 1e15 fixed-point
    BIGINTs (exact under any partitioning/accumulation order, like
    pagerank's contributions; |x| <= ~0.6 and cell sizes bound the sum far
    below 2^63 — at petabyte corpora switch the sum to DECIMAL(38,0)).

    Scale: assignment is map-only; the ONE shuffle carries (cell, dim,
    quantized-long) partial aggregates — map-side combine reduces it to
    n_cells x dim rows per task regardless of corpus size."""
    from presto_ethereum_spark.operators.similarity import (
        _ivf_corpus_index,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    idx = _ivf_corpus_index(e, cents, "vec_id", "embedding")
    s = F.lit(float(_KMEANS_S))
    return (
        idx.select("cell", F.posexplode("cvd").alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.floor(F.col("x") * s)).alias("qsum"),
        )
        .select(
            "cell",
            "dim",
            "n_members",
            ((F.col("qsum").cast("double") / s) / F.col("n_members")).alias(
                "coord"
            ),
        )
    )


@q(
    "emb_kmeans_convergence",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, e.embedding, c.cid, {{cos}} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    a0 AS (
      SELECT vec_id, embedding, cid, csim FROM (
        SELECT vec_id, embedding, cid, csim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    ex1 AS (
      SELECT cid, CAST(i - 1 AS INT) AS dim, v[i] AS x
      FROM (SELECT cid, CAST(embedding AS DOUBLE[]) AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM a0)
    ),
    coords1 AS (
      SELECT cid, dim,
             (CAST(CAST(sum(CAST(floor(x * {_KMEANS_S}) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / {_KMEANS_S}) / count(*) AS coord
      FROM ex1 GROUP BY cid, dim
    ),
    rcent1 AS (
      SELECT c.cid, coalesce(r.rvec, CAST(c.cvec AS DOUBLE[])) AS cvec
      FROM cent c LEFT JOIN (SELECT cid, list(coord ORDER BY dim) AS rvec
                             FROM coords1 GROUP BY cid) r ON r.cid = c.cid
    ),
    r1scored AS (
      SELECT e.vec_id, e.embedding, r.cid, {{rcos1}} AS csim
      FROM embeddings e CROSS JOIN rcent1 r
    ),
    a1 AS (
      SELECT vec_id, embedding, cid, csim FROM (
        SELECT vec_id, embedding, cid, csim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM r1scored) WHERE rnk = 1
    ),
    ex2 AS (
      SELECT cid, CAST(i - 1 AS INT) AS dim, v[i] AS x
      FROM (SELECT cid, CAST(embedding AS DOUBLE[]) AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM a1)
    ),
    coords2 AS (
      SELECT cid, dim,
             (CAST(CAST(sum(CAST(floor(x * {_KMEANS_S}) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / {_KMEANS_S}) / count(*) AS coord
      FROM ex2 GROUP BY cid, dim
    ),
    rcent2 AS (
      SELECT c.cid, coalesce(r.rvec, c.cvec) AS cvec
      FROM rcent1 c LEFT JOIN (SELECT cid, list(coord ORDER BY dim) AS rvec
                               FROM coords2 GROUP BY cid) r ON r.cid = c.cid
    ),
    r2scored AS (
      SELECT e.vec_id, e.embedding, r.cid, {{rcos2}} AS csim
      FROM embeddings e CROSS JOIN rcent2 r
    ),
    a2 AS (
      SELECT vec_id, cid, csim FROM (
        SELECT vec_id, cid, csim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM r2scored) WHERE rnk = 1
    )
    SELECT CAST(0 AS INT) AS iteration, CAST(NULL AS BIGINT) AS n_moved,
           CAST(sum(CAST(floor((1.0 - csim) * 1000000000000.0) AS BIGINT))
                AS BIGINT) AS inertia_q
    FROM a0
    UNION ALL
    SELECT 1,
           (SELECT count(*) FROM a0 JOIN a1 USING (vec_id)
            WHERE a0.cid != a1.cid),
           CAST(sum(CAST(floor((1.0 - csim) * 1000000000000.0) AS BIGINT))
                AS BIGINT)
    FROM a1
    UNION ALL
    SELECT 2,
           (SELECT count(*) FROM a1 JOIN a2 USING (vec_id)
            WHERE a1.cid != a2.cid),
           CAST(sum(CAST(floor((1.0 - csim) * 1000000000000.0) AS BIGINT))
                AS BIGINT)
    FROM a2
    """.replace("{cos}", _duck_cos("c.cvec", "e.embedding"))
    .replace("{rcos1}", _duck_cos("r.cvec", "e.embedding"))
    .replace("{rcos2}", _duck_cos("r.cvec", "e.embedding")),
)
def emb_kmeans_convergence(spark: SparkSession, sf: str) -> DataFrame:
    """Lloyd-iteration convergence curve (operators/similarity.
    kmeans_convergence, 2 rounds over the 8-seed codebook): per iteration
    the exact fixed-point corpus inertia and the number of vectors that
    changed cells — the TRAINING-side tuning curve next to the
    serving-side ones (nprobe, bands): it prices how many build rounds
    the index needs before assignments stop moving, and completes the
    k-means family (emb_kmeans_step: one update's coordinates;
    emb_ivf_recall_refined: one round's recall payoff; this: the
    multi-round trajectory).  Inertia quantizes each row's (1 - best
    cosine) to a BIGINT BEFORE summing — exact under any partitioning,
    the pagerank/kmeans fixed-point discipline — and the oracle replays
    both Lloyd rounds (assign -> fixed-point means -> reassign, empty
    cells inheriting the previous centroid) in closed form."""
    from presto_ethereum_spark.operators.similarity import kmeans_convergence

    e = t_spread(spark, sf, "embeddings", parts=8)
    return kmeans_convergence(e, n_cells=8, n_iters=2)


@q(
    "rel_order_priority_checks",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def rel_order_priority_checks(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality on both sides'
    columns (late-shipping orders per priority).  Planned as a LEFT SEMI
    join on the order key with the date inequality as residual — the filter
    prunes the orders scan to the 9-month window first, so the semi join's
    build side is already small; aggregation output is bounded by the
    5-value priority domain."""
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


_PQ_SUBSPACES = 8
_PQ_SUBDIM = 8
_PQ_CODES = 4


@q(
    "emb_pq_codes",
    f"""
    WITH seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
             CAST(embedding AS DOUBLE[]) AS v
      FROM (SELECT vec_id, embedding FROM embeddings
            ORDER BY vec_id LIMIT {_PQ_CODES})
    ),
    subs AS (SELECT unnest(generate_series(0, {_PQ_SUBSPACES - 1})) AS s),
    cb AS (
      SELECT subs.s AS subspace, seeds.code,
             (seeds.v)[subs.s * {_PQ_SUBDIM} + 1 : subs.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS c
      FROM seeds CROSS JOIN subs
    ),
    ev AS (
      SELECT e.vec_id, subs.s AS subspace,
             (CAST(e.embedding AS DOUBLE[]))
               [subs.s * {_PQ_SUBDIM} + 1 : subs.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS x
      FROM embeddings e CROSS JOIN subs
    ),
    scored AS (
      SELECT ev.vec_id, ev.subspace, cb.code,
             list_dot_product(
               list_transform(list_zip(ev.x, cb.c), p -> p[1] - p[2]),
               list_transform(list_zip(ev.x, cb.c), p -> p[1] - p[2])) AS d2
      FROM ev JOIN cb ON cb.subspace = ev.subspace
    )
    SELECT vec_id, CAST(subspace AS INT) AS subspace, code, d2 AS err2
    FROM (SELECT vec_id, subspace, code, d2,
                 row_number() OVER (PARTITION BY vec_id, subspace
                                    ORDER BY d2 ASC, code) AS rnk
          FROM scored)
    WHERE rnk = 1
    """,
)
def emb_pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization encoding (operators/similarity.py:pq_codes):
    8 subspaces x 8 dims, 4-entry sub-codebooks sliced from the lowest-id
    seed vectors, nearest sub-centroid by squared L2 (ties to lowest code).
    The memory-compression path for billion-vector ANN — 256 B of fp32
    become 8 codes.  Squared L2 is rational (subtract/square/accumulate in
    index order), so the Arrow kernel and the oracle's zip/fold agree
    bit-for-bit with no fixed-point machinery.  Map-only at any scale."""
    from presto_ethereum_spark.operators.similarity import pq_codes, seed_centroids

    e = t_spread(spark, sf, "embeddings", parts=8)
    seeds = _IVF_CODEBOOKS.get(("pq", sf))
    if seeds is None:
        seeds = _IVF_CODEBOOKS[("pq", sf)] = seed_centroids(e, n_cells=_PQ_CODES)
    # sub-codebook s = the seeds' s-th contiguous dim slice; codes 0..3 in
    # seed (vec_id) order
    codebooks = [
        [
            (code, cv[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM])
            for code, (_, cv) in enumerate(seeds)
        ]
        for s in range(_PQ_SUBSPACES)
    ]
    return pq_codes(e, codebooks, sub_dim=_PQ_SUBDIM)


@q(
    "doc_select_corpus",
    """
    WITH sig AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             md5(text) AS fp
      FROM documents),
    keep AS (
      SELECT lang, source,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY fp)
                       AND n_tokens >= 10
                       AND n_chars BETWEEN 100 AND 500
                  THEN 1 ELSE 0 END AS selected
      FROM sig)
    SELECT lang, source,
           count(*) AS n_total,
           CAST(sum(selected) AS BIGINT) AS n_selected,
           CAST(sum(selected) AS DOUBLE) / count(*) AS selection_rate
    FROM keep GROUP BY lang, source
    """,
)
def doc_select_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end corpus selection — the composed pipeline a training-data
    run actually executes: exact-dedup survivorship (min doc_id per content
    hash) AND a token-count floor AND a length band, reported as per
    (lang, source) selection rates.  Composition is the point: each signal
    is an already-graded operator; this query proves they chain inside one
    plan.

    Scale: one shuffle on the 16-byte content hash for the dedup window
    (ids + hashes only, never bodies) and one partial+final aggregation on
    the tiny (lang, source) domain; every signal is a map-side
    expression."""
    d = t_spread(spark, sf, "documents")
    sig = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split("text", " ", -1)).alias("n_tokens"),
        F.md5(F.col("text").cast("binary")).alias("fp"),
    )
    keeper = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp"))
    selected = (
        F.when(
            keeper
            & (F.col("n_tokens") >= 10)
            & F.col("n_chars").between(100, 500),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("selected")
    )
    return (
        sig.select("lang", "source", selected)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("selected").cast("bigint").alias("n_selected"),
            (F.sum("selected").cast("double") / F.count("*")).alias(
                "selection_rate"
            ),
        )
    )


@q(
    "rel_promo_revenue",
    """
    WITH j AS (
      SELECT p.p_type,
             CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1000000.0)
                  AS BIGINT) AS rev_q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1996-04-01')
    SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev_q ELSE 0 END)
                AS BIGINT) AS promo_rev_q,
           CAST(sum(rev_q) AS BIGINT) AS total_rev_q,
           100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev_q ELSE 0 END)
                        AS DOUBLE)
                 / CAST(sum(rev_q) AS DOUBLE) AS promo_pct
    FROM j
    """,
)
def rel_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share over a 3-month shipdate window —
    fact-to-dim equi-join plus a conditional aggregate ratio.  Per-row
    revenue is quantized with floor(x*1e6) (floor of a deterministic double
    is unambiguous on any engine, unlike decimal-cast rounding of products),
    so the sums are integer-exact under any partitioning.  The dim side
    broadcasts; the shipdate filter pushes to the lineitem scan."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    p = t(spark, sf, "part").select("p_partkey", "p_type")
    rev_q = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(1e6)
    )
    promo = F.when(F.col("p_type").like("PROMO%"), F.col("rev_q")).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select("p_type", rev_q.alias("rev_q"))
        .agg(
            F.sum(promo).cast("bigint").alias("promo_rev_q"),
            F.sum("rev_q").cast("bigint").alias("total_rev_q"),
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum("rev_q").cast("double")
            ).alias("promo_pct"),
        )
    )


@q(
    "rel_disjunctive_join",
    """
    SELECT count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                               * 1000000.0) AS BIGINT)) AS BIGINT) AS rev_q
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1  AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def rel_disjunctive_join(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: an equi-join with an OR-of-ANDs residual mixing
    both sides' columns.  The planner must keep the equi key (hash join,
    broadcast dim) and evaluate the disjunction as a residual — NOT fall
    back to a nested loop; Catalyst also pushes the single-side disjunction
    parts (brand/size, quantity bounds) down to each scan."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & (F.col("l_quantity") >= q_lo)
        & (F.col("l_quantity") <= q_hi)
    )
    rev_q = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(1e6)
    )
    return (
        j.where(
            arm("Brand#1", 1, 15, 1, 20)
            | arm("Brand#13", 10, 30, 10, 30)
            | arm("Brand#20", 20, 50, 20, 40)
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev_q).cast("bigint").alias("rev_q"),
        )
    )


@q(
    "stream_chain_gas",
    f"""
    SELECT CAST(block_number // 100 AS INT) AS bucket,
           count(*) AS n_blocks,
           CAST(sum(CAST(block_gasused AS DECIMAL(18,0))) AS DOUBLE)
             AS total_gas_used,
           max(block_gaslimit) AS max_gas_limit
    FROM read_parquet('{ETH}/block.parquet')
    GROUP BY bucket
    """,
)
def stream_chain_gas(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming over the custom chain-tail source
    (streaming/chain.py): block micro-batches with exact offset/replay
    semantics aggregate into per-100-block gas telemetry; the settled
    availableNow result must equal the batch aggregation of the block
    table — the oracle checks a *custom Python streaming source* end to
    end.  Gas sums ride DECIMAL(18,0) (the values are integer-valued
    doubles), so the answer is micro-batch-partitioning independent.
    r11: graded as THREE rate-limited micro-batches under the
    incremental-batch schedule (drain_runs=3, 800 blocks/batch over the
    2,400-block fixture) — each drain resumes the aggregation's state
    store from the shared checkpoint, so the gate now also proves
    stateful restart-recovery on the custom source, not just a
    single-batch pass."""
    from presto_ethereum_spark.streaming.chain import run_chain_gas_buckets

    return run_chain_gas_buckets(
        spark,
        str(ETH / "chain_blocks.parquet"),
        max_per_batch=800,
        drain_runs=3,
    )


@q(
    "stream_chain_gas_partitioned",
    f"""
    SELECT CAST(block_number // 100 AS INT) AS bucket,
           count(*) AS n_blocks,
           CAST(sum(CAST(block_gasused AS DECIMAL(18,0))) AS DOUBLE)
             AS total_gas_used,
           max(block_gaslimit) AS max_gas_limit
    FROM read_parquet('{ETH}/block.parquet')
    GROUP BY bucket
    """,
)
def stream_chain_gas_partitioned(spark: SparkSession, sf: str) -> DataFrame:
    """The same chain-tail telemetry through the EXECUTOR-SIDE partitioned
    stream reader (streaming/chain.py:EthereumPartitionedStreamReader —
    the high-rate catch-up mode: per trigger, the batch range splits into
    blocks_per_partition chunks fetched in parallel on executors instead
    of serially on the driver).  Same offsets, same oracle, different
    physical read path; r11: same 3-drain incremental-batch schedule as
    stream_chain_gas, so the executor-side reader's offset floor +
    state-store recovery are gate-proven too."""
    from presto_ethereum_spark.streaming.chain import run_chain_gas_buckets

    return run_chain_gas_buckets(
        spark,
        str(ETH / "chain_blocks.parquet"),
        reader_mode="partitioned",
        max_per_batch=800,
        drain_runs=3,
    )


@q(
    "rel_forecast_revenue",
    """
    SELECT count(*) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * l_discount * 1000000.0)
                         AS BIGINT)) AS BIGINT) AS forecast_rev_q
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def rel_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + global aggregate —
    the canonical predicate-pushdown probe.  All four predicates reach the
    parquet scan (PushedFilters) and prune row groups via min/max; the
    aggregate is a two-row exchange (partial + final).  Revenue quantized
    floor(x*1e6) for partition-order-independent exactness."""
    li = t(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_discount") * F.lit(1e6))
            )
            .cast("bigint")
            .alias("forecast_rev_q"),
        )
    )


@q(
    "emb_ivf_recall",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {{cos}} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, embedding AS qvec, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored WHERE vec_id < 5) WHERE rnk <= 2
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY {{pcos}} DESC, a.vec_id) AS rank
        FROM probe p JOIN assign a
          ON a.cid = p.cid AND a.vec_id != p.query_id)
      WHERE rank <= 10
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {{bcos}} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 5)
      WHERE rank <= 10
    )
    SELECT q.query_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(h.n, 0) AS DOUBLE) / 10.0 AS recall_at_10
    FROM (SELECT DISTINCT query_id FROM truth) q
    LEFT JOIN (SELECT a.query_id, count(*) AS n
               FROM approx a JOIN truth t
                 ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
               GROUP BY a.query_id) h
      ON h.query_id = q.query_id
    """.replace("{cos}", _duck_cos("c.cvec", "e.embedding"))
    .replace("{pcos}", _duck_cos("p.qvec", "a.embedding"))
    .replace("{bcos}", _duck_cos("a.embedding", "b.embedding")),
)
def emb_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Index-quality report: recall@10 of the IVF index (nprobe=2 of 8)
    against exact brute-force truth, per query — the measurement operator
    every ANN deployment runs before trusting an index.  Both pipelines
    are bit-exact (shared kernels), so the recall numbers themselves are
    hash-gated against the oracle's closed-form replica.

    Scale: truth on a sampled query set (recall estimation never needs
    every query); one small join of two top-k lists."""
    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids_of(e)
    return _ivf_recall_report(e, cents)


def seed_centroids_of(e: DataFrame):
    from presto_ethereum_spark.operators.similarity import seed_centroids

    return seed_centroids(e, n_cells=8)


def _ivf_recall_report(e: DataFrame, cents) -> DataFrame:
    """Shared body of emb_ivf_recall and its hash-sampled variant:
    recall@10 of the nprobe=2 IVF serve path vs brute-force truth over
    the fixed probe set (vec_id < 5)."""
    from presto_ethereum_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    q5 = e.where(F.col("vec_id") < 5)
    truth = brute_force_topk(e, q5, k=10).select("query_id", "neighbor_id")
    approx = ivf_topk(e, q5, centroids=cents, nprobe=2, k=10).select(
        "query_id", "neighbor_id"
    )
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n", F.lit(0)).cast("double") / F.lit(10.0)).alias(
                "recall_at_10"
            ),
        )
    )


@q(
    "emb_ivf_recall_refined",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {{cos}} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign0 AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    ex AS (
      SELECT cid, CAST(i - 1 AS INT) AS dim, v[i] AS x
      FROM (SELECT cid, CAST(embedding AS DOUBLE[]) AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM assign0)
    ),
    coords AS (
      SELECT cid, dim,
             (CAST(CAST(sum(CAST(floor(x * {_KMEANS_S}) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / {_KMEANS_S}) / count(*) AS coord
      FROM ex GROUP BY cid, dim
    ),
    rcent AS (
      SELECT c.cid, coalesce(r.rvec, CAST(c.cvec AS DOUBLE[])) AS cvec
      FROM cent c LEFT JOIN (SELECT cid, list(coord ORDER BY dim) AS rvec
                             FROM coords GROUP BY cid) r ON r.cid = c.cid
    ),
    rscored AS (
      SELECT e.vec_id, e.embedding, r.cid,
             {{rcos}} AS csim
      FROM embeddings e CROSS JOIN rcent r
    ),
    rassign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM rscored) WHERE rnk = 1
    ),
    probe0 AS (
      SELECT vec_id AS query_id, embedding AS qvec, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored WHERE vec_id < 5) WHERE rnk <= 2
    ),
    rprobe AS (
      SELECT vec_id AS query_id, embedding AS qvec, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM rscored WHERE vec_id < 5) WHERE rnk <= 2
    ),
    approx0 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY {{pcos}} DESC, a.vec_id) AS rank
        FROM probe0 p JOIN assign0 a
          ON a.cid = p.cid AND a.vec_id != p.query_id)
      WHERE rank <= 10
    ),
    rapprox AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY {{pcos}} DESC, a.vec_id) AS rank
        FROM rprobe p JOIN rassign a
          ON a.cid = p.cid AND a.vec_id != p.query_id)
      WHERE rank <= 10
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {{bcos}} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 5)
      WHERE rank <= 10
    )
    SELECT q.query_id,
           CAST(coalesce(h0.n, 0) AS BIGINT) AS n_hits_seed,
           CAST(coalesce(h1.n, 0) AS BIGINT) AS n_hits_refined,
           CAST(coalesce(h1.n, 0) - coalesce(h0.n, 0) AS BIGINT) AS delta
    FROM (SELECT DISTINCT query_id FROM truth) q
    LEFT JOIN (SELECT a.query_id, count(*) AS n
               FROM approx0 a JOIN truth t
                 ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
               GROUP BY a.query_id) h0 ON h0.query_id = q.query_id
    LEFT JOIN (SELECT a.query_id, count(*) AS n
               FROM rapprox a JOIN truth t
                 ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
               GROUP BY a.query_id) h1 ON h1.query_id = q.query_id
    """.replace("{cos}", _duck_cos("c.cvec", "e.embedding"))
    .replace("{rcos}", _duck_cos("r.cvec", "e.embedding"))
    .replace("{pcos}", _duck_cos("p.qvec", "a.embedding"))
    .replace("{bcos}", _duck_cos("a.embedding", "b.embedding")),
)
def emb_ivf_recall_refined(spark: SparkSession, sf: str) -> DataFrame:
    """Seed-vs-refined codebook quality report: recall@10 of the IVF index
    under the raw id-ordered seeds AND under one Lloyd round of
    ``kmeans_centroids``, per query, with the delta — the measurement that
    justifies paying for index-build refinement before a production
    deploy.  Both codebooks, both assignments, and the fixed-point member
    means are bit-exactly replicated by the closed-form SQL oracle, so
    even the refined path is hash-gated (not tolerance-gated): this is the
    ``seed_centroids`` docstring's "a k-means refinement slots in here"
    promise, graded.

    Scale: refinement adds one map-only assignment pass + one (cell, dim)
    BIGINT shuffle per Lloyd round (driver sees codebook-sized aggregates
    only); serving is unchanged — the refined codebook rides the exact
    same ``ivf_topk`` path as the seeds."""
    from presto_ethereum_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    seeds = _IVF_CODEBOOKS.get(sf)
    if seeds is None:
        seeds = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    # the Lloyd round is INDEX BUILD (offline at serve time) — memoized per
    # sf like the seed codebooks so repeated serving measurements don't
    # re-train; the first call (the graded one) still computes it live
    refined = _IVF_CODEBOOKS.get(("refined", sf))
    if refined is None:
        refined = _IVF_CODEBOOKS[("refined", sf)] = kmeans_centroids(
            e, n_cells=8, n_iters=1, seeds=seeds
        )
    q5 = e.where(F.col("vec_id") < 5)
    truth = brute_force_topk(e, q5, k=10).select("query_id", "neighbor_id")
    a0 = ivf_topk(e, q5, centroids=seeds, nprobe=2, k=10).select(
        "query_id", "neighbor_id"
    )
    a1 = ivf_topk(e, q5, centroids=refined, nprobe=2, k=10).select(
        "query_id", "neighbor_id"
    )
    h0 = (
        a0.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n0"))
    )
    h1 = (
        a1.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n1"))
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(h0, "query_id", "left")
        .join(h1, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n0", F.lit(0)).cast("bigint").alias("n_hits_seed"),
            F.coalesce("n1", F.lit(0)).cast("bigint").alias("n_hits_refined"),
            (F.coalesce("n1", F.lit(0)) - F.coalesce("n0", F.lit(0)))
            .cast("bigint")
            .alias("delta"),
        )
    )


@q(
    "eth_token_concentration",
    f"""
    WITH flows AS (
      SELECT erc20_token AS token, erc20_to AS holder, count(*) AS n
      FROM read_parquet('{ETH}/erc20.parquet')
      GROUP BY 1, 2),
    tot AS (SELECT token, CAST(sum(n) AS BIGINT) AS total_transfers,
                   count(*) AS n_holders
            FROM flows GROUP BY token),
    top AS (SELECT token, holder AS top_holder, n AS top_n FROM (
              SELECT token, holder, n,
                     row_number() OVER (PARTITION BY token
                                        ORDER BY n DESC, holder) AS r
              FROM flows) WHERE r = 1)
    SELECT t.token, n_holders, total_transfers, top_holder,
           CAST(top_n AS BIGINT) AS top_n,
           CAST(top_n AS DOUBLE) / total_transfers AS top_share
    FROM tot t JOIN top ON top.token = t.token
    """,
)
def eth_token_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Holder-concentration report per ERC-20 token: the top recipient's
    share of inbound transfers — whale detection over the decoded Transfer
    stream.  Concentration is measured on transfer COUNTS (integer-exact
    under any partitioning; erc20 values span ~1e107 where no fixed-point
    exists).  Two small aggregations + a WindowGroupLimit top-1; output is
    bounded by the token domain."""
    erc20 = _eth_tables(spark).table("erc20")
    flows = (
        erc20.groupBy(
            F.col("erc20_token").alias("token"),
            F.col("erc20_to").alias("holder"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = flows.groupBy("token").agg(
        F.sum("n").cast("bigint").alias("total_transfers"),
        F.count("*").alias("n_holders"),
    )
    w = Window.partitionBy("token").orderBy(F.desc("n"), "holder")
    top = (
        flows.withColumn("r", F.row_number().over(w))
        .where("r = 1")
        .select(
            "token",
            F.col("holder").alias("top_holder"),
            F.col("n").cast("bigint").alias("top_n"),
        )
    )
    return tot.join(top, "token").select(
        "token",
        "n_holders",
        "total_transfers",
        "top_holder",
        "top_n",
        (F.col("top_n").cast("double") / F.col("total_transfers")).alias(
            "top_share"
        ),
    )


@q(
    "rel_returned_revenue",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                               * 1000000.0) AS BIGINT)) AS BIGINT) AS rev_q
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY rev_q DESC, c_custkey
    LIMIT 20
    """,
)
def rel_returned_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue — a 4-table join
    (two broadcast dims, one fact-fact equi-join) with filtered fact scan,
    aggregation on the customer grain, and a global top-20
    (TakeOrderedAndProject, never a full sort).  Revenue quantized
    floor(x*1e6) for order-independent exactness."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(t(spark, sf, "nation"))
    rev_q = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(1e6)
    )
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(n, n["n_nationkey"] == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev_q).cast("bigint").alias("rev_q"),
        )
        .orderBy(F.desc("rev_q"), "c_custkey")
        .limit(20)
    )


@q(
    "rel_order_count_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT n_orders, count(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def rel_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: the order-count histogram INCLUDING zero-order
    customers — a left outer join whose join condition carries a filter on
    the right side (so unmatched customers survive with count 0), a
    per-customer count, then a second aggregation on the count itself.
    Two shuffles; the second is on the tiny distinct-count domain."""
    c = t(spark, sf, "customer").select("c_custkey")
    o = t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (o["o_custkey"] == c["c_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


_VOCAB_TERMS = (
    "the", "a", "of", "to", "and", "in", "is", "table", "scan", "filter",
    "spark", "query", "data", "join", "key", "value", "row", "hash", "sort",
    "merge",
)


@q(
    "doc_vocab_coverage",
    f"""
    WITH v AS (SELECT unnest([{", ".join(repr(t) for t in _VOCAB_TERMS)}]) AS term),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    per_doc AS (
      SELECT t.doc_id,
             count(*) AS n_tokens,
             CAST(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_in_vocab
      FROM tok t LEFT JOIN v ON v.term = t.tok
      GROUP BY t.doc_id)
    SELECT doc_id, n_tokens, n_in_vocab,
           1.0 - CAST(n_in_vocab AS DOUBLE) / n_tokens AS oov_rate
    FROM per_doc
    """,
)
def doc_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer/vocabulary coverage check: per-document OOV rate against a
    fixed vocabulary — the sanity gate run before committing a tokenizer
    to a training corpus.  The vocab is a broadcast set folded into ONE
    map-side array expression (count tokens present in the literal set),
    so the operator is shuffle-free at any corpus size; the oracle pays an
    explode + outer join instead.  Integer counts -> exact double
    division."""
    d = t_spread(spark, sf, "documents")
    vocab = F.array(*[F.lit(x) for x in _VOCAB_TERMS])
    toks = F.split(F.col("text"), " ", -1)
    staged = d.select("doc_id", toks.alias("toks"))
    n_tokens = F.size("toks")
    n_in = F.size(
        F.filter(F.col("toks"), lambda x: F.array_contains(vocab, x))
    )
    return staged.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_in.cast("long").alias("n_in_vocab"),
        (
            F.lit(1.0) - F.col("n_in_vocab").cast("double") / F.col("n_tokens")
        ).alias("oov_rate"),
    )


@q(
    "eth_pushdown_window",
    f"""
    SELECT block_miner, count(*) AS n_blocks,
           CAST(sum(CAST(block_gasused AS DECIMAL(18,0))) AS DOUBLE)
             AS total_gas
    FROM read_parquet('{ETH}/block.parquet')
    WHERE block_number BETWEEN 500 AND 1500
    GROUP BY block_miner
    """,
)
def eth_pushdown_window(spark: SparkSession, sf: str) -> DataFrame:
    """The custom Python DataSource WITH pushFilters on the oracle gate:
    a block-range predicate reaches ``pushFilters`` (sources/rpc.py), the
    planner transposes it to block-range partitions (the reference's
    getTableLayouts contract, EthereumMetadata.java:179-237), only
    ~1000 of 2400 blocks are read, and Spark re-applies the filter
    post-scan (unenforced contract).  The aggregation then runs on the
    pruned scan — an end-to-end hash-check of the pushdown path, not
    just a plan-shape test."""
    from presto_ethereum_spark.sources.rpc import EthereumPushdownDataSource

    spark.dataSource.register(EthereumPushdownDataSource)
    df = (
        spark.read.format("ethereum-pushdown")
        .option("path", str(ETH / "chain_blocks.parquet"))
        .option("table", "block")
        .load()
    )
    return (
        df.where((F.col("block_number") >= 500) & (F.col("block_number") <= 1500))
        .groupBy("block_miner")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.col("block_gasused").cast("decimal(18,0)"))
            .cast("double")
            .alias("total_gas"),
        )
    )


@q(
    "eth_pushdown_islands",
    f"""
    SELECT block_number, block_miner, block_gasused
    FROM read_parquet('{ETH}/block.parquet')
    WHERE block_number IN (5, 6, 7, 2001, 2002, 2003)
    """,
)
def eth_pushdown_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Disjunctive (multi-range) block pruning on the oracle gate: an
    ``IN`` over two distant block islands reaches ``pushFilters``, the
    planner splits it into one range per consecutive run (the reference's
    ordered-ranges list, EthereumTableLayoutHandle.java:13-36 /
    EthereumMetadata.java:190-199), and ``partitions()`` launches ONLY the
    two covered islands — 6 of 2400 blocks read, results hash-checked."""
    from presto_ethereum_spark.sources.rpc import EthereumPushdownDataSource

    spark.dataSource.register(EthereumPushdownDataSource)
    df = (
        spark.read.format("ethereum-pushdown")
        .option("path", str(ETH / "chain_blocks.parquet"))
        .option("table", "block")
        .load()
    )
    return df.where(
        F.col("block_number").isin(5, 6, 7, 2001, 2002, 2003)
    ).select("block_number", "block_miner", "block_gasused")


@q(
    "eth_deltas_scalable",
    f"""
    SELECT bn, delta FROM (
      SELECT block_number AS bn,
             block_timestamp
               - lag(block_timestamp) OVER (ORDER BY block_number) AS delta
      FROM read_parquet('{ETH}/block.parquet'))
    WHERE delta IS NOT NULL
    """,
)
def eth_deltas_scalable(spark: SparkSession, sf: str) -> DataFrame:
    """The chain-scale block-time-delta plan on the oracle gate: window
    partitioned by block BUCKET (parallel at any chain length — the graded
    ``eth_block_time_deltas`` uses a single-partition global window that
    cannot parallelize past one task), cross-boundary deltas recovered by
    joining each bucket's first row to the previous block — O(#buckets)
    extra rows.  2400 blocks / bucket_size=200 exercises 12 buckets and
    11 boundary joins; hash-checked against the global-window SQL."""
    from presto_ethereum_spark.plans.golden import block_time_deltas_scalable

    blk = _eth_tables(spark).table("block")
    return block_time_deltas_scalable(blk, bucket_size=200)


@q(
    "eth_miner_streaks",
    f"""
    WITH marked AS (
      SELECT block_number, block_miner,
             CASE WHEN lag(block_miner) OVER w IS NULL
                       OR lag(block_miner) OVER w <> block_miner
                  THEN 1 ELSE 0 END AS is_start
      FROM read_parquet('{ETH}/block.parquet')
      WINDOW w AS (ORDER BY block_number)),
    streaks AS (
      SELECT block_miner,
             CAST(sum(is_start) OVER (ORDER BY block_number
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS streak_id
      FROM marked)
    SELECT block_miner, count(*) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS total_blocks
    FROM (SELECT block_miner, streak_id, count(*) AS len
          FROM streaks GROUP BY block_miner, streak_id)
    GROUP BY block_miner
    """,
)
def eth_miner_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands over the chain: consecutive-block mining streaks
    per miner (change-flag -> running sum -> per-streak count -> per-miner
    rollup) — the classic sequence-segmentation window pattern, distinct
    from gap-based sessionization.  One global ordering by block_number;
    at 100 TB the same pattern runs per partition key (day/epoch), keeping
    windows bounded."""
    b = _eth_tables(spark).table("block").select("block_number", "block_miner")
    w = Window.orderBy("block_number")
    marked = b.withColumn(
        "is_start",
        F.when(
            F.lag("block_miner").over(w).isNull()
            | (F.lag("block_miner").over(w) != F.col("block_miner")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = Window.orderBy("block_number").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    streaks = marked.select(
        "block_miner", F.sum("is_start").over(run).alias("streak_id")
    )
    per_streak = streaks.groupBy("block_miner", "streak_id").agg(
        F.count("*").alias("len")
    )
    return per_streak.groupBy("block_miner").agg(
        F.count("*").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("total_blocks"),
    )


@q(
    "multimodal_dedup",
    """
    SELECT sha256(text) AS media_sha,
           min(doc_id) AS keeper_media_id,
           count(*) AS n_copies,
           CAST(min(length(text)) AS BIGINT) AS n_bytes
    FROM documents
    GROUP BY media_sha
    """,
)
def multimodal_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup on the BINARY media column (operators/multimodal.py
    media table): sha256 over raw bytes, keep the min id — the asset-level
    dedup every multimodal pipeline runs before decode.  Only the 32-byte
    digest shuffles, never payloads; the oracle replicates over the source
    text (the fixture media bytes ARE the utf-8 text, so digests agree)."""
    from presto_ethereum_spark.operators.multimodal import media_from_documents

    media = media_from_documents(t_spread(spark, sf, "documents"))
    return (
        media.select(
            F.col("media_id"),
            F.sha2(F.col("data"), 256).alias("media_sha"),
            F.length("data").alias("n_bytes"),
        )
        .groupBy("media_sha")
        .agg(
            F.min("media_id").alias("keeper_media_id"),
            F.count("*").alias("n_copies"),
            F.min("n_bytes").cast("bigint").alias("n_bytes"),
        )
    )


@q(
    "emb_dim_stats",
    """
    WITH ex AS (
      SELECT CAST(i - 1 AS INT) AS dim,
             CAST(floor(v[i] * 1000000000000000.0) AS BIGINT) AS xq
      FROM (SELECT CAST(embedding AS DOUBLE[]) AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
    )
    SELECT dim, n, sum_q, min_q, max_q,
           (CAST(sum_q AS DOUBLE) / 1000000000000000.0) / n AS mean
    FROM (
      SELECT dim, count(*) AS n,
             CAST(sum(xq) AS BIGINT) AS sum_q,
             CAST(min(xq) AS BIGINT) AS min_q,
             CAST(max(xq) AS BIGINT) AS max_q
      FROM ex GROUP BY dim)
    """,
)
def emb_dim_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension embedding health stats (mean / min / max) — the drift
    monitor run before trusting a new embedding batch (dead or exploding
    dimensions show up here first).  Coordinates are 1e15 fixed-point
    quantized so the sums are integer-exact under any partitioning; one
    posexplode + one partial-aggregated shuffle on a 64-value key."""
    e = t_spread(spark, sf, "embeddings", parts=8)
    s = F.lit(1e15)
    return (
        e.select(F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias("dim", "x"))
        .select("dim", F.floor(F.col("x") * s).alias("xq"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("xq").cast("bigint").alias("sum_q"),
            F.min("xq").cast("bigint").alias("min_q"),
            F.max("xq").cast("bigint").alias("max_q"),
            ((F.sum("xq").cast("double") / s) / F.count("*")).alias("mean"),
        )
    )


def _py_sub_d2(x: list[float], c: list[float]) -> float:
    """Sequential (x-c)·(x-c) in fp64 — the same op order as the kernels
    and DuckDB's list_dot_product over the diff list."""
    acc = 0.0
    for a, b in zip(x, c):
        d = a - b
        acc = acc + d * d
    return acc


@q(
    "emb_pq_adc_topk",
    f"""
    WITH seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
             CAST(embedding AS DOUBLE[]) AS v
      FROM (SELECT vec_id, embedding FROM embeddings
            ORDER BY vec_id LIMIT {_PQ_CODES})
    ),
    subs AS (SELECT unnest(generate_series(0, {_PQ_SUBSPACES - 1})) AS s),
    cb AS (
      SELECT subs.s AS subspace, seeds.code,
             (seeds.v)[subs.s * {_PQ_SUBDIM} + 1 : subs.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS c
      FROM seeds CROSS JOIN subs
    ),
    ev AS (
      SELECT e.vec_id, subs.s AS subspace,
             (CAST(e.embedding AS DOUBLE[]))
               [subs.s * {_PQ_SUBDIM} + 1 : subs.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS x
      FROM embeddings e CROSS JOIN subs
    ),
    scored AS (
      SELECT ev.vec_id, ev.subspace, cb.code,
             list_dot_product(
               list_transform(list_zip(ev.x, cb.c), p -> p[1] - p[2]),
               list_transform(list_zip(ev.x, cb.c), p -> p[1] - p[2])) AS d2
      FROM ev JOIN cb ON cb.subspace = ev.subspace
    ),
    assign AS (
      SELECT vec_id, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2 ASC, code) AS rnk
        FROM scored) WHERE rnk = 1
    ),
    qlut AS (
      SELECT q.vec_id AS query_id, q.subspace, q.code,
             CAST(floor(q.d2 * 1000000000000000.0) AS BIGINT) AS d2q
      FROM scored q WHERE q.vec_id < 5
    )
    SELECT query_id, neighbor_id, approx_d2_q, rank FROM (
      SELECT l.query_id, a.vec_id AS neighbor_id,
             CAST(sum(l.d2q) AS BIGINT) AS approx_d2_q,
             CAST(row_number() OVER (
                 PARTITION BY l.query_id
                 ORDER BY CAST(sum(l.d2q) AS BIGINT) ASC, a.vec_id) AS INT)
               AS rank
      FROM assign a
      JOIN qlut l ON l.subspace = a.subspace AND l.code = a.code
      WHERE a.vec_id != l.query_id
      GROUP BY l.query_id, a.vec_id)
    WHERE rank <= 10
    """,
)
def emb_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ SERVING: asymmetric distance computation — each query
    precomputes a (subspace, code) -> partial-d² lookup table against the
    sub-codebooks; a corpus vector's approximate distance is then just 8
    table lookups summed over its stored codes, never touching the raw
    vectors.  This is the query path of every billion-vector PQ index
    (Jégou et al., TPAMI'11).

    Exactness: LUT entries are computed with the same sequential fp64
    accumulation as the encode kernel, then floor-quantized to 1e15
    fixed-point BIGINTs so the 8-way sums and the ranking are
    integer-exact under any partitioning (ties to the lowest neighbor).

    Scale: codes come from the map-only encode; the LUT is 5 queries x 8
    subspaces x 4 codes = 160 broadcast rows; scoring is one broadcast
    join + a (query, vec) partial-aggregated sum; WindowGroupLimit top-k.
    The corpus embedding column is never read at serve time."""
    from presto_ethereum_spark.operators.similarity import pq_codes, seed_centroids

    e = t_spread(spark, sf, "embeddings", parts=8)
    seeds = _IVF_CODEBOOKS.get(("pq", sf))
    if seeds is None:
        seeds = _IVF_CODEBOOKS[("pq", sf)] = seed_centroids(e, n_cells=_PQ_CODES)
    codebooks = [
        [
            (code, cv[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM])
            for code, (_, cv) in enumerate(seeds)
        ]
        for s in range(_PQ_SUBSPACES)
    ]
    # query LUT, driver-side (5 x 8 x 4 sequential-fp64 sub-distances)
    qrows = (
        e.where(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    lut = [
        (
            int(r["vec_id"]),
            s,
            int(code),
            int(
                __import__("math").floor(
                    _py_sub_d2(
                        [float(x) for x in r["embedding"]][
                            s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM
                        ],
                        [float(x) for x in cv],
                    )
                    * 1e15
                )
            ),
        )
        for r in qrows
        for s in range(_PQ_SUBSPACES)
        for code, cv in codebooks[s]
    ]
    lut_df = F.broadcast(
        spark.createDataFrame(lut, "query_id long, subspace int, code int, d2q long")
    )
    codes = pq_codes(e, codebooks, sub_dim=_PQ_SUBDIM).select(
        F.col("vec_id").alias("neighbor_id"), "subspace", "code"
    )
    scored = (
        codes.join(lut_df, ["subspace", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2q").cast("bigint").alias("approx_d2_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d2_q"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "approx_d2_q", "rank")
    )


def _py_cos(x: list[float], c: list[float]) -> float:
    """Sequential fp64 cosine — the same op order as _duck_cos (no zero
    guard: codebook/query vectors are non-degenerate by construction)."""
    dot = 0.0
    for a, b in zip(x, c):
        dot = dot + a * b
    return dot / (_py_l2_local(x) * _py_l2_local(c))


def _py_l2_local(v: list[float]) -> float:
    import math

    acc = 0.0
    for x in v:
        acc = acc + x * x
    return math.sqrt(acc)


@q(
    "emb_ivfpq_topk",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, c.cid, {_duck_cos('c.cvec', 'e.embedding')} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    cells AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored WHERE vec_id < 5) WHERE rnk <= 2
    ),
    seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
             CAST(embedding AS DOUBLE[]) AS v
      FROM (SELECT vec_id, embedding FROM embeddings
            ORDER BY vec_id LIMIT {_PQ_CODES})
    ),
    subs AS (SELECT unnest(generate_series(0, {_PQ_SUBSPACES - 1})) AS s),
    cb AS (
      SELECT subs.s AS subspace, seeds.code,
             (seeds.v)[subs.s * {_PQ_SUBDIM} + 1 : subs.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS c
      FROM seeds CROSS JOIN subs
    ),
    ev AS (
      SELECT e.vec_id, subs.s AS subspace,
             (CAST(e.embedding AS DOUBLE[]))
               [subs.s * {_PQ_SUBDIM} + 1 : subs.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS x
      FROM embeddings e CROSS JOIN subs
    ),
    pscored AS (
      SELECT ev.vec_id, ev.subspace, cb.code,
             list_dot_product(
               list_transform(list_zip(ev.x, cb.c), p -> p[1] - p[2]),
               list_transform(list_zip(ev.x, cb.c), p -> p[1] - p[2])) AS d2
      FROM ev JOIN cb ON cb.subspace = ev.subspace
    ),
    passign AS (
      SELECT vec_id, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2 ASC, code) AS rnk
        FROM pscored) WHERE rnk = 1
    ),
    qlut AS (
      SELECT q.vec_id AS query_id, q.subspace, q.code,
             CAST(floor(q.d2 * 1000000000000000.0) AS BIGINT) AS d2q
      FROM pscored q WHERE q.vec_id < 5
    )
    SELECT query_id, neighbor_id, approx_d2_q, rank FROM (
      SELECT l.query_id, pa.vec_id AS neighbor_id,
             CAST(sum(l.d2q) AS BIGINT) AS approx_d2_q,
             CAST(row_number() OVER (
                 PARTITION BY l.query_id
                 ORDER BY CAST(sum(l.d2q) AS BIGINT) ASC, pa.vec_id) AS INT)
               AS rank
      FROM passign pa
      JOIN cells ce ON ce.vec_id = pa.vec_id
      JOIN probe p ON p.cid = ce.cid
      JOIN qlut l ON l.query_id = p.query_id
                 AND l.subspace = pa.subspace AND l.code = pa.code
      WHERE pa.vec_id != l.query_id
      GROUP BY l.query_id, pa.vec_id)
    WHERE rank <= 10
    """,
)
def emb_ivfpq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF+PQ combined serving — the canonical billion-vector ANN plan
    (FAISS IndexIVFPQ): the one-pass index kernel
    (operators/similarity.ivfpq_index) stores (cell, pq codes) per vector;
    each query probes its 2 closest cells and scores ONLY those cells'
    codes through its broadcast (subspace, code) -> partial-d² LUT.
    Compute drops to ~nprobe/n_cells of the corpus AND the corpus vectors
    are never read at serve time — cell pruning and code compression
    compose.  LUT entries are 1e15 fixed-point quantized, so sums and
    ranking are integer-exact under any partitioning."""
    from presto_ethereum_spark.operators.similarity import (
        ivfpq_index,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    pq_seeds = _IVF_CODEBOOKS.get(("pq", sf))
    if pq_seeds is None:
        pq_seeds = _IVF_CODEBOOKS[("pq", sf)] = seed_centroids(
            e, n_cells=_PQ_CODES
        )
    codebooks = [
        [
            (code, cv[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM])
            for code, (_, cv) in enumerate(pq_seeds)
        ]
        for s in range(_PQ_SUBSPACES)
    ]
    index = ivfpq_index(e, cents, codebooks, sub_dim=_PQ_SUBDIM).select(
        F.col("vec_id").alias("neighbor_id"), "cell", "subspace", "code"
    )
    # query-side: probed cells + LUT, driver-side (5 queries x small
    # codebooks — the same materialization any broadcast implies)
    qrows = (
        e.where(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    import math

    lut = []
    for r in qrows:
        qv = [float(x) for x in r["embedding"]]
        csims = sorted(
            ((-_py_cos(qv, [float(x) for x in cv]), int(cid)) for cid, cv in cents),
        )[:2]
        probed = [cid for _, cid in csims]
        for cell in probed:
            for s in range(_PQ_SUBSPACES):
                sub = qv[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
                for code, cv in codebooks[s]:
                    lut.append(
                        (
                            int(r["vec_id"]),
                            cell,
                            s,
                            int(code),
                            int(math.floor(_py_sub_d2(sub, [float(x) for x in cv]) * 1e15)),
                        )
                    )
    lut_df = F.broadcast(
        spark.createDataFrame(
            lut, "query_id long, cell int, subspace int, code int, d2q long"
        )
    )
    scored = (
        index.join(lut_df, ["cell", "subspace", "code"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2q").cast("bigint").alias("approx_d2_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d2_q"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "approx_d2_q", "rank")
    )


# ---------------------------------------------------------------------------
# Round-3 additions: graph triangles over the near-dup pair graph, budgeted
# domain caps, DSIR-style importance weights, SCD2 dimension build,
# substring-window dedup, MMR diversity re-ranking
# ---------------------------------------------------------------------------

_DUCK_EMB_PAIRS_03 = f"""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {_DUCK_COSINE} >= 0.3
"""


@q(
    "emb_pair_triangles",
    f"""
    WITH p AS ({_DUCK_EMB_PAIRS_03}),
    tri AS (
      SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
      FROM p e1
      JOIN p e2 ON e2.id_a = e1.id_a AND e2.id_b > e1.id_b
      JOIN p e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b),
    corners AS (
      SELECT x AS vec_id FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
    SELECT vec_id, count(*) AS n_triangles FROM corners GROUP BY vec_id
    """,
)
def emb_pair_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle counts over the cosine>=0.3 near-dup pair graph —
    the cluster-density diagnostic of a semantic-dedup run (triangle-rich
    neighborhoods are tight duplicate clusters; triangle-free stars are
    chains of borderline matches).  Spark enumerates triangles with
    degree-ordered edge orientation (operators/graph.triangles: wedge set
    bounded O(m^1.5), Suri & Vassilvitskii WWW'11); the oracle is the naive
    a<b<c triple join, feasible at fixture scale only."""
    from presto_ethereum_spark.operators.graph import triangle_participation
    from presto_ethereum_spark.operators.similarity import cosine_pairs_gemm

    # gemm kernel: bit-identical pairs to the expression fold at ~10x the
    # speed (the all-pairs scoring is the dominant cost of this query)
    pairs = cosine_pairs_gemm(
        t_spread(spark, sf, "embeddings", parts=8), threshold=0.3
    )
    tp = triangle_participation(pairs.select("id_a", "id_b"), src="id_a", dst="id_b")
    return tp.select(F.col("n").alias("vec_id"), "n_triangles")


@q(
    "doc_domain_budget",
    """
    WITH ordered AS (
      SELECT source, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                ROWS UNBOUNDED PRECEDING) AS run
      FROM documents)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN run <= 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN run <= 10000 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM ordered GROUP BY source
    """,
)
def doc_domain_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain BYTE budget cap (operators/sampling.cap_by_budget): each
    source keeps documents in deterministic hash order until 10k chars are
    spent — the size-aware "cap every domain" curation rule (a count cap
    misses that domains have wildly different document lengths).  Summary
    per source: docs seen / kept / chars kept."""
    from presto_ethereum_spark.operators.sampling import cap_by_budget

    d = t(spark, sf, "documents")
    capped = cap_by_budget(
        d, strata="source", key="doc_id", cost_col="n_chars", budget=10_000
    )
    return capped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_if(F.col("kept")).alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_chars")).otherwise(0)).alias(
            "chars_kept"
        ),
    )


@q(
    "doc_importance_weights",
    """
    WITH pos AS (
      SELECT doc_id, (source = 'src0') AS is_t,
             unnest(string_split(text, ' ')) AS tok
      FROM documents),
    stats AS (
      SELECT tok, count(*) AS c_all,
             CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
      FROM pos GROUP BY tok),
    per AS (
      SELECT p.doc_id, count(*) AS n_tokens,
             CAST(sum(((s.c_tgt + 1) * 1000000) // (s.c_all + 1)) AS BIGINT)
               AS importance_score
      FROM pos p JOIN stats s USING (tok) GROUP BY p.doc_id)
    SELECT doc_id, n_tokens, importance_score,
           (2 * importance_score + n_tokens) // (2 * n_tokens) AS avg_ratio_e6
    FROM per
    """,
)
def doc_importance_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style data-selection scores (operators/text.importance_weights):
    rank every document by how target-like its token distribution is
    (target slice = source 'src0'), with integer smoothed-frequency ratios
    so both engines agree exactly."""
    from presto_ethereum_spark.operators.text import importance_weights

    d = t_spread(spark, sf, "documents")
    return importance_weights(d, target=F.col("source") == "src0")


@q(
    "doc_bigram_fluency",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    vocab AS (SELECT count(DISTINCT tok) AS v
              FROM (SELECT unnest(toks) AS tok FROM d)),
    big AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM d, unnest(generate_series(1, len(toks) - 1)) AS s(i)),
    bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
    sc AS (
      SELECT g.doc_id, count(*) AS n_bigrams,
             CAST(sum(((bc.c12 + 1) * 1000000) // (c1.c1 + v.v)) AS BIGINT)
               AS fluency_score
      FROM big g JOIN bc USING (w1, w2) JOIN c1 USING (w1), vocab v
      GROUP BY g.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           sc.fluency_score,
           (2 * sc.fluency_score + sc.n_bigrams) // (2 * sc.n_bigrams)
             AS avg_prob_e6
    FROM d LEFT JOIN sc USING (doc_id)
    """,
)
def doc_bigram_fluency(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-self-trained bigram-LM quality score (operators/text.
    bigram_fluency) — the CCNet-style fluency filter with integer-exact
    smoothed conditional-frequency sums instead of log-probabilities, so
    both engines agree bit-for-bit.  ``avg_prob_e6`` is the per-position
    mean in integer micro-units (round-half-up, computed as
    ``(2*score + n) DIV (2*n)``) — the r5 sf0.1 gate failure was this
    column as ``round(double, 6)`` landing on a decimal tie."""
    from presto_ethereum_spark.operators.text import bigram_fluency

    return bigram_fluency(t_spread(spark, sf, "documents"))


@q(
    "doc_curriculum_order",
    """
    WITH dist AS (SELECT n_chars AS cs, count(*) AS cn
                  FROM documents GROUP BY n_chars),
    tot AS (SELECT CAST(sum(cn) AS BIGINT) AS ct FROM dist),
    b AS (
      SELECT cs,
             least(7, CAST((8 * coalesce(sum(cn) OVER (
                 ORDER BY cs DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               // ct AS INT)) AS bucket
      FROM dist, tot)
    SELECT d.doc_id, b.bucket,
           CAST(row_number() OVER (
               PARTITION BY b.bucket
               ORDER BY md5('c1' || CAST(d.doc_id AS VARCHAR)), d.doc_id)
             AS BIGINT) AS slot
    FROM documents d JOIN b ON d.n_chars = b.cs
    """,
)
def doc_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    """Length-based curriculum interleave (operators/sampling.
    curriculum_interleave): exact-CDF difficulty buckets over n_chars
    (bucket 0 = longest) + deterministic per-bucket slots; training reads
    sorted by (slot, bucket) so every window mixes all difficulty levels.
    The bucket CDF comes from the tiny distinct-score distribution table,
    never a global ntile window."""
    from presto_ethereum_spark.operators.sampling import curriculum_interleave

    d = t_spread(spark, sf, "documents")
    return curriculum_interleave(
        d, "n_chars", "doc_id", n_buckets=8, salt="c1"
    ).select("doc_id", "bucket", "slot")


@q(
    "rel_scd2_build",
    """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t, event_type AS attr, event_id
      FROM events),
    m AS (
      SELECT user_id, t, attr, event_id,
             CASE WHEN lag(attr) OVER w IS NULL
                       OR lag(attr) OVER w <> attr THEN 1 ELSE 0 END AS chg
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    v AS (
      SELECT user_id, t, attr,
             sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS UNBOUNDED PRECEDING) - 1 AS version
      FROM m),
    c AS (
      SELECT user_id AS key, version, min(attr) AS attr, min(t) AS valid_from
      FROM v GROUP BY user_id, version)
    SELECT key, CAST(version AS INT) AS version, attr, valid_from,
           lead(valid_from) OVER (PARTITION BY key ORDER BY version) AS valid_to
    FROM c
    """,
)
def rel_scd2_build(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build from the event log
    (operators/temporal.scd2_build): per user, the change-compressed
    event_type timeline as half-open [valid_from, valid_to) versions —
    the warehouse dimension-maintenance primitive."""
    from presto_ethereum_spark.operators.temporal import scd2_build

    ev = t(spark, sf, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("t_us"), "event_type", "event_id"
    )
    return scd2_build(
        ev, key_col="user_id", time_col="t_us", attr_col="event_type",
        tiebreak_col="event_id",
    )


@q(
    "doc_substring_dedup",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    win AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(array_to_string(
               ts[CAST(p AS INT):CAST(p + 7 AS INT)], ' ')), 1, 15)) AS BIGINT) AS h
      FROM tok, unnest(range(1, greatest(len(ts) - 7, 0) + 1)) AS r(p)),
    anch AS (SELECT doc_id, h FROM win WHERE h % 4 = 0),
    nw AS (
      SELECT t.doc_id, CAST(coalesce(c.n, 0) AS INT) AS n_windows
      FROM tok t LEFT JOIN (
        SELECT doc_id, count(*) AS n FROM anch GROUP BY doc_id) c
      USING (doc_id)),
    shared AS (
      SELECT h FROM (SELECT DISTINCT h, doc_id FROM anch)
      GROUP BY h HAVING count(*) >= 2),
    dup AS (
      SELECT w.doc_id, count(*) AS n_dup
      FROM anch w JOIN shared USING (h) GROUP BY w.doc_id)
    SELECT n.doc_id, n.n_windows,
           CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_windows,
           CASE WHEN n.n_windows > 0
                THEN CAST((2 * coalesce(d.n_dup, 0) * 1000000 + n.n_windows)
                          // (2 * n.n_windows) AS DOUBLE) / 1000000
                ELSE 0.0 END AS dup_frac
    FROM nw n LEFT JOIN dup d USING (doc_id)
    """,
)
def doc_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Long-window exact substring duplication coverage (operators/dedup.
    substring_duplicates, k=8 tokens, content-anchored 1-in-4 windows):
    the suffix-array-dedup signal — what fraction of each document is text
    that appears verbatim in another document.  Content anchoring (not
    position striding) keeps detection alignment-free: a window anchored
    in one copy of a run is anchored in every copy."""
    from presto_ethereum_spark.operators.dedup import substring_duplicates

    return substring_duplicates(
        t_spread(spark, sf, "documents"), k=8, anchor=4
    )


@q("emb_mmr_rerank", None)
def emb_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversity re-ranking of the exact top-20
    candidate pool down to 5 per query (operators/similarity.mmr_rerank).
    Greedy MMR has no closed relational form (each pick conditions on the
    previous picks), so this is a rows-only graded query; exact selection
    behavior is pinned by unit tests on hand-checkable cases."""
    from presto_ethereum_spark.operators.similarity import mmr_rerank

    emb = t_spread(spark, sf, "embeddings", parts=8)
    queries = emb.where(F.col("vec_id") < 8)
    return mmr_rerank(emb, queries, k=5, pool=20, lam=0.7)


@q(
    "stream_upsert_state",
    """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id, value FROM events),
    r AS (
      SELECT user_id, t_us AS last_t_us, event_id AS last_event_id,
             value AS last_value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t_us DESC, event_id DESC) AS rn
      FROM ev)
    SELECT user_id, last_t_us, last_event_id, last_value FROM r WHERE rn = 1
    """,
)
def stream_upsert_state(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming keyed upsert via foreachBatch compact-and-swap
    (streaming/events.run_foreachbatch_upsert): the settled per-user latest
    state must equal the batch arg-max — the exactly-once-upsert sink
    pattern for stores without native MERGE."""
    from presto_ethereum_spark.streaming.events import run_foreachbatch_upsert

    return run_foreachbatch_upsert(spark, sf)


@q(
    "rel_snapshot_diff",
    """
    WITH snap_a AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey % 7 <> 0),
    snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 5 <> 0)
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                     OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                  THEN 'update' END AS change,
           a.o_totalprice AS old_o_totalprice,
           b.o_totalprice AS new_o_totalprice,
           a.o_orderstatus AS old_o_orderstatus,
           b.o_orderstatus AS new_o_orderstatus
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    WHERE CASE WHEN a.o_orderkey IS NULL THEN 'insert'
               WHEN b.o_orderkey IS NULL THEN 'delete'
               WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                    OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                 THEN 'update' END IS NOT NULL
    """,
)
def rel_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """CDC snapshot diff (operators/temporal.snapshot_diff): two synthetic
    generations of the orders table (modulo-key deletes/inserts, doubled
    totals as updates) classified insert/delete/update with old/new values
    — the incremental-pipeline primitive (emit only what changed)."""
    from presto_ethereum_spark.operators.temporal import snapshot_diff

    o = t(spark, sf, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    snap_a = o.where(F.col("o_orderkey") % 7 != 0)
    snap_b = o.where(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    return snapshot_diff(
        snap_a, snap_b,
        key_cols=["o_orderkey"],
        compare_cols=["o_totalprice", "o_orderstatus"],
    )


@q(
    "doc_bpe_merges",
    """
    WITH tok AS (SELECT string_split(text, ' ') AS ts FROM documents),
    pr AS (
      SELECT ts[CAST(i AS INT)] AS w1, ts[CAST(i + 1 AS INT)] AS w2
      FROM tok, unnest(range(1, len(ts))) AS r(i))
    SELECT w1, w2, count(*) AS n
    FROM pr GROUP BY w1, w2
    ORDER BY n DESC, w1, w2 LIMIT 20
    """,
)
def doc_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Top adjacent-token-pair counts — the candidate-scoring step of one
    BPE/WordPiece merge round, at corpus scale: pair extraction is a
    map-side array zip (no Python), the count is one partial-agg shuffle
    on the pair, and the top-20 rides TakeOrderedAndProject with a total
    (count, w1, w2) order so the cut is deterministic."""
    d = t_spread(spark, sf, "documents")
    toks = F.split(F.col("text"), " ", -1)
    prs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        d.select(F.explode(prs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(20)
    )


@q(
    "doc_heavy_tokens",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS value FROM documents),
    tot AS (SELECT count(*) AS n_total FROM tok)
    SELECT value, count(*) AS n
    FROM tok, tot
    GROUP BY value, n_total
    HAVING count(*) > (n_total * 5000000) // 1000000000
    """,
)
def doc_heavy_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT heavy hitters (> 0.5% of token positions) via per-partition
    Misra-Gries candidates + exact verification (operators/frequency.
    heavy_hitters): the scale path mines frequent items WITHOUT shuffling
    one row per distinct token — candidates leave each partition k-bounded,
    and the exact re-count makes the result row-identical to the naive
    full groupBy the oracle runs."""
    from presto_ethereum_spark.operators.frequency import heavy_hitters
    from presto_ethereum_spark.operators.text import tokens

    d = t_spread(spark, sf, "documents")
    exploded = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return heavy_hitters(exploded, "tok", threshold_frac=0.005)


@q(
    "eth_address_sessions",
    f"""
    WITH tx AS (
      SELECT tx_from AS addr, tx_blocknumber AS bn, tx_hash
      FROM read_parquet('{ETH}/transaction.parquet')),
    m AS (
      SELECT addr, bn, tx_hash,
             CASE WHEN lag(bn) OVER w IS NULL OR bn - lag(bn) OVER w > 50
                  THEN 1 ELSE 0 END AS st
      FROM tx WINDOW w AS (PARTITION BY addr ORDER BY bn, tx_hash)),
    n AS (
      SELECT addr, bn,
             sum(st) OVER (PARTITION BY addr ORDER BY bn, tx_hash
                           ROWS UNBOUNDED PRECEDING) - 1 AS sid
      FROM m)
    SELECT addr, CAST(sid AS BIGINT) AS session_id, count(*) AS n_tx,
           min(bn) AS first_block, max(bn) AS last_block
    FROM n GROUP BY addr, sid
    """,
)
def eth_address_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Address activity sessions: bursts of transactions from one sender
    separated by > 50 quiet blocks (operators/temporal.sessionize reused
    on the chain decode path) — the address-behavior feature the
    training-pipeline sessionizer computes on event logs, applied to the
    connector's transaction table."""
    from presto_ethereum_spark.operators.temporal import sessionize

    tx = _eth_tables(spark).table("transaction").select(
        F.col("tx_from").alias("addr"),
        F.col("tx_blocknumber").alias("bn"),
        "tx_hash",
    )
    s = sessionize(tx, key="addr", time_col="bn", gap=50, order_tiebreak="tx_hash")
    return s.groupBy("addr", F.col("session_id")).agg(
        F.count("*").alias("n_tx"),
        F.min("bn").alias("first_block"),
        F.max("bn").alias("last_block"),
    )


@q("emb_pair_kcore", None)
def emb_pair_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """2-core of the cosine>=0.3 near-dup pair graph (operators/graph.
    k_core): trims pendant chains of borderline matches before cluster
    resolution, keeping only nodes embedded in cyclic (dense) duplicate
    structure.  Iterative peeling to a fixpoint has no closed relational
    form (each round's degrees depend on the previous round's survivors),
    so this is a rows-only graded query; exact peeling behavior is pinned
    by unit tests on hand-checkable graphs and the fixpoint is unique/
    order-independent, so the output is deterministic."""
    from presto_ethereum_spark.operators.graph import k_core
    from presto_ethereum_spark.operators.similarity import cosine_pairs_gemm

    pairs = cosine_pairs_gemm(
        t_spread(spark, sf, "embeddings", parts=8), threshold=0.3
    )
    return k_core(pairs.select("id_a", "id_b"), k=2, src="id_a", dst="id_b")


@q(
    "rel_table_stats",
    """
    SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS ndv_exact, 1 AS ndv_ok,
           CAST(min(o_orderkey) AS DOUBLE) AS min_num,
           CAST(max(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey), 1,
           CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice), 1,
           CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), 1, NULL, NULL,
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    """,
)
def rel_table_stats(spark: SparkSession, sf: str) -> DataFrame:
    """ANALYZE-style per-column statistics in one pass (operators/stats.
    column_stats): row/null/distinct counts and typed min/max for four
    orders columns from a single map-side-combined aggregation — the
    cost-based-planning/data-quality primitive.  The HLL++ ndv rides a
    tolerance verdict (referee pattern of rel_approx_sketches); the exact
    distinct column exists only as that referee."""
    from presto_ethereum_spark.operators.stats import column_stats

    # spread: the multi-distinct Expand multiplies rows x columns before
    # aggregating — on a single-row-group file that all lands in ONE task
    # (measured 16 s -> 2 s at sf0.1 with the spread)
    return column_stats(
        t_spread(spark, sf, "orders"),
        cols=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
    )


@q(
    "eth_block_stats",
    f"""
    WITH b AS (SELECT * FROM read_parquet('{ETH}/block.parquet'))
    SELECT 'block_number' AS col_name, count(*) AS n_rows,
           count(*) - count(block_number) AS n_nulls,
           count(DISTINCT block_number) AS ndv_exact, 1 AS ndv_ok,
           CAST(min(block_number) AS DOUBLE) AS min_num,
           CAST(max(block_number) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM b
    UNION ALL
    SELECT 'block_timestamp', count(*), count(*) - count(block_timestamp),
           count(DISTINCT block_timestamp), 1,
           CAST(min(block_timestamp) AS DOUBLE), CAST(max(block_timestamp) AS DOUBLE),
           NULL, NULL
    FROM b
    UNION ALL
    SELECT 'block_miner', count(*), count(*) - count(block_miner),
           count(DISTINCT block_miner), 1, NULL, NULL,
           min(block_miner), max(block_miner)
    FROM b
    """,
)
def eth_block_stats(spark: SparkSession, sf: str) -> DataFrame:
    """ANALYZE over the chain source: one-pass per-column statistics of the
    decoded block table (operators/stats.column_stats through the full
    nested-snapshot decode pipeline) — the stats a planner needs to pick
    block-range scan strategies, produced by the same operator that
    profiles any relational table."""
    from presto_ethereum_spark.operators.stats import column_stats

    b = _eth_tables(spark).table("block")
    return column_stats(b, cols=["block_number", "block_timestamp", "block_miner"])


@q(
    "eth_token_daily_volume",
    f"""
    WITH e AS (SELECT * FROM read_parquet('{ETH}/erc20.parquet')),
    b AS (SELECT block_number, block_timestamp
          FROM read_parquet('{ETH}/block.parquet'))
    SELECT e.erc20_token AS token,
           CAST(b.block_timestamp // 86400 AS BIGINT) AS day_no,
           count(*) AS n_transfers,
           printf('%.6e', sum(e.erc20_value)) AS volume
    FROM e JOIN b ON b.block_number = e.erc20_blocknumber
    GROUP BY token, day_no
    """,
)
def eth_token_daily_volume(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-derived-table analytics: ERC-20 transfers joined back to their
    blocks for timestamps (the decode pipeline must keep block_number
    consistent across the two exploded tables), daily volume per token.
    Volumes are wei-scale doubles spanning ~1e90 (past any DECIMAL), so the
    graded value is the %.6e rendering -- same 6-significant-digit
    absorption of fp ordering noise as eth_erc20_movement; the block side
    is a broadcastable (number, timestamp) projection."""
    e = _eth_tables(spark).table("erc20")
    b = _eth_tables(spark).table("block").select(
        F.col("block_number").alias("bn"), "block_timestamp"
    )
    return (
        e.join(F.broadcast(b), F.col("erc20_blocknumber") == F.col("bn"))
        .groupBy(
            F.col("erc20_token").alias("token"),
            F.expr("block_timestamp DIV 86400").alias("day_no"),
        )
        .agg(
            F.count("*").alias("n_transfers"),
            F.format_string("%.6e", F.sum("erc20_value")).alias("volume"),
        )
    )


@q(
    "doc_incremental_dedup",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_SIG},
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM banded n JOIN banded o
        ON n.band = o.band AND n.key = o.key
      WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0)
    SELECT new_id, old_id,
           CAST((2 * inter * 1000000 + uni) // (2 * uni) AS DOUBLE) / 1000000
               AS jaccard_sim
    FROM (
      SELECT new_id, old_id,
             len(list_intersect(sa.shingles, sb.shingles)) AS inter,
             len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles)) AS uni
      FROM cand
      JOIN shingled sa ON sa.doc_id = new_id
      JOIN shingled sb ON sb.doc_id = old_id)
    WHERE inter::DOUBLE / uni >= 0.3
    """,
)
def doc_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Ingestion-time incremental dedup (operators/dedup.delta_dup_pairs):
    a new shard (doc_id % 10 = 0) checked against the existing corpus's
    banded MinHash index without any corpus-vs-corpus comparison — work
    per shard is O(|shard| + matching buckets).  Exact-Jaccard verified
    at >= 0.3 like the batch LSH query, so the two formulations share an
    oracle skeleton."""
    from presto_ethereum_spark.operators.dedup import delta_dup_pairs

    d = t_spread(spark, sf, "documents")
    return delta_dup_pairs(
        d.where(F.col("doc_id") % 10 != 0),
        d.where(F.col("doc_id") % 10 == 0),
        threshold=0.3,
    )


@q(
    "stream_manifest_sink",
    """
    SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type FROM events
    """,
)
def stream_manifest_sink(spark: SparkSession, sf: str) -> DataFrame:
    """Custom streaming SINK via the Python DataSource API
    (streaming/sink.py): events stream through the two-phase
    stage-then-manifest commit protocol and the committed JSONL output is
    read back via the manifests — it must equal the input exactly (a lost
    task, double-published batch, or orphaned staging file would all break
    the hash)."""
    import tempfile

    from presto_ethereum_spark.streaming.events import _events_source
    from presto_ethereum_spark.streaming.sink import (
        JsonlManifestDataSource,
        read_manifested,
    )

    spark.dataSource.register(JsonlManifestDataSource)
    out = tempfile.mkdtemp(prefix="manifest_sink_")
    q = (
        _events_source(spark, sf)
        .select("event_id", "user_id", "t_us", "event_type")
        .writeStream.format("jsonl_manifest")
        .option("path", out)
        .option("checkpointLocation", f"{out}/_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = read_manifested(
        spark, out, "event_id long, user_id long, t_us long, event_type string"
    ).localCheckpoint(eager=True)
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    return got


@q(
    "eth_reorg_detection",
    f"""
    WITH a AS (SELECT block_number, block_hash
               FROM read_parquet('{ETH}/block.parquet')),
    b AS (SELECT block_number,
                 CASE WHEN block_number > 1990
                      THEN concat(block_hash, '-fork') ELSE block_hash END
                   AS block_hash
          FROM read_parquet('{ETH}/block.parquet'))
    SELECT a.block_number,
           'update' AS change,
           a.block_hash AS old_block_hash,
           b.block_hash AS new_block_hash
    FROM a JOIN b ON a.block_number = b.block_number
    WHERE a.block_hash <> b.block_hash
    """,
)
def eth_reorg_detection(spark: SparkSession, sf: str) -> DataFrame:
    """Chain-reorg detection as a keyed snapshot diff (operators/temporal.
    snapshot_diff): compare the locally-ingested (number -> hash) map
    against the node's current view; hash changes at the same height ARE
    the orphaned blocks, and the fork point is the min changed height — 1.
    The simulated node view forks the last ~10 blocks, the exact shape of
    a head reorg an ingestion pipeline must detect and re-fetch."""
    from presto_ethereum_spark.operators.temporal import snapshot_diff

    blk = _eth_tables(spark).table("block").select("block_number", "block_hash")
    forked = blk.withColumn(
        "block_hash",
        F.when(
            F.col("block_number") > 1990, F.concat(F.col("block_hash"), F.lit("-fork"))
        ).otherwise(F.col("block_hash")),
    )
    return snapshot_diff(
        blk, forked, key_cols=["block_number"], compare_cols=["block_hash"]
    )


@q(
    "doc_corpus_funnel",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_SIG},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    dup_b AS (
      SELECT DISTINCT id_b FROM cand
      JOIN shingled sa ON sa.doc_id = id_a
      JOIN shingled sb ON sb.doc_id = id_b
      WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
            / (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles))) >= 0.3),
    pos AS (
      SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
    grams AS (SELECT doc_id, array_to_string(l[i:i + 2], ' ') AS gram FROM pos),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
    hits AS (
      SELECT DISTINCT g.doc_id
      FROM grams g JOIN bench b USING (gram)
      WHERE g.doc_id % 20 <> 0),
    base AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text))
                  THEN 1 ELSE 0 END AS keeper
      FROM documents),
    flags AS (
      SELECT b.doc_id, b.n_tokens,
             CASE WHEN b.n_tokens >= 10 AND b.n_chars BETWEEN 100 AND 500
                  THEN 1 ELSE 0 END AS s1,
             b.keeper AS s2,
             CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END AS s3,
             CASE WHEN b.doc_id % 20 <> 0 AND h.doc_id IS NULL
                  THEN 1 ELSE 0 END AS s4
      FROM base b
      LEFT JOIN dup_b d ON d.id_b = b.doc_id
      LEFT JOIN hits h ON h.doc_id = b.doc_id)
    SELECT 0 AS stage, 'all' AS stage_name,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM flags
    UNION ALL SELECT 1, 'floors', CAST(sum(s1) AS BIGINT),
           CAST(sum(s1 * n_tokens) AS BIGINT) FROM flags
    UNION ALL SELECT 2, 'exact_dedup', CAST(sum(s1 * s2) AS BIGINT),
           CAST(sum(s1 * s2 * n_tokens) AS BIGINT) FROM flags
    UNION ALL SELECT 3, 'near_dedup', CAST(sum(s1 * s2 * s3) AS BIGINT),
           CAST(sum(s1 * s2 * s3 * n_tokens) AS BIGINT) FROM flags
    UNION ALL SELECT 4, 'decontaminated', CAST(sum(s1 * s2 * s3 * s4) AS BIGINT),
           CAST(sum(s1 * s2 * s3 * s4 * n_tokens) AS BIGINT) FROM flags
    """,
)
def doc_corpus_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The END-TO-END pretraining corpus build as one graded funnel: doc
    and token counts surviving each pipeline stage in order — length/token
    floors, exact-dup keeper election, near-dup (MinHash+LSH, J>=0.3)
    keeper election, benchmark decontamination (3-gram overlap vs the
    held-out doc_id%20 slice, which is itself excluded from the corpus).
    Every stage predicate is computed corpus-wide by the SAME operators
    the individual graded queries use (exact_dedup / minhash_dedup_pairs /
    decontaminate), so this query pins their composition, not just each
    piece."""
    from presto_ethereum_spark.operators.dedup import minhash_dedup_pairs
    from presto_ethereum_spark.operators.text import decontaminate, tokens

    d = t_spread(spark, sf, "documents")
    w_fp = Window.partitionBy(F.md5(F.col("text")))
    base = d.select(
        "doc_id",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        (F.col("doc_id") == F.min("doc_id").over(w_fp)).cast("int").alias("s2"),
    )
    dup_b = (
        minhash_dedup_pairs(d, threshold=0.3).select("id_b").distinct()
        .withColumnRenamed("id_b", "doc_id")
        .withColumn("_dup", F.lit(1))
    )
    hits = (
        decontaminate(d, n=3, bench_mod=20)
        .select("doc_id")
        .withColumn("_hit", F.lit(1))
    )
    flags = (
        base.join(dup_b, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "n_tokens",
            (
                (F.col("n_tokens") >= 10)
                & F.col("n_chars").between(100, 500)
            ).cast("int").alias("s1"),
            "s2",
            F.when(F.col("_dup").isNull(), 1).otherwise(0).alias("s3"),
            F.when(
                (F.col("doc_id") % 20 != 0) & F.col("_hit").isNull(), 1
            ).otherwise(0).alias("s4"),
        )
    )
    pre = [
        F.lit(1),
        F.col("s1"),
        F.col("s1") * F.col("s2"),
        F.col("s1") * F.col("s2") * F.col("s3"),
        F.col("s1") * F.col("s2") * F.col("s3") * F.col("s4"),
    ]
    names = ["all", "floors", "exact_dedup", "near_dedup", "decontaminated"]
    agg = flags.agg(
        *[F.sum(p).cast("long").alias(f"d_{i}") for i, p in enumerate(pre)],
        *[
            F.sum(p * F.col("n_tokens")).cast("long").alias(f"t_{i}")
            for i, p in enumerate(pre)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(names[i]).alias("stage_name"),
                F.col(f"d_{i}").alias("n_docs"),
                F.col(f"t_{i}").alias("total_tokens"),
            )
            for i in range(5)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


@q(
    "rel_zorder_layout",
    """
    WITH dims AS (
      SELECT (o_custkey & 4095) AS a,
             (date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) & 4095) AS b
      FROM orders),
    keyed AS (
      SELECT a, b,
             (((a >> 0) & 1) << 0)
             + (((b >> 0) & 1) << 1)
             + (((a >> 1) & 1) << 2)
             + (((b >> 1) & 1) << 3)
             + (((a >> 2) & 1) << 4)
             + (((b >> 2) & 1) << 5)
             + (((a >> 3) & 1) << 6)
             + (((b >> 3) & 1) << 7)
             + (((a >> 4) & 1) << 8)
             + (((b >> 4) & 1) << 9)
             + (((a >> 5) & 1) << 10)
             + (((b >> 5) & 1) << 11)
             + (((a >> 6) & 1) << 12)
             + (((b >> 6) & 1) << 13)
             + (((a >> 7) & 1) << 14)
             + (((b >> 7) & 1) << 15)
             + (((a >> 8) & 1) << 16)
             + (((b >> 8) & 1) << 17)
             + (((a >> 9) & 1) << 18)
             + (((b >> 9) & 1) << 19)
             + (((a >> 10) & 1) << 20)
             + (((b >> 10) & 1) << 21)
             + (((a >> 11) & 1) << 22)
             + (((b >> 11) & 1) << 23) AS z
      FROM dims)
    SELECT z // 65536 AS z_bucket,
           count(*) AS n,
           min(a) AS min_cust, max(a) AS max_cust,
           min(b) AS min_day, max(b) AS max_day
    FROM keyed GROUP BY z_bucket
    """,
)
def rel_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order layout keys (operators/layout.z_order_key): Morton-
    interleave (customer, order-day) into one clustering key and report
    per-key-range bucket spans -- each bucket covers a compact rectangle
    in BOTH dimensions (narrow min/max on customer AND day), which is
    exactly why files written sorted by z prune on either predicate.
    The key is exact integer bit arithmetic, replayed by the oracle."""
    from presto_ethereum_spark.operators.layout import z_order_key

    o = t(spark, sf, "orders")
    dims = o.select(
        (F.col("o_custkey").bitwiseAND(F.lit(4095))).alias("a"),
        (
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            ).bitwiseAND(F.lit(4095))
        ).alias("b"),
    )
    keyed = dims.withColumn("z", z_order_key(["a", "b"], bits=12))
    return keyed.groupBy(
        F.expr("z DIV 65536").alias("z_bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("a").alias("min_cust"),
        F.max("a").alias("max_cust"),
        F.min("b").alias("min_day"),
        F.max("b").alias("max_day"),
    )


# ---------------------------------------------------------------------------
# Round-4 additions: deeper TPC-H-shaped relational coverage (Q9/Q12/Q16/Q21
# analogs over the available columns)
# ---------------------------------------------------------------------------


@q(
    "rel_profit_by_nation_year",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def rel_profit_by_nation_year(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: five-table join (fact + three broadcast dims + a
    part-name residual filter) grouped by (supplier nation, order year).
    Exact DECIMAL profit sums keep the doubles partition-order-free."""
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    p = t(spark, sf, "part").where(F.col("p_name").like("%widget%"))
    o = t(spark, sf, "orders")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("profit")
        )
    )


@q(
    "rel_late_shipment_priority",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    """,
)
def rel_late_shipment_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact equi-join with a date-arithmetic residual
    (shipments lagging the order by >60 days) and conditional-aggregation
    priority counts — the CASE-WHEN pivot over a join Spark plans as one
    shuffle + partial aggs."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@q(
    "rel_supplier_cnt_by_part",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
                FROM lineitem)
    SELECT p_brand, p_size, CAST(count(DISTINCT suppkey) AS BIGINT)
             AS supplier_cnt
    FROM ps JOIN part ON partkey = p_partkey
    WHERE p_size IN (1, 14, 23, 45)
      AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def rel_supplier_cnt_by_part(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct part-supplier relation (derived from
    lineitem — the schema has no partsupp), NOT-IN exclusion of
    negative-balance suppliers (plans as a broadcast anti-join), count
    DISTINCT suppliers per (brand, size)."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").where(F.col("p_size").isin(1, 14, 23, 45))
    bad = t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    return (
        ps.join(bad, ps.suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("partkey") == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("suppkey").alias("supplier_cnt"))
    )


@q(
    "rel_waiting_supplier",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def rel_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: the hard correlated EXISTS + NOT-EXISTS pair — the
    last shipper holding up a multi-supplier finished order.  EXISTS plans
    as a left-semi join on the order key, NOT EXISTS as a left-anti join
    with the extra non-equi shipdate conjunct; both correlate only on
    l_orderkey so the shuffles stay key-local."""
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    o = t(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    sem = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    anti = sem.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        anti.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@q(
    "stream_erc20_tail",
    f"""
    SELECT erc20_token,
           printf('%.6e', sum(erc20_value)) AS total_value,
           CAST(count(*) AS BIGINT) AS n_transfers
    FROM read_parquet('{ETH}/erc20.parquet')
    GROUP BY erc20_token
    """,
)
def stream_erc20_tail(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming ERC-20 transfer tail: readStream over the chain source
    with table=erc20 — each micro-batch is ONE filtered eth_getLogs per
    block range (the bulk path, no block bodies, no receipts), decoded by
    the same per-log rules as the batch scan.  Aggregated per token; must
    equal the golden batch aggregation exactly (%.6e canonicalization
    absorbs fp summation order, as in eth_erc20_movement).  r11: graded
    as THREE rate-limited micro-batches (drain_runs=3 x 800 blocks) under
    the incremental-batch schedule — each availableNow run is one bulk
    getLogs + a state-store resume from the shared checkpoint."""
    import shutil
    import tempfile
    import uuid

    from presto_ethereum_spark.streaming.chain import EthereumStreamDataSource

    spark.dataSource.register(EthereumStreamDataSource)
    stream = (
        spark.readStream.format("ethereum-stream")
        .option("path", str(ETH / "chain_blocks.parquet"))
        .option("table", "erc20")
        .option("max_blocks_per_batch", 800)
        .load()
    )
    agg = stream.groupBy("erc20_token").agg(
        F.format_string("%.6e", F.sum("erc20_value")).alias("total_value"),
        F.count("*").alias("n_transfers"),
    )
    chk = tempfile.mkdtemp(prefix="erc20_tail_chk_")
    try:
        out = None
        for i in range(3):
            # one sink per drain; keep the last non-empty settled table
            # (an exhausted-source drain fires zero triggers and would
            # otherwise clobber the state with its empty view) — the
            # run_chain_gas_buckets drain discipline
            sink = f"stream_erc20_{uuid.uuid4().hex[:8]}_{i}"
            q_ = (
                agg.writeStream.format("memory")
                .queryName(sink)
                .outputMode("complete")
                .trigger(availableNow=True)
                .option("checkpointLocation", chk)
                .start()
            )
            q_.awaitTermination()
            cur = spark.table(sink).localCheckpoint(eager=True)
            spark.catalog.dropTempView(sink)
            if cur.take(1):
                out = cur
        if out is None:
            # all drains settled empty (empty/exhausted source): hand back
            # an empty frame with the agg schema, not None — the
            # run_chain_gas_buckets fallback discipline
            out = spark.createDataFrame([], agg.schema)
        return out
    finally:
        shutil.rmtree(chk, ignore_errors=True)


@q("doc_bpe_train", None)
def doc_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    """Iterative BPE merge-rule training (operators/text.bpe_train): 6
    rounds of weighted pair counting + argmax + merge fold over the
    word-distinct table.  Rows-only in the driver gate (an N-round
    iterative trainer has no reasonable single-SQL oracle — same category
    as emb_mmr_rerank); the merge sequence is pinned EXACTLY against a
    pure-Python Sennrich reference in tests/test_operators.py
    (TestBpeTrain), including tie-breaks and non-overlapping merge
    semantics."""
    from presto_ethereum_spark.operators.text import bpe_train

    return bpe_train(t_spread(spark, sf, "documents"), n_merges=6)


@q("doc_bpe_tokenize", None)
def doc_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Train-then-apply tokenizer round trip (operators/text.bpe_train +
    bpe_apply): learn 6 merge rules from the corpus, segment every document
    with them, report per-doc word/subword counts.  Rows-only (iterative
    trainer + rank-priority inference have no single-SQL oracle); both
    halves are pinned exactly against pure-Python references in
    tests/test_operators.py (TestBpeTrain / TestBpeApply)."""
    from presto_ethereum_spark.operators.text import bpe_apply, bpe_train

    d = t_spread(spark, sf, "documents")
    return bpe_apply(d, bpe_train(d, n_merges=6))


@q(
    "doc_k_anonymity",
    """
    SELECT lang, source, CAST(count(*) AS BIGINT) AS class_size,
           count(*) >= 25 AS k_anonymous
    FROM documents GROUP BY lang, source
    """,
)
def doc_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit (operators/text.k_anonymity) over the (lang,
    source) quasi-identifier pair — the privacy release gate next to
    mask_pii: classes below the threshold need suppression or
    generalization before the corpus ships."""
    from presto_ethereum_spark.operators.text import k_anonymity

    return k_anonymity(t_spread(spark, sf, "documents"), ["lang", "source"], k=25)


@q("emb_ivf_materialized_serve", battery_oracle("emb_ivf_topk"))
def emb_ivf_materialized_serve(spark: SparkSession, sf: str) -> DataFrame:
    """ANN served from a MATERIALIZED cell-partitioned IVF index
    (operators/similarity.ivf_topk_from_index): the _ivf_corpus_index
    table written partitionBy(cell) and read back, probed cells applied as
    a literal filter so parquet partition pruning bounds serving I/O at
    nprobe/n_cells of the index — the deployment shape of IVF at scale.
    Shares emb_ivf_topk's oracle verbatim: the fused in-kernel path and
    the materialized path must produce identical results."""
    import shutil
    import tempfile

    from presto_ethereum_spark.operators.similarity import (
        _ivf_corpus_index,
        ivf_topk_from_index,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    idx_dir = tempfile.mkdtemp(prefix="ivf_index_")
    _ivf_corpus_index(e, cents, "vec_id", "embedding").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(idx_dir)
    out = ivf_topk_from_index(
        spark.read.parquet(idx_dir),
        e.where(F.col("vec_id") < 5),
        cents,
        nprobe=2,
        k=10,
    ).localCheckpoint(eager=True)
    shutil.rmtree(idx_dir, ignore_errors=True)
    return out


def _duck_e2e_pipeline_oracle() -> str:
    """The full curation pipeline closed-form in SQL: quality scoring ->
    threshold filter -> exact dedup keep-first -> deterministic split ->
    per-split stats with integer-exact aggregates."""
    from presto_ethereum_spark.operators.text import EN_STOPWORDS

    bucket = _DUCK_BUCKET.format(salt="e2e", key="doc_id", buckets=100)
    return f"""
    WITH base AS (
      SELECT doc_id, text,
             string_split(lower(text), ' ') AS toks_l,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tok,
             length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(replace(text, ' ', '')) AS n_nospace
      FROM documents),
    scored AS (
      SELECT doc_id, text, n_tok,
             0.35 * least(n_chars / 500.0, 1.0)
                 + 0.25 * (CASE WHEN n_nospace / greatest(n_tok, 1) >= 3
                                 AND n_nospace / greatest(n_tok, 1) <= 10
                            THEN 1.0 ELSE 0.3 END)
                 + 0.2 * least(len(list_filter(toks_l,
                       t -> list_contains({_sql_list(EN_STOPWORDS)}, t)))
                       / greatest(n_tok, 1) * 4, 1.0)
                 + 0.2 * (1 - least((n_punct / greatest(n_chars, 1)
                                     + n_digit / greatest(n_chars, 1)) * 3,
                                    1.0)) AS quality
      FROM base),
    kept AS (SELECT * FROM scored WHERE quality >= 0.5),
    dd AS (
      SELECT * FROM (
        SELECT doc_id, text, n_tok, quality,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM kept) WHERE rn = 1),
    sp AS (
      SELECT CASE WHEN b < 90 THEN 'train'
                  WHEN b < 95 THEN 'val'
                  ELSE 'test' END AS split,
             n_tok, quality
      FROM (SELECT *, {bucket} AS b FROM dd))
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_quality_e6
    FROM sp GROUP BY split
    """


@q("doc_e2e_pipeline", _duck_e2e_pipeline_oracle())
def doc_e2e_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The operators COMPOSED as a real curation pipeline: quality filter
    (threshold 0.5) -> exact dedup keeping the lowest doc_id per content
    hash -> deterministic 90/5/5 split -> per-split doc/token/quality
    stats.  Every stage is an already-graded operator; this entry grades
    that they compose without seams (the whole pipeline is one Catalyst
    plan — filter and dedup run before the split ever shuffles, and the
    quality sum is integer-exact so the aggregate survives any
    partitioning)."""
    from presto_ethereum_spark.operators import text as T
    from presto_ethereum_spark.operators.sampling import split_assign

    d = t_spread(spark, sf, "documents")
    scored = d.select(
        "doc_id", "text", T.quality_score(F.col("text")).alias("quality")
    )
    kept = scored.where(F.col("quality") >= 0.5)
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    )
    sp = split_assign(deduped, "doc_id", salt="e2e")
    return sp.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.token_count_ws(F.col("text"))).alias("n_tokens"),
        F.sum(F.round(F.col("quality") * 1000000).cast("long")).alias(
            "sum_quality_e6"
        ),
    )


@q(
    "rel_ohlc_bars",
    """
    WITH ev AS (
      SELECT epoch_us(ts) // 3600000000 AS bar,
             epoch_us(ts) AS t, event_id, value
      FROM events),
    r AS (
      SELECT bar, value,
             row_number() OVER (PARTITION BY bar
                                ORDER BY t, event_id) AS rn_a,
             row_number() OVER (PARTITION BY bar
                                ORDER BY t DESC, event_id DESC) AS rn_d
      FROM ev)
    SELECT CAST(bar AS BIGINT) AS bar,
           CAST(count(*) AS BIGINT) AS n_events,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close
    FROM r GROUP BY bar
    """,
)
def rel_ohlc_bars(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly OHLC bar rollup over the event stream — the time-series
    downsampling every chain/market monitor runs.  Open/close are
    DETERMINISTIC firsts/lasts: Spark's min_by/first are tie-unstable
    under partitioning, so both ends resolve via a (t, event_id)-ordered
    row_number + conditional aggregate — one window shuffle on the bar,
    one aggregate, same plan both engines."""
    # ts is epoch-NANOS long (t() normalizes); derive micros like every
    # other events query
    ev = t_spread(spark, sf, "events").select(
        F.expr("(ts DIV 1000) DIV 3600000000").alias("bar"),
        F.expr("ts DIV 1000").alias("t"),
        "event_id",
        "value",
    )
    wa = Window.partitionBy("bar").orderBy("t", "event_id")
    wd = Window.partitionBy("bar").orderBy(F.col("t").desc(), F.col("event_id").desc())
    r = ev.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return r.groupBy("bar").agg(
        F.count("*").alias("n_events"),
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
    )


_ASOF_TOL_US = 90 * 24 * 3600 * 1_000_000  # 90 days


@q(
    "rel_asof_tolerance",
    f"""
    WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
    ord AS (
      SELECT o_custkey, epoch_us(o_orderdate) AS o_us, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1),
    j AS (
      SELECT ev.event_id, ev.user_id, ev.t_us,
             ord.o_us, ord.o_orderkey, ord.o_totalprice
      FROM ev ASOF LEFT JOIN ord
      ON ev.user_id = ord.o_custkey AND ev.t_us >= ord.o_us)
    SELECT event_id, user_id,
           CASE WHEN t_us - o_us <= {_ASOF_TOL_US} THEN o_us END AS asof_o_us,
           CASE WHEN t_us - o_us <= {_ASOF_TOL_US} THEN o_orderkey END
             AS asof_o_orderkey,
           CASE WHEN t_us - o_us <= {_ASOF_TOL_US} THEN o_totalprice END
             AS asof_o_totalprice
    FROM j
    """,
)
def rel_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join with a 90-day staleness bound (pandas merge_asof
    tolerance semantics): an order older than the window never silently
    attaches to an event.  One comparison on the carried match — no extra
    shuffle over the plain as-of."""
    from presto_ethereum_spark.operators.temporal import asof_join

    ev = t(spark, sf, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    ord_ = (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "o_custkey",
            (F.unix_timestamp("o_orderdate") * 1_000_000).alias("o_us"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    return asof_join(
        ev,
        ord_,
        on_left="user_id",
        left_time="t_us",
        right_time="o_us",
        on_right="o_custkey",
        tolerance=_ASOF_TOL_US,
    ).select(
        "event_id", "user_id", "asof_o_us", "asof_o_orderkey", "asof_o_totalprice"
    )


def _duck_pagerank_weighted_oracle() -> str:
    """3 unrolled weighted-PageRank iterations: integer (w, W) multiplicity
    ratios inside the same 1e15 fixed-point quantization, expression order
    ``floor(rank * w / W * S)`` matching pagerank_weighted exactly."""
    S = "1000000000000000.0"
    it = """
    s{k} AS (
      SELECT e.dst AS addr,
             sum(CAST(floor(r.rank * e.w / e.tw * {S}) AS BIGINT)) AS s
      FROM r{p} r JOIN edges e ON e.src = r.addr
      GROUP BY e.dst),
    r{k} AS (
      SELECT n0.addr,
             (CAST(1.0 AS DOUBLE) - 0.85) / t.n
               + 0.85 * (CAST(coalesce(s.s, 0) AS DOUBLE) / {S}) AS rank
      FROM nodes n0 LEFT JOIN s{k} s ON s.addr = n0.addr, tot t)"""
    steps = ",".join(it.format(k=k, p=k - 1, S=S) for k in (1, 2, 3))
    return f"""
    WITH tx AS (SELECT * FROM read_parquet('{ETH}/transaction.parquet')),
    mult AS (SELECT tx_from AS src, tx_to AS dst, count(*) AS w
             FROM tx WHERE tx_to IS NOT NULL GROUP BY tx_from, tx_to),
    edges AS (SELECT src, dst, w,
                     CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS tw
              FROM mult),
    nodes AS (SELECT src AS addr FROM edges UNION SELECT dst FROM edges),
    tot AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT addr, 1.0 / t.n AS rank FROM nodes, tot t),
    {steps}
    SELECT addr, rank FROM r3
    """


@q("eth_tx_pagerank_weighted", _duck_pagerank_weighted_oracle())
def eth_tx_pagerank_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Multiplicity-weighted PageRank over the tx transfer graph
    (operators/graph.pagerank_weighted): rank flows proportionally to how
    often each counterparty pair transacts — the token-flow importance
    model the unweighted dedup discards.  Integer weight ratios inside the
    1e15 fixed point keep the differential bit-exact."""
    from presto_ethereum_spark.operators.graph import pagerank_weighted

    tx = _eth_tables(spark).table("transaction")
    edges = tx.where(F.col("tx_to").isNotNull()).select(
        F.col("tx_from").alias("src"), F.col("tx_to").alias("dst")
    )
    return pagerank_weighted(edges, iterations=3, damping=0.85, cache=True)


def _duck_hits_oracle(iters: int = 2) -> str:
    """Unrolled HITS with fixed-point quantized sums and integer-total L1
    normalization — expression-for-expression operators/graph.hits."""
    S = "1000000000000000.0"
    steps = []
    prev_h = "h0"
    for k in range(1, iters + 1):
        steps.append(f"""
    a{k}s AS (
      SELECT e.dst AS addr,
             sum(CAST(floor(h.h * {S}) AS DECIMAL(38,0))) AS ai
      FROM {prev_h} h JOIN edges e ON e.src = h.addr GROUP BY e.dst),
    a{k}t AS (SELECT CAST(sum(ai) AS DECIMAL(38,0)) AS at FROM a{k}s),
    a{k} AS (SELECT addr, CAST(ai AS DOUBLE) / CAST(at AS DOUBLE) AS a
             FROM a{k}s, a{k}t),
    h{k}s AS (
      SELECT e.src AS addr,
             sum(CAST(floor(a.a * {S}) AS DECIMAL(38,0))) AS hi
      FROM a{k} a JOIN edges e ON e.dst = a.addr GROUP BY e.src),
    h{k}t AS (SELECT CAST(sum(hi) AS DECIMAL(38,0)) AS ht FROM h{k}s),
    h{k} AS (SELECT addr, CAST(hi AS DOUBLE) / CAST(ht AS DOUBLE) AS h
             FROM h{k}s, h{k}t)""")
        prev_h = f"h{k}"
    return f"""
    WITH tx AS (SELECT * FROM read_parquet('{ETH}/transaction.parquet')),
    edges AS (SELECT DISTINCT tx_from AS src, tx_to AS dst
              FROM tx WHERE tx_to IS NOT NULL),
    nodes AS (SELECT src AS addr FROM edges UNION SELECT dst FROM edges),
    h0 AS (SELECT addr, CAST(1.0 AS DOUBLE) AS h FROM nodes),
    {",".join(steps)}
    SELECT n.addr, coalesce(h{iters}.h, 0.0) AS hub,
           coalesce(a{iters}.a, 0.0) AS auth
    FROM nodes n
    LEFT JOIN h{iters} ON h{iters}.addr = n.addr
    LEFT JOIN a{iters} ON a{iters}.addr = n.addr
    """


@q("eth_tx_hits", _duck_hits_oracle(2))
def eth_tx_hits(spark: SparkSession, sf: str) -> DataFrame:
    """HITS hubs/authorities over the tx transfer graph
    (operators/graph.hits, 2 iterations): distributors vs collectors —
    the complementary importance decomposition to PageRank, with the same
    fixed-point + integer-normalizer exactness discipline."""
    from presto_ethereum_spark.operators.graph import hits

    tx = _eth_tables(spark).table("transaction")
    edges = tx.where(F.col("tx_to").isNotNull()).select(
        F.col("tx_from").alias("src"), F.col("tx_to").alias("dst")
    )
    return hits(edges, iterations=2, cache=True)


@q(
    "rel_pivot_orders",
    """
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS urgent,
           CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
                AS BIGINT) AS high,
           CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)
                AS BIGINT) AS medium,
           CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)
                AS BIGINT) AS unspecified,
           CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
                AS BIGINT) AS low
    FROM orders GROUP BY o_orderstatus
    """,
)
def rel_pivot_orders(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT: priority counts spread to columns per order status.  The
    value list is EXPLICIT (never inferred), so the plan is a single
    partial-aggregated pass — no distinct-values pre-query, stable schema
    at any scale; the oracle is the equivalent conditional aggregation."""
    o = t(spark, sf, "orders")
    names = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "unspecified",
        "5-LOW": "low",
    }
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(names))
        .count()
    )
    out = piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(n) for v, n in names.items()],
    )
    return out


@q(
    "rel_unpivot_metrics",
    """
    WITH m AS (
      SELECT 'quantity' AS metric, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'discount', l_discount FROM lineitem)
    SELECT metric, CAST(count(*) AS BIGINT) AS n,
           round(min(v), 6) AS lo, round(max(v), 6) AS hi
    FROM m GROUP BY metric
    """,
)
def rel_unpivot_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (melt): three lineitem measures to (metric, value) rows,
    aggregated per metric.  Spark's unpivot is a zero-shuffle row
    expansion (the stack expression); min/max aggregates avoid fp-sum
    ordering entirely."""
    li = t(spark, sf, "lineitem")
    m = li.unpivot(
        [],
        [
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").cast("double").alias("extendedprice"),
            F.col("l_discount").cast("double").alias("discount"),
        ],
        "metric",
        "v",
    )
    return m.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.round(F.min("v"), 6).alias("lo"),
        F.round(F.max("v"), 6).alias("hi"),
    )


@q(
    "doc_cms_token_counts",
    """
    WITH tok AS (
      SELECT t.tok FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
      WHERE t.tok <> ''),
    rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
    cells AS (
      SELECT r.row,
             CAST(('0x' || substring(md5('cms' || r.row || ':' || tok), 1, 8))
                  AS UBIGINT) % 512 AS col,
             count(*) AS cnt
      FROM tok, rows_ r GROUP BY r.row, col),
    top AS (
      SELECT tok AS key, CAST(count(*) AS BIGINT) AS exact
      FROM tok GROUP BY tok ORDER BY exact DESC, key LIMIT 20),
    addr AS (
      SELECT t.key, t.exact, r.row,
             CAST(('0x' || substring(md5('cms' || r.row || ':' || t.key), 1, 8))
                  AS UBIGINT) % 512 AS col
      FROM top t, rows_ r)
    SELECT a.key, a.exact,
           CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est,
           min(coalesce(c.cnt, 0)) >= a.exact AS never_undercounts
    FROM addr a LEFT JOIN cells c ON c.row = a.row AND c.col = a.col
    GROUP BY a.key, a.exact
    """,
)
def doc_cms_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch over the corpus token stream
    (operators/frequency.count_min_sketch, 4x512 md5-derived cells):
    point-estimates for the top-20 exact tokens, with the never-undercount
    invariant carried as a graded column.  The sketch is deterministic (no
    RNG), so an APPROXIMATE summary is exactly reproduced by the SQL
    oracle — including its overcounts."""
    from presto_ethereum_spark.operators.frequency import (
        cms_estimate,
        count_min_sketch,
    )
    from presto_ethereum_spark.operators.text import tokens

    d = t_spread(spark, sf, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("tok")).where(
        F.col("tok") != ""
    )
    sketch = count_min_sketch(tok, "tok", width=512, depth=4)
    top = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("exact"))
        .orderBy(F.col("exact").desc(), "tok")
        .limit(20)
    )
    est = cms_estimate(sketch, top, "tok", width=512, depth=4)
    return (
        top.withColumnRenamed("tok", "key")
        .join(est, "key")
        .select(
            "key",
            "exact",
            "est",
            (F.col("est") >= F.col("exact")).alias("never_undercounts"),
        )
    )


@q(
    "rel_bloom_prefilter",
    """
    WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
    seeds AS (SELECT unnest([0, 1, 2, 3, 4]) AS s),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substring(md5('bf' || s || ':'
                  || CAST(s_suppkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 4096
               AS bit
      FROM bad, seeds),
    probes AS (SELECT DISTINCT l_suppkey AS key FROM lineitem),
    addr AS (
      SELECT p.key, sd.s,
             CAST(('0x' || substring(md5('bf' || sd.s || ':'
                  || CAST(p.key AS VARCHAR)), 1, 8)) AS UBIGINT) % 4096
               AS bit
      FROM probes p, seeds sd),
    mc AS (
      SELECT a.key, count(b.bit) = 5 AS might_contain
      FROM addr a LEFT JOIN bits b ON b.bit = a.bit
      GROUP BY a.key)
    SELECT mc.might_contain,
           (mc.key IN (SELECT s_suppkey FROM bad)) AS actually_in,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM mc GROUP BY mc.might_contain, actually_in
    """,
)
def rel_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter join prefilter (operators/frequency.bloom_bits):
    membership summary of the negative-balance suppliers probed by every
    distinct lineitem suppkey, graded as the (might_contain, actually_in)
    contingency — the oracle reproduces the exact bit pattern, and the
    absent (false, true) cell IS the no-false-negatives guarantee.  At
    scale the m-bit table broadcasts where the raw key set cannot."""
    from presto_ethereum_spark.operators.frequency import (
        bloom_bits,
        bloom_might_contain,
    )

    bad = t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    bits = bloom_bits(bad, "s_suppkey", m_bits=4096, k_hashes=5)
    probes = t(spark, sf, "lineitem").select(
        F.col("l_suppkey").alias("key")
    ).distinct()
    mc = bloom_might_contain(bits, probes, "key", m_bits=4096, k_hashes=5)
    return (
        mc.join(
            bad.withColumn("actually_in", F.lit(True)),
            mc["key"] == bad["s_suppkey"],
            "left",
        )
        .select(
            "might_contain",
            F.coalesce(F.col("actually_in"), F.lit(False)).alias("actually_in"),
        )
        .groupBy("might_contain", "actually_in")
        .agg(F.count("*").alias("n_keys"))
    )


def _duck_langid_confusion_oracle() -> str:
    from presto_ethereum_spark.operators.text import LANG_PROFILES

    score_cols = ",\n             ".join(
        f"len(list_filter(toks_l, t -> list_contains({_sql_list(w)}, t))) AS s_{lg}"
        for lg, w in LANG_PROFILES.items()
    )
    langs = list(LANG_PROFILES)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN s_{lg} = best AND best > 0 THEN '{lg}'" for lg in langs)
        + " ELSE 'und' END"
    )
    return f"""
    WITH base AS (
      SELECT lang, string_split(lower(text), ' ') AS toks_l FROM documents),
    sc AS (
      SELECT lang,
             {score_cols}
      FROM base),
    p AS (SELECT lang, {best} AS best,
                 {", ".join("s_" + lg for lg in langs)} FROM sc)
    SELECT lang AS true_lang, {case} AS pred_lang,
           CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY true_lang, pred_lang
    """


@q("doc_langid_confusion", _duck_langid_confusion_oracle())
def doc_langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID EVALUATION: confusion matrix of the stopword-profile
    classifier (operators/text.lang_id) against the corpus ground-truth
    labels — the measure-your-classifier step a pipeline runs before
    trusting a filter, as a graded query (one aggregation over two
    map-side expressions)."""
    from presto_ethereum_spark.operators.text import lang_id

    d = t(spark, sf, "documents")
    return (
        d.select(
            F.col("lang").alias("true_lang"),
            lang_id(F.col("text")).alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


@q(
    "doc_chunks_udtf",
    """
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    idx AS (
      SELECT doc_id, text, L,
             unnest(generate_series(0,
                 CASE WHEN L <= 200 THEN 0
                      ELSE CAST(ceil((L - 200) / 180.0) AS INT) END)) AS cid
      FROM d WHERE L > 0)
    SELECT doc_id, CAST(cid AS INT) AS chunk_id,
           substring(text, cid * 180 + 1, 200) AS chunk
    FROM idx
    """,
)
def doc_chunks_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """RAG chunking through the SQL TABLE-FUNCTION surface
    (functions/udtfs.ChunksUdtf, Spark 4 Python UDTF + LATERAL): the
    ergonomics a SQL user expects, graded against the closed-form window
    arithmetic.  Row-at-a-time Python by design — the bulk path stays the
    expression pipeline (doc_chunk_windows); this grades the API surface."""
    from presto_ethereum_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    t(spark, sf, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk
        FROM _udtf_docs d, LATERAL chunks(d.text, 200, 20) c
        """
    )


@q(
    "rel_gap_fill",
    """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id, value
      FROM events WHERE user_id < 50),
    dedup AS (
      SELECT user_id, t_us, value FROM (
        SELECT user_id, t_us, value,
               row_number() OVER (PARTITION BY user_id, t_us
                                  ORDER BY event_id DESC) AS rn
        FROM ev) WHERE rn = 1),
    b AS (
      SELECT user_id,
             min(t_us) // 3600000000 AS h_lo,
             max(t_us) // 3600000000 AS h_hi
      FROM ev GROUP BY user_id),
    grid AS (
      SELECT user_id, CAST(h AS BIGINT) AS hour,
             CAST(h AS BIGINT) * 3600000000 + 3599999999 AS probe_us
      FROM b, unnest(generate_series(h_lo, h_hi)) AS s(h)),
    j AS (
      SELECT g.user_id, g.hour, d.value AS filled_value
      FROM grid g ASOF LEFT JOIN dedup d
      ON g.user_id = d.user_id AND g.probe_us >= d.t_us)
    SELECT user_id, hour, filled_value FROM j
    """,
)
def rel_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar GAP FILL with forward-fill: every user gets a dense hourly
    grid between their first and last event, each slot carrying the most
    recent observed value at or before the hour's end — the
    state-reconstruction rollup dashboards need where raw events are
    sparse.  Pure composition: bounds agg -> sequence explode (the grid
    never materializes wider than its rows) -> the graded as-of join.
    Right side deduped per (user, t) by latest event_id so the carried
    value is fully determined."""
    from presto_ethereum_spark.operators.temporal import asof_join

    ev = (
        t(spark, sf, "events")
        .where(F.col("user_id") < 50)
        .select("user_id", F.expr("ts DIV 1000").alias("t_us"), "event_id", "value")
    )
    w = Window.partitionBy("user_id", "t_us").orderBy(F.col("event_id").desc())
    dedup = (
        ev.withColumn("rn", F.row_number().over(w)).where("rn = 1")
        .select("user_id", "t_us", "value")
    )
    grid = (
        ev.groupBy("user_id")
        .agg(
            (F.min("t_us") / F.lit(3600000000)).cast("long").alias("h_lo"),
            (F.max("t_us") / F.lit(3600000000)).cast("long").alias("h_hi"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("h_lo", "h_hi")).alias("hour"),
        )
        .withColumn("probe_us", F.col("hour") * F.lit(3600000000) + F.lit(3599999999))
    )
    return asof_join(
        grid,
        dedup,
        on_left="user_id",
        left_time="probe_us",
        right_time="t_us",
        right_value_cols=["value"],
    ).select(
        "user_id", "hour", F.col("asof_value").alias("filled_value")
    )


@q(
    "rel_top_supplier_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def rel_top_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: windowed revenue per supplier with a scalar
    max-subquery selection (every supplier tying the max survives — the
    Q15 view semantics).  DECIMAL sums make 'equal to the max' exact
    under any partitioning, which is the whole trick: a double sum would
    make the equality nondeterministic."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.suppkey)
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@q(
    "rel_excess_quantity_suppliers",
    """
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(l_quantity) AS DOUBLE) AS sq
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    pt AS (
      SELECT l_partkey, CAST(sum(l_quantity) AS DOUBLE) AS tq
      FROM lineitem GROUP BY l_partkey)
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dominated_parts
    FROM pq JOIN pt USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE sq > 0.5 * tq
    GROUP BY s_suppkey, s_name
    """,
)
def rel_excess_quantity_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: per-(part, supplier) quantity vs a correlated
    per-part total — suppliers DOMINATING a part's supply (> half its
    shipped quantity).  Decorrelated as two aggregations joined on the
    part key; quantities are small integers so the double sums are exact
    and the > comparison is safe."""
    li = t(spark, sf, "lineitem")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("double").alias("sq")
    )
    pt = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").cast("double").alias("tq")
    )
    s = t(spark, sf, "supplier")
    return (
        pq.join(pt, "l_partkey")
        .where(F.col("sq") > 0.5 * F.col("tq"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_dominated_parts"))
    )


@q(
    "rel_market_share",
    """
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN part ON l_partkey = p_partkey
      WHERE r_name = 'ASIA' AND p_type LIKE '%STAND%')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def rel_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — an 8-table join (fact +
    seven broadcast dims, nation joined TWICE under different roles) with
    a conditional-aggregation ratio per order year.  Both sums are exact
    DECIMAL; only the final share divides as double (rounded), so the
    ratio is partition-order-free."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    cn = t(spark, sf, "nation").alias("cn")
    r = t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    s = t(spark, sf, "supplier")
    sn = t(spark, sf, "nation").alias("sn")
    p = t(spark, sf, "part").where(F.col("p_type").like("%STAND%"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == F.col("cn.n_nationkey"))
        .join(r, F.col("cn.n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("sn.n_nationkey"))
        .join(p, li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("vol"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("vol").cast("double"),
            6,
        ).alias("mkt_share")
    )


@q(
    "stream_trending_topk",
    """
    WITH c AS (
      SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
             event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
               AS avg_value
      FROM events GROUP BY window_start, event_type)
    SELECT window_start, event_type, n, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n DESC, event_type) AS rank
      FROM c) WHERE rank <= 3
    """,
)
def stream_trending_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-window trending leaderboard over the STREAMING windowed counts
    (streaming/events.run_trending_topk): tumbling event-time windows
    drain availableNow, then each window's top-3 event types rank
    deterministically — the settled stream must equal the batch windowed
    rank exactly."""
    from presto_ethereum_spark.streaming.events import run_trending_topk

    return run_trending_topk(spark, sf, window="1 hour", k=3).select(
        "window_start", "event_type", "n", F.col("rank").cast("int").alias("rank")
    )


@q(
    "rel_skew_report",
    """
    WITH c AS (SELECT CAST(o_custkey AS VARCHAR) AS k, count(*) AS freq
               FROM orders GROUP BY o_custkey),
    t AS (SELECT CAST(sum(freq) AS BIGINT) AS n_rows,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(max(freq) AS BIGINT) AS max_freq FROM c),
    tk AS (SELECT list(k ORDER BY freq DESC, k) AS top_keys
           FROM (SELECT k, freq FROM c ORDER BY freq DESC, k LIMIT 5))
    SELECT n_rows, n_keys, max_freq,
           (100 * n_rows) // n_keys AS avg_freq_x100,
           (100 * max_freq * n_keys) // n_rows AS skew_factor_x100,
           top_keys
    FROM t, tk
    """,
)
def rel_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    """Key-skew diagnosis for the orders-per-customer key
    (operators/skew.skew_report): the measurement that justifies (or
    rules out) salting — one row of exact integer ratios plus the top
    offender keys."""
    from presto_ethereum_spark.operators.skew import skew_report

    return skew_report(t(spark, sf, "orders"), "o_custkey", top_k=5)


@q(
    "eth_gas_anomalies",
    f"""
    WITH b AS (
      SELECT block_number, CAST(block_gasused AS BIGINT) AS g,
             block_number // 200 AS bucket
      FROM read_parquet('{ETH}/block.parquet')),
    m AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS s,
             CAST(sum(g * g) AS BIGINT) AS ss
      FROM b GROUP BY bucket)
    , v AS (
      SELECT bucket, n, s,
             CAST(ss AS DOUBLE) / n
               - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) AS var
      FROM m)
    SELECT b.block_number, b.g AS gas_used,
           round((b.g - CAST(v.s AS DOUBLE) / v.n) / sqrt(v.var), 4) AS z
    FROM b JOIN v USING (bucket)
    WHERE v.var > 0
      AND abs((b.g - CAST(v.s AS DOUBLE) / v.n) / sqrt(v.var)) > 2.0
    """,
)
def eth_gas_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    """Gas-usage anomaly detection: z-score of each block's gas against
    its 200-block segment, anomalies = |z| > 2 — chain-telemetry
    monitoring as a graded query.  Moments come from EXACT integer sums
    (gas values are integral; sum and sum-of-squares as BIGINT are
    partition-order-free), so the derived doubles — and the > 2 cut —
    are deterministic; segmentation keeps the window partitioned (no
    global-order window at chain scale)."""
    b = (
        _eth_tables(spark)
        .table("block")
        .select(
            "block_number",
            F.col("block_gasused").cast("long").alias("g"),
            F.expr("block_number DIV 200").alias("bucket"),
        )
    )
    m = b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("ss").cast("double") / F.col("n") - mean * mean
    # a zero-variance segment (constant gas) has no anomalies by
    # definition — and its divisor would be 0 under ANSI arithmetic
    z = F.when(var > 0, (F.col("g") - mean) / F.sqrt(var))
    return (
        b.join(m, "bucket")
        .where(F.abs(z) > 2.0)
        .select(
            "block_number",
            F.col("g").alias("gas_used"),
            F.round(z, 4).alias("z"),
        )
    )


@q(
    "doc_distribution_drift",
    """
    WITH tok AS (
      SELECT source AS sl, t.tok FROM (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents) t(source, tok)
      WHERE t.tok <> ''),
    counts AS (SELECT sl, tok, CAST(count(*) AS BIGINT) AS c
               FROM tok GROUP BY sl, tok),
    totals AS (SELECT sl, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY sl),
    basec AS (SELECT tok, c AS bc FROM counts WHERE sl = 'src0'),
    bn_ AS (SELECT n AS bn FROM totals WHERE sl = 'src0'),
    other AS (SELECT * FROM counts WHERE sl <> 'src0'),
    present AS (
      SELECT o.sl, t.n,
             sum(abs(CAST(o.c AS DECIMAL(38,0)) * CAST(b.bn AS DECIMAL(38,0))
                     - CAST(coalesce(bc.bc, 0) AS DECIMAL(38,0))
                       * CAST(t.n AS DECIMAL(38,0)))) AS num_present
      FROM other o
      LEFT JOIN basec bc USING (tok)
      JOIN totals t ON t.sl = o.sl, bn_ b
      GROUP BY o.sl, t.n),
    shared AS (
      SELECT o.sl, CAST(sum(bc.bc) AS BIGINT) AS shared_bc
      FROM other o JOIN basec bc USING (tok) GROUP BY o.sl)
    SELECT p.sl AS slice, p.n AS n_tokens,
           CAST((CAST(p.num_present
                 + (CAST(b.bn AS DECIMAL(38,0))
                    - CAST(coalesce(s.shared_bc, 0) AS DECIMAL(38,0)))
                   * CAST(p.n AS DECIMAL(38,0)) AS HUGEINT)
            * 1000000) // (2 * CAST(p.n AS HUGEINT) * b.bn) AS BIGINT) AS tv_e6
    FROM present p LEFT JOIN shared s ON s.sl = p.sl, bn_ b
    """,
)
def doc_distribution_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Token-distribution drift of every source against 'src0' as
    total-variation distance (operators/text.distribution_drift): the
    new-crawl distribution-shift monitor, exactly integer (cross-product
    numerator over exact totals, DECIMAL(38,0) against web-scale
    overflow) so an approximate-sounding statistic is bit-gradeable."""
    from presto_ethereum_spark.operators.text import distribution_drift

    return distribution_drift(t_spread(spark, sf, "documents"), "source", "src0")


@q(
    "doc_containment_pairs",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_JACCARD_IPAIRS}
    SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
           CAST((2 * inter * 1000000 + sz_a) // (2 * sz_a) AS DOUBLE)
             / 1000000 AS cont_a,
           CAST((2 * inter * 1000000 + sz_b) // (2 * sz_b) AS DOUBLE)
             / 1000000 AS cont_b
    FROM ipairs
    WHERE inter::DOUBLE / sz_a >= 0.6 OR inter::DOUBLE / sz_b >= 0.6
    """,
)
def doc_containment_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric shingle-containment pairs at threshold 0.6 within
    language blocks (operators/dedup.containment_pairs): catches subset
    duplication — a document quoted verbatim inside a much larger one has
    near-zero Jaccard but containment ~1.0, the signal CC-style pipelines
    use to drop embedded copies.  Same inverted-index exchange as the
    jaccard family (shingle+ids, never text), but posting lists are
    df-capped at max_df=8 (CCNet trade, SCALE.md §dedup): join work is
    bounded by max_df x total postings — LINEAR in corpus size — instead
    of the unbounded Sum df² a boilerplate shingle explodes at crawl
    scale.  The cap actually FIRES at the sf0.1 gate (max df there is 14),
    so the lossy path itself is oracle-verified — the DuckDB twin applies
    the identical cap.  Fractions are round6_ratio integer half-up per
    ROUNDING_AUDIT.md."""
    from presto_ethereum_spark.operators.dedup import containment_pairs

    return containment_pairs(
        t_spread(spark, sf, "documents"),
        threshold=0.6,
        blocking_cols=["lang"],
        max_df=8,
    )


@q(
    "emb_range_search",
    f"""
    WITH p AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < 5)
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round({_duck_cos('p.qvec', 'a.embedding')}, 6) AS sim
    FROM p JOIN embeddings a ON a.vec_id <> p.query_id
    WHERE {_duck_cos('p.qvec', 'a.embedding')} >= 0.18
    """,
)
def emb_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine RANGE retrieval (operators/similarity.range_search):
    all corpus vectors with sim >= 0.18 of each probe (vec_id < 5) — the
    radius mode next to top-k; fixed k either truncates dense
    neighborhoods or pads sparse ones.  Probes broadcast; the corpus
    streams through one map-side scan with the staged-norm cosine fold
    and the threshold filter — ZERO shuffles, no window state.  Cosine is
    irrational-valued so round(double, 6) is the audited-safe display
    (ROUNDING_AUDIT.md)."""
    from presto_ethereum_spark.operators.similarity import range_search

    e = t_spread(spark, sf, "embeddings", parts=8)
    return range_search(
        e, e.where(F.col("vec_id") < 5), threshold=0.18
    )


@q(
    "multimodal_frame_dedup",
    """
    WITH media AS (SELECT doc_id AS media_id, text FROM documents),
    frames AS (
      SELECT media_id, substr(text, CAST(i AS INT) * 64 + 1, 64) AS frame
      FROM (SELECT media_id, text,
                   unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS i
            FROM media WHERE len(text) > 0)),
    freq AS (SELECT frame, count(*) AS n_total FROM frames GROUP BY frame),
    per AS (
      SELECT f.media_id, count(*) AS n_frames,
             CAST(sum(CASE WHEN q.n_total >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_frames
      FROM frames f JOIN freq q USING (frame) GROUP BY f.media_id)
    SELECT m.media_id,
           CAST(coalesce(p.n_frames, 0) AS BIGINT) AS n_frames,
           CAST(coalesce(p.n_dup_frames, 0) AS BIGINT) AS n_dup_frames,
           CASE WHEN coalesce(p.n_frames, 0) > 0
                THEN CAST((2 * p.n_dup_frames * 1000000 + p.n_frames)
                          // (2 * p.n_frames) AS DOUBLE) / 1000000
                ELSE 0.0 END AS dup_frac
    FROM media m LEFT JOIN per p USING (media_id)
    """,
)
def multimodal_frame_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-media duplicate-frame statistics (operators/multimodal.
    frame_dedup_stats) — the video analogue of the C4 duplicate-chunk
    filter: fixed-stride byte frames are md5-fingerprinted right after
    the Arrow expansion and ONLY hashes enter the corpus-global frequency
    shuffle (the no-payload-in-the-exchange contract).  Synthetic media
    bytes are ASCII document text, so the oracle replays frames
    closed-form with substr and groups on the frame itself (md5 is
    injective on distinct frames for grading purposes)."""
    from presto_ethereum_spark.operators.multimodal import (
        frame_dedup_stats,
        media_from_documents,
    )

    media = media_from_documents(t_spread(spark, sf, "documents"))
    return frame_dedup_stats(media, every_n_bytes=64)


@q(
    "rel_journey_strings",
    """
    SELECT o_custkey AS custkey,
           count(*) AS n_orders,
           string_agg(o_orderstatus, '>' ORDER BY o_orderdate, o_orderkey)
             AS journey
    FROM orders GROUP BY o_custkey
    """,
)
def rel_journey_strings(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg ... ORDER BY): the
    per-entity event-journey string — feature engineering for churn/funnel
    models and the classic ordered-aggregation gap in naive engines.

    Spark has no ordered string_agg, so the plan collects (date, key,
    status) structs, sorts WITHIN each group's array (struct ordering =
    lexicographic on fields, matching the SQL ORDER BY), projects the
    status field, and joins — the sort is per-group array work after the
    one hash-agg shuffle, not a global sort, and the aggregation state is
    each customer's own orders (bounded fan-in at every SF: TPC-H
    orders/customer is scale-invariant).  A collect_list without the
    sort would be partition-order-dependent — unfit for a distributed
    contract (same rule as rel_array_agg)."""
    o = t(spark, sf, "orders")
    sorted_structs = F.sort_array(
        F.collect_list(
            F.struct("o_orderdate", "o_orderkey", "o_orderstatus")
        )
    )
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders"),
        F.array_join(
            F.transform(sorted_structs, lambda s: s["o_orderstatus"]), ">"
        ).alias("journey"),
    )


@q(
    "emb_knn_join_ivf",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_duck_cos('c.cvec', 'e.embedding')} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, embedding AS qvec, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored WHERE vec_id % 10 = 0) WHERE rnk <= 2
    )
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round({_duck_cos('p.qvec', 'a.embedding')}, 6) AS sim,
           CAST(row_number() OVER (PARTITION BY p.query_id
                                   ORDER BY {_duck_cos('p.qvec', 'a.embedding')} DESC,
                                            a.vec_id) AS INT) AS rank
    FROM probe p JOIN assign a ON a.cid = p.cid AND a.vec_id != p.query_id
    QUALIFY rank <= 5
    """,
)
def emb_knn_join_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed k-NN JOIN via IVF cells (operators/similarity.
    ivf_knn_join): top-5 neighbors for every query in a corpus-sized query
    set — the k-NN-graph primitive behind semantic clustering and
    graph-based dedup, where queries cannot broadcast.  Both sides
    cell-assign map-side off the literal codebook; the only exchange pair
    is the equi-join on cell (candidates ~N·nprobe·N/n_cells, not N²);
    WindowGroupLimit bounds per-query state.  The graded query set is the
    deterministic vec_id %% 10 slice purely to keep the closed-form DuckDB
    replica tractable — the Spark plan is identical for the full corpus
    (the slice is one map-side filter)."""
    from presto_ethereum_spark.operators.similarity import (
        ivf_knn_join,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    return ivf_knn_join(
        e,
        queries=e.where(F.col("vec_id") % 10 == 0),
        centroids=cents,
        nprobe=2,
        k=5,
    )


@q(
    "rel_data_quality_report",
    """
    WITH n AS (SELECT count(*) AS n_rows FROM lineitem),
    checks AS (
      SELECT 'shipdate_not_null' AS rule, 'not_null' AS kind,
             count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS n_violations
      FROM lineitem
      UNION ALL
      SELECT 'quantity_in_1_50', 'range',
             count(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50)
                          OR l_quantity IS NULL THEN 1 END)
      FROM lineitem
      UNION ALL
      SELECT 'discount_in_0_01', 'range',
             count(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.1)
                          OR l_discount IS NULL THEN 1 END)
      FROM lineitem
      UNION ALL
      SELECT 'returnflag_domain', 'in_set',
             count(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                          OR l_returnflag IS NULL THEN 1 END)
      FROM lineitem
      UNION ALL
      -- mirrors validate_expectations' NULL-key-explicit formula:
      -- violations = NULL-key rows (can't prove uniqueness) +
      -- (non-null-key rows - distinct non-null key tuples).  The CASE
      -- inside count(DISTINCT ..) yields NULL for NULL-key rows, which
      -- DISTINCT drops — unlike a bare struct tuple, which DuckDB would
      -- count as distinct and silently diverge from the operator on any
      -- feed with NULL key columns.
      SELECT 'line_pk_unique', 'unique',
             count(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
                        THEN 1 END)
             + (count(CASE WHEN l_orderkey IS NOT NULL
                             AND l_linenumber IS NOT NULL THEN 1 END)
                - count(DISTINCT CASE WHEN l_orderkey IS NOT NULL
                                        AND l_linenumber IS NOT NULL
                                      THEN (l_orderkey, l_linenumber) END))
      FROM lineitem)
    SELECT c.rule, c.kind,
           CAST(n.n_rows AS BIGINT) AS n_rows,
           CAST(c.n_violations AS BIGINT) AS n_violations,
           CAST((2 * c.n_violations * 1000000 + n.n_rows) // (2 * n.n_rows)
                AS DOUBLE) / 1000000 AS violation_frac
    FROM checks c, n
    """,
)
def rel_data_quality_report(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality expectation suite (operators/stats.
    validate_expectations) — the Great-Expectations-style validation gate
    before a feed is allowed downstream, as ONE Spark plan: every scalar
    rule is a conditional count inside a single aggregation over a single
    scan (adding a rule adds a column, not a pass); the uniqueness rule
    pays the one count_distinct shuffle a uniqueness proof fundamentally
    needs.  Fractions are round6_ratio integer half-up."""
    from presto_ethereum_spark.operators.stats import validate_expectations

    return validate_expectations(
        t(spark, sf, "lineitem"),
        [
            ("shipdate_not_null", "not_null", {"col": "l_shipdate"}),
            ("quantity_in_1_50", "range", {"col": "l_quantity", "lo": 1, "hi": 50}),
            ("discount_in_0_01", "range", {"col": "l_discount", "lo": 0.0, "hi": 0.1}),
            ("returnflag_domain", "in_set",
             {"col": "l_returnflag", "values": ["A", "N", "R"]}),
            ("line_pk_unique", "unique",
             {"cols": ["l_orderkey", "l_linenumber"]}),
        ],
    )


@q(
    "rel_mad_anomalies",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS d
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad
      FROM dev GROUP BY event_type),
    scored AS (SELECT dev.*, mad.mad FROM dev JOIN mad USING (event_type))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(med), 4) AS med,
           round(any_value(mad), 4) AS mad,
           CAST(count(CASE WHEN d > 3.0 * 1.4826 * mad THEN 1 END) AS BIGINT)
             AS n_outliers,
           CAST((2 * count(CASE WHEN d > 3.0 * 1.4826 * mad THEN 1 END)
                 * 1000000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000
             AS outlier_frac
    FROM scored GROUP BY event_type
    """,
)
def rel_mad_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    """Robust MAD outlier gate per event type (operators/stats.
    mad_outliers, k=3): |x − median| > 3·1.4826·MAD — median/MAD are
    immune to the outliers inflating their own threshold, unlike the
    z-score gate (eth_gas_anomalies) this complements.  Deviations are
    identical IEEE expressions in both engines, so the exact-percentile
    medians and the outlier counts match bit-for-bit."""
    from presto_ethereum_spark.operators.stats import mad_outliers

    return mad_outliers(
        t(spark, sf, "events"), "value", ["event_type"], k=3.0
    )


@q(
    "doc_collocations_pmi",
    """
    WITH toks AS (
      SELECT string_split(text, ' ') AS ts FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    big AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(ts) - 1)) AS s(i)),
    pairs AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    uni AS (
      SELECT w, CAST(sum(c12) AS BIGINT) AS c FROM (
        SELECT w1 AS w, c12 FROM pairs
        UNION ALL SELECT w2, c12 FROM pairs) GROUP BY w),
    ntab AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM pairs),
    scored AS (
      SELECT p.w1, p.w2, p.c12, u1.c AS c1, u2.c AS c2,
             ln(CAST(p.c12 AS DOUBLE) * CAST(n.nb * 2 AS DOUBLE)
                / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))) AS pmi_raw
      FROM pairs p
      JOIN uni u1 ON u1.w = p.w1
      JOIN uni u2 ON u2.w = p.w2, ntab n
      WHERE p.c12 >= 5)
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
           CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
           round(pmi_raw, 6) AS pmi,
           CAST(row_number() OVER (ORDER BY pmi_raw DESC, w1, w2) AS INT)
             AS rank
    FROM scored QUALIFY rank <= 100
    """,
)
def doc_collocations_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining via PMI (operators/text.collocations_pmi): the
    Church & Hanks pointwise-mutual-information signal over adjacent word
    pairs — the phrase-extraction pass that seeds tokenizer merge
    candidates and multi-word vocabulary entries.  Counts are
    corpus-exact BIGINTs; only the final PMI is a double (ln ->
    round(,6) is the audited-safe AND required display, absorbing libm
    ulp differences).  One corpus scan; pair and unigram count tables
    join broadcast-sized; TakeOrderedAndProject top-100."""
    from presto_ethereum_spark.operators.text import collocations_pmi

    return collocations_pmi(t_spread(spark, sf, "documents"), min_count=5, k=100)


@q(
    "stream_quality_gate",
    """
    WITH n AS (SELECT count(*) AS n_rows FROM events),
    checks AS (
      SELECT 'value_in_range' AS rule,
             count(CASE WHEN NOT (value >= 0.0 AND value <= 1000.0)
                          OR value IS NULL THEN 1 END) AS n_violations
      FROM events
      UNION ALL
      SELECT 'type_domain',
             count(CASE WHEN event_type NOT IN
                          ('click', 'view', 'signup', 'purchase', 'error')
                          OR event_type IS NULL THEN 1 END)
      FROM events
      UNION ALL
      SELECT 'user_not_null',
             count(CASE WHEN user_id IS NULL THEN 1 END)
      FROM events)
    SELECT c.rule, CAST(n.n_rows AS BIGINT) AS n_rows,
           CAST(c.n_violations AS BIGINT) AS n_violations
    FROM checks c, n
    """,
)
def stream_quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming ingest-time data-quality gate (streaming/events.
    quality_gate_stream): the expectation rules run as conditional counts
    inside the streaming global aggregation, settled via availableNow —
    counts are additive so the result equals the batch suite under ANY
    micro-batch split; state is O(rules) counters."""
    from presto_ethereum_spark.streaming.events import run_quality_gate

    return run_quality_gate(spark, sf)


@q(
    "rel_twap",
    """
    WITH ev AS (
      SELECT user_id AS key, event_id,
             epoch_us(ts) AS t_us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    d AS (
      SELECT key, cents,
             lead(t_us) OVER (PARTITION BY key ORDER BY t_us, event_id)
               - t_us AS dt
      FROM ev)
    SELECT key,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(coalesce(sum(dt), 0) AS BIGINT) AS total_dt_us,
           CASE WHEN coalesce(sum(dt), 0) > 0
                THEN CAST(sum(CAST(cents * dt AS HUGEINT)) AS DOUBLE)
                     / CAST(sum(dt) AS DOUBLE) / 100
                END AS twap
    FROM d GROUP BY key
    """,
)
def rel_twap(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average value per user (operators/temporal.
    time_weighted_avg): each observation holds until the next one, so
    bursts don't over-count — the TWAP rollup for irregularly sampled
    series.  Integer cents x integer microsecond weights accumulate in
    DECIMAL(38,0)/HUGEINT, and the final double is the same exact-integer
    ratio in both engines — bit-identical with NO rounding anywhere.
    One window shuffle (lead) + one aggregation."""
    from presto_ethereum_spark.operators.temporal import time_weighted_avg

    ev = t_spread(spark, sf, "events").select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("t_us"), "value"
    )
    return time_weighted_avg(ev, "user_id", "t_us", "value", "event_id")


@q(
    "doc_split_leakage",
    f"""
    WITH d AS (
      SELECT doc_id, text,
             {_DUCK_BUCKET.format(salt="leak", key="doc_id", buckets=100)} AS b,
             md5(text) AS fp,
             md5(array_to_string((string_split(text, ' '))[1:16], ' ')) AS pfp
      FROM documents),
    s AS (
      SELECT doc_id, fp, pfp,
             CASE WHEN b < 90 THEN 'train'
                  WHEN b < 95 THEN 'val' ELSE 'test' END AS split
      FROM d),
    train_fp AS (SELECT DISTINCT fp FROM s WHERE split = 'train'),
    train_pfp AS (SELECT DISTINCT pfp FROM s WHERE split = 'train')
    SELECT split AS eval_split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN fp IN (SELECT fp FROM train_fp) THEN 1 END)
                AS BIGINT) AS n_exact_leaked,
           CAST(count(CASE WHEN pfp IN (SELECT pfp FROM train_pfp) THEN 1 END)
                AS BIGINT) AS n_prefix_leaked
    FROM s WHERE split <> 'train'
    GROUP BY split
    """,
)
def doc_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Train/eval contamination check: after the deterministic 90/5/5
    split (operators/sampling.split_assign, the same hash-bucket contract
    doc_e2e_pipeline grades), count the val/test documents whose exact
    content fingerprint — or whose 16-token prefix fingerprint, the
    boilerplate-near-dup signal — also appears in train.  The leakage
    audit every LLM data pipeline should run before trusting its eval
    numbers: a random split of a corpus with duplicates ALWAYS leaks.

    Plan: split + both fingerprints are map-side md5s over one scan; the
    train fingerprint sets ride two LeftSemi hash joins on 16-byte keys
    (broadcast when small, shuffled-hash at corpus scale) — document
    bodies never enter an exchange; final agg is 2 rows."""
    from presto_ethereum_spark.operators.sampling import split_assign
    from presto_ethereum_spark.operators.text import tokens

    d = t_spread(spark, sf, "documents")
    s = split_assign(d, "doc_id", salt="leak").select(
        "doc_id",
        "split",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.md5(
            F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 16)).cast("binary")
        ).alias("pfp"),
    )
    train = s.where(F.col("split") == "train")
    ev = s.where(F.col("split") != "train")
    tf = train.select("fp").distinct()
    tp = train.select("pfp").distinct()
    exact = (
        ev.join(tf, "fp", "left_semi")
        .groupBy("split")
        .agg(F.count("*").alias("n_exact_leaked"))
    )
    pref = (
        ev.join(tp, "pfp", "left_semi")
        .groupBy("split")
        .agg(F.count("*").alias("n_prefix_leaked"))
    )
    base = ev.groupBy("split").agg(F.count("*").alias("n_docs"))
    return (
        base.join(exact, "split", "left")
        .join(pref, "split", "left")
        .select(
            F.col("split").alias("eval_split"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce("n_exact_leaked", F.lit(0))
            .cast("long")
            .alias("n_exact_leaked"),
            F.coalesce("n_prefix_leaked", F.lit(0))
            .cast("long")
            .alias("n_prefix_leaked"),
        )
    )


@q(
    "doc_vocab_growth",
    """
    WITH tok AS (
      SELECT doc_id // 100 AS bucket, unnest(string_split(text, ' ')) AS w
      FROM documents),
    first_seen AS (
      SELECT w, min(bucket) AS first_bucket FROM tok WHERE w <> '' GROUP BY w),
    per AS (
      SELECT first_bucket AS bucket, count(*) AS new_types
      FROM first_seen GROUP BY first_bucket),
    toks_per AS (
      SELECT bucket, count(*) AS n_tokens FROM tok WHERE w <> '' GROUP BY bucket)
    SELECT t.bucket,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(p.new_types, 0) AS BIGINT) AS new_types,
           CAST(sum(coalesce(p.new_types, 0)) OVER (ORDER BY t.bucket)
                AS BIGINT) AS vocab_size,
           CAST(sum(t.n_tokens) OVER (ORDER BY t.bucket) AS BIGINT)
             AS corpus_tokens
    FROM toks_per t LEFT JOIN per p ON p.bucket = t.bucket
    """,
)
def doc_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve: how many NEW word types each
    100-document chunk contributes, with running vocabulary and token
    totals — the corpus-curation diagnostic for "is more data still
    adding vocabulary, or just repeating it" (informs tokenizer vocab
    sizing and dedup aggressiveness).

    Plan: first-occurrence via groupBy(word) min(bucket) — the one
    vocabulary-sized shuffle; per-bucket rollups are map-side combined;
    the cumulative window runs over #buckets rows (corpus-size /
    100 docs — thousands of rows at any SF, single-partition window is
    free).  The curve is integer-exact end to end."""
    d = t_spread(spark, sf, "documents")
    tok = d.select(
        F.expr("doc_id DIV 100").alias("bucket"),
        F.explode(F.split("text", " ", -1)).alias("w"),
    ).where(F.col("w") != "")
    first_seen = tok.groupBy("w").agg(F.min("bucket").alias("first_bucket"))
    per = first_seen.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count("*").alias("new_types")
    )
    toks_per = tok.groupBy("bucket").agg(F.count("*").alias("n_tokens"))
    w = Window.orderBy("bucket")
    return (
        toks_per.join(per, "bucket", "left")
        .select(
            "bucket",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types"),
        )
        .withColumn(
            "vocab_size", F.sum("new_types").over(w).cast("long")
        )
        .withColumn(
            "corpus_tokens", F.sum("n_tokens").over(w).cast("long")
        )
    )


@q(
    "rel_topn_with_ties",
    """
    SELECT o_custkey AS custkey, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(rank() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC) AS INT) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
)
def rel_topn_with_ties(spark: SparkSession, sf: str) -> DataFrame:
    """Top-N per group WITH TIES (rank <= N, the SQL FETCH ... WITH TIES
    semantic): unlike row_number (rel_window_topn), equal-price orders all
    survive the cut — the dense leaderboard semantic.  Same
    WindowGroupLimit pushdown applies: rank's group-limit filter prunes
    per partition before the one window shuffle."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        t(spark, sf, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


def _lsh_recall_oracle(dim: int = 64, bands: int = 4, bits: int = 24, k: int = 10) -> str:
    """Closed-form recall@k of the LSH index against the brute-force truth
    for probe queries vec_id < 5 — the same replica machinery as
    _lsh_oracle plus an exact-knn truth CTE."""
    from presto_ethereum_spark.operators.similarity import _hyperplane

    width = bits // bands
    sig_terms = []
    for p in range(bits):
        plane = ", ".join(repr(x) for x in _hyperplane(dim, p))
        sig_terms.append(
            f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),"
            f" [{plane}]) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
        )
    sig = " + ".join(sig_terms)
    cos_t = _duck_cos("q.embedding", "n.embedding")
    cos_l = _duck_cos("q.embedding", "n.embedding")
    return f"""
    WITH sigs AS (
      SELECT vec_id AS id, ({sig}) AS sig FROM embeddings
    ),
    banded AS (
      SELECT id, band, (sig >> (band * {width})) & {(1 << width) - 1} AS key
      FROM sigs, (SELECT unnest(generate_series(0, {bands - 1})) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    sym AS (
      SELECT id_a AS query_id, id_b AS neighbor_id FROM cand
      UNION ALL
      SELECT id_b AS query_id, id_a AS neighbor_id FROM cand
    ),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT s.query_id, s.neighbor_id,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY {cos_l} DESC, s.neighbor_id) AS rnk
        FROM sym s
        JOIN embeddings q ON q.vec_id = s.query_id
        JOIN embeddings n ON n.vec_id = s.neighbor_id
        WHERE s.query_id < 5)
      WHERE rnk <= {k}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos_t} DESC, n.vec_id) AS rnk
        FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
        WHERE q.vec_id < 5)
      WHERE rnk <= {k}
    )
    SELECT t.query_id,
           CAST(count(*) AS BIGINT) AS n_truth,
           CAST(count(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 END)
                AS BIGINT) AS n_hits,
           CAST((2 * count(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 END)
                 * 1000000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000
             AS recall
    FROM truth t
    LEFT JOIN lsh l ON l.query_id = t.query_id
                   AND l.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
    """


@q("emb_lsh_recall", _lsh_recall_oracle())
def emb_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Measured recall@10 of the random-hyperplane LSH index against the
    exact brute-force truth, per probe query — the approximate-index
    quality report graded EXACTLY (both pipelines replicate closed-form
    in the oracle), the LSH counterpart of emb_ivf_recall_refined.
    recall uses round6_ratio integer half-up."""
    from presto_ethereum_spark.operators.dedup import round6_ratio
    from presto_ethereum_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    q5 = F.col("query_id") < 5
    truth = brute_force_topk(e, e.where(F.col("vec_id") < 5), k=10).select(
        "query_id", "neighbor_id"
    )
    lsh = (
        lsh_topk(e, dim=64, k=10, bands=4, bits=24)
        .where(q5)
        .select("query_id", "neighbor_id")
    )
    hits = (
        truth.join(lsh, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    base = truth.groupBy("query_id").agg(F.count("*").alias("n_truth"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_truth").cast("long").alias("n_truth"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            round6_ratio(
                F.coalesce("n_hits", F.lit(0)), F.col("n_truth")
            ).alias("recall"),
        )
    )


@q(
    "eth_miner_gas_twap",
    f"""
    WITH b AS (
      SELECT block_miner, block_number,
             CAST(block_timestamp AS BIGINT) AS t_s,
             CAST(round(block_gasused * 100) AS BIGINT) AS cents
      FROM read_parquet('{ETH}/block.parquet')),
    d AS (
      SELECT block_miner, cents,
             lead(t_s) OVER (PARTITION BY block_miner
                             ORDER BY t_s, block_number) - t_s AS dt
      FROM b)
    SELECT block_miner AS key,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(coalesce(sum(dt), 0) AS BIGINT) AS total_dt_us,
           CASE WHEN coalesce(sum(dt), 0) > 0
                THEN CAST(sum(CAST(cents * dt AS HUGEINT)) AS DOUBLE)
                     / CAST(sum(dt) AS DOUBLE) / 100
                END AS twap
    FROM d GROUP BY block_miner
    """,
)
def eth_miner_gas_twap(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average gas-used per miner over the chain timeline —
    the LLM-pipeline TWAP operator (operators/temporal.time_weighted_avg)
    composed onto the connector surface unchanged: each block's gas load
    'holds' until the miner's next block, so sporadic miners don't read
    like sustained load.  Same exactness contract as rel_twap (integer
    units x integer durations in DECIMAL/HUGEINT, unrounded final
    ratio).  The time axis is chain seconds; the column keeps the
    operator's _us name (units are opaque to the arithmetic)."""
    from presto_ethereum_spark.operators.temporal import time_weighted_avg

    b = _eth_tables(spark).table("block").select(
        "block_miner",
        "block_number",
        F.col("block_timestamp").cast("long").alias("t_s"),
        F.col("block_gasused").alias("gas"),
    )
    return time_weighted_avg(b, "block_miner", "t_s", "gas", "block_number")


@q(
    "emb_pq_recall",
    f"""
    WITH seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
             CAST(embedding AS DOUBLE[]) AS v
      FROM (SELECT vec_id, embedding FROM embeddings
            ORDER BY vec_id LIMIT {_PQ_CODES})
    ),
    subs AS (SELECT unnest(generate_series(0, {_PQ_SUBSPACES - 1})) AS s),
    cb AS (
      SELECT subs.s AS subspace, seeds.code,
             (seeds.v)[subs.s * {_PQ_SUBDIM} + 1 : subs.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS c
      FROM seeds CROSS JOIN subs
    ),
    ev AS (
      SELECT e.vec_id, subs.s AS subspace,
             (CAST(e.embedding AS DOUBLE[]))
               [subs.s * {_PQ_SUBDIM} + 1 : subs.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS x
      FROM embeddings e CROSS JOIN subs
    ),
    scored AS (
      SELECT ev.vec_id, ev.subspace, cb.code,
             list_dot_product(
               list_transform(list_zip(ev.x, cb.c), p -> p[1] - p[2]),
               list_transform(list_zip(ev.x, cb.c), p -> p[1] - p[2])) AS d2
      FROM ev JOIN cb ON cb.subspace = ev.subspace
    ),
    assign AS (
      SELECT vec_id, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY d2 ASC, code) AS rnk
        FROM scored) WHERE rnk = 1
    ),
    qlut AS (
      SELECT q.vec_id AS query_id, q.subspace, q.code,
             CAST(floor(q.d2 * 1000000000000000.0) AS BIGINT) AS d2q
      FROM scored q WHERE q.vec_id < 5
    ),
    adc AS (
      SELECT query_id, neighbor_id FROM (
        SELECT l.query_id, a.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY l.query_id
                   ORDER BY CAST(sum(l.d2q) AS BIGINT) ASC, a.vec_id) AS INT)
                 AS rank
        FROM assign a
        JOIN qlut l ON l.subspace = a.subspace AND l.code = a.code
        WHERE a.vec_id != l.query_id
        GROUP BY l.query_id, a.vec_id)
      WHERE rank <= 10
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(
                   list_transform(list_zip(CAST(q.embedding AS DOUBLE[]),
                                           CAST(n.embedding AS DOUBLE[])),
                                  p -> p[1] - p[2]),
                   list_transform(list_zip(CAST(q.embedding AS DOUBLE[]),
                                           CAST(n.embedding AS DOUBLE[])),
                                  p -> p[1] - p[2])) ASC, n.vec_id) AS rnk
        FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
        WHERE q.vec_id < 5)
      WHERE rnk <= 10
    )
    SELECT t.query_id,
           CAST(count(*) AS BIGINT) AS n_truth,
           CAST(count(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 END)
                AS BIGINT) AS n_hits,
           CAST((2 * count(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 END)
                 * 1000000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000
             AS recall
    FROM truth t
    LEFT JOIN adc a ON a.query_id = t.query_id
                   AND a.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
    """,
)
def emb_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Measured recall@10 of PQ asymmetric-distance serving against the
    EXACT squared-L2 truth — completes the graded approximate-index
    quality trio (IVF: emb_ivf_recall_refined; LSH: emb_lsh_recall; PQ:
    here).  The quantization loss a 4-code x 8-subspace codebook pays is
    the report, not a tolerance — both pipelines replicate closed-form
    in the oracle and recall is round6_ratio integer half-up.

    Scale: the ADC side is the serving plan (codes + broadcast LUT, raw
    vectors never read); the exact-truth side is the 5-probe broadcast
    scan — the price of measuring recall, not a serving path."""
    from presto_ethereum_spark.operators.dedup import round6_ratio

    adc = emb_pq_adc_topk(spark, sf).select("query_id", "neighbor_id")
    e = t_spread(spark, sf, "embeddings", parts=8)
    q = F.broadcast(
        e.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d2"), "neighbor_id")
    truth = (
        c.join(q, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_d2", d2)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("query_id", "neighbor_id")
    )
    hits = (
        truth.join(adc, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    base = truth.groupBy("query_id").agg(F.count("*").alias("n_truth"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_truth").cast("long").alias("n_truth"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            round6_ratio(
                F.coalesce("n_hits", F.lit(0)), F.col("n_truth")
            ).alias("recall"),
        )
    )


@q(
    "rel_cumulative_distinct_users",
    """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    first_day AS (SELECT user_id, min(day) AS d0 FROM ev GROUP BY user_id),
    new_per AS (SELECT d0 AS day, count(*) AS new_users
                FROM first_day GROUP BY d0),
    act AS (SELECT day, count(DISTINCT user_id) AS active_users
            FROM ev GROUP BY day)
    SELECT a.day,
           CAST(a.active_users AS BIGINT) AS active_users,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY a.day)
                AS BIGINT) AS cumulative_users
    FROM act a LEFT JOIN new_per n ON n.day = a.day
    """,
)
def rel_cumulative_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Daily active / new / cumulative-distinct users — the growth-curve
    rollup every product-analytics stack runs.  Cumulative distinct is
    NOT a windowed count(DISTINCT) (which would re-scan every prefix):
    each user collapses to a first-seen day (one user-keyed shuffle),
    daily news roll up map-side, and the running total is a window over
    #days rows — the same first-occurrence trick as doc_vocab_growth,
    which is what makes the curve computable at any event volume."""
    ev = t_spread(spark, sf, "events").select(
        "user_id", F.expr("(ts DIV 1000) DIV 86400000000").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    new_per = first_day.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    act = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("active_users")
    )
    w = Window.orderBy("day")
    return (
        act.join(new_per, "day", "left")
        .select(
            "day",
            F.col("active_users").cast("long").alias("active_users"),
            F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
        )
        .withColumn(
            "cumulative_users", F.sum("new_users").over(w).cast("long")
        )
    )


@q(
    "stream_windowed_distinct",
    """
    SELECT epoch_us(ts) // 3600000000 * 3600 AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           1 AS distinct_ok
    FROM events GROUP BY window_start
    """,
)
def stream_windowed_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming per-hour distinct users with an HLL++ sketch referee
    (streaming/events.windowed_distinct_stream): dropDuplicates state
    makes the streamed count exact under any micro-batch split, and the
    graded column is the sketch's tolerance verdict — the
    rel_approx_sketches contract carried into Structured Streaming."""
    from presto_ethereum_spark.streaming.events import run_windowed_distinct

    return run_windowed_distinct(spark, sf)


@q(
    "stream_kmv_distinct",
    """
    WITH ev AS (
      SELECT epoch_us(ts) // 3600000000 * 3600 AS window_start, user_id
      FROM events WHERE user_id IS NOT NULL),
    cnt AS (SELECT window_start, count(*) AS n_events FROM ev GROUP BY 1),
    hv AS (
      SELECT DISTINCT window_start,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM ev),
    rk AS (
      SELECT window_start, hv,
             row_number() OVER (PARTITION BY window_start ORDER BY hv) AS rn
      FROM hv),
    agg AS (
      SELECT window_start,
             count(*) FILTER (WHERE rn <= 64) AS n_sk,
             max(CASE WHEN rn = 64 THEN hv END) AS kth_min
      FROM rk GROUP BY 1)
    SELECT c.window_start,
           CAST(c.n_events AS BIGINT) AS n_events,
           CAST(a.n_sk AS BIGINT) AS n_sk,
           CAST(a.kth_min AS BIGINT) AS kth_min,
           CAST(CASE WHEN a.kth_min IS NOT NULL
                THEN (CAST(63 AS HUGEINT) * 1152921504606846976) // a.kth_min
                ELSE a.n_sk END AS BIGINT) AS est_distinct
    FROM cnt c JOIN agg a USING (window_start)
    """,
)
def stream_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Per-hour distinct users as a MERGEABLE KMV sketch in the streaming
    path (streaming/events.kmv_distinct_stream, k=64): state is k longs
    per window — not one dropDuplicates entry per distinct user — merged
    per micro-batch via applyInPandasWithState; KMV merge is commutative
    and associative, so the settled result is bit-identical to the batch
    sketch under ANY micro-batch split, and the oracle replays the
    identical md5-derived sketch closed-form.  kth_min and est_distinct
    are HASH-gated (the rel_kmv_distinct contract carried into
    Structured Streaming) — strictly stronger than the HLL entries'
    tolerance verdicts, because KMV contents are merge-order
    independent while HLL internals are not."""
    from presto_ethereum_spark.streaming.events import run_kmv_distinct

    return run_kmv_distinct(spark, sf)


def stream_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Per-hour heavy-hitter users via streaming Misra-Gries candidates +
    exact verify on window close (streaming/events.heavy_hitters_stream,
    k=96) — the heavy-hitter member of the batch/stream sketch parity
    family (stream_kmv_distinct: distinct counts; stream_value_histogram:
    quantiles).  State is <= k (value, count) counters per open window,
    reduced per micro-batch by the same PODS'12 step the batch
    misra_gries_heavy runs per partition, so the settled candidate set
    provably contains every user above 1/97 of the window whatever the
    micro-batch split; the candidate-sized exact verify then makes the
    graded output EQUAL to the closed form — hash-gated, split-invariant
    by construction (MG residuals, the only split-dependent numbers, are
    diagnostics and never graded).  The eviction path is organically
    non-vacuous at sf0.1 (densest hour: 166 distinct users > k) while
    sf0.01 exercises the no-eviction exactness path."""
    from presto_ethereum_spark.streaming.events import run_heavy_hitters

    return run_heavy_hitters(spark, sf)


_STREAM_HH_ORACLE = """
    WITH ev AS (
      SELECT epoch_us(ts) // 3600000000 * 3600 AS window_start,
             CAST(user_id AS VARCHAR) AS value
      FROM events WHERE user_id IS NOT NULL),
    n AS (SELECT window_start, count(*) AS n_total FROM ev GROUP BY 1),
    c AS (SELECT window_start, value, count(*) AS n FROM ev GROUP BY 1, 2)
    SELECT c.window_start,
           c.value,
           CAST(c.n AS BIGINT) AS n,
           CAST(n.n_total AS BIGINT) AS n_total,
           CAST((2 * c.n * 1000000 + n.n_total) // (2 * n.n_total)
                AS BIGINT) AS share_e6
    FROM c JOIN n USING (window_start)
    WHERE c.n * 97 > n.n_total
    """
_REGISTRY["stream_heavy_hitters"] = (stream_heavy_hitters, _STREAM_HH_ORACLE)


@q(
    "rel_decile_lift",
    """
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM events GROUP BY user_id),
    dist AS (
      SELECT cents, count(*) AS n, sum(conv) AS nc FROM u GROUP BY cents),
    tot AS (SELECT sum(n) AS tn, sum(nc) AS tc FROM dist),
    b AS (
      SELECT cents, n, nc,
             least(9, (10 * COALESCE(sum(n) OVER (
                 ORDER BY cents DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               // tn) AS decile
      FROM dist, tot),
    d AS (
      SELECT decile, sum(n) AS n_users, sum(nc) AS n_converters
      FROM b GROUP BY decile),
    c AS (
      SELECT decile, n_users, n_converters,
             sum(n_converters) OVER (ORDER BY decile) AS cum_conv
      FROM d)
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_converters AS BIGINT) AS n_converters,
           CAST((2 * n_converters * 1000000 + n_users) // (2 * n_users)
                AS BIGINT) AS conv_ppm,
           CAST((2 * cum_conv * 1000000 + tc) // (2 * tc)
                AS BIGINT) AS cum_capture_ppm,
           CAST((2 * n_converters * tn * 1000000 + n_users * tc)
                // (2 * n_users * tc) AS BIGINT) AS lift_e6
    FROM c, tot
    """,
)
def rel_decile_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Gains/lift table — the campaign-targeting read-out: users ranked by
    total spend (exact cents), cut into spend deciles (0 = highest), and
    each decile scored by purchase-conversion rate, cumulative converter
    capture, and lift over the base rate.  Deciles come from the DISTINCT-
    SCORE distribution (curriculum_interleave's trick): the one global
    window runs over (distinct score, count) rows, never over raw users.
    Exact cent totals are near-unique, so at 100 TB you first ROUND the
    score (whole currency units caps the distribution at the price range)
    — the decile algebra is unchanged and the cut stays exact for the
    rounded score; alternatively assign by 9 broadcast percentile
    boundaries and accept boundary-tie drift.  Every reported ratio is an
    exact half-up ppm/e6 integer division; at petabyte user counts the
    2*nc*tn*1e6 numerator moves to DECIMAL(38,0), nothing else
    changes."""
    u = t_spread(spark, sf, "events").groupBy("user_id").agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("conv"),
    )
    dist = u.groupBy("cents").agg(
        F.count("*").alias("n"), F.sum("conv").alias("nc")
    )
    tot = dist.agg(F.sum("n").alias("tn"), F.sum("nc").alias("tc"))
    w_cum = Window.orderBy(F.col("cents").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    b = (
        dist.withColumn("before", F.coalesce(F.sum("n").over(w_cum), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "nc",
            "tn",
            "tc",
            F.least(F.lit(9), F.expr("(10 * before) DIV tn")).alias("decile"),
        )
    )
    d = b.groupBy("decile", "tn", "tc").agg(
        F.sum("n").alias("n_users"), F.sum("nc").alias("n_converters")
    )
    w_dec = Window.orderBy("decile")
    return (
        d.withColumn("cum_conv", F.sum("n_converters").over(w_dec))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_converters").cast("long").alias("n_converters"),
            F.expr(
                "CAST((2 * n_converters * 1000000 + n_users)"
                " DIV (2 * n_users) AS BIGINT)"
            ).alias("conv_ppm"),
            F.expr(
                "CAST((2 * cum_conv * 1000000 + tc) DIV (2 * tc) AS BIGINT)"
            ).alias("cum_capture_ppm"),
            F.expr(
                "CAST((2 * n_converters * tn * 1000000 + n_users * tc)"
                " DIV (2 * n_users * tc) AS BIGINT)"
            ).alias("lift_e6"),
        )
    )


@q(
    "stream_ewma_user",
    """
    WITH ev AS (
      SELECT user_id AS key, event_id, epoch_us(ts) AS t_us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    tot AS (SELECT key, count(*) AS n_seen FROM ev GROUP BY key),
    r AS (
      SELECT key, cents,
             row_number() OVER (PARTITION BY key
                                ORDER BY t_us DESC, event_id DESC) AS rn
      FROM ev),
    k AS (
      SELECT key, cents, rn, count(*) OVER (PARTITION BY key) AS m
      FROM r WHERE rn <= 20)
    SELECT k.key,
           CAST(any_value(t.n_seen) AS BIGINT) AS n_seen,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(cents * (CAST(1 AS BIGINT) << (m - rn))) AS BIGINT)
             AS ewma_num,
           CAST((CAST(1 AS BIGINT) << any_value(m)) - 1 AS BIGINT)
             AS ewma_den,
           CAST(sum(cents * (CAST(1 AS BIGINT) << (m - rn))) AS DOUBLE)
             / CAST((CAST(1 AS BIGINT) << any_value(m)) - 1 AS DOUBLE) / 100
             AS ewma
    FROM k JOIN tot t ON k.key = t.key GROUP BY k.key
    """,
)
def stream_ewma_user(spark: SparkSession, sf: str) -> DataFrame:
    """rel_ewma_value carried into Structured Streaming
    (streaming/events.ewma_stream): per-user dyadic EWMA over the newest
    20 observations, with the order-sensitive fold replaced by a
    MERGEABLE newest-k buffer (top-k by (t_us, event_id) is commutative/
    associative/idempotent) so the settled BIGINT rational is
    bit-identical to the batch closed form under any micro-batch split —
    hash-gated, the stream_kmv_distinct standard.  State: <= 20 triples
    + one counter per user."""
    from presto_ethereum_spark.streaming.events import run_ewma

    return run_ewma(spark, sf)


@q(
    "stream_funnel_firsts",
    """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us
      FROM events
      WHERE user_id IS NOT NULL
        AND event_type IN ('view', 'click', 'purchase')),
    m AS (
      SELECT user_id,
             count(*) AS n_seen,
             min(CASE WHEN event_type = 'view' THEN t_us END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN t_us END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN t_us END) AS t_purchase
      FROM ev GROUP BY user_id)
    SELECT user_id,
           CAST(n_seen AS BIGINT) AS n_seen,
           t_view, t_click, t_purchase,
           CAST(CASE WHEN t_view IS NULL THEN 0
                     WHEN t_click IS NULL OR t_click <= t_view THEN 1
                     WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 2
                     ELSE 3 END AS INT) AS steps_completed
    FROM m
    """,
)
def stream_funnel_firsts(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming first-occurrence funnel (streaming/events.funnel_stream):
    per-user earliest view/click/purchase timestamps and the in-order
    step count, maintained as three MIN-merged longs of state — the
    restart-safe CEP counterpart to rel_funnel_steps' conditional chain
    (which needs full replay to absorb a late-arriving earlier view).
    Split-invariant by min-merge algebra; all five columns hash-gated."""
    from presto_ethereum_spark.streaming.events import run_funnel

    return run_funnel(spark, sf)


@q(
    "rel_revenue_trend",
    """
    WITH rev AS (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) - 1995 AS x,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))), 2) * 100 AS BIGINT) AS y
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, year(o_orderdate)),
    s AS (
      SELECT nation, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM rev GROUP BY nation),
    terms AS (
      SELECT nation, n, n * sxx - sx * sx AS d, n * sxy - sx * sy AS nm,
             sy * sxx - sx * sxy AS im, n * syy - sy * sy AS syyc
      FROM s)
    SELECT nation, CAST(n AS BIGINT) AS n,
           CASE WHEN d > 0 THEN CAST(
             CASE WHEN nm < 0 THEN -((2 * (-nm) * 100 + d) // (2 * d))
                  ELSE (2 * nm * 100 + d) // (2 * d) END AS BIGINT)
           END AS slope_e2,
           CASE WHEN d > 0 THEN CAST(
             CASE WHEN im < 0 THEN -((2 * (-im) * 100 + d) // (2 * d))
                  ELSE (2 * im * 100 + d) // (2 * d) END AS BIGINT)
           END AS intercept_e2,
           CASE WHEN d > 0 AND syyc > 0 THEN CAST(
             (2 * nm * nm * 1000000 + d * syyc) // (2 * d * syyc) AS BIGINT)
           END AS r2_e6
    FROM terms
    """,
)
def rel_revenue_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Per-nation OLS trend of yearly revenue (operators/stats.ols_trend):
    the regr_slope/regr_intercept/regr_r2 family re-expressed as integer
    power sums in DECIMAL(38,0) so the fixed-point trend columns are
    bit-identical in both engines — the builtin double-space ``regr_*``
    would flip low bits on summation order.  Plan: one fact-fact shuffle
    (lineitem ⋈ orders), customer/nation broadcast, a (nation, year)
    partial-agg rollup to ≤ #nations × #years rows, then the six-sum OLS
    aggregation over that tiny table — the trend math costs nothing; the
    revenue rollup is the query."""
    from presto_ethereum_spark.operators.stats import ols_trend

    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate").cast("int") - F.lit(1995)).alias("x"),
        )
        .agg(
            (
                F.round(
                    F.sum(
                        (
                            F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))
                        ).cast("decimal(18,6)")
                    ),
                    2,
                )
                * 100
            )
            .cast("long")
            .alias("y")
        )
    )
    return ols_trend(rev, "x", "y", ["nation"])


@q(
    "rel_max_concurrency",
    """
    WITH iv AS (
      SELECT event_type, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + 300000000 AS e
      FROM events),
    edges AS (
      SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT event_type, e, -1, event_id FROM iv),
    run AS (
      SELECT event_type, t,
             sum(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta, event_id
                              ROWS UNBOUNDED PRECEDING) AS r
      FROM edges),
    pk AS (
      SELECT event_type, t, r, max(r) OVER (PARTITION BY event_type) AS peak
      FROM run)
    SELECT event_type,
           CAST(count(*) // 2 AS BIGINT) AS n_intervals,
           CAST(max(r) AS BIGINT) AS peak,
           CAST(min(CASE WHEN r = peak THEN t END) AS BIGINT) AS t_at_peak
    FROM pk GROUP BY event_type
    """,
)
def rel_max_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrent activity per event type (operators/temporal.
    max_concurrency): each event opens a 5-minute activity interval and
    the sweep-line finds the highest number simultaneously open plus the
    earliest instant it happens — the capacity-planning question a naive
    interval self-join answers in O(n²).  Edge list doubles rows
    map-side; ONE shuffle on event_type feeds both the running-sum
    window and the final aggregation.  End-before-start tie semantics
    and an event_id tiebreak make the edge walk engine- and
    partitioning-invariant."""
    from presto_ethereum_spark.operators.temporal import max_concurrency

    iv = t(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.expr("ts DIV 1000").alias("s"),
        (F.expr("ts DIV 1000") + F.lit(300_000_000)).alias("e"),
    )
    return max_concurrency(iv, ["event_type"], "s", "e", "event_id")


@q(
    "doc_token_entropy",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    c AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    agg AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c * c) AS BIGINT) AS collision_sumsq
      FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct, collision_sumsq,
           round(ln(CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)
                    / CAST(collision_sumsq AS DOUBLE)), 6) AS renyi2
    FROM agg
    """,
)
def doc_token_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document Rényi-2 (collision) entropy (operators/text.
    token_entropy): the token-diversity quality gate — ln(n²/Σc²) is 0
    for single-token spam and ln(n) for fully diverse text.  The
    collision statistic Σc² is an exact integer folded in ONE JVM
    higher-order aggregate over the sorted token array — ZERO shuffle, a
    pure projection at corpus-scan speed — while the oracle's
    groupBy(doc, token) formulation shuffles the whole token stream;
    the only double is one final ln of an exact rational (the same
    audited-safe class as collocations_pmi)."""
    from presto_ethereum_spark.operators.text import token_entropy

    return token_entropy(t_spread(spark, sf, "documents"))


@q(
    "doc_edit_distance_pairs",
    """
    WITH p AS (
      SELECT doc_id,
             substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                    1, 64) AS pfx
      FROM documents),
    f AS (SELECT doc_id, pfx FROM p WHERE length(pfx) = 64),
    achunks AS (
      SELECT doc_id, i AS ci, substr(pfx, 1 + i * 16, 16) AS key
      FROM f, unnest(generate_series(0, 3)) AS s(i)),
    bsubs AS (
      SELECT doc_id, i AS ci, substr(pfx, 1 + i * 16 + o, 16) AS key
      FROM f, unnest(generate_series(0, 3)) AS s(i),
           unnest(generate_series(-3, 3)) AS t(o)
      WHERE 1 + i * 16 + o >= 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM achunks a JOIN bsubs b ON a.ci = b.ci AND a.key = b.key
      WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(levenshtein(fa.pfx, fb.pfx) AS BIGINT) AS edit_dist
    FROM cand JOIN f fa ON id_a = fa.doc_id JOIN f fb ON id_b = fb.doc_id
    WHERE levenshtein(fa.pfx, fb.pfx) <= 3
    """,
)
def doc_edit_distance_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Typo-tolerant record linkage (operators/dedup.edit_distance_pairs):
    ALL pairs whose normalized 64-char prefixes are within 3 Levenshtein
    edits, found LOSSLESSLY by the PartEnum pigeonhole with an offset
    window — an untouched chunk of one string appears verbatim in the
    other within ±k of its position, which Hamming chunk blocking
    (doc_fuzzy_hamming_pairs) misses the moment an indel shifts the
    suffix.  The exchange carries (chunk_idx, 16-char key, id) rows —
    never documents; the O(L·k) DP verify runs JVM-side on candidates
    only.  The oracle is the same construction, and the test suite's
    brute-force referee proves the blocking drops nothing."""
    from presto_ethereum_spark.operators.dedup import edit_distance_pairs

    return edit_distance_pairs(
        t_spread(spark, sf, "documents"), max_edits=3, prefix_len=64
    )


@q(
    "rel_merge_upsert",
    """
    WITH changes AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
             c_mktsegment, 'U' AS op
      FROM customer WHERE c_custkey % 10 IN (1, 2)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D'
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 10000000, 'NEW_' || CAST(c_custkey AS VARCHAR),
             c_nationkey, 0.0, 'NEWSEG', 'I'
      FROM customer WHERE c_custkey % 10 = 3),
    merged AS (
      SELECT coalesce(b.c_custkey, c.c_custkey) AS c_custkey,
             CASE WHEN b.c_custkey IS NULL AND c.op = 'I' THEN 'inserted'
                  WHEN b.c_custkey IS NOT NULL AND c.op = 'U' THEN 'updated'
                  WHEN b.c_custkey IS NOT NULL AND c.op = 'D' THEN 'deleted'
                  WHEN b.c_custkey IS NOT NULL THEN 'kept'
             END AS action,
             CASE WHEN b.c_custkey IS NOT NULL AND c.op = 'U'
                  THEN c.c_name ELSE coalesce(b.c_name, c.c_name) END AS c_name,
             CASE WHEN b.c_custkey IS NOT NULL AND c.op = 'U'
                  THEN c.c_nationkey ELSE coalesce(b.c_nationkey, c.c_nationkey)
             END AS c_nationkey,
             CASE WHEN b.c_custkey IS NOT NULL AND c.op = 'U'
                  THEN c.c_acctbal ELSE coalesce(b.c_acctbal, c.c_acctbal)
             END AS c_acctbal,
             CASE WHEN b.c_custkey IS NOT NULL AND c.op = 'U'
                  THEN c.c_mktsegment
                  ELSE coalesce(b.c_mktsegment, c.c_mktsegment)
             END AS c_mktsegment
      FROM customer b FULL OUTER JOIN changes c USING (c_custkey))
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, action
    FROM merged WHERE action IN ('inserted', 'updated', 'kept')
    """,
)
def rel_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Batch MERGE INTO (operators/temporal.merge_changeset): a derived
    changeset (updates for custkey%10∈{1,2}: +100 balance; deletes for
    %10=0; inserts for %10=3 under shifted keys) applied to the customer
    base in ONE full-outer shuffle — every MERGE branch (update wins,
    delete drops, insert-conflict keeps base, untouched rows kept) is a
    projection over the joined row, vs the 3-pass join+anti-join+anti-join
    decomposition that scans the base three times.  The lakehouse upsert
    primitive behind SCD feeds and CDC compaction."""
    from presto_ethereum_spark.operators.temporal import merge_changeset

    c = t(spark, sf, "customer")
    mod = F.col("c_custkey") % 10
    upd = c.where(mod.isin(1, 2)).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    ).withColumn("op", F.lit("U"))
    dele = c.where(mod == 0).withColumn("op", F.lit("D"))
    ins = c.where(mod == 3).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.concat(F.lit("NEW_"), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    return merge_changeset(c, changes, "c_custkey")


@q(
    "rel_ewma_value",
    """
    WITH ev AS (
      SELECT user_id AS key, event_id, epoch_us(ts) AS t_us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT key, cents,
             row_number() OVER (PARTITION BY key
                                ORDER BY t_us DESC, event_id DESC) AS rn
      FROM ev),
    k AS (
      SELECT key, cents, rn, count(*) OVER (PARTITION BY key) AS m
      FROM r WHERE rn <= 20)
    SELECT key, CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(cents * (CAST(1 AS BIGINT) << (m - rn))) AS BIGINT)
             AS ewma_num,
           CAST((CAST(1 AS BIGINT) << any_value(m)) - 1 AS BIGINT)
             AS ewma_den,
           CAST(sum(cents * (CAST(1 AS BIGINT) << (m - rn))) AS DOUBLE)
             / CAST((CAST(1 AS BIGINT) << any_value(m)) - 1 AS DOUBLE) / 100
             AS ewma
    FROM k GROUP BY key
    """,
)
def rel_ewma_value(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user EWMA (α = 1/2) of the last 20 observations
    (operators/temporal.ewma_last): the trend smoother where every newer
    observation counts double its predecessor.  Dyadic weights make the
    smoothed value an exact BIGINT rational (num ≤ cents·2^20 « 2^53),
    so the reported double is the same exact-integer ratio in both
    engines — the rel_twap contract, NO rounding anywhere.  One shuffle
    on user_id shared by the ranking window and the aggregation; per-key
    state is 20 rows regardless of history length."""
    from presto_ethereum_spark.operators.temporal import ewma_last

    ev = t_spread(spark, sf, "events").select(
        F.col("user_id").alias("key"),
        "event_id",
        F.expr("ts DIV 1000").alias("t_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    return ewma_last(ev, "key", "t_us", "cents", "event_id", window=20)


@q(
    "rel_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS dst
      FROM events),
    pairs AS (
      SELECT src, dst, count(*) AS n FROM seq WHERE dst IS NOT NULL
      GROUP BY src, dst),
    tot AS (SELECT src, sum(n) AS n_src FROM pairs GROUP BY src)
    SELECT p.src, p.dst, CAST(p.n AS BIGINT) AS n,
           CAST(t.n_src AS BIGINT) AS n_src,
           CAST((2 * p.n * 1000000 + t.n_src) // (2 * t.n_src) AS DOUBLE)
             / 1000000 AS prob
    FROM pairs p JOIN tot t USING (src)
    """,
)
def rel_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over user event journeys: for
    each (src → dst) step-pair, its count and conditional probability —
    the product-analytics primitive behind next-action prediction and
    funnel-drop diagnosis, and the journey-strings rollup
    (rel_journey_strings) in matrix form.  One shuffle on user_id for the
    lead() window; the pair/row-total aggregation runs over #event_type²
    rows (broadcast-sized at any corpus scale).  Probabilities are
    round6_ratio integer half-up — the small-denominator ratio class
    ROUNDING_AUDIT.md bans from round(double)."""
    from presto_ethereum_spark.operators.dedup import round6_ratio

    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("ts DIV 1000").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    tot = pairs.groupBy("src").agg(F.sum("n").alias("n_src"))
    return (
        pairs.join(F.broadcast(tot), "src")
        .select(
            "src",
            "dst",
            F.col("n").cast("long").alias("n"),
            F.col("n_src").cast("long").alias("n_src"),
            round6_ratio(F.col("n"), F.col("n_src")).alias("prob"),
        )
    )


@q(
    "rel_asof_nearest",
    """
    WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
    ord AS (
      SELECT o_custkey, epoch_us(o_orderdate) AS o_us, o_orderkey
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1),
    b AS (
      SELECT ev.event_id, ev.user_id, ev.t_us,
             ord.o_us AS b_us, ord.o_orderkey AS b_key
      FROM ev ASOF LEFT JOIN ord
      ON ev.user_id = ord.o_custkey AND ev.t_us >= ord.o_us),
    f AS (
      SELECT ev.event_id, ord.o_us AS f_us, ord.o_orderkey AS f_key
      FROM ev ASOF LEFT JOIN ord
      ON ev.user_id = ord.o_custkey AND ev.t_us <= ord.o_us)
    SELECT b.event_id, b.user_id,
           CASE WHEN b_us IS NULL THEN f_us
                WHEN f_us IS NULL THEN b_us
                WHEN (t_us - b_us) <= (f_us - t_us) THEN b_us
                ELSE f_us END AS asof_o_us,
           CASE WHEN b_us IS NULL THEN f_key
                WHEN f_us IS NULL THEN b_key
                WHEN (t_us - b_us) <= (f_us - t_us) THEN b_key
                ELSE f_key END AS asof_o_orderkey
    FROM b JOIN f USING (event_id)
    """,
)
def rel_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-direction as-of join (operators/temporal.asof_join,
    direction='nearest'): each event attaches whichever order is CLOSER
    in time — before or after — ties resolving backward; the pandas
    merge_asof direction Spark and most engines lack natively.  Both
    carries (last-before, first-after) share ONE sort order, so the plan
    is still a single shuffle + sort — no second exchange for the
    forward pass; the oracle needs TWO native ASOF joins plus a pick."""
    from presto_ethereum_spark.operators.temporal import asof_join

    ev = t(spark, sf, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    ord_ = (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "o_custkey",
            (F.unix_timestamp("o_orderdate") * 1_000_000).alias("o_us"),
            "o_orderkey",
        )
    )
    return asof_join(
        ev,
        ord_,
        on_left="user_id",
        on_right="o_custkey",
        left_time="t_us",
        right_time="o_us",
        right_value_cols=["o_orderkey"],
        direction="nearest",
    ).select("event_id", "user_id", "asof_o_us", "asof_o_orderkey")


@q(
    "doc_minhash_recall",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_SIG},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    {_DUCK_TRUTH_TP},
    truth AS (
      SELECT id_a, id_b,
             CASE WHEN 10 * inter >= 7 * (sz_a + sz_b - inter) THEN '0.7+'
                  WHEN 10 * inter >= 5 * (sz_a + sz_b - inter) THEN '0.5-0.7'
                  WHEN 10 * inter >= 3 * (sz_a + sz_b - inter) THEN '0.3-0.5'
                  ELSE '0.2-0.3' END AS bucket
      FROM tp
      WHERE {_DUCK_TRUTH_COND}),
    hits AS (
      SELECT t.bucket, count(*) AS n_caught
      FROM truth t JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
      GROUP BY t.bucket)
    SELECT t.bucket, CAST(count(*) AS BIGINT) AS n_truth,
           CAST(coalesce(any_value(h.n_caught), 0) AS BIGINT) AS n_caught,
           CAST((2 * coalesce(any_value(h.n_caught), 0) * 1000000 + count(*))
                // (2 * count(*)) AS DOUBLE) / 1000000 AS recall
    FROM truth t LEFT JOIN hits h ON t.bucket = h.bucket
    GROUP BY t.bucket
    """,
)
def doc_minhash_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Measured recall of MinHash+LSH banding against the exact-Jaccard
    truth, per similarity bucket — the LSH S-curve made visible: 4×4
    banding catches J ≥ 0.7 pairs near-certainly, J ≈ 0.3 pairs rarely.
    Completes the approximate-index quality-report family (IVF/LSH/PQ
    recalls on embeddings) for the DEDUP side.  Truth pairs come from
    operators/dedup.jaccard_truth_pairs — the ONE shared df-capped
    (max_df=8) inverted-index pipeline, threshold J >= TRUTH_TENTHS/10 =
    0.2 (r9: the r8 0.3 cut was organically empty at sf0.1 under the
    cap, making that gate vacuous; 0.2 has 25/5 truth pairs at
    sf0.01/sf0.1 so the gate has content at BOTH SFs).  The cap fires at
    sf0.1 (max organic df 14), so the lossy path is oracle-verified:
    truth-join work is bounded by max_df x total postings — linear in
    corpus size — instead of the unbounded Sum df² a boilerplate shingle
    would explode at crawl scale.  Truth Jaccard is a lower bound
    (capped shingles don't count toward inter; sizes stay full) — the
    standard CCNet measurement trade, documented in SCALE.md.
    Candidates come from the banded bucket join; both sides shuffle
    shingle hashes and ids, never text.  Buckets compare 10·inter vs
    k·union in integers — no double ever gates a bucket edge."""
    return _minhash_recall_report(t_spread(spark, sf, "documents"))


def _minhash_recall_report(d: DataFrame) -> DataFrame:
    """Shared body of doc_minhash_recall and its hash-sampled variant:
    jaccard_truth_pairs truth (J >= 0.2, df-capped) vs banded MinHash
    candidates, recall per similarity bucket."""
    from presto_ethereum_spark.operators.dedup import (
        jaccard_truth_pairs,
        minhash_candidates,
        round6_ratio,
    )

    uni = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    truth = jaccard_truth_pairs(d).select(
        "id_a",
        "id_b",
        F.when(10 * F.col("inter") >= 7 * uni, F.lit("0.7+"))
        .when(10 * F.col("inter") >= 5 * uni, F.lit("0.5-0.7"))
        .when(10 * F.col("inter") >= 3 * uni, F.lit("0.3-0.5"))
        .otherwise(F.lit("0.2-0.3"))
        .alias("bucket"),
    )
    # ONE pass over truth (r13): a left join against the distinct candidate
    # set marks each truth pair caught/missed, so n_truth (count(*)) and
    # n_caught (count of markers) come from a single aggregation.  The old
    # two-branch shape (left_semi for hits + separate groupBy for totals)
    # referenced the truth subtree twice, and Spark physically re-computed
    # the whole shingle->postings->pair pipeline for each branch (plan
    # audit: 2x "Scan parquet -> ... -> Window -> BroadcastHashJoin" trees).
    # Exactly equivalent: cand is distinct pairs, so the left join never
    # duplicates a truth row and count(_hit) == the semi-join count.
    cand = minhash_candidates(d).withColumn("_hit", F.lit(1))
    return (
        truth.join(cand, ["id_a", "id_b"], "left")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_truth"),
            F.count("_hit").alias("n_caught"),
        )
        .select(
            "bucket",
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_caught").cast("long").alias("n_caught"),
            round6_ratio(F.col("n_caught"), F.col("n_truth")).alias("recall"),
        )
    )


@q(
    "rel_incremental_agg",
    """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS max_cents,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100 AS avg
    FROM orders GROUP BY o_orderpriority
    """,
)
def rel_incremental_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-view refresh (operators/stats.agg_state +
    merge_agg_states): the persisted per-priority state over historical
    orders (year < 1999) merges with the fresh slice's delta state
    (year >= 1999) into the EXACT full-table aggregate — the oracle IS
    that full recompute, so hash equality proves the algebraic merge
    loses nothing.  At scale the refresh touches only the delta slice
    plus a #keys-sized state table instead of re-scanning history; the
    derived avg is an exact-integer ratio (rel_twap contract).  The
    non-algebraic cousins (exact distinct, medians) need sketch states —
    that trade is rel_hll_partial_merge's."""
    from presto_ethereum_spark.operators.stats import agg_state, merge_agg_states

    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    hist = agg_state(o.where(F.col("yr") < 1999), ["priority"], "cents")
    delta = agg_state(o.where(F.col("yr") >= 1999), ["priority"], "cents")
    return merge_agg_states(hist, delta).drop("yr")


@q(
    "emb_ivf_cell_stats",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, c.cid, {_duck_cos('c.cvec', 'e.embedding')} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    sizes AS (SELECT cid, count(*) AS n_vecs FROM assign GROUP BY cid),
    tot AS (SELECT sum(n_vecs) AS n FROM sizes)
    SELECT c.cid AS cell,
           CAST(coalesce(s.n_vecs, 0) AS BIGINT) AS n_vecs,
           CAST((2 * coalesce(s.n_vecs, 0) * 8 * 1000000 + t.n)
                // (2 * t.n) AS DOUBLE) / 1000000 AS load_factor
    FROM cent c LEFT JOIN sizes s ON c.cid = s.cid, tot t
    """,
)
def emb_ivf_cell_stats(spark: SparkSession, sf: str) -> DataFrame:
    """IVF index-health report (operators/similarity.ivf_assign): per-cell
    population and load factor (n_vecs x n_cells / corpus; 1.0 =
    perfectly balanced) — the report an ANN operator ships so cell
    imbalance (hot cells = slow probes, empty cells = wasted codebook)
    is visible BEFORE serving traffic hits it, and the measured input to
    the seeds-vs-Lloyd serving-default decision in SCALE.md.  Assignment
    is the same zero-shuffle literal-codebook expression serving uses;
    the report adds one 8-row aggregation.  Load factors are round6_ratio
    integer half-up; empty cells surface as explicit zero rows."""
    from presto_ethereum_spark.operators.dedup import round6_ratio
    from presto_ethereum_spark.operators.similarity import (
        ivf_assign,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    if (key := sf) not in _IVF_CODEBOOKS:
        _IVF_CODEBOOKS[key] = seed_centroids(e, n_cells=8)
    cents = _IVF_CODEBOOKS[key]
    sizes = (
        ivf_assign(e, cents)
        .groupBy("cell")
        .agg(F.count("*").alias("n_vecs"))
    )
    cent_ids = spark.createDataFrame(
        [(int(c),) for c, _ in cents], "cell long"
    )
    tot = sizes.agg(F.sum("n_vecs").alias("_n"))
    return (
        cent_ids.join(sizes, "cell", "left")
        .crossJoin(F.broadcast(tot))  # 1-row scalar attach, no collect
        .select(
            F.col("cell"),
            F.coalesce("n_vecs", F.lit(0)).cast("long").alias("n_vecs"),
            round6_ratio(
                F.coalesce("n_vecs", F.lit(0)) * 8, F.col("_n")
            ).alias("load_factor"),
        )
    )


@q(
    "eth_gas_utilization",
    f"""
    WITH b AS (
      SELECT block_miner,
             CAST(block_gasused AS BIGINT) AS u,
             CAST(block_gaslimit AS BIGINT) AS l
      FROM read_parquet('{ETH}/block.parquet')),
    per AS (
      SELECT block_miner, u, l,
             CAST((2 * u * 1000000 + l) // (2 * l) AS DOUBLE) / 1000000
               AS util
      FROM b)
    SELECT block_miner AS miner,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST((2 * sum(u) * 1000000 + sum(l)) // (2 * sum(l)) AS DOUBLE)
             / 1000000 AS util_total,
           max(util) AS util_max
    FROM per GROUP BY block_miner
    """,
)
def eth_gas_utilization(spark: SparkSession, sf: str) -> DataFrame:
    """Per-miner block-space utilization: gas-weighted fill ratio
    (Σ gasused / Σ gaslimit) plus the peak single-block fill — the
    congestion/production profile the reference's README gas queries
    circle around, as one group-aggregation over the block scan.  Ratios
    are round6_ratio integer half-up (gasused/gaslimit are exact block
    integers); the per-block max is a max over those exact multiples of
    1e-6, so no double ever decides a comparison."""
    from presto_ethereum_spark.operators.dedup import round6_ratio

    b = _eth_tables(spark).table("block").select(
        "block_miner",
        F.col("block_gasused").cast("long").alias("u"),
        F.col("block_gaslimit").cast("long").alias("l"),
    )
    per = b.withColumn("util", round6_ratio(F.col("u"), F.col("l")))
    return per.groupBy(F.col("block_miner").alias("miner")).agg(
        F.count("*").cast("long").alias("n_blocks"),
        round6_ratio(F.sum("u"), F.sum("l")).alias("util_total"),
        F.max("util").alias("util_max"),
    )


@q(
    "eth_khop_reachability",
    f"""
    WITH RECURSIVE
    tx AS (SELECT * FROM read_parquet('{ETH}/transaction.parquet')),
    edges AS (SELECT DISTINCT tx_from AS src, tx_to AS dst
              FROM tx WHERE tx_to IS NOT NULL),
    seed AS (SELECT src AS addr FROM edges
             GROUP BY src ORDER BY count(*) DESC, src ASC LIMIT 1),
    r(addr, hop) AS (
      SELECT addr, CAST(0 AS INTEGER) FROM seed
      UNION
      SELECT e.dst, CAST(r.hop + 1 AS INTEGER)
      FROM r JOIN edges e ON e.src = r.addr
      WHERE r.hop < 3
    ),
    lv AS (SELECT addr, min(hop) AS hop FROM r GROUP BY addr)
    SELECT CAST(hop AS INTEGER) AS hop,
           CAST(count(*) AS BIGINT) AS n_addresses,
           min(addr) AS first_addr,
           max(addr) AS last_addr
    FROM lv GROUP BY hop
    """,
)
def eth_khop_reachability(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-depth taint trace: BFS levels within 3 directed transfer
    hops of the busiest sender (operators/graph.khop_reachability) — the
    recursive-CTE face of the engine.  The DuckDB oracle IS a
    ``WITH RECURSIVE`` (min-hop over deduped (addr, hop) pairs, so the
    recursion is O(levels x nodes), never O(paths)), and Spark 4's
    native recursive CTE reproduces the same levels (pinned in
    test_operators.py::TestKhopReachability) — the DataFrame BFS is what you run at 100 TB because
    each level is one frontier⋈edges shuffle on address ids plus an
    anti-join against visited, with per-level localCheckpoint keeping
    lineage flat.  The seed ("address with most distinct outgoing
    edges", tie = lexicographic min) is computed IN the query as a 1-row
    DataFrame — no collect; it rides the first hop join as a broadcast.
    Output is the per-level census (count + lexicographic extremes), all
    integer/string-exact."""
    from presto_ethereum_spark.operators.graph import khop_reachability

    tx = _eth_tables(spark).table("transaction")
    edges = (
        tx.where(F.col("tx_to").isNotNull())
        .select(F.col("tx_from").alias("src"), F.col("tx_to").alias("dst"))
        .distinct()
    )
    seed = (
        edges.groupBy("src")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("src").asc())
        .limit(1)
        .select("src")
    )
    levels = khop_reachability(edges, seed, k=3)
    return levels.groupBy("hop").agg(
        F.count("*").cast("long").alias("n_addresses"),
        F.min("addr").alias("first_addr"),
        F.max("addr").alias("last_addr"),
    )


@q(
    "rel_rising_runs",
    """
    WITH o AS (
      SELECT user_id, event_id, value,
             CASE WHEN lag(value) OVER w IS NOT NULL
                       AND value > lag(value) OVER w
                  THEN 0 ELSE 1 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
    g AS (
      SELECT user_id, event_id, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM o)
    SELECT user_id,
           CAST(min(event_id) AS BIGINT) AS start_id,
           CAST(max(event_id) AS BIGINT) AS end_id,
           CAST(count(*) AS BIGINT) AS run_len,
           max_by(value, event_id) - min_by(value, event_id) AS gain
    FROM g GROUP BY user_id, grp
    HAVING count(*) >= 4
    """,
)
def rel_rising_runs(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE-shaped sequence pattern (``A B+`` with
    ``B.value > PREV(value)``): maximal strictly-rising runs of ``value``
    per user, reported when the run spans >= 4 events — the momentum /
    escalation detector engines with row-pattern matching sell, expressed
    as the gaps-and-islands composition every engine can run: change flag
    (lag) -> running sum island id -> per-island aggregate, with
    ``min_by``/``max_by`` recovering the run endpoints without a join
    back.  All windows partition by user_id (parallel at any user count;
    never a global ordering).  ``gain`` is one subtraction of two parquet
    doubles — both engines compute the identical IEEE operation on
    identical operands, so no rounding is involved (ROUNDING_AUDIT
    class: raw-double pass-through)."""
    ev = t(spark, sf, "events").select("user_id", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev = F.lag("value").over(w)
    marked = ev.withColumn(
        "brk",
        F.when(prev.isNotNull() & (F.col("value") > prev), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped = marked.withColumn("grp", F.sum("brk").over(run))
    return (
        grouped.groupBy("user_id", "grp")
        .agg(
            F.min("event_id").cast("bigint").alias("start_id"),
            F.max("event_id").cast("bigint").alias("end_id"),
            F.count("*").cast("bigint").alias("run_len"),
            (F.max_by("value", "event_id") - F.min_by("value", "event_id")).alias(
                "gain"
            ),
        )
        .where(F.col("run_len") >= 4)
        .drop("grp")
    )


@q(
    "rel_grouped_mode",
    """
    WITH cnt AS (
      SELECT n_name, o_orderpriority, count(*) AS c
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, o_orderpriority),
    r AS (
      SELECT n_name, o_orderpriority, c,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY c DESC, o_orderpriority ASC) AS rk
      FROM cnt)
    SELECT n_name,
           o_orderpriority AS modal_priority,
           CAST(c AS BIGINT) AS n_orders
    FROM r WHERE rk = 1
    """,
)
def rel_grouped_mode(spark: SparkSession, sf: str) -> DataFrame:
    """MODE() per group with a DETERMINISTIC tie-break: the most frequent
    order priority per customer nation (max count, ties to the
    lexicographically smallest value) — engines ship ``mode()`` with
    unspecified tie order, which is exactly the nondeterminism a graded
    pipeline can't accept, so the engine expresses it as count -> ranked
    window -> rk=1 (same two-shuffle plan ``mode()`` needs internally,
    plus WindowGroupLimit pruning the rank).  Dims broadcast; the only
    real shuffle keys are (n_name, priority) count partials."""
    o = t(spark, sf, "orders").select("o_custkey", "o_orderpriority")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    cnt = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "o_orderpriority")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("c").desc(), F.col("o_orderpriority").asc()
    )
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "n_name",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("c").cast("bigint").alias("n_orders"),
        )
    )


@q(
    "doc_simhash_recall",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
    h AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS hv FROM toks),
    bits AS (
      SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
      FROM h, range(0, 60) r(j) GROUP BY doc_id, j),
    sh AS (
      SELECT doc_id, sum(CASE WHEN c > 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS sh
      FROM bits GROUP BY doc_id),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.sh, b.sh)) AS ham
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= 6),
    banded AS (
      SELECT doc_id, sh, b AS band, (sh >> (15 * b)) & 32767 AS key
      FROM sh, range(0, 4) r(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    tb AS (
      SELECT id_a, id_b,
             CASE WHEN ham <= 2 THEN '0-2'
                  WHEN ham <= 4 THEN '3-4'
                  ELSE '5-6' END AS bucket
      FROM truth),
    hits AS (
      SELECT t.bucket, count(*) AS n_caught
      FROM tb t JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
      GROUP BY t.bucket)
    SELECT t.bucket, CAST(count(*) AS BIGINT) AS n_truth,
           CAST(coalesce(any_value(h.n_caught), 0) AS BIGINT) AS n_caught,
           CAST((2 * coalesce(any_value(h.n_caught), 0) * 1000000 + count(*))
                // (2 * count(*)) AS DOUBLE) / 1000000 AS recall
    FROM tb t LEFT JOIN hits h ON t.bucket = h.bucket
    GROUP BY t.bucket
    """,
)
def doc_simhash_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Measured recall of the production 4x15-bit SimHash banding against
    the EXACT Hamming <= 6 truth, per distance bucket — completes the
    approximate-index quality-report family (minhash/IVF/LSH/PQ recalls)
    for the SimHash path.  The truth side is itself computed WITHOUT an
    all-pairs join: operators/dedup.simhash_hamming_truth splits the
    60-bit signature into 7 pigeonhole chunks (<= 6 differing bits must
    leave one chunk identical), so truth discovery is a chunk-key
    equi-join shuffling (id, signature) only — while the DuckDB oracle
    computes truth by BRUTE-FORCE all-pairs, so hash equality proves the
    pigeonhole blocking is lossless.  Expected shape: 4-band/15-bit
    blocking requires one clean band, certain at ham <= 3 only when
    errors cluster — recall decays across the 3-4 and 5-6 buckets; the
    report makes the decay measurable.  Recall ratios are round6_ratio
    integer half-up; bucket edges are integer comparisons."""
    return _simhash_recall_report(t_spread(spark, sf, "documents"))


def _simhash_recall_report(d: DataFrame) -> DataFrame:
    """Shared body of doc_simhash_recall and its hash-sampled variant:
    pigeonhole-blocked exact Hamming truth vs 4x15-bit banded
    candidates, recall per distance bucket."""
    from presto_ethereum_spark.operators.dedup import (
        round6_ratio,
        simhash_candidates,
        simhash_hamming_truth,
    )

    truth = simhash_hamming_truth(d, max_hamming=6).select(
        "id_a",
        "id_b",
        F.when(F.col("hamming") <= 2, F.lit("0-2"))
        .when(F.col("hamming") <= 4, F.lit("3-4"))
        .otherwise(F.lit("5-6"))
        .alias("bucket"),
    )
    # ONE pass over truth via left join + single aggregation — same
    # restructure (and same equivalence argument: cand is distinct) as
    # _minhash_recall_report; the old two-branch shape re-computed the
    # pigeonhole truth join once per branch.
    cand = simhash_candidates(d).select(
        "id_a", "id_b", F.lit(1).alias("_hit")
    )
    return (
        truth.join(cand, ["id_a", "id_b"], "left")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_truth"),
            F.count("_hit").alias("n_caught"),
        )
        .select(
            "bucket",
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_caught").cast("long").alias("n_caught"),
            round6_ratio(F.col("n_caught"), F.col("n_truth")).alias("recall"),
        )
    )


@q(
    "rel_weighted_median",
    """
    WITH g AS (
      SELECT l_returnflag AS rf, l_extendedprice AS p,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qs
      FROM lineitem GROUP BY l_returnflag, l_extendedprice),
    c AS (
      SELECT rf, p, qs,
             sum(qs) OVER (PARTITION BY rf ORDER BY p
                           ROWS UNBOUNDED PRECEDING) AS cum,
             sum(qs) OVER (PARTITION BY rf) AS tot
      FROM g)
    SELECT rf AS l_returnflag,
           min(p) AS weighted_median,
           CAST(any_value(tot) AS BIGINT) AS total_qty
    FROM c WHERE 2 * cum >= tot
    GROUP BY rf
    """,
)
def rel_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the robust
    location statistic training-mixture budgeting leans on, computed
    DETERMINISTICALLY: weights first collapse onto DISTINCT price points
    (groupBy), the cumulative weight runs over that unique ordering, and
    the median is the smallest price whose cumulative weight reaches half
    the total (2·cum >= tot in integers).  Collapsing before the window
    is what kills the tie hazard — per-row cumulative sums under equal
    sort keys are engine-order-dependent; per-distinct-value sums are
    unique.  The returned median is an exact parquet double selected by
    integer comparison, never computed.  Scale: one (rf, price) partial
    agg + a per-group window over distinct prices."""
    li = t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    g = li.groupBy("rf", "p").agg(F.sum("q").cast("bigint").alias("qs"))
    w = Window.partitionBy("rf").orderBy("p")
    c = g.select(
        "rf",
        "p",
        F.sum("qs")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("qs").over(Window.partitionBy("rf")).alias("tot"),
    )
    return (
        c.where(2 * F.col("cum") >= F.col("tot"))
        .groupBy(F.col("rf").alias("l_returnflag"))
        .agg(
            F.min("p").alias("weighted_median"),
            F.any_value("tot").cast("bigint").alias("total_qty"),
        )
    )


@q(
    "doc_zipf_slope",
    """
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
    c AS (
      SELECT lang, tok, count(*) AS c FROM toks WHERE tok <> ''
      GROUP BY lang, tok),
    r AS (
      SELECT lang, c,
             row_number() OVER (PARTITION BY lang
                                ORDER BY c DESC, tok) AS r
      FROM c),
    xy AS (
      SELECT lang, c, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM r WHERE r <= 256),
    agg AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(max(c) AS BIGINT) AS top_count,
             sum(x * y) AS sxy, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx
      FROM xy GROUP BY lang)
    SELECT lang, n AS n_types, top_count,
           round(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0 THEN
                 (CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx) END, 6) AS slope,
           round(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0 THEN
                 (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
                 / CAST(n AS DOUBLE) END, 6) AS intercept
    FROM agg
    """,
)
def doc_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf rank-frequency fit per language (operators/text.zipf_slope):
    OLS slope of ln(count) vs ln(rank) over each language's 256 most
    frequent tokens — the distribution-health diagnostic a corpus
    curation pipeline runs per source/language slice (natural text sits
    near slope -1; template/boilerplate slices flatten it).  Ranks are a
    total order (count DESC, token ASC) so both engines fit the same
    exact integer sequence; slope/intercept pass through ln ->
    irrational, the audited-safe round(,6) class, and the OLS sums are
    256-bounded so cross-engine ulp drift never reaches digit 7.  Plan:
    one map-side-combined (lang, token) count shuffle collapses the
    corpus to a vocabulary-sized table; the row_number <= k filter
    triggers WindowGroupLimit pushdown ahead of the per-lang sort."""
    from presto_ethereum_spark.operators.text import zipf_slope

    return zipf_slope(t_spread(spark, sf, "documents"), top_k=256)


@q(
    "doc_sorted_neighborhood",
    """
    WITH p AS (
      SELECT doc_id AS id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents),
    r AS (
      SELECT id,
             row_number() OVER (ORDER BY substr(norm, 1, 40), id) AS rn
      FROM p),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(b.rn - a.rn AS BIGINT) AS gap
      FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 7),
    toks AS (
      SELECT id,
             list_distinct(list_filter(string_split(norm, ' '),
                                       x -> x <> '')) AS ts
      FROM p),
    j AS (
      SELECT id_a, id_b, gap,
             CAST(len(list_intersect(ta.ts, tb.ts)) AS BIGINT) AS i,
             CAST(len(ta.ts) + len(tb.ts)
                  - len(list_intersect(ta.ts, tb.ts)) AS BIGINT) AS u
      FROM cand JOIN toks ta ON id_a = ta.id JOIN toks tb ON id_b = tb.id)
    SELECT id_a, id_b, gap,
           CAST((2 * i * 1000000 + u) // (2 * u) AS DOUBLE) / 1000000
             AS jaccard
    FROM j WHERE u > 0 AND i * 1000000 >= 500000 * u
    """,
)
def doc_sorted_neighborhood(spark: SparkSession, sf: str) -> DataFrame:
    """Sorted-neighborhood dedup blocking (operators/dedup.
    sorted_neighborhood_pairs; merge/purge, Hernández & Stolfo 1995):
    rank the corpus by a 40-char normalized-prefix key, pair every two
    docs within 7 ranks, keep pairs with token-set Jaccard >= 0.5 — the
    blocking family member LSH does not subsume (shared openings with
    divergent tails sort adjacent without any band collision).  The
    global rank is the scalable two-pass form (range exchange of thin
    keys + per-partition row_number + broadcast offsets — never a
    single-partition window); neighborhood pairing is an equi-join on
    rank bands; the Jaccard threshold compares integers and the report
    is round6_ratio, so no double decides membership."""
    from presto_ethereum_spark.operators.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(
        t_spread(spark, sf, "documents"), window=8, key_len=40, min_jaccard=0.5
    )


@q(
    "rel_audience_overlap",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    o AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2),
    c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut
          GROUP BY 1)
    SELECT item_a, item_b, n_both, ca.n AS n_a, cb.n AS n_b,
           CAST((2 * n_both * 1000000 + (ca.n + cb.n - n_both))
                // (2 * (ca.n + cb.n - n_both)) AS DOUBLE) / 1000000
             AS jaccard
    FROM o JOIN c ca ON item_a = ca.event_type
           JOIN c cb ON item_b = cb.event_type
    """,
)
def rel_audience_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Exact audience-overlap matrix over event types
    (operators/frequency.cooccurrence_overlap): distinct users reached
    by each event-type pair jointly and separately, with Jaccard
    overlap — the segment-overlap report behind source-mixture and
    dedup-budget decisions.  ONE corpus shuffle (groupBy user) collapses
    events to per-user sorted item arrays; pairs explode JVM-side into a
    map-side-combined count; per-item reach joins back broadcast.  The
    oracle's classic formulation self-joins the distinct (user, type)
    table — two shuffles plus join fan-out the array plan avoids."""
    from presto_ethereum_spark.operators.frequency import cooccurrence_overlap

    return cooccurrence_overlap(t(spark, sf, "events"), "user_id", "event_type")


@q(
    "doc_ks_drift",
    """
    WITH c AS (
      SELECT source AS sl, n_chars AS v, count(*) AS cnt
      FROM documents GROUP BY 1, 2),
    s AS (SELECT DISTINCT sl FROM c),
    pr AS (SELECT a.sl AS sa, b.sl AS sb FROM s a JOIN s b ON a.sl < b.sl),
    m AS (
      SELECT pr.sa, pr.sb, c.v, c.cnt AS ca, 0 AS cb
      FROM pr JOIN c ON c.sl = pr.sa
      UNION ALL
      SELECT pr.sa, pr.sb, c.v, 0, c.cnt
      FROM pr JOIN c ON c.sl = pr.sb),
    g AS (SELECT sa, sb, v, sum(ca) AS ca, sum(cb) AS cb
          FROM m GROUP BY 1, 2, 3),
    w AS (
      SELECT sa, sb,
             sum(ca) OVER (PARTITION BY sa, sb ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(cb) OVER (PARTITION BY sa, sb ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum_b,
             sum(ca) OVER (PARTITION BY sa, sb) AS na,
             sum(cb) OVER (PARTITION BY sa, sb) AS nb
      FROM g)
    SELECT sa AS slice_a, sb AS slice_b,
           CAST(any_value(na) AS BIGINT) AS n_a,
           CAST(any_value(nb) AS BIGINT) AS n_b,
           CAST(max(abs(CAST(cum_a AS HUGEINT) * nb
                        - CAST(cum_b AS HUGEINT) * na)) AS BIGINT) AS ks_num,
           CAST((max(abs(CAST(cum_a AS HUGEINT) * nb
                         - CAST(cum_b AS HUGEINT) * na)) * 1000000)
                // (CAST(any_value(na) AS HUGEINT) * any_value(nb))
             AS BIGINT) AS ks_e6
    FROM w GROUP BY sa, sb
    """,
)
def doc_ks_drift(spark: SparkSession, sf: str) -> DataFrame:
    """All-pairs two-sample Kolmogorov–Smirnov drift over document
    lengths per source (operators/text.ks_drift): the ordered-axis
    shift monitor TV drift cannot provide.  Exact integers end-to-end —
    ``ks_num = max_v |cum_a·n_b − cum_b·n_a|`` over the merged distinct
    value axis, reported as the floored ``ks_e6`` via DECIMAL(38,0)
    products and integral DIV (the ``tv_e6`` discipline, mirrored by
    HUGEINT in the oracle).  One corpus shuffle to (source, length)
    counts; the S² pair grid is broadcast; per-pair cumulative windows
    run in parallel over domain-bounded partitions."""
    from presto_ethereum_spark.operators.text import ks_drift

    return ks_drift(t(spark, sf, "documents"), "source", "n_chars")


@q(
    "emb_hard_negatives",
    f"""
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           b.label AS neighbor_label,
           round({_DUCK_COSINE}, 6) AS sim,
           CAST(row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_DUCK_COSINE} DESC, b.vec_id)
             AS INT) AS rank
    FROM embeddings a JOIN embeddings b
      ON a.vec_id != b.vec_id AND a.label != b.label
    WHERE a.vec_id < 5
    QUALIFY rank <= 5
    """,
)
def emb_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for 5 anchors (operators/similarity.
    hard_negatives): top-5 cosine neighbors with a DIFFERENT label —
    the contrastive-batch construction step (FaceNet-style mining).
    Broadcast anchors, one map-side corpus scan with the bit-stable
    staged cosine, label-mismatch filter ahead of the WindowGroupLimit
    top-k."""
    from presto_ethereum_spark.operators.similarity import hard_negatives

    e = t_spread(spark, sf, "embeddings", parts=8)
    return hard_negatives(e, e.where(F.col("vec_id") < 5), k=5)


@q(
    "doc_minhash_calibration",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_SIG},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    agree AS (
      SELECT c.id_a, c.id_b,
             len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
               AS n_agree
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.id_a
      JOIN sigs sb ON sb.doc_id = c.id_b),
    {_DUCK_TRUTH_TP},
    j AS (
      SELECT a.n_agree,
             coalesce((2 * tp.inter * 1000000
                       + (tp.sz_a + tp.sz_b - tp.inter))
                      // (2 * (tp.sz_a + tp.sz_b - tp.inter)), 0) AS j_e6
      FROM agree a LEFT JOIN tp
        ON tp.id_a = a.id_a AND tp.id_b = a.id_b)
    SELECT CAST(n_agree AS INT) AS n_agree,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST((2 * n_agree * 1000000 + 16) // 32 AS BIGINT) AS est_e6,
           CAST((2 * sum(j_e6) + count(*)) // (2 * count(*)) AS BIGINT)
             AS mean_exact_e6
    FROM j GROUP BY n_agree
    """,
)
def doc_minhash_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash estimator calibration (operators/dedup.minhash_calibration):
    per signature-agreement count over the banded candidates, the
    estimator value agree/16 next to the mean exact df-capped Jaccard —
    measures on the real corpus whether E[agree/16] = J holds well
    enough to use the estimate as the dedup score (banding-selection
    bias included).  Completes the LSH quality family: recall (found?),
    band curve (budget), threshold curve (cutoff), calibration
    (accurate?).  All graded columns are half-up ppm integers quantized
    per pair BEFORE averaging; candidates reuse the (band, key)
    exchange; the <= 17-row report is counter-sized."""
    from presto_ethereum_spark.operators.dedup import minhash_calibration

    return minhash_calibration(t_spread(spark, sf, "documents"))


@q(
    "doc_dup_rate_by_source",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLED},
    {_DUCK_JACCARD_IPAIRS},
    pairs AS (
      SELECT id_a, id_b FROM ipairs
      WHERE inter::DOUBLE / (sz_a + sz_b - inter) >= 0.2),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, root) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.root FROM reach r JOIN edges e ON e.s = r.id),
    comp AS (SELECT id AS doc_id, min(root) AS cluster_id
             FROM reach GROUP BY id)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(c.cluster_id) AS BIGINT) AS n_dup_docs,
           CAST(count(DISTINCT c.cluster_id) AS BIGINT) AS n_clusters,
           CAST((2 * count(c.cluster_id) * 1000000 + count(*))
                // (2 * count(*)) AS BIGINT) AS dup_rate_e6
    FROM documents d LEFT JOIN comp c USING (doc_id)
    GROUP BY d.source
    """,
)
def doc_dup_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source near-duplication impact report — the data-governance
    read-out a mixing pipeline consults before weighting sources: for
    each source, how many documents sit in a near-dup cluster (df-capped
    jaccard_pairs at 0.2 within language blocks -> connected components,
    the doc_cluster_safe_split machinery) and the round-half-up dup rate
    in ppm.  Clusters may span sources, so the report counts MEMBERSHIP
    per source (distinct clusters touched), not removable rows — that
    accounting belongs to doc_dedup_keepers.  The corpus-side cost is
    one pair join bounded by the df cap; the report itself is a
    source-domain-sized aggregate over a pair-list-sized cluster table
    (singletons never enter the closure)."""
    from presto_ethereum_spark.operators.dedup import dup_clusters, jaccard_pairs

    docs = t_spread(spark, sf, "documents")
    pairs = jaccard_pairs(docs, threshold=0.2, blocking_cols=["lang"], max_df=8)
    clusters = dup_clusters(pairs.select("id_a", "id_b"))
    # the cluster table is pair-list-sized (singletons never enter the
    # closure) — orders of magnitude smaller than the corpus: broadcast
    # it so the report never shuffles documents (the plan otherwise
    # planned a SortMergeJoin on doc_id)
    per_doc = docs.select("doc_id", "source").join(
        F.broadcast(clusters.select("doc_id", "cluster_id")), "doc_id", "left"
    )
    n = F.count("*")
    nd = F.count("cluster_id")
    return (
        per_doc.groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            nd.cast("long").alias("n_dup_docs"),
            F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        )
        .withColumn(
            # exact half-up ppm via DECIMAL(38,0) div (never a double `/`,
            # which can round up across the integer boundary `//` floors)
            "dup_rate_e6",
            F.expr(
                "CAST((2 * CAST(n_dup_docs AS DECIMAL(38,0)) * 1000000"
                " + n_docs) div (2 * CAST(n_docs AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ),
        )
    )


@q(
    "doc_tfidf_topk",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM tok WHERE term != '' GROUP BY 1, 2),
    dfx AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY 1),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfx.df_docs,
             tf.tf * ln((nd.n_docs + 1.0) / (dfx.df_docs + 1.0)) AS score
      FROM tf JOIN dfx USING (term), nd)
    SELECT doc_id, term,
           CAST(tf AS BIGINT) AS tf,
           CAST(df_docs AS BIGINT) AS df_docs,
           round(score, 6) AS tfidf,
           CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
)
def doc_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-5 TF-IDF keywords (operators/text.tfidf_topk) —
    the classic featurizer read-out next to doc_rake_keywords
    (degree/frequency) and the corpus-global doc_top_terms vocabulary:
    tf x ln((N+1)/(df+1)), smoothed IDF shared with top_terms, ranked
    per doc with term tie-breaks.  One (doc, term) shuffle into a
    persisted tf table that feeds both the df aggregate and the scoring
    join (one tokenize pass, not one per consumer); the scalar N
    broadcasts; per-doc top-k is a WindowGroupLimit."""
    from presto_ethereum_spark.operators.text import tfidf_topk

    return tfidf_topk(t_spread(spark, sf, "documents"), k=5)


@q(
    "emb_power_iteration",
    """
    WITH ev AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    it1 AS (
      SELECT CAST(i - 1 AS INT) AS dim,
             CAST(sum(CAST(floor(v[1] * v[i] * 1000000000000.0) AS BIGINT))
                  AS BIGINT) AS contrib_q
      FROM (SELECT v, unnest(generate_series(1, len(v))) AS i FROM ev)
      GROUP BY 1),
    w1 AS (SELECT list(CAST(contrib_q AS DOUBLE) / 1000000000000.0
                       ORDER BY dim) AS wv
           FROM it1),
    v1 AS (SELECT list_transform(
                    wv, x -> x / sqrt(list_dot_product(wv, wv))) AS vv
           FROM w1),
    it2 AS (
      SELECT CAST(i - 1 AS INT) AS dim,
             CAST(sum(CAST(floor(list_dot_product(e.v, v1.vv) * e.v[i]
                                 * 1000000000000.0) AS BIGINT))
                  AS BIGINT) AS contrib_q
      FROM ev e CROSS JOIN v1, unnest(generate_series(1, len(e.v))) t(i)
      GROUP BY 1)
    SELECT CAST(1 AS INT) AS iteration, dim, contrib_q FROM it1
    UNION ALL
    SELECT 2, dim, contrib_q FROM it2
    """,
)
def emb_power_iteration(spark: SparkSession, sf: str) -> DataFrame:
    """Two rounds of distributed power iteration toward the corpus's top
    principal direction (operators/similarity.power_iteration, v0 = e0):
    the spectral building block under PCA whitening / low-rank screens,
    computed without materializing the dim x dim Gram matrix — per round
    each row contributes (x·v)·x and the next direction is the
    normalized per-dimension sum.  The graded table is the fixed-point
    BIGINT iterate sums per (iteration, dim): contributions quantize
    per row BEFORE summing (pagerank discipline), the in-order dot
    matches list_dot_product exactly, and normalization between rounds
    runs on the same integers in both engines — so a fundamentally
    iterative float algorithm grades hash-exact.  One map pass + one
    (dim, BIGINT) shuffle per round."""
    from presto_ethereum_spark.operators.similarity import power_iteration

    e = t_spread(spark, sf, "embeddings", parts=8)
    return power_iteration(e, n_iters=2)


def _duck_cos_slice(x: str, y: str, d: int) -> str:
    """_duck_cos over the first ``d`` dimensions (1-based inclusive slice
    — same in-order accumulation, so bit-stable vs the Spark staged fold
    over F.slice)."""
    xs, ys = (
        f"(CAST({x} AS DOUBLE[]))[1:{d}]",
        f"(CAST({y} AS DOUBLE[]))[1:{d}]",
    )
    return (
        f"(list_dot_product({xs}, {ys})"
        f" / (sqrt(list_dot_product({xs}, {xs}))"
        f" * sqrt(list_dot_product({ys}, {ys}))))"
    )


def _prefix_dim_recall_oracle(dims=(8, 16, 32), k=10) -> str:
    sims = ",\n             ".join(
        f"{_duck_cos_slice('qv', 'nv', d)} AS sim_{d}" for d in dims
    )
    ranks = ",\n             ".join(
        f"row_number() OVER (PARTITION BY query_id ORDER BY sim_{d} DESC,"
        f" nid) AS r_{d}"
        for d in dims
    )
    hit_rows = "\n      UNION ALL ".join(
        f"SELECT {d} AS prefix_dim, count(*) AS n_hits FROM r"
        f" WHERE rf <= {k} AND r_{d} <= {k}"
        for d in dims
    )
    return f"""
    WITH a AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < 5),
    p AS (
      SELECT a.query_id, b.vec_id AS nid, a.qv, b.embedding AS nv
      FROM a JOIN embeddings b ON b.vec_id != a.query_id),
    s AS (
      SELECT query_id, nid,
             {_duck_cos('qv', 'nv')} AS sim_full,
             {sims}
      FROM p),
    r AS (
      SELECT query_id, nid,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim_full DESC, nid) AS rf,
             {ranks}
      FROM s),
    t AS (SELECT count(*) AS n_truth FROM r WHERE rf <= {k}),
    hits AS (
      {hit_rows}
      UNION ALL SELECT -1, n_truth FROM t)
    SELECT CAST(h.prefix_dim AS INT) AS prefix_dim,
           CAST(h.n_hits AS BIGINT) AS n_hits,
           CAST(t.n_truth AS BIGINT) AS n_truth,
           CAST((2 * h.n_hits * 1000000 + t.n_truth) // (2 * t.n_truth)
                AS DOUBLE) / 1000000 AS recall
    FROM hits h, t
    """


@q("emb_prefix_dim_recall", _prefix_dim_recall_oracle())
def emb_prefix_dim_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka truncation diagnostic (operators/similarity.
    prefix_dim_recall): recall@10 of cosine search over only the FIRST
    8/16/32 dimensions vs the full-width exact top-10 for the 5 probe
    queries — how narrow a stored/serving prefix can get before
    retrieval pays, the WIDTH member of the quantization-quality family
    (SQ8/PQ shrink precision, JL shrinks via projection, this shrinks by
    plain truncation, the MRL deployment trade).  One corpus pass stages
    every prefix's slice+norm per row; one window per width shares the
    query exchange; the -1 row is the full width (recall 1.0, the
    self-check).  Counters integer, recall via the round6_ratio exact
    contract."""
    from presto_ethereum_spark.operators.similarity import prefix_dim_recall

    e = t_spread(spark, sf, "embeddings", parts=8)
    return prefix_dim_recall(e, e.where(F.col("vec_id") < 5))


@q(
    "emb_triplet_mining",
    f"""
    WITH a AS (
      SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
      FROM embeddings WHERE vec_id < 5),
    sc AS (
      SELECT a.query_id, a.qlabel, b.vec_id AS nid, b.label AS nlabel,
             {_duck_cos('a.qvec', 'b.embedding')} AS sim
      FROM a JOIN embeddings b ON b.vec_id != a.query_id),
    p AS (
      SELECT query_id, nid, sim FROM (
        SELECT query_id, nid, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, nid) AS rnk
        FROM sc WHERE nlabel = qlabel) WHERE rnk = 1),
    n AS (
      SELECT query_id, nid, sim FROM (
        SELECT query_id, nid, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, nid) AS rnk
        FROM sc WHERE nlabel != qlabel) WHERE rnk = 1)
    SELECT a.query_id,
           p.nid AS pos_id, round(p.sim, 6) AS pos_sim,
           n.nid AS neg_id, round(n.sim, 6) AS neg_sim,
           round(p.sim - n.sim, 6) AS margin
    FROM a
    LEFT JOIN p ON p.query_id = a.query_id
    LEFT JOIN n ON n.query_id = a.query_id
    """,
)
def emb_triplet_mining(spark: SparkSession, sf: str) -> DataFrame:
    """Triplet assembly for 5 anchors (operators/similarity.
    triplet_mining): hardest same-label positive + hardest
    different-label negative per anchor, with the margin between them —
    the batch-construction step a FaceNet/InfoNCE trainer runs after
    emb_hard_negatives' one-sided mining; margin <= 0 marks anchors the
    loss actually learns from.  One broadcast-anchor corpus scan, ONE
    window over (query_id, same_label) so positives and negatives never
    rank against each other, counter-sized pivot to triplet rows; the
    margin subtracts raw sims before the round6, mirrored exactly by
    the oracle."""
    from presto_ethereum_spark.operators.similarity import triplet_mining

    e = t_spread(spark, sf, "embeddings", parts=8)
    return triplet_mining(e, e.where(F.col("vec_id") < 5))


def _duck_langid_kappa_oracle() -> str:
    sub = _duck_langid_confusion_oracle()
    return f"""
    WITH conf AS ({sub}),
    tot AS (
      SELECT sum(n) AS nd,
             sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END) AS agree
      FROM conf),
    r AS (SELECT true_lang AS cls, sum(n) AS rn FROM conf GROUP BY 1),
    c AS (SELECT pred_lang AS cls, sum(n) AS cn FROM conf GROUP BY 1),
    ch AS (
      SELECT sum(coalesce(rn, 0) * coalesce(cn, 0)) AS chance
      FROM r FULL JOIN c USING (cls))
    SELECT CAST(nd AS BIGINT) AS n_docs, CAST(agree AS BIGINT) AS n_agree,
           CAST(chance AS BIGINT) AS chance_num,
           CAST(CASE WHEN nd * agree - chance >= 0
                THEN (CAST(nd * agree - chance AS HUGEINT) * 1000000)
                     // (CAST(nd AS HUGEINT) * nd - chance)
                ELSE -((CAST(chance - nd * agree AS HUGEINT) * 1000000)
                       // (CAST(nd AS HUGEINT) * nd - chance))
           END AS BIGINT) AS kappa_e6
    FROM tot, ch
    """


@q("doc_langid_kappa", _duck_langid_kappa_oracle())
def doc_langid_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa of the language-ID classifier against ground truth —
    chance-corrected agreement, the single-number companion to the
    confusion matrix (doc_langid_confusion): kappa = (N·trace − Σ rᵢcᵢ)
    / (N² − Σ rᵢcᵢ) is a RATIONAL of exact integers, so the report is
    ``kappa_e6`` with sign-decomposed DECIMAL DIV (both engines floor
    the same non-negative magnitude; a raw signed floor would differ —
    Spark DIV truncates toward zero, DuckDB // floors).  Plan: one
    map-side corpus aggregation to the class-pair confusion (|classes|²
    rows); row/column marginals and the chance term are class-count-
    sized; scalars cross-join broadcast."""
    from presto_ethereum_spark.operators.text import lang_id

    d = t(spark, sf, "documents")
    conf = (
        d.select(
            F.col("lang").alias("t"), lang_id(F.col("text")).alias("p")
        )
        .groupBy("t", "p")
        .agg(F.count("*").alias("n"))
    )
    tot = conf.agg(
        F.sum("n").alias("nd"),
        F.sum(F.when(F.col("t") == F.col("p"), F.col("n")).otherwise(0)).alias(
            "agree"
        ),
    )
    r = conf.groupBy(F.col("t").alias("cls")).agg(F.sum("n").alias("rn"))
    c = conf.groupBy(F.col("p").alias("cls")).agg(F.sum("n").alias("cn"))
    ch = (
        r.join(c, "cls", "full")
        .select(
            (
                F.coalesce(F.col("rn"), F.lit(0))
                * F.coalesce(F.col("cn"), F.lit(0))
            ).alias("x")
        )
        .agg(F.sum("x").alias("chance"))
    )
    dec = "decimal(38,0)"
    return (
        tot.crossJoin(F.broadcast(ch))
        .select(
            F.col("nd").cast("long").alias("n_docs"),
            F.col("agree").cast("long").alias("n_agree"),
            F.col("chance").cast("long").alias("chance_num"),
            F.expr(
                f"CAST(CASE WHEN nd * agree - chance >= 0"
                f" THEN (CAST(nd * agree - chance AS {dec})"
                f"       * CAST(1000000 AS {dec}))"
                f"      DIV (CAST(nd AS {dec}) * CAST(nd AS {dec})"
                f"           - CAST(chance AS {dec}))"
                f" ELSE -((CAST(chance - nd * agree AS {dec})"
                f"         * CAST(1000000 AS {dec}))"
                f"        DIV (CAST(nd AS {dec}) * CAST(nd AS {dec})"
                f"             - CAST(chance AS {dec})))"
                f" END AS BIGINT)"
            ).alias("kappa_e6"),
        )
    )


@q(
    "eth_fee_oracle",
    f"""
    WITH g AS (
      SELECT tx_blocknumber // 100 AS bucket, tx_gasprice AS v,
             count(*) AS c
      FROM read_parquet('{ETH}/transaction.parquet')
      GROUP BY 1, 2),
    w AS (
      SELECT bucket, v,
             sum(c) OVER (PARTITION BY bucket ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY bucket) AS tot
      FROM g)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(any_value(tot) AS BIGINT) AS n,
           min(CASE WHEN cum * 5 >= 3 * tot THEN v END) AS p60,
           min(CASE WHEN cum * 20 >= 19 * tot THEN v END) AS p95
    FROM w GROUP BY bucket
    """,
)
def eth_fee_oracle(spark: SparkSession, sf: str) -> DataFrame:
    """Gas-price fee oracle per 100-block bucket (operators/stats.
    grouped_percentile_disc): the p60 "suggested" and p95 "priority"
    gas price, the SuggestPrice-style quantile report every wallet/node
    derives from recent chain history.  PERCENTILE_DISC selected by
    integer comparison over distinct-value cumulative counts — the
    result is an exact chain value, never an interpolation, so both
    engines agree bit-for-bit; both quantiles ride ONE window pass."""
    from presto_ethereum_spark.operators.stats import grouped_percentile_disc

    tx = _eth_tables(spark).table("transaction").select(
        F.expr("tx_blocknumber DIV 100").alias("bucket"), "tx_gasprice"
    )
    return grouped_percentile_disc(
        tx, ["bucket"], "tx_gasprice", [("p60", 3, 5), ("p95", 19, 20)]
    )


@q(
    "doc_ppjoin_pairs",
    """
    WITH n AS (
      SELECT doc_id AS id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                                              'g')), ' ') AS t
      FROM documents),
    p AS (
      SELECT id,
             list_distinct([CAST(('0x' || substring(md5(
                 array_to_string(t[i:i+2], ' ')), 1, 15)) AS BIGINT)
                            FOR i IN range(1, len(t) - 1)]) AS ts
      FROM n),
    t AS (SELECT id, unnest(ts) AS tok FROM p),
    sz AS (SELECT id, len(ts) AS s FROM p),
    ip AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
      FROM t a JOIN t b ON a.tok = b.tok AND a.id < b.id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST((2 * i * 1000000 + (sa.s + sb.s - i))
                // (2 * (sa.s + sb.s - i)) AS DOUBLE) / 1000000 AS jaccard
    FROM ip JOIN sz sa ON id_a = sa.id JOIN sz sb ON id_b = sb.id
    WHERE i * 5 >= 3 * (sa.s + sb.s - i)
    """,
)
def doc_ppjoin_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT Jaccard >= 0.6 similarity self-join via prefix filtering
    (operators/dedup.ppjoin_pairs; All-Pairs/PPJoin) over 3-word
    SHINGLE sets: only each doc's rarest ``|x| - ceil(0.6|x|) + 1``
    shingles enter the inverted index, plus the lossless size filter
    (t|x| <= |y| <= |x|/t) before the candidate distinct — yet the
    prefix-filtering lemma guarantees zero recall loss: the oracle is
    the FULL inverted-index join over every shingle, so gate equality
    at two scale factors is a standing losslessness proof.  Shingles,
    not words, are the set elements because prefix selectivity NEEDS
    rare elements — on this small-vocabulary corpus word-level prefixes
    admitted 78% of all pairs as candidates; shingle prefixes are rare
    by construction (the MinHash/inverted-index rarity argument).
    Shingles ride as 60-bit md5 hashes end-to-end — longs on every
    exchange and in the verification intersect, never text."""
    from presto_ethereum_spark.operators.dedup import ppjoin_pairs

    return ppjoin_pairs(
        t_spread(spark, sf, "documents"), threshold_num=3, threshold_den=5
    )


@q(
    "rel_chisq_independence",
    """
    WITH f AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
             CAST(l.l_returnflag = 'R' AS INT) AS is_r,
             CAST(l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS INT)
               AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    g AS (
      SELECT yr,
             sum(is_r * is_late) AS a, sum(is_r * (1 - is_late)) AS b,
             sum((1 - is_r) * is_late) AS c,
             sum((1 - is_r) * (1 - is_late)) AS d
      FROM f GROUP BY yr)
    SELECT CAST(yr AS BIGINT) AS yr,
           CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           CAST((CAST(a + b + c + d AS HUGEINT)
                 * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                 * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                 * 1000000)
                // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
             AS BIGINT) AS chisq_e6
    FROM g
    WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
    """,
)
def rel_chisq_independence(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson chi-square independence test per order-year: is RETURNED
    status associated with late shipment (>60 days after order)?  For a
    2x2 contingency the statistic is the exact RATIONAL
    N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — no expected-count doubles, no
    sums of squares — so ``chisq_e6`` is one DECIMAL(38,0) integral DIV
    both engines floor identically (HUGEINT in the oracle).  The whole
    test is ONE map-side conditional aggregation after the
    lineitem-orders join: four additive counters per group, the
    mergeable-state shape that survives any scale.  Precision bound:
    the widest product is N*(ad-bc)^2*1e6 <= N^3*1e6, inside
    DECIMAL(38,0)/HUGEINT up to ~1e7 rows per group; beyond that drop
    the e6 scale (chi-square is O(N), the quotient still fits) or
    accept a double statistic."""
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    f = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.year("o_orderdate").alias("yr"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_r"),
        (
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
        ).cast("int").alias("is_late"),
    )
    g = f.groupBy("yr").agg(
        F.sum(F.col("is_r") * F.col("is_late")).alias("a"),
        F.sum(F.col("is_r") * (1 - F.col("is_late"))).alias("b"),
        F.sum((1 - F.col("is_r")) * F.col("is_late")).alias("c"),
        F.sum((1 - F.col("is_r")) * (1 - F.col("is_late"))).alias("d"),
    )
    dec = "decimal(38,0)"
    return (
        g.where(
            ((F.col("a") + F.col("b")) > 0)
            & ((F.col("c") + F.col("d")) > 0)
            & ((F.col("a") + F.col("c")) > 0)
            & ((F.col("b") + F.col("d")) > 0)
        )
        .select(
            F.col("yr").cast("long").alias("yr"),
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("c").cast("long").alias("c"),
            F.col("d").cast("long").alias("d"),
            F.expr(
                f"CAST((CAST(a + b + c + d AS {dec})"
                f" * (CAST(a AS {dec}) * CAST(d AS {dec})"
                f"    - CAST(b AS {dec}) * CAST(c AS {dec}))"
                f" * (CAST(a AS {dec}) * CAST(d AS {dec})"
                f"    - CAST(b AS {dec}) * CAST(c AS {dec}))"
                f" * CAST(1000000 AS {dec}))"
                f" DIV (CAST(a + b AS {dec}) * CAST(c + d AS {dec})"
                f"      * CAST(a + c AS {dec}) * CAST(b + d AS {dec}))"
                f" AS BIGINT)"
            ).alias("chisq_e6"),
        )
    )


@q(
    "doc_count_cosine_pairs",
    """
    WITH tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest([array_to_string(t[i:i+2], ' ')
                     FOR i IN range(1, len(t) - 1)]) AS s
      FROM tt),
    c AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) AS hs,
             count(*) AS c
      FROM sh GROUP BY 1, 2),
    n2 AS (SELECT doc_id, sum(c * c) AS n2 FROM c GROUP BY 1),
    d AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.c * b.c) AS dot
      FROM c a JOIN c b ON a.hs = b.hs AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(dot AS BIGINT) AS dot,
           round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
    FROM d JOIN n2 na ON id_a = na.doc_id JOIN n2 nb ON id_b = nb.doc_id
    WHERE CAST(dot AS HUGEINT) * dot * 25
          >= CAST(9 AS HUGEINT) * na.n2 * nb.n2
    """,
)
def doc_count_cosine_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Shingle-COUNT cosine near-dup pairs at >= 0.6 (operators/dedup.
    count_cosine_pairs): the repetition-sensitive weighted companion to
    set-Jaccard.  Membership is decided by the all-integer squared
    comparison dot^2*den^2 >= num^2*|a|^2*|b|^2 in DECIMAL/HUGEINT; the
    reported cosine is round@6 of an irrational (audited-safe).  The
    inverted index and pair sums move 60-bit hashed shingles, never
    text."""
    from presto_ethereum_spark.operators.dedup import count_cosine_pairs

    return count_cosine_pairs(
        t_spread(spark, sf, "documents"), threshold_num=3, threshold_den=5
    )


@q(
    "rel_gini_revenue",
    """
    WITH x AS (
      SELECT n.n_name, c.c_custkey,
             coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
               AS cents
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY n.n_name, c.c_custkey),
    r AS (
      SELECT n_name, cents,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY cents, c_custkey) AS i
      FROM x),
    g AS (
      SELECT n_name, count(*) AS n, sum(cents) AS tot,
             sum(CAST(i AS HUGEINT) * cents) AS ranked
      FROM r GROUP BY n_name)
    SELECT n_name, CAST(n AS BIGINT) AS n_customers,
           CAST(tot AS BIGINT) AS total_cents,
           CAST(((2 * ranked - (n + 1) * CAST(tot AS HUGEINT)) * 1000000)
                // (CAST(n AS HUGEINT) * tot) AS BIGINT) AS gini_e6
    FROM g WHERE tot > 0
    """,
)
def rel_gini_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Gini concentration of customer revenue per nation — the
    inequality index behind "is this source dominated by a few heavy
    accounts" decisions (and the full-distribution complement to
    eth_token_concentration's top-1 share).  The rank formula
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over ascending-sorted LONG
    cents is an exact rational: equal values commute in Σ i·x_(i), so
    ANY tiebreak yields the same sum and the statistic is partition- and
    engine-invariant; ``gini_e6`` floors via DECIMAL(38,0) / HUGEINT.
    Zero-order customers enter at x=0 through the left join — inequality
    that dropping them would hide.  Plan: one join + per-nation sum,
    one per-nation rank window, one final aggregation."""
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf, "orders").select("o_custkey", cents.alias("cents"))
    x = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(o, o["o_custkey"] == c["c_custkey"], "left")
        .groupBy("n_name", "c_custkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"))
    )
    w = Window.partitionBy("n_name").orderBy("cents", "c_custkey")
    r = x.withColumn("i", F.row_number().over(w))
    dec = "decimal(38,0)"
    return (
        r.groupBy("n_name")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("tot"),
            F.sum(F.col("i").cast(dec) * F.col("cents").cast(dec)).alias(
                "ranked"
            ),
        )
        .where(F.col("tot") > 0)
        .select(
            "n_name",
            F.col("n").cast("long").alias("n_customers"),
            F.col("tot").cast("long").alias("total_cents"),
            F.expr(
                f"CAST(((CAST(2 AS {dec}) * ranked"
                f" - CAST(n + 1 AS {dec}) * CAST(tot AS {dec}))"
                f" * CAST(1000000 AS {dec}))"
                f" DIV (CAST(n AS {dec}) * CAST(tot AS {dec})) AS BIGINT)"
            ).alias("gini_e6"),
        )
    )


@q(
    "rel_abc_classification",
    """
    WITH x AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey),
    r AS (
      SELECT l_partkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cents) OVER () AS tot
      FROM x),
    cl AS (
      SELECT l_partkey, cents,
             CASE WHEN cum * 100 <= 80 * tot THEN 'A'
                  WHEN cum * 100 <= 95 * tot THEN 'B'
                  ELSE 'C' END AS cls
      FROM r)
    SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM cl GROUP BY cls
    """,
)
def rel_abc_classification(spark: SparkSession, sf: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: A = parts whose
    cumulative share stays within 80%, B to 95%, C the tail — the
    classic inventory-analytics operator.  Class boundaries compare
    INTEGERS (``cum*100 <= 80*tot`` over LONG cents), so membership is
    engine-exact; the (revenue DESC, partkey) order is total, making
    the cumulative sum deterministic.  Plan note: the global cumulative
    window runs over the PART-level aggregate (|parts| rows, not
    |lineitem|) — at 100 TB that is still a bounded dimension table;
    for an unbounded key, rank it with dedup.global_sorted_index and
    window per range partition + broadcast offsets instead."""
    li = t(spark, sf, "lineitem").select(
        "l_partkey",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    x = li.groupBy("l_partkey").agg(F.sum("cents").alias("cents"))
    w = Window.orderBy(F.desc("cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = x.select(
        "l_partkey",
        "cents",
        F.sum("cents").over(w).alias("cum"),
        F.sum("cents").over(
            Window.partitionBy()
        ).alias("tot"),
    )
    cl = r.withColumn(
        "cls",
        F.when(F.col("cum") * 100 <= 80 * F.col("tot"), F.lit("A"))
        .when(F.col("cum") * 100 <= 95 * F.col("tot"), F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return cl.groupBy("cls").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@q(
    "eth_graph_reciprocity",
    f"""
    WITH e AS (
      SELECT DISTINCT tx_from AS s, tx_to AS d
      FROM read_parquet('{ETH}/transaction.parquet')
      WHERE tx_to IS NOT NULL AND tx_from <> tx_to),
    m AS (
      SELECT count(*) AS n_recip
      FROM e a JOIN e b ON a.s = b.d AND a.d = b.s),
    t AS (SELECT count(*) AS n_edges FROM e)
    SELECT CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_recip AS BIGINT) AS n_reciprocal,
           CAST(n_recip / 2 AS BIGINT) AS n_mutual_pairs,
           CAST((2 * n_recip * 1000000 + n_edges) // (2 * n_edges)
             AS DOUBLE) / 1000000 AS reciprocity
    FROM t, m
    """,
)
def eth_graph_reciprocity(spark: SparkSession, sf: str) -> DataFrame:
    """Transfer-graph reciprocity: the fraction of distinct directed
    payment edges whose REVERSE edge also exists — the
    money-flows-back-and-forth signal (exchange hot wallets and
    wash-trading loops score high; one-way distribution trees score 0).
    One distinct-edge aggregation, one self equi-join on the reversed
    key pair — never an all-pairs product; counts are exact integers
    and the ratio is the round6 integer form.  Complements the
    PageRank/HITS/triangle family with the simplest digraph-symmetry
    statistic."""
    tx = _eth_tables(spark).table("transaction")
    e = (
        tx.where(
            F.col("tx_to").isNotNull() & (F.col("tx_from") != F.col("tx_to"))
        )
        .select(F.col("tx_from").alias("s"), F.col("tx_to").alias("d"))
        .distinct()
    )
    m = e.alias("a").join(
        e.alias("b"),
        (F.col("a.s") == F.col("b.d")) & (F.col("a.d") == F.col("b.s")),
    ).agg(F.count("*").alias("n_recip"))
    t_ = e.agg(F.count("*").alias("n_edges"))
    from presto_ethereum_spark.operators.dedup import round6_ratio

    return (
        t_.crossJoin(F.broadcast(m))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_recip").cast("long").alias("n_reciprocal"),
            F.expr("CAST(n_recip DIV 2 AS BIGINT)").alias("n_mutual_pairs"),
            round6_ratio(F.col("n_recip"), F.col("n_edges")).alias(
                "reciprocity"
            ),
        )
    )


@q(
    "rel_bucketed_join",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def rel_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-free co-located join via STORAGE BUCKETING
    (sources/sink.write_bucketed_table): both fact tables land bucketed
    (8 buckets) and sorted on the join key, so the SortMergeJoin reads
    bucket i against bucket i with NO exchange on either side — the
    Exchange under the join is absent from the executed plan (pinned in
    tests/test_sink.py and test_plan_shapes).  This is the pattern that
    replaces a 100 TB fact-fact shuffle with a one-time layout decision;
    the MERGE hint keeps AQE from broadcasting the small-SF orders side
    so the graded plan is the at-scale plan.  The oracle computes the
    same join from raw parquet — round-trip equality also re-verifies
    the bucketed WRITE path on every gate run."""
    from presto_ethereum_spark.sources.sink import write_bucketed_table

    o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    write_bucketed_table(o, "pes_bkt_orders", "o_orderkey", 8,
                         sort_col="o_orderkey")
    write_bucketed_table(li, "pes_bkt_lineitem", "l_orderkey", 8,
                         sort_col="l_orderkey")
    bo = spark.table("pes_bkt_orders")
    bl = spark.table("pes_bkt_lineitem")
    j = bl.hint("MERGE").join(bo, bl["l_orderkey"] == bo["o_orderkey"])
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@q(
    "rel_conversion_latency",
    """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
    v AS (SELECT user_id, min(t_us) AS v_us FROM e
          WHERE event_type = 'view' GROUP BY 1),
    pu AS (
      SELECT e.user_id, v.v_us, min(e.t_us) AS p_us
      FROM e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.t_us > v.v_us
      GROUP BY 1, 2),
    l AS (SELECT v_us // 604800000000 AS week_bucket,
                 p_us - v_us AS lat_us
          FROM pu),
    g AS (SELECT week_bucket, lat_us AS v, count(*) AS c
          FROM l GROUP BY 1, 2),
    w AS (
      SELECT week_bucket, v,
             sum(c) OVER (PARTITION BY week_bucket ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY week_bucket) AS tot
      FROM g)
    SELECT CAST(week_bucket AS BIGINT) AS week_bucket,
           CAST(any_value(tot) AS BIGINT) AS n,
           min(CASE WHEN cum * 2 >= tot THEN v END) AS p50,
           min(CASE WHEN cum * 10 >= 9 * tot THEN v END) AS p90,
           min(CASE WHEN cum * 100 >= 99 * tot THEN v END) AS p99
    FROM w GROUP BY week_bucket
    """,
)
def rel_conversion_latency(spark: SparkSession, sf: str) -> DataFrame:
    """First-view -> first-subsequent-purchase conversion latency,
    quantiled per epoch-week cohort (operators/stats.
    grouped_percentile_disc): the product-analytics companion to
    rel_funnel_steps — not HOW MANY convert but HOW FAST, as exact
    PERCENTILE_DISC microsecond values selected by integer comparison.
    Cohorts bucket on integer epoch-weeks (``v_us DIV 604800000000``) —
    calendar-free, so the statistic is timezone-immune by construction
    (the tz robustness audit covers it for free).  Plan: two
    event-slice groupBy-min passes and one user equi-join build the
    per-user latency table; the quantile scaffold is the shared
    one-window form."""
    from presto_ethereum_spark.operators.stats import grouped_percentile_disc

    ev = t(spark, sf, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("t_us")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t_us").alias("v_us"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("t_us") > F.col("v_us"))
        .groupBy("user_id", "v_us")
        .agg(F.min("t_us").alias("p_us"))
    )
    lat = pu.select(
        F.expr("v_us DIV 604800000000").alias("week_bucket"),
        (F.col("p_us") - F.col("v_us")).alias("lat_us"),
    )
    return grouped_percentile_disc(
        lat,
        ["week_bucket"],
        "lat_us",
        [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)],
    )


@q(
    "eth_miner_hhi",
    f"""
    WITH c AS (
      SELECT block_number // 1000 AS epoch, block_miner AS miner,
             count(*) AS c
      FROM read_parquet('{ETH}/block.parquet')
      GROUP BY 1, 2),
    g AS (
      SELECT epoch, sum(c) AS n, sum(c * c) AS ss,
             count(*) AS n_miners, max(c) AS top_blocks
      FROM c GROUP BY epoch)
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(n AS BIGINT) AS n_blocks,
           CAST(n_miners AS BIGINT) AS n_miners,
           CAST(top_blocks AS BIGINT) AS top_blocks,
           CAST((CAST(ss AS HUGEINT) * 1000000) // (CAST(n AS HUGEINT) * n)
             AS BIGINT) AS hhi_e6
    FROM g
    """,
)
def eth_miner_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Miner-concentration Herfindahl–Hirschman index per 1000-block
    epoch: HHI = sum(share_i^2) = sum(c_i^2)/N^2 — the standard
    market-concentration statistic (1e6 = single-miner monopoly,
    1e6/k = k equal miners), completing the concentration triple next
    to the Gini index (rel_gini_revenue) and the top-1 share
    (eth_token_concentration).  Exact integers end-to-end: sum(c^2) and
    N^2 are BIGINTs, ``hhi_e6`` floors one DECIMAL(38,0)/HUGEINT DIV.
    Plan: two map-side-combined aggregations (epoch x miner, then
    epoch); nothing else moves."""
    b = _eth_tables(spark).table("block")
    c = b.groupBy(
        F.expr("block_number DIV 1000").alias("epoch"),
        F.col("block_miner").alias("miner"),
    ).agg(F.count("*").alias("c"))
    dec = "decimal(38,0)"
    return (
        c.groupBy("epoch")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
            F.count("*").alias("n_miners"),
            F.max("c").alias("top_blocks"),
        )
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            F.col("n").cast("long").alias("n_blocks"),
            F.col("n_miners").cast("long").alias("n_miners"),
            F.col("top_blocks").cast("long").alias("top_blocks"),
            F.expr(
                f"CAST((CAST(ss AS {dec}) * CAST(1000000 AS {dec}))"
                f" DIV (CAST(n AS {dec}) * CAST(n AS {dec})) AS BIGINT)"
            ).alias("hhi_e6"),
        )
    )


@q(
    "doc_token_burstiness",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    pd AS (
      SELECT doc_id, tok, count(*) AS c FROM toks WHERE tok <> ''
      GROUP BY 1, 2),
    pt AS (
      SELECT tok, count(*) AS df, sum(c) AS s1, sum(c * c) AS s2
      FROM pd GROUP BY tok),
    top AS (SELECT * FROM pt ORDER BY s1 DESC, tok LIMIT 100),
    nd AS (SELECT count(*) AS n FROM documents)
    SELECT tok, CAST(df AS BIGINT) AS df, CAST(s1 AS BIGINT) AS total_c,
           CAST(((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
                 * 1000000)
                // (CAST(n - 1 AS HUGEINT) * s1) AS BIGINT) AS vmr_e6
    FROM top, nd
    """,
)
def doc_token_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Burstiness / Fano factor of the 100 highest-mass tokens
    (operators/text.token_burstiness): VMR = (n·Σc² − (Σc)²)/((n−1)·Σc)
    over per-document counts with absent docs as algebraic zeros — the
    Church & Gale content-vs-function-word separator raw frequency
    can't provide.  Exact integer power sums, DECIMAL/HUGEINT vmr_e6,
    one vocabulary aggregation + global top-k + broadcast n."""
    from presto_ethereum_spark.operators.text import token_burstiness

    return token_burstiness(t_spread(spark, sf, "documents"), k=100)


@q(
    "rel_interarrival_burstiness",
    """
    WITH e AS (
      SELECT event_type, user_id, epoch_us(ts) AS t_us, event_id
      FROM events),
    g AS (
      SELECT event_type,
             t_us - lag(t_us) OVER (PARTITION BY event_type, user_id
                                    ORDER BY t_us, event_id) AS gap
      FROM e),
    f AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL AND gap > 0),
    a AS (
      SELECT event_type, count(*) AS n, sum(gap) AS s1,
             sum(CAST(gap AS HUGEINT) * gap) AS s2
      FROM f GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           CAST(s1 AS BIGINT) AS total_gap_us,
           CAST((CAST(n AS HUGEINT) * s2 * 1000000)
                // (CAST(s1 AS HUGEINT) * s1) - 1000000 AS BIGINT)
             AS cv2_minus1_e6
    FROM a WHERE n >= 2
    """,
)
def rel_interarrival_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-arrival burstiness per event type: CV² − 1 of the per-user
    gap distribution (0 for a Poisson process, > 0 for bursty sessions,
    < 0 for pacemaker-regular traffic) — the temporal twin of
    doc_token_burstiness, used to pick sessionization gaps and detect
    bot-regular streams.  CV² = n·Σg²/(Σg)² is an exact rational of
    integer microsecond gaps; the report subtracts 1e6 AFTER the
    non-negative DECIMAL/HUGEINT floor so both engines shift the same
    integer.  One window pass ordered by the total (t_us, event_id)
    order builds gaps; one map-side aggregation folds the power sums."""
    ev = t(spark, sf, "events").select(
        "event_type",
        "user_id",
        F.expr("ts DIV 1000").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("t_us", "event_id")
    g = ev.select(
        "event_type", (F.col("t_us") - F.lag("t_us").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull() & (F.col("gap") > 0))
    dec = "decimal(38,0)"
    return (
        g.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("gap").alias("s1"),
            F.sum(F.col("gap").cast(dec) * F.col("gap").cast(dec)).alias("s2"),
        )
        .where(F.col("n") >= 2)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_gaps"),
            F.col("s1").cast("long").alias("total_gap_us"),
            F.expr(
                f"CAST((CAST(n AS {dec}) * CAST(s2 AS {dec})"
                f" * CAST(1000000 AS {dec}))"
                f" DIV (CAST(s1 AS {dec}) * CAST(s1 AS {dec}))"
                f" - 1000000 AS BIGINT)"
            ).alias("cv2_minus1_e6"),
        )
    )


@q(
    "eth_whale_clusters",
    f"""
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT tx_from AS s, tx_to AS d
      FROM read_parquet('{ETH}/transaction.parquet')
      WHERE tx_to IS NOT NULL AND tx_from <> tx_to
        AND tx_value > 9000000000000000000),
    edges AS (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0),
    reach(id, root) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.root FROM reach r JOIN edges e ON e.s = r.id),
    comp AS (SELECT id AS address, min(root) AS cluster_id
             FROM reach GROUP BY id)
    SELECT address, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size
    FROM comp
    """,
)
def eth_whale_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Wallet clustering over HIGH-VALUE transfers (> 9 ETH in wei):
    weakly-connected components of the whale-transfer graph — the
    chain-analytics grouping step ("which addresses move large funds
    among themselves") — reusing the SAME pointer-jumping min-label
    machinery as document dup-clusters (operators/dedup.
    connected_components: O(log n) rounds, two long/string-keyed hash
    joins per round, localCheckpoint-bounded lineage; addresses compare
    lexicographically, which both engines share).  The value threshold
    is what keeps this analytically meaningful AND keeps components
    small — the full transfer graph collapses into one giant component
    where per-cluster semantics (and the recursive-CTE oracle) are
    useless.  cluster_id = lexicographic min address of the component."""
    from presto_ethereum_spark.operators.dedup import dup_clusters

    tx = _eth_tables(spark).table("transaction")
    e = (
        tx.where(
            F.col("tx_to").isNotNull()
            & (F.col("tx_from") != F.col("tx_to"))
            & (F.col("tx_value") > 9e18)
        )
        .select(F.col("tx_from").alias("id_a"), F.col("tx_to").alias("id_b"))
        .distinct()
    )
    return dup_clusters(e).withColumnsRenamed({"doc_id": "address"})


@q(
    "multimodal_phash_pairs",
    """
    WITH d AS (SELECT doc_id AS id, text, length(text) AS L
               FROM documents WHERE length(text) >= 60),
    c AS (SELECT id, L,
                 [ascii(substring(text, j, 1))
                  FOR j IN range(1, L + 1)] AS codes
          FROM d),
    t2 AS (SELECT id, L, codes, list_sum(codes) AS total FROM c),
    b AS (
      SELECT id, L, total, i,
             list_sum(codes[(i * L) // 60 + 1 : ((i + 1) * L) // 60])
               AS span,
             ((i + 1) * L) // 60 - (i * L) // 60 AS slen
      FROM t2, unnest(range(0, 60)) AS r(i)),
    ph AS (
      SELECT id,
             CAST(sum(CASE WHEN span * L > total * slen
                      THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS phash
      FROM b GROUP BY id),
    bd AS (
      SELECT id, phash, i AS band,
             (phash >> (i * 8)) & 255 AS key
      FROM ph, unnest(range(0, 7)) AS q(i)),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             a.phash AS ha, b.phash AS hb
      FROM bd a JOIN bd b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id)
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 6
    """,
)
def multimodal_phash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual near-duplicate pairs over the media byte column
    (operators/multimodal.perceptual_hash + phash_near_dup_pairs):
    60-bit average-hash signatures from an Arrow mapInPandas numpy
    kernel (one cumsum serves all spans; bit decisions are exact
    integer compares), banded 7x8-bit blocking — max_hamming + 1 bands,
    so capture is LOSSLESS by pigeonhole — Hamming <= 6 verify via
    xor/bit_count: the perceptual companion to multimodal_dedup's
    exact sha256, catching assets that byte-level dedup misses.  The
    oracle replicates the signature closed-form over the ASCII fixture
    bytes, so the gate checks the full kernel -> blocking -> verify
    chain bit-for-bit."""
    from presto_ethereum_spark.operators.multimodal import (
        media_from_documents,
        phash_near_dup_pairs,
    )

    media = media_from_documents(t_spread(spark, sf, "documents", parts=8))
    return phash_near_dup_pairs(media, max_hamming=6)


@q(
    "emb_jl_recall",
    """
    WITH r AS (
      SELECT j, d,
             CASE (CAST(('0x' || substring(md5('jl:' || j || ':' || d),
                                           1, 15)) AS BIGINT) % 6)
               WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS w
      FROM (SELECT unnest(range(0, 64)) AS j),
           (SELECT unnest(range(0, 16)) AS d)),
    vq AS (
      SELECT vec_id AS id,
             [CAST(floor(CAST(embedding[j] AS DOUBLE) * 1048576) AS BIGINT)
              FOR j IN range(1, 65)] AS v
      FROM embeddings),
    jl AS (
      SELECT id, d, sum(v[j + 1] * w) AS p
      FROM vq, r GROUP BY id, d),
    jlv AS (SELECT id, list(p ORDER BY d) AS v FROM jl GROUP BY id),
    pe AS (
      SELECT a.id AS query_id, b.id AS neighbor_id,
             list_sum([(a.v[i] - b.v[i]) * (a.v[i] - b.v[i])
                       FOR i IN range(1, 65)]) AS d2
      FROM vq a, vq b WHERE a.id < 5 AND a.id <> b.id),
    te AS (
      SELECT query_id, list_sort(list(neighbor_id)) AS exact_ids
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY d2, neighbor_id) AS rk
            FROM pe) WHERE rk <= 10 GROUP BY query_id),
    pj AS (
      SELECT a.id AS query_id, b.id AS neighbor_id,
             list_sum([(a.v[i] - b.v[i]) * (a.v[i] - b.v[i])
                       FOR i IN range(1, 17)]) AS d2
      FROM jlv a, jlv b WHERE a.id < 5 AND a.id <> b.id),
    tj AS (
      SELECT query_id, list_sort(list(neighbor_id)) AS jl_ids
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY d2, neighbor_id) AS rk
            FROM pj) WHERE rk <= 10 GROUP BY query_id)
    SELECT query_id,
           CAST(len(list_intersect(exact_ids, jl_ids)) AS BIGINT)
             AS n_overlap,
           CAST((2 * len(list_intersect(exact_ids, jl_ids)) * 1000000 + 10)
                // 20 AS DOUBLE) / 1000000 AS recall
    FROM te JOIN tj USING (query_id)
    """,
)
def emb_jl_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson–Lindenstrauss projection fidelity (operators/similarity.
    jl_project_quantized + jl_recall_report): recall@10 of projected
    (64 -> 16 dims, deterministic Achlioptas ±1/0 matrix from md5)
    squared-L2 retrieval against full-dimension truth — ENGINE-EXACT
    end-to-end because vectors quantize to integers before projection
    (float32 * 2^20 is an exact exponent shift) and every distance and
    rank is then a BIGINT total order.  The scale story: serving reads
    16 longs instead of 64 floats per row; the projection itself is a
    map-side fold with the matrix as plan literals."""
    from presto_ethereum_spark.operators.similarity import jl_recall_report

    return jl_recall_report(
        t_spread(spark, sf, "embeddings", parts=8), n_queries=5, k=10
    )


@q(
    "emb_jl_rerank_topk",
    """
    WITH r AS (
      SELECT j, d,
             CASE (CAST(('0x' || substring(md5('jl:' || j || ':' || d),
                                           1, 15)) AS BIGINT) % 6)
               WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS w
      FROM (SELECT unnest(range(0, 64)) AS j),
           (SELECT unnest(range(0, 16)) AS d)),
    vq AS (
      SELECT vec_id AS id,
             [CAST(floor(CAST(embedding[j] AS DOUBLE) * 1048576) AS BIGINT)
              FOR j IN range(1, 65)] AS v
      FROM embeddings),
    jl AS (SELECT id, d, sum(v[j + 1] * w) AS p FROM vq, r GROUP BY id, d),
    jlv AS (SELECT id, list(p ORDER BY d) AS v FROM jl GROUP BY id),
    s1 AS (
      SELECT a.id AS query_id, b.id AS neighbor_id,
             list_sum([(a.v[i] - b.v[i]) * (a.v[i] - b.v[i])
                       FOR i IN range(1, 17)]) AS pd2
      FROM jlv a, jlv b WHERE a.id < 5 AND a.id <> b.id),
    cand AS (
      SELECT query_id, neighbor_id
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY pd2, neighbor_id) AS r1
            FROM s1) WHERE r1 <= 50),
    rr AS (
      SELECT c.query_id, c.neighbor_id,
             list_sum([(qa.v[i] - nb.v[i]) * (qa.v[i] - nb.v[i])
                       FOR i IN range(1, 65)]) AS d2
      FROM cand c JOIN vq qa ON qa.id = c.query_id
                  JOIN vq nb ON nb.id = c.neighbor_id),
    top AS (
      SELECT query_id, neighbor_id, d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d2, neighbor_id) AS rank
      FROM rr QUALIFY rank <= 10),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.id AS query_id, b.id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.id
                 ORDER BY list_sum([(a.v[i] - b.v[i]) * (a.v[i] - b.v[i])
                                    FOR i IN range(1, 65)]), b.id) AS er
        FROM vq a, vq b WHERE a.id < 5 AND a.id <> b.id)
      WHERE er <= 10)
    SELECT t.query_id, t.neighbor_id, CAST(t.d2 AS BIGINT) AS d2,
           CAST(t.rank AS INT) AS rank,
           (e.neighbor_id IS NOT NULL) AS in_exact_topk
    FROM top t LEFT JOIN exact e
      ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
    """,
)
def emb_jl_rerank_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Coarse-filter/exact-rerank serving (operators/similarity.
    jl_rerank_topk): stage 1 scans 16-long JL projections for a
    50-candidate prefilter per probe, stage 2 reranks only those with
    the exact full-dimension metric — the third ANN family next to
    IVF's partition pruning and PQ's compressed distances, graded
    engine-exactly because every distance and rank is a BIGINT total
    order over quantized vectors.  ``in_exact_topk`` self-reports
    per-neighbor whether the two-stage answer agrees with the full
    scan — the prefilter-width evidence."""
    from presto_ethereum_spark.operators.similarity import jl_rerank_topk

    return jl_rerank_topk(
        t_spread(spark, sf, "embeddings", parts=8),
        n_queries=5, k=10, prefilter_k=50,
    )


@q(
    "rel_compaction_roundtrip",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY o_orderpriority
    """,
)
def rel_compaction_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction on the oracle gate (sources/sink.
    compact_parquet): orders land deliberately FRAGMENTED (64 writer
    tasks), the compactor bin-packs them toward the target size
    verifying row equality, and the aggregate over the compacted
    directory must equal direct SQL over the source — the OPTIMIZE
    maintenance job's correctness contract, gate-checked.  The
    fragmentation/size effect itself is pinned in test_sink.py (file
    counts are environment-sized, so they are not gate columns)."""
    import tempfile

    from presto_ethereum_spark.sources.sink import compact_parquet

    base = tempfile.mkdtemp(prefix="pes_compact_")
    frag, packed = base + "/frag", base + "/packed"
    t(spark, sf, "orders").repartition(64).write.mode("overwrite").parquet(
        frag
    )
    report = compact_parquet(spark, frag, packed, target_bytes=32 * 1024 * 1024)
    assert report["files_after"] <= report["files_before"]
    back = spark.read.parquet(packed)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# Hash-sampled health-check variants of the three most expensive
# measurement reports.  The full reports stay graded for the gate; these
# run the IDENTICAL pipeline on a deterministic md5 hash-sample of the
# corpus, the mode a 100 TB deployment runs as a routine index/dedup
# health check (truth-side work scales with the sample, ~4x cheaper at
# 50%, quadratically cheaper at lower fractions).  The sample is a pure
# function of the id — no RNG, no seed state — so the DuckDB oracle
# reproduces it exactly by shadowing the table with the same predicate.
# ---------------------------------------------------------------------------

_DOC_SAMPLE_COND = (
    "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND '7'"
)
# probes (vec_id < 5) are pinned into the sample: a recall health check
# keeps its fixed query set and samples only the corpus being searched
_EMB_SAMPLE_COND = (
    "vec_id < 5 OR substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) BETWEEN '0' AND '7'"
)


def _sampled_oracle(name: str, table: str, cond: str) -> str:
    """Oracle of the full report with ``table`` shadowed by a
    deterministic hash-sample CTE (the CTE body reads ``main.<table>``,
    DuckDB's explicit-schema escape from CTE self-reference) — the
    sampled variant grades the EXACT same report SQL over the sampled
    corpus, so sampled-vs-full divergence can only come from the sample
    itself, never from a second implementation."""
    sql = _REGISTRY[name][1]
    assert sql is not None
    shadow = f"{table} AS (SELECT * FROM main.{table} WHERE {cond})"
    return sql.replace("WITH ", f"WITH {shadow},\n    ", 1)


def _doc_sample(d: DataFrame) -> DataFrame:
    """~50% deterministic doc sample: first md5 hex digit of the id in
    0..7.  Engine-portable (md5 of the decimal id string), uniform, and
    stable across runs/partitionings."""
    return d.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            *"01234567"
        )
    )


@q(
    "doc_minhash_recall_sampled",
    _sampled_oracle("doc_minhash_recall", "documents", _DOC_SAMPLE_COND),
)
def doc_minhash_recall_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """doc_minhash_recall on the ~50% md5 hash-sample of documents — the
    routine-health-check mode: exact-Jaccard truth work shrinks
    quadratically with the sample while the per-bucket recall estimate
    stays unbiased (pairs are sampled by membership of both endpoints).
    Pipeline and oracle are shared verbatim with the full report."""
    return _minhash_recall_report(_doc_sample(t_spread(spark, sf, "documents")))


@q(
    "doc_simhash_recall_sampled",
    _sampled_oracle("doc_simhash_recall", "documents", _DOC_SAMPLE_COND),
)
def doc_simhash_recall_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """doc_simhash_recall on the ~50% md5 hash-sample of documents — the
    pigeonhole truth join runs over half the signatures (quarter the
    pair work); banding recall per Hamming bucket estimated on sampled
    pairs.  Pipeline and oracle shared verbatim with the full report."""
    return _simhash_recall_report(_doc_sample(t_spread(spark, sf, "documents")))


@q(
    "emb_ivf_recall_sampled",
    _sampled_oracle("emb_ivf_recall", "embeddings", _EMB_SAMPLE_COND),
)
def emb_ivf_recall_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """emb_ivf_recall with the searched corpus hash-sampled to ~50% and
    the probe set (vec_id < 5) pinned — the fixed-query-set index health
    check: brute-force truth cost halves with the corpus while recall@10
    is measured against the sampled corpus's own true top-10 (an
    apples-to-apples comparison; both index and truth see the same
    vectors).  The sampled corpus gets its own seed codebook (lowest 8
    sampled ids), exactly as a health-check index build would."""
    e = t_spread(spark, sf, "embeddings", parts=8).where(
        (F.col("vec_id") < 5)
        | F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1).isin(
            *"01234567"
        )
    )
    key = ("sampled", sf)
    cents = _IVF_CODEBOOKS.get(key)
    if cents is None:
        cents = _IVF_CODEBOOKS[key] = seed_centroids_of(e)
    return _ivf_recall_report(e, cents)


@q(
    "doc_containment_pairs_sampled",
    _sampled_oracle("doc_containment_pairs", "documents", _DOC_SAMPLE_COND),
)
def doc_containment_pairs_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """doc_containment_pairs on the ~50% md5 hash-sample of documents —
    the routine-health-check mode for the heaviest diagnostic pair join
    (4-24 s at sf0.1): inverted-index pair work shrinks ~quadratically
    with the sample while the containment-rate signal survives (a pair is
    sampled iff both endpoints are).  The df-cap recomputes over the
    sampled corpus on BOTH sides (Spark and the shadowed-view oracle), so
    the capped path itself stays hash-verified.  Pipeline and oracle are
    shared verbatim with the full report."""
    from presto_ethereum_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _doc_sample(t_spread(spark, sf, "documents")),
        threshold=0.6,
        blocking_cols=["lang"],
        max_df=8,
    )


@q(
    "doc_ppjoin_pairs_sampled",
    _sampled_oracle("doc_ppjoin_pairs", "documents", _DOC_SAMPLE_COND),
)
def doc_ppjoin_pairs_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """doc_ppjoin_pairs on the ~50% md5 hash-sample of documents — the
    routine-health-check mode for the lossless exact-threshold join: the
    prefix-filter index halves and candidate work shrinks ~quadratically;
    the losslessness proof (full inverted-index oracle vs prefix-filtered
    Spark plan) is re-run verbatim over the sampled corpus.  Full variant
    kept for the gate."""
    from presto_ethereum_spark.operators.dedup import ppjoin_pairs

    return ppjoin_pairs(
        _doc_sample(t_spread(spark, sf, "documents")),
        threshold_num=3,
        threshold_den=5,
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — the missing member of the quantization family
# (IVF / PQ / JL / SQ8): per-dimension uniform int8 grid, asymmetric
# (full-precision-query) serving, and a recall report against exact truth.
# ---------------------------------------------------------------------------

_DUCK_SQ8 = """
    sq8ex AS (
      SELECT vec_id, CAST(i - 1 AS INT) AS dim,
             CAST(floor(CAST(v[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS xs
      FROM (SELECT vec_id, embedding AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)),
    sq8stats AS (
      SELECT dim, min(xs) AS mn, max(xs) AS mx FROM sq8ex GROUP BY dim),
    sq8codes AS (
      SELECT e.vec_id, e.dim,
             s.mn * 255 + (CASE WHEN s.mx = s.mn THEN 0
                           ELSE ((e.xs - s.mn) * 255) // (s.mx - s.mn) END)
                          * (s.mx - s.mn) AS num
      FROM sq8ex e JOIN sq8stats s ON s.dim = e.dim),
    sq8q AS (SELECT vec_id AS query_id, dim, xs FROM sq8ex WHERE vec_id < 5),
    sq8sc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             sum(CAST(q.xs AS DECIMAL(38,0)) * c.num) AS dot,
             sum(CAST(q.xs AS DECIMAL(38,0)) * q.xs) AS qn2,
             sum(CAST(c.num AS DECIMAL(38,0)) * c.num) AS cn2
      FROM sq8q q JOIN sq8codes c
        ON c.dim = q.dim AND c.vec_id <> q.query_id
      GROUP BY q.query_id, c.vec_id),
    sq8ranked AS (
      SELECT query_id, neighbor_id,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE)))
               AS sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(dot AS DOUBLE)
                 / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE)))
                 DESC, neighbor_id) AS rank
      FROM sq8sc)
"""


@q(
    "emb_sq8_topk",
    f"""
    WITH {_DUCK_SQ8}
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rank AS INT) AS rank
    FROM sq8ranked WHERE rank <= 10
    """,
)
def emb_sq8_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric SQ8 top-10 serving (operators/similarity.sq8_topk):
    int8-per-dimension quantized corpus, full-precision-grid probes
    (vec_id < 5) — the 4x-compression member of the quantization family
    next to IVF/PQ/JL.  Every code, dot, and norm is an integer
    (fixed-point snap -> per-dim min/max buckets -> reconstruction
    numerators; DECIMAL(38,0) orderless sums), so the oracle replicates
    the full quantize -> ADC-score -> rank chain bit-for-bit; only the
    final cosine divides in doubles (of exact ints — identical in any
    engine).  At scale the corpus-side exchange carries 8-bit codes,
    never float vectors."""
    from presto_ethereum_spark.operators.similarity import sq8_topk

    e = t_spread(spark, sf, "embeddings", parts=8)
    return sq8_topk(e, e.where(F.col("vec_id") < 5), k=10)


@q(
    "emb_sq8_recall",
    f"""
    WITH {_DUCK_SQ8},
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_duck_cos('a.embedding', 'b.embedding')} DESC,
                                  b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 5)
      WHERE rank <= 10
    ),
    approx AS (SELECT query_id, neighbor_id FROM sq8ranked WHERE rank <= 10)
    SELECT q.query_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(h.n, 0) AS DOUBLE) / 10.0 AS recall_at_10
    FROM (SELECT DISTINCT query_id FROM truth) q
    LEFT JOIN (SELECT a.query_id, count(*) AS n
               FROM approx a JOIN truth t
                 ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
               GROUP BY a.query_id) h
      ON h.query_id = q.query_id
    """,
)
def emb_sq8_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Index-quality report for SQ8: recall@10 of the quantized search
    against exact brute-force truth, per probe — completes the recall
    family (IVF/LSH/PQ/JL/minhash/simhash now each measure their own
    loss).  SQ8's loss comes only from int8 rounding of the corpus side,
    so recall is expected near 1.0 at 64 dims — the report is the
    evidence, graded."""
    from presto_ethereum_spark.operators.similarity import (
        brute_force_topk,
        sq8_topk,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    q5 = e.where(F.col("vec_id") < 5)
    truth = brute_force_topk(e, q5, k=10).select("query_id", "neighbor_id")
    approx = sq8_topk(e, q5, k=10).select("query_id", "neighbor_id")
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n", F.lit(0)).cast("double") / F.lit(10.0)).alias(
                "recall_at_10"
            ),
        )
    )


@q(
    "rel_kmv_distinct",
    """
    WITH h AS (
      SELECT DISTINCT o_orderpriority AS pri,
             CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM orders),
    r AS (
      SELECT pri, hv,
             row_number() OVER (PARTITION BY pri ORDER BY hv) AS rn
      FROM h),
    kth AS (SELECT pri, hv AS kth_min FROM r WHERE rn = 64),
    nh AS (SELECT pri, CAST(count(*) AS BIGINT) AS n_hashes FROM h GROUP BY pri),
    ex AS (SELECT o_orderpriority AS pri,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
           FROM orders GROUP BY 1)
    SELECT ex.pri AS o_orderpriority, ex.exact_distinct, nh.n_hashes,
           CAST(k.kth_min AS BIGINT) AS kth_min,
           CAST(CASE WHEN k.kth_min IS NOT NULL
                THEN (CAST(63 AS HUGEINT) * 1152921504606846976) // k.kth_min
                ELSE nh.n_hashes END AS BIGINT) AS est_distinct
    FROM ex JOIN nh ON nh.pri = ex.pri
    LEFT JOIN kth k ON k.pri = ex.pri
    """,
)
def rel_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """K-minimum-values distinct-customer sketch per order priority
    (operators/frequency.kmv_distinct, k=64): the deterministic,
    integer-exact member of the approx-distinct family next to HLL —
    the sketch content (k smallest 60-bit md5 hashes) and the
    (k-1)*2^60 div h_(k) estimate are bit-reproducible in any engine,
    so the gate hashes the ESTIMATOR itself, not a tolerance band.
    Computed shard-partial -> lossless merge (the mergeability HLL's
    partial-merge entry demonstrates, here with exact equality to the
    single-pass sketch by construction)."""
    from presto_ethereum_spark.operators.frequency import kmv_distinct

    return kmv_distinct(
        t_spread(spark, sf, "orders"), "o_orderpriority", "o_custkey", k=64
    )


@q(
    "rel_benford_deviation",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders),
    c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
    t AS (SELECT count(*) AS n_total FROM d)
    SELECT s.digit,
           CAST(coalesce(c.n_obs, 0) AS BIGINT) AS n_obs,
           CAST((2 * coalesce(c.n_obs, 0) * 1000000 + t.n_total)
                // (2 * t.n_total) AS BIGINT) AS obs_e6,
           CAST(round(log10(1.0 + 1.0 / s.digit) * 1000000) AS BIGINT)
             AS exp_e6,
           CAST((2 * coalesce(c.n_obs, 0) * 1000000 + t.n_total)
                // (2 * t.n_total)
                - round(log10(1.0 + 1.0 / s.digit) * 1000000) AS BIGINT)
             AS dev_e6
    FROM (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit) s
    LEFT JOIN c ON c.digit = s.digit, t
    """,
)
def rel_benford_deviation(spark: SparkSession, sf: str) -> DataFrame:
    """First-significant-digit (Benford) audit over order amounts — the
    forensic data-quality screen for fabricated/duplicated numeric feeds
    (a synthetic or copy-pasted amount column drifts from the log10
    curve).  Digits from exact integer cents via string head; observed
    frequencies in half-up micro-units ((2a*1e6+b) div (2b), the
    round6_ratio discipline); the Benford expectation is the ONE
    irrational here — round(log10(1+1/d)*1e6) is the audited-safe class
    (no rational tie can exist) — and the deviation is integer
    subtraction after both sides are pinned.  Plan: one map-side-combined
    9-key aggregation + a broadcast 9-row digit spine (zero-count digits
    still report their expectation)."""
    o = t_spread(spark, sf, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    d = o.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
    counts = d.groupBy("digit").agg(F.count("*").alias("n_obs"))
    tot = d.agg(F.count("*").alias("n_total"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    exp_e6 = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")) * 1000000
    ).cast("long")
    # DECIMAL(38,0) numerator (the rake/shingle-profile idiom): plain
    # int64 would wrap silently (non-ANSI) past n_obs ~ 4.6e12 rows, and
    # the DuckDB twin's HUGEINT auto-promotion would make only the Spark
    # side wrap.
    obs_e6 = F.expr(
        "(2 * CAST(coalesce(n_obs, 0) AS DECIMAL(38,0)) * 1000000 + n_total)"
        " div (2 * n_total)"
    )
    return (
        spine.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            obs_e6.cast("long").alias("obs_e6"),
            exp_e6.alias("exp_e6"),
            (obs_e6 - exp_e6).cast("long").alias("dev_e6"),
        )
    )


def _duck_rake_oracle() -> str:
    from presto_ethereum_spark.operators.text import EN_STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
    WITH tokx AS (
      SELECT doc_id, i AS pos, t[i] AS word
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents))
      WHERE t[i] <> ''),
    m AS (
      SELECT doc_id, pos, word,
             CASE WHEN word IN ({stoplist}) THEN 1 ELSE 0 END AS is_stop
      FROM tokx),
    ph AS (
      SELECT doc_id, pos, word, is_stop,
             sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
      FROM m),
    nw AS (SELECT doc_id, pid, pos, word FROM ph WHERE is_stop = 0),
    plen AS (SELECT doc_id, pid, count(*) AS len FROM nw GROUP BY 1, 2),
    wscore AS (
      SELECT word,
             (2 * CAST(sum(len) AS HUGEINT) * 1000000 + count(*))
               // (2 * count(*)) AS ws
      FROM nw JOIN plen USING (doc_id, pid) GROUP BY word),
    pstr AS (
      SELECT doc_id, pid, string_agg(word, ' ' ORDER BY pos) AS phrase
      FROM nw GROUP BY 1, 2),
    cand AS (SELECT DISTINCT phrase FROM pstr),
    pw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS word
           FROM cand),
    score AS (
      SELECT phrase, count(*) AS n_words, sum(ws) AS score_e6
      FROM pw JOIN wscore USING (word) GROUP BY phrase),
    ranked AS (
      SELECT phrase, n_words, score_e6,
             row_number() OVER (ORDER BY score_e6 DESC, phrase) AS rnk
      FROM score)
    SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
           CAST(score_e6 AS BIGINT) AS score_e6, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 20
    """


@q("doc_rake_keywords", _duck_rake_oracle())
def doc_rake_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus top-20 RAKE keyphrases (operators/text.rake_keywords):
    stopword-delimited candidate phrases scored by summed word
    deg/freq ratios in exact micro-units — the keyword-mining member of
    the text-analysis family (see the operator docstring for the
    integer-exactness and WindowGroupLimit plan argument)."""
    from presto_ethereum_spark.operators.text import rake_keywords

    return rake_keywords(t_spread(spark, sf, "documents"), top_k=20)


@q(
    "rel_kmv_set_ops",
    """
    WITH sel AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS g,
             o_custkey AS key
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
    per_key AS (
      SELECT key,
             max(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS in_b
      FROM sel GROUP BY key),
    exact AS (
      SELECT sum(in_a) AS exact_a, sum(in_b) AS exact_b,
             sum(in_a * in_b) AS exact_inter, count(*) AS exact_union
      FROM per_key),
    hv AS (
      SELECT DISTINCT g,
             CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM sel),
    sk AS (
      SELECT g, hv FROM (
        SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
        FROM hv)
      WHERE rn <= 64),
    uni AS (SELECT DISTINCT hv FROM sk),
    th AS (
      SELECT max(theta) AS theta FROM (
        SELECT hv AS theta FROM (
          SELECT hv, row_number() OVER (ORDER BY hv) AS urn FROM uni)
        WHERE urn = 64)),
    bth AS (SELECT hv FROM sk GROUP BY hv HAVING count(*) = 2),
    common AS (SELECT count(*) AS n_common FROM bth, th WHERE hv < th.theta)
    SELECT '1-URGENT' AS group_a, '2-HIGH' AS group_b, CAST(64 AS INT) AS k,
           CAST(th.theta AS BIGINT) AS theta,
           CAST(c.n_common AS BIGINT) AS n_common,
           CAST(e.exact_a AS BIGINT) AS exact_a,
           CAST(e.exact_b AS BIGINT) AS exact_b,
           CAST(e.exact_inter AS BIGINT) AS exact_inter,
           CAST(e.exact_union AS BIGINT) AS exact_union,
           CAST(CASE WHEN th.theta IS NOT NULL
                THEN (CAST(63 AS HUGEINT) * 1152921504606846976) // th.theta
                ELSE e.exact_union END AS BIGINT) AS est_union,
           CAST(CASE WHEN th.theta IS NOT NULL
                THEN (CAST(c.n_common AS HUGEINT) * 1152921504606846976)
                     // th.theta
                ELSE e.exact_inter END AS BIGINT) AS est_inter,
           CAST(CASE WHEN th.theta IS NOT NULL
                THEN (2 * c.n_common * 1000000 + 63) // 126
                WHEN e.exact_union > 0
                THEN (2 * e.exact_inter * 1000000 + e.exact_union)
                     // (2 * e.exact_union) END AS BIGINT) AS est_jaccard_e6,
           CAST(CASE WHEN e.exact_union > 0
                THEN (2 * e.exact_inter * 1000000 + e.exact_union)
                     // (2 * e.exact_union) END AS BIGINT) AS exact_jaccard_e6
    FROM exact e, th, common c
    """,
)
def rel_kmv_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Theta-sketch set operations over two KMV sketches
    (operators/frequency.kmv_set_ops, k=64): estimate the union,
    intersection, and Jaccard of URGENT-vs-HIGH order customer sets from
    the sketches ALONE — the audience-overlap question a 100-TB pipeline
    answers from per-partition summaries without co-shuffling raw keys.
    All estimators are integer arithmetic over 60-bit md5 hashes
    (est = c * 2^60 div theta), so the gate hashes the estimates
    themselves, and the exact values ride alongside as the accuracy
    report."""
    from presto_ethereum_spark.operators.frequency import kmv_set_ops

    return kmv_set_ops(
        t_spread(spark, sf, "orders"),
        "o_orderpriority",
        "o_custkey",
        "1-URGENT",
        "2-HIGH",
        k=64,
    )


@q(
    "doc_lexical_diversity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    wf AS (
      SELECT doc_id, word, count(*) AS freq
      FROM tok WHERE word <> '' GROUP BY doc_id, word),
    stats AS (
      SELECT doc_id, sum(freq) AS n_tokens, count(*) AS n_types,
             count(*) FILTER (WHERE freq = 1) AS n_hapax
      FROM wf GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(s.n_types, 0) AS BIGINT) AS n_types,
           CAST(coalesce(s.n_hapax, 0) AS BIGINT) AS n_hapax,
           CAST((2 * s.n_types * 1000000 + s.n_tokens)
                // (2 * s.n_tokens) AS BIGINT) AS ttr_e6,
           CAST((2 * s.n_hapax * 1000000 + s.n_types)
                // (2 * s.n_types) AS BIGINT) AS hapax_e6
    FROM documents d LEFT JOIN stats s USING (doc_id)
    """,
)
def doc_lexical_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document type-token ratio and hapax rate
    (operators/text.lexical_diversity): the vocabulary-richness screen —
    low TTR flags template/boilerplate, anomalously high hapax rate flags
    gibberish/OCR shred.  Exact integer counts from one (doc, word)
    aggregation; ratios in half-up micro-units per ROUNDING_AUDIT.md."""
    from presto_ethereum_spark.operators.text import lexical_diversity

    return lexical_diversity(t_spread(spark, sf, "documents"))


@q(
    "doc_shingle_df_profile",
    f"""
    WITH {_DUCK_SHINGLED},
    ex AS (
      SELECT s.doc_id, d.lang, unnest(s.shingles) AS sh
      FROM shingled s JOIN documents d USING (doc_id)),
    dfc AS (SELECT lang, sh, count(*) AS df FROM ex GROUP BY lang, sh),
    hist AS (SELECT lang, df, count(*) AS n_shingles FROM dfc GROUP BY lang, df),
    tot AS (SELECT lang, sum(df * n_shingles) AS tot FROM hist GROUP BY lang)
    SELECT h.lang, CAST(h.df AS BIGINT) AS df,
           CAST(h.n_shingles AS BIGINT) AS n_shingles,
           CAST(h.df * h.n_shingles AS BIGINT) AS n_postings,
           CAST(CAST(h.n_shingles AS HUGEINT)
                * ((CAST(h.df AS HUGEINT) * (h.df - 1)) // 2)
                AS BIGINT) AS pair_work,
           CAST((2 * CAST(h.df AS HUGEINT) * h.n_shingles * 1000000 + t.tot)
                // (2 * CAST(t.tot AS HUGEINT)) AS BIGINT)
             AS postings_share_e6
    FROM hist h JOIN tot t USING (lang)
    """,
)
def doc_shingle_df_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Posting-list skew profile of the 3-gram shingle inverted index per
    language block (operators/dedup.shingle_df_profile): the health check
    you run on a fresh crawl BEFORE the pair joins — ``pair_work`` is the
    exact Sum df(df-1)/2 candidate count each df stratum would feed an
    uncapped inverted-index join, so the report shows where the df²
    blowup lives and what ``max_df`` bounds it (SCALE.md §dedup).  Costs
    only the cheap side of the dangerous join: one explode + two
    map-side-combined aggregations, nothing pairwise."""
    from presto_ethereum_spark.operators.dedup import shingle_df_profile

    return shingle_df_profile(
        t_spread(spark, sf, "documents"), blocking_cols=["lang"]
    )


_DUCK_CENT_BEST2 = f"""
    cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8),
    cscored AS (
      SELECT e.vec_id, c.cid, {_duck_cos('e.embedding', 'c.cvec')} AS csim
      FROM embeddings e CROSS JOIN cent c),
    rankedc AS (
      SELECT vec_id, cid, csim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY csim DESC, cid) AS rnk
      FROM cscored),
    bt AS (
      SELECT a.vec_id, a.cid AS cell, a.csim AS sim_own, b.csim AS sim_2nd
      FROM rankedc a JOIN rankedc b ON b.vec_id = a.vec_id AND b.rnk = 2
      WHERE a.rnk = 1)
"""


@q(
    "emb_silhouette",
    f"""
    WITH {_DUCK_CENT_BEST2},
    sil AS (
      SELECT vec_id, cell,
             CASE WHEN sim_2nd < 1.0
                  THEN CAST(round((sim_own - sim_2nd) / (1 - sim_2nd)
                                  * 1000000) AS BIGINT)
             END AS sil_e6
      FROM bt)
    SELECT CAST(cell AS INT) AS cell,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(sil_e6) AS BIGINT) AS sum_sil_e6,
           CAST(min(sil_e6) AS BIGINT) AS min_sil_e6,
           CAST(max(sil_e6) AS BIGINT) AS max_sil_e6,
           CAST(count(*) FILTER (WHERE sil_e6 < 0) AS BIGINT) AS n_negative
    FROM sil GROUP BY cell
    """,
)
def emb_silhouette(spark: SparkSession, sf: str) -> DataFrame:
    """Per-cell simplified silhouette of the IVF codebook
    (operators/similarity.silhouette_by_cell): partition quality next to
    the recall family's serving quality — n_negative counts members
    sitting closer to another centroid than their own, the direct
    re-cluster signal.  Scoring is map-only (literal codebook, in-order
    double folds, argmax ties on cid); the only shuffle is an
    8-key integer aggregation; per-vector silhouettes snap once to
    micro-units so the cell report is pure integers (sums, not means —
    no floor-direction question on negatives)."""
    from presto_ethereum_spark.operators.similarity import (
        seed_centroids,
        silhouette_by_cell,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    return silhouette_by_cell(e, cents)


@q(
    "emb_outlier_scores",
    f"""
    WITH {_DUCK_CENT_BEST2},
    ranked AS (
      SELECT vec_id, cell, sim_own,
             row_number() OVER (ORDER BY sim_own ASC, vec_id) AS rank
      FROM bt)
    SELECT vec_id, CAST(cell AS INT) AS cell,
           round(sim_own, 6) AS sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 20
    """,
)
def emb_outlier_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 out-of-distribution embeddings — lowest best-centroid
    cosine (operators/similarity.centroid_outliers): the OOD/noise screen
    before contrastive sampling; corrupted or mislabeled vectors surface
    here first.  Map-only scoring + one WindowGroupLimit global rank."""
    from presto_ethereum_spark.operators.similarity import (
        centroid_outliers,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    return centroid_outliers(e, cents, k=20)


@q(
    "doc_shingle_novelty",
    f"""
    WITH {_DUCK_SHINGLED},
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM shingled),
    f AS (SELECT s, min(doc_id) AS first_doc FROM ex GROUP BY s),
    per AS (
      SELECT e.doc_id,
             count(*) AS n_shingles,
             sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
               AS n_novel
      FROM ex e JOIN f USING (s) GROUP BY e.doc_id)
    SELECT doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_novel AS BIGINT) AS n_novel,
           CAST((2 * n_novel * 1000000 + n_shingles) // (2 * n_shingles)
                AS BIGINT) AS novelty_ppm
    FROM per
    """,
)
def doc_shingle_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-order ORIGINALITY metric (operators/dedup.shingle_novelty):
    per document, the exact ppm of its distinct 3-gram shingles first
    seen in that document — near-verbatim rehashes of earlier corpus
    score near 0, fresh text near 1e6.  Two linear shuffles (MIN window
    on the shingle key, per-doc re-agg), NO pair join — corpus-wide
    derivativeness without the O(df²) machinery the pair-based dup
    reports need, so it can run as a standing ingest metric at any
    corpus size."""
    from presto_ethereum_spark.operators.dedup import shingle_novelty

    return shingle_novelty(t_spread(spark, sf, "documents"))


@q(
    "doc_source_vocab_overlap",
    """
    WITH sh AS (
      SELECT DISTINCT source, s FROM (
        SELECT source,
               unnest([array_to_string(t[i:i+2], ' ')
                       FOR i IN range(1, len(t) - 1)]) AS s
        FROM (SELECT source, string_split(text, ' ') AS t FROM documents))),
    v AS (SELECT source, count(*) AS vsz FROM sh GROUP BY source),
    ip AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b,
           CAST(inter AS BIGINT) AS n_shared,
           CAST(va.vsz AS BIGINT) AS vocab_a,
           CAST(vb.vsz AS BIGINT) AS vocab_b,
           CAST((2 * inter * 1000000 + (va.vsz + vb.vsz - inter))
                // (2 * (va.vsz + vb.vsz - inter)) AS BIGINT) AS jaccard_ppm
    FROM ip
    JOIN v va ON va.source = ip.source_a
    JOIN v vb ON vb.source = ip.source_b
    """,
)
def doc_source_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source VOCABULARY overlap: exact shingle-set Jaccard between
    every source pair — the corpus-mixing diagnostic that says which
    sources contribute redundant versus complementary text BEFORE any
    doc-level dedup runs (doc_crosssource_dup_matrix counts duplicate
    documents; this measures distributional overlap even where no single
    document repeats).  The exchange carries only distinct
    (source, shingle) rows; the self-join fans out at most
    |sources|(|sources|-1)/2 rows per shingle and aggregates map-side, so
    the report is |sources|² rows at any corpus size.  Exact half-up ppm
    over exact integer set sizes."""
    from presto_ethereum_spark.operators.text import word_shingles

    d = (
        t_spread(spark, sf, "documents")
        .select(
            "source",
            F.explode(F.array_distinct(word_shingles(F.col("text"), 3))).alias(
                "s"
            ),
        )
        .distinct()
    )
    v = d.groupBy("source").agg(F.count("*").alias("vsz"))
    a, b = d.alias("a"), d.alias("b")
    ip = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    va = F.broadcast(v.select(F.col("source").alias("source_a"), F.col("vsz").alias("vocab_a")))
    vb = F.broadcast(v.select(F.col("source").alias("source_b"), F.col("vsz").alias("vocab_b")))
    return (
        ip.join(va, "source_a")
        .join(vb, "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("inter").cast("long").alias("n_shared"),
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.expr(
                "CAST((2 * inter * 1000000 + (vocab_a + vocab_b - inter))"
                " DIV (2 * (vocab_a + vocab_b - inter)) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


@q(
    "doc_jaccard_threshold_curve",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_JACCARD_IPAIRS},
    hist AS (
      SELECT (inter * 10) // (sz_a + sz_b - inter) AS bucket,
             count(*) AS n_pairs
      FROM ipairs GROUP BY 1)
    SELECT s.bucket,
           CAST((2 * s.bucket * 1000000 + 10) // 20 AS DOUBLE) / 1000000
             AS j_lo,
           CAST(coalesce(h.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(sum(coalesce(h.n_pairs, 0)) OVER (
               ORDER BY s.bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_at_or_above
    FROM (SELECT CAST(unnest(range(0, 11)) AS INT) AS bucket) s
    LEFT JOIN hist h USING (bucket)
    """,
)
def doc_jaccard_threshold_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Threshold-tuning curve for the dedup cutoff
    (operators/dedup.jaccard_threshold_curve): pair counts per Jaccard
    decile plus the cumulative tail — "how many pairs would threshold t
    emit" read off ONE pass of the same df-capped (max_df=8) inverted
    index the dedup join uses, instead of one corpus pass per candidate
    threshold.  Buckets decided by exact integer div (never a double);
    zero buckets report via the 11-row spine."""
    from presto_ethereum_spark.operators.dedup import jaccard_threshold_curve

    return jaccard_threshold_curve(
        t_spread(spark, sf, "documents"), blocking_cols=["lang"], max_df=8
    )


@q(
    "doc_cluster_safe_split",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLED},
    {_DUCK_JACCARD_IPAIRS},
    pairs AS (
      SELECT id_a, id_b FROM ipairs
      WHERE inter::DOUBLE / (sz_a + sz_b - inter) >= 0.2),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, root) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.root FROM reach r JOIN edges e ON e.s = r.id),
    comp AS (SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id),
    sized AS (
      SELECT doc_id, cluster_id,
             count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM comp),
    fulltab AS (
      SELECT d.doc_id,
             coalesce(s.cluster_id, d.doc_id) AS cluster_id,
             coalesce(s.cluster_size, 1) AS cluster_size
      FROM documents d LEFT JOIN sized s USING (doc_id)),
    bkt AS (
      SELECT doc_id, cluster_id, cluster_size,
             {_DUCK_BUCKET.format(salt="v1", key="cluster_id", buckets=100)}
               AS bucket
      FROM fulltab)
    SELECT doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM bkt
    """,
)
def doc_cluster_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split (operators/sampling.
    cluster_safe_split): the 90/5/5 assignment is keyed by the near-dup
    CLUSTER id (df-capped jaccard pairs at 0.2 -> connected components),
    so no near-dup pair can straddle train and test BY CONSTRUCTION —
    the prevention op next to doc_split_leakage's measurement op.
    Singletons key by their own id; assignment is the same map-side
    md5-bucket expression as doc_split_counts, engine-replayed exactly
    by the oracle."""
    from presto_ethereum_spark.operators.dedup import dup_clusters, jaccard_pairs
    from presto_ethereum_spark.operators.sampling import cluster_safe_split

    docs = t_spread(spark, sf, "documents")
    pairs = jaccard_pairs(
        docs, threshold=0.2, blocking_cols=["lang"], max_df=8
    )
    clusters = dup_clusters(pairs.select("id_a", "id_b"))
    return cluster_safe_split(
        docs, clusters, {"train": 90, "val": 5, "test": 5}, salt="v1"
    )


@q(
    "eth_token_heavy_hitters",
    f"""
    WITH t AS (
      SELECT erc20_token AS v FROM read_parquet('{ETH}/erc20.parquet')
      WHERE erc20_token IS NOT NULL),
    n AS (SELECT count(*) AS n_total FROM t),
    c AS (SELECT v, count(*) AS n FROM t GROUP BY v)
    SELECT c.v AS value,
           CAST(c.n AS BIGINT) AS n,
           CAST(n.n_total AS BIGINT) AS n_total,
           CAST((2 * c.n * 1000000 + n.n_total) // (2 * n.n_total)
                AS BIGINT) AS share_e6
    FROM c, n WHERE c.n * 97 > n.n_total
    """,
)
def eth_token_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Verified ERC-20 heavy-hitter tokens via Misra-Gries summaries
    (operators/frequency.misra_gries_heavy, k=96): every token with
    > 1/97 of all transfers, with exact counts — the deterministic
    bounded-state heavy-hitter sketch next to CMS/HLL/KMV/Bloom.  The
    token column's long tail (2,918 distinct values over 5,808 transfers
    in the fixture) forces the k-counter reduce to actually fire, while
    38 symbols clear the verification threshold — neither the lossy path
    nor the output is vacuous.  The oracle is the exact closed form; the
    Spark plan's state is k counters per partition and the only shuffles
    carry <= k candidates/partition plus the filtered exact count."""
    from presto_ethereum_spark.operators.frequency import misra_gries_heavy

    erc20 = _eth_tables(spark).table("erc20")
    return misra_gries_heavy(erc20, "erc20_token", k=96)


@q(
    "emb_ivf_probe_curve",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {{cos}} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    qrank AS (
      SELECT vec_id AS query_id, embedding AS qvec, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY csim DESC, cid) AS crank
      FROM cscored WHERE vec_id < 5
    ),
    expanded AS (
      SELECT q.query_id, a.vec_id AS neighbor_id, p.p,
             {{pcos}} AS sim
      FROM qrank q
      JOIN assign a ON a.cid = q.cid AND a.vec_id != q.query_id
      JOIN (SELECT unnest(generate_series(1, 8)) AS p) p ON p.p >= q.crank
    ),
    approx AS (
      SELECT p, query_id, neighbor_id FROM (
        SELECT p, query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id, p
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM expanded) WHERE rank <= 10
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {{bcos}} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 5)
      WHERE rank <= 10
    ),
    nt AS (SELECT count(*) AS n_truth FROM truth),
    hits AS (
      SELECT a.p, count(*) AS n
      FROM approx a JOIN truth t
        ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
      GROUP BY a.p)
    SELECT CAST(s.p AS INT) AS nprobe,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           CAST(nt.n_truth AS BIGINT) AS n_truth,
           CAST(coalesce(h.n, 0) AS DOUBLE) / CAST(nt.n_truth AS DOUBLE)
             AS recall_at_k
    FROM (SELECT unnest(generate_series(1, 8)) AS p) s
    LEFT JOIN hits h ON h.p = s.p
    CROSS JOIN nt
    """.replace("{cos}", _duck_cos("c.cvec", "e.embedding"))
    .replace("{pcos}", _duck_cos("q.qvec", "a.embedding"))
    .replace("{bcos}", _duck_cos("a.embedding", "b.embedding")),
)
def emb_ivf_probe_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@10 vs nprobe for ALL probe budgets 1..8 from ONE corpus
    pass (operators/similarity.ivf_probe_curve) — the tuning curve that
    picks the IVF serving knob, next to emb_ivf_recall's single-point
    measurement and doc_jaccard_threshold_curve's dedup analog.  A
    candidate is in the nprobe=p result iff its cell's rank in the
    query's centroid ordering <= p, so one scored candidate set +
    explode(crank..8) + one window replaces 8 serve passes.  The oracle
    replays the entire curve closed-form in SQL."""
    from presto_ethereum_spark.operators.similarity import (
        ivf_probe_curve,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    cents = _IVF_CODEBOOKS.get(sf)
    if cents is None:
        cents = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    return ivf_probe_curve(e, e.where(F.col("vec_id") < 5), cents, k=10)


@q(
    "rel_histogram_quantiles",
    """
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x FROM lineitem
      WHERE l_extendedprice IS NOT NULL),
    b AS (
      SELECT min(x) AS mn, max(x) AS mx, count(*) AS n,
             (max(x) - min(x)) // 64 + 1 AS w
      FROM c),
    vb AS (SELECT (x - mn) // w AS bucket, x FROM c CROSS JOIN b),
    hist AS (SELECT bucket, count(*) AS cnt FROM vb GROUP BY bucket),
    hc AS (
      SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum FROM hist),
    qs AS (SELECT unnest([25, 50, 75, 90, 99]) AS qpct),
    tr AS (SELECT qpct, (qpct * n + 99) // 100 AS r, mn, w
           FROM qs CROSS JOIN b),
    sel AS (
      SELECT t.qpct, hc.bucket, t.mn, t.w, hc.cnt,
             t.r - (hc.cum - hc.cnt) AS rr
      FROM tr t JOIN hc ON hc.cum >= t.r AND hc.cum - hc.cnt < t.r),
    ex AS (
      SELECT s.qpct, v.x, s.rr,
             row_number() OVER (PARTITION BY s.qpct ORDER BY v.x) AS rn
      FROM sel s JOIN vb v ON v.bucket = s.bucket),
    exact AS (SELECT qpct, x AS exact_cents FROM ex WHERE rn = rr)
    SELECT CAST(s.qpct AS INT) AS qpct,
           CAST(s.bucket AS INT) AS bucket,
           CAST(s.mn + s.bucket * s.w AS BIGINT) AS lo_cents,
           CAST(s.mn + s.bucket * s.w + s.w - 1 AS BIGINT) AS hi_cents,
           CAST(s.mn + s.bucket * s.w + (s.w - 1) // 2 AS BIGINT)
             AS est_mid_cents,
           CAST(s.cnt AS BIGINT) AS bucket_n,
           e.exact_cents,
           CAST(s.mn + s.bucket * s.w + (s.w - 1) // 2 - e.exact_cents
                AS BIGINT) AS err_cents
    FROM sel s JOIN exact e USING (qpct)
    """,
)
def rel_histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Quantiles of l_extendedprice from a MERGEABLE 64-bucket equi-width
    histogram (operators/frequency.histogram_quantiles) with an exact
    in-bucket referee — the quantile member of the sketch family
    (CMS / HLL / KMV / Bloom / Misra-Gries / histogram).  The histogram
    groupBy IS the mergeable-summary step (<= 64 counters per partition
    partial); the exact target-rank value is recovered by sorting ONLY
    the selected bucket's rows, never the table; err_cents verifies the
    w/2 error bound on real data.  All arithmetic integer, hash-exact."""
    from presto_ethereum_spark.operators.frequency import histogram_quantiles

    li = t(spark, sf, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents")
    )
    return histogram_quantiles(li, "cents", n_buckets=64)


_NIBBLES = "0123456789ABCDEF"
_NIB_CNTS = ",\n             ".join(
    f"length(h) - length(replace(h, '{s}', '')) AS c{s}" for s in _NIBBLES
)
_NIB_DISTINCT = " + ".join(
    f"(CASE WHEN c{s} > 0 THEN 1 ELSE 0 END)" for s in _NIBBLES
)
_NIB_SUMSQ = "CAST(0 AS HUGEINT)"
for _s in _NIBBLES:
    _NIB_SUMSQ = f"({_NIB_SUMSQ} + CAST(c{_s} AS HUGEINT) * c{_s})"


@q(
    "multimodal_bytes_profile",
    f"""
    WITH hx AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS h FROM documents),
    c AS (
      SELECT media_id,
             CAST(length(h) AS BIGINT) AS n_nibbles,
             {_NIB_CNTS}
      FROM hx),
    s AS (
      SELECT media_id, n_nibbles,
             CAST(({_NIB_DISTINCT}) AS INT) AS distinct_nibbles,
             CAST((2 * {_NIB_SUMSQ} * 1000000
                   + CAST(n_nibbles AS HUGEINT) * n_nibbles)
                  // nullif(2 * CAST(n_nibbles AS HUGEINT) * n_nibbles, 0)
                  AS BIGINT) AS simpson_e6
      FROM c)
    SELECT media_id,
           n_nibbles // 2 AS n_bytes,
           distinct_nibbles,
           simpson_e6,
           simpson_e6 >= 250000 AS suspect
    FROM s
    """,
)
def multimodal_bytes_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Codec-free corrupt-payload screen over raw media bytes
    (operators/multimodal.bytes_profile): 16 nibble counts per asset via
    pure length/replace scalar expressions on the hex expansion — zero
    shuffle, whole-stage codegen, no Python — reduced to an exact-integer
    Simpson collision index (e6 micro-units, DECIMAL(38,0) sum of
    squares) and a distinct-nibble alphabet count.  Constant/padded
    blobs hit simpson_e6 -> 1000000 and flag ``suspect``; uniform bytes
    sit near 62500.  The screen runs BEFORE decode CPU is spent — the
    first gate of a 100 TB media ingest."""
    from presto_ethereum_spark.operators.multimodal import (
        bytes_profile,
        media_from_documents,
    )

    media = media_from_documents(t_spread(spark, sf, "documents"))
    return bytes_profile(media)


@q(
    "multimodal_png_decode_stats",
    f"""
    SELECT media_id,
           true_width AS width,
           true_height AS height,
           true_channels AS channels,
           true_sum_r AS sum_r,
           true_sum_g AS sum_g,
           true_sum_b AS sum_b,
           true_thumb_md5 AS thumb_md5
    FROM read_parquet('{MEDIA}/images.parquet')
    """,
)
def multimodal_png_decode_stats(spark: SparkSession, sf: str) -> DataFrame:
    """REAL end-to-end image decode (VERDICT r10 #6): Spark decodes each
    fixture row's actual PNG bytes — baseline profile, all five scanline
    filters, grey + RGB — through the pure-Python public-spec codec
    (operators/png.py) inside mapInPandas, then recomputes dimensions,
    per-channel pixel sums, and the md5 of an 8x8 nearest-neighbor
    thumbnail.  The oracle reads the GROUND-TRUTH columns the fixture
    generator computed from the source pixel arrays BEFORE encoding
    (fixtures/generate_media_fixture.py) — so the hash gate passes only
    if the codec reconstructs every pixel of every image exactly.  This
    closes the multimodal family's stubbed-codec gap: the decode ->
    resize -> feature chain runs for real in CI, and swapping in PIL/JPEG
    on a real cluster changes one function, not the plumbing."""
    from presto_ethereum_spark.operators.multimodal import png_decode_stats

    return png_decode_stats(spark.read.parquet(str(MEDIA / "images.parquet")))


@q(
    "multimodal_shard_pack",
    f"""
    WITH d AS (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST({_DUCK_BUCKET.format(salt="m1", key="doc_id", buckets=16)}
                  AS BIGINT) AS shard
      FROM documents),
    c AS (
      SELECT media_id, shard, n_bytes,
             COALESCE(SUM(n_bytes) OVER (
                 PARTITION BY shard ORDER BY media_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM d),
    p AS (SELECT *, cum_prev // 65536 AS pack_id FROM c)
    SELECT media_id, shard, n_bytes,
           CAST(pack_id AS BIGINT) AS pack_id,
           CAST(cum_prev - min(cum_prev) OVER (PARTITION BY shard, pack_id)
                AS BIGINT) AS byte_offset
    FROM p
    """,
)
def multimodal_shard_pack(spark: SparkSession, sf: str) -> DataFrame:
    """WebDataset-style shard manifest (operators/multimodal.shard_pack):
    every media asset gets a (shard, pack_id, byte_offset) address inside
    64 KiB byte-budget packs — the seekable index a training loader reads
    INSTEAD of listing tar members.  The byte-packing sibling of
    doc_pack_sequences' token packing, plus the within-pack offset (a
    second window over the same shard exchange — no extra shuffle).
    Exact integer arithmetic end to end; the oracle replays the md5
    shard, the id-ordered cumsum, and both windows."""
    from presto_ethereum_spark.operators.multimodal import (
        media_from_documents,
        shard_pack,
    )

    media = media_from_documents(t_spread(spark, sf, "documents"))
    return shard_pack(media, shard_bytes=65536, n_shards=16, salt="m1")


@q(
    "multimodal_pack_blobs",
    f"""
    WITH d AS (
      SELECT doc_id AS media_id,
             hex(encode(text)) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST({_DUCK_BUCKET.format(salt="m1", key="doc_id", buckets=16)}
                  AS BIGINT) AS shard
      FROM documents),
    c AS (
      SELECT media_id, shard, h, n_bytes,
             COALESCE(SUM(n_bytes) OVER (
                 PARTITION BY shard ORDER BY media_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM d),
    p AS (SELECT *, cum_prev // 65536 AS pack_id FROM c)
    SELECT shard, CAST(pack_id AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_assets,
           CAST(sum(n_bytes) AS BIGINT) AS pack_bytes,
           md5(string_agg(h, '' ORDER BY media_id)) AS payload_md5
    FROM p GROUP BY shard, pack_id
    """,
)
def multimodal_pack_blobs(spark: SparkSession, sf: str) -> DataFrame:
    """Pack ASSEMBLY proof for the shard manifest: concatenate each pack's
    member payloads in manifest order and fingerprint the assembled blob —
    the writer side of multimodal_shard_pack's index, gated on the md5 of
    the exact byte stream a loader would seek into.  Per-pack state is
    bounded by the pack budget (64 KiB + at most one overflowing asset),
    so the collect-and-sort inside each (shard, pack) group is
    constant-sized by construction — the packing exists precisely to make
    this safe at 100 TB.  One shuffle on the shard key shared by the
    cumsum window and the assembly aggregation."""
    from presto_ethereum_spark.operators.multimodal import (
        media_from_documents,
        shard_pack,
    )

    media = media_from_documents(t_spread(spark, sf, "documents"))
    manifest = shard_pack(media, shard_bytes=65536, n_shards=16, salt="m1")
    payload = media.select("media_id", F.hex("data").alias("h"))
    return (
        manifest.join(payload, "media_id")
        .groupBy("shard", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_assets"),
            F.sum("n_bytes").cast("long").alias("pack_bytes"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("byte_offset", "h"))
                        ),
                        lambda x: x["h"],
                    ),
                    "",
                ).cast("binary")
            ).alias("payload_md5"),
        )
    )


@q(
    "stream_value_histogram",
    """
    WITH ev AS (
      SELECT epoch_us(ts) // 3600000000 * 3600 AS window_start,
             length(bin(TRY_CAST(round(value * 100) AS BIGINT))) - 1 AS bucket
      FROM events
      WHERE TRY_CAST(round(value * 100) AS BIGINT) > 0),
    h AS (SELECT window_start, bucket, count(*) AS cnt FROM ev GROUP BY 1, 2),
    hc AS (
      SELECT window_start, bucket, cnt,
             sum(cnt) OVER (PARTITION BY window_start ORDER BY bucket) AS cum,
             sum(cnt) OVER (PARTITION BY window_start) AS n
      FROM h),
    sel AS (
      SELECT p.p, hc.window_start, hc.bucket, hc.cnt, hc.n
      FROM hc CROSS JOIN (SELECT unnest([50, 90]) AS p) p
      WHERE hc.cum >= (p.p * hc.n + 99) // 100
        AND hc.cum - hc.cnt < (p.p * hc.n + 99) // 100)
    SELECT window_start,
           CAST(min(n) AS BIGINT) AS n_events,
           CAST(min(CASE WHEN p = 50 THEN bucket END) AS INT) AS p50_bucket,
           CAST(min(CASE WHEN p = 50
                    THEN (CAST(1 AS BIGINT) << bucket) END) AS BIGINT)
             AS p50_lo_cents,
           CAST(min(CASE WHEN p = 50
                    THEN (CAST(1 AS BIGINT) << (bucket + 1)) - 1 END)
                AS BIGINT) AS p50_hi_cents,
           CAST(min(CASE WHEN p = 50 THEN cnt END) AS BIGINT) AS p50_bucket_n,
           CAST(min(CASE WHEN p = 90 THEN bucket END) AS INT) AS p90_bucket,
           CAST(min(CASE WHEN p = 90
                    THEN (CAST(1 AS BIGINT) << bucket) END) AS BIGINT)
             AS p90_lo_cents,
           CAST(min(CASE WHEN p = 90
                    THEN (CAST(1 AS BIGINT) << (bucket + 1)) - 1 END)
                AS BIGINT) AS p90_hi_cents,
           CAST(min(CASE WHEN p = 90 THEN cnt END) AS BIGINT) AS p90_bucket_n
    FROM sel GROUP BY window_start
    """,
)
def stream_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-hour p50/p90 value quantiles from a MERGEABLE log2 histogram
    in the streaming path (streaming/events.value_histogram_stream) —
    the streaming counterpart of rel_histogram_quantiles, closing for
    quantiles the gap stream_kmv_distinct closes for distinct counts.
    Fixed power-of-two bucket bounds (no global min/max needed mid-
    stream), bucket = length(bin(cents)) - 1 computed JVM-side — exact
    integer, replayed verbatim by the oracle; state is 64 long counters
    per open window, merged by elementwise sum, so the settled result is
    bit-identical under any micro-batch split and every column is
    integer hash-gated."""
    from presto_ethereum_spark.streaming.events import run_value_histogram

    return run_value_histogram(spark, sf)


def _lsh_band_curve_oracle(
    dim: int = 64, bands: int = 4, bits: int = 24, k: int = 10
) -> str:
    """Closed-form replica of operators/similarity.lsh_band_curve: same
    inlined hyperplanes and band arithmetic as _lsh_oracle, min matching
    band per candidate pair, one generate_series explode per budget."""
    from presto_ethereum_spark.operators.similarity import _hyperplane

    width = bits // bands
    sig_terms = []
    for p in range(bits):
        plane = ", ".join(repr(x) for x in _hyperplane(dim, p))
        sig_terms.append(
            f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),"
            f" [{plane}]) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END"
        )
    sig = " + ".join(sig_terms)
    cos = _duck_cos("q.embedding", "n.embedding")
    bcos = _duck_cos("a.embedding", "b.embedding")
    return f"""
    WITH sigs AS (
      SELECT vec_id AS id, ({sig}) AS sig FROM embeddings
    ),
    banded AS (
      SELECT id, band, (sig >> (band * {width})) & {(1 << width) - 1} AS key
      FROM sigs, (SELECT unnest(generate_series(0, {bands - 1})) AS band)
    ),
    cand AS (
      SELECT a.id AS query_id, b.id AS neighbor_id, min(a.band) AS min_band
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND b.id != a.id
      WHERE a.id < 5
      GROUP BY 1, 2
    ),
    expanded AS (
      SELECT c.query_id, c.neighbor_id, s.nb, {cos} AS sim
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id
      JOIN (SELECT unnest(generate_series(1, {bands})) AS nb) s
        ON s.nb > c.min_band
    ),
    approx AS (
      SELECT nb, query_id, neighbor_id FROM (
        SELECT nb, query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id, nb
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM expanded) WHERE rank <= {k}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {bcos} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 5)
      WHERE rank <= {k}
    ),
    nt AS (SELECT count(*) AS n_truth FROM truth),
    hits AS (
      SELECT a.nb, count(*) AS n
      FROM approx a JOIN truth t
        ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
      GROUP BY a.nb)
    SELECT CAST(s.nb AS INT) AS n_bands,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           CAST(nt.n_truth AS BIGINT) AS n_truth,
           CAST(coalesce(h.n, 0) AS DOUBLE) / CAST(nt.n_truth AS DOUBLE)
             AS recall_at_k
    FROM (SELECT unnest(generate_series(1, {bands})) AS nb) s
    LEFT JOIN hits h ON h.nb = s.nb
    CROSS JOIN nt
    """


@q("emb_lsh_band_curve", _lsh_band_curve_oracle())
def emb_lsh_band_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@10 vs LSH band budget 1..4 from ONE candidate pass
    (operators/similarity.lsh_band_curve) — the LSH member of the
    tuning-curve family (jaccard threshold, IVF nprobe, LSH bands):
    more bands union more candidates, so recall is monotone in the
    budget and the curve prices the (band, key) exchange a target
    recall costs.  min matching band is recovered from the two 24-bit
    signatures as a CASE chain (no per-budget re-join); the oracle
    replays hyperplanes, banding, and the whole curve closed-form."""
    from presto_ethereum_spark.operators.similarity import lsh_band_curve

    e = t_spread(spark, sf, "embeddings", parts=8)
    return lsh_band_curve(
        e, e.where(F.col("vec_id") < 5), dim=64, bands=4, bits=24, k=10
    )


@q(
    "doc_quality_survival_curve",
    f"""
    WITH {_doc_quality_ctes()},
    b AS (
      SELECT CASE WHEN n_chars IS NULL THEN 0
                  ELSE least(CAST(floor(quality * 10) AS INT), 10) END
               AS bucket,
             coalesce(n_tokens_regex, 0) AS n_tokens_regex
      FROM final),
    hist AS (
      SELECT bucket, count(*) AS n_docs, sum(n_tokens_regex) AS n_tokens
      FROM b GROUP BY 1)
    SELECT s.bucket,
           CAST(s.bucket AS DOUBLE) / 10.0 AS q_lo,
           CAST(coalesce(h.n_docs, 0) AS BIGINT) AS n_docs,
           CAST(coalesce(h.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(sum(coalesce(h.n_docs, 0)) OVER (
               ORDER BY s.bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS docs_at_or_above,
           CAST(sum(coalesce(h.n_tokens, 0)) OVER (
               ORDER BY s.bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS tokens_at_or_above
    FROM (SELECT CAST(unnest(range(0, 11)) AS INT) AS bucket) s
    LEFT JOIN hist h USING (bucket)
    """,
)
def doc_quality_survival_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-cutoff survival curve (operators/text.
    quality_survival_curve): per quality decile, doc count AND token
    mass with the cumulative "what survives cutoff t" tail — the tuning
    curve for the pipeline's most consequential knob, read from ONE
    map-side scoring pass instead of one filter run per candidate
    threshold.  Token mass is the sizing column (quality correlates
    with length, so the token curve falls faster than the doc curve).
    Completes the tuning-curve family: dedup threshold, IVF nprobe,
    LSH bands, quality cutoff.  The oracle recomputes the identical
    quality formula via the shared _doc_quality_ctes."""
    from presto_ethereum_spark.operators.text import quality_survival_curve

    return quality_survival_curve(t_spread(spark, sf, "documents"))


@q(
    "emb_codebook_drift",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cscored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {{cos}} AS csim
      FROM embeddings e CROSS JOIN cent c
    ),
    assign0 AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM cscored) WHERE rnk = 1
    ),
    ex AS (
      SELECT cid, CAST(i - 1 AS INT) AS dim, v[i] AS x
      FROM (SELECT cid, CAST(embedding AS DOUBLE[]) AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM assign0)
    ),
    coords AS (
      SELECT cid, dim,
             (CAST(CAST(sum(CAST(floor(x * {{qs}}) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / {{qs}}) / count(*) AS coord
      FROM ex GROUP BY cid, dim
    ),
    rcent AS (
      SELECT c.cid, coalesce(r.rvec, CAST(c.cvec AS DOUBLE[])) AS cvec
      FROM cent c LEFT JOIN (SELECT cid, list(coord ORDER BY dim) AS rvec
                             FROM coords GROUP BY cid) r ON r.cid = c.cid
    ),
    rscored AS (
      SELECT e.vec_id, r.cid,
             {{rcos}} AS csim
      FROM embeddings e CROSS JOIN rcent r
    ),
    rassign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rnk
        FROM rscored) WHERE rnk = 1
    ),
    mv AS (
      SELECT a0.cid AS cell_seed, a1.cid AS cell_refined
      FROM assign0 a0 JOIN rassign a1 USING (vec_id))
    SELECT CAST(cell_seed AS INT) AS cell,
           CAST(count(*) AS BIGINT) AS n_seed,
           CAST(count(*) FILTER (WHERE cell_refined = cell_seed) AS BIGINT)
             AS n_stayed,
           CAST(count(*) FILTER (WHERE cell_refined != cell_seed) AS BIGINT)
             AS n_moved,
           CAST((2 * CAST(count(*) FILTER (WHERE cell_refined != cell_seed)
                          AS HUGEINT) * 1000000 + count(*))
                // (2 * CAST(count(*) AS HUGEINT)) AS BIGINT) AS churn_e6
    FROM mv GROUP BY cell_seed
    """.replace("{cos}", _duck_cos("c.cvec", "e.embedding"))
    .replace("{rcos}", _duck_cos("r.cvec", "e.embedding"))
    .replace("{qs}", str(_KMEANS_S)),
)
def emb_codebook_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-cell assignment churn between the seed codebook and one Lloyd
    round of refinement (operators/similarity.codebook_drift) — the COST
    side of codebook refinement next to emb_ivf_recall_refined's QUALITY
    side: an IVF rebuild rewrites the cell-partitioned layout, so the
    decision needs "what fraction of each cell moves", not just "is
    recall better".  One map-side pass scores both literal codebooks
    (zero corpus shuffle; the only exchange is the 8-row conditional-
    count groupBy); the refined codebook's fixed-point member means are
    bit-exactly replicated by the oracle (the emb_ivf_recall_refined
    machinery), so churn itself is hash-gated."""
    from presto_ethereum_spark.operators.similarity import (
        codebook_drift,
        kmeans_centroids,
        seed_centroids,
    )

    e = t_spread(spark, sf, "embeddings", parts=8)
    seeds = _IVF_CODEBOOKS.get(sf)
    if seeds is None:
        seeds = _IVF_CODEBOOKS[sf] = seed_centroids(e, n_cells=8)
    refined = _IVF_CODEBOOKS.get(("refined", sf))
    if refined is None:
        refined = _IVF_CODEBOOKS[("refined", sf)] = kmeans_centroids(
            e, n_cells=8, n_iters=1, seeds=seeds
        )
    return codebook_drift(e, seeds, refined)


@q(
    "doc_minhash_band_curve",
    f"""
    WITH {_DUCK_SHINGLED},
    {_DUCK_SIG},
    candm AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, min(a.band) AS min_band
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    {_DUCK_TRUTH_TP},
    truth AS (
      SELECT id_a, id_b FROM tp
      WHERE {_DUCK_TRUTH_COND}),
    nt AS (SELECT count(*) AS n_truth FROM truth),
    hist AS (
      SELECT c.min_band, count(*) AS n
      FROM truth t JOIN candm c USING (id_a, id_b)
      GROUP BY c.min_band)
    SELECT CAST(s.nb AS INT) AS n_bands,
           CAST(nt.n_truth AS BIGINT) AS n_truth,
           CAST(coalesce(
             (SELECT sum(n) FROM hist WHERE min_band < s.nb), 0) AS BIGINT)
             AS n_caught,
           CAST((2 * coalesce(
                   (SELECT sum(n) FROM hist WHERE min_band < s.nb), 0)
                 * 1000000 + nt.n_truth)
                // nullif(2 * nt.n_truth, 0) AS DOUBLE) / 1000000 AS recall
    FROM (SELECT unnest(generate_series(1, 4)) AS nb) s
    CROSS JOIN nt
    """,
)
def doc_minhash_band_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Pair-recall vs MinHash band budget 1..4 from ONE banded join
    (operators/dedup.minhash_candidate_bands) — the dedup-side band
    knob next to doc_jaccard_threshold_curve's cutoff knob: more bands
    union more candidate buckets, so recall over the exact-Jaccard
    truth (operators/dedup.jaccard_truth_pairs: J >= 0.2, df-capped at
    max_df=8 — the shared doc_minhash_recall truth contract, non-empty
    at BOTH graded SFs since r9) rises monotonically while the
    (band, key) exchange grows linearly.  A pair is a candidate under budget b iff its FIRST
    agreeing band < b, so min_band prices every budget at once; the
    curve says how many bands the index must pay for a target recall.
    n_caught/recall per budget derive from a <= 4-row min_band
    histogram — nothing per-budget ever re-joins."""
    from presto_ethereum_spark.operators.dedup import (
        jaccard_truth_pairs,
        minhash_candidate_bands,
        round6_ratio,
    )

    d = t_spread(spark, sf, "documents")
    truth = jaccard_truth_pairs(d).select("id_a", "id_b")
    candm = minhash_candidate_bands(d)
    # ONE pass over truth AND over the min_band histogram (r13): the old
    # shape referenced the truth subtree twice (scalar n_truth + the hist
    # join) and Spark re-computed the whole postings pipeline per branch.
    # A left join marks every truth pair with its min_band (null = never a
    # candidate; candm is unique per pair so counts are preserved), and the
    # <= 5-row histogram is collapsed to ONE row carrying both the total
    # and the per-band counts, so every per-budget figure derives from a
    # single broadcast row with integer HOF arithmetic — no second
    # evaluation of anything corpus-sized.  A null min_band fails the
    # ``h < n_bands`` predicate, exactly like the old inner-join-then-
    # range-join shape; empty truth still reports n_truth 0 / NULL recall.
    hist = (
        truth.join(candm, ["id_a", "id_b"], "left")
        .groupBy("min_band")
        .agg(F.count("*").alias("n"))
    )
    stats = hist.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_truth"),
        F.collect_list(F.struct("min_band", "n")).alias("hist"),
    )
    spine = spark.range(1, 5).select(F.col("id").cast("int").alias("n_bands"))
    caught = F.aggregate(
        F.filter(F.col("hist"), lambda h: h["min_band"] < F.col("n_bands")),
        F.lit(0).cast("bigint"),
        lambda acc, h: acc + h["n"],
    )
    return spine.crossJoin(F.broadcast(stats)).select(
        "n_bands",
        F.col("n_truth").cast("bigint").alias("n_truth"),
        caught.cast("bigint").alias("n_caught"),
        # empty truth (possible on corpora where no pair clears the
        # shared cutoff under the df-capped contract; NOT the graded
        # SFs since the r9 threshold fix) reports NULL recall
        # instead of dividing by zero
        F.when(
            F.col("n_truth") > 0,
            round6_ratio(caught, F.col("n_truth")),
        ).alias("recall"),
    )


@q(
    "rel_welch_ttest",
    """
    WITH base AS (
      SELECT n_name,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS hi,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    g AS (
      SELECT n_name, hi,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
      FROM base GROUP BY n_name, hi),
    w AS (
      SELECT a.n_name,
             a.n AS n_hi, b.n AS n_lo,
             CAST(a.s * b.n - b.s * a.n AS DOUBLE)
               / (CAST(a.n AS DOUBLE) * b.n) AS dm,
             CAST(a.n * a.ss - a.s * a.s AS DOUBLE)
               / (CAST(a.n AS DOUBLE) * a.n * (a.n - 1)) AS se1,
             CAST(b.n * b.ss - b.s * b.s AS DOUBLE)
               / (CAST(b.n AS DOUBLE) * b.n * (b.n - 1)) AS se2
      FROM g a JOIN g b ON a.n_name = b.n_name
      WHERE a.hi = 1 AND b.hi = 0 AND a.n >= 2 AND b.n >= 2)
    SELECT n_name, n_hi, n_lo,
           round(dm / sqrt(se1 + se2), 6) AS t_stat,
           round((se1 + se2) * (se1 + se2)
                 / (se1 * se1 / (n_hi - 1) + se2 * se2 / (n_lo - 1)),
                 6) AS welch_df
    FROM w
    """,
)
def rel_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """Welch's unequal-variance t-test per nation: do HIGH/URGENT orders
    carry different total prices than the rest?  The A/B-measurement
    staple next to rel_chisq_independence (proportions) and rel_ks_drift
    (distributions) — one conditional aggregation produces exact
    HUGEINT/DECIMAL(38,0) (n, sum, sum-of-squares) per (nation, arm) in
    CENTS (sum-of-squares outgrows int64 past ~4k rows/arm at TPC-H
    price magnitudes).  CANCELLATION DISCIPLINE: the variance numerator
    n*ss - s^2 and the mean-difference numerator s1*n2 - s2*n1 are
    formed as EXACT integers — the textbook ss - s*(s/n) double form
    subtracts near-equal 1e17-scale values and the two engines lose
    DIFFERENT digits (measured: 1e-8 relative divergence on this very
    fixture), while the exact-numerator form leaves only
    correctly-rounded IEEE ops (cast, divide, add, sqrt), identical
    everywhere.  t and the Welch-Satterthwaite df are then the
    audited-safe irrational class, round @6 per ROUNDING_AUDIT.md.
    Mergeable-state shape: three additive counters per arm, so the test
    re-runs incrementally at any scale; the join is arm-vs-arm on the
    25-row group table."""
    base = (
        t(spark, sf, "orders")
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(t(spark, sf, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .cast("int")
            .alias("hi"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    dec = "decimal(38,0)"
    g = base.groupBy("n_name", "hi").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("cents").cast(dec)).cast(dec).alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).cast(dec).alias("ss"),
    )
    a, b = g.alias("a"), g.alias("b")
    w = (
        # the arm-vs-arm join runs on the |groups| x 2-row aggregate, never
        # the fact table: broadcast it statically (AQE would anyway)
        a.join(F.broadcast(b), F.col("a.n_name") == F.col("b.n_name"))
        .where(
            (F.col("a.hi") == 1)
            & (F.col("b.hi") == 0)
            & (F.col("a.n") >= 2)
            & (F.col("b.n") >= 2)
        )
        .select(
            F.col("a.n_name").alias("n_name"),
            F.col("a.n").alias("n_hi"),
            F.col("b.n").alias("n_lo"),
            # exact integer numerators; doubles only for the final
            # correctly-rounded divides (see docstring)
            (
                (
                    F.col("a.s") * F.col("b.n") - F.col("b.s") * F.col("a.n")
                ).cast("double")
                / (F.col("a.n").cast("double") * F.col("b.n"))
            ).alias("dm"),
            (
                (
                    F.col("a.n") * F.col("a.ss") - F.col("a.s") * F.col("a.s")
                ).cast("double")
                / (
                    F.col("a.n").cast("double")
                    * F.col("a.n")
                    * (F.col("a.n") - 1)
                )
            ).alias("se1"),
            (
                (
                    F.col("b.n") * F.col("b.ss") - F.col("b.s") * F.col("b.s")
                ).cast("double")
                / (
                    F.col("b.n").cast("double")
                    * F.col("b.n")
                    * (F.col("b.n") - 1)
                )
            ).alias("se2"),
        )
    )
    return w.select(
        "n_name",
        "n_hi",
        "n_lo",
        F.round(
            F.col("dm") / F.sqrt(F.col("se1") + F.col("se2")), 6
        ).alias("t_stat"),
        F.round(
            (F.col("se1") + F.col("se2"))
            * (F.col("se1") + F.col("se2"))
            / (
                F.col("se1") * F.col("se1") / (F.col("n_hi") - 1)
                + F.col("se2") * F.col("se2") / (F.col("n_lo") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


@q(
    "rel_mann_whitney_auc",
    """
    WITH base AS (
      SELECT r_name,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS hi,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey),
    rk AS (
      SELECT r_name, hi,
             2 * rank() OVER (PARTITION BY r_name ORDER BY cents)
               + count(*) OVER (PARTITION BY r_name, cents) - 1
               AS avgrank2
      FROM base),
    agg AS (
      SELECT r_name,
             CAST(sum(hi) AS BIGINT) AS n_hi,
             CAST(sum(1 - hi) AS BIGINT) AS n_lo,
             CAST(sum(CASE WHEN hi = 1 THEN avgrank2 ELSE 0 END) AS HUGEINT)
               AS r1_x2
      FROM rk GROUP BY r_name)
    SELECT r_name, n_hi, n_lo,
           CAST(r1_x2 - CAST(n_hi AS HUGEINT) * (n_hi + 1) AS BIGINT) AS u1_x2,
           CAST(((r1_x2 - CAST(n_hi AS HUGEINT) * (n_hi + 1)) * 1000000
                 + CAST(n_hi AS HUGEINT) * n_lo)
                // (2 * CAST(n_hi AS HUGEINT) * n_lo) AS BIGINT) AS auc_ppm
    FROM agg
    WHERE n_hi > 0 AND n_lo > 0
    """,
)
def rel_mann_whitney_auc(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Whitney U / rank-sum AUC per region: the DISTRIBUTION-FREE
    companion to rel_welch_ttest on the same arms — U1 doubled to stay
    integral under average tie ranks (for a tie block of c values whose
    min rank is r, 2*avgrank = 2r + c - 1, both engine-portable window
    primitives), so u1_x2 is EXACT, and auc_ppm = U1/(n_hi*n_lo) is the
    half-up-ppm probability that a random HIGH/URGENT order outprices a
    random other order — the AUC identity that makes this the standard
    ranking-quality statistic.  One rank window per region plus a
    conditional aggregate; rank sums go through HUGEINT/DECIMAL(38,0)
    (R1 <= n^2 outgrows int64 past ~3e9 rows/region).  At 100 TB the
    per-key window is the cost: partition by region is 5-way here — for
    finer keys use the same double-rank algebra over a sampled arm."""
    base = (
        t(spark, sf, "orders")
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(t(spark, sf, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t(spark, sf, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name",
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .cast("int")
            .alias("hi"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    wr = Window.partitionBy("r_name").orderBy("cents")
    wt = Window.partitionBy("r_name", "cents")
    dec = "decimal(38,0)"
    rk = base.select(
        "r_name",
        "hi",
        (2 * F.rank().over(wr) + F.count("*").over(wt) - 1).alias("avgrank2"),
    )
    agg = rk.groupBy("r_name").agg(
        F.sum("hi").cast("long").alias("n_hi"),
        F.sum(1 - F.col("hi")).cast("long").alias("n_lo"),
        F.sum(F.when(F.col("hi") == 1, F.col("avgrank2")).otherwise(0))
        .cast(dec)
        .alias("r1_x2"),
    )
    u1 = (
        F.col("r1_x2") - F.col("n_hi").cast(dec) * (F.col("n_hi") + 1)
    ).cast(dec)
    return (
        agg.where((F.col("n_hi") > 0) & (F.col("n_lo") > 0))
        .select(
            "r_name",
            "n_hi",
            "n_lo",
            u1.cast("long").alias("u1_x2"),
            F.expr(
                f"CAST((CAST(r1_x2 - CAST(n_hi AS {dec}) * (n_hi + 1) AS {dec})"
                f" * 1000000 + CAST(n_hi AS {dec}) * n_lo)"
                f" div (2 * CAST(n_hi AS {dec}) * n_lo) AS BIGINT)"
            ).alias("auc_ppm"),
        )
    )


@q(
    "rel_basket_lift",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n_orders AS (SELECT CAST(count(DISTINCT ok) AS HUGEINT) AS n FROM op),
    freq AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_p FROM op GROUP BY pk),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk)
    SELECT part_a, part_b, n_ab,
           fa.n_p AS n_a, fb.n_p AS n_b,
           CAST((2 * (SELECT n FROM n_orders) * n_ab * 1000000
                 + CAST(fa.n_p AS HUGEINT) * fb.n_p)
                // (2 * CAST(fa.n_p AS HUGEINT) * fb.n_p) AS BIGINT)
             AS lift_e6
    FROM pairs
    JOIN freq fa ON part_a = fa.pk
    JOIN freq fb ON part_b = fb.pk
    ORDER BY n_ab DESC, part_a, part_b
    LIMIT 20
    """,
)
def rel_basket_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket association lift over co-ordered parts — the
    frequent-itemset primitive (pairs only): support n_ab from a
    within-order self-join, per-part frequencies, and
    lift = N * P(ab) / (P(a) P(b)) as an exact half-up-e6 rational
    (HUGEINT/DECIMAL(38,0) — N * n_ab * 1e6 outgrows int64 at
    warehouse scale).  Top-20 by support with full key tie-breaks.
    Scale shape: the pair join is keyed on the order and TPC-H-bounded
    at <= 7 distinct parts/order, so fan-out is <= 21 pairs/order —
    the same bounded-blocking argument as doc_ngram_jaccard_block's
    df cap; frequencies and N broadcast.  Top-k is
    TakeOrderedAndProject, never a global sort.  The distinct basket
    table is pinned once (localCheckpoint — the doc_tfidf_topk persisted
    reused-base discipline): four consumers (N, frequencies, both pair
    sides) would otherwise each re-scan and re-distinct the fact
    table."""
    li = (
        t(spark, sf, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dec = "decimal(38,0)"
    n_orders = li.agg(
        F.countDistinct("ok").cast(dec).alias("n")
    )
    freq = li.groupBy("pk").agg(F.count("*").cast("long").alias("n_p"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(
            F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b")
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    fa = freq.select(F.col("pk").alias("part_a"), F.col("n_p").alias("n_a"))
    fb = freq.select(F.col("pk").alias("part_b"), F.col("n_p").alias("n_b"))
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(
                f"CAST((2 * n * n_ab * 1000000"
                f" + CAST(n_a AS {dec}) * n_b)"
                f" div (2 * CAST(n_a AS {dec}) * n_b) AS BIGINT)"
            ).alias("lift_e6"),
        )
        .orderBy(F.col("n_ab").desc(), "part_a", "part_b")
        .limit(20)
    )


def _lsh_bucket_oracle(dim: int = 64, bands: int = 4, bits: int = 24) -> str:
    width = bits // bands
    sig = _lsh_sig_sql(dim, bits)
    return f"""
    WITH sigs AS (
      SELECT vec_id AS id, ({sig}) AS sig FROM embeddings),
    banded AS (
      SELECT id, CAST(band AS INT) AS band,
             (sig >> (band * {width})) & {(1 << width) - 1} AS key
      FROM sigs, (SELECT unnest(generate_series(0, {bands - 1})) AS band)),
    c AS (SELECT band, key, CAST(count(*) AS BIGINT) AS c
          FROM banded GROUP BY band, key)
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(c) AS BIGINT) AS n_items,
           CAST(max(c) AS BIGINT) AS max_bucket,
           CAST(sum(CAST(c AS HUGEINT) * (c - 1)) // 2 AS BIGINT) AS est_pairs,
           CAST((2 * CAST(max(c) AS HUGEINT) * 1000000 + sum(c))
                // (2 * CAST(sum(c) AS HUGEINT)) AS BIGINT) AS top_share_ppm
    FROM c GROUP BY band
    """


@q("emb_bucket_balance", _lsh_bucket_oracle())
def emb_bucket_balance(spark: SparkSession, sf: str) -> DataFrame:
    """LSH index load-balance report (operators/similarity
    .lsh_bucket_stats) over the SAME 4-band/24-bit signature space the
    graded emb_lsh_topk serves from: per band, bucket count, the largest
    bucket, the EXACT candidate-pair bill sum c*(c-1)/2 the (band, key)
    self-join would pay, and the hot bucket's half-up-ppm item share.
    The shuffle-skew pre-flight every banded/bucketed operator in this
    repo assumes: read this BEFORE the pair join, re-tune bits per band
    (or salt) when top_share_ppm drifts toward 1e6.  One (band, key)
    exchange + a 4-row aggregate; all-integer outputs, pair arithmetic
    through DECIMAL(38,0)/HUGEINT (sum c^2 outgrows int64 past ~3e9-item
    buckets)."""
    from presto_ethereum_spark.operators.similarity import lsh_bucket_stats

    e = t_spread(spark, sf, "embeddings", parts=8)
    return lsh_bucket_stats(e, dim=64, bands=4, bits=24)


@q(
    "doc_code_prose_screen",
    """
    WITH m AS (
      SELECT doc_id, source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text)
                  - length(translate(text, '{}();=[]<>#&|\\', ''))
                  AS BIGINT) AS n_code,
             CAST(length(text) - length(replace(text, ' ', ''))
                  AS BIGINT) AS n_space
      FROM documents WHERE length(text) > 0),
    s AS (
      SELECT doc_id, source, n_chars, n_code,
             CAST((2 * n_code * 1000000 + n_chars) // (2 * n_chars)
                  AS BIGINT) AS code_ppm,
             CAST((2 * n_space * 1000000 + n_chars) // (2 * n_chars)
                  AS BIGINT) AS space_ppm
      FROM m)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN code_ppm >= 20000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_codeish,
           CAST(max(code_ppm) AS BIGINT) AS max_code_ppm,
           CAST(sum(n_code) AS BIGINT) AS total_code_chars,
           CAST((2 * sum(n_code) * 1000000 + sum(n_chars))
                // (2 * sum(n_chars)) AS BIGINT) AS corpus_code_ppm
    FROM s GROUP BY source
    """,
)
def doc_code_prose_screen(spark: SparkSession, sf: str) -> DataFrame:
    """Code-vs-prose corpus screen — the pretraining-mix gate that
    decides whether a crawl source is leaking source code into a prose
    corpus (or vice versa): per-document density of code-indicative
    characters (braces, semicolons, operators — counted EXACTLY via the
    translate-delete idiom, no regex dialect to disagree on), rolled up
    per source as flagged-doc counts at the 2% density threshold, the
    worst document, and the corpus-level density.  All half-up-ppm
    integers; one map-side projection + one grouped aggregate — the
    whole screen is a single linear pass at any corpus size, the same
    cost class as doc_quality."""
    d = t_spread(spark, sf, "documents").where(F.length("text") > 0)
    code_chars = "{}();=[]<>#&|\\"
    m = d.select(
        "source",
        F.length("text").cast("long").alias("n_chars"),
        (
            F.length("text") - F.length(F.translate(F.col("text"), code_chars, ""))
        )
        .cast("long")
        .alias("n_code"),
    )
    s = m.select(
        "source",
        "n_chars",
        "n_code",
        F.expr(
            "CAST((2 * n_code * 1000000 + n_chars) div (2 * n_chars) AS BIGINT)"
        ).alias("code_ppm"),
    )
    return s.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("code_ppm") >= 20000).cast("int"))
        .cast("long")
        .alias("n_codeish"),
        F.max("code_ppm").cast("long").alias("max_code_ppm"),
        F.sum("n_code").cast("long").alias("total_code_chars"),
        F.expr(
            "CAST((2 * sum(n_code) * 1000000 + sum(n_chars))"
            " div (2 * sum(n_chars)) AS BIGINT)"
        ).alias("corpus_code_ppm"),
    )


@q(
    "doc_boundary_leakage",
    """
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
    seq AS (
      SELECT doc_id, source, ts,
             lag(ts) OVER (PARTITION BY source ORDER BY doc_id) AS prev
      FROM toks),
    ov AS (
      SELECT source, doc_id,
             CAST(len(list_intersect(
               list_distinct(prev[greatest(len(prev) - 7, 1):len(prev)]),
               list_distinct(ts[1:least(8, len(ts))])))
               AS BIGINT) AS n_shared
      FROM seq WHERE prev IS NOT NULL)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_boundaries,
           CAST(sum(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaky,
           CAST(sum(n_shared) AS BIGINT) AS total_shared,
           CAST(max(n_shared) AS BIGINT) AS max_shared
    FROM ov GROUP BY source
    """,
)
def doc_boundary_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-packing BOUNDARY LEAKAGE audit: when documents are packed
    back-to-back into training sequences in corpus order (doc_pack
    _sequences' contract), how often does a document's 8-token prefix
    share tokens with its predecessor's 8-token suffix?  Shared boundary
    tokens mean the model sees near-continuations across what should be
    independent samples — the quiet sibling of dedup leakage that
    doc_split_leakage guards across SPLITS, measured here across PACK
    NEIGHBORS.  Exact distinct-token set intersection (order-free, both
    engines' set semantics), one lag window over (source, doc_id) order
    + one grouped aggregate — two linear shuffles, no pair join, because
    adjacency is positional, not similarity-based."""
    d = t_spread(spark, sf, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("ts")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    seq = d.withColumn("prev", F.lag("ts").over(w))
    ov = seq.where(F.col("prev").isNotNull()).select(
        "source",
        F.size(
            F.array_intersect(
                F.array_distinct(
                    F.slice(
                        F.col("prev"),
                        F.greatest(F.size("prev") - 7, F.lit(1)),
                        8,
                    )
                ),
                F.array_distinct(F.slice(F.col("ts"), 1, 8)),
            )
        )
        .cast("long")
        .alias("n_shared"),
    )
    return ov.groupBy("source").agg(
        F.count("*").cast("long").alias("n_boundaries"),
        F.sum((F.col("n_shared") > 0).cast("int")).cast("long").alias("n_leaky"),
        F.sum("n_shared").cast("long").alias("total_shared"),
        F.max("n_shared").cast("long").alias("max_shared"),
    )


@q(
    "eth_fee_burn_split",
    f"""
    WITH tx AS (
      SELECT t.blocknumber AS bn,
             CAST(t.gas AS HUGEINT) AS g,
             CAST(t.gasprice AS HUGEINT) AS gp
      FROM (SELECT unnest(transactions) AS t
            FROM read_parquet('{ETH}/chain_blocks.parquet'))),
    base AS (
      SELECT bn, g, gp, min(gp) OVER (PARTITION BY bn) AS basefee
      FROM tx),
    blk AS (
      SELECT bn // 100 AS bucket,
             sum(g * basefee) AS burn,
             sum(g * (gp - basefee)) AS tips,
             CAST(count(*) AS BIGINT) AS n_tx
      FROM base GROUP BY bn // 100)
    SELECT CAST(bucket AS BIGINT) AS bucket, n_tx,
           CAST(burn AS VARCHAR) AS burn_wei,
           CAST(tips AS VARCHAR) AS tips_wei,
           CAST((2 * burn * 1000000 + (burn + tips))
                // nullif(2 * (burn + tips), 0) AS BIGINT) AS burn_share_ppm
    FROM blk
    """,
)
def eth_fee_burn_split(spark: SparkSession, sf: str) -> DataFrame:
    """EIP-1559-style fee DECOMPOSITION per 100-block bucket: with each
    block's minimum observed gas price standing in for the base fee (the
    fixture predates 1559 fields; documented stand-in, same shape as the
    real basefee join), every transaction's fee splits into the burned
    component gas*basefee and the priority tip gas*(gasprice-basefee).
    Exact DECIMAL(38,0)/HUGEINT wei throughout, digit-string read-outs
    (the balance family's bridge-stable contract), half-up-ppm burn
    share.  One per-block MIN window (bounded: txs per block), one
    grouped aggregate — the fee-market telemetry a chain-economics
    dashboard polls, next to eth_fee_oracle's percentile bands."""
    dec = "decimal(38,0)"
    tx = (
        _eth_tables(spark)
        .chain.select(F.explode("transactions").alias("t"))
        .select(
            F.col("t.blockNumber").alias("bn"),
            F.col("t.gas").cast(dec).alias("g"),
            F.col("t.gasprice").cast(dec).alias("gp"),
        )
    )
    base = tx.withColumn(
        "basefee", F.min("gp").over(Window.partitionBy("bn"))
    )
    blk = base.groupBy(F.expr("CAST(bn div 100 AS BIGINT)").alias("bucket")).agg(
        F.sum(F.col("g") * F.col("basefee")).cast(dec).alias("burn"),
        F.sum(F.col("g") * (F.col("gp") - F.col("basefee")))
        .cast(dec)
        .alias("tips"),
        F.count("*").cast("long").alias("n_tx"),
    )
    return blk.select(
        "bucket",
        "n_tx",
        F.col("burn").cast("string").alias("burn_wei"),
        F.col("tips").cast("string").alias("tips_wei"),
        F.expr(
            f"CAST((2 * burn * 1000000 + (burn + tips))"
            f" div nullif(2 * (burn + tips), CAST(0 AS {dec})) AS BIGINT)"
        ).alias("burn_share_ppm"),
    )


@q(
    "multimodal_png_corrupt_screen",
    f"""
    SELECT media_id,
           media_id % 13 != 0 AS ok,
           CASE WHEN media_id % 13 = 0 THEN 'bad-signature' END AS err,
           CASE WHEN media_id % 13 != 0 THEN true_width END AS width,
           CASE WHEN media_id % 13 != 0 THEN true_height END AS height
    FROM read_parquet('{MEDIA}/images.parquet')
    """,
)
def multimodal_png_corrupt_screen(spark: SparkSession, sf: str) -> DataFrame:
    """Decode QUARANTINE over a deliberately dirtied corpus: every 13th
    image's blob is beheaded in-plan (the 8-byte PNG signature sliced
    off with substring on the binary column — corruption the ingest
    would see from truncated uploads), then multimodal.png_decode_screen
    classifies each blob instead of failing the task: corrupt rows carry
    (ok=false, err class, NULL dims), clean rows carry their REAL
    decoded dimensions.  The oracle derives the expected verdict + truth
    dims arithmetically from the untouched fixture, so the gate proves
    both the error path (all planted corruptions caught, classified) and
    that quarantining never perturbs a clean row's decode.  Same
    mapInPandas scale story as the stats entry."""
    from presto_ethereum_spark.operators.multimodal import png_decode_screen

    imgs = spark.read.parquet(str(MEDIA / "images.parquet")).select(
        "media_id",
        F.when(
            F.col("media_id") % 13 == 0,
            F.expr("substring(png, 9, length(png) - 8)"),
        )
        .otherwise(F.col("png"))
        .alias("png"),
    )
    return png_decode_screen(imgs)


@q(
    "stream_png_ingest",
    f"""
    SELECT media_id,
           true_width AS width,
           true_height AS height,
           true_channels AS channels,
           true_sum_r AS sum_r,
           true_sum_g AS sum_g,
           true_sum_b AS sum_b,
           true_thumb_md5 AS thumb_md5
    FROM read_parquet('{MEDIA}/images.parquet')
    """,
)
def stream_png_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """The REAL decode as a STANDING INGEST (streaming/media
    .run_png_ingest): the image corpus streams in as three micro-batches
    (maxFilesPerTrigger=1), each decoded through the actual PNG codec
    inside foreachBatch and appended to the result table.  Graded
    against the same pre-encode ground truth as the batch entry — decode
    is per-row pure, so the settled stream equals the batch decode with
    NO merge algebra (the split-invariance freebie; contrast the
    additive balance ledger).  Zero exchanges end-to-end: decode is
    map-side, the sink appends partition-locally."""
    from presto_ethereum_spark.streaming.media import run_png_ingest

    return run_png_ingest(spark, str(MEDIA / "images.parquet"), splits=3)


@q(
    "multimodal_wav_decode_stats",
    f"""
    SELECT media_id,
           true_rate AS rate,
           true_channels AS channels,
           true_frames AS n_frames,
           true_sumsq AS sum_sq,
           true_peak AS peak,
           true_zero_crossings AS zero_crossings
    FROM read_parquet('{MEDIA}/audio.parquet')
    """,
)
def multimodal_wav_decode_stats(spark: SparkSession, sf: str) -> DataFrame:
    """REAL end-to-end AUDIO decode — the WAV sibling of
    multimodal_png_decode_stats: Spark parses each fixture row's actual
    RIFF/PCM16 container (operators/wav.py, public container layout +
    stdlib struct; sine/square/saw/chirp/noise clips, 3 sample rates,
    mono + stereo) inside mapInPandas and recomputes rate, channels,
    frames, exact integer energy, peak, and channel-0 sign changes.
    The oracle reads the GROUND-TRUTH columns the generator computed
    from the source samples BEFORE encoding — all-integer, so the hash
    gate passes only on exact sample reconstruction.  With this, image
    AND audio decode run for real in CI; video remains the one
    byte-plumbing-only modality (no public pure-stdlib codec)."""
    from presto_ethereum_spark.operators.multimodal import wav_decode_stats

    return wav_decode_stats(spark.read.parquet(str(MEDIA / "audio.parquet")))


@q(
    "rel_rfm_segments",
    """
    WITH p AS (
      SELECT user_id,
             epoch_us(max(ts)) // 86400000000 AS r,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    tr AS (
      SELECT min(CASE WHEN cum * 4 >= 1 * tot THEN v END) AS q1,
             min(CASE WHEN cum * 4 >= 2 * tot THEN v END) AS q2,
             min(CASE WHEN cum * 4 >= 3 * tot THEN v END) AS q3
      FROM (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(c) OVER () AS tot
            FROM (SELECT r AS v, count(*) AS c FROM p GROUP BY r))),
    tf AS (
      SELECT min(CASE WHEN cum * 4 >= 1 * tot THEN v END) AS q1,
             min(CASE WHEN cum * 4 >= 2 * tot THEN v END) AS q2,
             min(CASE WHEN cum * 4 >= 3 * tot THEN v END) AS q3
      FROM (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(c) OVER () AS tot
            FROM (SELECT f AS v, count(*) AS c FROM p GROUP BY f))),
    tm AS (
      SELECT min(CASE WHEN cum * 4 >= 1 * tot THEN v END) AS q1,
             min(CASE WHEN cum * 4 >= 2 * tot THEN v END) AS q2,
             min(CASE WHEN cum * 4 >= 3 * tot THEN v END) AS q3
      FROM (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(c) OVER () AS tot
            FROM (SELECT m AS v, count(*) AS c FROM p GROUP BY m)))
    SELECT CAST(1 + (r > tr.q1)::INT + (r > tr.q2)::INT + (r > tr.q3)::INT
                AS INT) AS r_bucket,
           CAST(1 + (f > tf.q1)::INT + (f > tf.q2)::INT + (f > tf.q3)::INT
                AS INT) AS f_bucket,
           CAST(1 + (m > tm.q1)::INT + (m > tm.q2)::INT + (m > tm.q3)::INT
                AS INT) AS m_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(m) AS BIGINT) AS total_m_cents
    FROM p, tr, tf, tm
    GROUP BY 1, 2, 3
    """,
)
def rel_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation — the retention/marketing workhorse:
    per purchasing user, Recency (last purchase DAY, exact epoch-day —
    day grain keeps the threshold window's distinct-value domain at
    calendar size, not user cardinality),
    Frequency (purchase count), Monetary (LONG cents), each assigned a
    1..4 quartile bucket against EXACT PERCENTILE_DISC thresholds
    (operators/stats.grouped_percentile_disc's integer-comparison rule —
    thresholds are actual data values, never interpolated doubles, so
    both engines agree bit-for-bit and ties land deterministically by
    value, not input order).  Output: the <=64 (R,F,M) cells with user
    counts and cents mass.  One user-keyed aggregate + three
    distinct-value cumulative windows (bounded by distinct metric
    values: calendar days for R, small ints for F; M's cents domain is
    the widest — at extreme scale swap its exact threshold for
    rel_histogram_quantiles' fixed-bin estimate) + three broadcast 1-row
    threshold joins — no per-user window over the raw event stream, so
    the plan survives any user cardinality."""
    from presto_ethereum_spark.operators.stats import grouped_percentile_disc

    ev = t(spark, sf, "events").where(F.col("event_type") == "purchase")
    p = ev.groupBy("user_id").agg(
        F.expr("CAST(max(ts) DIV 1000 DIV 86400000000 AS BIGINT)").alias("r"),
        F.count("*").cast("long").alias("f"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("m"),
    )
    qs = [("q1", 1, 4), ("q2", 2, 4), ("q3", 3, 4)]
    thr = {
        name: grouped_percentile_disc(p, [], name, qs).select(
            F.col("q1").alias(f"{name}_q1"),
            F.col("q2").alias(f"{name}_q2"),
            F.col("q3").alias(f"{name}_q3"),
        )
        for name in ("r", "f", "m")
    }
    j = p
    for name in ("r", "f", "m"):
        j = j.crossJoin(F.broadcast(thr[name]))

    def bucket(name: str):
        return (
            1
            + (F.col(name) > F.col(f"{name}_q1")).cast("int")
            + (F.col(name) > F.col(f"{name}_q2")).cast("int")
            + (F.col(name) > F.col(f"{name}_q3")).cast("int")
        ).cast("int")

    return (
        j.select(
            bucket("r").alias("r_bucket"),
            bucket("f").alias("f_bucket"),
            bucket("m").alias("m_bucket"),
            "m",
        )
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("m").cast("long").alias("total_m_cents"),
        )
    )


@q(
    "rel_percentile_cont",
    """
    WITH v AS (
      SELECT n_name,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY n_name ORDER BY
                                round(o_totalprice * 100)) AS rn,
             count(*) OVER (PARTITION BY n_name) AS n
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    k AS (
      SELECT n_name, cents, rn, n,
             (n - 1) // 2 AS k50, (n - 1) % 2 AS r50,
             ((n - 1) * 9) // 10 AS k90, ((n - 1) * 9) % 10 AS r90
      FROM v)
    SELECT n_name,
           CAST(max(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN rn = k50 + 1 THEN cents * (2 - r50)
                         WHEN rn = k50 + 2 THEN cents * r50
                         ELSE 0 END) AS BIGINT) AS p50_cents_x2,
           CAST(sum(CASE WHEN rn = k90 + 1 THEN cents * (10 - r90)
                         WHEN rn = k90 + 2 THEN cents * r90
                         ELSE 0 END) AS BIGINT) AS p90_cents_x10
    FROM k GROUP BY n_name
    """,
)
def rel_percentile_cont(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-standard PERCENTILE_CONT, EXACT — the interpolated quantile
    that completes the repo's quantile inventory (disc: eth_fee_oracle /
    rel_weighted_median; sketch: rel_approx_sketches; mergeable
    histogram: rel_histogram_quantiles): at rank position (n-1)p the
    value is v_k*(1-frac) + v_{k+1}*frac, and for rational p the
    interpolation is an INTEGER once scaled by p's denominator — p50
    reads out as cents*2, p90 as cents*10, so both engines agree
    bit-for-bit with zero doubles anywhere (the disc family's
    integer-comparison discipline extended to interpolation).  One
    row_number window per group + a conditional aggregate; equal values
    may permute under row_number but the selected POSITIONS read the
    same multiset values, so ties cannot perturb the result.  At 100 TB
    the per-group sort is the cost — same class as any exact quantile;
    swap for the histogram entry when an estimate suffices."""
    ev = (
        t(spark, sf, "orders")
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(t(spark, sf, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    w = Window.partitionBy("n_name").orderBy("cents")
    v = ev.select(
        "n_name",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("n_name")).alias("n"),
    ).select(
        "*",
        F.expr("(n - 1) DIV 2").alias("k50"),
        F.expr("(n - 1) % 2").alias("r50"),
        F.expr("((n - 1) * 9) DIV 10").alias("k90"),
        F.expr("((n - 1) * 9) % 10").alias("r90"),
    )
    return v.groupBy("n_name").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(
            F.when(F.col("rn") == F.col("k50") + 1, F.col("cents") * (2 - F.col("r50")))
            .when(F.col("rn") == F.col("k50") + 2, F.col("cents") * F.col("r50"))
            .otherwise(0)
        )
        .cast("long")
        .alias("p50_cents_x2"),
        F.sum(
            F.when(
                F.col("rn") == F.col("k90") + 1, F.col("cents") * (10 - F.col("r90"))
            )
            .when(F.col("rn") == F.col("k90") + 2, F.col("cents") * F.col("r90"))
            .otherwise(0)
        )
        .cast("long")
        .alias("p90_cents_x10"),
    )
