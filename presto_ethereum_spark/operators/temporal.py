"""Temporal operators Spark lacks as built-ins: as-of join, sessionization,
interval (range) join.

All are implemented as compositions of existing DataFrame ops (the
preferred path — no Python in the pipeline), architected to scale:

- **as-of join** uses the union + partitioned-window algorithm: tag both
  sides, union them, sort within (key) by (time, side), and carry the last
  right-side row forward with a window ``last(ignorenulls)``.  Cost is one
  shuffle on the join key + one in-partition sort — NO range cross-product,
  no broadcast requirement, skew behaves like any window over the key.
- **sessionization** is the classic gap-based session assignment: a lag
  window marks session starts (gap > timeout), a running sum over the same
  window ordering numbers the sessions.  Two window passes over one
  shuffle-partitioning.
- **interval join** rewrites the non-equi range predicate
  ``start <= t < end`` as an EQUI-join on time bins: each interval explodes
  into the bins it covers, points carry their single bin, the join key is
  the bin, and the original predicate is re-applied as a residual filter.
  Without this, Spark plans a broadcast-nested-loop (O(|L|*|R|)); with it,
  the plan is an ordinary shuffled hash/sort-merge join whose fan-out is
  ``interval_length / bin_width + 1`` — pick bin_width near the median
  interval length so the explode factor stays ~2.

All are exactly expressible in SQL (DuckDB: ASOF JOIN is a built-in; the
session trick is standard; the range predicate is a plain theta join), so
the driver oracle gates them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "sessionize",
    "interval_join",
    "funnel_counts",
    "retention_cohorts",
    "scd2_build",
    "snapshot_diff",
    "time_weighted_avg",
    "max_concurrency",
    "merge_changeset",
    "ewma_last",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    left_time: str,
    right_time: str,
    on_right: str | None = None,
    right_value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` for the same key (``direction='backward'``;
    ``'forward'`` matches the next right row instead; ``'nearest'`` picks
    whichever side is closer in time, ties resolving backward — the
    pandas ``merge_asof`` direction set).  Left rows with no match keep
    nulls (LEFT ASOF JOIN semantics).

    ``tolerance`` (same NUMERIC units as the time columns) bounds the
    staleness of a match — pandas ``merge_asof(tolerance=...)`` semantics:
    a carried right row further than ``tolerance`` from the left time is
    treated as NO match (nulls), so a quote/state older than the allowed
    window never silently attaches.  Zero extra shuffles: the cut is one
    comparison on the already-carried match.

    Ties: a right row at exactly left_time matches (<=); make the right side
    unique per (key, time) upstream for fully determined output.
    """
    on_right = on_right or on_left
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in (on_right, right_time)
        ]

    # union with side tags: right rows sort BEFORE left rows at equal times
    # so <= semantics hold (backward); reversed for forward.
    lt = left.select(
        F.col(on_left).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in [right_time] + right_value_cols]).alias("s"))
            .schema["s"].dataType
        ).alias("_rrow"),
    )
    rt = right.select(
        F.col(on_right).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in [right_time] + right_value_cols]).alias("_rrow"),
    )
    unioned = lt.unionByName(rt)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_rrow", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("_rrow", ignorenulls=True).over(w)
    elif direction == "nearest":
        # both carries share ONE sort order (t asc, right-before-left at
        # equal t), so Spark plans a single shuffle + sort for the pair of
        # frames.  A right row at exactly left_time lands in the backward
        # carry (distance 0); ties in distance resolve backward (the
        # pandas merge_asof convention).
        base = Window.partitionBy("_k").orderBy(
            F.col("_t").asc(), F.col("_side").asc()
        )
        carried_b = F.last("_rrow", ignorenulls=True).over(
            base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried_f = F.first("_rrow", ignorenulls=True).over(
            base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        dist_b = F.col("_t") - carried_b[right_time]
        dist_f = carried_f[right_time] - F.col("_t")
        carried = (
            F.when(carried_b.isNull(), carried_f)
            .when(carried_f.isNull(), carried_b)
            .when(dist_b <= dist_f, carried_b)
            .otherwise(carried_f)
        )
    else:
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )

    matched = unioned.withColumn("_match", carried).where(F.col("_side") == 1)
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError(f"tolerance must be >= 0, got {tolerance}")
        if direction == "backward":
            dist = F.col("_t") - F.col("_match")[right_time]
        elif direction == "forward":
            dist = F.col("_match")[right_time] - F.col("_t")
        else:  # nearest: staleness is the absolute gap either side
            dist = F.abs(F.col("_t") - F.col("_match")[right_time])
        matched = matched.withColumn(
            "_match", F.when(dist <= F.lit(tolerance), F.col("_match"))
        )
    out = matched.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[
            F.col("_match")[c].alias(f"asof_{c}")
            for c in [right_time] + right_value_cols
        ],
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap: Column | int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event exceeds ``gap`` (same units as time_col).

    Output adds ``session_id`` (0-based per key) and ``is_session_start``.
    """
    order_cols = [F.col(time_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev = F.lag(time_col).over(w)
    is_start = F.when(
        prev.isNull() | ((F.col(time_col) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    running = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("is_session_start", is_start).withColumn(
        "session_id", F.sum("is_session_start").over(running) - 1
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start: str,
    end: str,
    bin_width: int,
) -> DataFrame:
    """Inner join of ``points`` to ``intervals`` on
    ``start <= point_time < end`` (half-open), as a bin-bucketed equi-join.

    ``point_time``/``start``/``end`` are integer columns in the same unit
    (e.g. epoch-µs).  ``bin_width`` is the bucketing granularity in that
    unit: intervals explode into ``sequence(start DIV w, (end-1) DIV w)``
    bins, points join on their single bin — an equi shuffle both Catalyst
    and AQE can plan (broadcast if one side is small, skew-split if a bin
    is hot), instead of the nested-loop a raw range predicate forces.

    A point's bin matches at most one exploded bin per interval, so the
    rewrite produces no duplicates and needs no distinct.  Output columns =
    points' columns ++ intervals' columns (names must not collide).
    """
    wlit = int(bin_width)
    if wlit <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")

    def fdiv(expr_sql: str) -> Column:
        # floor division (pmod keeps it correct for pre-epoch times, where
        # DIV alone truncates toward zero and would shift the bin)
        c = f"({expr_sql})"
        return F.expr(f"({c} - pmod({c}, {wlit})) DIV {wlit}")

    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                fdiv(f"CAST(`{start}` AS BIGINT)"),
                fdiv(f"CAST(`{end}` AS BIGINT) - 1"),
            )
        ),
    )
    pt = points.withColumn("_bin", fdiv(f"CAST(`{point_time}` AS BIGINT)"))
    joined = pt.join(iv, "_bin").where(
        (F.col(start) <= F.col(point_time)) & (F.col(point_time) < F.col(end))
    )
    return joined.drop("_bin")


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "t_us",
) -> DataFrame:
    """Ordered funnel: (stage, step, users) — users reaching step i+1 only
    count if that event happened STRICTLY AFTER their first completion of
    step i (the standard product-analytics funnel semantics; an unordered
    count would credit a purchase that preceded the view).

    Plan at scale — SINGLE PASS over the event log: one shuffle groups each
    user's step-relevant event times into |steps| sorted arrays (events of
    other types are dropped map-side by the conditional collect); the
    sequential reach times are then pure per-row array expressions
    (``array_min(filter(ts_i, t > reach_{i-1}))``), and the final counts
    are one global conditional aggregate unpivoted with ``inline`` — 2
    exchanges total regardless of |steps|, vs one join+agg pair per step in
    the naive per-stage formulation.

    Memory: the agg buffer holds each user's step-typed event times (the
    later steps need the full list — the first-after-previous threshold
    isn't known map-side).  That is bounded by per-user funnel-event count,
    fine for product-analytics logs; a pathological hot user wants a
    per-(user,type) pre-cap upstream.
    """
    per_type = [
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == s, F.col(time_col)))
        ).alias(f"ts_{i}")
        for i, s in enumerate(steps)
    ]
    g = df.groupBy(F.col(user_col).alias("u")).agg(*per_type)

    # reach_0 = first step-0 event; reach_i = first step-i event strictly
    # after reach_{i-1} (null propagates: no reach_{i-1} -> no reach_i).
    # try_element_at: a user may have NO step-0 events (empty array).
    # The one-arg closure matters: F.filter treats a two-parameter lambda
    # as (element, index).
    def _after(r):
        return lambda x: x > r

    reach = F.try_element_at(F.col("ts_0"), F.lit(1))
    reach_cols = [reach.alias("r_0")]
    for i in range(1, len(steps)):
        reach = F.array_min(F.filter(F.col(f"ts_{i}"), _after(reach)))
        reach_cols.append(reach.alias(f"r_{i}"))

    counts = g.select(*reach_cols).agg(
        *[
            F.coalesce(
                F.sum(F.col(f"r_{i}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"c_{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(s).alias("step"),
                F.col(f"c_{i}").alias("users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.inline(rows))


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts_micros",
    max_weeks: int = 8,
) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, active_users).

    cohort_week = Monday of the user's first-ever event; a user is counted
    at offset k if they have any event in cohort_week + k weeks.  The
    classic growth-analytics triangle.

    Plan at scale: first-seen is one groupBy-min on user; the event log then
    joins that (user -> cohort) map — broadcast when it fits, hash join
    otherwise — and the distinct-user count per (cohort, offset) cell is a
    partial-aggregated shuffle on a tiny composite key.  No window over the
    full log, no per-user sort.

    Week truncation goes through TIMESTAMP_NTZ (timestamp_add on an NTZ
    epoch), NOT timestamp_micros: the LTZ route truncates in the session
    timezone, which silently shifts cohort boundaries on any non-UTC
    driver."""
    epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    week = lambda c: F.date_trunc(  # noqa: E731
        "week", F.timestamp_add("MICROSECOND", c, epoch_ntz)
    )
    first_seen = (
        df.select(F.col(user_col).alias("u"), F.col(time_col).alias("t"))
        .groupBy("u")
        .agg(F.min("t").alias("t0"))
        .select("u", week(F.col("t0")).cast("date").alias("cohort_week"))
    )
    ev = df.select(
        F.col(user_col).alias("u"), week(F.col(time_col)).cast("date").alias("ew")
    )
    return (
        ev.join(first_seen, "u")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("ew"), F.col("cohort_week")) / 7).cast("int"),
        )
        .where(F.col("week_offset") < max_weeks)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col("u")).alias("active_users"))
    )


def scd2_build(
    df: DataFrame,
    key_col: str,
    time_col: str,
    attr_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from an event log:
    one row per (key, consecutive run of equal ``attr_col``), with
    ``valid_from`` / ``valid_to`` interval bounds (half-open; NULL
    valid_to = current version) and a per-key ``version`` ordinal.

    The warehouse-dimension primitive: an entity's attribute timeline,
    change-compressed (an event that repeats the current value extends the
    open version instead of opening a new one).

    Plan — ONE shuffle on the key, window-only: ``lag`` flags change
    points, a running sum numbers versions, and — since a version's first
    event IS its change point — filtering to change rows directly yields
    (version, attr, valid_from) with no (key, version) re-aggregation;
    ``valid_to`` is the next change row's time via ``lead`` over the same
    key partitioning.  Every window clusters on the key, so the single
    exchange is reused end-to-end (guarded in test_plan_shapes).  Events
    are ordered by (time, tiebreak) so simultaneous events resolve
    deterministically.
    """
    order = [F.col(time_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    run = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag(F.col(attr_col)).over(w)
    is_change = (
        prev.isNull() | (~prev.eqNullSafe(F.col(attr_col)))
    ).cast("long")
    starts = (
        df.withColumn("_chg", is_change)
        .withColumn("version", F.sum("_chg").over(run) - 1)
        .where(F.col("_chg") == 1)
    )
    w2 = Window.partitionBy(key_col).orderBy("version")
    return starts.select(
        F.col(key_col).alias("key"),
        F.col("version").cast("int").alias("version"),
        F.col(attr_col).alias("attr"),
        F.col(time_col).alias("valid_from"),
        F.lead(F.col(time_col)).over(w2).alias("valid_to"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture diff of two snapshots of the same keyed table:
    one row per key whose state changed, tagged ``insert`` / ``delete`` /
    ``update``, with the old and new values of every compared column
    (``old_<c>`` / ``new_<c>``).  Unchanged keys are dropped — at 100 TB
    the diff is the small output; emitting unchanged rows would make every
    incremental pipeline rewrite the world.

    Plan: one full-outer hash join on the key; change classification and
    column comparison are row-local expressions (``eqNullSafe`` per
    compared column, so NULL-to-value transitions count as updates).  Both
    snapshots shuffle on the same key — on a real deployment bucket both
    tables by the key and the join is exchange-free.
    """
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full")
    # empty compare_cols = presence-only diff: every matched key is
    # "unchanged", only inserts/deletes survive
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in key_cols
            ],
            "change",
            *[
                c
                for pair in (
                    [F.col(f"old_{cc}"), F.col(f"new_{cc}")] for cc in compare_cols
                )
                for c in pair
            ],
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Time-weighted average (TWAP): each observation holds from its
    timestamp until the key's next observation, and the average weights
    values by how long they held — the standard fix for irregularly
    sampled series, where a plain mean over-counts bursts (a price that
    flickered for 1 ms counts like one that held for an hour).

    Exactness contract: values quantize to integer cents
    (``round(v*100)``, digit-0 — cannot diverge between engines) and
    weights are integer microsecond durations from ``lead``; the
    numerator multiplies AND accumulates cents·µs in DECIMAL(38,0) (one
    operand is cast before the multiply, so even a single row's product —
    cents ~1e7 × µs ~1e12 brushes 2^63 — can never wrap), so both engines
    produce the SAME two integers and the final twap double — the exact
    rational ``S / (total_dt · 100)`` evaluated with the same two IEEE
    divisions — is bit-identical with no rounding anywhere.  The last
    observation per key carries zero duration (nothing follows it);
    single-observation keys report NULL twap (no time elapsed is not an
    average).

    Plan: one window shuffle on the key (lead), one hash aggregation —
    the same two exchanges any per-key ordered rollup pays.

    Returns ``(key, n_obs, total_dt_us, twap)``."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    staged = df.select(
        F.col(key_col).alias("key"),
        cents.alias("_c"),
        F.col(ts_us_col).alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
    ).withColumn("_dt", F.lead("_t").over(
        Window.partitionBy("key").orderBy("_t", "_tb")
    ) - F.col("_t"))
    return (
        staged.groupBy("key")
        .agg(
            F.count("*").alias("n_obs"),
            F.sum("_dt").alias("total_dt_us"),
            # cast an OPERAND to decimal(38,0) so the per-row product is
            # itself decimal — cents ~1e7 x dt_us ~1e12 already brushes
            # 2^63, and a LONG product would wrap silently (non-ANSI)
            # before the decimal sum ever saw it
            F.sum(F.col("_c").cast("decimal(38,0)") * F.col("_dt")).alias("_s"),
        )
        .select(
            F.col("key"),
            F.col("n_obs").cast("long").alias("n_obs"),
            F.coalesce(F.col("total_dt_us"), F.lit(0))
            .cast("long")
            .alias("total_dt_us"),
            F.when(
                F.coalesce(F.col("total_dt_us"), F.lit(0)) > 0,
                F.col("_s").cast("double")
                / F.col("total_dt_us").cast("double")
                / 100,
            ).alias("twap"),
        )
    )


def max_concurrency(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Peak number of simultaneously active intervals per key — the
    classic sweep-line: each interval contributes a ``+1`` edge at its
    start and a ``-1`` edge at its (exclusive) end, and the peak is the
    maximum of the running edge sum in time order.  The capacity-planning
    primitive (max concurrent sessions / shipments in transit / open
    connections) that a naive self-join answers in O(n²) interval pairs;
    this is O(n log n) as ONE window pass.

    Tie semantics: an interval ending exactly when another starts does
    NOT overlap it (the ``-1`` sorts before the ``+1`` at equal t), and
    the within-tie order is totalized by ``id_col`` so every engine and
    partitioning walks the identical edge sequence.

    Returns ``(key..., n_intervals, peak, t_at_peak)`` — ``t_at_peak``
    the earliest time the peak is reached.  All integer; bit-identical
    in any engine.

    Scale: the edge union doubles the rows map-side (no shuffle), then
    one shuffle on ``key_cols`` for the running-sum window and the final
    aggregation rides the same partitioning.  Running sums over a very
    hot single key serialize into one task — at that point pre-bucket
    time into coarse epochs per key and sweep within epochs carrying the
    epoch-boundary offsets (the standard two-level scan), or salt the
    key if only the peak (not its time) is needed per coarse window."""
    ks = [F.col(c) for c in key_cols]
    # single-scan edge generation: each interval row explodes into its
    # +1/-1 edge pair (a two-branch union would read the input twice)
    edges = df.select(
        *ks,
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("_t"),
                    F.lit(1).alias("_delta"),
                    F.col(id_col).alias("_tie"),
                ),
                F.struct(
                    F.col(end_col).alias("_t"),
                    F.lit(-1).alias("_delta"),
                    F.col(id_col).alias("_tie"),
                ),
            )
        ).alias("_e"),
    ).select(*ks, F.col("_e._t").alias("_t"),
             F.col("_e._delta").alias("_delta"),
             F.col("_e._tie").alias("_tie"))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_t", "_delta", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = edges.withColumn("_run", F.sum("_delta").over(w)).withColumn(
        "_peak", F.max("_run").over(Window.partitionBy(*key_cols))
    )
    return (
        swept.groupBy(*key_cols)
        .agg(
            (F.count("*") / 2).cast("long").alias("n_intervals"),
            F.max("_run").cast("long").alias("peak"),
            F.min(
                F.when(F.col("_run") == F.col("_peak"), F.col("_t"))
            ).cast("long").alias("t_at_peak"),
        )
    )


def merge_changeset(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    validate_unique: bool = True,
) -> DataFrame:
    """Batch MERGE (Delta/Iceberg ``MERGE INTO`` semantics) as ONE
    full-outer shuffle: apply a changeset of inserts / updates / deletes
    to a base table.

    ``changes`` carries the base's columns plus ``op_col`` ∈
    {'I','U','D'}.  Semantics per key:

    - matched + ``U``  -> row replaced by the change's values (``updated``)
    - matched + ``D``  -> row removed
    - matched + ``I``  -> insert conflict: base row wins (``kept``)
    - unmatched + ``I``-> new row (``inserted``)
    - unmatched + ``U``/``D`` -> no-op (nothing to update/delete)
    - base key absent from the changeset -> unchanged (``kept``)

    Returns the post-merge table (base schema + ``action``).

    Scale: the naive 3-pass formulation (update join + kept anti-join +
    insert anti-join) scans and shuffles the base three times; this is
    ONE co-partitioned full-outer join — both sides shuffle once on the
    key and every MERGE branch is a projection over the joined row.  The
    changeset is usually tiny next to the base, so AQE broadcasts it and
    the base never shuffles at all; either way no branch re-reads.

    CONTRACT: the changeset carries at most ONE row per key — the same
    precondition Delta/Iceberg ``MERGE INTO`` enforces with a
    multiple-matches error (a second change for a key would otherwise fan
    the base row out once per change).  With ``validate_unique`` (default)
    a duplicate key raises at execution time via ``raise_error``,
    distributed — no driver-side count; the check is a groupBy(key) count
    whose hash partitioning the full-outer join reuses, so it adds zero
    exchanges to the merge plan.  Disable only when the
    changeset is produced by an upstream that already guarantees it (e.g.
    the CDC compactor's last-op-per-key output)."""
    val_cols = [c for c in base.columns if c != key]
    bs = base.select(
        F.col(key), F.struct(*[F.col(c) for c in val_cols]).alias("_b")
    )
    cs = changes.select(
        F.col(key),
        F.col(op_col).alias("_op"),
        F.struct(*[F.col(c) for c in val_cols]).alias("_c"),
    )
    if validate_unique:
        # The check rides the join's own key distribution: a groupBy(key)
        # whose hash partitioning satisfies the full-outer join's
        # requirement, so validation adds NO exchange beyond the one the
        # merge already pays (map-side partial counts; the r7 window
        # formulation re-shuffled + re-sorted the changeset a second time
        # and doubled rel_merge_upsert's wall time).  _first is safe: with
        # _n == 1 it is the only row, with _n > 1 the merge raises.
        cs = (
            cs.groupBy(key)
            .agg(
                F.count("*").alias("_n"),
                F.first("_op").alias("_op"),
                F.first("_c").alias("_c"),
            )
            .select(
                F.col(key),
                F.when(
                    F.col("_n") > 1,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "merge_changeset: multiple changeset rows "
                                "for key "
                            ),
                            F.col(key).cast("string"),
                        )
                    ),
                )
                .otherwise(F.col("_op"))
                .alias("_op"),
                F.col("_c"),
            )
        )
    j = bs.join(cs, key, "full_outer")
    action = (
        F.when(F.col("_b").isNull() & (F.col("_op") == "I"), F.lit("inserted"))
        .when(F.col("_b").isNotNull() & (F.col("_op") == "U"), F.lit("updated"))
        .when(F.col("_b").isNotNull() & (F.col("_op") == "D"), F.lit("deleted"))
        .when(F.col("_b").isNotNull(), F.lit("kept"))  # no/irrelevant change
    )
    picked = F.when(F.col("_action") == "updated", F.col("_c")).otherwise(
        F.coalesce("_b", "_c")
    )
    return (
        j.withColumn("_action", action)
        .where(F.col("_action").isin("inserted", "updated", "kept"))
        .withColumn("_row", picked)
        .select(
            F.col(key),
            *[F.col("_row")[c].alias(c) for c in val_cols],
            F.col("_action").alias("action"),
        )
    )


def ewma_last(
    df: DataFrame,
    key: str,
    time_col: str,
    cents_col: str,
    tiebreak: str,
    window: int = 20,
) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) of the last
    ``window`` observations per key — the trend/monitoring smoother where
    each newer observation counts double its predecessor.

    Integer-exact by construction: with dyadic weights the smoothed value
    is the rational ``Σ cents_i · 2^(m-i) / (2^m - 1)`` (i = 1 the most
    recent, m = min(#obs, window)); numerator and denominator are exact
    BIGINTs (cents ≤ ~1e7 · 2^20 ≈ 1e13 « 2^53), so the reported double
    is the same exact-integer ratio in every engine — the ``rel_twap``
    contract, no rounding anywhere.  The truncation at ``window`` IS the
    spec (the dropped tail carries < 2^-window of the mass), not an
    approximation of some other definition.

    Returns ``(key, n_obs, ewma_num, ewma_den, ewma)`` with ``ewma`` in
    the cents column's unit / 100.

    Scale: one shuffle on the key shared by the ranking window and the
    final aggregation; the per-key state is ``window`` rows regardless of
    history length (older rows are filtered before aggregating)."""
    if not 1 <= window <= 40:
        raise ValueError(f"window must be in [1, 40], got {window}")
    w = Window.partitionBy(key).orderBy(
        F.col(time_col).desc(), F.col(tiebreak).desc()
    )
    ranked = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= window)
        .withColumn("_m", F.count("*").over(Window.partitionBy(key)))
    )
    num = F.sum(
        F.col(cents_col)
        * F.expr("shiftleft(CAST(1 AS BIGINT), _m - _rn)")
    )
    den = F.expr("shiftleft(CAST(1 AS BIGINT), first(_m))") - 1
    return ranked.groupBy(key).agg(
        F.count("*").cast("long").alias("n_obs"),
        num.cast("long").alias("ewma_num"),
        den.cast("long").alias("ewma_den"),
        (
            num.cast("double") / (den).cast("double") / F.lit(100.0)
        ).alias("ewma"),
    )
