"""bench.py contract pins: list integrity + the frozen calibration probe.

A headline/incoming name that drifts from the battery registry fails at
bench time (the driver's per-round run), which is a round too late — pin
it in CI.  The calibration probe is CODE-FROZEN (SCALE.md §6c): its plan
signature is pinned so an accidental edit that would invalidate every
cross-round normalized comparison turns pytest red.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

from presto_ethereum_spark.plans import battery  # noqa: E402


def test_headline_and_incoming_are_registered_and_disjoint():
    qs = battery.queries()
    missing = [n for n in bench.HEADLINE + bench.INCOMING if n not in qs]
    assert missing == []
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    assert not set(bench.HEADLINE) & set(bench.INCOMING)
    # frozen-prefix invariants the subtotal comparisons rely on
    assert bench.R9_HEADLINE_N == 93
    assert bench.R10_HEADLINE_N == 107


def test_iterative_set_is_registered():
    qs = battery.queries()
    assert [n for n in bench.ITERATIVE if n not in qs] == []


def test_calibration_probe_is_frozen(spark):
    """The probe's logical plan is the cross-round normalization unit —
    pin its shape (row count, partitioning, group domain, aggregate
    count) so an edit is a deliberate, test-visible act."""
    from pyspark.sql import functions as F

    base = spark.range(0, 8_000_000, 1, 32).select(
        (F.hash(F.col("id")) % 997).alias("k"),
        (F.hash(F.col("id") * 2654435761) % 1_000_000).alias("v"),
    )
    agg = base.groupBy("k").agg(
        F.sum("v"), F.count("*"), F.avg("v"), F.max("v")
    )
    # the probe must run end-to-end and its group domain is the full
    # residue range (997 + negatives -> hash % in Spark keeps sign)
    n_groups = agg.count()
    assert 990 <= n_groups <= 1993
    # and the probe function itself executes without error
    bench.calibration_probe(spark)


def test_adjudicate_probe_copy_is_byte_equal():
    """scripts/adjudicate_movers.py carries a verbatim copy of the frozen
    probe (so the r10-worktree child can run it without importing HEAD's
    bench module, whose import-time sys.path insert would shadow the
    worktree's package).  The copy must stay byte-equal in body to the
    original or every paired-normalized adjudication number is invalid."""
    import importlib.util
    import inspect

    spec = importlib.util.spec_from_file_location(
        "adjudicate_movers",
        Path(__file__).resolve().parent.parent / "scripts" / "adjudicate_movers.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def body_dump(fn):
        # ADVICE r12 #4: compare the PARSED function bodies (docstring
        # Expr dropped), not line-stripped source — str.replace of
        # docstring fragments could mangle code lines that coincide with
        # a fragment, and line stripping tolerated real drift
        # (whitespace-significant changes, constants edited in both
        # docstring and code).  ast.dump is exact on structure and
        # constants and blind only to comments/formatting, which cannot
        # change what the probe measures.
        import ast
        import textwrap

        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
        fdef = tree.body[0]
        body = fdef.body
        if (
            body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            body = body[1:]
        return [ast.dump(node) for node in body]

    assert body_dump(mod.calibration_probe) == body_dump(
        bench.calibration_probe
    )


def test_adjudication_queue_policy():
    """VERDICT r12 #2: the §6d trigger is code, not prose — >2x raw AND
    >2s median queues; sub-2s swings and sub-2x drifts don't; entries
    missing on either side are skipped."""
    times = {
        "big_mover": 4.9,        # 2.59x, multi-second -> queued
        "small_mover": 1.9,      # 4x but sub-2s -> noise floor, skipped
        "steady": 5.0,           # 1.25x -> skipped
        "new_entry": 9.0,        # no previous recording -> skipped
        "zero_prev": 3.0,        # prev 0.0 (falsy) -> skipped, no div/0
    }
    prev = {
        "big_mover": 1.89,
        "small_mover": 0.47,
        "steady": 4.0,
        "zero_prev": 0.0,
        "gone_entry": 2.0,       # not in this run -> skipped
    }
    orig = bench.HEADLINE
    bench.HEADLINE = list(times) + ["gone_entry"]
    try:
        assert bench.adjudication_queue(times, prev) == ["big_mover"]
        assert bench.adjudication_queue(times, {}) == []
    finally:
        bench.HEADLINE = orig


def test_refresh_baseline_snapshots_previous_round():
    """_refresh_baseline must tag the snapshot with the newest driver
    round (r01..r12 committed) and carry the previous round's per-query
    medians; a second call must read the SAME snapshot back (stable
    within a round, not run-over-run)."""
    n, qmap = bench._refresh_baseline()
    assert n is not None and n >= 12
    assert isinstance(qmap, dict) and "eth_tx_hits" in qmap
    n2, qmap2 = bench._refresh_baseline()
    assert (n2, qmap2) == (n, qmap)
