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

    def body(fn):
        lines = inspect.getsource(fn).splitlines()
        # drop decorator/def line and the docstring: compare executable body
        src = "\n".join(lines)
        doc = inspect.getdoc(fn) or ""
        for frag in doc.splitlines():
            src = src.replace(frag, "")
        return [
            ln.strip()
            for ln in src.splitlines()
            if ln.strip() and not ln.strip().startswith(('"""', "def "))
        ]

    assert body(mod.calibration_probe) == body(bench.calibration_probe)
