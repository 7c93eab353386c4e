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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def _mg_candidates_kernel(k: int):
    """mapInArrow kernel: one merged Misra–Gries summary per partition,
    emitted as a single batch of candidate values."""

    def run(batches):
        import pyarrow as pa

        counters: dict = {}
        for rb in batches:
            if not rb.num_rows:
                continue
            # batch-exact counts merged into the summary, then MG-pruned
            # back to k counters (mergeable-summaries composition)
            vc = rb.column(0).to_pandas().value_counts()
            for val, cnt in vc.items():
                counters[val] = counters.get(val, 0) + int(cnt)
            if len(counters) > k:
                # subtract the (k+1)-th largest count from everyone and
                # drop the non-positive — the MG decrement, batched
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(counters.keys()), type=pa.string())],
            names=["value"],
        )

    return run


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
    vals = df.select(c.cast("string").alias("value")).where(
        F.col("value").isNotNull()
    )
    # k such that global freq > n/(k+1) covers freq > n*threshold_frac:
    # need n/(k+1) <= n*threshold_frac  =>  k >= 1/threshold_frac - 1
    k = int(1.0 / threshold_frac) + 1
    cands = vals.mapInArrow(
        _mg_candidates_kernel(k), schema="value string"
    ).distinct()
    num = int(round(threshold_frac * 1_000_000_000))
    tot = vals.agg(F.count("*").alias("n_total"))
    # the product n_total * num is computed in DECIMAL(38,0): BIGINT
    # arithmetic would overflow (and silently wrap under non-ANSI Spark)
    # past n_total ~ 2^63/num — a few TB of token positions, squarely the
    # scale this operator targets.  The DIV quotient is back under 2^63.
    thresh = F.expr(
        f"CAST(n_total AS DECIMAL(38,0)) * {num} DIV 1000000000"
    )
    return (
        vals.join(F.broadcast(cands), "value")
        .groupBy("value")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("n") > thresh)
        .select("value", "n")
    )
