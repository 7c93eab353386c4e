"""Probe-paired single-session adjudication of cross-round bench movers.

Round-11 flagged three queries that moved >2.3x r10->r11 on UNCHANGED code
(`stream_funnel_firsts`, `stream_kmv_distinct`, `doc_shingle_df_profile`),
above the calibration probe's own 1.15x measured session drift.  This
script settles "real regression vs environment drift" directly:

  for each query, back-to-back on the same host:
    - a FRESH single-query session on the candidate tree (HEAD),
    - a FRESH single-query session on the r10 tree (a detached git
      worktree of the r10 closing commit),
  each session running the code-frozen calibration probe (warm + 3 timed
  repeats, median) and then the query (1 untimed warmup + N timed warm
  repeats with a driver-JVM GC drain between samples, median).

The verdict per query is the PAIRED NORMALIZED RATIO:

    (head_median / head_probe) / (r10_median / r10_probe)

Host speed divides out per-session; back-to-back pairing bounds the
residual drift window to minutes.  A ratio ~1.0 means the r10->r11 medians
moved because the r10 and r11 bench fleets ran in different host windows
(environment), not because the code got slower; >1.5 means a true
regression and the tree diff (there is none for these queries) or the
session config must be bisected.

Usage:
    python scripts/adjudicate_movers.py                      # full pairing
    python scripts/adjudicate_movers.py --queries a,b --repeats 9
    python scripts/adjudicate_movers.py --child ROOT QUERY SF N  # internal
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

HEAD_ROOT = str(Path(__file__).resolve().parent.parent)

MOVERS = ["stream_funnel_firsts", "stream_kmv_distinct", "doc_shingle_df_profile"]
R10_COMMIT = "c8c8e32"  # "round 10: verdict/advice/correctness/bench" = r10 tree


def calibration_probe(spark) -> None:
    """VERBATIM copy of bench.calibration_probe (code-frozen, r11).  Kept
    inline so the r10-tree child (whose bench.py predates the probe) runs
    the IDENTICAL probe without importing HEAD's bench module — bench.py
    inserts its own parent at sys.path[0] on import, which would shadow
    the worktree's package.  tests/test_bench_contract.py pins this copy
    byte-equal to the original via inspect.getsource."""
    from pyspark.sql import functions as F

    base = spark.range(0, 8_000_000, 1, 32).select(
        (F.hash(F.col("id")) % 997).alias("k"),
        (F.hash(F.col("id") * 2654435761) % 1_000_000).alias("v"),
    )
    base.orderBy("v", "k").write.mode("overwrite").format("noop").save()
    base.groupBy("k").agg(
        F.sum("v"), F.count("*"), F.avg("v"), F.max("v")
    ).write.mode("overwrite").format("noop").save()


def child(root: str, query: str, sf_dir: str, repeats: int) -> None:
    """Run ONE query in THIS fresh interpreter against the tree at ``root``
    (HEAD or the r10 worktree); print one JSON line on the last stdout
    line.  Mirrors bench.run_chunk's session discipline: generic table
    warm, untimed query warmup, probe warm + 3 timed, per-repeat GC
    drains, warm medians."""
    sys.path.insert(0, root)
    os.chdir(root)  # fixture-relative paths (fixtures/eth/...) resolve

    from presto_ethereum_spark.plans import battery
    from presto_ethereum_spark.session import get_spark

    spark = get_spark(app_name=f"adjudicate-{query}")
    spark.sparkContext.setLogLevel("ERROR")

    # tree-independent warm: parquet footers + a full pass on the two
    # tables these movers touch (events for the streams, documents for the
    # shingle profile), then one untimed warmup run of the query itself
    # (warms Arrow workers, stream checkpoint machinery, codegen)
    for name in ("events", "documents"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").write.mode(
            "overwrite"
        ).format("noop").save()
    fn = battery.queries()[query]
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    calibration_probe(spark)
    probe_samples: list[float] = []
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        calibration_probe(spark)
        probe_samples.append(round(time.perf_counter() - t0, 3))

    samples: list[float] = []
    for _ in range(repeats):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples.append(round(time.perf_counter() - t0, 3))

    print(
        json.dumps(
            {
                "root": root,
                "query": query,
                "probe_median": round(statistics.median(probe_samples), 3),
                "probe_samples": sorted(probe_samples),
                "median": round(statistics.median(samples), 3),
                "samples": sorted(samples),
            }
        )
    )


def run_child(root: str, query: str, sf_dir: str, repeats: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            root,
            query,
            sf_dir,
            str(repeats),
        ],
        capture_output=True,
        text=True,
        check=False,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:] + "\n")
        raise SystemExit(f"child failed for {query} at {root}")
    return json.loads(lines[-1])


def main() -> None:
    queries = MOVERS
    repeats = 9
    baseline = R10_COMMIT
    argv = sys.argv[1:]
    if argv and argv[0] == "--child":
        child(argv[1], argv[2], argv[3], int(argv[4]))
        return
    while argv:
        flag = argv.pop(0)
        if flag == "--queries":
            queries = argv.pop(0).split(",")
        elif flag == "--repeats":
            repeats = int(argv.pop(0))
        elif flag == "--baseline":
            # any prior round's closing commit — the tree HEAD is paired
            # against (r13+: bench.py's adjudicate_queue names the movers,
            # this flag names the round they moved FROM)
            baseline = argv.pop(0)
        else:
            raise SystemExit(f"unknown flag {flag}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base_root = f"/tmp/adjudicate_{baseline}tree"
    if not os.path.isdir(base_root):
        subprocess.run(
            ["git", "worktree", "add", "--detach", base_root, baseline],
            cwd=HEAD_ROOT,
            check=True,
        )

    results = []
    for q in queries:
        # back-to-back pairing: HEAD then the baseline tree, same host
        # window
        head = run_child(HEAD_ROOT, q, sf_dir, repeats)
        base = run_child(base_root, q, sf_dir, repeats)
        head_norm = head["median"] / head["probe_median"]
        base_norm = base["median"] / base["probe_median"]
        results.append(
            {
                "query": q,
                "baseline_commit": baseline,
                "head_median": head["median"],
                "head_probe": head["probe_median"],
                "head_norm": round(head_norm, 3),
                "head_samples": head["samples"],
                "base_median": base["median"],
                "base_probe": base["probe_median"],
                "base_norm": round(base_norm, 3),
                "base_samples": base["samples"],
                "paired_normalized_ratio": round(head_norm / base_norm, 3),
            }
        )
        print(json.dumps(results[-1]))
    print(json.dumps({"adjudication": results}))


if __name__ == "__main__":
    main()
