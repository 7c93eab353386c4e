#!/usr/bin/env python3
"""Parallel-scaling evidence at sf1 (VERDICT r13 #5): time a set of heavy
entries at TWO core counts and report per-query c_low/c_high ratios.

Why: at sf0.1 the fleet is fixed-overhead-bound — BENCH_r13_c8's 8-core
total beat the 32-core total by 19%, so per-query parallel-scaling claims
cannot be made at that SF.  This script pairs fresh sessions at
``--cpus-high`` (default 32) and ``--cpus-low`` (default 8) over the sf1
corpus (scripts/make_sf1.py), identical query order, warm-median timing
(bench.py's session discipline: untimed warmup, GC drain, median of N).

A ratio >> 1 (low-core run slower) means the entry's work actually
spreads across cores; ~1.0 means the wall is serial/fixed overhead at
this scale and gets a diagnosis in OPTIMIZATION_r14.md.

Usage:
    python3 scripts/make_sf1.py /tmp/sf1
    python3 scripts/scaling_evidence.py --queries a,b,c [--sf-dir /tmp/sf1]
        [--repeats 3] [--out SCALING_r14.json]
    python3 scripts/scaling_evidence.py --child <cpus> <sf_dir> <repeats> <q,...>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

ROOT = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, ROOT)


def child(cpus: int, sf_dir: str, repeats: int, names: list[str]) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from presto_ethereum_spark.plans import battery
    from presto_ethereum_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = battery.queries()
    # generic warm: footers + Arrow workers (bench.run_chunk's discipline)
    for t in ("documents", "embeddings", "lineitem", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).format("noop").save()

    out: dict[str, dict] = {}
    for name in names:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.sparkContext._jvm.System.gc()
        samples: list[float] = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext._jvm.System.gc()
        samples.sort()
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "spread": [samples[0], samples[-1]],
        }
        print(f"# c{cpus} {name}: {out[name]['median']} s", file=sys.stderr)
    print(json.dumps(out))


def run_child(cpus: int, sf_dir: str, repeats: int, names: list[str]) -> dict:
    p = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            str(cpus),
            sf_dir,
            str(repeats),
            ",".join(names),
        ],
        capture_output=True,
        text=True,
        check=False,
    )
    sys.stderr.write(p.stderr)
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if p.returncode != 0 or not lines:
        raise SystemExit(f"child c{cpus} failed rc={p.returncode}")
    return json.loads(lines[-1])


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--child":
        child(int(argv[1]), argv[2], int(argv[3]), argv[4].split(","))
        return
    sf_dir = "/tmp/sf1"
    repeats = 3
    cpus_high, cpus_low = 32, 8
    queries: list[str] = []
    out_file = None
    while argv:
        flag = argv.pop(0)
        if flag == "--queries":
            queries = argv.pop(0).split(",")
        elif flag == "--sf-dir":
            sf_dir = argv.pop(0)
        elif flag == "--repeats":
            repeats = int(argv.pop(0))
        elif flag == "--cpus-high":
            cpus_high = int(argv.pop(0))
        elif flag == "--cpus-low":
            cpus_low = int(argv.pop(0))
        elif flag == "--out":
            out_file = argv.pop(0)
        else:
            raise SystemExit(f"unknown flag {flag}")
    if not queries:
        raise SystemExit("--queries is required")

    high = run_child(cpus_high, sf_dir, repeats, queries)
    low = run_child(cpus_low, sf_dir, repeats, queries)
    rows = []
    for q in queries:
        h, lo = high[q]["median"], low[q]["median"]
        rows.append(
            {
                "query": q,
                f"c{cpus_high}_median": h,
                f"c{cpus_high}_spread": high[q]["spread"],
                f"c{cpus_low}_median": lo,
                f"c{cpus_low}_spread": low[q]["spread"],
                "low_over_high_ratio": round(lo / h, 3) if h else None,
            }
        )
    report = {
        "sf_dir": sf_dir,
        "cpus_high": cpus_high,
        "cpus_low": cpus_low,
        "repeats": repeats,
        "per_query": rows,
    }
    print(json.dumps(report, indent=1))
    if out_file:
        Path(out_file).write_text(json.dumps(report, indent=1) + "\n")


if __name__ == "__main__":
    main()
