#!/usr/bin/env python3
"""Time every battery query on Spark at a given SF dir (default sf0.1).

Prints one line per query (seconds, row count) sorted by descending wall
time, then a total.  This is the perf feedback loop: the driver benches
headline queries per round; this script finds the outliers across the FULL
battery so slow plans get fixed before they matter.

Usage: python3 scripts/time_battery.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from presto_ethereum_spark.plans import battery  # noqa: E402
from presto_ethereum_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    only = set(argv[1:])

    spark = get_spark()
    qs = battery.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    # warm the JVM + Python worker pool once so per-query numbers are steady
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: list[tuple[str, float, int]] = []
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as exc:  # keep timing the rest
            print(f"{name:36s} FAIL {exc}", flush=True)
            continue
        dt = time.monotonic() - t0
        timings.append((name, dt, n))
        print(f"{name:36s} {dt:7.2f}s  {n} rows", flush=True)

    timings.sort(key=lambda t: -t[1])
    print("\n=== slowest first ===")
    for name, dt, n in timings:
        print(f"{name:36s} {dt:7.2f}s  {n} rows")
    print(f"\nTOTAL {sum(t[1] for t in timings):.1f}s over {len(timings)} queries")


if __name__ == "__main__":
    main()
