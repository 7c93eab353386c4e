#!/usr/bin/env python3
"""Environment-robustness audit: the full oracle battery must hash-match
under session configurations the engine does NOT control when the driver
builds its own SparkSession.

Modes (pass one or more as arguments; default: both):
  tz       — session timezone America/New_York instead of UTC
             (catches TIMESTAMP_LTZ leaks: date_trunc / unix_timestamp /
             timestamp_micros on the wrong type shift values silently)
  shuffle  — spark.sql.shuffle.partitions=7 instead of 32
             (catches partition-order-dependent float accumulation that
             the DECIMAL / fixed-point / round() discipline must prevent)
  ansi     — spark.sql.ansi.enabled=false + legacy.sizeOfNull
             (catches results that silently depend on ANSI guards:
             size(NULL) = -1, wrapping integer arithmetic, lenient casts)
  split    — spark.sql.files.maxPartitionBytes=131072 (+openCostInBytes=0)
             so every scan fans out into many tiny input splits — the
             batch analogue of the streaming micro-batch split-invariance
             tests (catches partition-count/-boundary-dependent results:
             first/any_value without a frame, per-partition RNG or
             monotonically_increasing_id leaks, map-side fold order)

Usage: python3 scripts/audit_robustness.py [tz|shuffle ...] [--sf DIR]
           [--queries q1,q2,...]   (default: the full battery)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import presto_ethereum_spark.session as S  # noqa: E402

MODES = {
    "tz": {"extra_conf": {"spark.sql.session.timeZone": "America/New_York"}},
    "shuffle": {"shuffle_partitions": 7},
    # legacy non-ANSI mode: integer overflow wraps silently, size(NULL)
    # returns -1 (legacy.sizeOfNull), casts are lenient — the divergence
    # class the r8 review found in quality_survival_curve's token column
    # (ANSI default hid it); this mode makes the whole battery prove its
    # results don't depend on ANSI guards
    "ansi": {
        "extra_conf": {
            "spark.sql.ansi.enabled": "false",
            "spark.sql.legacy.sizeOfNull": "true",
        }
    },
    "split": {
        "extra_conf": {
            "spark.sql.files.maxPartitionBytes": "131072",
            "spark.sql.files.openCostInBytes": "0",
        }
    },
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    queries: list[str] = []
    if "--queries" in args:
        i = args.index("--queries")
        queries = [q for q in args[i + 1].split(",") if q]
        del args[i : i + 2]
    modes = args or list(MODES)

    orig = S.get_spark
    failures = 0
    for mode in modes:
        override = MODES[mode]

        def patched(*a, **kw):
            kw.pop("shuffle_partitions", None)
            extra = kw.pop("extra_conf", None) or {}
            extra.update(override.get("extra_conf", {}))
            return orig(
                *a,
                shuffle_partitions=override.get("shuffle_partitions"),
                extra_conf=extra,
                **kw,
            )

        S.get_spark = patched
        import scripts.check_battery as cb

        cb.get_spark = patched
        print(f"=== audit mode: {mode} ===")
        saved = sys.argv
        sys.argv = ["check", sf_dir, *queries]
        try:
            cb.main()
        except SystemExit as e:
            failures += int(bool(e.code))
        finally:
            sys.argv = saved
            S.get_spark = orig
            # a fresh mode needs a fresh JVM conf — stop the session
            from pyspark.sql import SparkSession

            active = SparkSession.getActiveSession()
            if active is not None:
                active.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
