#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for battery queries to files.

Usage: python3 scripts/explain_query.py <out_dir> <suffix> [sf_dir] <query ...>

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query — the plan
evidence contract for optimization rounds (plans/r13/<q>_before.txt /
_after.txt).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from presto_ethereum_spark.plans import battery  # noqa: E402
from presto_ethereum_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    rest = sys.argv[3:]
    if rest and rest[0].startswith("/"):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = battery.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
