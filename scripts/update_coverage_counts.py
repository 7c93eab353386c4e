#!/usr/bin/env python3
"""Regenerate COVERAGE.md's battery-count header from the registry.

The header's "N entries, M DuckDB-oracle-gated" numbers were hand-maintained
and went stale at three consecutive round boundaries (196 -> 255 -> 262 vs
reality).  This script rewrites them from ``battery.queries()`` /
``battery.oracles()`` — run it in the same commit that lands a new battery
entry.  ``tests/test_coverage_counts.py`` pins the same equality, so a
forgotten run turns pytest red instead of shipping a stale count.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from presto_ethereum_spark.plans import battery  # noqa: E402

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"
PATTERN = re.compile(
    r"`__spark_entry__\.queries\(\)` — \d+ entries, \d+\s*\n?DuckDB-oracle-gated"
)


def main() -> None:
    n_q, n_o = len(battery.queries()), len(battery.oracles())
    text = COVERAGE.read_text()
    new = PATTERN.sub(
        f"`__spark_entry__.queries()` — {n_q} entries, {n_o}\n"
        "DuckDB-oracle-gated",
        text,
        count=1,
    )
    if not PATTERN.search(text):
        sys.exit("COVERAGE.md header pattern not found — header text changed?")
    COVERAGE.write_text(new)
    print(f"COVERAGE.md header: {n_q} entries, {n_o} oracle-gated")


if __name__ == "__main__":
    main()
