#!/usr/bin/env python3
"""Physical-plan audit: the reproducible evidence behind SCALE.md.

For each battery query (default: the bench headline set), prints the plan
markers that matter at 100 TB:

- PushedFilters      — predicates reached the parquet scan
- BroadcastHashJoin  — dimension joins broadcast (no shuffle)
- SortMergeJoin      — a shuffle join survived where broadcast was expected
- NestedLoop         — a range/cross predicate fell back to O(|L|*|R|)
- WindowGroupLimit / TakeOrderedAndProject — top-k never globally sorts
- Exchange count     — total shuffles in the plan

Usage: python3 scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from presto_ethereum_spark.plans import battery  # noqa: E402
from presto_ethereum_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "rel_pricing_summary",
    "rel_regional_revenue",
    "rel_shipping_priority",
    "rel_window_topn",
    "rel_range_join",
    "rel_salted_join",
    "doc_top_terms",
    "doc_pack_sequences",
    "doc_chunk_windows",
    "emb_quantize_mse",
    "emb_label_centroids",
    "rel_funnel_steps",
    "rel_retention_cohorts",
    "eth_erc20_movement",
]


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or DEFAULT

    spark = get_spark()
    qs = battery.queries()
    print(f"{'query':30s} {'pushed':6s} {'bhj':4s} {'smj':4s} {'nlj':4s} "
          f"{'topk':5s} {'exch':4s}")
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        p = buf.getvalue()
        pushed = "PushedFilters: [" in p and "PushedFilters: []" not in p
        topk = ("WindowGroupLimit" in p) or ("TakeOrderedAndProject" in p)
        print(
            f"{name:30s} {str(pushed):6s} {str('BroadcastHashJoin' in p):4s} "
            f"{str('SortMergeJoin' in p):4s} {str('NestedLoop' in p):4s} "
            f"{str(topk):5s} {p.count('Exchange'):4d}"
        )


if __name__ == "__main__":
    main()
