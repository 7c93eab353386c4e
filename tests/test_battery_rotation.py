"""Rotating oracle gate: each pytest run re-validates a date-scheduled slice
of battery entries against their DuckDB oracles, using the same comparator
as scripts/check_battery.py (the driver-gate replica).

The driver grades a fixed 50-query subset per round; the other ~260
registered oracle entries are only validated when someone runs
check_battery by hand.  This test closes that hole with a COVERING
schedule (r11, VERDICT r10 #3): the sorted oracle names are shuffled with
a per-week seed and partitioned into 7 disjoint stride slices, one per
day — so EVERY oracle entry passes through CI within any 7 consecutive
days (~44/run over ~310 entries), instead of the old 12-random-per-day
sample whose expected full-coverage time was ~2+ weeks with no guarantee.
test_week_schedule_covers_every_entry proves the invariant over the seed
schedule itself.
Run the full battery explicitly with `python scripts/check_battery.py`.
"""

import datetime
import random
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from check_battery import TABLES, compare  # noqa: E402

from presto_ethereum_spark.plans import battery  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _day_slice(names: list[str], ordinal: int) -> list[str]:
    """The day's slice of the 7-day covering schedule: shuffle the sorted
    names with the week number (ordinal // 7) as seed, take every 7th
    starting at the day index (ordinal % 7).  The 7 day-slices of a week
    are disjoint and their union is ALL names, so each entry is checked
    exactly once per 7-day cycle; the weekly reshuffle varies which
    entries share a run (and a failure's neighbors) across weeks."""
    week, day = divmod(ordinal, 7)
    shuffled = list(names)
    random.Random(week).shuffle(shuffled)
    return shuffled[day::7]


def _todays_sample() -> list[str]:
    return _day_slice(sorted(battery.oracles()), datetime.date.today().toordinal())


def test_week_schedule_covers_every_entry():
    """Schedule proof (VERDICT r10 #3): for any week, the union of the 7
    day-slices is exactly the full oracle registry, pairwise-disjoint —
    i.e. full-battery CI coverage within any 7 consecutive days."""
    names = sorted(battery.oracles())
    assert len(names) >= 300  # the registry this schedule must cover
    for week in (0, 1, 2897, datetime.date.today().toordinal() // 7):
        slices = [_day_slice(names, week * 7 + d) for d in range(7)]
        seen: list[str] = [n for s in slices for n in s]
        assert len(seen) == len(names)  # disjoint: no entry twice
        assert sorted(seen) == names  # covering: no entry missed


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _todays_sample())
def test_rotating_oracle_gate(spark, duck, name):
    df = battery.queries()[name](spark, SF_DIR)
    verdict = compare(name, df, duck.sql(battery.oracles()[name]))
    assert verdict == "OK", f"{name}: {verdict}"


# --- sf0.1 rotation for rounded-double outputs ------------------------------
#
# Entries whose GRADED output keeps a round(double, d>=1) column (the
# audited-SAFE transcendental/scale-bounded set in ROUNDING_AUDIT.md).  A
# shortest-repr-vs-binary rounding tie is scale-dependent — sf0.001 can stay
# green for rounds while sf0.1 diverges (exactly how doc_bigram_fluency hid
# for 5 rounds) — so this sample runs at sf0.1, rotating daily.

SF01_DIR = "/root/testdata/sf0.1"
ROUNDED_DOUBLE_ENTRIES = [
    "rel_stats",
    "rel_pricing_quantiles",
    "rel_window_navigation",
    "emb_norms",
    "emb_knn_bruteforce",
    "emb_similar_pairs",
    "emb_label_centroids",
    "emb_quantize_mse",
    "doc_top_terms",
    "doc_bm25_topk",
    "doc_rrf_fusion",
    "doc_temperature_mixture",
    "rel_ohlc_bars",
    "rel_gap_fill",
    "rel_market_share",
    # round-6 additions that keep a rounded-double display column
    "rel_mad_anomalies",
    "doc_collocations_pmi",
    "emb_range_search",
    "emb_knn_join_ivf",
    # round-6 late addition: ln of an exact rational, round @6
    "doc_token_entropy",
    # round-6 continuation: ln-based OLS fit, sqrt-based cosines — all in
    # the audited-safe irrational class, rotated at sf0.1 regardless
    "doc_zipf_slope",
    "emb_hard_negatives",
    "doc_count_cosine_pairs",
]
SF01_SAMPLE = 3


def _todays_sf01_sample() -> list[str]:
    import random

    known = [
        n for n in ROUNDED_DOUBLE_ENTRIES if n in battery.oracles()
    ]
    rng = random.Random(datetime.date.today().toordinal() * 31 + 7)
    return rng.sample(known, min(SF01_SAMPLE, len(known)))


@pytest.fixture(scope="module")
def duck_sf01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _todays_sf01_sample())
def test_rounded_double_entries_at_sf01(spark, duck_sf01, name):
    df = battery.queries()[name](spark, SF01_DIR)
    verdict = compare(name, df, duck_sf01.sql(battery.oracles()[name]))
    assert verdict == "OK", f"{name}: {verdict}"
