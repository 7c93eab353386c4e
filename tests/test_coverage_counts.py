"""COVERAGE.md's battery-count header must equal the registry at HEAD.

The count was hand-maintained and stale at three consecutive round
boundaries (r5 "196", r6 "255", r7 "262" vs actual 272).  This test makes
the drift a red pytest instead of a judge finding; regenerate with
``python scripts/update_coverage_counts.py``.
"""

import re
from pathlib import Path


def test_coverage_header_counts_match_registry():
    from presto_ethereum_spark.plans import battery

    text = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()
    m = re.search(
        r"`__spark_entry__\.queries\(\)` — (\d+) entries, (\d+)\s*\n?"
        r"DuckDB-oracle-gated",
        text,
    )
    assert m, "COVERAGE.md header count pattern missing"
    n_q, n_o = int(m.group(1)), int(m.group(2))
    assert n_q == len(battery.queries()), (
        f"COVERAGE.md says {n_q} entries, registry has "
        f"{len(battery.queries())} — run scripts/update_coverage_counts.py"
    )
    assert n_o == len(battery.oracles()), (
        f"COVERAGE.md says {n_o} oracle-gated, registry has "
        f"{len(battery.oracles())} — run scripts/update_coverage_counts.py"
    )
    # the rows-only remainder stays the documented design set
    rows_only = set(battery.queries()) - set(battery.oracles())
    assert rows_only == {
        "emb_mmr_rerank",
        "emb_pair_kcore",
        "doc_bpe_train",
        "doc_bpe_tokenize",
    }, f"undocumented rows-only entries: {rows_only}"


def test_registry_keys_match_function_names():
    """Every battery entry's Spark callable must be NAMED like its registry
    key.  Catches the decorator-sandwich class of mistake (r9: a new
    function inserted between @q("stream_kmv_distinct", ...) and its def
    silently re-pointed the KMV entry at the new function — the driver
    would have graded the wrong query against the KMV oracle)."""
    from presto_ethereum_spark.plans import battery

    bad = [
        (k, fn.__name__)
        for k, (fn, _) in battery._REGISTRY.items()
        if fn.__name__ != k
    ]
    assert bad == [], f"registry key != function name: {bad}"


def test_registry_output_schemas_are_decimal_free(spark):
    """The driver-hash hazard contract (CORRECTNESS_r09, check_battery.py
    compare()): raw DECIMAL output columns bridge inconsistently across
    client layers (DuckDB's pandas conversion narrows wide decimals to
    float64), so every entry's FINAL schema must read exact decimals out
    as canonical digit strings or narrow them to double/bigint.  The gate
    script enforces this at run time; this test makes the contract
    survive without the gate script (VERDICT r11 #6).

    Builds every registry entry at sf0.001 (plan construction only for
    lazy entries; stream/iterative entries execute their bounded fixture
    drains, same as the gate)."""
    from pyspark.sql.types import DecimalType

    from presto_ethereum_spark.plans import battery

    sf_dir = "/root/testdata/sf0.001"
    offenders: dict[str, list[str]] = {}
    for name, fn in battery.queries().items():
        df = fn(spark, sf_dir)
        dec = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if dec:
            offenders[name] = dec
    assert not offenders, f"DECIMAL in final schemas: {offenders}"
