from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

from presto_ethereum_spark.session import get_spark
from presto_ethereum_spark.sources.fixture import EthereumFixtureSource

REPO = Path(__file__).resolve().parent.parent
ETH_FIXTURES = REPO / "fixtures" / "eth"
TESTDATA = Path("/root/testdata")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pes-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def chain_source(spark):
    return EthereumFixtureSource(spark, str(ETH_FIXTURES / "chain_blocks.parquet"))


@pytest.fixture(scope="session")
def duck():
    """DuckDB oracle with the three golden tables registered as views."""
    con = duckdb.connect()
    for t in ("block", "transaction", "erc20"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{ETH_FIXTURES / t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_testdata():
    """DuckDB oracle over the driver-provided sf0.001 tables."""
    con = duckdb.connect()
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{TESTDATA / 'sf0.001' / t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6) if abs(v) < 1e15 else float(f"{v:.12e}")
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def rows_match(spark_df, duck_rows, sort=True) -> None:
    """Order-insensitive (or order-sensitive) row comparison with float
    normalization.  Raises AssertionError with a small diff sample."""
    got = [tuple(_norm(v) for v in r) for r in spark_df.collect()]
    want = [tuple(_norm(v) for v in r) for r in duck_rows]
    if sort:
        got, want = sorted(got), sorted(want)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{len(mismatches)} mismatching rows; first: {mismatches[0]}"
