"""Differential test: the Spark derivation pipeline over the nested chain
snapshot must exactly reproduce the independently-computed golden tables
(fixtures/generate_eth_fixture.py) — full-row equality, order-insensitive."""

import pytest

from tests.conftest import ETH_FIXTURES


@pytest.mark.parametrize("name", ["block", "transaction", "erc20"])
def test_table_matches_golden(spark, chain_source, name):
    df = chain_source.table(name)
    golden = spark.read.parquet(str(ETH_FIXTURES / f"{name}.parquet"))
    assert df.count() == golden.count()
    assert df.exceptAll(golden).count() == 0
    assert golden.exceptAll(df).count() == 0


def test_unknown_table_raises(chain_source):
    with pytest.raises(ValueError, match="Unknown table"):
        chain_source.table("nope")


def test_erc20_decode_edge_coverage(spark, chain_source):
    """The fixture must actually contain every decode class (FIXTURES.md §1),
    otherwise the differential test proves nothing."""
    erc20 = chain_source.table("erc20")
    # ERC-721 fallback rows decode to exactly 0.0
    assert erc20.where("erc20_value = 0.0").count() > 0
    # values beyond exact-double range survived (> 2^63)
    assert erc20.where("erc20_value > 9.3e18").count() > 0
    # known-token symbols and registry misses both present
    assert erc20.where("erc20_token = 'Humaniq'").count() > 0
    assert erc20.where("erc20_token LIKE 'ERC20(%'").count() > 0
    # chain fixture has logs that were dropped (weird/non-transfer):
    chain = chain_source.chain
    from pyspark.sql import functions as F

    total_logs = (
        chain.select(F.explode("transactions").alias("t"))
        .select(F.explode("t.logs").alias("l"))
        .count()
    )
    assert total_logs > erc20.count()


def test_block_range_pushdown_unenforced_contract(spark, chain_source):
    """table_for_block_range prunes the scan but never changes results when
    the caller re-applies the predicate (the reference's unenforced-pushdown
    contract, EthereumMetadata.java:236)."""
    from pyspark.sql import functions as F

    full = chain_source.table("erc20").where(
        F.col("erc20_blocknumber").between(100, 600)
    )
    pruned = chain_source.table_for_block_range("erc20", 100, 600).where(
        F.col("erc20_blocknumber").between(100, 600)
    )
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0
    # open-ended ranges too
    lo_only = chain_source.table_for_block_range("transaction", lo=2000)
    assert (
        lo_only.where("tx_blocknumber >= 2000").count()
        == chain_source.table("transaction").where("tx_blocknumber >= 2000").count()
    )


def test_catalog_metadata_queries(spark, chain_source):
    """SHOW TABLES / DESCRIBE parity with README.md:129-187."""
    chain_source.register_views()
    tables = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert {"block", "erc20", "transaction"} <= tables
    desc = spark.sql("DESCRIBE transaction").collect()
    assert [(r.col_name, r.data_type) for r in desc] == [
        ("tx_hash", "string"),
        ("tx_nonce", "bigint"),
        ("tx_blockhash", "string"),
        ("tx_blocknumber", "bigint"),
        ("tx_transactionindex", "int"),
        ("tx_from", "string"),
        ("tx_to", "string"),
        ("tx_value", "double"),
        ("tx_gas", "double"),
        ("tx_gasprice", "double"),
        ("tx_input", "string"),
    ]
    erc = spark.sql("DESCRIBE erc20").collect()
    assert [r.col_name for r in erc] == [
        "erc20_token", "erc20_from", "erc20_to",
        "erc20_value", "erc20_txhash", "erc20_blocknumber",
    ]


def test_json_snapshot_source_matches_parquet(spark, chain_source, tmp_path):
    """A JSON-lines chain dump (the eth_getBlockByNumber shape) must derive
    the same three tables as the parquet snapshot — explicit-schema read,
    no inference drift."""
    from presto_ethereum_spark.sources.fixture import EthereumFixtureSource

    sliced = chain_source.chain.where("number BETWEEN 100 AND 160")
    jdir = str(tmp_path / "chain.jsonl")  # suffix selects the JSON reader
    sliced.write.mode("overwrite").json(jdir)
    jsrc = EthereumFixtureSource(spark, jdir)
    for tbl, key in (
        ("block", "block_number"),
        ("transaction", "tx_blocknumber"),
        ("erc20", "erc20_blocknumber"),
    ):
        want = chain_source.table(tbl).where(f"{key} BETWEEN 100 AND 160")
        got = jsrc.table(tbl)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
