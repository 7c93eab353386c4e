"""Schema goldens: names, order, and Spark types must match SURVEY.md §1.2
(= the reference's DESCRIBE output, README.md:129-187)."""

from presto_ethereum_spark.schemas import (
    BLOCK_SCHEMA,
    ERC20_SCHEMA,
    SCHEMAS,
    TRANSACTION_SCHEMA,
)


def test_block_schema_columns():
    assert [f.name for f in BLOCK_SCHEMA.fields] == [
        "block_number",
        "block_hash",
        "block_parenthash",
        "block_nonce",
        "block_sha3uncles",
        "block_logsbloom",
        "block_transactionsroot",
        "block_stateroot",
        "block_miner",
        "block_difficulty",
        "block_totaldifficulty",
        "block_size",
        "block_extradata",
        "block_gaslimit",
        "block_gasused",
        "block_timestamp",
        "block_transactions",
        "block_uncles",
    ]
    assert BLOCK_SCHEMA["block_number"].dataType.typeName() == "long"
    assert BLOCK_SCHEMA["block_size"].dataType.typeName() == "integer"
    assert BLOCK_SCHEMA["block_gaslimit"].dataType.typeName() == "double"
    assert BLOCK_SCHEMA["block_transactions"].dataType.simpleString() == "array<string>"


def test_transaction_schema_columns():
    assert [f.name for f in TRANSACTION_SCHEMA.fields] == [
        "tx_hash",
        "tx_nonce",
        "tx_blockhash",
        "tx_blocknumber",
        "tx_transactionindex",
        "tx_from",
        "tx_to",
        "tx_value",
        "tx_gas",
        "tx_gasprice",
        "tx_input",
    ]


def test_erc20_schema_columns():
    assert [f.name for f in ERC20_SCHEMA.fields] == [
        "erc20_token",
        "erc20_from",
        "erc20_to",
        "erc20_value",
        "erc20_txhash",
        "erc20_blocknumber",
    ]


def test_three_tables():
    assert set(SCHEMAS) == {"block", "transaction", "erc20"}


def test_derived_tables_match_schema(chain_source):
    for name, schema in SCHEMAS.items():
        df = chain_source.table(name)
        assert [f.name for f in df.schema.fields] == [f.name for f in schema.fields]
        assert [f.dataType for f in df.schema.fields] == [
            f.dataType for f in schema.fields
        ], name


def test_value_mode_u256_hex_schema_golden():
    """VERDICT r12 #4: the value_mode=u256_hex read option appends exactly
    one column — erc20_value_hex string, nullable — after the reference-
    parity six; every base column keeps its name, type, and position."""
    from pyspark.sql.types import StringType

    from presto_ethereum_spark.sources.rpc import EthereumDataSource

    ds = EthereumDataSource(
        options={"table": "erc20", "value_mode": "u256_hex"}
    )
    got = ds.schema()
    assert [f.name for f in got.fields] == [
        "erc20_token",
        "erc20_from",
        "erc20_to",
        "erc20_value",
        "erc20_txhash",
        "erc20_blocknumber",
        "erc20_value_hex",
    ]
    assert got.fields[-1].dataType == StringType()
    assert got.fields[-1].nullable
    assert got.fields[:-1] == list(ERC20_SCHEMA.fields)
    # default mode is byte-identical to the reference schema
    assert (
        EthereumDataSource(options={"table": "erc20"}).schema() == ERC20_SCHEMA
    )


def test_value_mode_validation():
    import pytest

    from presto_ethereum_spark.sources.rpc import EthereumDataSource

    with pytest.raises(ValueError, match="value_mode"):
        EthereumDataSource(
            options={"table": "erc20", "value_mode": "exact"}
        ).schema()
    with pytest.raises(ValueError, match="erc20"):
        EthereumDataSource(
            options={"table": "block", "value_mode": "u256_hex"}
        ).schema()
