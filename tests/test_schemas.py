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
