"""Fixed table schemas for the three public tables.

The reference hard-codes these twice, identically, in
``EthereumMetadata.java:98-147`` (getColumnHandles) and ``:245-291``
(getTableMetadata); there is no inference or evolution and every column is
implicitly nullable.  Hash strings are ``"0x" + 2*N`` lowercase hex chars
(H8=18, H20=42, H32=66, H256=514 chars — ``EthereumMetadata.java:48-51``);
Spark has no bounded varchar at runtime so the bounds are documentation only
(the reference itself merely truncates, ``EthereumRecordCursor.java:263-268``).

Numeric fidelity follows the reference deliberately: wei values / gas /
gasPrice are narrowed to double (``EthereumMetadata.java:131-133``,
``EthereumERC20Utils.java:8-14``), difficulty/totalDifficulty to long
(``EthereumMetadata.java:114-115``).  256-bit chain quantities do not fit
either type; this lossy-but-compatible mapping is preserved for golden-output
parity.  See ``DECIMAL_EXTENSION`` below for the opt-in wide-decimal mode.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Table names, mirroring the fixed enum EthereumTable.java:7-14.
TABLE_BLOCK = "block"
TABLE_TRANSACTION = "transaction"
TABLE_ERC20 = "erc20"
TABLES = (TABLE_BLOCK, TABLE_TRANSACTION, TABLE_ERC20)

# Single schema namespace, EthereumMetadata.java:47,66-68.
SCHEMA_NAME = "default"

# ``block`` — 18 columns, EthereumMetadata.java:104-122.
BLOCK_SCHEMA = StructType(
    [
        StructField("block_number", LongType()),
        StructField("block_hash", StringType()),
        StructField("block_parenthash", StringType()),
        StructField("block_nonce", StringType()),
        StructField("block_sha3uncles", StringType()),
        StructField("block_logsbloom", StringType()),
        StructField("block_transactionsroot", StringType()),
        StructField("block_stateroot", StringType()),
        StructField("block_miner", StringType()),
        StructField("block_difficulty", LongType()),
        StructField("block_totaldifficulty", LongType()),
        StructField("block_size", IntegerType()),
        StructField("block_extradata", StringType()),
        StructField("block_gaslimit", DoubleType()),
        StructField("block_gasused", DoubleType()),
        StructField("block_timestamp", LongType()),
        StructField("block_transactions", ArrayType(StringType())),
        StructField("block_uncles", ArrayType(StringType())),
    ]
)

# ``transaction`` — 11 columns, EthereumMetadata.java:124-134.
TRANSACTION_SCHEMA = StructType(
    [
        StructField("tx_hash", StringType()),
        StructField("tx_nonce", LongType()),
        StructField("tx_blockhash", StringType()),
        StructField("tx_blocknumber", LongType()),
        StructField("tx_transactionindex", IntegerType()),
        StructField("tx_from", StringType()),
        StructField("tx_to", StringType()),  # nullable: contract creation
        StructField("tx_value", DoubleType()),
        StructField("tx_gas", DoubleType()),
        StructField("tx_gasprice", DoubleType()),
        StructField("tx_input", StringType()),
    ]
)

# ``erc20`` — 6 columns, EthereumMetadata.java:135-141.
ERC20_SCHEMA = StructType(
    [
        StructField("erc20_token", StringType()),
        StructField("erc20_from", StringType()),
        StructField("erc20_to", StringType()),
        StructField("erc20_value", DoubleType()),
        StructField("erc20_txhash", StringType()),
        StructField("erc20_blocknumber", LongType()),
    ]
)

SCHEMAS: dict[str, StructType] = {
    TABLE_BLOCK: BLOCK_SCHEMA,
    TABLE_TRANSACTION: TRANSACTION_SCHEMA,
    TABLE_ERC20: ERC20_SCHEMA,
}

# Nested chain-snapshot fixture schema (FIXTURES.md §1): one row per block with
# embedded transactions, each with embedded receipt logs.  This is the on-disk
# shape that one eth_getBlockByNumber(n, true) + per-tx eth_getTransactionReceipt
# round-trip would produce, so both the fixture source and the rpc source decode
# through the same downstream pipeline.
LOG_STRUCT = StructType(
    [
        StructField("address", StringType()),
        StructField("topics", ArrayType(StringType())),
        StructField("data", StringType()),
        StructField("transactionhash", StringType()),
        StructField("blocknumber", LongType()),
    ]
)

CHAIN_TX_STRUCT = StructType(
    [
        StructField("hash", StringType()),
        StructField("nonce", LongType()),
        StructField("blockhash", StringType()),
        StructField("blocknumber", LongType()),
        StructField("transactionindex", IntegerType()),
        StructField("from", StringType()),
        StructField("to", StringType()),
        StructField("value", DoubleType()),
        StructField("gas", DoubleType()),
        StructField("gasprice", DoubleType()),
        StructField("input", StringType()),
        StructField("logs", ArrayType(LOG_STRUCT)),
    ]
)

CHAIN_BLOCK_SCHEMA = StructType(
    [
        StructField("number", LongType()),
        StructField("hash", StringType()),
        StructField("parenthash", StringType()),
        StructField("nonce", StringType()),
        StructField("sha3uncles", StringType()),
        StructField("logsbloom", StringType()),
        StructField("transactionsroot", StringType()),
        StructField("stateroot", StringType()),
        StructField("miner", StringType()),
        StructField("difficulty", LongType()),
        StructField("totaldifficulty", LongType()),
        StructField("size", IntegerType()),
        StructField("extradata", StringType()),
        StructField("gaslimit", DoubleType()),
        StructField("gasused", DoubleType()),
        StructField("timestamp", LongType()),
        StructField("uncles", ArrayType(StringType())),
        StructField("transactions", ArrayType(CHAIN_TX_STRUCT)),
    ]
)

# Opt-in extension (documented divergence, SURVEY.md §1.3): 256-bit quantities
# exceed Decimal(38); DecimalType(38, 0) still widens the usable exact range
# from 2^53 (double mantissa) to ~1.7e38 and is offered for value columns.
DECIMAL_EXTENSION_COLUMNS = {
    "tx_value",
    "tx_gas",
    "tx_gasprice",
    "erc20_value",
    "block_gaslimit",
    "block_gasused",
}
