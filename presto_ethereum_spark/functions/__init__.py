"""Scalar function surface: the reference's 9 web3 UDFs, Spark-first."""

from presto_ethereum_spark.functions.web3 import (
    eth_block_number,
    eth_gas_price,
    from_wei,
    register_udfs,
    to_wei,
)

__all__ = [
    "from_wei",
    "to_wei",
    "eth_gas_price",
    "eth_block_number",
    "register_udfs",
]
