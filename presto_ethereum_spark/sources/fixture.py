"""Fixture-backed chain source: the offline equivalent of the reference's
JSON-RPC connector.

A nested ``chain_blocks`` parquet (FIXTURES.md §1) stands in for the node:
one row per block with embedded transactions and receipt logs — the exact
information one ``eth_getBlockByNumber(n, true)`` plus per-tx
``eth_getTransactionReceipt`` round-trip yields (EthereumRecordSet.java:48-56,
EthereumLogLazyIterator.java:29-61).  The three public tables are *derived*
(sources/decode.py), so predicate pushdown, column pruning, and partition
pruning all come from the parquet scan via Catalyst:

- ``block_number`` range predicates prune parquet row groups on ``number``
  (the reference's only documented pushdown, README.md:15);
- ``block_timestamp`` ranges prune via parquet min/max on ``timestamp`` —
  replacing the reference's planning-time RPC binary search
  (EthereumMetadata.java:293-318) with storage statistics;
- queries that never touch log-derived columns never deserialize the
  ``transactions.logs`` subtree (columnar pruning ≈ the reference's lazy
  receipt fetch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from presto_ethereum_spark.schemas import TABLE_BLOCK, TABLE_ERC20, TABLE_TRANSACTION
from presto_ethereum_spark.sources.decode import (
    blocks_from_chain,
    erc20_from_chain,
    transactions_from_chain,
)


class EthereumFixtureSource:
    """Loads the nested chain snapshot and exposes the three tables."""

    def __init__(
        self, spark: SparkSession, chain_path: str, strict_varchar: bool = False
    ):
        """``strict_varchar=True`` applies the reference's varchar(n)
        truncation widths to every bounded column
        (decode.truncate_varchar_bounds) — exact Presto-engine parity for
        malformed inputs; off by default since well-formed chain data never
        exceeds the declared widths."""
        self.spark = spark
        self.chain_path = chain_path
        self.strict_varchar = strict_varchar
        self._chain: DataFrame | None = None

    @property
    def chain(self) -> DataFrame:
        if self._chain is None:
            if self.chain_path.rstrip("/").endswith((".json", ".jsonl")):
                # JSON-lines chain snapshot (the shape an eth_getBlockByNumber
                # dump produces) — read with the explicit nested schema so
                # types match the parquet path exactly (no inference drift)
                from presto_ethereum_spark.schemas import CHAIN_BLOCK_SCHEMA

                self._chain = self.spark.read.schema(CHAIN_BLOCK_SCHEMA).json(
                    self.chain_path
                )
            else:
                self._chain = self.spark.read.parquet(self.chain_path)
        return self._chain

    def table(self, name: str) -> DataFrame:
        name = name.lower()
        if name == TABLE_BLOCK:
            out = blocks_from_chain(self.chain)
        elif name == TABLE_TRANSACTION:
            out = transactions_from_chain(self.chain)
        elif name == TABLE_ERC20:
            out = erc20_from_chain(self.chain)
        else:
            # Unknown table -> error, mirroring EthereumTable.java:7-14 /
            # EthereumMetadata.java:71-81.
            raise ValueError(
                f"Unknown table: {name!r} (expected block|transaction|erc20)"
            )
        if self.strict_varchar:
            from presto_ethereum_spark.sources.decode import (
                truncate_varchar_bounds,
            )

            out = truncate_varchar_bounds(out, name)
        return out

    def table_for_block_range(
        self, name: str, lo: int | None = None, hi: int | None = None
    ) -> DataFrame:
        """Block-range pushdown, the reference's only documented predicate
        transposition (EthereumMetadata.java:179-199, README.md:15): a range
        on block_number / tx_blocknumber / erc20_blocknumber restricts the
        *chain scan* itself (parquet row-group pruning on ``number``) instead
        of filtering after the explode.  Matches the reference's unenforced
        contract: every row of the pruned scan is still produced, and the
        caller's own filter re-applies the predicate (EthereumMetadata.java:236).
        """
        from pyspark.sql import functions as F

        chain = self.chain
        if lo is not None:
            chain = chain.where(F.col("number") >= lo)
        if hi is not None:
            chain = chain.where(F.col("number") <= hi)
        name = name.lower()
        if name == TABLE_BLOCK:
            return blocks_from_chain(chain)
        if name == TABLE_TRANSACTION:
            return transactions_from_chain(chain)
        if name == TABLE_ERC20:
            return erc20_from_chain(chain)
        raise ValueError(f"Unknown table: {name!r} (expected block|transaction|erc20)")

    def register_views(self) -> None:
        """``SHOW TABLES`` parity: block / erc20 / transaction."""
        for name in (TABLE_BLOCK, TABLE_TRANSACTION, TABLE_ERC20):
            self.table(name).createOrReplaceTempView(name)
