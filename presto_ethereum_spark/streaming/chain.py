"""Streaming Ethereum source: tail the chain head as micro-batches.

The reference is strictly batch-pull (no streaming anywhere in SRC/ — its
only notion of "latest" is the UDFs' block parameter); this module is the
Spark-native extension SURVEY.md §2.B anticipates: ``readStream`` over the
same transports as the batch source, with blocks arriving as micro-batches
of the ``block`` table.

Offsets are plain block numbers ({"next": n}), so restart/replay semantics
are exact: ``readBetweenOffsets`` re-serves any committed range
deterministically from the transport.  Implemented on
:class:`SimpleDataSourceStreamReader` (driver-side reads) because a
chain-head tail is low-rate by nature (~1 block / 13 s on mainnet); the
heavy historical backfill belongs to the batch source, not the tail.

Usage::

    spark.dataSource.register(EthereumStreamDataSource)
    (spark.readStream.format("ethereum-stream")
        .option("path", "fixtures/eth/chain_blocks.parquet")  # or url=...
        .option("start_block", 1)
        .option("max_blocks_per_batch", 100)
        .load()
        .writeStream...)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from presto_ethereum_spark.schemas import BLOCK_SCHEMA
from presto_ethereum_spark.sources.rpc import make_transport


class EthereumStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.transport = make_transport(options)
        self.start_block = int(options.get("start_block", 1))
        self.max_per_batch = int(options.get("max_blocks_per_batch", 100))
        self.columns = [f.name for f in BLOCK_SCHEMA.fields]

    def initialOffset(self) -> dict:
        return {"next": self.start_block}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: Spark's simple-stream wrapper pickles the
        # prefetched batch to serve readBetweenOffsets replays
        from presto_ethereum_spark.sources import pyrows

        out = []
        for b in self.transport.get_blocks(list(range(lo, hi))):
            row = pyrows.block_row(b)
            out.append(tuple(row[c] for c in self.columns))
        return out

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["next"]
        head = self.transport.block_number()
        hi = min(head + 1, lo + self.max_per_batch)
        if hi <= lo:
            # caught up: the wrapper probes this with next() (expects an
            # ITERATOR raising StopIteration); non-empty batches below must
            # instead be a picklable LIST for the prefetch cache
            return iter(()), start
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # executor-side replay path validates for an iterator, not a list
        return iter(self._rows(start["next"], end["next"]))

    def commit(self, end: dict) -> None:
        pass  # transports are stateless; nothing to clean up


class EthereumStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ethereum-stream"

    def schema(self) -> StructType:
        return BLOCK_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> EthereumStreamReader:
        return EthereumStreamReader(dict(self.options))


def run_chain_gas_buckets(
    spark, path: str, bucket_blocks: int = 100, max_per_batch: int = 4000
):
    """Streaming gas telemetry over the chain tail: readStream on the
    ethereum-stream source, aggregated per ``bucket_blocks``-block bucket,
    run to completion (availableNow) into a memory sink.

    The standing monitor shape for a live node: block micro-batches fold
    into a bounded per-bucket state (complete mode over a small bucket
    domain); gas sums go through DECIMAL so the streamed result equals the
    batch aggregation exactly under any micro-batch partitioning."""
    import uuid

    from pyspark.sql import functions as F

    spark.dataSource.register(EthereumStreamDataSource)
    stream = (
        spark.readStream.format("ethereum-stream")
        .option("path", path)
        .option("max_blocks_per_batch", max_per_batch)
        .load()
    )
    agg = (
        stream.groupBy(
            F.expr(f"CAST(block_number DIV {bucket_blocks} AS INT)").alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.col("block_gasused").cast("decimal(18,0)"))
            .cast("double")
            .alias("total_gas_used"),
            F.max("block_gaslimit").alias("max_gas_limit"),
        )
    )
    sink = f"stream_chain_gas_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # pin the result and DROP the uuid-named sink table: repeated calls in
    # one session (bench loops, retries) must not accumulate cached result
    # tables
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out
