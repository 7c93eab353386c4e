"""Windowed streaming aggregation over the events table.

The canonical Structured Streaming shape: file stream -> event-time window
with watermark -> stateful aggregation.  ``run_windowed_counts`` executes it
with ``availableNow`` (process-everything-then-stop) into a memory sink and
returns the result as a plain DataFrame, which makes the streaming path
batch-comparable: the driver's DuckDB oracle checks it like any other query
(tumbling windows are floor(ts / width)).

At scale this is the standing pipeline for the events firehose: watermark
bounds state, the window key shuffles once, late rows beyond the watermark
drop deterministically.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch nanoseconds (nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_counts_stream(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """readStream -> event-time tumbling window (+watermark) aggregation."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source requires a directory: point at sf_dir and
    # glob-filter down to the events file
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )


def run_windowed_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Run the stream to completion (availableNow) into a memory sink and
    return the settled result."""
    sink = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_counts_stream(spark, sf_dir, window)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
