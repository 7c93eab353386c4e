"""Write path: the reference is a read-only connector (no PageSinkProvider
anywhere in SRC/; EthereumConnector.java:40-43 only opens no-op
READ_COMMITTED transactions), so our outputs are ordinary Spark writes —
with the two layouts that matter at 100 TB made first-class:

- **partitioned parquet** for time/range pruning on read (the write-side
  complement of the scan's block-range pushdown);
- **bucketed tables** for co-located joins: two tables bucketed on the same
  key join with ZERO exchange — the write-once-shuffle-never pattern for
  fact-to-fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameWriter

__all__ = ["write_partitioned", "write_bucketed_table", "compact_parquet"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    """Hive-style partitioned parquet.  Partition columns should be
    low-cardinality derivations (block bucket, date), never raw high-card
    keys — a 100 TB write with millions of partition dirs is a metadata
    bomb.  ``maxRecordsPerFile`` bounds file sizes under skew."""
    w: DataFrameWriter = df.write.mode(mode).format("parquet")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy(*partition_cols).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + optionally sorted managed table.  Joins between tables
    bucketed identically on the join key skip the shuffle entirely (verified
    in tests/test_sink.py by asserting no Exchange in the plan).

    Re-run robustness: with the default in-memory catalog a PREVIOUS
    session's managed-table location survives on disk while the catalog
    entry does not, so ``mode=overwrite`` alone raises
    LOCATION_ALREADY_EXISTS.  The write therefore drops the catalog entry
    and clears an orphaned location first (via the Hadoop FS API, so any
    warehouse scheme works).  Against a persistent metastore the drop is
    a no-op and overwrite behaves normally."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        jvm = spark._jvm
        wdir = spark.conf.get("spark.sql.warehouse.dir")
        loc = jvm.org.apache.hadoop.fs.Path(wdir + "/" + table.lower())
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction (the OPTIMIZE/bin-pack maintenance job):
    rewrite a fragmented parquet directory into ceil(total_bytes /
    target_bytes) files at ``dst_path`` and return a report dict
    (files/bytes before, files after, rows verified equal).

    Streaming sinks and over-parallel writes leave thousands of tiny
    files; at 100 TB the scan cost is then dominated by open/footer
    overhead and the NameNode/listing metadata, not data bytes — the
    classic fix is this periodic rewrite toward the scan-optimal
    ~128 MB.  The rewrite is ONE round-robin repartition (no key
    shuffle semantics to preserve — parquet directories carry no
    ordering contract); row-count equality before/after is verified
    here, and callers publish ``dst_path`` atomically (manifest or
    directory swap) exactly like the streaming sink's compaction."""
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = src.getFileSystem(conf)
    files = [
        f
        for f in fs.listStatus(src)
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    ]
    n_before = len(files)
    bytes_before = sum(f.getLen() for f in files)
    n_out = max(1, math.ceil(bytes_before / target_bytes))
    df = spark.read.parquet(src_path)
    rows_before = df.count()
    df.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    back = spark.read.parquet(dst_path)
    rows_after = back.count()
    dst = jvm.org.apache.hadoop.fs.Path(dst_path)
    n_after = sum(
        1
        for f in fs.listStatus(dst)
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    )
    if rows_after != rows_before:
        raise RuntimeError(
            f"compaction lost rows: {rows_before} -> {rows_after}"
        )
    return {
        "files_before": n_before,
        "bytes_before": int(bytes_before),
        "files_after": n_after,
        "target_files": n_out,
        "rows": int(rows_before),
    }
