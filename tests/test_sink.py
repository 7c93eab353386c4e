"""Write-path tests: partitioned round-trip with partition pruning, and the
bucketed-join-without-shuffle guarantee."""

import pytest
from pyspark.sql import functions as F

from presto_ethereum_spark.sources.sink import (
    write_bucketed_table,
    write_partitioned,
)


def test_partitioned_roundtrip_and_pruning(spark, chain_source, tmp_path):
    erc20 = chain_source.table("erc20").withColumn(
        "block_bucket", F.floor(F.col("erc20_blocknumber") / 500).cast("int")
    )
    path = str(tmp_path / "erc20_part")
    write_partitioned(erc20, path, ["block_bucket"])

    back = spark.read.parquet(path)
    assert back.count() == erc20.count()
    # partition pruning: a bucket filter must reach PartitionFilters
    plan = (
        back.where("block_bucket = 2")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(block_bucket" in plan
    got = back.where("block_bucket = 2").count()
    want = erc20.where("block_bucket = 2").count()
    assert got == want > 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed_table(c, "c_bucketed", "c_custkey", 8, sort_col="c_custkey")
    write_bucketed_table(o, "o_bucketed", "o_custkey", 8, sort_col="o_custkey")
    cb, ob = spark.table("c_bucketed"), spark.table("o_bucketed")

    # broadcast would hide the point; force a sort-merge join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cb.join(ob, cb.c_custkey == ob.o_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it computes the right thing
        n = joined.count()
        plain = c.join(o, c.c_custkey == o.o_custkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS c_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_compact_parquet_binpacks_and_preserves_rows(spark, tmp_path):
    from presto_ethereum_spark.sources.sink import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "packed")
    df = spark.range(0, 50_000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(src)
    report = compact_parquet(spark, src, dst, target_bytes=1 << 40)
    # one enormous target -> exactly one output file, rows preserved
    assert report["files_before"] == 40
    assert report["files_after"] == 1 and report["target_files"] == 1
    assert report["rows"] == 50_000
    back = spark.read.parquet(dst)
    assert back.count() == 50_000
    assert back.selectExpr("sum(v)").first()[0] == df.selectExpr(
        "sum(v)"
    ).first()[0]
