"""Approximate-aggregate sketches: accuracy measured against exact results.

These are the 100 TB substitutes for exact distinct/percentile (one pass,
bounded memory, mergeable across partitions).  They cannot be DuckDB-
hash-compared (engine-specific sketch internals), so accuracy is asserted
here instead: the battery keeps only exactly-reproducible queries, and this
file pins the approx paths to their exact counterparts."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_approx_count_distinct_within_5pct(lineitem):
    exact = lineitem.select(F.countDistinct("l_partkey")).first()[0]
    approx = lineitem.select(F.approx_count_distinct("l_partkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05, (exact, approx)


def test_approx_percentile_brackets_exact(lineitem):
    row = lineitem.select(
        F.expr(
            "percentile_approx(l_extendedprice, array(0.25, 0.5, 0.75), 10000)"
        ).alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("ex"),
    ).first()
    for a, e in zip(row["ap"], row["ex"]):
        assert abs(a - e) / e < 0.02, (a, e)


def test_sketches_merge_under_repartitioning(lineitem):
    """Sketch results must be stable under different partitionings (the
    merge path IS the distributed algorithm)."""
    one = lineitem.coalesce(1).select(
        F.approx_count_distinct("l_partkey", rsd=0.02)
    ).first()[0]
    many = lineitem.repartition(32).select(
        F.approx_count_distinct("l_partkey", rsd=0.02)
    ).first()[0]
    assert one == many
