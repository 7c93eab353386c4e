"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` delegate to the engine's battery registry
(presto_ethereum_spark/plans/battery.py): one entry per implemented
operator/capability from SURVEY.md §2, each paired with a DuckDB oracle.
The eth_* entries drive the full connector-equivalent decode pipeline (nested
chain snapshot -> derived tables) against independently-generated goldens.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from presto_ethereum_spark.plans import battery


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 4-table star join with
    broadcast dimensions (region -> nation -> customer -> orders)."""
    return battery.rel_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return battery.queries()


def oracle_sql() -> dict[str, str]:
    return battery.oracles()
