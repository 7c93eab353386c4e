"""Grouped-aggregate pandas UDFs (UDAFs) — the aggregation analogue of the
reference's scalar function surface (udfs/EthereumUDFs.java registers only
scalars; Spark's GROUPED_AGG pandas UDFs are the engine-native way to add
custom aggregates).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the GROUPED_AGG function type from the *evaluated* annotations
(pd.Series -> scalar), and stringified annotations break that inference.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact in-group median, Arrow batch in / scalar out.  pandas'
    even-n interpolation ((a+b)/2 of the two middle values) matches
    DuckDB's ``median`` bit-for-bit on doubles.

    Scale: a grouped-agg UDF materializes each group's column on one
    executor — right for bounded groups; unbounded groups belong to
    approx_percentile."""
    return float(v.median())


@F.pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    """Group size — needed alongside median_udaf because Spark disallows
    mixing GROUPED_AGG pandas UDFs with built-in aggregates in one agg."""
    return int(len(v))
