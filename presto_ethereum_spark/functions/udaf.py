"""Grouped-aggregate pandas UDFs (UDAFs) and Python UDTFs — the
aggregation and table-function analogues of the reference's scalar
function surface (udfs/EthereumUDFs.java registers only scalars; these are
the engine-native ways to add custom aggregates and row expanders).

Two deliberate shapes:

- no ``from __future__ import annotations`` — pandas_udf infers the
  GROUPED_AGG function type from the *evaluated* annotations
  (pd.Series -> scalar), and stringified annotations break that inference;
- construction is LAZY (memoized factories): a string returnType parses
  DDL through the active SparkSession, so decorating at import time would
  make ``import presto_ethereum_spark.functions.udaf`` require a running
  session.
"""

import pandas as pd

from pyspark.sql import functions as F

_cache: dict = {}


def median_udaf():
    """Exact in-group median, Arrow batch in / scalar out.  pandas'
    even-n interpolation ((a+b)/2 of the two middle values) matches
    DuckDB's ``median`` bit-for-bit on doubles.

    Scale: a grouped-agg UDF materializes each group's column on one
    executor — right for bounded groups; unbounded groups belong to
    approx_percentile."""
    if "median" not in _cache:

        @F.pandas_udf("double")
        def _median(v: pd.Series) -> float:
            return float(v.median())

        _cache["median"] = _median
    return _cache["median"]


def count_udaf():
    """Group size — needed alongside median_udaf because Spark disallows
    mixing GROUPED_AGG pandas UDFs with built-in aggregates in one agg."""
    if "count" not in _cache:

        @F.pandas_udf("long")
        def _count(v: pd.Series) -> int:
            return int(len(v))

        _cache["count"] = _count
    return _cache["count"]


def split_sentences_udtf():
    """Python UDTF (Spark 4 table-function surface): one output row per
    '. '-delimited sentence with its position and whitespace word count.
    Used via LATERAL in SQL — the row-expanding analogue of the scalar
    UDF surface.  Word counting is len(split(' ')) so the empty sentence
    counts 1, matching SQL string_split semantics exactly."""
    if "udtf" not in _cache:
        from pyspark.sql.functions import udtf

        @udtf(returnType="sentence: string, pos: int, n_words: int")
        class _SplitSentences:
            def eval(self, text: str):
                for i, s in enumerate((text or "").split(". ")):
                    yield s, i, len(s.split(" "))

        _cache["udtf"] = _SplitSentences
    return _cache["udtf"]
