"""Data-layout optimization: Z-order (Morton) clustering keys.

Range pruning on ONE column is free with sorted writes (parquet min/max).
Queries that filter on TWO independent columns (customer AND date, token
AND block) get nothing from a single-column sort — the second column's
values are scattered across every file.  Interleaving the columns' bits
into one Morton key and sorting by IT bounds BOTH columns' min/max spans
per file (each file covers a small Z-curve segment, i.e. a small rectangle
in (a, b) space), so either predicate prunes row groups.  This is the
Z-ORDER primitive of every lakehouse table format, as a plain column
expression:

- rank/normalize each dimension into ``bits`` unsigned bits;
- interleave bit i of each dimension into position ``i * n_dims + d``;
- write sorted by the key (``write_zordered``).

The key is exact integer arithmetic (shifts and masks), so an independent
engine reproduces it bit-for-bit — layout decisions are gradeable, not
vibes.  At 100 TB the computation is a zero-shuffle map expression; the
write's global sort is the one (range-partitioned) shuffle any clustered
write pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_order_key", "write_zordered"]


def z_order_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of each column (values
    must already be non-negative integers in ``[0, 2^bits)`` — normalize
    upstream; out-of-range bits are masked off).  With ``n`` columns the
    key uses ``n * bits`` bits; keep it within 63.

    Bit i of column d lands at key position ``i * n + d``, the standard
    Morton layout (dimension-major within each bit level).

    A NEGATIVE dimension value yields a NULL key (arithmetic shiftright on
    a negative long would otherwise interleave sign-extension garbage that
    silently destroys the clustering) — NULLs sort together under the
    range write, and the guard costs one comparison per dimension.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("z_order_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    z = F.lit(0).cast("long")
    nonneg = F.lit(True)
    for d, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        nonneg = nonneg & (col >= 0)
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + d)
    return F.when(nonneg, z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``: a
    range repartition on the key (the one shuffle) then an in-partition
    sort, so every output file covers a compact Z-curve segment and
    parquet min/max prunes on ANY of the interleaved columns."""
    # collision-safe temp name: never clobber (or later drop) a real column
    zc = "_z"
    while zc in df.columns:
        zc += "_"
    keyed = df.withColumn(zc, z_order_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode(mode)
        .parquet(path)
    )
