"""Planning-time predicate transposition: filters -> block ranges.

Mirrors the reference's getTableLayouts logic (EthereumMetadata.java:179-237):

- ``block_number`` / ``tx_blocknumber`` / ``erc20_blocknumber`` comparisons
  narrow the scanned block range (EthereumBlockRange.fromMarkers,
  EthereumBlockRange.java:11-39: EXACTLY keeps the bound, ABOVE/BELOW nudge
  by one, unbounded low -> 1, unbounded high -> open);
- ``block_hash`` / ``tx_blockhash`` point predicates resolve to a one-block
  range with a planning-time lookup (EthereumMetadata.java:200-214 issues an
  ``eth_getBlockByHash`` RPC *during optimization* — same here, driver-side);
- ``block_timestamp`` bounds transpose via O(log head) binary search over
  block timestamps (EthereumMetadata.java:215-229, :293-318; ±1 offset for
  inexact hits).

The produced range only *narrows the scan*; following the reference's
unenforced contract (EthereumMetadata.java:236) every filter is reported
back as un-pushed so Spark re-applies the full predicate post-scan.
Conjunctive filters (the only kind the Python DataSource API delivers)
intersect their ranges.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    LessThan,
    LessThanOrEqual,
)

# column -> the block-number-ish attribute per table, EthereumMetadata.java:190-229
BLOCK_NUMBER_COLUMNS = {"block_number", "tx_blocknumber", "erc20_blocknumber"}
BLOCK_HASH_COLUMNS = {"block_hash", "tx_blockhash"}
TIMESTAMP_COLUMNS = {"block_timestamp"}

OPEN_END = -1  # reference sentinel for "up to chain head"


@dataclass(frozen=True)
class BlockRange:
    start: int  # >= 1
    end: int  # OPEN_END = unbounded

    def intersect(self, other: "BlockRange") -> "BlockRange":
        start = max(self.start, other.start)
        if self.end == OPEN_END:
            end = other.end
        elif other.end == OPEN_END:
            end = self.end
        else:
            end = min(self.end, other.end)
        return BlockRange(start, end)

    @property
    def is_empty(self) -> bool:
        return self.end != OPEN_END and self.start > self.end


FULL_CHAIN = BlockRange(1, OPEN_END)


def find_block_by_timestamp(get_timestamp, head: int, timestamp: int, offset: int) -> int:
    """Binary search for the block whose timestamp equals ``timestamp``;
    on an inexact hit return ``middle + offset`` (EthereumMetadata.java:293-318).

    ``get_timestamp(n)`` supplies a block's timestamp — one RPC per probe in
    live mode (O(log head) total), a parquet metadata lookup in fixture mode.
    """
    if head <= 1:
        return head
    low, high = 1, head
    middle = low + (high - low) // 2
    while low <= high:
        middle = low + (high - low) // 2
        ts = get_timestamp(middle)
        if ts < timestamp:
            low = middle + 1
        elif ts > timestamp:
            high = middle - 1
        else:
            return middle
    return middle + offset


def ranges_from_filters(
    filters: list[Filter],
    resolve_hash=None,
    get_timestamp=None,
    head: int | None = None,
) -> BlockRange:
    """Intersect every recognized conjunctive filter into one BlockRange.

    ``resolve_hash(h)`` -> block number (or None if unknown);
    ``get_timestamp``/``head`` enable timestamp transposition.
    Unrecognized filters are ignored (they are re-applied by Spark anyway).
    """
    acc = FULL_CHAIN
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue
        col = attr[0].lower()
        if col in BLOCK_NUMBER_COLUMNS:
            acc = acc.intersect(_number_range(f))
        elif col in BLOCK_HASH_COLUMNS and resolve_hash is not None:
            if isinstance(f, EqualTo) and isinstance(f.value, str):
                n = resolve_hash(f.value)
                if n is not None:
                    acc = acc.intersect(BlockRange(n, n))
        elif col in TIMESTAMP_COLUMNS and get_timestamp is not None and head:
            acc = acc.intersect(_timestamp_range(f, get_timestamp, head))
    return acc


def _number_range(f: Filter) -> BlockRange:
    v = getattr(f, "value", None)
    if isinstance(f, EqualTo) and isinstance(v, int):
        return BlockRange(v, v)
    if isinstance(f, GreaterThan) and isinstance(v, int):
        return BlockRange(v + 1, OPEN_END)  # ABOVE bound: value + 1
    if isinstance(f, GreaterThanOrEqual) and isinstance(v, int):
        return BlockRange(v, OPEN_END)  # EXACTLY bound
    if isinstance(f, LessThan) and isinstance(v, int):
        return BlockRange(1, v - 1)  # BELOW bound: value - 1
    if isinstance(f, LessThanOrEqual) and isinstance(v, int):
        return BlockRange(1, v)
    if isinstance(f, In):
        vals = [x for x in f.value if isinstance(x, int)]
        if vals:
            return BlockRange(min(vals), max(vals))
    return FULL_CHAIN


def _timestamp_range(f: Filter, get_timestamp, head: int) -> BlockRange:
    v = getattr(f, "value", None)
    if not isinstance(v, int):
        return FULL_CHAIN
    if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
        return BlockRange(
            max(1, find_block_by_timestamp(get_timestamp, head, v, -1)), OPEN_END
        )
    if isinstance(f, (LessThan, LessThanOrEqual)):
        return BlockRange(1, find_block_by_timestamp(get_timestamp, head, v, +1))
    if isinstance(f, EqualTo):
        lo = find_block_by_timestamp(get_timestamp, head, v, -1)
        hi = find_block_by_timestamp(get_timestamp, head, v, +1)
        return BlockRange(max(1, lo), hi)
    return FULL_CHAIN
