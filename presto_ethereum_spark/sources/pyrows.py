"""Pure-Python row production from nested chain-block dicts.

This is the row-at-a-time decode used (a) by the live RPC reader on
executors — where rows arrive as JSON-RPC dicts and Python-side decode is
free relative to network cost — and (b) by the fixture generator to produce
golden tables.  It mirrors the reference cursor's row semantics
(EthereumRecordCursor.java:109-189) and is deliberately INDEPENDENT of the
Spark column-expression pipeline in ``sources/decode.py``; the two are
differential-tested against each other.
"""

from __future__ import annotations

from presto_ethereum_spark.constants import (
    TRANSFER_EVENT_TOPIC,
    h32_to_h20,
    hex_to_double,
    lookup_token,
)

__all__ = [
    "block_row",
    "transaction_rows",
    "erc20_rows",
    "erc20_row_from_log",
    "erc20_value_hex",
]


def block_row(b: dict) -> dict:
    """EthBlock -> 18-column block row (EthereumRecordCursor.java:109-135)."""
    return {
        "block_number": b["number"],
        "block_hash": b["hash"],
        "block_parenthash": b["parenthash"],
        "block_nonce": b["nonce"],
        "block_sha3uncles": b["sha3uncles"],
        "block_logsbloom": b["logsbloom"],
        "block_transactionsroot": b["transactionsroot"],
        "block_stateroot": b["stateroot"],
        "block_miner": b["miner"],
        "block_difficulty": b["difficulty"],
        "block_totaldifficulty": b["totaldifficulty"],
        "block_size": b["size"],
        "block_extradata": b["extradata"],
        "block_gaslimit": b["gaslimit"],
        "block_gasused": b["gasused"],
        "block_timestamp": b["timestamp"],
        "block_transactions": [t["hash"] for t in b["transactions"]],
        "block_uncles": b["uncles"],
    }


def transaction_rows(b: dict) -> list[dict]:
    """Embedded tx list -> 11-column rows (EthereumRecordCursor.java:136-150)."""
    return [
        {
            "tx_hash": t["hash"],
            "tx_nonce": t["nonce"],
            "tx_blockhash": t["blockhash"],
            "tx_blocknumber": t["blocknumber"],
            "tx_transactionindex": t["transactionindex"],
            "tx_from": t["from"],
            "tx_to": t["to"],
            "tx_value": t["value"],
            "tx_gas": t["gas"],
            "tx_gasprice": t["gasprice"],
            "tx_input": t["input"],
        }
        for t in b["transactions"]
    ]


_HEX_DIGITS = frozenset("0123456789abcdef")


def erc20_value_hex(data: str | None) -> str | None:
    """Canonical exact uint256 read-out of a (post-promotion) value word:
    ``0x`` + 64 lowercase hex digits, or None when the word carries no
    exact uint256 (empty ERC-721 id-in-data payloads, non-hex bodies,
    >64-digit bodies — the same inputs the limb decode
    (sources/decode.hex_to_u256_limb_cols) NULLs).  The double column's
    0.0/lossy fallbacks stay reference-parity; this column is the exact
    sibling surfaced by the ``value_mode=u256_hex`` read option."""
    if not data:
        return None
    body = data[2:].lower()
    if not 1 <= len(body) <= 64 or not _HEX_DIGITS.issuperset(body):
        return None
    return "0x" + body.rjust(64, "0")


def erc20_row_from_log(log: dict, value_hex: bool = False) -> dict | None:
    """Decode ONE log into an erc20 row, or None for non-Transfer / "weird"
    events (EthereumRecordCursor.java:151-189): case-insensitive topic
    match, weird-event drop, unindexed-param promotion, h32->h20 narrowing,
    hex->double with 0.0 fallback.  Shared by the per-block receipt decode
    (:func:`erc20_rows`) and the bulk ``eth_getLogs`` scan, which must
    agree row-for-row.  ``value_hex=True`` adds the exact
    ``erc20_value_hex`` column (the ``value_mode=u256_hex`` option; OFF by
    default so the golden fixture's byte-stability contract is
    untouched)."""
    topics = list(log["topics"])
    data = log["data"]
    if not topics or topics[0].lower() != TRANSFER_EVENT_TOPIC:
        return None
    if len(topics) < 3 and len(topics) + (len(data) - 2) // 64 != 4:
        return None  # "weird" event (:160-161)
    if len(topics) < 3:
        fields = [
            data[2 + 64 * i : 2 + 64 * (i + 1)]
            for i in range((len(data) - 2) // 64)
        ]
        i = 0
        while len(topics) < 3:
            topics.append("0x" + fields[i])
            i += 1
        data = "0x" + fields[i]
    row = {
        "erc20_token": lookup_token(log["address"]),
        "erc20_from": h32_to_h20(topics[1]),
        "erc20_to": h32_to_h20(topics[2]),
        "erc20_value": hex_to_double(data),
        "erc20_txhash": log["transactionhash"],
        "erc20_blocknumber": log["blocknumber"],
    }
    if value_hex:
        row["erc20_value_hex"] = erc20_value_hex(data)
    return row


def erc20_rows(b: dict, value_hex: bool = False) -> list[dict]:
    """ERC-20 Transfer decode over a block's embedded receipt logs."""
    rows = []
    for t in b["transactions"]:
        for log in t.get("logs") or []:
            row = erc20_row_from_log(log, value_hex=value_hex)
            if row is not None:
                rows.append(row)
    return rows
