#!/usr/bin/env python3
"""Deterministic synthetic Ethereum chain fixture + golden tables.

Generates (seed=42, per FIXTURES.md):
  fixtures/eth/chain_blocks.parquet  — nested snapshot (1 row/block, embedded
                                       txs, embedded receipt logs)
  fixtures/eth/block.parquet         — golden `block` table (18 cols)
  fixtures/eth/transaction.parquet   — golden `transaction` table (11 cols)
  fixtures/eth/erc20.parquet         — golden `erc20` table (6 cols)

The goldens are computed here with plain Python loops — an implementation of
the reference's row-production semantics (EthereumRecordCursor.java:109-189)
INDEPENDENT of the Spark pipeline in presto_ethereum_spark/sources/decode.py —
so engine-vs-golden comparisons are a real differential test.

Coverage cases required by FIXTURES.md §1 are all present: standard 3-topic
Transfers, unindexed 1-/2-topic promotions, "weird" dropped events, ERC-721
0.0 fallback, values > 2^63 and > 2^53, exact powers of 10, case-varied
known-token addresses, unknown contracts, non-Transfer topics, empty-tx
blocks, ~2% null `to`, and a >=3-topic log whose data is longer than one
64-char field (whole-data value parse, EthereumRecordCursor.java:180).
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from presto_ethereum_spark.constants import (  # noqa: E402
    ERC20_TOKEN_BY_ADDRESS,
    TRANSFER_EVENT_TOPIC,
    hex_to_double,
    h32_to_h20,
    lookup_token,
)

N_BLOCKS = 2400
OUT_DIR = Path(__file__).resolve().parent / "eth"

rng = random.Random(42)


def rand_hex(nbytes: int) -> str:
    return "0x" + "".join(rng.choice("0123456789abcdef") for _ in range(2 * nbytes))


def vary_case(addr: str) -> str:
    """Randomly upper-case some hex letters to exercise the toLowerCase()
    lookup path (EthereumRecordCursor.java:173)."""
    return "0x" + "".join(
        c.upper() if c.isalpha() and rng.random() < 0.5 else c for c in addr[2:]
    )


def to_h32(addr_or_int) -> str:
    """Left-pad an address or int to a 32-byte hex word."""
    if isinstance(addr_or_int, str):
        return "0x" + addr_or_int[2:].rjust(64, "0")
    return "0x" + format(addr_or_int, "x").rjust(64, "0")


def value_hex64(v: int) -> str:
    return format(v, "x").rjust(64, "0")  # no 0x prefix (data-field form)


KNOWN_TOKENS = sorted(ERC20_TOKEN_BY_ADDRESS)
MINERS = [rand_hex(20) for _ in range(20)]
SENDERS = [rand_hex(20) for _ in range(200)]
sender_nonce = {s: 0 for s in SENDERS}


def pick_miner() -> str:
    # zipf-ish: small pool, skewed
    idx = min(int(rng.paretovariate(1.2)) - 1, len(MINERS) - 1)
    return MINERS[idx]


def pick_value() -> float:
    r = rng.random()
    if r < 0.15:
        return float(rng.randint(1, 500) * 10**18)  # exact multiples of 1 ether
    return float(int(10 ** rng.uniform(0, 21)))


def make_transfer_value() -> int:
    r = rng.random()
    if r < 0.2:
        return 10 ** rng.randint(0, 30)  # exact powers of 10 (unit goldens)
    if r < 0.35:
        return rng.getrandbits(70) | (1 << 69)  # > 2^63
    if r < 0.5:
        return rng.getrandbits(56) | (1 << 55)  # > 2^53 (double-precision pin)
    return rng.getrandbits(48)


def make_logs(tx_hash: str, block_number: int) -> list[dict]:
    if rng.random() > 0.30:
        return []
    logs = []
    for _ in range(rng.randint(1, 2)):
        addr = (
            vary_case(rng.choice(KNOWN_TOKENS))
            if rng.random() < 0.5
            else rand_hex(20)
        )
        topic0 = (
            TRANSFER_EVENT_TOPIC.upper().replace("0X", "0x")
            if rng.random() < 0.1
            else TRANSFER_EVENT_TOPIC
        )
        kind = rng.random()
        value = make_transfer_value()
        if kind < 0.50:  # standard 3-topic
            topics = [topic0, to_h32(rand_hex(20)), to_h32(rand_hex(20))]
            data = "0x" + value_hex64(value)
        elif kind < 0.60:  # 2-topic promoted: data = [to, value]
            topics = [topic0, to_h32(rand_hex(20))]
            data = "0x" + to_h32(rand_hex(20))[2:] + value_hex64(value)
        elif kind < 0.70:  # 1-topic promoted: data = [from, to, value]
            topics = [topic0]
            data = (
                "0x"
                + to_h32(rand_hex(20))[2:]
                + to_h32(rand_hex(20))[2:]
                + value_hex64(value)
            )
        elif kind < 0.78:  # weird: dropped (topics + data fields != 4)
            topics = [topic0] if rng.random() < 0.5 else [topic0, to_h32(rand_hex(20))]
            data = "0x" + value_hex64(value) * rng.choice([0, 4])
        elif kind < 0.86:  # ERC-721 style: 4 topics, empty data -> 0.0
            topics = [
                topic0,
                to_h32(rand_hex(20)),
                to_h32(rand_hex(20)),
                to_h32(rng.getrandbits(32)),
            ]
            data = "0x"
        elif kind < 0.90:  # 3 topics, 2-field data -> whole-data value parse
            topics = [topic0, to_h32(rand_hex(20)), to_h32(rand_hex(20))]
            data = "0x" + value_hex64(value) + value_hex64(rng.getrandbits(40))
        else:  # non-Transfer event: filtered out
            topics = [to_h32(rng.getrandbits(256)), to_h32(rand_hex(20))]
            data = "0x" + value_hex64(value)
        logs.append(
            {
                "address": addr,
                "topics": topics,
                "data": data,
                "transactionhash": tx_hash,
                "blocknumber": block_number,
            }
        )
    return logs


def make_tx(block_number: int, block_hash: str, index: int) -> dict:
    sender = rng.choice(SENDERS)
    nonce = sender_nonce[sender]
    sender_nonce[sender] += 1
    tx_hash = rand_hex(32)
    is_create = rng.random() < 0.02
    is_call = not is_create and rng.random() < 0.2
    return {
        "hash": tx_hash,
        "nonce": nonce,
        "blockhash": block_hash,
        "blocknumber": block_number,
        "transactionindex": index,
        "from": sender,
        "to": None if is_create else rand_hex(20),
        "value": pick_value(),
        "gas": float(rng.randint(21000, 8_000_000)),
        "gasprice": float(rng.randint(10**9, 2 * 10**11)),
        "input": rand_hex(rng.randint(4, 68)) if (is_create or is_call) else "0x",
        "logs": make_logs(tx_hash, block_number),
    }


def generate_chain() -> list[dict]:
    blocks = []
    parent = "0x" + "0" * 64
    ts = 1438269988
    difficulty = 17_000_000_000
    total_difficulty = 0
    for n in range(1, N_BLOCKS + 1):
        ts += max(1, int(rng.gauss(13, 6)))
        difficulty = int(difficulty * (1.0 + rng.uniform(-0.003, 0.006)))
        total_difficulty += difficulty
        h = rand_hex(32)
        n_tx = 0 if rng.random() < 0.12 else rng.randint(1, 14)
        txs = [make_tx(n, h, i) for i in range(n_tx)]
        gas_limit = float(rng.randint(3_000_000, 8_000_000))
        blocks.append(
            {
                "number": n,
                "hash": h,
                "parenthash": parent,
                "nonce": rand_hex(8),
                "sha3uncles": rand_hex(32),
                "logsbloom": rand_hex(256),
                "transactionsroot": rand_hex(32),
                "stateroot": rand_hex(32),
                "miner": pick_miner(),
                "difficulty": difficulty,
                "totaldifficulty": total_difficulty,
                "size": rng.randint(500, 50000),
                "extradata": "" if rng.random() < 0.2 else rand_hex(rng.randint(0, 32)),
                "gaslimit": gas_limit,
                "gasused": float(rng.randint(0, int(gas_limit))),
                "timestamp": ts,
                "uncles": [rand_hex(32) for _ in range(rng.choices([0, 1, 2], [0.9, 0.08, 0.02])[0])],
                "transactions": txs,
            }
        )
        parent = h
    return blocks


# ---------------------------------------------------------------------------
# Golden decode via the pure-Python row producer (sources/pyrows.py) — the
# Spark column-expression pipeline stays the independent differential side.
# ---------------------------------------------------------------------------

from presto_ethereum_spark.sources import pyrows  # noqa: E402


def golden_block_rows(chain: list[dict]) -> list[dict]:
    return [pyrows.block_row(b) for b in chain]


def golden_transaction_rows(chain: list[dict]) -> list[dict]:
    return [r for b in chain for r in pyrows.transaction_rows(b)]


def golden_erc20_rows(chain: list[dict]) -> list[dict]:
    return [r for b in chain for r in pyrows.erc20_rows(b)]


# ---------------------------------------------------------------------------
# Parquet writing with exact arrow schemas
# ---------------------------------------------------------------------------

LOG_T = pa.struct(
    [
        ("address", pa.string()),
        ("topics", pa.list_(pa.string())),
        ("data", pa.string()),
        ("transactionhash", pa.string()),
        ("blocknumber", pa.int64()),
    ]
)
TX_T = pa.struct(
    [
        ("hash", pa.string()),
        ("nonce", pa.int64()),
        ("blockhash", pa.string()),
        ("blocknumber", pa.int64()),
        ("transactionindex", pa.int32()),
        ("from", pa.string()),
        ("to", pa.string()),
        ("value", pa.float64()),
        ("gas", pa.float64()),
        ("gasprice", pa.float64()),
        ("input", pa.string()),
        ("logs", pa.list_(LOG_T)),
    ]
)
CHAIN_T = pa.schema(
    [
        ("number", pa.int64()),
        ("hash", pa.string()),
        ("parenthash", pa.string()),
        ("nonce", pa.string()),
        ("sha3uncles", pa.string()),
        ("logsbloom", pa.string()),
        ("transactionsroot", pa.string()),
        ("stateroot", pa.string()),
        ("miner", pa.string()),
        ("difficulty", pa.int64()),
        ("totaldifficulty", pa.int64()),
        ("size", pa.int32()),
        ("extradata", pa.string()),
        ("gaslimit", pa.float64()),
        ("gasused", pa.float64()),
        ("timestamp", pa.int64()),
        ("uncles", pa.list_(pa.string())),
        ("transactions", pa.list_(TX_T)),
    ]
)
BLOCK_T = pa.schema(
    [
        ("block_number", pa.int64()),
        ("block_hash", pa.string()),
        ("block_parenthash", pa.string()),
        ("block_nonce", pa.string()),
        ("block_sha3uncles", pa.string()),
        ("block_logsbloom", pa.string()),
        ("block_transactionsroot", pa.string()),
        ("block_stateroot", pa.string()),
        ("block_miner", pa.string()),
        ("block_difficulty", pa.int64()),
        ("block_totaldifficulty", pa.int64()),
        ("block_size", pa.int32()),
        ("block_extradata", pa.string()),
        ("block_gaslimit", pa.float64()),
        ("block_gasused", pa.float64()),
        ("block_timestamp", pa.int64()),
        ("block_transactions", pa.list_(pa.string())),
        ("block_uncles", pa.list_(pa.string())),
    ]
)
TXTBL_T = pa.schema(
    [
        ("tx_hash", pa.string()),
        ("tx_nonce", pa.int64()),
        ("tx_blockhash", pa.string()),
        ("tx_blocknumber", pa.int64()),
        ("tx_transactionindex", pa.int32()),
        ("tx_from", pa.string()),
        ("tx_to", pa.string()),
        ("tx_value", pa.float64()),
        ("tx_gas", pa.float64()),
        ("tx_gasprice", pa.float64()),
        ("tx_input", pa.string()),
    ]
)
ERC20_T = pa.schema(
    [
        ("erc20_token", pa.string()),
        ("erc20_from", pa.string()),
        ("erc20_to", pa.string()),
        ("erc20_value", pa.float64()),
        ("erc20_txhash", pa.string()),
        ("erc20_blocknumber", pa.int64()),
    ]
)


def main() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    chain = generate_chain()
    tables = {
        "chain_blocks": (chain, CHAIN_T),
        "block": (golden_block_rows(chain), BLOCK_T),
        "transaction": (golden_transaction_rows(chain), TXTBL_T),
        "erc20": (golden_erc20_rows(chain), ERC20_T),
    }
    # Small row groups (200 blocks' worth) so block-range predicates exercise
    # real parquet row-group pruning, mirroring the reference's split-level
    # scan pruning (EthereumSplitManager.java:55-61).
    row_group = {"chain_blocks": 200, "block": 200, "transaction": 2000, "erc20": 2000}
    for name, (rows, schema) in tables.items():
        table = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(
            table,
            OUT_DIR / f"{name}.parquet",
            compression="zstd",
            row_group_size=row_group[name],
        )
        print(f"{name}: {table.num_rows} rows -> {OUT_DIR / f'{name}.parquet'}")


if __name__ == "__main__":
    main()
