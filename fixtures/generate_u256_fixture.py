#!/usr/bin/env python3
"""Deterministic full-range uint256 ERC-20 log fixture (seed=1337).

Generates ``fixtures/eth/u256_logs.parquet`` — WIRE-shape receipt logs
(address, topics array, data, blocknumber: exactly the ``eth_getLogs``
row the streaming source's table=log emits) whose Transfer values span
the FULL uint256 range, including values far above 2^120 (the exact-
DECIMAL(38,0) family's documented exclusion bound) and within 2^16 of
2^256-1.  Feeds the 5-limb exact ledger (`eth_erc20_balances_u256`):
the generator maintains a Python-int ledger (mint from the zero
address, then transfers bounded by the sender's running balance, so
every non-zero-address balance stays a valid non-negative uint256) and
writes the expected final balances beside the logs as
``fixtures/eth/u256_balances.parquet`` for unit-level differential
tests (the graded oracle recomputes from the logs in DuckDB HUGEINT
limb arithmetic instead — fully independent).

Noise rows that the Transfer filter must drop are mixed in: wrong
topic0, 2-topic promoted shape, ERC-721 empty-data, over-long data.

Separate from generate_eth_fixture.py ON PURPOSE: the main chain
fixture's byte-stability contract (FIXTURES.md) is untouched.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from presto_ethereum_spark.constants import TRANSFER_EVENT_TOPIC  # noqa: E402

OUT_DIR = Path(__file__).resolve().parent / "eth"
ZERO20 = "0x" + "0" * 40
N_EVENTS = 420
N_BLOCKS = 300

rng = random.Random(1337)


def rand_addr() -> str:
    return "0x" + "".join(rng.choice("0123456789abcdef") for _ in range(40))


def to_h32(addr: str) -> str:
    return "0x" + addr[2:].rjust(64, "0")


def value_hex64(v: int) -> str:
    return format(v, "x").rjust(64, "0")


def mint_value() -> int:
    """Full-range uint256 mint amounts, heavy above 2^120."""
    r = rng.random()
    if r < 0.20:
        return rng.getrandbits(64)  # small (exercises low limbs only)
    if r < 0.45:
        return rng.getrandbits(130) | (1 << 129)  # just past the 2^120 bound
    if r < 0.70:
        return rng.getrandbits(200) | (1 << 199)
    if r < 0.90:
        return rng.getrandbits(252) | (1 << 251)
    return 2**256 - 1 - rng.getrandbits(16)  # near-max uint256


def main() -> None:
    tokens = [rand_addr() for _ in range(3)]
    holders = [rand_addr() for _ in range(12)]
    # dust holders only ever receive small mints: balances whose top
    # limbs are all zero exercise the zero-padded rendering path
    dust = [rand_addr() for _ in range(3)]
    balances: dict[tuple[str, str], int] = {}
    # a real ERC-20's totalSupply is itself a uint256: cap cumulative
    # net mints per token, not just per-holder balances (the supply
    # entry's outstanding read-out must be a valid uint256)
    supply: dict[str, int] = {}
    rows: list[dict] = []

    def emit(token: str, frm: str, to: str, value: int, bn: int) -> None:
        rows.append(
            {
                "address": token,
                "topics": [TRANSFER_EVENT_TOPIC, to_h32(frm), to_h32(to)],
                "data": "0x" + value_hex64(value),
                "blocknumber": bn,
            }
        )
        if frm != ZERO20:
            balances[(token, frm)] -= value
        else:
            supply[token] = supply.get(token, 0) + value  # mint
        if to != ZERO20:
            balances[(token, to)] = balances.get((token, to), 0) + value
        else:
            supply[token] = supply.get(token, 0) - value  # burn

    bn = 0
    for i in range(N_EVENTS):
        # block numbers are MONOTONE in emission order (a real chain is
        # causal): a random-per-event block let a checkpoint cut include
        # a spend while excluding the earlier mint that funded it, making
        # as-of balances negative — impossible on-chain
        bn += rng.choice((0, 0, 1, 1, 1, 2))
        bn = min(bn, N_BLOCKS - 1)
        token = rng.choice(tokens)
        kind = rng.random()
        if kind < 0.35 or not any(
            v > 0 for (t, _), v in balances.items() if t == token
        ):
            # mint: zero address -> holder, full-range uint256 amount
            # clamped so the recipient balance stays a valid uint256
            to = rng.choice(holders)
            headroom = min(
                2**256 - 1 - balances.get((token, to), 0),
                2**256 - 1 - supply.get(token, 0),
            )
            amt = min(mint_value(), headroom)
            if amt > 0:
                emit(token, ZERO20, to, amt, bn)
            if rng.random() < 0.25 and supply.get(token, 0) < 2**256 - 2**41:
                emit(token, ZERO20, rng.choice(dust), rng.getrandbits(40) + 1, bn)
        elif kind < 0.90:
            # transfer bounded by the sender's running balance (ledger
            # stays a valid non-negative uint256 for every holder)
            funded = [
                h for (t, h), v in balances.items() if t == token and v > 0
            ]
            frm = rng.choice(funded)
            # ~15% burns (transfer to the zero address) so the supply
            # entry's burned leg has real coverage
            to = ZERO20 if rng.random() < 0.15 else rng.choice(holders)
            # bounded by BOTH the sender's balance and the recipient's
            # uint256 headroom (a self-transfer has full headroom)
            cap = balances[(token, frm)]
            if to != frm:
                cap = min(cap, 2**256 - 1 - balances.get((token, to), 0))
            if cap > 0:
                emit(token, frm, to, rng.randint(1, cap), bn)
        else:
            # noise the Transfer filter must drop
            noise = rng.random()
            if noise < 0.4:  # non-Transfer topic0
                rows.append(
                    {
                        "address": token,
                        "topics": [to_h32(rand_addr()), to_h32(rand_addr())],
                        "data": "0x" + value_hex64(rng.getrandbits(256)),
                        "blocknumber": bn,
                    }
                )
            elif noise < 0.7:  # 2-topic promoted shape (len(topics) < 3)
                rows.append(
                    {
                        "address": token,
                        "topics": [TRANSFER_EVENT_TOPIC, to_h32(rand_addr())],
                        "data": "0x"
                        + to_h32(rand_addr())[2:]
                        + value_hex64(rng.getrandbits(128)),
                        "blocknumber": bn,
                    }
                )
            else:  # ERC-721 empty data / over-long data
                rows.append(
                    {
                        "address": token,
                        "topics": [
                            TRANSFER_EVENT_TOPIC,
                            to_h32(rand_addr()),
                            to_h32(rand_addr()),
                        ],
                        "data": "0x"
                        if rng.random() < 0.5
                        else "0x" + value_hex64(rng.getrandbits(256)) * 2,
                        "blocknumber": bn,
                    }
                )

    log_schema = pa.schema(
        [
            ("address", pa.string()),
            ("topics", pa.list_(pa.string())),
            ("data", pa.string()),
            ("blocknumber", pa.int64()),
        ]
    )
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    table = pa.Table.from_pylist(rows, schema=log_schema)
    pq.write_table(
        table, OUT_DIR / "u256_logs.parquet", compression="zstd", row_group_size=100
    )
    print(f"u256_logs: {table.num_rows} rows")

    bal_rows = [
        {
            "token_address": t,
            "holder": h,
            "balance_hex": "0x" + format(v, "x").rjust(64, "0"),
        }
        for (t, h), v in sorted(balances.items())
    ]
    assert all(0 <= v < 2**256 for v in balances.values())
    assert all(0 <= v < 2**256 for v in supply.values())
    assert supply == {
        t: sum(v for (tt, _), v in balances.items() if tt == t)
        for t in tokens
    }
    assert any(v > 2**200 for v in balances.values()), "fixture must cover >2^120"
    bal_schema = pa.schema(
        [
            ("token_address", pa.string()),
            ("holder", pa.string()),
            ("balance_hex", pa.string()),
        ]
    )
    bt = pa.Table.from_pylist(bal_rows, schema=bal_schema)
    pq.write_table(bt, OUT_DIR / "u256_balances.parquet", compression="zstd")
    print(f"u256_balances: {bt.num_rows} rows")


if __name__ == "__main__":
    main()
