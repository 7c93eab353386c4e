#!/usr/bin/env python3
"""Derive an sf1-scale documents/embeddings pair from the DRIVER'S sf0.1
tables (VERDICT r12 #7: "sf1 spot-gate for the shuffle-heavy tail").

The driver ships sf0.001/0.01/0.1 only; the judge's prescription needs one
order of magnitude more rows to catch superlinear creep the plan audit
can't see.  Rather than synthesizing a new distribution (TESTDATA.md:
"use these as inputs"), this script SCALES the driver's own sf0.1 data:

- ``documents`` (5,000 -> 50,000): 10 replicas.  Replica 0 is the
  original; replica r suffixes every whitespace token with ``r`` and
  offsets doc_id by r*10^7.  Within a replica the near-duplicate /
  shingle / Zipf structure is EXACTLY the driver's; across replicas no
  shingle survives (every token differs), so dup clusters do NOT merge
  and pair counts scale LINEARLY — the honest 10x workload, not a
  quadratic all-replicas-are-dups blowup.  n_chars is recomputed; lang /
  source carry over (each source now holds 10x docs with the same
  internal dup rate).
- ``embeddings`` (2,000 -> 20,000): 10 replicas, vec_id offset the same
  way; replica r > 0 adds deterministic N(0, 0.02) jitter
  (numpy default_rng(seed=r)) so replicas are near but not exact
  duplicates — kNN neighborhoods stay non-degenerate.  Labels carry
  over.

Output: /tmp/sf1/{documents,embeddings}.parquet (plus symlinks to the
driver's sf0.1 parquet for every other table, so battery entries that
touch small dims still resolve).  Deterministic: same input -> same
bytes.  Re-run freely; ~5 s.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path(os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1"))
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
REPLICAS = 10
ID_STEP = 10_000_000


def scale_documents() -> None:
    t = pq.read_table(SRC / "documents.parquet")
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    sources = t["source"].to_pylist()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for r in range(REPLICAS):
        for i, txt in enumerate(texts):
            if r == 0:
                new = txt
            else:
                # suffix every token: within-replica shingle structure is
                # identical to the original, across-replica overlap is zero
                new = " ".join(f"{w}{r}" for w in txt.split(" "))
            out["doc_id"].append(ids[i] + r * ID_STEP)
            out["text"].append(new)
            out["lang"].append(langs[i])
            out["source"].append(sources[i])
            out["n_chars"].append(len(new))
    table = pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        }
    )
    pq.write_table(table, OUT / "documents.parquet", compression="snappy")
    print(f"documents: {table.num_rows} rows")


def scale_embeddings() -> None:
    t = pq.read_table(SRC / "embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    labels = t["label"].to_pylist()
    all_ids, all_vecs, all_labels = [], [], []
    for r in range(REPLICAS):
        jit = (
            np.zeros_like(vecs)
            if r == 0
            else np.random.default_rng(r)
            .normal(0.0, 0.02, vecs.shape)
            .astype(np.float32)
        )
        all_ids.extend(i + r * ID_STEP for i in ids)
        all_vecs.append(vecs + jit)
        all_labels.extend(labels)
    flat = np.concatenate(all_vecs)
    table = pa.table(
        {
            "vec_id": pa.array(all_ids, pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in flat], pa.list_(pa.float32())
            ),
            "label": pa.array(all_labels, pa.int32()),
        }
    )
    pq.write_table(table, OUT / "embeddings.parquet", compression="snappy")
    print(f"embeddings: {table.num_rows} rows")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    scale_documents()
    scale_embeddings()
    for f in SRC.glob("*.parquet"):
        if f.stem in ("documents", "embeddings"):
            continue
        dst = OUT / f.name
        if not dst.exists():
            dst.symlink_to(f)
    print(f"sf1 tables ready under {OUT}")


if __name__ == "__main__":
    main()
