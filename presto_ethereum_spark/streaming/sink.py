"""Custom STREAMING SINK via the Python DataSource API: a transactional
JSONL writer with per-batch manifest commits.

The write-side counterpart of the chain stream readers (streaming/chain.py)
— together they close the Python DataSource API surface: batch read
(sources/rpc.py), stream read (simple + partitioned), and now stream write
with the two-phase commit contract Spark expects of an exactly-once sink:

- each TASK stages its partition to a uniquely-named file and reports it in
  a :class:`WriterCommitMessage`;
- the DRIVER's ``commit(messages, batchId)`` atomically publishes the batch
  by writing a manifest listing exactly the staged files (readers trust
  manifests, never directory listings);
- ``abort`` deletes the staged files, so failed batches leave no
  observable output.

A re-executed batch (failure after commit-fn return, before the offset log
records it) re-stages under fresh uuids and OVERWRITES its own manifest —
the manifest for a batch id is the single source of truth, so replays
cannot double-publish (the stale batch's orphaned staging files are never
referenced).  This is the same ledger design as a table format's
transaction log, reduced to one manifest per micro-batch.

Scale: tasks write in parallel straight to the target filesystem; the
driver handles only file NAMES.  The manifest directory is the only point
of coordination — one small JSON per batch.
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

__all__ = [
    "JsonlManifestDataSource",
    "manifested_files",
    "read_manifested",
    "compact_manifests",
]


@dataclasses.dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> _StagedFile:
        os.makedirs(f"{self.path}/_staging", exist_ok=True)
        out = f"{self.path}/_staging/{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(out, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(path=out, rows=n)

    def commit(self, messages, batchId: int) -> None:
        data_dir = f"{self.path}/data"
        os.makedirs(data_dir, exist_ok=True)
        os.makedirs(f"{self.path}/_manifests", exist_ok=True)
        published, rows = [], 0
        for m in messages:
            if m is None:
                continue
            final = f"{data_dir}/batch-{batchId}-{os.path.basename(m.path)}"
            os.replace(m.path, final)
            published.append(os.path.basename(final))
            rows += m.rows
        manifest = f"{self.path}/_manifests/batch-{batchId}.json"
        tmp = manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch": batchId, "files": published, "rows": rows}, fh)
        os.replace(tmp, manifest)  # atomic publish

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlManifestDataSource(DataSource):
    """``df.writeStream.format("jsonl_manifest").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def streamWriter(self, schema, overwrite: bool) -> _JsonlStreamWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_manifest sink requires a 'path' option")
        return _JsonlStreamWriter(path)


def _manifests(path: str) -> list[tuple[int, dict]]:
    mdir = f"{path}/_manifests"
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            with open(f"{mdir}/{name}") as fh:
                m = json.load(fh)
            out.append((int(m["batch"]), m))
    return sorted(out)


def manifested_files(path: str, upto_batch: int | None = None) -> list[str]:
    """The committed data files, per the manifests — the ONLY correct way
    to enumerate this sink's output (directory listings see orphaned
    stagings from aborted/replayed batches).  ``upto_batch`` reads the
    table AS OF that batch id (inclusive): time travel falls out of the
    ledger design for free, since each batch's manifest is immutable.

    A CHECKPOINT manifest (written by :func:`compact_manifests`) declares
    that its files cover every batch <= its id; readers skip older
    manifests whether or not they have been garbage-collected yet, so a
    compaction is atomic from a reader's point of view the moment the
    checkpoint manifest lands.  Time travel to a batch below the latest
    checkpoint is best-effort (it works until GC removes the superseded
    manifests — compaction collapses that history)."""
    ms = _manifests(path)
    ckpt = max(
        (b for b, m in ms if m.get("checkpoint")), default=None
    )
    out: list[str] = []
    for batch, m in ms:
        if upto_batch is not None and batch > upto_batch:
            continue
        if (
            ckpt is not None
            and (upto_batch is None or upto_batch >= ckpt)
            and batch <= ckpt
            and not m.get("checkpoint")
        ):
            continue  # superseded by the checkpoint
        out += [f"{path}/data/{f}" for f in m["files"]]
    return out


def read_manifested(spark, path: str, schema, upto_batch: int | None = None):
    """Read the sink's committed output back as a DataFrame (optionally AS
    OF ``upto_batch``)."""
    files = manifested_files(path, upto_batch)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def compact_manifests(spark, path: str, schema) -> int:
    """Small-file COMPACTION with snapshot semantics: rewrite all committed
    rows into one file, publish it as a CHECKPOINT manifest under the
    highest existing batch id (one atomic rename), then garbage-collect
    the superseded manifests and files.  The checkpoint flag — not the
    deletion — is what makes the swap atomic for readers: the moment the
    checkpoint manifest lands, ``manifested_files`` skips every older
    manifest whether or not GC has removed it yet, so a racing reader sees
    either the pre-compaction file set or exactly the checkpoint — never
    both.  Returns the number of manifests retired.

    (Micro-batch sinks accumulate one small file per task per trigger;
    periodic compaction is what keeps scan-time file counts bounded — the
    OPTIMIZE step of a lakehouse table, reduced to this ledger.)
    """
    import glob
    import shutil

    ms = _manifests(path)
    if len(ms) <= 1:
        return 0
    top_batch = ms[-1][0]
    old_files = manifested_files(path)
    df = read_manifested(spark, path, schema)
    n_rows = df.count()
    # the rewrite is a SPARK job (no driver materialization); one output
    # file here — a production compactor coalesces to target-size files
    stage_dir = f"{path}/_staging/compact-{uuid.uuid4().hex}"
    df.coalesce(1).write.mode("overwrite").json(stage_dir)
    part = glob.glob(f"{stage_dir}/part-*")[0]
    out = f"{path}/data/compact-{top_batch}-{uuid.uuid4().hex}.jsonl"
    os.replace(part, out)
    shutil.rmtree(stage_dir, ignore_errors=True)
    manifest = f"{path}/_manifests/batch-{top_batch}.json"
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "batch": top_batch,
                "files": [os.path.basename(out)],
                "rows": n_rows,
                "checkpoint": True,
            },
            fh,
        )
    os.replace(tmp, manifest)  # checkpoint live: readers now skip the rest
    retired = 0
    for batch, _ in ms[:-1]:
        os.remove(f"{path}/_manifests/batch-{batch}.json")
        retired += 1
    for f in old_files:
        if os.path.exists(f):
            os.remove(f)
    return retired
