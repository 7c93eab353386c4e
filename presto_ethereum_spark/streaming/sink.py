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

__all__ = ["JsonlManifestDataSource", "manifested_files", "read_manifested"]


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


def manifested_files(path: str) -> list[str]:
    """The committed data files, per the manifests — the ONLY correct way
    to enumerate this sink's output (directory listings see orphaned
    stagings from aborted/replayed batches)."""
    mdir = f"{path}/_manifests"
    if not os.path.isdir(mdir):
        return []
    out: list[str] = []
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(f"{mdir}/{name}") as fh:
            out += [f"{path}/data/{f}" for f in json.load(fh)["files"]]
    return out


def read_manifested(spark, path: str, schema):
    """Read the sink's committed output back as a DataFrame."""
    files = manifested_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
