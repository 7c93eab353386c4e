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
records it) re-stages under fresh uuids and OVERWRITES its own ``batch-N``
manifest — the manifest for a batch id is the single source of truth, so
replays cannot double-publish (the stale attempt's files are never
referenced).  CHECKPOINT manifests (written by :func:`compact_manifests`)
live in a separate ``checkpoint-N`` namespace that batch commits can never
touch: a replay of the batch id a compaction landed on rewrites only
``batch-N.json``, which readers skip as superseded — compacted history is
immune to replays by construction.  This is the same ledger design as a
table format's transaction log, reduced to one manifest per micro-batch.

Filesystem substrate: every metadata operation goes through ``pyarrow.fs``
(resolved from the path/URI), which serves local paths and object stores
(s3://, gs://, hdfs://) through one API — and, unlike the JVM-side Hadoop
FileSystem, is available inside executor tasks where ``write()`` runs.
The ONLY atomicity primitive the design needs is atomic single-object
publish of a manifest: on a local filesystem that is write-temp + rename;
on an object store it is the PUT that completes when the output stream
closes (readers see the whole object or none of it).  Data files need no
atomic rename at all — they are invisible until a manifest references
them — so the copy+delete "rename" of object stores is harmless here.

Scale: tasks write in parallel straight to the target filesystem; the
driver handles only file NAMES.  The manifest directory is the only point
of coordination — one small JSON per batch.
"""

from __future__ import annotations

import dataclasses
import json
import posixpath
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
    "vacuum",
]


#: scheme -> explicit FileSystem instance, consulted before
#: FileSystem.from_uri — the hook fsspec-backed stores (PyFileSystem +
#: FSSpecHandler) and object-store test doubles plug into.  Driver-side
#: metadata ops only; executor tasks re-resolve in their own process, so a
#: registered scheme must be re-registered there (or use a real URI).
_FS_SCHEMES: dict[str, object] = {}


def register_filesystem(scheme: str, fs) -> None:
    """Route ``scheme://`` paths to an explicit pyarrow ``FileSystem``."""
    _FS_SCHEMES[scheme] = fs


def _resolve(path: str):
    """(FileSystem, normalized root) for a local path or any pyarrow-
    supported URI.  Re-resolved per call so instances pickle cheaply to
    executors (a FileSystem handle is process-local)."""
    from pyarrow import fs as pafs

    if "://" in path:
        scheme, _, rest = path.partition("://")
        override = _FS_SCHEMES.get(scheme)
        if override is not None:
            return override, rest
        return pafs.FileSystem.from_uri(path)
    import os

    return pafs.LocalFileSystem(), os.path.abspath(path)


def _exists(fs, p: str) -> bool:
    from pyarrow.fs import FileType

    return fs.get_file_info(p).type != FileType.NotFound


def _publish_json(fs, final: str, obj: dict) -> None:
    """Atomic single-object publish of a manifest.  Local FS: temp +
    rename (readers never observe a torn file).  Object stores: a direct
    PUT — the object becomes visible atomically when the stream closes,
    and a temp+rename would be WEAKER there (copy+delete)."""
    from pyarrow import fs as pafs

    data = json.dumps(obj).encode()
    if isinstance(fs, pafs.LocalFileSystem):
        tmp = final + ".tmp"
        with fs.open_output_stream(tmp) as fh:
            fh.write(data)
        fs.move(tmp, final)
    else:
        with fs.open_output_stream(final) as fh:
            fh.write(data)


@dataclasses.dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> _StagedFile:
        fs, root = _resolve(self.path)
        fs.create_dir(f"{root}/_staging", recursive=True)
        out = f"{root}/_staging/{uuid.uuid4().hex}.jsonl"
        n = 0
        with fs.open_output_stream(out) as fh:
            for row in iterator:
                fh.write((json.dumps(row.asDict(), default=str) + "\n").encode())
                n += 1
        return _StagedFile(path=out, rows=n)

    def commit(self, messages, batchId: int) -> None:
        fs, root = _resolve(self.path)
        fs.create_dir(f"{root}/data", recursive=True)
        fs.create_dir(f"{root}/_manifests", recursive=True)
        published, rows = [], 0
        for m in messages:
            if m is None:
                continue
            name = f"batch-{batchId}-{posixpath.basename(m.path)}"
            fs.move(m.path, f"{root}/data/{name}")
            published.append(name)
            rows += m.rows
        _publish_json(
            fs,
            f"{root}/_manifests/batch-{batchId}.json",
            {"batch": batchId, "files": published, "rows": rows},
        )

    def abort(self, messages, batchId: int) -> None:
        fs, _ = _resolve(self.path)
        for m in messages:
            if m is not None and _exists(fs, m.path):
                fs.delete_file(m.path)


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


def _merge_intervals(intervals) -> list[list[int]]:
    """Sort + merge overlapping/adjacent [lo, hi] id intervals."""
    out: list[list[int]] = []
    for lo, hi in sorted((int(a), int(b)) for a, b in intervals):
        if out and lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return out


def _covered_intervals(m: dict) -> list[list[int]]:
    """Batch-id intervals a checkpoint manifest covers.  New manifests
    store compact ``covers_ranges`` [[lo, hi], ...] — batch ids are
    monotonically increasing, so a handful of merged intervals carries the
    same completeness information as the enumerated ``covers`` list older
    manifests wrote, without growing O(stream lifetime)."""
    if "covers_ranges" in m:
        return _merge_intervals(m["covers_ranges"])
    return _merge_intervals((i, i) for i in m.get("covers", []))


def _manifests(path: str):
    """-> (batches, checkpoints), each a sorted list of (id, manifest).
    Batch and checkpoint manifests live in disjoint name spaces
    (``batch-N.json`` / ``checkpoint-N.json``) so a replayed batch commit
    can never clobber compacted history."""
    from pyarrow import fs as pafs

    fs, root = _resolve(path)
    mdir = f"{root}/_manifests"
    batches: list[tuple[int, dict]] = []
    ckpts: list[tuple[int, dict]] = []
    for info in fs.get_file_info(pafs.FileSelector(mdir, allow_not_found=True)):
        name = posixpath.basename(info.path)
        if not name.endswith(".json"):
            continue
        with fs.open_input_stream(info.path) as fh:
            m = json.loads(fh.read())
        if m.get("checkpoint"):
            ckpts.append((int(m["batch"]), m))
        else:
            batches.append((int(m["batch"]), m))
    return sorted(batches), sorted(ckpts)


def manifested_files(path: str, upto_batch: int | None = None) -> list[str]:
    """The committed data files, per the manifests — the ONLY correct way
    to enumerate this sink's output (directory listings see orphaned
    stagings from aborted/replayed batches).  ``upto_batch`` reads the
    table AS OF that batch id (inclusive): time travel falls out of the
    ledger design for free, since each batch's manifest is immutable.

    A CHECKPOINT manifest (written by :func:`compact_manifests`) declares
    that its one file covers every batch id in its ``covers_ranges``
    intervals (older manifests: an enumerated ``covers`` list); readers
    serve the latest checkpoint at-or-below the target and lay newer batch
    manifests on top, skipping superseded ones whether or not GC removed
    them — so a compaction is atomic from a reader's point of view the
    moment the checkpoint manifest lands.  Time travel BELOW a checkpoint
    works while the superseded per-batch manifests still exist; once GC
    has collapsed that history the read RAISES rather than silently
    serving a partial answer (the covered intervals are the completeness
    referee)."""
    batches, ckpts = _manifests(path)
    bmap = dict(batches)
    if upto_batch is None:
        base = ckpts[-1] if ckpts else None
    else:
        eligible = [c for c in ckpts if c[0] <= upto_batch]
        base = eligible[-1] if eligible else None
    base_id = base[0] if base else None
    serve_ids = sorted(
        b
        for b in bmap
        if (base_id is None or b > base_id)
        and (upto_batch is None or b <= upto_batch)
    )
    if upto_batch is not None:
        # completeness: any NEWER checkpoint's covered intervals name the
        # batch ids that must still be servable from per-batch manifests.
        # Only the window (base_id, upto_batch] is ever expanded — the same
        # order of size as the manifests that would have to exist in it.
        newer = [c for c in ckpts if base_id is None or c[0] > base_id]
        needed: set[int] = set()
        for _, m in newer:
            for lo, hi in _covered_intervals(m):
                lo = max(lo, base_id + 1) if base_id is not None else lo
                hi = min(hi, upto_batch)
                if lo <= hi:
                    needed.update(range(lo, hi + 1))
        missing = needed - set(serve_ids)
        if missing:
            raise ValueError(
                f"cannot time-travel to batch {upto_batch}: batches "
                f"{sorted(missing)} were compacted away (their per-batch "
                f"manifests are gone); the oldest servable snapshot is the "
                f"checkpoint at batch {min(c[0] for c in newer)}"
            )
    files = list(base[1]["files"]) if base else []
    files += [f for i in serve_ids for f in bmap[i]["files"]]
    return [f"{path}/data/{f}" for f in files]


def read_manifested(spark, path: str, schema, upto_batch: int | None = None):
    """Read the sink's committed output back as a DataFrame (optionally AS
    OF ``upto_batch``)."""
    files = manifested_files(path, upto_batch)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def compact_manifests(
    spark, path: str, schema, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file COMPACTION with snapshot semantics: rewrite all committed
    rows into ~``target_bytes``-sized files (the OPTIMIZE file-size target;
    the output file count comes from the current committed bytes, measured
    from the live data files' sizes — one metadata listing, no data read),
    publish them as a CHECKPOINT manifest (its own
    ``checkpoint-N`` namespace — one atomic manifest publish), then
    garbage-collect the superseded manifests and files.  The checkpoint —
    not the deletion — is what makes the swap atomic for readers: the
    moment the checkpoint manifest lands, ``manifested_files`` skips every
    older manifest whether or not GC has removed it yet, so a racing
    reader sees either the pre-compaction file set or exactly the
    checkpoint — never both.  The checkpoint records the batch ids it
    folded in (``covers_ranges``), which is what lets later pre-checkpoint
    time-travel attempts fail loudly instead of returning partial data.
    Returns the number of manifests retired.

    (Micro-batch sinks accumulate one small file per task per trigger;
    periodic compaction is what keeps scan-time file counts bounded — the
    OPTIMIZE step of a lakehouse table, reduced to this ledger.)
    """
    from pyarrow import fs as pafs

    fs, root = _resolve(path)
    batches, ckpts = _manifests(path)
    prev = ckpts[-1] if ckpts else None
    prev_id = prev[0] if prev else None
    live = [(b, m) for b, m in batches if prev_id is None or b > prev_id]
    if not live or (len(live) + len(ckpts)) <= 1:
        return 0  # nothing to fold
    top_batch = live[-1][0]
    old_files = manifested_files(path)
    df = read_manifested(spark, path, schema)
    n_rows = df.count()
    covers_ranges = _merge_intervals(
        (_covered_intervals(prev[1]) if prev else [])
        + [(b, b) for b, _ in live]
    )
    # the rewrite is a SPARK job (no driver materialization); file count
    # targets ``target_bytes`` per output using the CURRENT committed
    # bytes (file metadata only)
    total_bytes = 0
    for f in old_files:
        _, fp = _resolve(f)
        info = fs.get_file_info(fp)
        if info.size is not None:
            total_bytes += info.size
    n_files = max(1, -(-total_bytes // max(1, int(target_bytes))))
    stage_dir = f"{path}/_staging/compact-{uuid.uuid4().hex}"
    df.repartition(n_files).write.mode("overwrite").json(stage_dir)
    _, stage_root = _resolve(stage_dir)
    parts = sorted(
        info.path
        for info in fs.get_file_info(pafs.FileSelector(stage_root))
        if posixpath.basename(info.path).startswith("part-")
    )
    out_names = []
    for i, part in enumerate(parts):
        out_name = f"compact-{top_batch}-{i}-{uuid.uuid4().hex}.jsonl"
        fs.move(part, f"{root}/data/{out_name}")
        out_names.append(out_name)
    fs.delete_dir_contents(stage_root, missing_dir_ok=True)
    fs.delete_dir(stage_root)
    _publish_json(
        fs,
        f"{root}/_manifests/checkpoint-{top_batch}.json",
        {
            "batch": top_batch,
            "files": out_names,
            "rows": n_rows,
            "checkpoint": True,
            "covers_ranges": covers_ranges,
        },
    )
    # checkpoint live: readers now skip the rest — GC is mere housekeeping
    retired = 0
    for b, _ in live:
        fs.delete_file(f"{root}/_manifests/batch-{b}.json")
        retired += 1
    if prev is not None:
        fs.delete_file(f"{root}/_manifests/checkpoint-{prev_id}.json")
        retired += 1
    for f in old_files:
        _, fp = _resolve(f)
        if _exists(fs, fp):
            fs.delete_file(fp)
    return retired


def vacuum(path: str, min_age_seconds: float = 3600.0) -> int:
    """Remove files no manifest references: stagings left by failed or
    speculative tasks, and data files from a batch attempt that was later
    replayed (the replay re-publishes under fresh uuids, orphaning the
    first attempt's files — including a replay that lands AFTER a
    compaction already folded the batch into a checkpoint, whose stale
    ``batch-N`` manifest is dropped here too).  Returns the number of
    files deleted.

    ``min_age_seconds`` is the race guard: a commit IN FLIGHT has staged
    files no manifest references yet, and an unconditional vacuum racing
    it would delete the batch out from under the commit.  Only files whose
    modification time is at least this old are eligible (default 1h — far
    longer than any stage-to-commit window), the same retention-window
    contract as a lakehouse VACUUM.  Pass 0 only when no stream is
    actively writing to ``path``."""
    import datetime

    from pyarrow import fs as pafs

    fs, root = _resolve(path)
    batches, ckpts = _manifests(path)
    ckpt_id = ckpts[-1][0] if ckpts else None
    deleted = 0

    def _old_enough(info) -> bool:
        if min_age_seconds <= 0:
            return True
        if info.mtime is None:
            # a store that reports no mtime can't prove the file is old;
            # with the age guard active, keep it (conservative)
            return False
        now = datetime.datetime.now(datetime.timezone.utc)
        mtime = info.mtime
        if mtime.tzinfo is None:
            mtime = mtime.replace(tzinfo=datetime.timezone.utc)
        return (now - mtime).total_seconds() >= min_age_seconds

    # stale batch manifests a replay re-published after compaction: already
    # superseded by the checkpoint ledger, safe at any age
    for b, _ in batches:
        if ckpt_id is not None and b <= ckpt_id:
            fs.delete_file(f"{root}/_manifests/batch-{b}.json")
            deleted += 1
    batches = [(b, m) for b, m in batches if ckpt_id is None or b > ckpt_id]
    referenced = {
        f for _, m in [*batches, *ckpts] for f in m["files"]
    }
    for info in fs.get_file_info(
        pafs.FileSelector(f"{root}/data", allow_not_found=True)
    ):
        if posixpath.basename(info.path) not in referenced and _old_enough(info):
            fs.delete_file(info.path)
            deleted += 1
    for info in fs.get_file_info(
        pafs.FileSelector(f"{root}/_staging", allow_not_found=True, recursive=True)
    ):
        from pyarrow.fs import FileType

        if info.type == FileType.File and _old_enough(info):
            fs.delete_file(info.path)
            deleted += 1
    return deleted
