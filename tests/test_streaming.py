"""Streaming tests: the chain-tail source must reproduce the batch block
table exactly; the windowed event aggregation must equal its batch
equivalent."""

import pytest
from pyspark.sql import functions as F

from presto_ethereum_spark.streaming.chain import EthereumStreamDataSource
from presto_ethereum_spark.streaming.events import run_windowed_counts
from tests.conftest import ETH_FIXTURES

CHAIN = str(ETH_FIXTURES / "chain_blocks.parquet")


def test_chain_stream_ingests_all_blocks(spark, chain_source, tmp_path):
    # availableNow falls back to a single micro-batch for Python streaming
    # sources, so size the batch to cover the chain for the equality check
    spark.dataSource.register(EthereumStreamDataSource)
    stream = (
        spark.readStream.format("ethereum-stream")
        .option("path", CHAIN)
        .option("max_blocks_per_batch", 3000)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("chain_tail")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = spark.table("chain_tail")
    want = chain_source.table("block")
    assert got.count() == 2400
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_chain_stream_multi_batch_progress(spark, tmp_path):
    import time

    spark.dataSource.register(EthereumStreamDataSource)
    stream = (
        spark.readStream.format("ethereum-stream")
        .option("path", CHAIN)
        .option("start_block", 1)
        .option("max_blocks_per_batch", 400)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("chain_tail_mb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mb"))
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table("chain_tail_mb").count() >= 2400:
            break
        time.sleep(1)
    q.stop()
    n = spark.table("chain_tail_mb").count()
    assert n == 2400, n
    # multiple micro-batches actually ran (offsets advanced incrementally)
    assert len(q.recentProgress) >= 2400 // 400


def test_partitioned_reader_matches_simple(spark, chain_source, tmp_path):
    """reader_mode=partitioned (executor-side DataSourceStreamReader) must
    reproduce the exact block table the simple driver-side reader serves —
    same offsets, parallel reads."""
    spark.dataSource.register(EthereumStreamDataSource)
    stream = (
        spark.readStream.format("ethereum-stream")
        .option("path", CHAIN)
        .option("max_blocks_per_batch", 3000)
        .option("blocks_per_partition", 500)
        .option("reader_mode", "partitioned")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("chain_tail_part")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_part"))
        .start()
    )
    q.awaitTermination()
    got = spark.table("chain_tail_part")
    want = chain_source.table("block")
    assert got.count() == 2400
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partitioned_reader_offset_and_partition_cutting(spark):
    from presto_ethereum_spark.streaming.chain import (
        EthereumPartitionedStreamReader,
    )

    r = EthereumPartitionedStreamReader(
        {"path": CHAIN, "start_block": 1, "max_blocks_per_batch": 1000,
         "blocks_per_partition": 300}
    )
    assert r.initialOffset() == {"next": 1}
    # rate-limited advance: 1000 blocks per trigger, capped at head+1
    assert r.latestOffset() == {"next": 1001}
    assert r.latestOffset() == {"next": 2001}
    assert r.latestOffset() == {"next": 2401}
    assert r.latestOffset() == {"next": 2401}  # caught up
    parts = r.partitions({"next": 1}, {"next": 1001})
    assert [(p.start, p.end) for p in parts] == [
        (1, 300), (301, 600), (601, 900), (901, 1000),
    ]
    rows = list(r.read(parts[0]))
    assert len(rows) == 300 and rows[0][0] == 1


def test_chain_stream_resumes_from_offset(spark):
    from presto_ethereum_spark.streaming.chain import EthereumStreamReader

    r = EthereumStreamReader({"path": CHAIN, "start_block": 100, "max_blocks_per_batch": 50})
    assert r.initialOffset() == {"next": 100}
    rows, nxt = r.read({"next": 100})
    rows = list(rows)
    assert len(rows) == 50 and nxt == {"next": 150}
    assert rows[0][0] == 100  # block_number of first row
    # replay between offsets is deterministic
    replay = list(r.readBetweenOffsets({"next": 100}, {"next": 150}))
    assert replay == rows
    # caught-up tail returns empty batch and unchanged offset
    rows2, nxt2 = r.read({"next": 2401})
    assert list(rows2) == [] and nxt2 == {"next": 2401}


def test_windowed_counts_match_batch(spark):
    sf_dir = "/root/testdata/sf0.001"
    streamed = run_windowed_counts(spark, sf_dir, window="1 hour")
    from presto_ethereum_spark.plans.battery import t

    ev = t(spark, sf_dir, "events")
    batch = (
        ev.withColumn("event_time", F.timestamp_micros(F.expr("ts DIV 1000")))
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("avg_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    assert streamed.count() > 100


def test_stateful_sessionization_matches_batch(spark):
    """applyInPandasWithState sessionization must agree with the batch
    sessionize operator (aggregated per session)."""
    from presto_ethereum_spark.operators.temporal import sessionize
    from presto_ethereum_spark.streaming.events import run_sessionized

    sf_dir = "/root/testdata/sf0.001"
    streamed = run_sessionized(spark, sf_dir, gap_us=3_600_000_000)
    from presto_ethereum_spark.plans.battery import t

    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    batch = (
        sessionize(ev, key="user_id", time_col="t_us", gap=3_600_000_000,
                   order_tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.min("t_us").alias("session_start_us"),
            F.max("t_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_checkpoint_survives_reader_mode_switch(spark, tmp_path):
    """The partitioned reader's offsets are the same {"next": n} dicts as
    the simple reader's, so a checkpointed stream can RESTART in the other
    mode and continue from where it stopped — no gap, no replay."""
    import time

    spark.dataSource.register(EthereumStreamDataSource)
    ckpt = str(tmp_path / "ckpt_switch")
    out = str(tmp_path / "out_switch")  # file sink: exactly-once on restart

    def run(mode, stop_at):
        stream = (
            spark.readStream.format("ethereum-stream")
            .option("path", CHAIN)
            .option("start_block", 1)
            .option("max_blocks_per_batch", 300)
            .option("reader_mode", mode)
            .load()
        )
        q = (
            stream.select("block_number")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if n >= stop_at:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination()
        return spark.read.parquet(out)

    first = run("simple", stop_at=300)
    n_first = first.count()
    assert 0 < n_first < 2400  # stopped mid-chain
    second = run("partitioned", stop_at=2400)
    # the restart continued from the committed offset in the OTHER mode;
    # the file sink's commit log makes the result exactly-once, so full
    # contiguous coverage with zero duplicates proves the offsets carried
    assert second.count() == 2400
    got = sorted(r.block_number for r in second.collect())
    assert got == list(range(1, 2401))


class TestForeachBatchUpsert:
    def test_multibatch_merge_equals_batch_argmax(self, spark, tmp_path):
        """Two files fed one-per-trigger force >= 2 micro-batches: the
        generation-merge path must produce the same per-key latest state as
        a single batch arg-max over the union."""
        import pandas as pd

        from presto_ethereum_spark.streaming.events import (
            run_foreachbatch_upsert,
        )

        src = tmp_path / "in"
        src.mkdir()
        # user 1 updated in both files (later wins), user 2 only in f1,
        # user 3 ties on t_us across files (event_id breaks the tie)
        f1 = pd.DataFrame(
            {"user_id": [1, 2, 3], "t_us": [10, 5, 7],
             "event_id": [100, 101, 102], "value": [1.0, 2.0, 3.0]}
        )
        f2 = pd.DataFrame(
            {"user_id": [1, 3], "t_us": [20, 7],
             "event_id": [103, 104], "value": [9.0, 4.0]}
        )
        f1.to_parquet(src / "a.parquet")
        f2.to_parquet(src / "b.parquet")
        schema = "user_id long, t_us long, event_id long, value double"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = run_foreachbatch_upsert(spark, sf_dir="", source=stream)
        got = {r["user_id"]: (r["last_t_us"], r["last_event_id"], r["last_value"])
               for r in out.collect()}
        assert got == {1: (20, 103, 9.0), 2: (5, 101, 2.0), 3: (7, 104, 4.0)}


class TestJsonlManifestSink:
    def test_commit_manifests_and_readback(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.sink import (
            JsonlManifestDataSource,
            manifested_files,
            read_manifested,
        )

        spark.dataSource.register(JsonlManifestDataSource)
        src = tmp_path / "in"
        src.mkdir()
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}).to_parquet(
            src / "f1.parquet"
        )
        pd.DataFrame({"k": [4, 5], "v": ["d", "e"]}).to_parquet(src / "f2.parquet")
        out = str(tmp_path / "out")
        stream = (
            spark.readStream.schema("k long, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream.writeStream.format("jsonl_manifest")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # one manifest per micro-batch, files published under data/
        import os

        manifests = sorted(os.listdir(f"{out}/_manifests"))
        assert len(manifests) >= 2  # one file per trigger -> >= 2 batches
        # a stray orphaned staging file must be invisible to readers
        os.makedirs(f"{out}/_staging", exist_ok=True)
        with open(f"{out}/_staging/orphan.jsonl", "w") as fh:
            fh.write('{"k": 99, "v": "zz"}\n')
        files = manifested_files(out)
        assert all("orphan" not in f for f in files)
        back = read_manifested(spark, out, "k long, v string")
        got = sorted((r["k"], r["v"]) for r in back.collect())
        assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]


class TestManifestTimeTravelAndCompaction:
    def _write_batches(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.sink import JsonlManifestDataSource

        spark.dataSource.register(JsonlManifestDataSource)
        src = tmp_path / "in"
        src.mkdir()
        pd.DataFrame({"k": [1, 2]}).to_parquet(src / "a.parquet")
        pd.DataFrame({"k": [3]}).to_parquet(src / "b.parquet")
        out = str(tmp_path / "out")
        q = (
            spark.readStream.schema("k long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.format("jsonl_manifest")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return out

    def test_as_of_batch_read(self, spark, tmp_path):
        from presto_ethereum_spark.streaming.sink import read_manifested

        out = self._write_batches(spark, tmp_path)
        full = {r["k"] for r in read_manifested(spark, out, "k long").collect()}
        asof0 = {
            r["k"]
            for r in read_manifested(spark, out, "k long", upto_batch=0).collect()
        }
        assert full == {1, 2, 3}
        assert asof0 in ({1, 2}, {3})  # batch 0 is one of the two files
        assert len(asof0) < len(full)

    def test_compaction_preserves_rows_and_drops_manifests(self, spark, tmp_path):
        import os

        from presto_ethereum_spark.streaming.sink import (
            compact_manifests,
            read_manifested,
        )

        out = self._write_batches(spark, tmp_path)
        before = sorted(r["k"] for r in read_manifested(spark, out, "k long").collect())
        retired = compact_manifests(spark, out, "k long")
        assert retired >= 1
        after = sorted(r["k"] for r in read_manifested(spark, out, "k long").collect())
        assert after == before == [1, 2, 3]
        assert len(os.listdir(f"{out}/_manifests")) == 1
        assert len(os.listdir(f"{out}/data")) == 1

    def test_checkpoint_supersedes_stale_manifests(self, spark, tmp_path):
        """A reader racing GC sees the checkpoint + leftover old manifests;
        the checkpoint must supersede them (no double counting, no reads
        of since-deleted files)."""
        import json

        from presto_ethereum_spark.streaming.sink import (
            compact_manifests,
            read_manifested,
        )

        out = self._write_batches(spark, tmp_path)
        compact_manifests(spark, out, "k long")
        # simulate the race: a superseded manifest still on disk, its data
        # file already gone
        with open(f"{out}/_manifests/batch-0.json", "w") as fh:
            json.dump({"batch": 0, "files": ["batch-0-deadbeef.jsonl"], "rows": 2}, fh)
        got = sorted(r["k"] for r in read_manifested(spark, out, "k long").collect())
        assert got == [1, 2, 3]


class TestManifestReplayAndVacuum:
    def _write_batches(self, spark, tmp_path):
        return TestManifestTimeTravelAndCompaction._write_batches(
            self, spark, tmp_path
        )

    def test_replay_after_compaction_cannot_clobber_checkpoint(
        self, spark, tmp_path
    ):
        """Failure after commit but before the offset log records the batch,
        then restart after a compaction ran: the replayed commit rewrites
        batch-N.json, which lives in a DIFFERENT namespace than the
        checkpoint manifest — compacted history stays intact and the
        replayed rows are not double-served."""
        import json as _json
        import os

        from presto_ethereum_spark.streaming.sink import (
            compact_manifests,
            read_manifested,
        )

        out = self._write_batches(spark, tmp_path)
        compact_manifests(spark, out, "k long")
        [ckpt_name] = os.listdir(f"{out}/_manifests")
        assert ckpt_name.startswith("checkpoint-")
        top = int(ckpt_name.split("-")[1].split(".")[0])
        # simulate the replay of the top batch: a fresh commit of batch-{top}
        # publishing new uuids (exactly what _JsonlStreamWriter.commit does)
        with open(f"{out}/data/batch-{top}-replayed.jsonl", "w") as fh:
            fh.write('{"k": 3}\n')
        with open(f"{out}/_manifests/batch-{top}.json", "w") as fh:
            _json.dump(
                {"batch": top, "files": [f"batch-{top}-replayed.jsonl"], "rows": 1},
                fh,
            )
        got = sorted(r["k"] for r in read_manifested(spark, out, "k long").collect())
        assert got == [1, 2, 3]  # checkpoint intact, no double count

    def test_time_travel_below_gced_checkpoint_raises(self, spark, tmp_path):
        """After GC removes the pre-checkpoint manifests, AS-OF a batch
        below the checkpoint must fail loudly, never return a partial or
        empty frame that looks like an answer."""
        import pytest as _pytest

        from presto_ethereum_spark.streaming.sink import (
            compact_manifests,
            read_manifested,
        )

        out = self._write_batches(spark, tmp_path)
        # pre-compaction AS-OF works
        assert read_manifested(spark, out, "k long", upto_batch=0).count() >= 1
        compact_manifests(spark, out, "k long")
        with _pytest.raises(ValueError, match="compacted away"):
            read_manifested(spark, out, "k long", upto_batch=0)
        # AS-OF at/above the checkpoint still serves
        batches_total = {
            r["k"] for r in read_manifested(spark, out, "k long").collect()
        }
        assert batches_total == {1, 2, 3}

    def test_vacuum_removes_orphans_only(self, spark, tmp_path):
        import json as _json
        import os

        from presto_ethereum_spark.streaming.sink import (
            compact_manifests,
            read_manifested,
            vacuum,
        )

        out = self._write_batches(spark, tmp_path)
        compact_manifests(spark, out, "k long")
        [ckpt_name] = os.listdir(f"{out}/_manifests")
        top = int(ckpt_name.split("-")[1].split(".")[0])
        # orphan sources: a failed task's staging file, an unreferenced
        # data file, and a stale replayed batch manifest + its file
        os.makedirs(f"{out}/_staging", exist_ok=True)
        with open(f"{out}/_staging/speculative.jsonl", "w") as fh:
            fh.write('{"k": 99}\n')
        with open(f"{out}/data/unreferenced.jsonl", "w") as fh:
            fh.write('{"k": 98}\n')
        with open(f"{out}/data/batch-{top}-replayed.jsonl", "w") as fh:
            fh.write('{"k": 3}\n')
        with open(f"{out}/_manifests/batch-{top}.json", "w") as fh:
            _json.dump(
                {"batch": top, "files": [f"batch-{top}-replayed.jsonl"], "rows": 1},
                fh,
            )
        # age guard: every orphan is seconds old, so a default (1h) vacuum
        # must leave data/staging files alone — only the stale superseded
        # manifest (checkpoint-ledger-proven garbage) goes at any age
        assert vacuum(out) == 1
        assert os.path.exists(f"{out}/_staging/speculative.jsonl")
        assert os.path.exists(f"{out}/data/unreferenced.jsonl")
        # min_age_seconds=0 = "no stream is writing": full cleanup
        n = vacuum(out, min_age_seconds=0)
        assert n == 3  # staging + unreferenced + replayed file
        assert sorted(os.listdir(f"{out}/_manifests")) == [ckpt_name]
        got = sorted(r["k"] for r in read_manifested(spark, out, "k long").collect())
        assert got == [1, 2, 3]
        # idempotent: nothing left to clean
        assert vacuum(out, min_age_seconds=0) == 0

    def test_vacuum_age_guard_spares_inflight_staging(self, spark, tmp_path):
        """A staged-but-uncommitted file (a commit in flight) survives a
        default vacuum; an OLD orphan with the same shape is collected."""
        import os
        import time

        from presto_ethereum_spark.streaming.sink import vacuum

        out = self._write_batches(spark, tmp_path)
        os.makedirs(f"{out}/_staging", exist_ok=True)
        fresh = f"{out}/_staging/inflight.jsonl"
        stale = f"{out}/_staging/crashed-last-week.jsonl"
        for fp in (fresh, stale):
            with open(fp, "w") as fh:
                fh.write('{"k": 0}\n')
        week_ago = time.time() - 7 * 24 * 3600
        os.utime(stale, (week_ago, week_ago))
        assert vacuum(out) == 1  # only the old orphan
        assert os.path.exists(fresh) and not os.path.exists(stale)


class TestErc20StreamTable:
    """table=erc20 on the chain stream source: micro-batches ride the bulk
    eth_getLogs path (one filtered call per range), decoded by the same
    per-log rules as the batch scan."""

    def _drain(self, spark, **opts):
        import uuid

        from presto_ethereum_spark.streaming.chain import (
            EthereumStreamDataSource,
        )

        spark.dataSource.register(EthereumStreamDataSource)
        r = (
            spark.readStream.format("ethereum-stream")
            .option("path", "fixtures/eth/chain_blocks.parquet")
            .option("table", "erc20")
            # availableNow = ONE micro-batch for Python stream readers
            # (see test_chain_stream, line 16) -> cover the fixture chain
            .option("max_blocks_per_batch", 3000)
        )
        for k, v in opts.items():
            r = r.option(k, v)
        sink = "erc20s_" + uuid.uuid4().hex[:8]
        q = (
            r.load()
            .writeStream.format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(sink).localCheckpoint(eager=True)
        spark.catalog.dropTempView(sink)
        return out

    @pytest.mark.parametrize("mode", ["simple", "partitioned"])
    def test_stream_equals_golden(self, spark, mode):
        got = self._drain(spark, reader_mode=mode)
        golden = spark.read.parquet("fixtures/eth/erc20.parquet")
        assert got.exceptAll(golden).count() == 0
        assert golden.exceptAll(got).count() == 0

    def test_address_filter_narrows(self, spark):
        token = "0x1F573D6Fb3F13D689fF844B4cE37794D79a7fF1C"
        got = self._drain(spark, logs_address=token)
        from presto_ethereum_spark.constants import lookup_token

        assert got.count() >= 1
        assert {r["erc20_token"] for r in got.collect()} == {lookup_token(token)}

    def test_multi_batch_tail_equals_golden(self, spark, tmp_path):
        """Micro-batch cadence (400 blocks/trigger): the tailing path must
        converge to the same row set as one big batch."""
        import time
        import uuid

        from presto_ethereum_spark.streaming.chain import (
            EthereumStreamDataSource,
        )

        spark.dataSource.register(EthereumStreamDataSource)
        golden = spark.read.parquet("fixtures/eth/erc20.parquet")
        want = golden.count()
        sink = "erc20mb_" + uuid.uuid4().hex[:8]
        q = (
            spark.readStream.format("ethereum-stream")
            .option("path", "fixtures/eth/chain_blocks.parquet")
            .option("table", "erc20")
            .option("max_blocks_per_batch", 400)
            .load()
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "erc20_ckpt"))
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(sink).count() >= want:
                break
            time.sleep(1)
        q.stop()
        got = spark.table(sink)
        assert got.exceptAll(golden).count() == 0
        assert golden.exceptAll(got).count() == 0
        assert len(q.recentProgress) >= 2400 // 400
        spark.catalog.dropTempView(sink)

    def test_unknown_table_rejected(self, spark):
        from presto_ethereum_spark.streaming.chain import (
            EthereumStreamDataSource,
        )

        spark.dataSource.register(EthereumStreamDataSource)
        with pytest.raises(Exception, match="block\\|erc20"):
            (
                spark.readStream.format("ethereum-stream")
                .option("path", "fixtures/eth/chain_blocks.parquet")
                .option("table", "transaction")
                .load()
            )


def test_erc20_stream_bisects_capped_ranges(spark, monkeypatch):
    """The streaming erc20 tail must split node-capped getLogs ranges like
    the batch path (a stream that cannot split replays the same failing
    range forever)."""
    from presto_ethereum_spark.sources.rpc import ParquetChainTransport, RpcError
    from presto_ethereum_spark.streaming.chain import _table_rows
    from presto_ethereum_spark.schemas import SCHEMAS

    inner = ParquetChainTransport("fixtures/eth/chain_blocks.parquet")
    calls = []
    real = inner.get_logs

    def capped(start, end, topic0=None, addresses=None):
        calls.append((start, end))
        if end - start + 1 > 100:
            raise RpcError(-32005, "query returned more than 10000 results")
        return real(start, end, topic0, addresses)

    inner.get_logs = capped
    cols = [f.name for f in SCHEMAS["erc20"].fields]
    rows = _table_rows(inner, "erc20", 1, 400, cols)
    golden = spark.read.parquet("fixtures/eth/erc20.parquet").where(
        "erc20_blocknumber BETWEEN 1 AND 400"
    )
    assert len(rows) == golden.count() > 0
    assert any(e - s + 1 > 100 for s, e in calls)  # the cap actually fired


def test_compaction_targets_file_size(spark, tmp_path):
    """A tiny target_bytes must fan the checkpoint out to multiple files
    (production OPTIMIZE shape) with identical content."""
    import os

    from presto_ethereum_spark.streaming.sink import (
        compact_manifests,
        read_manifested,
    )

    out = TestManifestTimeTravelAndCompaction._write_batches(None, spark, tmp_path)
    before = sorted(r["k"] for r in read_manifested(spark, out, "k long").collect())
    compact_manifests(spark, out, "k long", target_bytes=8)  # ~1 row/file
    files = os.listdir(f"{out}/data")
    assert len(files) > 1 and all(f.startswith("compact-") for f in files)
    after = sorted(r["k"] for r in read_manifested(spark, out, "k long").collect())
    assert after == before == [1, 2, 3]


def test_erc20_tail_through_manifest_sink(spark, tmp_path):
    """Full streaming pipeline: chain source (table=erc20, bulk getLogs)
    -> transactional manifest sink -> manifest readback equals the golden
    batch table — source and sink exactly-once semantics composing."""
    from presto_ethereum_spark.streaming.chain import EthereumStreamDataSource
    from presto_ethereum_spark.streaming.sink import (
        JsonlManifestDataSource,
        read_manifested,
    )

    spark.dataSource.register(EthereumStreamDataSource)
    spark.dataSource.register(JsonlManifestDataSource)
    out = str(tmp_path / "erc20_ledger")
    q = (
        spark.readStream.format("ethereum-stream")
        .option("path", "fixtures/eth/chain_blocks.parquet")
        .option("table", "erc20")
        .option("max_blocks_per_batch", 3000)
        .load()
        .writeStream.format("jsonl_manifest")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    schema = (
        "erc20_token string, erc20_from string, erc20_to string, "
        "erc20_value double, erc20_txhash string, erc20_blocknumber bigint"
    )
    back = read_manifested(spark, out, schema)
    golden = spark.read.parquet("fixtures/eth/erc20.parquet")
    assert back.exceptAll(golden).count() == 0
    assert golden.exceptAll(back).count() == 0


class TestConfirmationDepth:
    """confirmations=k lags ingestion k blocks behind head so reorg-able
    blocks are never committed (a stream, unlike the batch connector's
    per-query head resolve in EthereumSplitManager.java:51-57, can never
    re-read a committed offset)."""

    class _Recording:
        def __init__(self, inner):
            self.inner = inner
            self.fetched: list[int] = []

        def block_number(self):
            return self.inner.block_number()

        def get_blocks(self, nums):
            self.fetched.extend(nums)
            return self.inner.get_blocks(nums)

    def test_simple_reader_never_fetches_above_cap(self):
        from presto_ethereum_spark.streaming.chain import EthereumStreamReader

        r = EthereumStreamReader(
            {"path": CHAIN, "start_block": 2380,
             "max_blocks_per_batch": 1000, "confirmations": 6}
        )
        r.transport = self._Recording(r.transport)
        head = r.transport.block_number()  # fixture head = 2400
        rows, nxt = r.read({"next": 2380})
        rows = list(rows)
        assert nxt == {"next": head + 1 - 6}
        assert len(rows) == (head - 6) - 2380 + 1
        # the contract: no block above head - k is ever requested
        assert max(r.transport.fetched) == head - 6
        # caught up at the lagged cap: empty batch, offset unchanged
        rows2, nxt2 = r.read(nxt)
        assert list(rows2) == [] and nxt2 == nxt

    def test_partitioned_reader_caps_latest_offset(self):
        from presto_ethereum_spark.streaming.chain import (
            EthereumPartitionedStreamReader,
        )

        r = EthereumPartitionedStreamReader(
            {"path": CHAIN, "start_block": 2300,
             "max_blocks_per_batch": 1000, "confirmations": 10}
        )
        head = r.transport.block_number()
        assert r.latestOffset() == {"next": head + 1 - 10}
        assert r.latestOffset() == {"next": head + 1 - 10}  # stays lagged
        parts = r.partitions({"next": 2300}, {"next": head + 1 - 10})
        assert max(p.end for p in parts) == head - 10

    def test_offset_never_regresses_when_depth_exceeds_progress(self):
        # a floor already above head - k must not move backward (dict
        # offsets compare by equality; a regression re-reads committed
        # blocks)
        from presto_ethereum_spark.streaming.chain import (
            EthereumPartitionedStreamReader,
        )

        r = EthereumPartitionedStreamReader(
            {"path": CHAIN, "start_block": 2399,
             "max_blocks_per_batch": 1000, "confirmations": 50}
        )
        head = r.transport.block_number()
        assert r.latestOffset() == {"next": 2399}  # head-50 < floor: hold
        r._raise_floor(head + 1)  # simulate restart from a k=0 checkpoint
        assert r.latestOffset() == {"next": head + 1}

    def test_negative_confirmations_rejected(self):
        from presto_ethereum_spark.streaming.chain import (
            EthereumPartitionedStreamReader,
            EthereumStreamReader,
        )

        with pytest.raises(ValueError, match="confirmations"):
            EthereumStreamReader({"path": CHAIN, "confirmations": -1})
        with pytest.raises(ValueError, match="confirmations"):
            EthereumPartitionedStreamReader({"path": CHAIN, "confirmations": -1})


class TestNonLocalFilesystemSink:
    """The manifest sink's metadata layer against a NON-local pyarrow
    FileSystem (pyarrow's in-memory mock, routed through the scheme
    registry): exercises the object-store branches LocalFileSystem tests
    never reach — the direct-PUT manifest publish (no temp+rename), task
    stage + fs.move promotion, ledger reads, time-travel completeness, and
    the vacuum age guard on store-reported mtimes.  The one step that
    stays engine-side is compaction's Spark data rewrite (the JVM can't
    mount a Python FileSystem); its fs operations (size listing, move,
    delete) are the same ones covered here."""

    @pytest.fixture()
    def mockfs(self):
        from pyarrow.fs import _MockFileSystem

        from presto_ethereum_spark.streaming import sink as snk

        fs = _MockFileSystem()
        snk.register_filesystem("mock", fs)
        yield fs
        snk._FS_SCHEMES.pop("mock", None)

    def _commit_batch(self, writer, batch_id, rows):
        from pyspark.sql import Row

        msg = writer.write(iter([Row(k=v) for v in rows]))
        writer.commit([msg], batch_id)

    def test_stage_commit_publish_and_readback(self, mockfs):
        from pyarrow.fs import FileSelector

        from presto_ethereum_spark.streaming.sink import (
            _JsonlStreamWriter,
            manifested_files,
        )

        w = _JsonlStreamWriter("mock://table")
        self._commit_batch(w, 0, [1, 2])
        self._commit_batch(w, 1, [3])
        # PUT-branch publish: the manifest object exists whole, and no
        # .tmp sibling was ever created in the namespace
        names = sorted(
            p.path.rsplit("/", 1)[-1]
            for p in mockfs.get_file_info(FileSelector("table/_manifests"))
        )
        assert names == ["batch-0.json", "batch-1.json"]
        assert not any(n.endswith(".tmp") for n in names)
        # staged files were MOVED into data/ (no stale staging copies)
        assert [
            p.path for p in mockfs.get_file_info(FileSelector("table/_staging"))
        ] == []
        files = manifested_files("mock://table")
        assert len(files) == 2 and all(f.startswith("mock://table/data/") for f in files)
        # rows are intact through the non-local read path
        got = []
        for f in files:
            with mockfs.open_input_stream(f.replace("mock://", "")) as fh:
                got += [int(line.split(b":")[1].rstrip(b"}\n")) for line in fh.read().splitlines()]
        assert sorted(got) == [1, 2, 3]

    def test_replayed_commit_overwrites_manifest_atomically(self, mockfs):
        from presto_ethereum_spark.streaming.sink import (
            _JsonlStreamWriter,
            manifested_files,
        )

        w = _JsonlStreamWriter("mock://table")
        self._commit_batch(w, 0, [1, 2])
        first = set(manifested_files("mock://table"))
        # a replay of batch 0 re-stages under fresh uuids and re-PUTs the
        # same manifest object — readers must see exactly the new file set
        self._commit_batch(w, 0, [1, 2])
        second = set(manifested_files("mock://table"))
        assert len(second) == 1 and first.isdisjoint(second)

    def test_abort_deletes_staged_files(self, mockfs):
        from pyspark.sql import Row

        from presto_ethereum_spark.streaming.sink import (
            _JsonlStreamWriter,
            manifested_files,
        )

        w = _JsonlStreamWriter("mock://table")
        msg = w.write(iter([Row(k=9)]))
        w.abort([msg], 0)
        assert manifested_files("mock://table") == []
        assert not mockfs.get_file_info(msg.path).size

    def test_checkpoint_ledger_and_time_travel_raise(self, mockfs):
        from presto_ethereum_spark.streaming.sink import (
            _JsonlStreamWriter,
            _publish_json,
            manifested_files,
        )

        w = _JsonlStreamWriter("mock://table")
        for b in range(3):
            self._commit_batch(w, b, [b])
        # hand-publish the checkpoint the compaction job would write, with
        # interval coverage, then GC the per-batch history
        with mockfs.open_output_stream("table/data/compact-2-0.jsonl") as fh:
            fh.write(b'{"k": 0}\n{"k": 1}\n{"k": 2}\n')
        _publish_json(
            mockfs,
            "table/_manifests/checkpoint-2.json",
            {"batch": 2, "files": ["compact-2-0.jsonl"], "rows": 3,
             "checkpoint": True, "covers_ranges": [[0, 2]]},
        )
        for b in range(3):
            mockfs.delete_file(f"table/_manifests/batch-{b}.json")
        assert manifested_files("mock://table") == [
            "mock://table/data/compact-2-0.jsonl"
        ]
        with pytest.raises(ValueError, match="compacted away"):
            manifested_files("mock://table", upto_batch=1)

    def test_vacuum_on_mock_store_respects_age_guard(self, mockfs):
        from presto_ethereum_spark.streaming.sink import (
            _JsonlStreamWriter,
            vacuum,
        )

        w = _JsonlStreamWriter("mock://table")
        self._commit_batch(w, 0, [1])
        with mockfs.open_output_stream("table/data/orphan.jsonl") as fh:
            fh.write(b'{"k": 5}\n')
        with mockfs.open_output_stream("table/_staging/crashed.jsonl") as fh:
            fh.write(b'{"k": 6}\n')
        # store-reported mtimes are seconds old: the default window keeps
        # both orphans
        assert vacuum("mock://table") == 0
        assert vacuum("mock://table", min_age_seconds=0) == 2
        from pyarrow.fs import FileSelector

        remaining = [
            p.path for p in mockfs.get_file_info(FileSelector("table/data"))
        ]
        assert remaining == ["table/data/batch-0-" + remaining[0].rsplit("-", 1)[-1]]


class TestRescanReorged:
    def test_detects_only_forked_heights(self, spark):
        from pyspark.sql import functions as F

        from presto_ethereum_spark.streaming.chain import rescan_reorged

        ingested = spark.read.parquet("fixtures/eth/block.parquet").select(
            "block_number", "block_hash"
        )
        # simulate: our sink holds hashes from a branch that lost — heights
        # 2395..2397 differ from what the chain now says
        forked = ingested.withColumn(
            "block_hash",
            F.when(
                F.col("block_number").between(2395, 2397),
                F.concat(F.col("block_hash"), F.lit("-orphan")),
            ).otherwise(F.col("block_hash")),
        )
        out = rescan_reorged(
            spark, forked, {"path": CHAIN}, depth=50
        ).collect()
        assert [r["block_number"] for r in out] == [2395, 2396, 2397]
        assert all(r["ingested_hash"].endswith("-orphan") for r in out)
        assert all(not r["chain_hash"].endswith("-orphan") for r in out)

    def test_clean_history_and_empty_input(self, spark):
        from presto_ethereum_spark.streaming.chain import rescan_reorged

        ingested = spark.read.parquet("fixtures/eth/block.parquet").select(
            "block_number", "block_hash"
        )
        assert rescan_reorged(spark, ingested, {"path": CHAIN}, depth=20).count() == 0
        empty = ingested.where("block_number < 0")
        assert rescan_reorged(spark, empty, {"path": CHAIN}).count() == 0


class TestStreamQualityGate:
    def test_matches_batch_counts(self, spark):
        from presto_ethereum_spark.streaming.events import run_quality_gate

        sfd = "/root/testdata/sf0.001"
        out = {r.rule: r for r in run_quality_gate(spark, sfd).collect()}
        ev = spark.read.parquet(f"{sfd}/events.parquet")
        n = ev.count()
        assert set(out) == {"value_in_range", "type_domain", "user_not_null"}
        assert all(r.n_rows == n for r in out.values())
        # batch replicas of the same rules
        assert out["user_not_null"].n_violations == ev.where(
            F.col("user_id").isNull()
        ).count()
        assert out["value_in_range"].n_violations == ev.where(
            ~F.col("value").between(0.0, 1000.0) | F.col("value").isNull()
        ).count()


class TestStreamKmvDistinct:
    """Split-invariance proof for the streaming KMV sketch: a window whose
    rows span two micro-batches must settle to the same sketch a single
    batch produces (KMV merge is commutative/associative), and the settled
    estimator must equal the pure-Python md5 replica bit-for-bit."""

    def test_multi_batch_split_invariance(self, spark, tmp_path):
        import hashlib

        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_kmv_distinct

        hour = 3_600_000_000
        # window 0 spans BOTH files (the state merge under test), with a
        # duplicate inside file 1 (user 2) and across files (user 3);
        # window 1 lives in file 2 only
        f1 = pd.DataFrame({"user_id": [1, 2, 3, 2], "t_us": [10, 20, 30, 40]})
        f2 = pd.DataFrame({"user_id": [3, 4, 5], "t_us": [50, 60, hour + 10]})
        src = tmp_path / "in"
        src.mkdir()
        f1.to_parquet(src / "a.parquet")
        f2.to_parquet(src / "b.parquet")
        stream = (
            spark.readStream.schema("user_id long, t_us long")
            .option("maxFilesPerTrigger", 1)  # 2 files -> 2 micro-batches
            .parquet(str(src))
        )
        out = {
            r.window_start: r
            for r in run_kmv_distinct(spark, "", k=3, source=stream).collect()
        }

        def h60(v):
            return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

        assert set(out) == {0, 3600}
        w0, w1 = out[0], out[3600]
        # window 0: 6 rows, 4 distinct users -> sketch caps at k=3
        top3 = sorted({h60(u) for u in (1, 2, 3, 4)})[:3]
        assert (w0.n_events, w0.n_sk) == (6, 3)
        assert w0.kth_min == top3[2]
        assert w0.est_distinct == 2 * 2**60 // top3[2]
        # window 1: below k -> exact fallback, no kth_min
        assert (w1.n_events, w1.n_sk, w1.kth_min, w1.est_distinct) == (1, 1, None, 1)

    def test_single_batch_equals_multi_batch(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_kmv_distinct

        rows = pd.DataFrame(
            {"user_id": [7 * i % 23 for i in range(40)],
             "t_us": [i * 100 for i in range(40)]}
        )
        one = tmp_path / "one"
        one.mkdir()
        rows.to_parquet(one / "all.parquet")
        many = tmp_path / "many"
        many.mkdir()
        for j in range(4):
            rows.iloc[j * 10 : (j + 1) * 10].to_parquet(many / f"p{j}.parquet")

        def run(path):
            stream = (
                spark.readStream.schema("user_id long, t_us long")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(path))
            )
            return sorted(
                map(tuple, run_kmv_distinct(spark, "", k=8, source=stream).collect())
            )

        assert run(one) == run(many)


class TestStreamValueHistogram:
    """Split-invariance for the streaming log2 histogram: counters merge by
    elementwise sum, so a window spanning micro-batches settles to the same
    histogram one batch produces; quantile picks verified against a pure-
    Python replica."""

    def test_multi_batch_split_invariance(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_value_histogram

        hour = 3_600_000_000
        # window 0 spans both files; cents: 1,2,3,4 | 5,100 -> buckets
        # 0,1,1,2 | 2,6.  window 1: single value in file 2.
        f1 = pd.DataFrame(
            {"value": [0.01, 0.02, 0.03, 0.04], "t_us": [10, 20, 30, 40]}
        )
        f2 = pd.DataFrame({"value": [0.05, 1.00, 7.00], "t_us": [50, 60, hour + 5]})
        src = tmp_path / "in"
        src.mkdir()
        f1.to_parquet(src / "a.parquet")
        f2.to_parquet(src / "b.parquet")
        stream = (
            spark.readStream.schema("value double, t_us long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = {
            r.window_start: r
            for r in run_value_histogram(spark, "", source=stream).collect()
        }
        assert set(out) == {0, 3600}
        w0 = out[0]
        # counts: b0:1, b1:2, b2:2, b6:1 (n=6); p50 rank=3 -> bucket 1;
        # p90 rank=6 -> bucket 6
        assert w0.n_events == 6
        assert (w0.p50_bucket, w0.p50_lo_cents, w0.p50_hi_cents, w0.p50_bucket_n) == (1, 2, 3, 2)
        assert (w0.p90_bucket, w0.p90_lo_cents, w0.p90_hi_cents, w0.p90_bucket_n) == (6, 64, 127, 1)
        w1 = out[3600]
        # single value 700 cents -> bucket 9 [512, 1023] for both quantiles
        assert w1.n_events == 1
        assert (w1.p50_bucket, w1.p90_bucket) == (9, 9)
        assert (w1.p50_lo_cents, w1.p50_hi_cents) == (512, 1023)

    def test_zero_and_null_values_filtered(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_value_histogram

        f = pd.DataFrame(
            {"value": [0.0, None, 0.001, 0.02], "t_us": [1, 2, 3, 4]}
        )
        src = tmp_path / "in"
        src.mkdir()
        f.to_parquet(src / "a.parquet")
        stream = spark.readStream.schema("value double, t_us long").parquet(str(src))
        out = run_value_histogram(spark, "", source=stream).collect()
        # 0.0 -> cents 0 (dropped), NULL dropped, 0.001 -> cents 0 (dropped):
        # only 0.02 -> cents 2 survives
        assert len(out) == 1
        r = out[0]
        assert (r.n_events, r.p50_bucket, r.p50_lo_cents) == (1, 1, 2)


class TestStreamHeavyHitters:
    """Streaming Misra-Gries: the settled, exact-verified output must be
    split-invariant (candidates are a proven superset of true heavies under
    any micro-batch split; the verify recount closes the gap), and the
    eviction path must actually fire when a window's distinct count
    exceeds k."""

    def test_multi_batch_split_invariance_with_eviction(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_heavy_hitters

        hour = 3_600_000_000
        # window 0: user 1 x6, user 2 x3, users 10..16 singletons (n=16,
        # 9 distinct > k=4 -> the PODS'12 reduce fires mid-stream); rows
        # split across two files so the state merge is exercised.
        # window 1: 3 rows, one repeat.
        w0 = [1] * 6 + [2] * 3 + list(range(10, 17))
        rows = pd.DataFrame(
            {
                "user_id": w0 + [5, 5, 6],
                "t_us": list(range(100, 100 + 16 * 2, 2))
                + [hour + 1, hour + 2, hour + 3],
            }
        )
        one = tmp_path / "one"
        one.mkdir()
        rows.to_parquet(one / "all.parquet")
        many = tmp_path / "many"
        many.mkdir()
        for j in range(4):
            rows.iloc[j * 5 : (j + 1) * 5].to_parquet(many / f"p{j}.parquet")
        verify = spark.createDataFrame(rows).select(
            F.expr("t_us DIV 3600000000 * 3600").alias("window_start"),
            F.col("user_id").cast("string").alias("value"),
        )

        def run(path):
            stream = (
                spark.readStream.schema("user_id long, t_us long")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(path))
            )
            return sorted(
                map(
                    tuple,
                    run_heavy_hitters(
                        spark, "", k=4, source=stream, verify_df=verify
                    ).collect(),
                )
            )

        got_one, got_many = run(one), run(many)
        assert got_one == got_many
        # exact closed form with k=4: threshold n*5 > n_total.
        # window 0 (n=16): user 1 (6*5=30>16) and user 2 (3*5=15<16? no:
        # 15 < 16 -> excluded).  window 1 (n=3): user 5 (2*5=10>3) and
        # user 6 (1*5=5>3).
        assert got_one == sorted(
            [
                (0, "1", 6, 16, 375000),
                (3600, "5", 2, 3, 666667),
                (3600, "6", 1, 3, 333333),
            ]
        )

    def test_candidate_superset_survives_empty_reduce(self, spark, tmp_path):
        """A reduce that empties the candidate table must still settle to
        the exact answer (the NULL-sentinel emit keeps the LAST state
        visible to the settle step)."""
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_heavy_hitters

        # k=2, batch 1: three singletons -> reduce (cut=1) empties the
        # table; batch 2: user 9 twice -> re-enters and wins.
        f1 = pd.DataFrame({"user_id": [1, 2, 3], "t_us": [10, 20, 30]})
        f2 = pd.DataFrame({"user_id": [9, 9], "t_us": [40, 50]})
        src = tmp_path / "in"
        src.mkdir()
        f1.to_parquet(src / "a.parquet")
        f2.to_parquet(src / "b.parquet")
        both = pd.concat([f1, f2])
        verify = spark.createDataFrame(both).select(
            F.expr("t_us DIV 3600000000 * 3600").alias("window_start"),
            F.col("user_id").cast("string").alias("value"),
        )
        stream = (
            spark.readStream.schema("user_id long, t_us long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = sorted(
            map(
                tuple,
                run_heavy_hitters(
                    spark, "", k=2, source=stream, verify_df=verify
                ).collect(),
            )
        )
        # n_total=5, threshold n*3 > 5: only user 9 (2*3=6>5) qualifies —
        # and MG guarantees it survived (deduction <= 5/3 < 2)
        assert out == [(0, "9", 2, 5, 400000)]


class TestStreamSessionWindow:
    """Native session windows: a session whose events span two
    micro-batches must come back as ONE merged interval (the JVM
    state-store merge under test), and the settled result must equal the
    custom applyInPandasWithState sessionizer's bounds."""

    def test_multi_batch_interval_merge(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_session_window

        hour = 3_600_000_000
        # user 1: events at t=0s and t=30min (same session) split across
        # files, then t=3h (new session).  user 2: one event per file,
        # 10 min apart -> one session.
        f1 = pd.DataFrame({"user_id": [1, 2], "t_us": [0, 1_000_000]})
        f2 = pd.DataFrame(
            {"user_id": [1, 2, 1],
             "t_us": [30 * 60_000_000, 601_000_000, 3 * hour]}
        )
        src = tmp_path / "in"
        src.mkdir()
        f1.to_parquet(src / "a.parquet")
        f2.to_parquet(src / "b.parquet")
        stream = (
            spark.readStream.schema("user_id long, t_us long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        rows = sorted(
            map(tuple, run_session_window(spark, "", source=stream).collect())
        )
        assert rows == [
            (1, 0, 30 * 60_000_000, 2),       # merged across the 2 batches
            (1, 3 * hour, 3 * hour, 1),       # new session after the gap
            (2, 1_000_000, 601_000_000, 2),   # 10-min gap < 1h -> one session
        ]

    def test_matches_custom_sessionizer(self, spark):
        from presto_ethereum_spark.streaming.events import (
            run_session_window,
            run_sessionized,
        )

        sfd = "/root/testdata/sf0.001"
        native = sorted(
            map(tuple, run_session_window(spark, sfd).collect())
        )
        custom = sorted(
            (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
            for r in run_sessionized(spark, sfd).collect()
        )
        assert native == custom


class TestStreamEwma:
    """Split-invariance for the streaming EWMA: the newest-20 buffer merges
    by top-k-by-timestamp (commutative/associative/idempotent), so
    out-of-event-time-order arrival across micro-batches settles to the
    batch closed form, verified against a pure-Python dyadic replica."""

    @staticmethod
    def _dyadic(cents_newest_first):
        m = len(cents_newest_first)
        num = sum(c << (m - 1 - i) for i, c in enumerate(cents_newest_first))
        return num, (1 << m) - 1

    def test_out_of_order_arrival(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_ewma

        # batch 1 carries the NEWEST event; batch 2 arrives later with
        # OLDER timestamps — an order-sensitive fold would weight them
        # newest, the mergeable buffer must not
        f1 = pd.DataFrame(
            {"user_id": [1, 1], "event_id": [10, 11],
             "t_us": [500, 400], "value": [5.0, 4.0]}
        )
        f2 = pd.DataFrame(
            {"user_id": [1, 1], "event_id": [12, 13],
             "t_us": [100, 200], "value": [1.0, 2.0]}
        )
        src = tmp_path / "in"
        src.mkdir()
        f1.to_parquet(src / "a.parquet")
        f2.to_parquet(src / "b.parquet")
        stream = (
            spark.readStream
            .schema("user_id long, event_id long, t_us long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        (row,) = run_ewma(spark, "", source=stream).collect()
        # event-time order newest-first: t=500(500c), 400(400c), 200(200c), 100(100c)
        num, den = self._dyadic([500, 400, 200, 100])
        assert (row.key, row.n_seen, row.n_obs) == (1, 4, 4)
        assert (row.ewma_num, row.ewma_den) == (num, den)
        assert row.ewma == num / den / 100

    def test_buffer_caps_at_window(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_ewma

        n = 30  # > EWMA_WINDOW=20
        rows = pd.DataFrame(
            {"user_id": [1] * n, "event_id": range(n),
             "t_us": [i * 10 for i in range(n)],
             "value": [float(i) for i in range(n)]}
        )
        many = tmp_path / "many"
        many.mkdir()
        for j in range(3):
            rows.iloc[j * 10 : (j + 1) * 10].to_parquet(many / f"p{j}.parquet")
        stream = (
            spark.readStream
            .schema("user_id long, event_id long, t_us long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(many))
        )
        (row,) = run_ewma(spark, "", source=stream).collect()
        kept = [i * 100 for i in range(n - 1, n - 21, -1)]  # newest 20, cents
        num, den = self._dyadic(kept)
        assert (row.n_seen, row.n_obs) == (n, 20)
        assert (row.ewma_num, row.ewma_den) == (num, den)


class TestStreamFunnel:
    """Split-invariance for the streaming first-occurrence funnel: min-merge
    state absorbs a late-arriving EARLIER view exactly (the case the
    conditional-chain definition cannot repair without replay)."""

    def test_late_earlier_view_absorbed(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_funnel

        # batch 1: view@300, click@400 -> 2 steps; batch 2 delivers a LATE
        # view@100 and purchase@500 -> settled must be 3 steps with t_view=100
        f1 = pd.DataFrame(
            {"user_id": [1, 1], "event_type": ["view", "click"],
             "t_us": [300, 400]}
        )
        f2 = pd.DataFrame(
            {"user_id": [1, 1], "event_type": ["view", "purchase"],
             "t_us": [100, 500]}
        )
        src = tmp_path / "in"
        src.mkdir()
        f1.to_parquet(src / "a.parquet")
        f2.to_parquet(src / "b.parquet")
        stream = (
            spark.readStream
            .schema("user_id long, event_type string, t_us long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        (row,) = run_funnel(spark, "", source=stream).collect()
        assert (row.user_id, row.n_seen) == (1, 4)
        assert (row.t_view, row.t_click, row.t_purchase) == (100, 400, 500)
        assert row.steps_completed == 3

    def test_out_of_order_steps_counted_strictly(self, spark, tmp_path):
        import pandas as pd

        from presto_ethereum_spark.streaming.events import run_funnel

        # purchase BEFORE first click -> only 2 steps (view < click holds,
        # purchase min precedes click min); irrelevant types filtered out
        rows = pd.DataFrame(
            {"user_id": [2, 2, 2, 2],
             "event_type": ["view", "purchase", "click", "error"],
             "t_us": [10, 20, 30, 40]}
        )
        src = tmp_path / "one"
        src.mkdir()
        rows.to_parquet(src / "all.parquet")
        stream = (
            spark.readStream
            .schema("user_id long, event_type string, t_us long")
            .parquet(str(src))
        )
        (row,) = run_funnel(spark, "", source=stream).collect()
        assert row.n_seen == 3  # 'error' filtered before the stateful op
        assert (row.t_view, row.t_click, row.t_purchase) == (10, 30, 20)
        assert row.steps_completed == 2


class TestBalanceUpsert:
    """foreachBatch additive balance upsert: the settled state must equal
    the batch ledger whatever the micro-batch split (addition is
    commutative/associative), including the degenerate single-batch run."""

    def test_split_counts_match_batch(self, spark):
        from presto_ethereum_spark.plans.battery import _erc20_transfer_deltas
        from presto_ethereum_spark.streaming.chain import run_balance_upsert

        from pyspark.sql import functions as F

        path = "fixtures/eth/chain_blocks.parquet"
        batch = (
            _erc20_transfer_deltas(spark.read.parquet(path))
            .groupBy("token_address", "holder")
            .agg(
                F.sum("is_in").cast("long").alias("n_in"),
                F.sum(1 - F.col("is_in")).cast("long").alias("n_out"),
                F.sum("delta")
                .cast("decimal(38,0)")
                .cast("string")
                .alias("balance_wei"),
            )
        )
        want = sorted(map(tuple, batch.collect()))
        got_multi = sorted(
            map(tuple, run_balance_upsert(spark, path, split_ranges=4).collect())
        )
        got_single = sorted(
            map(tuple, run_balance_upsert(spark, path, split_ranges=1).collect())
        )
        assert got_multi == want
        assert got_single == want

    def test_genesis_block_zero_not_dropped(self, spark, tmp_path):
        """A chain dump numbered from 0 keeps its genesis block: the old
        range staging started at ``i*step + 1`` and silently dropped
        block 0 from the streamed input (ADVICE r10).  Renumbering the
        fixture so min(number) == 0 makes the settled ledger diverge
        from the batch ledger iff that block's transfers are lost."""
        from pyspark.sql import functions as F

        from presto_ethereum_spark.plans.battery import _erc20_transfer_deltas
        from presto_ethereum_spark.streaming.chain import run_balance_upsert

        chain = spark.read.parquet("fixtures/eth/chain_blocks.parquet")
        # anchor the renumbering at the FIRST transfer-bearing block so the
        # resulting block 0 carries ledger deltas a dropped block would lose
        anchor = (
            _erc20_transfer_deltas(chain)
            .agg(F.min("block_number"))
            .collect()[0][0]
        )
        shifted = chain.where(F.col("number") >= anchor).withColumn(
            "number", (F.col("number") - anchor).cast("long")
        )
        path = str(tmp_path / "chain0.parquet")
        shifted.write.parquet(path)
        # sanity: the renumbered block 0 must itself carry transfers, or
        # the regression this test pins would be invisible
        blk0 = _erc20_transfer_deltas(shifted.where(F.col("number") == 0))
        assert blk0.count() > 0
        want = sorted(
            map(
                tuple,
                _erc20_transfer_deltas(shifted)
                .groupBy("token_address", "holder")
                .agg(
                    F.sum("is_in").cast("long").alias("n_in"),
                    F.sum(1 - F.col("is_in")).cast("long").alias("n_out"),
                    F.sum("delta")
                    .cast("decimal(38,0)")
                    .cast("string")
                    .alias("balance_wei"),
                )
                .collect(),
            )
        )
        got = sorted(
            map(tuple, run_balance_upsert(spark, path, split_ranges=4).collect())
        )
        assert got == want

    def test_single_block_zero_dump_not_empty(self, spark, tmp_path):
        """max(number) == 0 (a one-block genesis dump) must stream that
        block, not produce an empty ledger."""
        from pyspark.sql import functions as F

        from presto_ethereum_spark.streaming.chain import run_balance_upsert
        from presto_ethereum_spark.sources.decode import erc20_transfer_deltas

        chain = spark.read.parquet("fixtures/eth/chain_blocks.parquet")
        # pick a block that carries at least one ERC-20 transfer
        blk = (
            erc20_transfer_deltas(chain)
            .select("block_number")
            .limit(1)
            .collect()[0][0]
        )
        one = chain.where(F.col("number") == blk).withColumn(
            "number", F.lit(0).cast("long")
        )
        path = str(tmp_path / "one0.parquet")
        one.write.parquet(path)
        got = run_balance_upsert(spark, path, split_ranges=3)
        assert got.count() > 0

    def test_bare_relative_filename_single_batch(self, spark, tmp_path, monkeypatch):
        """The single-batch path must survive a bare relative filename:
        dirname('x.parquet') is '' and readStream would fail with an
        opaque empty-path error without the abspath normalization."""
        import shutil

        from presto_ethereum_spark.streaming.chain import run_balance_upsert

        shutil.copy(
            "fixtures/eth/chain_blocks.parquet", tmp_path / "chain_rel.parquet"
        )
        monkeypatch.chdir(tmp_path)
        got = run_balance_upsert(spark, "chain_rel.parquet", split_ranges=1)
        assert got.count() > 0


class TestBalanceRestart:
    """VERDICT r11 #2: durable state root + genuine kill-and-resume."""

    CHAIN = "fixtures/eth/chain_blocks.parquet"

    def _batch_ledger(self, spark):
        from presto_ethereum_spark.streaming.chain import run_balance_upsert

        return sorted(
            map(
                tuple,
                run_balance_upsert(spark, self.CHAIN, split_ranges=1).collect(),
            )
        )

    def test_kill_and_resume_settles_to_batch_ledger(self, spark):
        from presto_ethereum_spark.streaming.chain import run_balance_restart

        got = sorted(
            map(
                tuple,
                run_balance_restart(
                    spark, self.CHAIN, split_ranges=4, kill_after=2
                ).collect(),
            )
        )
        assert got == self._batch_ledger(spark) and len(got) > 0

    def test_state_root_survives_and_recovers_between_calls(
        self, spark, tmp_path
    ):
        """Drive the two runs by hand so the on-disk contract is visible:
        after run 1 the state root holds the checkpoint + committed
        generations; run 2 (new call, empty driver state) must recover
        them and merge ONLY the newly-staged files on top."""
        import os

        from pyspark.sql import functions as F

        from presto_ethereum_spark.streaming.chain import run_balance_upsert

        chain = spark.read.parquet(self.CHAIN)
        schema = chain.schema
        mn, hi = chain.agg(F.min("number"), F.max("number")).collect()[0]
        mid = mn + (hi - mn) // 2
        inp = str(tmp_path / "input")
        state = str(tmp_path / "state")

        def src():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(inp)
            )

        chain.where(F.col("number") <= mid).coalesce(1).write.parquet(
            f"{inp}/range_0"
        )
        first = run_balance_upsert(spark, self.CHAIN, source=src(), state_root=state)
        n_first = first.count()
        assert os.path.isdir(f"{state}/_chk")
        gens = [d for d in os.listdir(state) if d.startswith("gen_")]
        assert gens, "no committed generations persisted"
        # a torn write from a hard kill: a gen dir without _SUCCESS must
        # be invisible to recovery
        os.makedirs(f"{state}/gen_999")

        chain.where(F.col("number") > mid).coalesce(1).write.parquet(
            f"{inp}/range_1"
        )
        second = run_balance_upsert(
            spark, self.CHAIN, source=src(), state_root=state
        )
        got = sorted(map(tuple, second.collect()))
        assert got == self._batch_ledger(spark)
        assert len(got) >= n_first

    def test_kill_after_bounds(self, spark):
        import pytest

        from presto_ethereum_spark.streaming.chain import run_balance_restart

        with pytest.raises(ValueError):
            run_balance_restart(spark, self.CHAIN, split_ranges=3, kill_after=3)
        with pytest.raises(ValueError):
            run_balance_restart(spark, self.CHAIN, split_ranges=3, kill_after=0)


class TestBalanceUpsertRpcTail:
    """VERDICT r10 #4: the standing balance pipeline driven by the RPC
    source's canned transport — settled ledger must equal the fixture
    batch ledger bit-for-bit, at a cost of ONE bulk eth_getLogs per
    micro-batch (no block bodies, no receipts)."""

    class _Counting:
        def __init__(self, inner):
            self.inner = inner
            self.counts = {"get_blocks": 0, "get_logs": 0}

        def block_number(self):
            return self.inner.block_number()

        def get_blocks(self, numbers):
            self.counts["get_blocks"] += 1
            return self.inner.get_blocks(numbers)

        def get_logs(self, start, end, topic0=None, addresses=None):
            self.counts["get_logs"] += 1
            return self.inner.get_logs(start, end, topic0, addresses)

    def test_settled_ledger_matches_batch_and_dump_stream(self, spark):
        from presto_ethereum_spark.plans.battery import queries

        qs = queries()
        sf = "/root/testdata/sf0.001"
        got = sorted(map(tuple, qs["stream_balance_rpc_tail"](spark, sf).collect()))
        want = sorted(map(tuple, qs["eth_erc20_balances"](spark, sf).collect()))
        assert got == want

    def test_three_microbatches_cost_three_getlogs(self):
        from presto_ethereum_spark.streaming.chain import EthereumStreamReader

        r = EthereumStreamReader(
            {
                "path": "fixtures/eth/chain_blocks.parquet",
                "table": "log",
                "max_blocks_per_batch": 800,
            }
        )
        counting = self._Counting(r.transport)
        r.transport = counting
        off = r.initialOffset()
        batches, n_rows = 0, 0
        while True:
            it, nxt = r.read(off)
            if nxt == off:  # caught up: empty probe, no offset advance
                break
            batches += 1
            n_rows += len(list(it))
            off = nxt
        assert batches == 3  # 2,400 fixture blocks / 800 per batch
        assert n_rows > 0
        assert counting.counts == {"get_blocks": 0, "get_logs": 3}


class TestDrainOverProvisioning:
    def test_extra_drains_do_not_clobber_settled_state(self, spark):
        """drain_runs beyond the available micro-batches must be a no-op:
        an exhausted-source availableNow run fires zero triggers, and the
        per-drain sink discipline keeps the last NON-empty settled table
        instead of letting the empty view win."""
        from presto_ethereum_spark.streaming.chain import run_chain_gas_buckets

        path = "fixtures/eth/chain_blocks.parquet"
        want = sorted(
            map(
                tuple,
                run_chain_gas_buckets(
                    spark, path, max_per_batch=4000, drain_runs=1
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                run_chain_gas_buckets(
                    spark, path, max_per_batch=800, drain_runs=6
                ).collect(),
            )
        )
        assert got == want and len(got) > 0

class TestBalanceRestartR13:
    """r13 additions to the balance-restart family (placed in their own
    class — the r13 first cut appended them into whatever class happened
    to end the file, which lacked the CHAIN constant)."""

    CHAIN = "fixtures/eth/chain_blocks.parquet"

    def test_state_root_without_source_raises(self, spark, tmp_path):
        """ADVICE r12 #2: durable mode + the default re-staged input is a
        silent double-count trap (overwrite re-staging mints new part-file
        names, so a resumed checkpoint replays every range).  The
        combination must refuse loudly up front."""
        import pytest

        from presto_ethereum_spark.streaming.chain import run_balance_upsert

        with pytest.raises(ValueError, match="stable"):
            run_balance_upsert(
                spark, self.CHAIN, state_root=str(tmp_path / "state")
            )

    def test_u256_kill_and_resume_settles_to_batch_ledger(self, spark):
        """VERDICT r12 #3: the durability contract on the 5-limb u256
        algebra — the resumed pipeline's settled ledger must equal the
        one-pass batch u256 ledger (itself differentially pinned against
        the generator's Python-int ledger and the DuckDB oracle)."""
        from presto_ethereum_spark.plans import battery

        got = sorted(
            map(
                tuple,
                battery.queries()["stream_u256_balance_restart"](
                    spark, "x"
                ).collect(),
            )
        )
        want = sorted(
            (r.token_address, r.holder, r.n_in, r.n_out, r.balance_hex)
            for r in battery.queries()["stream_u256_balance_upsert"](
                spark, "x"
            ).collect()
        )
        assert got == want and len(got) > 30
