"""Multimodal byte-column plumbing tests: Arrow batch shape, determinism,
1->N frame expansion, strict-stub behavior."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from presto_ethereum_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_image_meta,
    extract_features,
    media_from_documents,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return media_from_documents(docs)


def test_media_table_shape(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "mime",
        "data",
        "source_uri",
    ]
    assert media.schema["data"].dataType.typeName() == "binary"


def test_extract_features_deterministic(media):
    a = {r["media_id"]: (r["sha"], r["width"], r["height"]) for r in extract_features(media).collect()}
    b = {r["media_id"]: (r["sha"], r["width"], r["height"]) for r in extract_features(media).collect()}
    assert a == b
    assert len(a) == media.count()
    assert [f.name for f in extract_features(media).schema.fields] == [
        f.name for f in FEATURE_SCHEMA.fields
    ]


def test_sha_matches_sql_digest(spark, media):
    """The mapInPandas feature digest must equal the JVM-side sha2 of the
    same bytes (cross-checks the Arrow binary round-trip)."""
    feats = extract_features(media).select("media_id", "sha")
    jvm = media.select("media_id", F.sha2(F.col("data"), 256).alias("sha_jvm"))
    joined = feats.join(jvm, "media_id")
    assert joined.where("sha != sha_jvm").count() == 0


def test_decode_stub_fallback_and_strict(media):
    out = decode_image_meta(media).collect()
    assert all(r["width"] >= 0 and r["height"] >= 0 for r in out)
    with pytest.raises(Exception, match="codec unavailable"):
        decode_image_meta(media, strict=True).collect()


def test_frame_sampling_expansion(media):
    frames = sample_frames(media, every_n_bytes=100)
    joined = (
        frames.groupBy("media_id")
        .agg(F.count("*").alias("n_frames"), F.sum(F.length("frame_bytes")).alias("total"))
        .join(media.select("media_id", F.length("data").alias("n_bytes")), "media_id")
    )
    bad = joined.where("total != n_bytes OR n_frames != CAST(ceil(n_bytes / 100.0) AS BIGINT)")
    assert bad.count() == 0


def test_resize_stride_semantics(spark):
    from presto_ethereum_spark.operators.multimodal import resize_media

    media = spark.createDataFrame(
        [
            Row(media_id=1, data=bytes(range(130))),  # step=ceil(130/64)=3
            Row(media_id=2, data=b"abc"),             # shorter than target: identity
            Row(media_id=3, data=b""),                # empty stays empty
        ]
    )
    out = {r["media_id"]: r for r in resize_media(media, target_len=64).collect()}
    assert bytes(out[1]["out_bytes"]) == bytes(range(130))[::3]
    assert out[1]["orig_len"] == 130 and out[1]["out_len"] == 44
    assert bytes(out[2]["out_bytes"]) == b"abc" and out[2]["out_len"] == 3
    assert out[3]["out_len"] == 0 and bytes(out[3]["out_bytes"]) == b""


class TestPerceptualHash:
    def test_exact_60bit_hashes_with_nulls_in_batch(self, spark):
        # regression: a batch mixing short (null-hash) and long assets must
        # not floatify the Int64 column — 60-bit hashes lose their low bits
        # at float64's 53-bit precision (caught by the sf0.1 oracle gate)
        from presto_ethereum_spark.operators.multimodal import perceptual_hash

        import random

        long_bytes = random.Random(1).randbytes(512)
        rows = [
            (0, "application/octet-stream", bytearray(long_bytes), "m://0"),
            (1, "application/octet-stream", bytearray(b"tiny"), "m://1"),
            (2, "application/octet-stream", bytearray(long_bytes), "m://2"),
        ]
        df = spark.createDataFrame(
            rows, "media_id long, mime string, data binary, source_uri string"
        )
        got = {r["media_id"]: r["phash"] for r in perceptual_hash(df).collect()}
        assert got[1] is None  # < 60 bytes
        assert got[0] == got[2] and got[0] is not None

        # python referee: exact integer-compare aHash
        n = len(long_bytes)
        total = sum(long_bytes)
        want = 0
        for i in range(60):
            lo, hi = i * n // 60, (i + 1) * n // 60
            if sum(long_bytes[lo:hi]) * n > total * (hi - lo):
                want |= 1 << i
        assert got[0] == want
        assert want % 128 != 0  # the referee value exercises low bits

    def test_near_dup_pairs_hamming(self, spark):
        import itertools
        import random

        from presto_ethereum_spark.operators.multimodal import (
            phash_near_dup_pairs,
        )

        rng = random.Random(2)
        base = rng.randbytes(600)
        flip = bytearray(base)
        flip[100:110], flip[300:310] = flip[300:310], flip[100:110]
        blobs = {
            0: bytes(base),
            1: bytes(base),          # exact dup -> hamming 0
            2: bytes(flip),          # mean-preserving local swap
            3: rng.randbytes(600),   # unrelated
        }
        df = spark.createDataFrame(
            [(k, "m", bytearray(v), f"u{k}") for k, v in blobs.items()],
            "media_id long, mime string, data binary, source_uri string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in phash_near_dup_pairs(df, max_hamming=6).collect()
        }

        def ahash(b):
            n, total, h = len(b), sum(b), 0
            for i_ in range(60):
                lo, hi = i_ * n // 60, (i_ + 1) * n // 60
                if sum(b[lo:hi]) * n > total * (hi - lo):
                    h |= 1 << i_
            return h

        hs = {k: ahash(v) for k, v in blobs.items()}
        want = {}
        for a, b in itertools.combinations(sorted(hs), 2):
            ham = bin(hs[a] ^ hs[b]).count("1")
            shares_band = any(
                (hs[a] >> (j * 15)) & 32767 == (hs[b] >> (j * 15)) & 32767
                for j in range(4)
            )
            if shares_band and ham <= 6:
                want[(a, b)] = ham
        assert got == want
        assert got[(0, 1)] == 0  # the exact dup is always caught


class TestShardPack:
    """Manifest invariants: assets are whole (never split), offsets within a
    pack are the contiguous byte cumsum, and a pack overflows by at most one
    asset."""

    def test_manifest_invariants(self, spark):
        import pandas as pd

        from presto_ethereum_spark.operators.multimodal import shard_pack

        pdf = pd.DataFrame(
            {
                "media_id": range(40),
                "mime": ["application/octet-stream"] * 40,
                "data": [bytes([i % 251]) * (i * 37 % 900 + 10) for i in range(40)],
                "source_uri": [f"synthetic://t/{i}" for i in range(40)],
            }
        )
        df = spark.createDataFrame(pdf)
        rows = shard_pack(df, shard_bytes=1000, n_shards=4, salt="t").collect()
        assert len(rows) == 40
        by_pack = {}
        for r in rows:
            by_pack.setdefault((r.shard, r.pack_id), []).append(r)
        for (shard, pack_id), members in by_pack.items():
            members.sort(key=lambda r: r.media_id)
            # offsets are the contiguous cumsum inside the pack
            off = 0
            for m in members:
                assert m.byte_offset == off
                off += m.n_bytes
            # a pack's payload below its last asset fits the budget
            assert members[-1].byte_offset < 1000
        # pack ids are dense per shard (0..max)
        for shard in {r.shard for r in rows}:
            pids = sorted({r.pack_id for r in rows if r.shard == shard})
            assert pids == list(range(len(pids)))
