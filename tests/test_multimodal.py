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
