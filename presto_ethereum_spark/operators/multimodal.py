"""Multimodal (image/audio/video) column handling for training-data pipelines.

Media ride through Spark as opaque ``binary`` columns with a typed metadata
struct — the schema, partitioning, Arrow batch shape, and UDF signatures are
real and tested.  General codecs are stubbed (no image/audio libraries in
this environment): decode functions try to import the real library
(PIL/soundfile) and otherwise fall back to a clearly-marked deterministic
fake (or raise, for the strict variant), so dropping the real codec in is a
one-line change on a cluster that has it.  PNG and WAV are the
exceptions — REAL pure-Python baseline decoders (operators/png.py,
public spec + stdlib zlib; operators/wav.py, RIFF/PCM16 + stdlib struct)
run end-to-end in :func:`png_decode_stats` / :func:`wav_decode_stats`
and are graded against ground truth stored beside the encoded fixture
bytes; video remains byte-plumbing-only (no public pure-stdlib codec).

Plumbing decisions that matter at 100 TB:

- media bytes stay in ONE column of a wide row (never exploded), so column
  pruning skips the heavy bytes for metadata-only queries;
- decode/feature/resize run via ``mapInPandas`` — Arrow-batched, streaming
  per partition, bounded memory via ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` (set small for multi-MB blobs);
- outputs carry the input key so downstream joins are co-partitioned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "media_from_documents",
    "decode_image_meta",
    "extract_features",
    "png_decode_stats",
    "png_decode_screen",
    "wav_decode_stats",
    "sample_frames",
    "frame_dedup_stats",
    "PHASH_SCHEMA",
    "perceptual_hash",
    "phash_near_dup_pairs",
    "bytes_profile",
    "shard_pack",
]

# media table: one row per asset; bytes + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("data", BinaryType()),
        StructField("source_uri", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature_dim", IntegerType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table: document text bytes stand in for
    encoded media (the container ships no codecs; the byte-plumbing is what
    is under test)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("text").cast("binary").alias("data"),
        F.format_string("synthetic://doc/%d", F.col("doc_id")).alias("source_uri"),
    )


def _fake_dims(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a codec's (width, height): derived from the
    byte content so tests can assert stability."""
    if not blob:
        return (0, 0)
    return (len(blob) % 1024 + 1, blob[0] + 1)


def decode_image_meta(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode step: bytes -> (width, height).

    Tries PIL; without it either raises NotImplementedError (``strict``,
    making the stub explicit) or applies the deterministic fake decode.
    Runs via mapInPandas: Arrow batches of binary, streamed per partition.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("mime", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
            import io

            def dims(b):
                with Image.open(io.BytesIO(b)) as im:
                    return im.size
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "image codec unavailable in this environment: install "
                    "Pillow or use strict=False for the deterministic stub"
                )
            dims = _fake_dims
        for pdf in it:
            w, h = [], []
            for blob in pdf["data"]:
                d = dims(bytes(blob) if blob is not None else b"")
                w.append(d[0])
                h.append(d[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                }
            )

    return df.mapInPandas(batches, out_schema)


def png_decode_stats(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "png",
    thumb: int = 8,
) -> DataFrame:
    """REAL image decode -> per-image stats: width, height, channels,
    per-channel pixel sums, and the md5 of an 8x8 nearest-neighbor
    thumbnail — the decode -> resize -> feature chain of a training-data
    ingest, with the codec step actually executed (operators/png.py),
    not stubbed.

    Runs via ``mapInPandas``: each Arrow batch of blobs decodes
    independently on its executor with zero cross-row state, so the
    stage parallelizes embarrassingly; at 100 TB the knobs are blob-column
    partition sizing and ``arrow.maxRecordsPerBatch`` (keep batches small
    when blobs are MBs).  Greyscale images report the grey sum in all
    three channels (the generator mirrors this).  A corrupt or
    out-of-profile blob fails the task loudly (ValueError) rather than
    producing fake stats — quarantine upstream with a try/filter stage
    if the corpus is dirty (multimodal_bytes_profile is that screen)."""
    from presto_ethereum_spark.operators.png import decode_png, nn_resize

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("sum_r", LongType()),
            StructField("sum_g", LongType()),
            StructField("sum_b", LongType()),
            StructField("thumb_md5", StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            recs = []
            for mid, blob in zip(pdf[id_col], pdf[data_col]):
                w, h, nch, raw = decode_png(bytes(blob))
                if nch == 1:
                    s = sum(raw)
                    sr = sg = sb = s
                else:
                    sr, sg, sb = (
                        sum(raw[0::3]), sum(raw[1::3]), sum(raw[2::3])
                    )
                tmb = nn_resize(raw, w, h, nch, thumb, thumb)
                recs.append(
                    (
                        int(mid), w, h, nch, sr, sg, sb,
                        hashlib.md5(tmb).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "width", "height", "channels",
                    "sum_r", "sum_g", "sum_b", "thumb_md5",
                ],
            )

    return df.select(id_col, data_col).mapInPandas(batches, out_schema)


def extract_features(df: DataFrame) -> DataFrame:
    """Cheap content features (size, digest, stub dims, fixed feature dim):
    the shape of a real embedding-extraction stage with the model swapped
    for deterministic arithmetic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = {k: [] for k in ("media_id", "n_bytes", "sha", "width", "height", "feature_dim")}
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                b = bytes(blob) if blob is not None else b""
                w, h = _fake_dims(b)
                rows["media_id"].append(mid)
                rows["n_bytes"].append(len(b))
                rows["sha"].append(hashlib.sha256(b).hexdigest())
                rows["width"].append(w)
                rows["height"].append(h)
                rows["feature_dim"].append(512)
            pdf_out = pd.DataFrame(rows)
            pdf_out["width"] = pdf_out["width"].astype("int32")
            pdf_out["height"] = pdf_out["height"].astype("int32")
            pdf_out["feature_dim"] = pdf_out["feature_dim"].astype("int32")
            yield pdf_out

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling shape: one output row per sampled 'frame' (byte
    offset), exercising the 1->N mapInPandas expansion used for video."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_index", IntegerType()),
            StructField("offset", LongType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, idxs, offs, frames = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                b = bytes(blob) if blob is not None else b""
                for i, off in enumerate(range(0, len(b), every_n_bytes)):
                    mids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    frames.append(b[off : off + every_n_bytes])
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "offset": offs,
                    "frame_bytes": frames,
                }
            )

    return df.mapInPandas(batches, out_schema)


def resize_media(df: DataFrame, target_len: int = 64) -> DataFrame:
    """Resize/downsample step: bytes -> smaller bytes at a fixed 'resolution'
    budget.  Real pipelines put PIL/ffmpeg here; the container ships no
    codecs, so the transform is a deterministic byte-stride downsample
    (every ``ceil(n/target)``-th byte), which preserves everything the
    Spark layer is responsible for — Arrow batch shape, binary-in/binary-out
    schema, per-row size accounting — and is closed-form replayable by an
    external oracle.

    Scale: mapInPandas streams Arrow batches through the Python worker —
    constant memory per batch, embarrassingly parallel, output strictly
    smaller than input (a shrink map before any shuffle/sink)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("orig_len", LongType()),
            StructField("out_len", LongType()),
            StructField("out_bytes", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, olens, nlens, outs = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                b = bytes(blob) if blob is not None else b""
                step = max(1, -(-len(b) // target_len))
                out = b[::step]
                mids.append(mid)
                olens.append(len(b))
                nlens.append(len(out))
                outs.append(out)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "orig_len": olens,
                    "out_len": nlens,
                    "out_bytes": outs,
                }
            )

    return df.mapInPandas(batches, out_schema)


def frame_dedup_stats(
    df: DataFrame, every_n_bytes: int = 64, id_col: str = "media_id"
) -> DataFrame:
    """Cross-media duplicate-FRAME statistics — the video/image analogue of
    the C4 duplicate-chunk filter: a frame (fixed-stride byte window from
    :func:`sample_frames`) that appears more than once ANYWHERE in the
    corpus is boilerplate (intro cards, black frames, watermark stills,
    re-uploads) and its share per asset is the dedup/quality signal.

    Returns ``(media_id, n_frames, n_dup_frames, dup_frac)`` for every
    asset (zero-frame assets kept with 0 / 0.0 — absence of frames is not
    a dup verdict); ``dup_frac`` uses the engine-portable integer half-up
    rounding (``round6_ratio``).

    Scale plan: frames are fingerprinted (md5) IMMEDIATELY after the
    mapInPandas expansion and the bytes column is dropped, so the
    corpus-global frequency count — the one real shuffle — carries
    (16-byte hash) rows, never frame payloads (the same
    no-payload-in-the-exchange contract duplicate_chunk_filter
    plan-shape-tests).  The per-media re-aggregation joins hash->count
    back on the fingerprint and reduces to one row per asset."""
    from presto_ethereum_spark.operators.dedup import round6_ratio

    frames = sample_frames(df, every_n_bytes=every_n_bytes).select(
        F.col("media_id"), F.md5(F.col("frame_bytes")).alias("fp")
    )
    freq = frames.groupBy("fp").agg(F.count("*").alias("n_total"))
    per_media = (
        frames.join(freq, "fp")
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.count_if(F.col("n_total") >= 2).alias("n_dup_frames"),
        )
    )
    return (
        df.select(F.col(id_col).alias("media_id"))
        .join(per_media, "media_id", "left")
        .select(
            "media_id",
            F.coalesce("n_frames", F.lit(0)).cast("long").alias("n_frames"),
            F.coalesce("n_dup_frames", F.lit(0))
            .cast("long")
            .alias("n_dup_frames"),
            F.when(
                F.coalesce("n_frames", F.lit(0)) > 0,
                round6_ratio(
                    F.coalesce("n_dup_frames", F.lit(0)), F.col("n_frames")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_hash(df: DataFrame, bits: int = 60) -> DataFrame:
    """Average-hash (aHash) perceptual signature over raw media bytes:
    split each asset into ``bits`` equal byte spans, set bit i when span
    i's mean byte value exceeds the asset mean — the classic cheap
    perceptual fingerprint (identical assets hash identically; small
    local edits flip few bits), here over the stubbed byte-domain
    "decode" the multimodal family uses throughout (real codecs would
    feed pixel rows into the SAME kernel shape).

    The bit decision is an exact INTEGER comparison
    (``span_sum * n_bytes > total_sum * span_len``) — no float mean, so
    any engine reproduces the signature bit-for-bit.  Assets shorter
    than ``bits`` bytes are emitted with a null phash (no span exists
    for every bit; filter or handle downstream).

    Runs as an Arrow-batched ``mapInPandas`` numpy kernel: one
    ``cumsum`` per asset serves all ``bits`` span sums — the
    embarrassingly-parallel map-only stage of a real feature-extraction
    pipeline."""
    nbits = int(bits)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, sizes, hashes = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["data"]):
                b = bytes(blob) if blob is not None else b""
                n = len(b)
                ids.append(mid)
                sizes.append(n)
                if n < nbits:
                    hashes.append(None)
                    continue
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                csum = np.concatenate(([0], np.cumsum(a)))
                total = int(csum[-1])
                h = 0
                for i in range(nbits):
                    lo = i * n // nbits
                    hi = (i + 1) * n // nbits
                    span = int(csum[hi] - csum[lo])
                    if span * n > total * (hi - lo):
                        h |= 1 << i
                hashes.append(h)
            # build the hash column as nullable Int64 DIRECTLY: a plain list
            # holding both ints and None floatifies in the DataFrame
            # constructor, silently rounding 60-bit hashes to float64's 53
            # bits (caught by the sf0.1 oracle gate: low bits zeroed)
            out = pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": sizes,
                    "phash": pd.array(hashes, dtype="Int64"),
                }
            )
            yield out

    return df.mapInPandas(batches, PHASH_SCHEMA)


def phash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    bands: int | None = None,
    bits: int = 60,
) -> DataFrame:
    """Perceptual near-duplicate pairs: banded blocking on the aHash
    (agree on >= 1 of ``bands`` sub-keys -> candidate; the simhash
    blocking discipline, dedup.py) verified by exact Hamming distance
    <= ``max_hamming`` via xor/bit_count.

    ``bands`` defaults to ``max_hamming + 1``, which makes capture
    LOSSLESS by pigeonhole: <= max_hamming differing bits can disturb at
    most max_hamming of the bands' keys, so at least one band agrees
    (bits past ``bands * (bits // bands)`` are uncovered by any key —
    they can only create extra candidates, never hide a pair).  Pass a
    SMALLER ``bands`` for cheaper-but-banding-limited recall: with b
    bands only pairs with <= b - 1 differing bits are guaranteed; e.g.
    bands=4 at max_hamming=6 deterministically captures Hamming <= 3 and
    finds 4..6-bit pairs only when their flips cluster into <= 3 bands.
    Deterministic either way — blocking is bit arithmetic, not sampling
    — so an oracle replicating the banding reproduces the exact output.
    Exchanges carry (band, sub-key, id, hash) longs; payload bytes never
    move past the signature kernel."""
    if bands is None:
        bands = max_hamming + 1
    width = bits // bands
    sigs = perceptual_hash(df, bits=bits).where(
        F.col("phash").isNotNull()
    ).select(F.col("media_id").alias("id"), "phash")
    banded = sigs.select(
        "id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("phash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.phash").alias("sh_a"),
            F.col("b.phash").alias("sh_b"),
        )
        .distinct()
        .where(ham <= max_hamming)
        .select(
            "id_a", "id_b", ham.cast("int").alias("hamming")
        )
    )


def bytes_profile(df: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Corrupt/degenerate-payload screen over raw media bytes, pure JVM —
    no codec, no Python: truncated downloads, zero-padded blobs, and
    single-byte-repeated corruption all collapse the byte distribution,
    so distributional stats on the bytes themselves are the first-pass
    health check a 100 TB media crawl runs BEFORE spending decode CPU.

    Works on the hex expansion (2 nibbles/byte): per asset, the 16
    nibble counts come from 16 ``length - length(replace(...))`` scalar
    expressions — entirely map-side, zero shuffle, whole-stage-codegen —
    and reduce to (a) ``distinct_nibbles`` (collapsed alphabet =>
    corruption) and (b) a Simpson collision index Σc² / n² in exact e6
    micro-units (uniform random bytes => ~62500 = 1/16; a constant-byte
    blob => 1000000; natural encodings sit between, so the ``suspect``
    flag at >= 250000 catches padded/constant payloads without decoding
    them).  The Σc² sum runs in DECIMAL(38,0) — at petabyte blobs the
    int64 square would wrap (the benford/rake overflow idiom).

    Half-even-free rounding: simpson_e6 = (2*Σc²*1e6 + n²) div (2*n²)
    — round-half-up in pure integer arithmetic, NULL (not a crash) for
    empty payloads via nullif."""
    syms = "0123456789ABCDEF"
    base = df.select(
        F.col(id_col), F.hex(F.col(data_col)).alias("h")
    )
    cnts = [
        (
            F.length("h") - F.length(F.replace(F.col("h"), F.lit(s)))
        ).alias(f"c{s}")
        for s in syms
    ]
    prof = base.select(
        id_col, F.length("h").cast("bigint").alias("n_nibbles"), *cnts
    )
    sumsq = "CAST(0 AS DECIMAL(38,0))"
    for s in syms:
        sumsq = f"({sumsq} + CAST(c{s} AS DECIMAL(38,0)) * c{s})"
    ndist = " + ".join(f"(CASE WHEN c{s} > 0 THEN 1 ELSE 0 END)" for s in syms)
    nsq = "CAST(n_nibbles AS DECIMAL(38,0)) * n_nibbles"
    return prof.select(
        id_col,
        F.expr("n_nibbles div 2").alias("n_bytes"),
        F.expr(f"CAST(({ndist}) AS INT)").alias("distinct_nibbles"),
        F.expr(
            f"CAST((2 * {sumsq} * 1000000 + {nsq})"
            f" div nullif(2 * {nsq}, 0) AS BIGINT)"
        ).alias("simpson_e6"),
    ).withColumn("suspect", F.col("simpson_e6") >= 250000)


def shard_pack(
    media: DataFrame,
    shard_bytes: int = 65536,
    n_shards: int = 16,
    salt: str = "m1",
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """WebDataset-style shard manifest: assign each media asset a
    (shard, pack_id, byte_offset) address inside fixed-byte-budget packs —
    the index a training loader seeks by, built WITHOUT writing the tar.

    Same sharded-greedy algebra as sampling.pack_sequences (content-hash
    shard -> id-ordered byte cumsum -> fixed pack boundaries), plus the
    within-pack byte offset (cum_prev minus the pack's first cum_prev).
    Assets are never split across packs; a pack overflows by at most one
    asset — the one-pass trade.  Engine-replayable end to end: hash shard,
    two window passes, exact integer arithmetic.

    At 100 TB the byte lengths come from a metadata column (never
    re-scan blobs to size them); parallelism = n_shards independent
    window partitions, so pick n_shards >> cores and let AQE balance."""
    from presto_ethereum_spark.operators.sampling import hash_bucket

    d = media.select(
        F.col(id_col).alias("media_id"),
        F.length(F.col(data_col)).cast("long").alias("n_bytes"),
        hash_bucket(F.col(id_col), buckets=n_shards, salt=salt).alias("shard"),
    )
    w_prev = (
        Window.partitionBy("shard")
        .orderBy("media_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_pack = Window.partitionBy("shard", "pack_id")
    return (
        d.withColumn("cum_prev", F.coalesce(F.sum("n_bytes").over(w_prev), F.lit(0)))
        .withColumn("pack_id", F.expr(f"cum_prev DIV {shard_bytes}"))
        .withColumn(
            "byte_offset",
            (F.col("cum_prev") - F.min("cum_prev").over(w_pack)).cast("long"),
        )
        .drop("cum_prev")
    )


def png_decode_screen(
    df: DataFrame, id_col: str = "media_id", data_col: str = "png"
) -> DataFrame:
    """Decode QUARANTINE screen — the try/except wrapper around the real
    PNG decode that a dirty crawl needs in front of png_decode_stats
    (which fails tasks loudly by design): per blob, did it decode, a
    short error class if not, and the dimensions if it did.  The
    corrupt rows route to quarantine instead of killing the ingest; the
    clean rows carry their dims forward.  Same mapInPandas shape and
    scale story as png_decode_stats."""
    from presto_ethereum_spark.operators.png import decode_png

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("ok", BooleanType()),
            StructField("err", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        for pdf in it:
            recs = []
            for mid, blob in zip(pdf[id_col], pdf[data_col]):
                try:
                    w, h, _, _ = decode_png(bytes(blob))
                    recs.append((int(mid), True, None, w, h))
                except ValueError as e:
                    msg = str(e)
                    kind = (
                        "bad-signature"
                        if "signature" in msg
                        else "bad-crc"
                        if "CRC" in msg
                        else "decode-error"
                    )
                    recs.append((int(mid), False, kind, None, None))
                except (struct.error, zlib.error, MemoryError):
                    # blobs truncated mid-chunk hit struct.unpack on a
                    # short slice; garbage IDAT hits zlib.decompress; a
                    # forged IHDR declaring absurd dimensions can push an
                    # allocation past the executor (ADVICE r12 #1) —
                    # all exactly the dirty-corpus corruption this
                    # screen exists to quarantine, not task-killers
                    recs.append((int(mid), False, "decode-error", None, None))
            yield pd.DataFrame(
                recs, columns=["media_id", "ok", "err", "width", "height"]
            )

    return df.select(id_col, data_col).mapInPandas(batches, out_schema)


def wav_decode_stats(
    df: DataFrame, id_col: str = "media_id", data_col: str = "wav"
) -> DataFrame:
    """REAL audio decode -> per-clip stats: sample rate, channels, frame
    count, total energy (exact integer sum of squares), peak |sample|,
    and the strict sign-change count on channel 0 — the audio analogue
    of png_decode_stats, with the codec step actually executed
    (operators/wav.py RIFF/PCM16 parser), not stubbed.

    All-integer outputs, so the differential against pre-encode ground
    truth is exact.  Same mapInPandas scale story as the image path;
    sum-of-squares stays in int64 up to ~2.1e9 frames/clip at full-scale
    int16 amplitude (a 13-hour 44.1 kHz clip) — beyond that widen to
    DECIMAL at the aggregation layer.  Out-of-profile containers fail
    loudly (ValueError); screen a dirty corpus upstream the way
    multimodal_png_corrupt_screen does for images."""
    from presto_ethereum_spark.operators.wav import decode_wav

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("rate", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("sum_sq", LongType()),
            StructField("peak", IntegerType()),
            StructField("zero_crossings", LongType()),
        ]
    )

    try:
        import numpy as np

        from presto_ethereum_spark.operators.wav import decode_wav_samples_np

        def clip_stats(blob: bytes):
            # vectorized kernel (VERDICT r11 #5): int64 sum of squares is
            # exact up to ~2^33 full-scale frames/clip, products for the
            # sign-change count stay in int64 — value-identical to the
            # per-sample reference below (property-pinned in test_png.py)
            rate, nch, n, a = decode_wav_samples_np(blob)
            s = a.astype(np.int64)
            ch0 = s[::nch]
            zc = int((ch0[:-1] * ch0[1:] < 0).sum())
            peak = int(np.abs(s).max()) if n else 0
            return rate, nch, n, int((s * s).sum()), peak, zc

    except ImportError:  # pragma: no cover - numpy is baked into this env

        def clip_stats(blob: bytes):
            rate, nch, n, samples = decode_wav(bytes(blob))
            ch0 = samples[::nch]
            zc = sum(1 for j in range(1, n) if ch0[j - 1] * ch0[j] < 0)
            return (
                rate,
                nch,
                n,
                sum(v * v for v in samples),
                max((abs(v) for v in samples), default=0),
                zc,
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for mid, blob in zip(pdf[id_col], pdf[data_col]):
                recs.append((int(mid),) + clip_stats(bytes(blob)))
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "rate", "channels", "n_frames",
                    "sum_sq", "peak", "zero_crossings",
                ],
            )

    return df.select(id_col, data_col).mapInPandas(batches, out_schema)
