#!/usr/bin/env python3
"""Deterministic synthetic MEDIA fixtures for the graded real-decode
entries (VERDICT r10 #6 and the audio extension).

Generates (seed=42): fixtures/media/images.parquet — one row per image:

  media_id      long     dense 0..N-1
  mime          string   'image/png'
  png           binary   a REAL baseline PNG (encoded by operators/png.py)
  true_width    int      ┐
  true_height   int      │ ground truth computed from the SOURCE pixel
  true_channels int      │ arrays BEFORE encoding — the graded Spark entry
  true_sum_r    long     │ (multimodal_png_decode_stats) must recover every
  true_sum_g    long     │ one of these from the compressed bytes alone,
  true_sum_b    long     │ so a hash match proves the decode, not the
  true_thumb_md5 string  ┘ bookkeeping

true_thumb_md5 is the md5 of the 8x8 nearest-neighbor thumbnail of the
PRE-ENCODE pixel array (png.nn_resize on raw source bytes); the Spark side
recomputes it from the DECODED bytes, pinning decode + resize end-to-end.

Content mix: gradients, checkerboards, stripes, solids, and seeded noise;
every PNG filter type 0..4 and both color types (grey / RGB) cycle through
the corpus, so all decoder reconstruction branches are exercised by graded
data, not just unit tests.

Sizes (VERDICT r12 #5): 7 of every 8 images are 48x44..96x72 — ABOVE the
numpy unfilter dispatch threshold (png._NP_MIN_BYTES = 2048 pixel bytes)
even in grayscale, so the graded decode entries exercise the VECTORIZED
kernel on the hot path; every 8th image stays 5x5..20x16 (below the
threshold) so auto-dispatch's reference-loop arm keeps graded coverage
too.  The kernel mix is pinned by tests/test_png.py
(test_fixture_exercises_numpy_kernel_on_hot_path).

Also fixtures/media/audio.parquet — one row per PCM16 WAV clip
(operators/wav.py encoder): sine / square / sawtooth / chirp / noise
waveforms, rates 8000/16000/22050, mono + stereo, 400..2000 frames, with
pre-encode ground truth (rate, channels, frames, total sum of squares,
peak |sample|, strict sign-change count on channel 0) the graded Spark
entry must recover from the container bytes alone.
"""

from __future__ import annotations

import hashlib
import random
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from presto_ethereum_spark.operators.png import (  # noqa: E402
    encode_png,
    nn_resize,
)
from presto_ethereum_spark.operators.wav import encode_wav  # noqa: E402

OUT = Path(__file__).resolve().parent / "media"
N_IMAGES = 240
N_CLIPS = 120
THUMB = 8


def _pixels(rng: random.Random, kind: str, w: int, h: int, gray: bool):
    """One image's pixel grid: rows of ints (gray) or RGB tuples."""

    def px(x: int, y: int) -> tuple[int, int, int]:
        if kind == "gradient":
            return (x * 255 // max(1, w - 1), y * 255 // max(1, h - 1), 128)
        if kind == "checker":
            on = (x // 4 + y // 4) % 2 == 0
            return (230, 40, 90) if on else (15, 200, 160)
        if kind == "stripes":
            return (255, 255, 0) if y % 3 == 0 else (0, 64, 192)
        if kind == "solid":
            return (77, 151, 19)
        return (rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))

    if gray:
        return [
            [sum(px(x, y)) // 3 for x in range(w)] for y in range(h)
        ]
    return [[px(x, y) for x in range(w)] for y in range(h)]


def main() -> None:
    rng = random.Random(42)
    kinds = ["gradient", "checker", "stripes", "solid", "noise"]
    rows: dict[str, list] = {
        "media_id": [], "mime": [], "png": [],
        "true_width": [], "true_height": [], "true_channels": [],
        "true_sum_r": [], "true_sum_g": [], "true_sum_b": [],
        "true_thumb_md5": [],
    }
    for i in range(N_IMAGES):
        kind = kinds[i % len(kinds)]
        gray = i % 7 == 3
        filt = i % 5
        if i % 30 == 7:
            # real-corpus-size cohort (8 images, 224-320 px): the regime
            # where the vectorized kernels win big (512x512 Paeth measured
            # 6.8x; see SCALE.md §6e) — graded, not just property-tested
            w, h = rng.randint(224, 320), rng.randint(224, 288)
        elif i % 8 == 5:  # sub-threshold tail: grades the reference-loop arm
            w, h = rng.randint(5, 20), rng.randint(5, 16)
        elif filt == 4 and not gray:
            # wavefront class dispatches on VECTOR WIDTH: Paeth-present
            # needs min(h,w)*nch >= png._NP_MIN_WAVE_WIDTH (160) —
            # min dim >= 56 keeps min(h,w)*3 >= 168, so RGB Paeth rows
            # grade the numpy wavefront; grey wavefront rows grade its
            # reference-loop arm
            w, h = rng.randint(56, 96), rng.randint(56, 84)
        elif filt == 3 and not gray:
            # Average-only wavefronts cross over later
            # (png._NP_MIN_AVG_WIDTH = 288): min dim >= 96 keeps
            # min(h,w)*3 >= 288
            w, h = rng.randint(96, 128), rng.randint(96, 120)
        else:  # >= 2048 pixel bytes even at nch=1: grades the numpy arm
            w, h = rng.randint(48, 96), rng.randint(44, 72)
        px = _pixels(rng, kind, w, h, gray)
        if gray:
            flat = bytes(v for row in px for v in row)
            sr = sg = sb = sum(flat)
            nch = 1
        else:
            flat = bytes(c for row in px for p in row for c in p)
            sr = sum(flat[0::3])
            sg = sum(flat[1::3])
            sb = sum(flat[2::3])
            nch = 3
        thumb = nn_resize(flat, w, h, nch, THUMB, THUMB)
        rows["media_id"].append(i)
        rows["mime"].append("image/png")
        rows["png"].append(encode_png(px, grayscale=gray, filter_type=filt))
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_channels"].append(nch)
        rows["true_sum_r"].append(sr)
        rows["true_sum_g"].append(sg)
        rows["true_sum_b"].append(sb)
        rows["true_thumb_md5"].append(hashlib.md5(thumb).hexdigest())

    OUT.mkdir(exist_ok=True)
    table = pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "mime": pa.array(rows["mime"], pa.string()),
            "png": pa.array(rows["png"], pa.binary()),
            "true_width": pa.array(rows["true_width"], pa.int32()),
            "true_height": pa.array(rows["true_height"], pa.int32()),
            "true_channels": pa.array(rows["true_channels"], pa.int32()),
            "true_sum_r": pa.array(rows["true_sum_r"], pa.int64()),
            "true_sum_g": pa.array(rows["true_sum_g"], pa.int64()),
            "true_sum_b": pa.array(rows["true_sum_b"], pa.int64()),
            "true_thumb_md5": pa.array(rows["true_thumb_md5"], pa.string()),
        }
    )
    pq.write_table(table, OUT / "images.parquet", compression="snappy")
    print(f"wrote {table.num_rows} images -> {OUT / 'images.parquet'}")
    _write_audio()


def _samples(rng: random.Random, kind: str, n: int, rate: int) -> list[int]:
    import math

    amp = 18000
    if kind == "sine":
        f = 220 + (n % 7) * 110
        return [
            int(round(amp * math.sin(2 * math.pi * f * i / rate)))
            for i in range(n)
        ]
    if kind == "square":
        period = max(8, rate // 440)
        return [amp if (i // (period // 2)) % 2 == 0 else -amp for i in range(n)]
    if kind == "saw":
        period = max(8, rate // 330)
        return [
            int(round(-amp + 2 * amp * (i % period) / (period - 1)))
            for i in range(n)
        ]
    if kind == "chirp":
        return [
            int(
                round(
                    amp
                    * math.sin(2 * math.pi * (110 + 900 * i / n) * i / rate)
                )
            )
            for i in range(n)
        ]
    return [rng.randint(-amp, amp) for _ in range(n)]


def _write_audio() -> None:
    rng = random.Random(4242)
    kinds = ["sine", "square", "saw", "chirp", "noise"]
    rates = [8000, 16000, 22050]
    rows: dict[str, list] = {
        "media_id": [], "mime": [], "wav": [],
        "true_rate": [], "true_channels": [], "true_frames": [],
        "true_sumsq": [], "true_peak": [], "true_zero_crossings": [],
    }
    for i in range(N_CLIPS):
        kind = kinds[i % len(kinds)]
        rate = rates[i % len(rates)]
        stereo = i % 4 == 1
        n = rng.randint(400, 2000)
        ch0 = _samples(rng, kind, n, rate)
        if stereo:
            ch1 = _samples(rng, kinds[(i + 2) % len(kinds)], n, rate)
            frames = list(zip(ch0, ch1))
            blob = encode_wav(frames, rate, 2)
            flat = [v for t in frames for v in t]
            nch = 2
        else:
            blob = encode_wav(ch0, rate, 1)
            flat = ch0
            nch = 1
        zc = sum(1 for j in range(1, n) if ch0[j - 1] * ch0[j] < 0)
        rows["media_id"].append(i)
        rows["mime"].append("audio/wav")
        rows["wav"].append(blob)
        rows["true_rate"].append(rate)
        rows["true_channels"].append(nch)
        rows["true_frames"].append(n)
        rows["true_sumsq"].append(sum(v * v for v in flat))
        rows["true_peak"].append(max(abs(v) for v in flat))
        rows["true_zero_crossings"].append(zc)

    table = pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "mime": pa.array(rows["mime"], pa.string()),
            "wav": pa.array(rows["wav"], pa.binary()),
            "true_rate": pa.array(rows["true_rate"], pa.int32()),
            "true_channels": pa.array(rows["true_channels"], pa.int32()),
            "true_frames": pa.array(rows["true_frames"], pa.int64()),
            "true_sumsq": pa.array(rows["true_sumsq"], pa.int64()),
            "true_peak": pa.array(rows["true_peak"], pa.int32()),
            "true_zero_crossings": pa.array(
                rows["true_zero_crossings"], pa.int64()
            ),
        }
    )
    pq.write_table(table, OUT / "audio.parquet", compression="snappy")
    print(f"wrote {table.num_rows} clips -> {OUT / 'audio.parquet'}")


if __name__ == "__main__":
    main()
