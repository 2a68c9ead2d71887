"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

Decode status (r3): image (PNG), audio (WAV) and video (Y4M) decode
are all REAL -- pure-stdlib codecs in modal_codecs.py turn bytes into
pixels / PCM / frames and the features are computed from the decoded
signal. Compressed video containers (mp4/mkv) would need ffmpeg; at
scale the decode fn is swapped per container type behind the same
mapInPandas plumbing.

At 100 TB the pattern is: assets live in parquet binary columns (or
object-store paths), decode/feature-extract runs as mapInPandas so one
Python worker streams Arrow batches without materializing the whole
partition, and outputs are fixed-size feature arrays partitioned like
their source. Decode failures are per-row data (``decode_error``),
never job aborts -- same fault contract as the text pipeline
(reference: every field fn swallows exceptions, extractorAvaluos.py).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .modal_codecs import (
    FEATURE_DIM,
    audio_feature,
    decode_png,
    decode_wav,
    decode_y4m,
    encode_png,
    encode_wav,
    encode_y4m,
    image_feature,
    video_feature_from,
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("dec_width", T.IntegerType(), True),
        T.StructField("dec_height", T.IntegerType(), True),
        T.StructField("dec_sample_rate", T.IntegerType(), True),
        T.StructField("decode_error", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def _fake_feature(data: bytes) -> list[float]:
    """Deterministic placeholder for UNKNOWN kinds: 16 floats from the
    sha256 of the bytes."""
    h = hashlib.sha256(data or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_video(data: bytes) -> dict:
    """Real video decode for the Y4M container (uncompressed planar
    YUV -- the stdlib-parseable interchange format). Compressed
    containers would require ffmpeg; swap this fn at deploy time, the
    Spark plumbing is container-agnostic."""
    return decode_y4m(data)


def _extract_one(kind: str, data: bytes) -> dict:
    out = {
        "dec_width": None, "dec_height": None, "dec_sample_rate": None,
        "decode_error": None, "feature": None,
    }
    try:
        if kind == "image":
            img = decode_png(data)
            out["dec_width"], out["dec_height"] = img["width"], img["height"]
            out["feature"] = image_feature(data)
        elif kind == "audio":
            wav = decode_wav(data)
            out["dec_sample_rate"] = wav["sample_rate"]
            out["feature"] = audio_feature(data)
        elif kind == "video":
            vid = decode_video(data)
            out["dec_width"], out["dec_height"] = vid["width"], vid["height"]
            out["feature"] = video_feature_from(vid)  # no second decode
        else:
            out["feature"] = _fake_feature(data)
    except Exception as e:  # noqa: BLE001 -- fault boundary (CodecError etc.)
        out["decode_error"] = f"{type(e).__name__}: {e}"
    return out


def extract_features(assets: DataFrame) -> DataFrame:
    """asset rows -> decoded-metadata + fixed-dim feature rows,
    streaming Arrow batches through one mapInPandas pass."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _extract_one(k, d) for k, d in zip(pdf["kind"], pdf["data"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pdf["data"].map(lambda d: len(d or b"")).astype("int32"),
                    "dec_width": pd.array([d["dec_width"] for d in decoded], dtype="Int32"),
                    "dec_height": pd.array([d["dec_height"] for d in decoded], dtype="Int32"),
                    "dec_sample_rate": pd.array(
                        [d["dec_sample_rate"] for d in decoded], dtype="Int32"
                    ),
                    "decode_error": [d["decode_error"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return assets.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video assets: decode the Y4M container, keep
    every n-th REAL frame's luma plane. Undecodable payloads yield a
    single frame_idx=-1 row with null bytes (fault-row contract); a
    VALID zero-frame video yields zero rows (explode semantics --
    empty, not faulty)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    vid = decode_video(r["data"])
                    for i in range(0, vid["n_frames"], every_n):
                        rows.append(
                            {
                                "asset_id": r["asset_id"],
                                "frame_idx": i,
                                "frame_bytes": vid["y_planes"][i],
                            }
                        )
                except Exception:  # noqa: BLE001 -- fault boundary
                    rows.append(
                        {"asset_id": r["asset_id"], "frame_idx": -1, "frame_bytes": None}
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_bytes"])

    return assets.filter("kind = 'video'").mapInPandas(gen, FRAME_SCHEMA)


def synthetic_asset_rows(n: int = 20, seed: int = 42) -> list[tuple]:
    """Seeded assets with REAL payloads for all three kinds: decodable
    PNGs (8x8 RGB, rng pixels), WAVs (16-bit mono, rng-mixed sine) and
    Y4Ms (8 frames of 8x8 moving-gradient luma), so decode tests and
    goldens exercise the actual codecs end to end."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = h = 8
            pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
            data = encode_png(w, h, pixels, channels=3)
            rows.append((f"asset{i:04d}", kind, data, w, h, None, None))
        elif kind == "audio":
            n_samp = 256
            freq = rng.uniform(100.0, 800.0)
            amp = rng.randint(4000, 24000)
            samples = [
                int(amp * math.sin(2 * math.pi * freq * t / 16000.0))
                for t in range(n_samp)
            ]
            data = encode_wav(samples, sample_rate=16000)
            rows.append((f"asset{i:04d}", kind, data, None, None, 16000, None))
        else:
            w = h = 8
            n_frames = 8
            base = rng.randrange(200)
            frames = [
                bytes(
                    (base + 7 * f + x + y) % 256 for y in range(h) for x in range(w)
                )
                for f in range(n_frames)
            ]
            data = encode_y4m(w, h, frames, fps=(25, 1))
            rows.append((f"asset{i:04d}", kind, data, w, h, None, n_frames))
    return rows


def synthetic_assets(spark, n: int = 20, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synthetic_asset_rows(n, seed), ASSET_SCHEMA)
