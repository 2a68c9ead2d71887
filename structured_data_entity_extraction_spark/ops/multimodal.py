"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``. The decode kernels themselves are STUBBED (the
image/audio libraries are not in this container -- see the
``NotImplementedError`` markers); everything Spark-side is real and
tested: schemas, partitioning, UDF signatures, batch shapes.

At 100 TB the pattern is: assets live in parquet binary columns (or
object-store paths), decode/feature-extract runs as mapInPandas so one
Python worker streams Arrow batches without materializing the whole
partition, and outputs are fixed-size feature arrays partitioned like
their source.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

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

FEATURE_DIM = 16


def _fake_feature(data: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: 16 floats derived from
    the sha256 of the bytes. REPLACE with a real decode+encode (PIL /
    torchaudio / decord) when the libs are available."""
    h = hashlib.sha256(data or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_image(data: bytes):
    """Real image decode -- unavailable in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not installed in this environment"
    )


def extract_features(assets: DataFrame, real_decode: bool = False) -> DataFrame:
    """asset rows -> fixed-dim feature rows, streaming Arrow batches."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                pdf["data"].map(decode_image)  # raises: stub boundary
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda d: len(d or b"")).astype("int32"),
                    "feature": pdf["data"].map(_fake_feature),
                }
            )

    return assets.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 2, frame_size: int = 64) -> DataFrame:
    """Deterministic frame sampling for video assets: slice the binary
    payload into fixed-size pseudo-frames, keep every n-th. (The slicing
    is the stub; the explode-shaped output contract is the real part.)"""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = r["data"] or b""
                n = max(1, len(data) // frame_size)
                for i in range(0, n, every_n):
                    rows.append(
                        {
                            "asset_id": r["asset_id"],
                            "frame_idx": i,
                            "frame_bytes": data[i * frame_size : (i + 1) * frame_size],
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_bytes"])

    return assets.filter("kind = 'video'").mapInPandas(gen, FRAME_SCHEMA)


def synthetic_assets(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Seeded fake binary assets for tests."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        data = bytes(rng.randrange(256) for _ in range(rng.randint(64, 512)))
        rows.append(
            (
                f"asset{i:04d}",
                kind,
                data,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                16000 if kind == "audio" else None,
                8 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
