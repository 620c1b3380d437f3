"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery here is REAL and tested: schema, batch shape,
partitioning, Arrow transfer through ``mapInPandas``, deterministic
fake features. The actual codec step is STUBBED (image/audio libraries
are not in this container): ``decode_stub`` raises
``NotImplementedError`` when ``real_decode=True`` and otherwise derives
a deterministic fake feature vector from the payload bytes -- so the
pipeline shape (schema in/out, batch sizes, column pruning) is
exercised end-to-end without the codecs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + int(rng.randint(0, 512)))
        meta = (
            int(rng.randint(16, 512)),
            int(rng.randint(16, 512)),
            int(rng.randint(100, 60000)),
            "fake",
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: bytes ->
    fixed-dim float vector via repeated sha256 expansion."""
    out = np.empty(dim, dtype="float32")
    h = hashlib.sha256(payload).digest()
    buf = b""
    while len(buf) < dim * 4:
        h = hashlib.sha256(h).digest()
        buf += h
    raw = np.frombuffer(buf[: dim * 4], dtype="<u4").astype("float64")
    out[:] = (raw / 2**32).astype("float32")
    return out


def decode_features(
    media: DataFrame, dim: int = 16, real_decode: bool = False
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> FEATURE_SCHEMA via ``mapInPandas``
    (Arrow batches of whole payload columns -- the batch shape a real
    decoder would consume)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if real_decode:
                # STUB: this container has no image/audio codecs.
                raise NotImplementedError(
                    "real decode requires PIL/torchaudio/ffmpeg; "
                    "install and replace _fake_feature with the codec"
                )
            feats = [
                _fake_feature(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int32").values,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one row per planned frame (ts offset)
    per video -- pure built-ins (sequence+explode); the decode of each
    frame would ride decode_features. Demonstrates fan-out control:
    the explode factor is duration/every_ms, bounded per row."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )
