"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schema, Arrow batch shape through
``mapInPandas``, partitioning, column pruning) is real AND the decode
step is real byte-level decoding, pure stdlib -- no image/audio
libraries exist in this container, so the generator writes genuine
self-describing formats the decoder then parses:

* image -- uncompressed 24-bit BMP (BITMAPFILEHEADER +
  BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes);
* audio -- WAV RIFF, PCM16 mono (44-byte canonical header + samples);
* video -- a minimal documented container ``RAWV`` (magic, u16 frame
  count, then length-prefixed BMP frames) -- frame sampling decodes
  individual frames with the same BMP parser.

``decode_features`` extracts a fixed-dim float vector per row: header
fields (width/height/rate/frames) plus pixel/sample statistics
computed from the decoded payload. A heavier codec (JPEG/Opus/H.264)
would drop into the same ``mapInPandas`` slot with the same batch
shape.
"""

from __future__ import annotations

import struct
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


# ------------------------- encoders (generator) -------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + pad)
    return header + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Raises ValueError on non-BMP."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        start = off + (h - 1 - y) * row_size
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=start)
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> canonical 44-byte-header WAV bytes."""
    raw = samples.astype("<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(raw), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(raw))
        + raw
    )


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    rate = struct.unpack_from("<I", data, 24)[0]
    n = struct.unpack_from("<I", data, 40)[0]
    return rate, np.frombuffer(data, dtype="<i2", count=n // 2, offset=44)


def encode_rawv(frames: list[np.ndarray]) -> bytes:
    """list of (h, w, 3) frames -> RAWV container: magic + u16 count +
    per-frame u32-length-prefixed BMP blobs."""
    blobs = [encode_bmp(f) for f in frames]
    out = [struct.pack("<4sH", b"RAWV", len(blobs))]
    for bl in blobs:
        out.append(struct.pack("<I", len(bl)))
        out.append(bl)
    return b"".join(out)


def decode_rawv(data: bytes) -> list[bytes]:
    """RAWV bytes -> list of BMP frame blobs (undecoded)."""
    if data[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    (n,) = struct.unpack_from("<H", data, 4)
    frames, pos = [], 6
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        frames.append(data[pos : pos + ln])
        pos += ln
    return frames


def synth_media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    """Deterministic synthetic media rows with REAL encoded payloads
    (BMP images, PCM16 WAV audio, RAWV multi-frame video) -- shared by
    the Spark DataFrame builder and the fixture parquet writer so both
    engines see byte-identical payloads."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = int(rng.randint(4, 24)), int(rng.randint(4, 24))
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            payload, meta = encode_bmp(px), (w, h, None, "bmp24")
        elif kind == "audio":
            rate = int(rng.choice([8000, 16000]))
            n_samp = int(rng.randint(64, 512))
            samp = (
                np.sin(np.arange(n_samp) * float(rng.rand()) * 0.5) * 8000
                + rng.normal(0, 500, n_samp)
            ).astype(np.int16)
            payload = encode_wav(samp, rate)
            meta = (None, None, int(n_samp * 1000 / rate), "pcm16")
        else:
            w, h = int(rng.randint(4, 12)), int(rng.randint(4, 12))
            n_frames = int(rng.randint(2, 6))
            frames = [
                rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                for _ in range(n_frames)
            ]
            payload = encode_rawv(frames)
            meta = (w, h, n_frames * 40, "rawv")
        rows.append((i, kind, bytearray(payload), meta))
    return rows


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """``synth_media_rows`` as a Spark DataFrame (MEDIA_SCHEMA)."""
    return spark.createDataFrame(synth_media_rows(n, seed), schema=MEDIA_SCHEMA)


# ------------------------- feature extraction -------------------------

def _pad(vals: list[float], dim: int) -> list[float]:
    out = (vals + [0.0] * dim)[:dim]
    return [float(np.float32(v)) for v in out]


def _image_feature(data: bytes, dim: int) -> list[float]:
    px = decode_bmp(data).astype("float64")
    h, w, _ = px.shape
    gray = px.mean(axis=2)
    return _pad(
        [1.0, w, h, px[..., 0].mean(), px[..., 1].mean(), px[..., 2].mean(),
         gray.std()],
        dim,
    )


def _audio_feature(data: bytes, dim: int) -> list[float]:
    rate, samp = decode_wav(data)
    s = samp.astype("float64")
    zc = int(np.sum(np.abs(np.diff(np.signbit(s)))))
    rms = float(np.sqrt(np.mean(s**2))) if len(s) else 0.0
    return _pad(
        [2.0, rate / 1000.0, float(len(s)), s.mean() if len(s) else 0.0,
         rms, float(np.max(np.abs(s))) if len(s) else 0.0, float(zc)],
        dim,
    )


def _video_feature(data: bytes, dim: int) -> list[float]:
    blobs = decode_rawv(data)
    first = decode_bmp(blobs[0]).astype("float64")
    mid = decode_bmp(blobs[len(blobs) // 2]).astype("float64")
    h, w, _ = first.shape
    return _pad(
        [3.0, w, h, float(len(blobs)), first.mean(), mid.mean(),
         first.std()],
        dim,
    )


_DECODERS = {"image": _image_feature, "audio": _audio_feature,
             "video": _video_feature}


def decode_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media (MEDIA_SCHEMA) -> FEATURE_SCHEMA via ``mapInPandas``
    (Arrow batches of whole payload columns -- the batch shape a real
    codec consumes). Decoding is genuine byte-level parsing of the
    BMP/WAV/RAWV payloads; an unrecognized payload raises (bad rows
    should be routed to a quarantine sink upstream, not silently
    zeroed)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                _DECODERS[k](bytes(p), dim)
                for k, p in zip(pdf["kind"], pdf["payload"])
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


META_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def decode_meta(media: DataFrame) -> DataFrame:
    """Header-level decode through the SAME byte-level parsers as
    ``decode_features``, emitting only SQL-expressible columns:
    (media_id, kind, n_bytes, width, height) -- width/height come from
    the DECODED payload header (BMP dims; first RAWV frame's dims;
    null for audio), never from the stored meta struct, so the DuckDB
    oracle cross-checking against ``meta.width``/``octet_length``
    genuinely verifies the decoder."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            widths, heights = [], []
            for k, p in zip(pdf["kind"], pdf["payload"]):
                data = bytes(p)
                if k == "image":
                    px = decode_bmp(data)
                    heights.append(px.shape[0])
                    widths.append(px.shape[1])
                elif k == "video":
                    px = decode_bmp(decode_rawv(data)[0])
                    heights.append(px.shape[0])
                    widths.append(px.shape[1])
                else:  # audio: validate the header, dims are null
                    decode_wav(data)
                    widths.append(None)
                    heights.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pdf["payload"].map(len).astype("int32").values,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=META_DECODE_SCHEMA
    )


FEATURE_ERR_SCHEMA = T.StructType(
    list(FEATURE_SCHEMA.fields)
    + [T.StructField("err", T.StringType(), True)]
)


def decode_features_safe(media: DataFrame, dim: int = 16) -> DataFrame:
    """Quarantining variant of ``decode_features``: a payload that
    fails to decode yields a row with ``err`` set (and a zero feature)
    instead of failing the task -- at 100 TB a handful of corrupt blobs
    must not kill the job; filter ``err IS NOT NULL`` into a
    quarantine sink and keep going."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, errs = [], []
            for k, p in zip(pdf["kind"], pdf["payload"]):
                try:
                    feats.append(_DECODERS[k](bytes(p), dim))
                    errs.append(None)
                except Exception as ex:  # corrupt payload -> quarantine
                    feats.append([0.0] * dim)
                    errs.append(f"{type(ex).__name__}: {ex}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int32").values,
                    "err": errs,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURE_ERR_SCHEMA
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
