"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a struct of typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Decoders:
- ``decoder="real"`` — a REAL production path for uncompressed 24-bit
  BMP, implemented in pure numpy (header parse, padded-row slicing,
  bottom-up flip, BGR→RGB, 16-bin luma-histogram feature).  Compressed
  codecs (JPEG/PNG/…) need libraries absent from this container and
  raise ValueError naming the format; plug PIL/libvips into
  ``_decode_real`` when deploying.
- ``decoder="fake"`` — a deterministic stand-in (sha256-seeded) for
  payloads of any format, exercising identical Spark-side plumbing:
  schema, batching, partition behavior.

Scale notes: payload columns dominate bytes; every stage selects only
(id, payload) so parquet column pruning keeps metadata-only queries off
the blobs, and mapInPandas streams Arrow batches without materializing
a partition in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

IMAGE_FEATURE_DIM = 16

image_feature_schema = StructType(
    [
        StructField("id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decoder: dimensions and a
    unit-norm feature vector derived from sha256(payload)."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    raw = np.frombuffer(
        hashlib.sha256(payload + b"#feat").digest() + hashlib.sha256(payload + b"#2").digest(),
        dtype=np.uint8,
    )[:IMAGE_FEATURE_DIM].astype(np.float32)
    norm = float(np.linalg.norm(raw)) or 1.0
    return width, height, raw / norm


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 RGB array as an uncompressed
    24-bit bottom-up BMP (BITMAPINFOHEADER) — the test/fixture twin of
    :func:`_decode_bmp`, pure bytes, no codec library."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    off = 14 + 40
    header = (
        b"BM"
        + (off + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + dib + rows.tobytes()


def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy decode of an uncompressed 24-bit BMP → (width,
    height, unit-norm 16-bin luma histogram feature).  Luma uses the
    BT.601 weights (0.299, 0.587, 0.114); bins are 16-wide gray ranges."""
    if payload[:2] != b"BM":
        raise ValueError(
            f"decoder='real' supports uncompressed 24-bit BMP only; payload "
            f"magic {payload[:2]!r} is a format needing codec libraries — "
            "plug PIL/libvips into multimodal._decode_real when deploying"
        )
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"decoder='real' supports uncompressed 24-bit BMP only "
            f"(got bpp={bpp}, compression={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    data = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=off)
    bgr = data.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    rgb = bgr[:, :, ::-1].astype(np.float64)
    gray = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    bins = np.clip(gray.astype(np.int64) // 16, 0, IMAGE_FEATURE_DIM - 1)
    hist = np.bincount(bins.ravel(), minlength=IMAGE_FEATURE_DIM).astype(np.float32)
    norm = float(np.linalg.norm(hist)) or 1.0
    return w, h, hist / norm


_decode_real = _decode_bmp  # deployment hook: swap for a full codec stack


def image_features(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    decoder: str = "fake",
    batch_hint: int = 1024,
) -> DataFrame:
    """Decode + feature-extract an image payload column.

    ``decoder="real"`` decodes uncompressed 24-bit BMP in pure numpy
    (see :func:`_decode_bmp`); other formats raise ValueError naming
    the gap — swap ``_decode_real`` for a PIL/libvips-backed kernel
    when deploying with codec libraries."""
    if decoder == "real":
        decode = _decode_real
    elif decoder == "fake":
        decode = _fake_decode
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                w, h, feat = decode(bytes(payload))
                rows.append((int(i), w, h, feat.tolist()))
            yield pd.DataFrame(rows, columns=["id", "width", "height", "feature"])

    return src.mapInPandas(run, schema=image_feature_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling plumbing: emits (id, frame_index, frame)
    rows — one output row per sampled frame.  The fake "codec" slices
    the payload into fixed 256-byte pseudo-frames; a real codec slots
    into ``split_frames`` unchanged."""
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("frame_index", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                frames = [b[o : o + 256] for o in range(0, len(b), 256)]
                for fi in range(0, len(frames), every_n):
                    out.append((int(i), fi, frames[fi]))
            yield pd.DataFrame(out, columns=["id", "frame_index", "frame"])

    return src.mapInPandas(run, schema=schema)
