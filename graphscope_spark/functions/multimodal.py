"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a struct of typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.  The decode kernels themselves
need codec libraries not present in this container, so they are STUBBED
(clearly marked below): ``decoder="real"`` raises NotImplementedError;
``decoder="fake"`` is a deterministic stand-in (sha256-seeded) that
exercises the real Spark-side plumbing — schema, batching, partition
behavior — and is what the tests run.

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


def image_features(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    decoder: str = "fake",
    batch_hint: int = 1024,
) -> DataFrame:
    """Decode + feature-extract an image payload column.

    ``decoder="real"`` is the production path — NOT IMPLEMENTED here
    (no codec libs in this environment); wire an actual decoder
    (e.g. PIL/libvips) into ``decode_one`` when deploying."""
    if decoder == "real":
        raise NotImplementedError(
            "real image decoding requires codec libraries not present in "
            "this environment; use decoder='fake' (deterministic) or plug "
            "a decoder into image_features.decode_one"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                w, h, feat = _fake_decode(bytes(payload))
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
