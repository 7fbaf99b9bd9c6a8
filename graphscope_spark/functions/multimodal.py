"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a struct of typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Decoders:
- ``decoder="real"`` — REAL production paths for the codec-free
  formats, implemented in pure numpy: uncompressed 24-bit BMP for
  images (header parse, padded-row slicing, bottom-up flip, BGR→RGB,
  16-bin luma-histogram feature) and PCM 16-bit RIFF/WAVE for audio
  (chunk walk, mono/stereo, RMS/peak/zero-cross features).  Compressed
  codecs (JPEG/PNG/MP3/Ogg/…) need libraries absent from this
  container and raise ValueError naming the format; plug PIL/libvips
  into ``_decode_real`` and ffmpeg/soundfile into
  ``_decode_audio_real`` when deploying.  Video frame-sampling keeps a
  fake fixed-width "codec" (no container format is decodable without
  codec libs) behind the same plumbing.
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


def decode_bmp_pixels(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of an uncompressed 24-bit BMP → (h, w, 3)
    uint8 RGB array (top-down)."""
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
    return bgr[:, :, ::-1]


def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """BMP → (width, height, unit-norm 16-bin luma histogram feature).
    Luma uses the BT.601 weights (0.299, 0.587, 0.114); bins are
    16-wide gray ranges."""
    rgb_u8 = decode_bmp_pixels(payload)
    h, w = rgb_u8.shape[:2]
    rgb = rgb_u8.astype(np.float64)
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


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize: source index =
    floor((i + 0.5) · src/dst) — the pixel-center convention, so
    up- and down-scaling are both well-defined and reproducible."""
    sh, sw = pixels.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * sh / height).astype(np.int64), sh - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * sw / width).astype(np.int64), sw - 1)
    return pixels[rows][:, cols]


def image_resize(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "id",
    payload_col: str = "payload",
    decoder: str = "real",
) -> DataFrame:
    """Batch image resize: decode → nearest-neighbor resample →
    re-encode BMP.  Arrow-batched ``mapInPandas``, embarrassingly
    parallel (no shuffle): the canonical preprocessing stage before
    feature extraction or model input at 100 TB.  ``decoder="real"``
    is pure-numpy BMP (decode_bmp_pixels); other codecs plug in via
    ``_decode_real``'s deployment hook.

    Output schema: (id, width, height, payload) with the RESIZED
    dimensions and re-encoded payload.
    """
    if decoder != "real":
        raise ValueError("image_resize needs pixel access: decoder='real' only")

    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                px = decode_bmp_pixels(bytes(payload))
                out = resize_nearest(px, width, height)
                rows.append((int(i), width, height, encode_bmp(out)))
            yield pd.DataFrame(rows, columns=["id", "width", "height", "payload"])

    return src.mapInPandas(
        run, schema="id long, width int, height int, payload binary"
    )


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


# -- audio: PCM WAV, pure numpy ----------------------------------------
audio_feature_schema = StructType(
    [
        StructField("id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_sec", FloatType(), True),
        StructField("rms", FloatType(), True),
        StructField("peak", FloatType(), True),
        StructField("zero_cross_rate", FloatType(), True),
    ]
)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Serialize an int16 array — shape (n,) mono or (n, ch) — as a
    canonical RIFF/WAVE PCM file; the test/fixture twin of
    :func:`_decode_wav`, pure bytes, no codec library."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")          # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")     # block align
        + (16).to_bytes(2, "little")         # bits/sample
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy decode of a PCM 16-bit RIFF/WAVE payload →
    (sample_rate, channels, int16 array shaped (n, channels)).  Walks
    the RIFF chunk list (fmt may be followed by LIST/fact/cue chunks
    before data — real CC-crawled WAVs have them), supports mono or
    multi-channel, rejects compressed codecs by name."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            f"decoder='real' supports PCM RIFF/WAVE only; payload magic "
            f"{payload[:4]!r} is a format needing codec libraries — plug "
            "ffmpeg/soundfile into multimodal._decode_audio_real when deploying"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    codec = int.from_bytes(fmt[0:2], "little")
    ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if codec != 1 or bits != 16:
        raise ValueError(
            f"decoder='real' supports 16-bit PCM only (got codec={codec}, "
            f"bits={bits})"
        )
    n = len(data) // (2 * ch)
    pcm = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return rate, ch, pcm


_decode_audio_real = _decode_wav  # deployment hook: swap for ffmpeg/soundfile


def _fake_decode_audio(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in: sha256-seeded "samples" so the Spark
    plumbing is testable without codec libraries."""
    h = hashlib.sha256(payload).digest()
    rate = 8000 * (1 + h[0] % 3)
    n = 64 + h[1]
    raw = np.frombuffer(
        (hashlib.sha256(payload + b"#pcm").digest() * ((2 * n) // 32 + 1))[: 2 * n],
        dtype="<i2",
    ).reshape(n, 1)
    return rate, 1, raw


def audio_features(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """Decode + feature-extract an audio payload column: sample rate,
    channel count, duration, RMS/peak level (float in [-1, 1] units),
    and zero-crossing rate of the channel-mean signal.

    ``decoder="real"`` decodes PCM 16-bit RIFF/WAVE in pure numpy (see
    :func:`_decode_wav`); compressed formats raise ValueError naming the
    gap.  Arrow-batched ``mapInPandas`` — one Python hop per batch, no
    per-row UDFs; scale shape identical to :func:`image_features`."""
    if decoder == "real":
        decode = _decode_audio_real
    elif decoder == "fake":
        decode = _fake_decode_audio
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                rate, ch, pcm = decode(bytes(payload))
                x = pcm.astype(np.float64) / 32768.0
                mono = x.mean(axis=1)
                n = pcm.shape[0]
                rms = float(np.sqrt((x * x).mean())) if n else 0.0
                peak = float(np.abs(x).max()) if n else 0.0
                zc = (
                    float((np.diff(np.signbit(mono)) != 0).sum() / (n - 1))
                    if n > 1
                    else 0.0
                )
                rows.append(
                    (int(i), rate, ch, n, n / rate if rate else 0.0, rms, peak, zc)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id",
                    "sample_rate",
                    "channels",
                    "n_samples",
                    "duration_sec",
                    "rms",
                    "peak",
                    "zero_cross_rate",
                ],
            )

    return src.mapInPandas(run, schema=audio_feature_schema)
