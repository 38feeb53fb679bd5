"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

Real decode is attempted behind OPTIONAL dependencies probed at runtime
(PIL for images, soundfile for audio — neither ships in this container):
when present, ``decode_image``/``decode_audio`` produce real features; when
absent they raise ``NotImplementedError`` unless ``fake=True``, in which
case a deterministic hash-derived feature vector is produced so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and testable end-to-end either way.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("data", BinaryType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _pil():
    """Optional-dependency probe: PIL when installed, else None."""
    try:
        from PIL import Image  # noqa: PLC0415 — runtime optional import
        return Image
    except ImportError:
        return None


def _soundfile():
    try:
        import soundfile  # noqa: PLC0415
        return soundfile
    except ImportError:
        return None


def decode_image(data: bytes, *, fake: bool = False,
                 dim: int = 16) -> np.ndarray:
    """Image bytes → feature vector.

    With PIL installed: decode, convert to grayscale, resize to a √dim×√dim
    thumbnail, normalize to [0,1) floats.  Without it: raise unless
    ``fake=True`` (deterministic hash-derived stand-in)."""
    img_mod = _pil()
    if img_mod is not None and not fake:
        side = max(int(dim ** 0.5), 1)
        img = img_mod.open(io.BytesIO(data)).convert("L").resize((side, side))
        arr = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
        return np.resize(arr, dim).astype(np.float32)
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL (not installed); pass fake=True for "
            "the deterministic stub (hash-derived pixels)")
    return _fake_features(data, dim)


def decode_audio(data: bytes, *, fake: bool = False,
                 dim: int = 16) -> np.ndarray:
    """Audio bytes → feature vector (dim-bucket mean-absolute envelope via
    soundfile when installed; deterministic stub otherwise)."""
    sf_mod = _soundfile()
    if sf_mod is not None and not fake:
        samples, _rate = sf_mod.read(io.BytesIO(data), dtype="float32")
        if samples.ndim > 1:
            samples = samples.mean(axis=1)
        if len(samples) == 0:
            return np.zeros(dim, dtype=np.float32)
        chunks = np.array_split(np.abs(samples), dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                        dtype=np.float32)
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile (not installed); pass "
            "fake=True for the deterministic stub")
    return _fake_features(data, dim)


def _fake_features(data: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-features: sha256 bytes → [0,1) floats."""
    digest = hashlib.sha256(data or b"").digest()
    reps = (dim * 4 + len(digest) - 1) // len(digest)
    raw = (digest * reps)[: dim * 4]
    arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
    return (arr / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(media: DataFrame, *, fake: bool = True,
                     feature_dim: int = 16) -> DataFrame:
    """media(MEDIA schema) → FEATURES via one Arrow-batched pass.

    Partitioning note: binary payloads can be MBs; repartition upstream so
    batches stay within Arrow limits (spark.sql.execution.arrow
    .maxRecordsPerBatch governs rows/batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                if kind == "image":
                    feat = decode_image(blob, fake=fake)
                elif kind == "audio":
                    feat = decode_audio(blob, fake=fake)
                else:  # video: frame-sample stub = image stub over strides
                    feat = _fake_features(blob, feature_dim) if fake else decode_image(blob)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "n_bytes": len(blob),
                        "sha256": hashlib.sha256(blob).hexdigest(),
                        "feature": feat[:feature_dim].tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES.fields])

    return media.select("media_id", "kind", "data").mapInPandas(run, schema=FEATURES)


def make_media_df(spark, n: int = 20) -> DataFrame:
    """Deterministic synthetic media table (no real codecs)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        data = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 5)
        rows.append((i, kind, f"application/x-fake-{kind}",
                     64 if kind == "image" else None,
                     64 if kind == "image" else None,
                     1000 * i if kind != "image" else None,
                     bytearray(data)))
    return spark.createDataFrame(rows, schema=MEDIA)
