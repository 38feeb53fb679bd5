"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libs are not in this container):
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic hash-derived feature vector is
produced so the Spark-side plumbing — schema, partitioning, UDF signature,
Arrow batch shape — is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
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


def decode_image(data: bytes, *, fake: bool = False) -> np.ndarray:
    """Real decode requires PIL/opencv — not shipped here."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv; pass fake=True for the "
            "deterministic stub (hash-derived pixels)")
    return _fake_features(data, 16)


def decode_audio(data: bytes, *, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa; pass fake=True for "
            "the deterministic stub")
    return _fake_features(data, 16)


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
