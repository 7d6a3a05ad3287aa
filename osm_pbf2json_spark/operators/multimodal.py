"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side machinery — schemas, Arrow batch shapes, partitioning,
UDF signatures — is real and tested; the actual media decoding is STUBBED
(no image/audio libraries in this container): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (seeded from the payload hash) produces stable featurized
output so downstream operators are testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,duration_ms:int>"
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived from a
    cryptographic hash of the payload — stable across runs/machines."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def decode_features(
    media: DataFrame,
    fake: bool = False,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """media → (media_id, features array<float>) via mapInPandas.

    Real decode path is a stub: pass fake=True for the deterministic
    featurizer; False raises NotImplementedError (documented gap —
    the Spark plumbing is the deliverable here).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libs not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_decode(p if p is not None else b"").tolist()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    return media.mapInPandas(kernel, "media_id long, features array<float>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows derived
    from metadata only — pure Catalyst (sequence/explode); the actual
    frame grab is the stubbed decode step."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture rows for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        meta = {
            "width": 64 + (i % 8) * 16 if kind == "image" else None,
            "height": 64 + (i % 5) * 16 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 4000 + i * 250 if kind != "image" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
