"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` so
the Spark-side contract (schema, partitioning, batch shape) is real and
tested even though the actual codecs are STUBBED here — the sandbox has no
image/audio libraries, so ``decode_image`` raises NotImplementedError and
``fake_features`` produces a deterministic sha-derived vector instead.
At 100 TB the shape matters: payloads never pass through Python row-wise,
batches stream through Arrow, and feature extraction is embarrassingly
parallel (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int, n_bytes long"
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text table: payload = utf-8
    bytes of the text (stands in for encoded image bytes), typed metadata
    derived from content."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.pmod(F.xxhash64(id_col), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64(id_col, F.lit(1)), F.lit(1080)) + 1).cast("int").alias("height"),
        F.length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder slot — no imaging library exists in this sandbox."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow) on the "
        "executors; install it cluster-side and replace this stub"
    )


def _fake_feature_vec(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic unit vector from the payload digest — a stand-in with
    the same shape/dtype contract a real encoder would have."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    return (v / np.linalg.norm(v)).astype(np.float32)


FEATURES_SCHEMA = "doc_id long, media_type string, n_bytes long, features array<float>"


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    The stub vectorizer is deterministic; swap ``_fake_feature_vec`` for a
    real encoder without touching the Spark plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature_vec(p if isinstance(p, bytes) else bytes(p), dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)
