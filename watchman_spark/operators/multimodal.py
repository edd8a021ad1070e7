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
    real encoder without touching the Spark plumbing.

    r6 (guide §4.1): mapInPandas ships EVERY input column through Arrow —
    Spark cannot see which columns the function touches — so the input is
    explicitly projected to the four columns the extractor reads (the
    media table also carries width/height, which would otherwise ride
    the Python boundary for nothing)."""

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

    return media.select("doc_id", "media_type", "n_bytes", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize slot — no imaging library exists in this sandbox."""
    raise NotImplementedError(
        "image resizing requires an imaging library (e.g. Pillow) on the "
        "executors; install it cluster-side and replace this stub"
    )


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in with the real contract's shape: output size
    scales with the target box (w*h // 256 bytes, content derived from the
    payload digest stream)."""
    n = max(1, (w * h) // 256)
    h0 = hashlib.sha256(payload).digest()
    return (h0 * (n // len(h0) + 1))[:n]


RESIZED_SCHEMA = (
    "doc_id long, media_type string, target_w int, target_h int, resized binary"
)


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Arrow-batched resize over image payloads (mapInPandas): non-image
    rows pass through with resized=NULL; payload bytes never cross Python
    row-at-a-time. Swap ``_fake_resize`` for a real codec (resize_image)
    without touching the Spark plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                _fake_resize(p if isinstance(p, bytes) else bytes(p), target_w, target_h)
                if mt.startswith("image/")
                else None
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized": resized,
                }
            )

    # guide §4.1: project to the columns the resizer reads
    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads (mapInPandas, 1->N rows): emits up
    to ``max_frames`` evenly spaced 'frames' per video. The stub slices the
    payload byte stream deterministically — a real build decodes with e.g.
    PyAV executor-side; the Spark contract (schema, fan-out shape, Arrow
    batching) is identical. Non-video rows emit no frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p, mt in zip(pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                if not mt.startswith("video/"):
                    continue
                raw = p if isinstance(p, bytes) else bytes(p)
                n = min(max_frames, max(1, len(raw) // every_n_bytes))
                for i in range(n):
                    off = (i * len(raw)) // n
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[off : off + every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    # guide §4.1: project to the columns the sampler reads
    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )
