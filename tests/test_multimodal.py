"""Multimodal plumbing: the Spark-side contract (schema, Arrow batching,
determinism) is real even though codecs are stubbed (no imaging libs in
this sandbox)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from watchman_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text number {i} " * (i + 1)) for i in range(12)],
        "doc_id long, text string",
    )
    return mm.synthesize_media(docs, "doc_id", "text")


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "width": "int",
        "height": "int",
        "n_bytes": "bigint",
    }
    rows = media.collect()
    assert {r["media_type"] for r in rows} <= {"image/png", "audio/wav", "video/mp4"}
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in rows)


def test_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_feature_extraction_contract(media):
    feats = mm.extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        v = r["features"]
        assert len(v) == 16
        norm = sum(x * x for x in v) ** 0.5
        assert abs(norm - 1.0) < 1e-3  # unit vectors
    # deterministic: same payload -> same features
    again = {r["doc_id"]: list(r["features"]) for r in mm.extract_features(media, dim=16).collect()}
    first = {r["doc_id"]: list(r["features"]) for r in rows}
    assert again == first


def test_features_usable_for_ann(spark, media):
    """The fake features plug into the similarity operators — the full
    multimodal → embedding → dedup path is wired."""
    from watchman_spark.operators.similarity import brute_force_topk

    feats = mm.extract_features(media, dim=16).withColumnRenamed("features", "embedding")
    q = feats.filter(F.col("doc_id") == 0).select(F.col("embedding").alias("q"))
    top = brute_force_topk(feats, q, id_col="doc_id", vec_col="embedding", k=3).collect()
    assert top[0]["doc_id"] == 0 and top[0]["cos_sim"] == 1.0
