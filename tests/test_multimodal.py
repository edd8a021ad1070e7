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


def test_resize_media_contract(spark):
    """Resize plumbing: image rows get a resized blob sized by the target
    box, non-image rows pass through NULL; deterministic across runs."""
    from watchman_spark.operators.multimodal import resize_media, synthesize_media

    docs = spark.createDataFrame(
        [(i, f"payload text {i} " * 5) for i in range(9)], ["doc_id", "text"]
    )
    media = synthesize_media(docs, id_col="doc_id", text_col="text")
    out = {r["doc_id"]: r for r in resize_media(media, 64, 64).collect()}
    assert len(out) == 9
    for doc_id, r in out.items():
        if r["media_type"].startswith("image/"):
            assert r["resized"] is not None and len(r["resized"]) == (64 * 64) // 256
        else:
            assert r["resized"] is None
    again = {r["doc_id"]: r for r in resize_media(media, 64, 64).collect()}
    assert all(bytes(out[k]["resized"] or b"") == bytes(again[k]["resized"] or b"") for k in out)


def test_sample_frames_contract(spark):
    """Frame sampling: only video rows fan out, at most max_frames rows,
    frame_idx dense from 0, deterministic slices."""
    from pyspark.sql import functions as F

    from watchman_spark.operators.multimodal import sample_frames, synthesize_media

    docs = spark.createDataFrame(
        [(i, f"some longer video-ish payload {i} " * 10) for i in range(9)],
        ["doc_id", "text"],
    )
    media = synthesize_media(docs, id_col="doc_id", text_col="text")
    videos = {r["doc_id"] for r in media.filter(F.col("media_type") == "video/mp4").collect()}
    frames = sample_frames(media, every_n_bytes=64, max_frames=4).collect()
    assert {r["doc_id"] for r in frames} == videos
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        assert 0 < len(bytes(r["frame"])) <= 64
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs))) and len(idxs) <= 4
