"""BM25 retrieval semantics (operators/retrieval.py): independent
recompute, ranking properties, and the broadcast/top-k plan shape."""

from __future__ import annotations

import math

import pytest

from watchman_spark.operators.retrieval import bm25_scores, bm25_topk

DOCS = [
    (1, "spark shuffle hash join hash hash"),
    (2, "vector search with hash buckets"),
    (3, "plain prose about nothing relevant"),
    (4, "merge sort merge join merge merge merge"),
    (5, "stream stream"),
]
TERMS = ["hash", "vector", "merge", "stream"]


def _expected() -> dict[int, float]:
    n = len(DOCS)
    toks = {d: t.split(" ") for d, t in DOCS}
    total = sum(len(v) for v in toks.values())
    tf = {
        (d, w): toks[d].count(w) for d in toks for w in TERMS if w in toks[d]
    }
    df = {w: sum(1 for d in toks if (d, w) in tf) for w in TERMS}
    out: dict[int, float] = {}
    for (d, w), f in tf.items():
        idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
        norm = 1.0 - 0.75 + 0.75 * (len(toks[d]) * n / total)
        s = round(idf * (f * 2.2) / (f + 1.2 * norm), 4)
        out[d] = out.get(d, 0.0) + s
    return {d: round(s, 4) for d, s in out.items()}


def test_bm25_matches_independent_recompute(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, TERMS).collect()}
    assert got == pytest.approx(_expected())
    assert 3 not in got  # no matching term -> absent, not zero-scored


def test_bm25_ranking_properties(spark):
    """More occurrences of a rarer term outranks fewer of a common one;
    repeated tf saturates (k1 damping) rather than growing linearly."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    top = bm25_topk(df, TERMS, k=5).collect()
    assert [r["doc_id"] for r in top][0] == 4  # merge x5, rare term
    scores = {r["doc_id"]: r["score"] for r in top}
    # doc 4 has 5x the tf of doc 2's single terms but nowhere near 5x score
    assert scores[4] < 3 * scores[2]


def test_bm25_topk_plan(spark):
    """Corpus stats and df join as broadcasts; top-k is
    TakeOrderedAndProject (no global sort of the scored table)."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = bm25_topk(df, TERMS, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
