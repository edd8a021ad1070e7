"""Reproducible sampling / split assignment / sequence packing
(operators/sampling.py): determinism, engine portability of the hash
predicate, split totality, and the packing invariants."""

from __future__ import annotations

import hashlib
import json

import pytest

from pyspark.sql import functions as F

from watchman_spark.operators import sampling
from watchman_spark.operators.sampling import (
    frac_to_hex_threshold,
    hash_sample,
    pack_sequences,
    with_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(20_000).select(F.col("id").alias("doc_id")).cache()


def test_hash_sample_deterministic_and_sized(spark, ids):
    a = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.1).collect()}
    b = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.1).collect()}
    assert a == b  # same rows every run — not rand()
    # realized fraction within 4 sigma of binomial noise around 6554/65536
    p = round(0.1 * 65536) / 65536
    n = 20_000
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(len(a) - n * p) < 4 * sigma
    # nested fractions: the 5% sample is a SUBSET of the 10% sample (hex
    # thresholds are ordered), which is what makes sample sizes tunable
    # without reshuffling which rows are selected
    small = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.05).collect()}
    assert small < a


def test_hash_sample_full_and_empty_fracs(spark, ids):
    """Edge fracs: 1.0 selects EVERYTHING ('g' sorts after every hex digit
    — the naive 5-char '10000' threshold would select ~nothing), 0.0
    selects nothing."""
    assert frac_to_hex_threshold(1.0) == "g"
    assert hash_sample(ids, "doc_id", 1.0).count() == 20_000
    assert hash_sample(ids, "doc_id", 0.0).count() == 0


def test_hash_predicate_matches_python_md5(spark, ids):
    """Engine portability: Spark's md5-hex-prefix decision equals hashlib's
    for the same stringified key — the property that lets DuckDB (or any
    engine) reproduce the exact sample."""
    got = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.1).limit(5000).collect()}
    thr = frac_to_hex_threshold(0.1)
    for doc_id in list(got)[:200]:
        assert hashlib.md5(str(doc_id).encode()).hexdigest()[:4] < thr


def test_with_split_total_and_stable(spark, ids):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = with_split(ids, "doc_id", splits)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 20_000  # total: every row exactly one split
    assert set(counts) == set(splits)
    for name, frac in splits.items():
        assert abs(counts[name] - 20_000 * frac) < 4 * (20_000 * frac * (1 - frac)) ** 0.5
    # stable under repartitioning (pure per-row map, no order dependence)
    re = with_split(ids.repartition(13), "doc_id", splits)
    assert out.exceptAll(re).count() == 0 and re.exceptAll(out).count() == 0


def test_with_split_rejects_bad_fractions(spark, ids):
    with pytest.raises(ValueError):
        with_split(ids, "doc_id", {"a": 0.5, "b": 0.4})


def test_pack_sequences_invariants(spark):
    """Every doc in exactly one pack exactly once; capacity respected except
    single oversized docs; deterministic across runs."""
    n = 5_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # deterministic sizes 1..600 with a few oversized (> max_tokens)
        (F.pmod(F.xxhash64("id"), F.lit(600)) + 1).alias("n_tok"),
    )
    max_tokens = 512
    packs = pack_sequences(docs, "doc_id", "n_tok", max_tokens, n_buckets=8).collect()
    seen: list[int] = []
    for p in packs:
        ids_ = list(p["doc_ids"])
        assert p["n_docs"] == len(ids_)
        assert p["total_tokens"] <= max_tokens or len(ids_) == 1  # oversized alone
        seen.extend(ids_)
    assert sorted(seen) == list(range(n))  # exactly once each
    # token conservation
    want_total = docs.agg(F.sum("n_tok")).collect()[0][0]
    assert sum(p["total_tokens"] for p in packs) == want_total
    # determinism
    again = pack_sequences(docs, "doc_id", "n_tok", max_tokens, n_buckets=8).collect()
    assert sorted((p["pack_id"], tuple(p["doc_ids"])) for p in again) == sorted(
        (p["pack_id"], tuple(p["doc_ids"])) for p in packs
    )
    # BFD actually packs: mean fill of multi-doc packs is high
    fills = [p["fill_ratio"] for p in packs if p["total_tokens"] <= max_tokens]
    assert sum(fills) / len(fills) > 0.8


def test_pack_sequences_null_id_fails_fast(spark):
    """A null id must raise a legible ValueError naming id_col (previously
    an opaque astype ValueError deep in the executor, plus a degenerate
    null-hash bucket)."""
    docs = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "doc_id long, n_tok long"
    )
    with pytest.raises(Exception) as ei:
        pack_sequences(docs, "doc_id", "n_tok", 64, n_buckets=4).collect()
    assert "pack_sequences: id_col 'doc_id' contains null" in str(ei.value)


def test_pack_query_driver_shape(spark):
    """The registered pack_sequences query exposes only canonicalizable
    scalars (doc_ids as JSON, not a raw array cell)."""
    from watchman_spark.queries_text import pack_sequences_q

    out = pack_sequences_q(spark, "/root/testdata/sf0.001")
    kinds = dict(out.dtypes)
    assert kinds["doc_ids_json"] == "string"
    row = out.limit(1).collect()[0]
    assert json.loads(row["doc_ids_json"]) == list(json.loads(row["doc_ids_json"]))


def test_docs_prep_pipeline_composition(spark):
    """The composed corpus-prep query: doc and token conservation through
    the pack stage, split totality, and agreement with the independently
    computed filter→dedup→split stage (SQL-free cross-check)."""
    from pyspark.sql import Window

    from watchman_spark.operators import sampling as smp
    from watchman_spark.operators import textstats
    from watchman_spark.queries_text import _SPLITS, docs_prep_pipeline

    sf = "/root/testdata/sf0.001"
    rows = {r["split"]: r for r in docs_prep_pipeline(spark, sf).collect()}
    assert set(rows) == set(_SPLITS)

    # independent reference: same filter + dedup + split WITHOUT packing
    d = spark.read.parquet(f"{sf}/documents.parquet")
    tok = textstats.token_count_ws(F.col("text"))
    clean = d.filter(
        tok.between(5, 1000)
        & (textstats.quality_score(F.col("text")) >= 0.3)
        & (textstats.stopword_hits(F.col("text"), "en") > 0)
    )
    rn = F.row_number().over(Window.partitionBy("text").orderBy("doc_id"))
    unique = clean.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    ref = {
        r["split"]: (r["n"], r["tok"])
        for r in smp.with_split(unique, "doc_id", _SPLITS)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(textstats.token_count_ws(F.col("text"))).alias("tok"))
        .collect()
    }
    for name in _SPLITS:
        assert rows[name]["n_docs"] == ref[name][0]          # doc conservation
        assert rows[name]["total_tokens"] == ref[name][1]    # token conservation
        assert rows[name]["n_packs"] <= ref[name][0]         # packing packs
        assert 0 < rows[name]["mean_fill"] <= 1.0


def test_hash_sample_string_key_and_unit_preservation(spark):
    """String keys hash by their exact characters (md5 of the string, no
    numeric coercion), and sampling on a grouping key keeps or drops whole
    units: every selected unit appears with ALL its rows."""
    rows = [(f"user{u}", i) for u in range(300) for i in range(u % 4 + 1)]
    df = spark.createDataFrame(rows, ["uid", "row_id"])
    picked = hash_sample(df, "uid", 0.3).collect()
    got_counts: dict[str, int] = {}
    for r in picked:
        got_counts[r["uid"]] = got_counts.get(r["uid"], 0) + 1
    thr = frac_to_hex_threshold(0.3)
    for uid, n in got_counts.items():
        assert hashlib.md5(uid.encode()).hexdigest()[:4] < thr  # string-key parity
        u = int(uid[4:])
        assert n == u % 4 + 1  # the whole unit came along
    # and no selected-by-hash unit is missing
    want = {f"user{u}" for u in range(300)
            if hashlib.md5(f"user{u}".encode()).hexdigest()[:4] < thr}
    assert set(got_counts) == want


def test_pack_sequences_grouped_equals_per_group(spark):
    """group_cols packing (one job) must produce EXACTLY the packs of
    running pack_sequences separately per group — the property that makes
    the single-pass docs_prep_pipeline a pure shape change."""
    n = 3_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(600)) + 1).alias("n_tok"),
        F.when(F.col("id") % 3 == 0, "train")
        .when(F.col("id") % 3 == 1, "val")
        .otherwise("test")
        .alias("split"),
    )
    grouped = pack_sequences(
        docs, "doc_id", "n_tok", 512, n_buckets=8, group_cols=["split"]
    ).collect()
    got = {
        (r["split"], r["pack_id"]): (tuple(r["doc_ids"]), r["total_tokens"])
        for r in grouped
    }
    want = {}
    for name in ("train", "val", "test"):
        for r in pack_sequences(
            docs.filter(F.col("split") == name), "doc_id", "n_tok", 512, n_buckets=8
        ).collect():
            want[(name, f"{name}/{r['pack_id']}")] = (
                tuple(r["doc_ids"]), r["total_tokens"],
            )
    assert got == want


def test_pack_sequences_external_token_counts(spark):
    """docs/TOKENIZER.md contract: packing driven end-to-end by an EXTERNAL
    precomputed token-count table joined on doc_id (the swap-in shape for a
    real BPE tokenizer) — tokens_col is just a column name; invariants hold
    and the packs are genuinely a function of the external counts."""
    n = 2_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    # stand-in for a tokenize-once table: counts deliberately unlike any
    # in-repo estimator (e.g. 3*id%700+1), stored separately and joined on
    ext = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 3) % 700 + 1).alias("bpe_tok"),
    )
    joined = docs.join(ext, "doc_id")
    packs = pack_sequences(
        joined, id_col="doc_id", tokens_col="bpe_tok", max_tokens=512, n_buckets=8
    ).collect()
    seen = sorted(i for p in packs for i in p["doc_ids"])
    assert seen == list(range(n))  # exactly once each
    want_total = sum((i * 3) % 700 + 1 for i in range(n))
    assert sum(p["total_tokens"] for p in packs) == want_total
    for p in packs:
        assert p["total_tokens"] <= 512 or p["n_docs"] == 1
    # the packing is a function of the EXTERNAL counts: same ids with a
    # different external table give different packs
    ext2 = spark.range(n).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 7) % 700 + 1).alias("bpe_tok")
    )
    packs2 = pack_sequences(
        docs.join(ext2, "doc_id"), id_col="doc_id", tokens_col="bpe_tok",
        max_tokens=512, n_buckets=8,
    ).collect()
    assert {(p["pack_id"], tuple(p["doc_ids"])) for p in packs} != {
        (p["pack_id"], tuple(p["doc_ids"])) for p in packs2
    }


def test_stratified_sample_rates_and_determinism(spark):
    """Per-stratum rates within binomial noise, unnamed strata get the
    default (0.0 = dropped), reruns identical, and each stratum's sample
    is exactly what hash_sample at that fraction would select."""
    from watchman_spark.operators.sampling import stratified_sample

    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(40_000)]
    df = spark.createDataFrame(rows, ["k", "s"]).cache()
    fracs = {"a": 0.5, "b": 0.1}
    got = stratified_sample(df, "k", "s", fracs).collect()
    by_s: dict[str, set] = {}
    for r in got:
        by_s.setdefault(r["s"], set()).add(r["k"])
    assert set(by_s) == {"a", "b"}  # c, d dropped at default 0.0
    for name, frac in fracs.items():
        n = 10_000
        p = round(frac * 65536) / 65536
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(len(by_s[name]) - n * p) < 4 * sigma, (name, len(by_s[name]))
        want = {r["k"] for r in
                hash_sample(df.filter(F.col("s") == name), "k", frac).collect()}
        assert by_s[name] == want  # stratum ≡ plain hash_sample at its frac
    again = stratified_sample(df, "k", "s", fracs).collect()
    assert {(r["k"], r["s"]) for r in again} == {(r["k"], r["s"]) for r in got}


def test_stratified_sql_quoted_stratum_matches_spark(spark):
    """A stratum name containing an apostrophe must render a VALID SQL
    literal (ADVICE r4: unescaped quotes produced malformed oracle SQL)
    that selects exactly the rows stratified_sample keeps."""
    import duckdb
    import pandas as pd

    from watchman_spark.operators.sampling import stratified_sample, stratified_sql

    rows = [(i, "o'brien" if i % 2 else "plain") for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "s"])
    fracs = {"o'brien": 0.5, "plain": 0.25}
    want = sorted(r["k"] for r in stratified_sample(df, "k", "s", fracs).collect())
    pdf = pd.DataFrame(rows, columns=["k", "s"])
    pred = stratified_sql("k", "s", fracs)
    got = duckdb.sql(f"SELECT k FROM pdf WHERE {pred} ORDER BY k").fetchall()
    assert [g[0] for g in got] == want


# ---------------------------------------------------------------------------
# source mixing (token-budget curriculum sampling)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mix_df(spark):
    # 3 sources x 40 docs, token counts 1..40; per-source targets planted
    # on the rows (the operators read target_col, however it was derived)
    rows = [
        (s * 100 + i, f"s{s}", i + 1, float(t))
        for s, t in ((0, 120.0), (1, 55.5), (2, 10_000.0))
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tok long, target double"
    ).cache()


def _mix_hash(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def test_mix_exact_is_maximal_hash_prefix(spark, mix_df):
    got = {
        r["doc_id"]
        for r in sampling.source_mix_exact(
            mix_df, "doc_id", "source", "n_tok", "target"
        ).collect()
    }
    # recompute the expected prefix per source with the same md5 ordering
    rows = mix_df.collect()
    want = set()
    for src in {"s0", "s1", "s2"}:
        docs = sorted(
            (r for r in rows if r["source"] == src),
            key=lambda r: (_mix_hash(r["doc_id"]), r["doc_id"]),
        )
        cum, target = 0, docs[0]["target"]
        for r in docs:
            cum += r["n_tok"]
            if cum <= target:
                want.add(r["doc_id"])
            else:
                break
    assert got == want
    # the generous target keeps its whole source; the tight ones cut
    assert sum(1 for d in got if d >= 200) == 40
    assert 0 < sum(1 for d in got if d < 100) < 40


def test_mix_sampled_deterministic_and_budget_shaped(spark, mix_df):
    out = sampling.source_mix_sampled(mix_df, "doc_id", "source", "n_tok", "target")
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in out.collect()}
    assert a == b  # hash-deterministic, not rand()
    # target >= total -> frac clamps to 1 -> whole source kept
    assert sum(1 for d in a if d >= 200) == 40
    # tight targets keep strict subsets
    assert 0 < sum(1 for d in a if d < 100) < 40
    # expected kept tokens per tight source ~ target (frac * total = target);
    # allow generous binomial slack at n=40
    rows = {r["doc_id"]: r for r in mix_df.collect()}
    kept_tok = sum(rows[d]["n_tok"] for d in a if d < 100)
    assert 0 < kept_tok < 3 * 120


def test_mix_sampled_never_shuffles_corpus(spark, mix_df):
    out = sampling.source_mix_sampled(mix_df, "doc_id", "source", "n_tok", "target")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-side join is broadcast; the only hash exchange is the
    # n_sources-row partial agg feeding the broadcast
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:800]
