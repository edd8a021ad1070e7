"""Semantics of the engine-native-hash dedup operators (rows-only in the
driver oracle): planted near-duplicates must be found, non-dups must not."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from watchman_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    DEFAULT_MAX_DF,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    resolve_components,
    simhash64,
    simhash_pairs,
    word_shingles,
)

DOCS = [
    # (id, text): 0/100 identical; 1/101 near-identical (one word changed);
    # 2, 3 unrelated
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (100, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "pack my box with five dozen liquor jugs before the night falls down"),
    (101, "pack my box with five dozen liquor jugs before the night ends down"),
    (2, "colorless green ideas sleep furiously under a bright winter moon"),
    (3, "a completely different sentence about spark shuffles and parquet files"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, ["text"], "doc_id")
    groups = {r["keep_id"]: r["dup_n"] for r in out.collect()}
    assert groups[0] == 2  # 0 and 100 merged, min id kept
    assert groups[1] == 1 and groups[2] == 1


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["t"])
    rows = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == []  # shorter than k


def test_ngram_jaccard_finds_planted(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    assert pairs[(0, 100)] == 1.0
    assert (1, 101) in pairs and 0.5 <= pairs[(1, 101)] < 1.0
    assert not any({a, b} & {2, 3} for a, b in pairs)


def test_minhash_lsh_finds_planted(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, n_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    assert pairs[(0, 100)] == 1.0  # identical docs always collide in LSH
    # jaccard values reported by LSH must be the EXACT jaccard
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    for k_, v in pairs.items():
        assert exact[k_] == v


def test_simhash_identical_and_near(spark, docs):
    sims = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", simhash64(F.col("text")).alias("sh")).collect()
    }
    assert sims[0] == sims[100]  # identical text -> identical simhash
    assert all(s >= 0 for s in sims.values())  # sign bit never set
    ham_1_101 = bin(sims[1] ^ sims[101]).count("1")
    ham_0_2 = bin(sims[0] ^ sims[2]).count("1")
    assert ham_1_101 < ham_0_2  # near-dup closer than unrelated

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=3, bands=4).collect()
    }
    assert pairs[(0, 100)] == 0


def test_df_cap_bounds_hot_shingle_fanout(spark):
    """A stop-shingle shared by EVERY doc must not connect everything: with
    max_df, the hot shingle is dropped before the self-join, the candidate
    pair count collapses from O(n²) to the true pairs, and true-pair recall
    is unchanged (the planted duplicate still scores jaccard 1.0)."""
    rows = [
        (i, f"common stop words unique{i} token{i} extra{i} tail{i}") for i in range(200)
    ]
    rows.append((1007, rows[7][1]))  # exact duplicate of doc 7
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # candidate fan-out, observed via threshold≈0: every pair sharing >=1
    # shingle survives. Uncapped (explicit max_df=None opt-out), the hot
    # 3-gram links all 201 docs.
    uncapped = ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.01, max_df=None
    ).count()
    assert uncapped == 201 * 200 // 2
    capped_all = ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.01, max_df=10
    )
    assert capped_all.count() == 1  # only the true pair remains a candidate

    # recall: the planted duplicate is still found at full confidence
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=0.8, max_df=10
        ).collect()
    }
    assert pairs == {(7, 1007): 1.0}


def test_minhash_bucket_cap_keeps_recall(spark):
    """max_bucket drops pathological band buckets (a 50-clone cluster) while
    normal duplicate pairs keep full recall through their own small buckets."""
    base = [
        (i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 7} filler{i} more{i} words{i}")
        for i in range(40)
    ]
    rows = base + [(i + 1000, t) for i, t in base]
    # 50 clones of one hot text: every band bucket they form has 50 members
    rows += [(5000 + j, "hot hot hot cluster of identical clones forever") for j in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = minhash_lsh_pairs(
        df, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.99, max_bucket=10
    )
    found = {(r["id_a"], r["id_b"]) for r in out.collect()}
    for i, _ in base:
        assert (i, i + 1000) in found  # true pairs: unchanged recall
    assert not any(a >= 5000 for a, _ in found)  # hot cluster capped out


def test_default_call_is_scale_capped(spark):
    """Round-3 contract: the NAIVE call (no cap argument) must be the
    scale-safe one. A stop-shingle with document frequency above
    DEFAULT_MAX_DF is dropped without being asked; unbounded semantics now
    require the explicit ``max_df=None`` opt-out."""
    assert DEFAULT_MAX_DF is not None and DEFAULT_MAX_BUCKET is not None

    n = DEFAULT_MAX_DF + 201  # hot-shingle df comfortably above the cap
    rows = [(i, f"common stop words unique{i} tail{i}") for i in range(n)]
    rows.append((900_000, rows[7][1]))  # exact duplicate of doc 7
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # default call: the hot 3-gram ("common stop words", df=n+1) is capped
    # out, so candidates collapse from O(n²) (~720k pairs) to the true pair
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.8).collect()
    }
    assert out == {(7, 900_000): 1.0}


def test_default_bucket_cap_bounds_lsh(spark):
    """minhash_lsh_pairs default call caps a pathological band bucket: a
    clone cluster larger than DEFAULT_MAX_BUCKET produces no O(b²) pair
    explosion, while an ordinary duplicate pair keeps full recall."""
    n_clones = DEFAULT_MAX_BUCKET + 20
    rows = [(5000 + j, "hot cluster of identical clone text forever more") for j in range(n_clones)]
    rows += [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1000, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.99
        ).collect()
    }
    assert (0, 1000) in found  # true pair: unchanged recall
    assert not any(a >= 5000 for a, _ in found)  # clone cluster capped out


def test_lsh_bands_guarantee(spark):
    """A pair with >= 1 identical band slice must be a candidate: verify via
    duplicated docs at larger scale (every doc duplicated)."""
    base = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 7} filler{i} more{i} words{i}") for i in range(40)]
    rows = base + [(i + 1000, t) for i, t in base]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = minhash_lsh_pairs(df, "doc_id", "text", k=3, n_hashes=16, bands=8, threshold=0.99)
    found = {(r["id_a"], r["id_b"]) for r in out.collect()}
    for i, _ in base:
        assert (i, i + 1000) in found


def test_resolve_components_transitivity(spark):
    """Random planted chains: A~B, B~C, ... must resolve to ONE component
    labeled with the chain's min id, keep only that min — the property that
    makes pair tables usable as a drop set."""
    import random

    rng = random.Random(404)
    ids = list(range(0, 9000, 7))
    rng.shuffle(ids)
    pairs, want = [], {}
    pos = 0
    comp_count = 0
    while pos + 2 <= len(ids) and comp_count < 60:
        length = rng.randrange(2, 9)
        chain = ids[pos:pos + length]
        pos += length
        comp_count += 1
        comp = min(chain)
        for a, b in zip(chain, chain[1:]):
            # random orientation: the operator must symmetrize
            pairs.append((a, b) if rng.random() < 0.5 else (b, a))
        for node in chain:
            want[node] = comp
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        r["id"]: (r["component_id"], r["keep"])
        for r in resolve_components(df).collect()
    }
    assert set(got) == set(want)
    for node, comp in want.items():
        assert got[node] == (comp, node == comp), (node, got[node], comp)
    # exactly one keep per component
    keeps = [n for n, (_, k) in got.items() if k]
    assert sorted(keeps) == sorted(set(want.values()))


def test_resolve_components_clique_and_bridge(spark):
    """Two cliques joined by one bridge edge collapse into one component
    (the shape LSH pair tables actually produce)."""
    clique1 = [(a, b) for a in (10, 20, 30) for b in (10, 20, 30) if a < b]
    clique2 = [(a, b) for a in (100, 200, 300) for b in (100, 200, 300) if a < b]
    df = spark.createDataFrame(clique1 + clique2 + [(30, 100)], ["id_a", "id_b"])
    got = {r["id"]: r["component_id"] for r in resolve_components(df).collect()}
    assert got == {n: 10 for n in (10, 20, 30, 100, 200, 300)}


def test_resolve_components_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert resolve_components(df).count() == 0


def test_resolve_components_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], ["id_a", "id_b"])
    import pytest as _pt
    with _pt.raises(RuntimeError, match="did not converge"):
        resolve_components(df, max_iter=2)


def test_contamination_planted_leak(spark):
    """A test doc that is a verbatim copy of a train doc must report
    contam_ratio 1.0 / contaminated; a disjoint-vocabulary test doc must
    report 0.0; a short (<k words) test doc reports n_sh=0 without error."""
    from watchman_spark.operators.dedup import contamination

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine")],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),  # full leak
         (11, "red orange yellow green blue indigo violet pink"),  # clean
         (12, "too short")],                                      # no shingles
        ["doc_id", "text"],
    )
    got = {r["id"]: r for r in
           contamination(train, test, "doc_id", "text", k=5, threshold=0.2).collect()}
    assert got[10]["contam_ratio"] == 1.0 and got[10]["contaminated"]
    assert got[11]["contam_ratio"] == 0.0 and not got[11]["contaminated"]
    assert got[12]["n_sh"] == 0 and got[12]["contam_ratio"] == 0.0
    # partial leak: half the shingles shared -> ratio strictly between
    test2 = spark.createDataFrame(
        [(20, "alpha beta gamma delta epsilon nine eight seven six")],
        ["doc_id", "text"],
    )
    r = contamination(train, test2, "doc_id", "text", k=5).collect()[0]
    assert 0.0 < r["contam_ratio"] < 1.0


def test_lsh_clusters_composed_drop_set(spark):
    """The composed minhash-LSH → resolve_components query: every planted
    full copy (doc, doc+100000) resolves into one component keeping the
    low id and dropping the copy."""
    from watchman_spark.queries_text import dedup_lsh_clusters

    rows = {r["id"]: r for r in dedup_lsh_clusters(spark, "/root/testdata/sf0.001").collect()}
    planted = [i for i in rows if i >= 100000]
    assert planted, "no planted copies surfaced in the pair graph"
    for cid in planted:
        orig = cid - 100000
        assert orig in rows
        assert rows[cid]["component_id"] == rows[orig]["component_id"]
        assert not rows[cid]["keep"]  # the copy is dropped
    # exactly one keep per component
    comps: dict[int, int] = {}
    for r in rows.values():
        comps[r["component_id"]] = comps.get(r["component_id"], 0) + (1 if r["keep"] else 0)
    assert all(v == 1 for v in comps.values())


def test_minhash_portable_matches_default_recall(spark):
    """portable=True (md5 signatures + md5 band digests) must find the same
    planted duplicate pairs as the xxhash64 default — the hash family
    changes, the LSH semantics don't."""
    base = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 7} filler{i} more{i} words{i}")
            for i in range(30)]
    rows = base + [(i + 1000, t) for i, t in base]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    default = {(r["id_a"], r["id_b"])
               for r in minhash_lsh_pairs(df, "doc_id", "text", k=3,
                                          n_hashes=16, bands=8, threshold=0.99).collect()}
    portable = {(r["id_a"], r["id_b"])
                for r in minhash_lsh_pairs(df, "doc_id", "text", k=3, n_hashes=16,
                                           bands=8, threshold=0.99, portable=True).collect()}
    for i, _ in base:
        assert (i, i + 1000) in default and (i, i + 1000) in portable
    # exact-duplicate pairs collide in EVERY band under any hash family
    assert default == portable


def test_simhash_portable_locality(spark):
    """Portable (md5-bit-vote) simhash keeps the simhash property: near-
    identical texts land within small hamming distance, dissimilar texts
    far apart; output deterministic."""
    from watchman_spark.operators.dedup import simhash64_portable

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again tomorrow"),
        (3, "completely unrelated vocabulary about quantum flux capacitors"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sims = {r["doc_id"]: r["s"] for r in
            df.select("doc_id", simhash64_portable(F.col("text")).alias("s")).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sims[1], sims[2]) <= 2   # one-word change: ~no bit flips
    assert ham(sims[1], sims[3]) >= 3   # disjoint vocab: clearly farther
    assert ham(sims[1], sims[3]) > ham(sims[1], sims[2])
    again = {r["doc_id"]: r["s"] for r in
             df.select("doc_id", simhash64_portable(F.col("text")).alias("s")).collect()}
    assert again == sims


def test_resolve_components_string_ids(spark):
    """Component resolution is id-type-generic: string ids resolve with
    lexicographic-min canonical labels."""
    df = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("zz-1", "zz-2")],
        ["id_a", "id_b"],
    )
    got = {r["id"]: (r["component_id"], r["keep"]) for r in resolve_components(df).collect()}
    assert got == {
        "doc-a": ("doc-a", True), "doc-b": ("doc-a", False), "doc-c": ("doc-a", False),
        "zz-1": ("zz-1", True), "zz-2": ("zz-1", False),
    }


def test_incremental_dedup_against_corpus(spark, tmp_path):
    """The production ingestion loop: batch N dedups against the hash
    ledger of batches 1..N-1 (never re-scanning their text), appends its
    surviving hashes, and a replayed batch is a complete no-op."""
    from watchman_spark.operators.dedup import content_hashes, dedup_against_corpus
    from watchman_spark.sources.warehouse import ParquetWarehouse

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    batch1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")], ["doc_id", "text"]
    )
    empty = spark.createDataFrame([], "content_hash string")
    kept1 = dedup_against_corpus(batch1, empty, "doc_id", "text")
    ids1 = sorted(r["doc_id"] for r in kept1.collect())
    assert ids1 == [1, 2]  # within-batch dup of 'alpha text' dropped, min id kept
    wh.write_append(content_hashes(kept1, "doc_id", "text").select("content_hash"),
                    "corpus_hashes")

    batch2 = spark.createDataFrame(
        [(10, "alpha text"),      # already in corpus -> dropped
         (11, "gamma text"),      # new -> kept
         (12, "gamma text")],     # within-batch dup -> dropped
        ["doc_id", "text"],
    )
    seen = wh.read(spark, "corpus_hashes")
    kept2 = dedup_against_corpus(batch2, seen, "doc_id", "text")
    assert sorted(r["doc_id"] for r in kept2.collect()) == [11]
    wh.write_append(content_hashes(kept2, "doc_id", "text").select("content_hash"),
                    "corpus_hashes")

    # replay of batch2 against the updated ledger: complete no-op
    seen2 = wh.read(spark, "corpus_hashes")
    assert dedup_against_corpus(batch2, seen2, "doc_id", "text").count() == 0


def test_dedup_against_corpus_hash_column_contract(spark):
    """The survivors carry an appended content_hash column (the ledger
    append reads it), and a batch that ALREADY has one is rejected loudly
    instead of silently overwritten (ADVICE r4)."""
    import pytest as _pytest

    from watchman_spark.operators.dedup import dedup_against_corpus

    empty = spark.createDataFrame([], "content_hash string")
    batch = spark.createDataFrame([(1, "alpha")], ["doc_id", "text"])
    out = dedup_against_corpus(batch, empty, "doc_id", "text")
    assert sorted(out.columns) == ["content_hash", "doc_id", "text"]
    clash = batch.withColumn("content_hash", F.lit("x"))
    with _pytest.raises(ValueError, match="content_hash"):
        dedup_against_corpus(clash, empty, "doc_id", "text")


def test_incremental_neardup_ingest(spark, tmp_path):
    """The near-dup ingestion loop (round-4 'What's missing #2'): batch 2
    dedups against the signature LEDGER of batch 1 — never re-scanning
    batch-1 text — catching near (not just exact) duplicates; transitivity
    holds across the ledger boundary; replaying a batch is a complete
    no-op; and the ledger grows append-only by exactly the survivors."""
    from watchman_spark.operators.dedup import dedup_ingest_neardup
    from watchman_spark.sources.warehouse import ParquetWarehouse

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")          # near-dup of base
    other = "completely different content about distributed query engines here"
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    kw = dict(k=3, n_hashes=32, bands=8, threshold=0.5)

    batch1 = spark.createDataFrame(
        [(1, base), (2, other), (3, near)], ["doc_id", "text"]
    )
    empty = spark.createDataFrame([], "id long, sig array<bigint>")
    kept1, sigs1 = dedup_ingest_neardup(batch1, empty, "doc_id", "text", **kw)
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2]  # 3≈1 dropped
    wh.write_append(sigs1, "neardup_ledger")
    assert wh.table_rows("neardup_ledger") == 2

    batch2 = spark.createDataFrame(
        [(10, base),                              # exact dup of corpus 1
         (11, near),                              # near-dup of corpus 1
         (12, "fresh novel text with words never seen in any earlier batch"),
         (13, "fresh novel text with words never seen in any earlier batches")],
        ["doc_id", "text"],                        # 13 ≈ 12 within-batch
    )
    ledger = wh.read(spark, "neardup_ledger")
    kept2, sigs2 = dedup_ingest_neardup(batch2, ledger, "doc_id", "text", **kw)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [12]
    assert kept2.columns == batch2.columns  # original schema, no extras
    wh.write_append(sigs2, "neardup_ledger")

    # replay: every batch-2 doc now matches the ledger (10/11 via corpus
    # doc 1's signature, 12 via its own, 13 via 12's) -> complete no-op
    ledger2 = wh.read(spark, "neardup_ledger")
    replay, replay_sigs = dedup_ingest_neardup(batch2, ledger2, "doc_id", "text", **kw)
    assert replay.count() == 0 and replay_sigs.count() == 0


def test_incremental_neardup_short_docs_pass_through(spark):
    """Docs below k words have no shingles/signature: they survive and add
    no ledger rows (documented contract — exact dedup of those is
    dedup_against_corpus's job)."""
    from watchman_spark.operators.dedup import dedup_ingest_neardup

    empty = spark.createDataFrame([], "id long, sig array<bigint>")
    batch = spark.createDataFrame([(1, "hi"), (2, "hi")], ["doc_id", "text"])
    kept, sigs = dedup_ingest_neardup(batch, empty, "doc_id", "text", k=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]
    assert sigs.count() == 0
