"""textstats operator checks that parity alone can't express — above all
that the PII redaction query actually EXERCISES every pattern class (a
mis-shaped plant once left the phone path vacuously green)."""

from __future__ import annotations

from pyspark.sql import functions as F

from watchman_spark.queries_text import text_redact_pii


def test_redact_query_exercises_every_pii_class(spark):
    out = text_redact_pii(spark, "/root/testdata/sf0.001")
    hits = out.agg(
        *[
            F.sum(F.when(F.col("redacted").contains(tok), 1).otherwise(0)).alias(tok)
            for tok in ("<EMAIL>", "<PHONE>", "<IPV4>")
        ]
    ).collect()[0]
    n = out.count()
    assert hits["<EMAIL>"] == n  # every row's planted email redacted
    assert hits["<PHONE>"] == n  # every row's planted phone redacted
    assert hits["<IPV4>"] == n  # every row's planted ip redacted
    # and no raw planted PII survives
    leaked = out.filter(
        F.col("redacted").rlike(r"@example\.com|555-\d{3}-\d{4}|10\.0\.\d+\.\d+")
    ).count()
    assert leaked == 0


def test_phone_pattern_boundary_guards(spark):
    """The phone pattern must NOT eat the first 10 digits of a longer run
    (a 16-digit card number previously became '<PHONE>' + 6 leaked digits,
    and long numeric ids were over-redacted) while still matching real
    phone shapes, including '+'-prefixed ones."""
    from watchman_spark.operators.textstats import redact_pii

    cases = [
        ("card", "pay 4111111111111111 now"),          # 16-digit run: untouched
        ("longid", "id 12345678901 ok"),               # 11-digit run: untouched
        ("plain", "call 555-123-4567 pls"),
        ("spaced", "call 555 123 4567 pls"),
        ("bare", "call 5551234567 pls"),
        ("plus", "call +123 456 7890 pls"),
        ("eol", "call 555-123-4567"),
    ]
    df = spark.createDataFrame(cases, ["k", "text"])
    got = {r["k"]: r["red"] for r in
           df.select("k", redact_pii(F.col("text")).alias("red")).collect()}
    assert got["card"] == "pay 4111111111111111 now"
    assert got["longid"] == "id 12345678901 ok"
    for k in ("plain", "spaced", "bare", "plus", "eol"):
        assert "<PHONE>" in got[k], (k, got[k])
        assert not any(ch.isdigit() for ch in got[k]), (k, got[k])


def test_repetition_signals_closed_form(spark):
    """dup/top bigram fractions on hand-computable docs, including the
    degenerate all-same-word doc (both fractions 1.0) and a no-repeat doc
    (both minimal), plus the <2-word null case."""
    from watchman_spark.operators.textstats import dup_ngram_frac, top_ngram_frac

    cases = [
        # "a a a a a": 4 bigrams, all "a a" -> dup 3/4, top 4/4
        ("loop", "a a a a a"),
        # "w x y z": 3 distinct bigrams -> dup 0, top 1/3 = 0.3333
        ("clean", "w x y z"),
        # "a b a b a": bigrams [ab, ba, ab, ba] -> dup 2/4, top 2/4
        ("pingpong", "a b a b a"),
        ("single", "solo"),
    ]
    df = spark.createDataFrame(cases, ["k", "text"])
    got = {
        r["k"]: (r["dup"], r["top"])
        for r in df.select(
            "k",
            dup_ngram_frac(F.col("text"), 2).alias("dup"),
            top_ngram_frac(F.col("text"), 2).alias("top"),
        ).collect()
    }
    assert got["loop"] == (0.75, 1.0)
    assert got["clean"] == (0.0, 0.3333)
    assert got["pingpong"] == (0.5, 0.5)
    assert got["single"] == (None, None)


def test_repetition_query_matches_pandas_recompute(spark):
    """Cross-check the registered query against an independent per-doc
    Python recompute on the real documents table."""
    from collections import Counter

    from watchman_spark.queries_text import text_repetition

    out = text_repetition(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "documents table should yield repetition rows"
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).collect()
    }
    for r in rows[:50]:
        w = texts[r["doc_id"]].split(" ")
        grams = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        n = len(grams)
        c = Counter(grams)
        assert r["n_bigrams"] == n
        assert r["dup_bigram_frac"] == ((n - len(c)) * 10000 // n) / 10000.0
        assert r["top_bigram_frac"] == (max(c.values()) * 10000 // n) / 10000.0


def test_top_ngram_frac_table_paths_agree(spark):
    """The shuffle path (explode + groupBy + max) and the expression path
    must compute IDENTICAL top-ngram fractions: random docs spanning both
    sides of a mid-range threshold, plus sub-k docs (null on both paths)."""
    import random

    from watchman_spark.operators.textstats import top_ngram_frac, top_ngram_frac_table

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "loop"]
    rows = []
    for i in range(60):
        n = rng.choice([0, 1, 3, 8, 20, 40, 80])
        words = [rng.choice(vocab) for _ in range(n)]
        if n >= 10 and i % 3 == 0:
            words = words[:4] * (n // 4)  # highly repetitive long doc
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    expr = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", top_ngram_frac(F.col("text"), 2).alias("f")).collect()
    }
    for thr in (1, 10, 10_000):  # all-shuffle, mixed, all-expression
        got = {
            r["doc_id"]: r["f"]
            for r in top_ngram_frac_table(
                df, "doc_id", "text", k=2, out_col="f", shuffle_min_tokens=thr
            ).collect()
        }
        assert got == expr, thr
    # schema contract: appends out_col, preserves every input row
    out = top_ngram_frac_table(df, "doc_id", "text", shuffle_min_tokens=10)
    assert out.columns == ["doc_id", "text", "top_ngram_frac"]
    assert out.count() == len(rows)
