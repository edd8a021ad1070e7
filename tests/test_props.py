"""Property-based tests (SURVEY.md §5.3-4): parse totality, router
partition/totality, salted == unsalted equivalence."""

from __future__ import annotations

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from pyspark.sql import functions as F

from watchman_spark.operators.aggregate import salted_agg
from watchman_spark.operators.parse import flatten_parsed, with_parsed
from watchman_spark.operators.route import with_sink
from watchman_spark.schema import SINKS

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

texts = st.one_of(
    st.none(),
    st.text(max_size=80),
    st.from_regex(r"\[tool:[a-z_]{1,8}\] invoked args=\d{1,2} latency_ms=\d{1,4} status=(ok|err)", fullmatch=True),
    st.from_regex(r"ERROR E\d\d\d: [a-z ]{1,20} after \d{1,4}ms", fullmatch=True),
)


@pytest.mark.parametrize("engine", ["jvm", "pandas"])
@given(data=st.lists(texts, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_parse_total_and_router_partitions(spark, engine, data):
    """For arbitrary (including adversarial) text, parse never throws, never
    drops rows, and the router assigns exactly one sink to every row."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(data)], "i long, text string")
    out = with_sink(with_parsed(df, engine=engine)).collect()
    assert len(out) == len(data)
    assert all(r["sink"] in SINKS for r in out)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=1, max_size=60
    ),
    salt_n=st.integers(2, 9),
)
@settings(**SETTINGS)
def test_salted_equals_unsalted(spark, rows, salt_n):
    df = spark.createDataFrame(rows, ["k", "v"])
    salted = salted_agg(
        df,
        keys=["k"],
        aggs=[("count", None, "n"), ("sum", "v", "s"), ("min", "v", "mn"), ("max", "v", "mx")],
        salt_n=salt_n,
    )
    naive = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    )
    a = {tuple(r) for r in salted.collect()}
    b = {tuple(r) for r in naive.collect()}
    assert a == b


@pytest.mark.parametrize("engine", ["jvm", "pandas"])
def test_parse_adversarial_literals(spark, engine):
    """Regex metacharacters, unicode, near-miss patterns parse to null."""
    rows = [
        (0, "[tool:] invoked args=1 latency_ms=2 status=ok"),     # empty name
        (1, "[tool:UPPER] invoked args=1 latency_ms=2 status=ok"),  # case
        (2, "ERROR E12: short after 5ms"),                         # 2-digit code
        (3, "ERROR E123: no latency suffix"),                      # missing tail
        (4, "prefix [tool:ok_tool] invoked args=3 latency_ms=4 status=err suffix"),
        (5, "\\[tool:x\\] invoked args=1 latency_ms=1 status=ok"),
        (6, "☃" * 50),
        (7, "ERROR E999: " + "x" * 2000 + " after 1ms"),           # long msg
    ]
    df = spark.createDataFrame(rows, ["i", "text"])
    out = {r["i"]: r for r in flatten_parsed(with_parsed(df, engine=engine)).collect()}
    for i in (0, 1, 2, 3, 6):
        assert out[i]["tool_name"] is None and out[i]["error_code"] is None, i
    assert out[4]["tool_name"] == "ok_tool"  # unanchored grok matches inside line
    assert out[7]["error_code"] == "E999" and out[7]["err_ms"] == 1


def test_engines_agree_on_adversarial(spark):
    rows = [(i, t) for i, t in enumerate([
        "[tool:a] invoked args=01 latency_ms=0001 status=ok",
        "ERROR E000:  after 0ms",
        "[tool:a] invoked args=1 latency_ms=1 status=okx",
        "ERROR E123: m after 12msx",
        None, "", " ",
    ])]
    df = spark.createDataFrame(rows, ["i", "text"])
    a = flatten_parsed(with_parsed(df, engine="jvm")).orderBy("i").collect()
    b = flatten_parsed(with_parsed(df, engine="pandas")).orderBy("i").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_grouped_agg_udaf_matches_builtin(spark):
    """U4 parity: the grouped-agg pandas UDF (Arrow-batched Python
    aggregation) must agree with the built-in F.percentile (both are exact
    linear-interpolated percentiles) on the driver's events table."""
    from pyspark.sql import functions as F

    from watchman_spark.queries import t
    from watchman_spark.queries_fn import udf_p95_grouped_agg

    sf = "/root/testdata/sf0.001"
    udaf = {
        r["event_type"]: r["p95_value"]
        for r in udf_p95_grouped_agg(spark, sf).collect()
    }
    builtin = {
        r["event_type"]: r["p95_value"]
        for r in t(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.round(F.percentile("value", 0.95), 4).alias("p95_value"))
        .collect()
    }
    assert udaf == builtin and len(udaf) >= 3


@given(data=st.lists(texts, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_engines_agree_on_arbitrary_text(spark, data):
    """jvm and pandas engines must produce IDENTICAL parsed structs for
    arbitrary (including adversarial, near-matching, null, unicode) text —
    the two-engine design's core contract, here property-tested beyond the
    fixture corpus (test_parse.py::test_engines_agree covers the synthetic
    mix only)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(data)], "i long, text string"
    )
    jvm = flatten_parsed(with_parsed(df, engine="jvm")).orderBy("i").collect()
    pnd = flatten_parsed(with_parsed(df, engine="pandas")).orderBy("i").collect()
    assert [tuple(r) for r in jvm] == [tuple(r) for r in pnd]


@given(
    docs=st.lists(
        st.lists(st.sampled_from("aa bb cc dd ee".split()), min_size=3, max_size=9).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    k=st.integers(2, 3),
)
@settings(**SETTINGS)
def test_ngram_jaccard_matches_python_reference(spark, docs, k):
    """ngram_jaccard_pairs (max_df=None exact mode) must equal a direct
    Python computation of shingle-set jaccard for every candidate pair —
    random small-vocabulary docs maximize shingle collisions, the hard
    case for the join-based formulation."""
    from watchman_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", k=k, threshold=0.0, max_df=None
        ).collect()
    }

    def shingles(text: str) -> set[str]:
        w = text.split(" ")
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)} if len(w) >= k else set()

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = shingles(docs[i]), shingles(docs[j])
            inter = len(a & b)
            if a and b and inter:  # candidates share >= 1 shingle
                want[(i, j)] = round(inter / len(a | b), 4)
    assert got == want


# -- model-based property: the rewrite commit fold ---------------------------
# Random interleavings of append / merge_upsert / compact must always agree
# with a plain python-dict model of the table (key -> value), and commit
# metadata must keep table_rows() exact. This is the property that makes
# replace commits trustworthy: no sequence of rewrites may lose, duplicate,
# or resurrect a row.

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(2, 5)),
        st.tuples(st.just("merge"), st.integers(1, 4)),
        st.tuples(st.just("compact"), st.just(0)),
    ),
    min_size=2,
    max_size=5,
)


@given(ops=_ops)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rewrite_fold_matches_model(spark, tmp_path_factory, ops):
    from watchman_spark.sources.warehouse import ParquetWarehouse

    wh = ParquetWarehouse(str(tmp_path_factory.mktemp("prop_wh")))
    model: dict[int, str] = {}
    next_k = 0
    version = 0

    def df_of(rows):
        return spark.createDataFrame(rows, "k bigint, v string")

    for op, arg in ops:
        version += 1
        if op == "append":
            rows = [(next_k + i, f"v{version}.{next_k + i}") for i in range(arg)]
            next_k += arg
            wh.write_append(df_of(rows), "t")
            model.update(dict(rows))
        elif op == "merge":
            # update up to `arg` existing keys (deterministic pick: the
            # lowest ones) and insert one new key
            upd = sorted(model)[:arg]
            rows = [(k, f"m{version}.{k}") for k in upd]
            rows.append((next_k, f"m{version}.{next_k}"))
            next_k += 1
            wh.merge_upsert(spark, "t", df_of(rows), ["k"])
            model.update(dict(rows))
        else:  # compact
            if not wh.commits("t"):
                continue
            wh.compact(spark, "t")
    if not wh.commits("t"):
        assert model == {}
        return
    got = {r["k"]: r["v"] for r in wh.read(spark, "t").collect()}
    assert got == model
    assert wh.table_rows("t") == len(model)
