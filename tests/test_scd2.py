"""SCD type-2 as-of enrichment (operators/enrich.scd2_enrich): half-open
interval semantics, never-drop contract, broadcast plan shape. Oracle
parity for join_scd2 runs in test_oracle_duckdb.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from watchman_spark.operators.enrich import scd2_enrich

T = lambda d: dt.datetime(2024, 1, d)  # noqa: E731


def _frames(spark):
    dim = spark.createDataFrame(
        [
            (1, "one/v1", T(1), T(5)),
            (1, "one/v2", T(5), T(10)),
        ],
        "key long, label string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, T(4)),   # inside v1
            (101, 1, T(5)),   # exactly at the boundary -> v2 (half-open)
            (102, 1, T(12)),  # past every version -> null
            (103, 2, T(4)),   # key not in dim -> null
        ],
        "fact_id long, key long, ts timestamp",
    )
    return facts, dim


def test_scd2_half_open_versions_and_never_drop(spark):
    facts, dim = _frames(spark)
    out = scd2_enrich(facts, dim, "key", "ts")
    rows = {r["fact_id"]: r["label"] for r in out.collect()}
    assert rows == {100: "one/v1", 101: "one/v2", 102: None, 103: None}
    assert out.count() == facts.count()  # left: enrichment never drops


def test_scd2_inner_drops_uncovered(spark):
    facts, dim = _frames(spark)
    out = scd2_enrich(facts, dim, "key", "ts", how="inner")
    assert sorted(r["fact_id"] for r in out.collect()) == [100, 101]


def test_scd2_distinct_key_names_and_attr_projection(spark):
    facts, dim = _frames(spark)
    dim2 = dim.withColumnRenamed("key", "dim_id").withColumn("extra", F.lit(7))
    out = scd2_enrich(facts, dim2, "key", "ts", dim_key="dim_id")
    # dim key/interval columns are dropped; attributes appended
    assert out.columns == ["fact_id", "key", "ts", "label", "extra"]


def test_scd2_plans_broadcast_hash_join(spark):
    facts, dim = _frames(spark)
    plan = (
        scd2_enrich(facts, dim, "key", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
