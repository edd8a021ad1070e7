"""applyInPandasWithState running counters: totals across micro-batches
must equal the batch-mode per-sink counts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from watchman_spark.config import PipelineConfig
from watchman_spark.operators.parse import with_parsed
from watchman_spark.operators.route import with_sink
from watchman_spark.streaming.stateful import running_sink_counters
from watchman_spark.streaming.stream import read_transcript_stream
from watchman_spark.synth import SynthParams, compute_golden, synth_transcripts

PARAMS = SynthParams(seed=9, n_convs=50, C=300, hot_cap=100)


def test_running_counters_match_batch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("state_src"))
    synth_transcripts(spark, PARAMS).repartition(5).write.mode("overwrite").parquet(src)
    cfg = PipelineConfig(warehouse="/unused")
    stream = read_transcript_stream(spark, src, max_files_per_trigger=2)
    tagged = with_sink(with_parsed(stream, cfg.patterns, engine=cfg.parse_engine))
    out = running_sink_counters(tagged)
    ck = str(tmp_path_factory.mktemp("state_ck"))
    q = (
        out.writeStream.format("memory")
        .queryName("running_counters")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql(
        "SELECT sink, MAX(total) AS total, SUM(batch_rows) AS summed "
        "FROM running_counters GROUP BY sink"
    ).collect()
    got_total = {r["sink"]: r["total"] for r in rows}
    got_summed = {r["sink"]: r["summed"] for r in rows}
    golden = compute_golden(PARAMS)["per_sink"]
    assert got_total == golden          # final running totals are exact
    assert got_summed == golden         # per-batch increments partition input
    # multiple micro-batches actually happened (state carried across)
    n_updates = spark.sql("SELECT COUNT(*) c FROM running_counters").collect()[0]["c"]
    assert n_updates > len(golden)


def test_tws_plan_constructs(spark, tmp_path_factory):
    """The transformWithStateInPandas variant must build a valid streaming
    plan (JVM-side analysis) even where the protobuf runtime dependency is
    absent — the guard that the modern-API surface stays wired correctly."""
    from watchman_spark.streaming.stateful import running_sink_counters_tws

    src = str(tmp_path_factory.mktemp("tws_src"))
    synth_transcripts(spark, PARAMS).repartition(2).write.mode("overwrite").parquet(src)
    cfg = PipelineConfig(warehouse="/unused")
    stream = read_transcript_stream(spark, src)
    tagged = with_sink(with_parsed(stream, cfg.patterns, engine=cfg.parse_engine))
    out = running_sink_counters_tws(tagged)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "sink", "total", "batch_rows", "convs_seen", "first_ts", "last_ts",
    ]


@pytest.mark.skipif(
    not __import__("watchman_spark.streaming.stateful", fromlist=["x"])._tws_available(),
    reason="transformWithStateInPandas execution needs google.protobuf, "
    "absent in this sandbox (no network/pip) — plan construction is "
    "asserted above; run this test where protobuf is installed",
)
def test_tws_counters_match_batch(spark, tmp_path_factory):
    """Full-run equivalence of the transformWithState variant (executes only
    where protobuf + RocksDB state store are available)."""
    from watchman_spark.streaming.stateful import running_sink_counters_tws

    src = str(tmp_path_factory.mktemp("tws_run_src"))
    synth_transcripts(spark, PARAMS).repartition(5).write.mode("overwrite").parquet(src)
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        cfg = PipelineConfig(warehouse="/unused")
        stream = read_transcript_stream(spark, src, max_files_per_trigger=2)
        tagged = with_sink(with_parsed(stream, cfg.patterns, engine=cfg.parse_engine))
        out = running_sink_counters_tws(tagged)
        ck = str(tmp_path_factory.mktemp("tws_run_ck"))
        q = (
            out.writeStream.format("memory")
            .queryName("tws_counters")
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.sql(
            "SELECT sink, MAX(total) AS total FROM tws_counters GROUP BY sink"
        ).collect()
        got = {r["sink"]: r["total"] for r in rows}
        assert got == compute_golden(PARAMS)["per_sink"]
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
