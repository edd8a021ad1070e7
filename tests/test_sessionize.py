"""Batch gap-sessionization semantics + the no-second-exchange plan
property (operators/sessionize.py)."""

from __future__ import annotations

import datetime as dt
import re

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from watchman_spark.operators.sessionize import session_stats, sessionize

SF = "/root/testdata/sf0.001"


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: two sessions — 3600s gap boundary is EXCLUSIVE (> gap)
        (1, 1, _ts(0)),
        (2, 1, _ts(100)),
        (3, 1, _ts(3700)),  # 3600 gap since 100 -> exactly gap, SAME session
        (4, 1, _ts(7301)),  # 3601 gap -> new session
        # user 2: single event
        (5, 2, _ts(50)),
    ]
    out = sessionize(_events(spark, rows), "user_id", "ts", gap_s=3600)
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_tiebreak_deterministic(spark):
    # equal timestamps: order falls back to event_id, so assignment is total
    rows = [(i, 1, _ts(0)) for i in range(5)] + [(9, 1, _ts(9000))]
    out = sessionize(_events(spark, rows), "user_id", "ts", gap_s=3600)
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 9: 2}


def test_session_stats_rollup(spark):
    rows = [(1, 1, _ts(0)), (2, 1, _ts(500)), (3, 1, _ts(10_000)), (4, 2, _ts(7))]
    sess = sessionize(_events(spark, rows), "user_id", "ts", gap_s=3600)
    stats = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_s"])
        for r in session_stats(sess, "user_id", "ts").collect()
    }
    assert stats == {(1, 1): (2, 500), (1, 2): (1, 0), (2, 1): (1, 0)}


def test_session_stats_single_exchange(spark):
    # HashPartitioning(user_id) from the window satisfies the rollup's
    # (user_id, session_seq) clustering: exactly ONE hash exchange end-to-end
    df = entrymod.queries()["session_stats_events"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:800]
    assert "Window" in plan


def test_sessionize_matches_streaming_session_count(spark):
    # batch sessionize over the bench events table produces the same number
    # of sessions as counting gap-starts directly (independent formulation)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sess = sessionize(ev, "user_id", "ts", gap_s=43_200)
    n_sessions = (
        sess.select("user_id", "session_seq").distinct().count()
    )
    w_max = sess.groupBy("user_id").agg(F.max("session_seq").alias("m"))
    assert n_sessions == w_max.agg(F.sum("m")).collect()[0][0]


def test_batch_sessionize_matches_streaming_session_window(spark, tmp_path_factory):
    """Batch gap-sessionization ≡ streaming T4 session windows on the same
    transcript corpus: the per-session turn-count multiset must agree.
    (Semantics guard: the batch path compares second-truncated gaps with
    '>', the stream merges events strictly inside the raw-timestamp gap —
    the test first asserts the corpus has no inter-turn gap within ±2 s of
    the boundary, so both definitions induce the same partition.)"""
    from watchman_spark.streaming.stream import (
        read_transcript_stream,
        sessionized_counts,
    )
    from watchman_spark.synth import SynthParams, synth_transcripts

    params = SynthParams(seed=11, n_convs=40, C=300, hot_cap=120)
    df = synth_transcripts(spark, params)
    gap_s = 600

    # boundary guard: no per-conv gap inside [gap-2, gap+2] seconds
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gaps = (
        df.withColumn("g", F.col("ts").cast("double") - F.lag("ts").over(w).cast("double"))
        .filter(F.col("g").isNotNull())
        .filter((F.col("g") > gap_s - 2) & (F.col("g") < gap_s + 2))
        .count()
    )
    assert gaps == 0, "corpus has near-boundary gaps; pick another gap_s"

    batch = sessionize(df, "conv_id", "ts", gap_s=gap_s, tiebreak_cols=("turn_idx",))
    batch_counts = sorted(
        (r["conv_id"], r["n_events"])
        for r in session_stats(batch, "conv_id", "ts").collect()
    )

    src = str(tmp_path_factory.mktemp("sess_parity_src"))
    df.repartition(4).write.mode("overwrite").parquet(src)
    stream = read_transcript_stream(spark, src)
    out = sessionized_counts(stream, gap="10 minutes", watermark="2 hours")
    ck = str(tmp_path_factory.mktemp("sess_parity_ck"))
    q = (
        out.writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream_counts = sorted(
        (r["conv_id"], r["n_turns"])
        for r in spark.sql("SELECT conv_id, n_turns FROM sess_parity").collect()
    )
    assert stream_counts == batch_counts
