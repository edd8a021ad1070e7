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
