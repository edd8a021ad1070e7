"""Batch gap-based sessionization over event/telemetry streams.

The batch twin of the streaming session window (streaming/stream.py:62,
SURVEY §2 T4): assign a per-entity session sequence number by inactivity
gap, then roll sessions up — the classic log-pipeline shape
(BASELINE.json north_star: log/telemetry parse → route → aggregate).

Scale: ONE hash exchange on the entity key. The window sort is per-key
and sort-based (spills if a single entity's history exceeds a task —
entity keys are users/conversations, whose histories are bounded in
practice; a pathological hot key is the same salting problem as A3 and
would be split by session-day pre-bucketing). The per-session rollup
groups on (key, session_seq): HashPartitioning(key) already satisfies
that clustering, so `session_stats(sessionize(df))` runs with NO second
exchange (plan-asserted in tests/test_sessionize.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Append an int ``session_seq`` (1-based per key): a new session
    starts at the first event of a key and whenever the gap since the
    previous event exceeds ``gap_s`` whole seconds (timestamps compared at
    second truncation, matching SQL ``date_diff('second', ...)``).

    ``tiebreak_cols`` make the intra-key order total so the assignment is
    deterministic under equal timestamps.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    flagged = df.withColumn(
        "_session_new", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    cum = F.sum("_session_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.withColumn("session_seq", cum.cast("int")).drop("_session_new")


def session_stats(
    sess: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-(key, session_seq) rollup over ``sessionize`` output: event
    count, start/end, whole-second duration, plus any ``extra_aggs``
    (name → aggregate Column). Shares the sessionize exchange (see module
    docstring)."""
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .cast("long")
        .alias("duration_s"),
    ]
    for name, col in (extra_aggs or {}).items():
        aggs.append(col.alias(name))
    return sess.groupBy(key_col, "session_seq").agg(*aggs)
