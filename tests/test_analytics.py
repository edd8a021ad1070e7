"""Closed-form and property tests for operators/analytics.py (ordered
funnel, retention cohorts, percentile outliers) and
textstats.normalize_text. Oracle parity for the registered queries runs
in test_oracle_duckdb.py like every other entry."""

from __future__ import annotations

import datetime as dt
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from watchman_spark.operators.analytics import funnel, retention_cohorts, value_outliers
from watchman_spark.operators.textstats import normalize_text

T0 = dt.datetime(2024, 1, 1)


def _ev(rows):
    """rows: list of (user_id, minutes_offset, event_type)."""
    return [
        (uid, i, T0 + dt.timedelta(minutes=m), typ)
        for i, (uid, m, typ) in enumerate(rows)
    ]


def _ev_df(spark, rows):
    return spark.createDataFrame(
        _ev(rows), "user_id long, event_id long, ts timestamp, event_type string"
    )


STEPS = ["signup", "click", "purchase"]


def test_funnel_closed_form(spark):
    df = _ev_df(
        spark,
        [
            # u1 completes all three, in order
            (1, 0, "signup"), (1, 1, "click"), (1, 2, "purchase"),
            # u2: click BEFORE signup doesn't count; completes signup+click
            (2, 0, "click"), (2, 1, "signup"), (2, 2, "click"),
            # u3: purchase before signup doesn't count; completes signup only
            (3, 0, "purchase"), (3, 1, "signup"),
            # u4: never enters the funnel
            (4, 0, "view"),
        ],
    )
    got = {r["step_idx"]: r for r in funnel(df, STEPS).collect()}
    assert [got[i]["step"] for i in (1, 2, 3)] == STEPS
    assert [got[i]["n_keys"] for i in (1, 2, 3)] == [3, 2, 1]
    assert [got[i]["frac"] for i in (1, 2, 3)] == [0.75, 0.5, 0.25]


def test_funnel_repeated_steps_match_occurrences(spark):
    df = _ev_df(
        spark,
        [
            (1, 0, "view"),                    # one view -> step 1 only
            (2, 0, "view"), (2, 1, "view"),    # two views -> both steps
        ],
    )
    got = {r["step_idx"]: r["n_keys"] for r in funnel(df, ["view", "view"]).collect()}
    assert got == {1: 2, 2: 1}


def test_funnel_strictly_ordered_not_set_membership(spark):
    # all three types present but never in funnel order: only step 1 completes
    df = _ev_df(spark, [(1, 0, "purchase"), (1, 1, "click"), (1, 2, "signup")])
    got = {r["step_idx"]: r["n_keys"] for r in funnel(df, STEPS).collect()}
    assert got == {1: 1, 2: 0, 3: 0}


def _funnel_py(seqs: dict[int, list[str]], steps: list[str]) -> list[int]:
    counts = [0] * len(steps)
    for seq in seqs.values():
        done = 0
        for typ in seq:
            if done < len(steps) and typ == steps[done]:
                done += 1
        for i in range(done):
            counts[i] += 1
    return counts


def test_funnel_matches_pure_python_on_random_streams(spark):
    rng = random.Random(7)
    types = ["signup", "click", "purchase", "view", "error"]
    rows, seqs = [], {}
    for uid in range(40):
        seq = [rng.choice(types) for _ in range(rng.randint(0, 12))]
        seqs[uid] = seq
        rows += [(uid, i, typ) for i, typ in enumerate(seq)]
    df = _ev_df(spark, rows)
    expect = _funnel_py({u: s for u, s in seqs.items() if s}, STEPS)
    got = {r["step_idx"]: r["n_keys"] for r in funnel(df, STEPS).collect()}
    assert [got[i] for i in (1, 2, 3)] == expect


def test_funnel_scans_input_once(spark, tmp_path):
    # the heavy stage is ONE hash aggregate over the events — the step
    # rollup runs on the tiny completion distribution, so the input is
    # scanned exactly once in the plan
    p = str(tmp_path / "ev.parquet")
    _ev_df(spark, [(1, 0, "signup"), (2, 0, "click")]).write.parquet(p)
    plan = funnel(spark.read.parquet(p), STEPS)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        funnel(_ev_df(spark, [(1, 0, "view")]), [])


def test_retention_closed_form(spark):
    day = 24 * 60
    df = _ev_df(
        spark,
        [
            # cohort A (day 0): u1 active weeks 0,1; u2 week 0 only
            (1, 0, "view"), (1, 8 * day, "view"),
            (2, 0, "view"), (2, 10, "view"),        # same-day repeat: 1 active day
            # cohort B (day 3): u3 active weeks 0 and 2
            (3, 3 * day, "view"), (3, 3 * day + 15 * day, "view"),
        ],
    )
    rows = {
        (r["cohort_day"], r["week_offset"]): r
        for r in retention_cohorts(df).collect()
    }
    a, b = T0, T0 + dt.timedelta(days=3)
    assert rows[(a, 0)]["n_active"] == 2 and rows[(a, 0)]["retention"] == 1.0
    assert rows[(a, 1)]["n_active"] == 1 and rows[(a, 1)]["retention"] == 0.5
    assert rows[(b, 0)]["n_active"] == 1
    assert rows[(b, 2)]["n_active"] == 1 and rows[(b, 2)]["retention"] == 1.0
    assert len(rows) == 4


def test_retention_week_boundary(spark):
    day = 24 * 60
    # day 6 is still week 0; day 7 opens week 1
    df = _ev_df(spark, [(1, 0, "view"), (1, 6 * day, "view"), (1, 7 * day, "view")])
    rows = {r["week_offset"]: r["n_active"] for r in retention_cohorts(df).collect()}
    assert rows == {0: 1, 1: 1}


def test_value_outliers_matches_numpy(spark):
    rng = random.Random(11)
    vals = {"a": [round(rng.uniform(0, 100), 2) for _ in range(500)],
            "b": [round(rng.uniform(0, 10), 2) for _ in range(200)]}
    df = spark.createDataFrame(
        [(g, v) for g, vs in vals.items() for v in vs], "grp string, value double"
    )
    got = {r["grp"]: r for r in value_outliers(df, "grp", "value", q=0.99).collect()}
    for g, vs in vals.items():
        pq = float(np.percentile(np.array(vs), 99, method="linear"))
        assert got[g]["pq"] == pytest.approx(pq, abs=1e-4)
        assert got[g]["n"] == len(vs)
        assert got[g]["n_above"] == sum(1 for v in vs if v > pq)


def test_normalize_text_closed_form(spark):
    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! it's 42 "), (2, "!!!"), (3, None)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["norm"]
        for r in df.select("doc_id", normalize_text(F.col("text")).alias("norm")).collect()
    }
    assert rows[1] == "hello world it s 42"
    assert rows[2] == ""
    assert rows[3] is None


# ---------------------------------------------------------------------------
# volume_anomaly (rolling integer z² test)
# ---------------------------------------------------------------------------

def _hours_df(spark, counts, key="a"):
    """One event row per count unit: hour i gets counts[i] events."""
    rows = [
        (key, T0 + dt.timedelta(hours=i, seconds=s))
        for i, n in enumerate(counts)
        for s in range(n)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _flags(spark, counts, **kw):
    from watchman_spark.operators.analytics import volume_anomaly

    out = volume_anomaly(_hours_df(spark, counts), key_col="key", **kw)
    return [r["anomaly"] for r in out.orderBy("hour").collect()]


def test_volume_anomaly_spike_flagged_stable_not(spark):
    # varied history (nonzero variance): m=4, s1=20, s2=104 → var term 16;
    # x=5 sits on the mean (never flags), then x=50 is a >3σ spike.
    flags = _flags(spark, [4, 6, 4, 6, 5, 50])
    assert flags[4] is False and flags[5] is True
    # cold start: hours with <3 preceding observations never flag
    assert flags[:3] == [False, False, False]


def test_volume_anomaly_zero_variance_history(spark):
    # flatline history: ANY deviation is infinite-z → flagged; staying on
    # the flatline is not.
    flags = _flags(spark, [5, 5, 5, 5, 5, 6])
    assert flags[4] is False and flags[5] is True


def test_volume_anomaly_exact_integer_threshold(spark):
    # boundary exactness: with history [4,6,4,6] (m=4, s1=20, s2=104,
    # m·s2−s1² = 16), flag iff (4x−20)²·3 > 9·4·16 = 576 ⇔ |x−5| > √12 ≈
    # 3.46 ⇔ x ≤ 1 or x ≥ 9 in integers. x=8 must NOT flag, x=9 must.
    assert _flags(spark, [4, 6, 4, 6, 8])[4] is False
    assert _flags(spark, [4, 6, 4, 6, 9])[4] is True


def test_volume_anomaly_window_bound(spark):
    # an old spike scrolls out of the 24-hour window: 30 quiet hours after
    # it, the detector only sees the quiet plateau.
    counts = [50] + [5] * 30
    flags = _flags(spark, counts)
    assert flags[-1] is False


def test_log_template_masking(spark):
    from watchman_spark.operators.textstats import log_template

    df = spark.createDataFrame(
        [
            ("req 12 deadbeefcafe42 took 93ms",),
            ("GET /api/v2/items/4711 200",),
            ("dead beef stays",),  # hex runs < 8 chars are words, not ids
        ],
        "t string",
    )
    got = [r["m"] for r in df.select(log_template(F.col("t")).alias("m")).collect()]
    assert got == [
        "req <n> <hex> took <n>ms",
        "GET /api/v<n>/items/<n> <n>",
        "dead beef stays",
    ]
