"""Distribution-drift operator semantics (operators/drift.py): exact TV
properties and the PSI twin vs an independent numpy recompute."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from watchman_spark.operators import drift


def _slice(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], ["x"])


def _tv(spark, a, b, width=10):
    bins = drift.drift_bins(_slice(spark, a), _slice(spark, b), F.col("x"), width)
    return drift.total_variation(bins).collect()[0]


def test_tv_identical_slices_is_zero(spark):
    vals = [5, 15, 25, 25, 90]
    row = _tv(spark, vals, vals)
    assert row["tv_num"] == 0 and row["tv"] == 0.0


def test_tv_disjoint_slices_is_one(spark):
    row = _tv(spark, [1, 2, 3], [101, 102, 103, 104])
    assert row["tv"] == 1.0
    assert row["n_ref_total"] == 3 and row["n_cur_total"] == 4


def test_tv_matches_independent_recompute(spark):
    rng = np.random.RandomState(7)
    a = rng.randint(0, 200, size=300)
    b = rng.randint(50, 260, size=211)  # shifted → real drift
    row = _tv(spark, a, b)
    # independent: numpy histogram over the same floor-buckets
    ca: dict[int, int] = {}
    cb: dict[int, int] = {}
    for v in a:
        ca[v // 10] = ca.get(v // 10, 0) + 1
    for v in b:
        cb[v // 10] = cb.get(v // 10, 0) + 1
    n, m = len(a), len(b)
    tv_num = sum(
        abs(ca.get(k, 0) * m - cb.get(k, 0) * n) for k in set(ca) | set(cb)
    )
    assert row["tv_num"] == tv_num
    expect = (tv_num * 1000000 // (2 * n * m)) / 1000000.0
    assert row["tv"] == expect
    assert 0.0 < row["tv"] < 1.0


def test_psi_matches_numpy(spark):
    rng = np.random.RandomState(11)
    a = rng.randint(0, 100, size=400)
    b = np.concatenate([rng.randint(0, 100, size=300), rng.randint(80, 160, size=100)])
    bins = drift.drift_bins(_slice(spark, a), _slice(spark, b), F.col("x"), 10)
    got = drift.psi(bins).collect()[0]["psi"]
    rows = bins.collect()
    n = sum(r["n_ref"] for r in rows)
    m = sum(r["n_cur"] for r in rows)
    eps = 1e-6
    expect = sum(
        (r["n_ref"] / n + eps - (r["n_cur"] / m + eps))
        * math.log((r["n_ref"] / n + eps) / (r["n_cur"] / m + eps))
        for r in rows
    )
    assert got == pytest.approx(expect, rel=1e-9)
    assert got > 0.05  # the planted shift is visible


def test_psi_zero_for_identical(spark):
    vals = list(range(50)) * 3
    bins = drift.drift_bins(_slice(spark, vals), _slice(spark, vals), F.col("x"), 10)
    assert drift.psi(bins).collect()[0]["psi"] == pytest.approx(0.0, abs=1e-12)
