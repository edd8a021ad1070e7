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


def test_profile_columns_closed_form(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (None, "z")], "a long, b string"
    )
    rows = {r["column"]: r for r in drift.profile_columns(df, ["a", "b"]).collect()}
    a, b = rows["a"], rows["b"]
    assert (a["n"], a["n_null"], a["n_distinct"], a["min_s"], a["max_s"]) == (
        3, 1, 1, "1", "1"
    )
    assert (b["n"], b["n_null"], b["n_distinct"], b["min_s"], b["max_s"]) == (
        3, 0, 3, "x", "z"
    )


def test_profile_columns_all_null_and_empty_input(spark):
    df = spark.createDataFrame([(None,), (None,)], "a string")
    r = drift.profile_columns(df, ["a"]).collect()[0]
    assert (r["n"], r["n_null"], r["n_distinct"], r["min_s"], r["max_s"]) == (
        2, 2, 0, None, None
    )
    empty = drift.profile_columns(df.limit(0), ["a"]).collect()[0]
    assert (empty["n"], empty["n_null"], empty["n_distinct"]) == (0, 0, 0)


def test_profile_columns_rejects_empty_cols(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError):
        drift.profile_columns(df, [])


def test_job_profile_subcommand(spark, tmp_path, capsys):
    """job.py profile: the schema-level ingest gate — per-column profile
    rows over a committed warehouse table, exit 1 when a column's null
    fraction crosses the threshold."""
    import json as _json

    from watchman_spark.job import main as job_main
    from watchman_spark.sources.warehouse import ParquetWarehouse

    wh_root = str(tmp_path / "wh")
    wh = ParquetWarehouse(wh_root)
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id long, v string"
    )
    wh.write_append(df, "corpus")
    rc = job_main(["profile", "--warehouse", wh_root, "--table", "corpus"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["alert"] is False
    cols = {c["column"]: c for c in out["columns"]}
    assert cols["id"]["n_null"] == 0 and cols["id"]["n_distinct"] == 4
    assert cols["v"]["n_null"] == 2 and cols["v"]["min_s"] == "a"

    rc = job_main([
        "profile", "--warehouse", wh_root, "--table", "corpus",
        "--columns", "v", "--max-null-frac", "0.5",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["alert"] is True
    assert out["columns"][0]["null_alert"] is True


def _cat_slice(spark, names):
    return spark.createDataFrame([(n,) for n in names], "k string")


def test_drift_cat_bins_identical_and_disjoint(spark):
    a = _cat_slice(spark, ["t1"] * 3 + ["t2"] * 7)
    b = _cat_slice(spark, ["t3"] * 10)
    same = drift.total_variation(
        drift.drift_cat_bins(a, a, F.col("k"))
    ).collect()[0]
    assert same["tv"] == 0.0
    disj = drift.total_variation(
        drift.drift_cat_bins(a, b, F.col("k"))
    ).collect()[0]
    assert disj["tv"] == 1.0


def test_drift_cat_bins_new_template_mass(spark):
    # ref: 50/50 over {t1,t2}; cur: same shares plus a 20%-mass NEW
    # template — TV = that new mass (0.2): shared templates contribute
    # |0.5−0.4| each, the new one 0.2, halved → 0.2.
    ref = _cat_slice(spark, ["t1"] * 5 + ["t2"] * 5)
    cur = _cat_slice(spark, ["t1"] * 4 + ["t2"] * 4 + ["boom"] * 2)
    bins = {
        r["bucket"]: (r["n_ref"], r["n_cur"])
        for r in drift.drift_cat_bins(ref, cur, F.col("k")).collect()
    }
    assert bins == {"t1": (5, 4), "t2": (5, 4), "boom": (0, 2)}
    tv = drift.total_variation(
        drift.drift_cat_bins(ref, cur, F.col("k"))
    ).collect()[0]["tv"]
    assert tv == 0.2


def test_job_templates_subcommand(spark, tmp_path, capsys):
    """job.py templates: baseline run records the inventory without
    alerting; replay on the unchanged table appends nothing; an ingest
    introducing a NEW template shape exits 1 and names it."""
    import json as _json

    from watchman_spark.job import main as job_main
    from watchman_spark.sources.warehouse import ParquetWarehouse

    wh_root = str(tmp_path / "wh")
    wh = ParquetWarehouse(wh_root)
    batch1 = spark.createDataFrame(
        [("req 12 took 93ms",), ("req 99 took 5ms",), ("login ok",)],
        "text string",
    )
    wh.write_append(batch1, "logs")
    argv = ["templates", "--warehouse", wh_root, "--table", "logs"]

    rc = job_main(argv)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["baseline"] is True
    assert out["n_templates"] == 2 and out["n_novel"] == 2

    # replay on the unchanged table: nothing novel, ledger untouched
    ledger_snap = wh.snapshot("logs_template_ledger")
    rc = job_main(argv)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["n_novel"] == 0 and out["alert"] is False
    assert wh.snapshot("logs_template_ledger") == ledger_snap

    # a new template shape arrives → gate trips and names it
    wh.write_append(
        spark.createDataFrame([("OOM killed worker 7",)], "text string"),
        "logs",
    )
    rc = job_main(argv)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["alert"] is True and out["n_novel"] == 1
    assert out["novel_sample"][0]["template"] == "OOM killed worker <n>"

    # a tripped gate must NOT self-clear (r5 advice): the alerting run
    # skipped the ledger append, so a blind rerun/CI retry alerts again
    rc = job_main(argv)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["alert"] is True and out["n_novel"] == 1

    # --ack commits the reviewed novel set; the next run is quiet
    rc = job_main(argv + ["--ack"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["alert"] is True
    rc = job_main(argv)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["n_novel"] == 0 and out["alert"] is False
