"""Operational maintenance surface: orphan-dir cleanup
(remove_orphan_files analogue) and the metadata inspection tables
(snapshots/files — the ``table.snapshots`` / ``table.files`` analogues).
These are the jobs/queries a production operator runs on a cadence; the
data-path semantics they must NOT disturb (time travel, live reads) are
asserted alongside."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row

from watchman_spark.sources.warehouse import ParquetWarehouse


def _mk(spark, tmp_path, n_commits=2):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    for i in range(n_commits):
        df = spark.createDataFrame(
            [Row(k=i * 10 + j, v=f"v{i * 10 + j}") for j in range(10)]
        ).coalesce(1)
        wh.write_append(df, "tbl", lineage={"batch": i})
    return wh


def _plant_orphan(wh, age_s=0.0):
    ddir = os.path.join(wh.root, "tbl", "data")
    orphan = os.path.join(ddir, "deadbeef" * 4)
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("garbage")
    if age_s:
        old = os.path.getmtime(orphan) - age_s
        os.utime(orphan, (old, old))
    return orphan


def test_remove_orphans_reclaims_uncommitted_dirs(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    orphan = _plant_orphan(wh, age_s=7200)
    removed = wh.remove_orphans("tbl", older_than_s=3600)
    assert removed == [orphan] and not os.path.isdir(orphan)
    # live data untouched
    assert wh.read(spark, "tbl").count() == 20


def test_grace_period_protects_inflight_writers(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    orphan = _plant_orphan(wh, age_s=0)  # just staged
    assert wh.remove_orphans("tbl", older_than_s=3600) == []
    assert os.path.isdir(orphan)


def test_retired_dirs_survive_vacuum(spark, tmp_path):
    """Dirs superseded by compaction are REFERENCED (time travel owns
    them until expire_snapshots) — vacuum must not touch them."""
    wh = _mk(spark, tmp_path)
    wh.compact(spark, "tbl")
    assert wh.remove_orphans("tbl", older_than_s=0) == []
    # pre-compaction snapshot still readable
    assert wh.read(spark, "tbl", snapshot=1).count() == 10


def test_meta_snapshots(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    wh.compact(spark, "tbl")
    snaps = {r["id"]: r for r in wh.meta_snapshots(spark, "tbl").collect()}
    assert set(snaps) == {1, 2, 3}
    assert snaps[1]["op"] == "append" and snaps[1]["rows"] == 10
    assert snaps[3]["op"] == "replace" and sorted(snaps[3]["replaces"]) == [1, 2]
    assert json.loads(snaps[1]["lineage"]) == {"batch": 0}


def test_meta_files(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    files = wh.meta_files(spark, "tbl").collect()
    assert sum(r["rows"] for r in files) == wh.table_rows("tbl") == 20
    assert {r["commit_id"] for r in files} == {1, 2}
    assert all(r["bytes"] > 0 and r["path"].endswith(".parquet") for r in files)
    # snapshot view: only commit 1's files
    f1 = wh.meta_files(spark, "tbl", snapshot=1).collect()
    assert {r["commit_id"] for r in f1} == {1}


def test_job_vacuum_subcommand(spark, tmp_path, capsys):
    from watchman_spark.job import main as job_main

    wh = _mk(spark, tmp_path)
    orphan = _plant_orphan(wh, age_s=7200)
    rc = job_main([
        "vacuum", "--warehouse", wh.root, "--table", "tbl",
        "--older-than", "3600",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["removed_orphan_dirs"] == 1
    assert not os.path.isdir(orphan)
