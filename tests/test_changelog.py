"""Row-level CDC between snapshots (warehouse.changelog — the Iceberg
create_changelog_view analogue). Contract under test:

  - appends-only range: pure inserts, NO diff shuffle (fast path);
  - row-preserving compaction in range: EMPTY changelog (rewritten-but-
    unchanged rows cancel out in the exceptAll diff);
  - COW merge in range: one delete of each old matched row + one insert
    of its new version, untouched rows absent;
  - dirs live at both snapshots are never read (metadata skip).

The COW-merge case is additionally driver-oracled as scan_changelog
(queries_wh.py) — deletes/inserts re-derived in pure SQL from the source
events table."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from watchman_spark.sources.warehouse import ParquetWarehouse


def _mk(spark, tmp_path):
    """3 appends of 10 rows each (k ranges 0-9, 10-19, 20-29)."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    for lo in (0, 10, 20):
        df = spark.createDataFrame(
            [Row(k=lo + i, v=f"v{lo + i}") for i in range(10)]
        ).coalesce(1)
        wh.write_append(df, "tbl")
    return wh


def _chg(df):
    return sorted((r["k"], r["v"], r["_change_type"]) for r in df.collect())


def test_appends_only_pure_inserts_no_diff(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    chg = wh.changelog(spark, "tbl", from_snapshot=1, to_snapshot=3)
    assert _chg(chg) == [(k, f"v{k}", "insert") for k in range(10, 30)]
    # fast path: no replace commit in range -> no exceptAll in the plan
    assert "Except" not in chg._jdf.queryExecution().executedPlan().toString()


def test_compaction_yields_empty_changelog(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    wh.compact(spark, "tbl")  # commit 4: row-preserving rewrite
    chg = wh.changelog(spark, "tbl", from_snapshot=3, to_snapshot=4)
    assert chg.count() == 0


def test_merge_emits_delete_plus_insert(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    batch = spark.createDataFrame(
        [Row(k=k, v="NEW") for k in (5, 15)]
    ).coalesce(1)
    wh.merge_upsert(spark, "tbl", batch, ["k"])  # commit 4
    chg = wh.changelog(spark, "tbl", from_snapshot=3, to_snapshot=4)
    assert _chg(chg) == [
        (5, "NEW", "insert"),
        (5, "v5", "delete"),
        (15, "NEW", "insert"),
        (15, "v15", "delete"),
    ]


def test_untouched_dirs_are_not_read(spark, tmp_path):
    """A merge matching only commit 2's keys rewrites only that dir; the
    changelog scan must plan files from the touched dirs alone."""
    wh = _mk(spark, tmp_path)
    batch = spark.createDataFrame([Row(k=15, v="NEW")]).coalesce(1)
    wh.merge_upsert(spark, "tbl", batch, ["k"])
    chg = wh.changelog(spark, "tbl", from_snapshot=3, to_snapshot=4)
    read_files = "\n".join(chg.inputFiles())
    cs = {c["id"]: c for c in wh.commits("tbl")}
    assert cs[2]["data_dir"].split("/")[-1] in read_files  # retired dir read
    assert cs[1]["data_dir"].split("/")[-1] not in read_files  # untouched
    assert cs[3]["data_dir"].split("/")[-1] not in read_files
    assert _chg(chg) == [(15, "NEW", "insert"), (15, "v15", "delete")]


def test_full_history_from_zero(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    batch = spark.createDataFrame([Row(k=15, v="NEW")]).coalesce(1)
    wh.merge_upsert(spark, "tbl", batch, ["k"])
    chg = wh.changelog(spark, "tbl", from_snapshot=0)
    got = _chg(chg)
    # net state as inserts: every row once, k=15 carries the merged value
    assert (15, "NEW", "insert") in got
    assert (15, "v15", "insert") not in got
    assert len(got) == 30 and all(c == "insert" for _k, _v, c in got)


def test_bad_range_raises(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="to_snapshot"):
        wh.changelog(spark, "tbl", from_snapshot=3, to_snapshot=1)


def test_equal_snapshots_empty(spark, tmp_path):
    wh = _mk(spark, tmp_path)
    chg = wh.changelog(spark, "tbl", from_snapshot=2, to_snapshot=2)
    assert chg.count() == 0
    assert "_change_type" in chg.columns
