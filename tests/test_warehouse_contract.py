"""Backend-parametrized warehouse CONTRACT suite (round-3 task: make the
Iceberg surface testable). The pipeline relies on exactly four storage
semantics (BASELINE.json:6/14 — Iceberg input + per-sink Iceberg tables,
resumable with lineage):

  1. atomic visibility — an append is all-or-nothing; data files staged by
     a crashed writer are invisible to readers;
  2. snapshot read — read(snapshot=s) returns exactly the rows committed
     at or before s, immune to later appends;
  3. incremental read — read(from_snapshot=s) returns exactly the rows
     appended after s (the resume/CDC path);
  4. lineage round-trip — commit metadata (run_id, buckets, ...) written
     with an append is recoverable from that commit/snapshot.

One suite, two backends: ParquetWarehouse (runs here) and IcebergBackend
(runs wherever an iceberg-spark-runtime jar is on the classpath;
skip-marked with the reason in this sandbox — no jar exists and none can
be downloaded, SURVEY.md §0 [ENV]). The adapter below narrows both
backends to the same five calls so the test bodies are backend-agnostic.
"""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from watchman_spark.sources.warehouse import IcebergBackend, ParquetWarehouse


def _has_iceberg_jar() -> bool:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(glob.glob(os.path.join(jars, "iceberg-spark-runtime*.jar")))


class ParquetAdapter:
    """ParquetWarehouse narrowed to the contract surface.
    ``manifest_every`` is threaded through so the suite runs under BOTH
    commit-log layouts: loose files only, and manifest-compacted (every=1
    forces a manifest after every append, the most adversarial layout)."""

    def __init__(self, spark, root: str, manifest_every: int | None = 64):
        self.spark = spark
        self.wh = ParquetWarehouse(root, manifest_every=manifest_every)

    def append(self, df, table: str, lineage: dict | None = None) -> None:
        self.wh.write_append(df, table, lineage=lineage)

    def read(self, table: str, snapshot=None, from_snapshot=None):
        return self.wh.read(
            self.spark, table, snapshot=snapshot, from_snapshot=from_snapshot
        )

    def snapshots(self, table: str) -> list[int]:
        return [c["id"] for c in self.wh.commits(table)]

    def lineage_of(self, table: str, snapshot: int) -> dict:
        return next(
            c["lineage"] for c in self.wh.commits(table) if c["id"] == snapshot
        )

    def plant_uncommitted_garbage(self, table: str, df) -> None:
        """Simulate a writer that crashed between staging data files and
        the commit: files exist under the table's data area but no commit
        references them."""
        orphan = os.path.join(self.wh._tdir(table), "data", "orphan-crashed")
        df.write.mode("overwrite").parquet(orphan)

    def compact(self, table: str) -> None:
        self.wh.compact(self.spark, table)

    def merge_upsert(self, table: str, batch, keys: list[str]) -> None:
        self.wh.merge_upsert(self.spark, table, batch, keys)


class IcebergAdapter:
    """IcebergBackend narrowed to the same surface. Exercised only when an
    iceberg-spark-runtime jar is present (a real deployment runs this suite
    once against its catalog before trusting the backend)."""

    def __init__(self, spark, catalog: str = "local", namespace: str = "contract"):
        self.spark = spark
        self.be = IcebergBackend(catalog, namespace)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.be.prefix}")

    def append(self, df, table: str, lineage: dict | None = None) -> None:
        name = f"{self.be.prefix}.{table}"
        if not self.spark.catalog.tableExists(name):
            df.limit(0).writeTo(name).create()
        self.be.write_append(df, table, lineage=lineage)

    def read(self, table: str, snapshot=None, from_snapshot=None):
        return self.be.read(
            self.spark, table, snapshot=snapshot, from_snapshot=from_snapshot
        )

    def snapshots(self, table: str) -> list[int]:
        return self.be.snapshots(self.spark, table)

    def lineage_of(self, table: str, snapshot: int) -> dict:
        import json as _json

        rows = self.spark.sql(
            f"SELECT summary FROM {self.be.prefix}.{table}.snapshots "
            f"WHERE snapshot_id = {snapshot}"
        ).collect()
        summary = rows[0]["summary"]
        return {
            k: _json.loads(v)
            for k, v in summary.items()
            if k in ("run_id", "buckets", "epoch")
        }

    def plant_uncommitted_garbage(self, table: str, df) -> None:
        loc = (
            self.spark.sql(f"DESCRIBE EXTENDED {self.be.prefix}.{table}")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        df.write.mode("overwrite").parquet(os.path.join(loc, "data", "orphan-crashed"))

    def compact(self, table: str) -> None:
        self.be.compact(self.spark, table)

    def merge_upsert(self, table: str, batch, keys: list[str]) -> None:
        self.be.merge_upsert(self.spark, table, batch, keys)


BACKENDS = [
    "parquet",
    "parquet-compacted",
    pytest.param(
        "iceberg",
        marks=pytest.mark.skipif(
            not _has_iceberg_jar(),
            reason="no iceberg-spark-runtime jar in this sandbox and no "
            "network to fetch one (SURVEY.md §0 [ENV]); the suite is "
            "backend-complete — run it on a cluster with the jar",
        ),
    ),
]


@pytest.fixture(params=BACKENDS)
def be(request, spark, tmp_path_factory):
    if request.param == "parquet":
        return ParquetAdapter(spark, str(tmp_path_factory.mktemp("contract_wh")))
    if request.param == "parquet-compacted":
        return ParquetAdapter(
            spark, str(tmp_path_factory.mktemp("contract_whc")), manifest_every=1
        )
    return IcebergAdapter(spark)


def _batch(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def _keys(df) -> set[int]:
    return {r["k"] for r in df.select("k").collect()}


def test_atomic_visibility(spark, be):
    """An append is all-or-nothing, and a crashed writer's staged-but-
    uncommitted files are invisible (the property the single-pass fan-out's
    staging + rename commit depends on)."""
    be.append(_batch(spark, 0, 10), "t_atomic")
    assert _keys(be.read("t_atomic")) == set(range(10))
    be.plant_uncommitted_garbage("t_atomic", _batch(spark, 100, 110))
    assert _keys(be.read("t_atomic")) == set(range(10))  # garbage invisible


def test_snapshot_read(spark, be):
    """read(snapshot=s) is immune to appends after s (the audit-job and
    reproducible-rerun property)."""
    be.append(_batch(spark, 0, 5), "t_snap")
    s1 = be.snapshots("t_snap")[-1]
    be.append(_batch(spark, 5, 12), "t_snap")
    assert _keys(be.read("t_snap", snapshot=s1)) == set(range(5))
    assert _keys(be.read("t_snap")) == set(range(12))


def test_incremental_read(spark, be):
    """read(from_snapshot=s) yields exactly the rows appended after s —
    the resume/incremental-processing path (SURVEY.md §2.1 S2)."""
    be.append(_batch(spark, 0, 5), "t_incr")
    s1 = be.snapshots("t_incr")[-1]
    be.append(_batch(spark, 5, 9), "t_incr")
    s2 = be.snapshots("t_incr")[-1]
    be.append(_batch(spark, 9, 14), "t_incr")
    assert _keys(be.read("t_incr", from_snapshot=s2)) == set(range(9, 14))
    assert _keys(be.read("t_incr", snapshot=s2, from_snapshot=s1)) == set(range(5, 9))


def test_lineage_roundtrip(spark, be):
    """Commit metadata written with an append is recoverable from that
    commit — what makes per-partition progress auditable and replay
    detection possible (BASELINE.json:14 'lineage + metrics')."""
    lin = {"run_id": "contract-run", "buckets": [1, 2, 3]}
    be.append(_batch(spark, 0, 3), "t_lineage", lineage=lin)
    snap = be.snapshots("t_lineage")[-1]
    got = be.lineage_of("t_lineage", snap)
    assert got["run_id"] == "contract-run"
    assert list(got["buckets"]) == [1, 2, 3]


def test_manifest_compaction_equivalence_and_rollback(spark, tmp_path):
    """Manifest compaction is a pure read optimization: a compacted log
    resolves the SAME commit list as a loose one, snapshot/incremental
    reads agree, and rolling back a commit that was already compacted into
    the newest manifest still removes it from view."""
    import os as _os

    roots = {
        "loose": str(tmp_path / "loose"),
        "compact": str(tmp_path / "compact"),
    }
    whs = {
        "loose": ParquetWarehouse(roots["loose"], manifest_every=None),
        "compact": ParquetWarehouse(roots["compact"], manifest_every=3),
    }
    for i in range(8):
        for wh in whs.values():
            wh.write_append(_batch(spark, i * 10, i * 10 + 3), "t")
    # manifests actually exist in the compacted layout
    cdir = whs["compact"]._commits_dir("t")
    manifests = [n for n in _os.listdir(cdir) if n.startswith("manifest-")]
    assert manifests, "expected manifest files at manifest_every=3"
    # identical resolution
    strip = lambda cs: [(c["id"], c["rows"]) for c in cs]  # data_dir tokens are random uuids
    assert strip(whs["compact"].commits("t")) == strip(whs["loose"].commits("t"))
    for kw in ({"snapshot": 5}, {"from_snapshot": 4}, {"snapshot": 7, "from_snapshot": 2}):
        a = _keys(whs["compact"].read(spark, "t", **kw))
        b = _keys(whs["loose"].read(spark, "t", **kw))
        assert a == b, kw
    # rollback of a commit INSIDE the newest manifest (id 2 <= manifest 6)
    for wh in whs.values():
        wh.rollback_commit("t", 2)
    assert strip(whs["compact"].commits("t")) == strip(whs["loose"].commits("t"))
    assert [c["id"] for c in whs["compact"].commits("t")] == [1, 3, 4, 5, 6, 7, 8]
    assert _keys(whs["compact"].read(spark, "t")) == _keys(whs["loose"].read(spark, "t"))
    # appends continue cleanly after a rollback under compaction
    whs["compact"].write_append(_batch(spark, 100, 102), "t")
    assert whs["compact"].snapshot("t") == 9


def _vals(df) -> dict:
    return {r["k"]: r["v"] for r in df.select("k", "v").collect()}


def test_compaction_contract(spark, be):
    """Data-file compaction is invisible to every reader semantics: latest
    read identical, time travel to pre-compaction snapshots intact, and an
    incremental scan crossing the compaction returns exactly the rows
    appended after it (the rewrite added none)."""
    for lo in (0, 5, 9):
        be.append(_batch(spark, lo, lo + 4), "t_comp")
    pre = be.snapshots("t_comp")[-1]
    expect = _vals(be.read("t_comp"))
    be.compact("t_comp")
    assert _vals(be.read("t_comp")) == expect
    assert _vals(be.read("t_comp", snapshot=pre)) == expect
    s_comp = be.snapshots("t_comp")[-1]
    be.append(_batch(spark, 100, 103), "t_comp")
    # crossing the (row-preserving) compaction: appends after `pre` only
    assert _keys(be.read("t_comp", from_snapshot=pre)) == {100, 101, 102}
    assert _keys(be.read("t_comp", from_snapshot=s_comp)) == {100, 101, 102}


def test_merge_upsert_contract(spark, be):
    """COW merge: matched keys take the batch's values, unmatched batch
    rows insert, untouched rows survive verbatim."""
    be.append(_batch(spark, 0, 6), "t_merge")
    be.append(_batch(spark, 6, 10), "t_merge")
    batch = spark.range(8, 13).select(
        F.col("id").alias("k"), F.concat(F.lit("V"), F.col("id")).alias("v")
    )
    be.merge_upsert("t_merge", batch, ["k"])
    got = _vals(be.read("t_merge"))
    assert set(got) == set(range(13))
    for k in range(8):
        assert got[k] == f"v{k}", k  # untouched
    for k in range(8, 13):
        assert got[k] == f"V{k}", k  # updated (8,9) + inserted (10-12)


def test_merge_pure_insert_is_append(spark, be):
    """A batch with no key matches is a plain append: incremental
    consumers see it like any other append."""
    be.append(_batch(spark, 0, 4), "t_mins")
    s1 = be.snapshots("t_mins")[-1]
    be.merge_upsert("t_mins", _batch(spark, 50, 53), ["k"])
    assert _keys(be.read("t_mins")) == set(range(4)) | {50, 51, 52}
    assert _keys(be.read("t_mins", from_snapshot=s1)) == {50, 51, 52}


# -- parquet-backend specifics of the rewrite path (file layout, guards,
#    expiry) — below the contract because they assert on-disk structure the
#    Iceberg runtime manages internally ------------------------------------


def _data_dirs(wh: ParquetWarehouse, table: str) -> dict[int, str]:
    return {c["id"]: c["data_dir"] for c in wh.commits(table)}


def test_merge_rewrites_only_affected_dirs(spark, tmp_path):
    """The COW locality property that makes merge affordable at scale:
    dirs without a matched key are not rewritten (same files, same
    mtimes); only the matched dirs are superseded."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.write_append(_batch(spark, 0, 5), "t")      # commit 1: keys 0-4
    wh.write_append(_batch(spark, 5, 10), "t")     # commit 2: keys 5-9
    wh.write_append(_batch(spark, 10, 15), "t")    # commit 3: keys 10-14
    dirs = _data_dirs(wh, "t")

    def files_of(cid):
        root = os.path.join(wh.root, dirs[cid])
        return sorted(
            (os.path.join(b, n), os.path.getmtime(os.path.join(b, n)))
            for b, _d, ns in os.walk(root)
            for n in ns
        )

    before = {cid: files_of(cid) for cid in dirs}
    batch = spark.range(6, 8).select(
        F.col("id").alias("k"), F.lit("patched").alias("v")
    )
    meta = wh.merge_upsert(spark, "t", batch, ["k"])
    assert meta["op"] == "replace"
    assert meta["replaces"] == [2]  # only the commit holding keys 5-9
    assert files_of(1) == before[1]
    assert files_of(3) == before[3]
    got = {r["k"]: r["v"] for r in wh.read(spark, "t").collect()}
    assert got[6] == got[7] == "patched"
    assert got[5] == "v5" and got[8] == "v8"  # survivors of the rewritten dir
    assert wh.table_rows("t") == 15


def test_merge_incremental_guard_and_rollback(spark, tmp_path):
    """Incremental read across a row-changing replace raises (appends
    alone misdescribe the change) unless the caller opts in; rolling the
    merge commit back restores the pre-merge table."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.write_append(_batch(spark, 0, 6), "t")
    s1 = wh.snapshot("t")
    pre = {r["k"]: r["v"] for r in wh.read(spark, "t").collect()}
    batch = spark.range(2, 4).select(
        F.col("id").alias("k"), F.lit("new").alias("v")
    )
    merge_id = wh.merge_upsert(spark, "t", batch, ["k"])["id"]
    with pytest.raises(ValueError, match="row-changing replace"):
        wh.read(spark, "t", from_snapshot=s1)
    # opt-in: the appends in range (none here — the merge is one replace,
    # so the result is empty and needs the caller's schema like any empty
    # incremental read)
    from pyspark.sql.types import StructType

    allowed = wh.read(
        spark, "t", from_snapshot=s1, allow_replaces=True,
        schema=StructType.fromDDL("k bigint, v string"),
    )
    assert allowed.count() == 0
    wh.rollback_commit("t", merge_id)
    assert {r["k"]: r["v"] for r in wh.read(spark, "t").collect()} == pre


def test_merge_duplicate_key_guard(spark, tmp_path):
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    wh.write_append(_batch(spark, 0, 3), "t")
    dup = _batch(spark, 1, 2).unionAll(_batch(spark, 1, 2))
    with pytest.raises(ValueError, match="duplicate merge keys"):
        wh.merge_upsert(spark, "t", dup, ["k"])


def test_compact_reduces_files_and_expire_reclaims(spark, tmp_path):
    """compact() actually shrinks the physical layout; expire_snapshots
    deletes exactly the superseded dirs, after which the latest snapshot
    still reads while expired time travel fails legibly."""
    wh = ParquetWarehouse(str(tmp_path / "wh"))
    for lo in range(0, 40, 5):
        wh.write_append(_batch(spark, lo, lo + 5).repartition(4), "t")
    def n_files():
        cs = wh._effective(wh.commits("t"))
        return sum(
            1
            for c in cs
            for _b, _d, ns in os.walk(os.path.join(wh.root, c["data_dir"]))
            for n in ns
            if n.endswith(".parquet")
        )
    files_before = n_files()
    pre = wh.snapshot("t")
    meta = wh.compact(spark, "t", target_partitions=2)
    assert meta["rows"] == 40 and meta["rows_changed"] is False
    assert n_files() <= 2 < files_before
    assert wh.table_rows("t") == 40
    # expire: superseded dirs go away, latest still reads, time travel raises
    dead = wh.expire_snapshots("t", wh.snapshot("t"))
    assert len(dead) == 8
    assert _keys(wh.read(spark, "t")) == set(range(40))
    with pytest.raises(FileNotFoundError, match="expired"):
        wh.read(spark, "t", snapshot=pre)


def test_compact_under_manifest_layout(spark, tmp_path):
    """Replace commits fold identically when resolved through a manifest
    checkpoint (manifest_every=1 forces one after every commit)."""
    wh = ParquetWarehouse(str(tmp_path / "wh"), manifest_every=1)
    wh.write_append(_batch(spark, 0, 4), "t")
    wh.write_append(_batch(spark, 4, 8), "t")
    wh.compact(spark, "t")
    wh.write_append(_batch(spark, 8, 11), "t")
    assert _keys(wh.read(spark, "t")) == set(range(11))
    assert [c["id"] for c in wh._effective(wh.commits("t"))] == [3, 4]


def test_schema_evolution_add_column(spark, tmp_path):
    """Iceberg-parity schema evolution (add column): commits written
    before a column existed read back with NULL for it when the caller
    declares the evolved schema — both in the flat-dir read path and the
    per-dir union path (partitioned commits), and through a compaction
    that rewrites old and new layouts into one."""
    from pyspark.sql.types import StructType

    wh = ParquetWarehouse(str(tmp_path / "wh"))
    old = spark.range(0, 3).selectExpr("id AS k", "concat('v', id) AS v")
    wh.write_append(old, "t")
    new = spark.range(3, 6).selectExpr(
        "id AS k", "concat('v', id) AS v", "CAST(id * 10 AS BIGINT) AS score"
    )
    wh.write_append(new, "t")
    evolved = StructType.fromDDL("k bigint, v string, score bigint")
    got = {r["k"]: r["score"] for r in wh.read(spark, "t", schema=evolved).collect()}
    assert got == {0: None, 1: None, 2: None, 3: 30, 4: 40, 5: 50}
    # compaction unifies the physical layouts; the evolved schema remains
    wh.compact(spark, "t", schema=evolved)
    got2 = {r["k"]: r["score"] for r in wh.read(spark, "t", schema=evolved).collect()}
    assert got2 == got
    # partitioned-commit path: same nulls through the per-dir union
    wh2 = ParquetWarehouse(str(tmp_path / "wh2"))
    wh2.write_append(old.withColumn("p", F.lit("a")), "t", partition_by=["p"])
    wh2.write_append(
        new.withColumn("p", F.lit("b")), "t", partition_by=["p"]
    )
    evolved_p = StructType.fromDDL("k bigint, v string, score bigint, p string")
    got3 = {
        r["k"]: r["score"]
        for r in wh2.read(spark, "t", schema=evolved_p).collect()
    }
    assert got3 == got
