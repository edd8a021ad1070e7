"""Invariant audit operators against a fully-run warehouse, including the
golden digest comparison (the per-turn text-equality check)."""

from __future__ import annotations

import pytest

from watchman_spark.config import PipelineConfig
from watchman_spark.operators import invariants as inv
from watchman_spark.plans.pipeline import run_pipeline
from watchman_spark.sources.warehouse import ParquetWarehouse
from watchman_spark.synth import SynthParams, compute_golden, role_dim, synth_transcripts, tool_dim

PARAMS = SynthParams(seed=23, n_convs=70, C=400, hot_cap=150)


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("inv_wh"))
    w = ParquetWarehouse(root)
    w.write_append(synth_transcripts(spark, PARAMS), "transcripts")
    w.write_append(role_dim(spark), "role_dim")
    w.write_append(tool_dim(spark), "tool_dim")
    run_pipeline(spark, PipelineConfig(warehouse=root, n_buckets=8, run_id="inv"))
    return w


def test_routed_row_equality(spark, wh):
    assert inv.routed_row_equality(spark, wh) == {
        "missing_from_sinks": 0,
        "extra_in_sinks": 0,
    }


def test_sinks_disjoint(spark, wh):
    assert inv.sinks_disjoint(spark, wh)


def test_text_equality_digests_match_golden(spark, wh):
    golden = compute_golden(PARAMS)
    sample = list(golden["conv_digests"])
    got = inv.text_equality_digests(spark, wh, sample_convs=sample)
    assert got == golden["conv_digests"]


def test_text_equality_audit_distributed(spark, wh):
    """The scale-safe audit: digests compared via a distributed full-outer
    join — only three counters ever reach the driver (no per-conversation
    collect). All-zero on a correctly routed warehouse."""
    assert inv.text_equality_audit(spark, wh) == {
        "missing": 0,
        "extra": 0,
        "mismatched": 0,
    }


def test_digest_mismatches_counts(spark):
    a = spark.createDataFrame(
        [("c1", "d1"), ("c2", "dX"), ("c3", "d3")], ["conv_id", "digest"]
    )
    g = spark.createDataFrame(
        [("c1", "d1"), ("c2", "d2"), ("c4", "d4")], ["conv_id", "digest"]
    )
    assert inv.digest_mismatches(a, g) == {"missing": 1, "extra": 1, "mismatched": 1}


def test_turn_order_is_physical_in_files(wh):
    """The ordering invariant is a property of the written files, not a
    read-time sort: scanning any sink data file RAW (pyarrow, no Spark, no
    ordering) must yield turn_idx already sorted within each conv_id run.
    Guards the write-aligned sortWithinPartitions against regressions (the
    dynamic-partition writer would otherwise re-sort by partition columns
    only, destroying turn order)."""
    import os

    import pyarrow.dataset as pa_ds

    checked_files = 0
    for c in wh.commits("sink_conversational"):
        d = os.path.join(wh.root, c["data_dir"])
        ds = pa_ds.dataset(d, format="parquet", partitioning="hive")
        for frag in ds.get_fragments():
            tbl = frag.to_table(columns=["conv_id", "turn_idx"])
            convs = tbl.column("conv_id").to_pylist()
            idxs = tbl.column("turn_idx").to_pylist()
            last: dict[str, int] = {}
            prev_conv = None
            for cid, ti in zip(convs, idxs):
                if cid == prev_conv:
                    assert ti > last[cid], (frag.path, cid, ti, last[cid])
                else:
                    # conv runs must be contiguous (file sorted by conv_id)
                    assert cid not in last, (frag.path, cid, "non-contiguous")
                last[cid] = ti
                prev_conv = cid
            checked_files += 1
    assert checked_files > 0


def test_job_audit_subcommand(spark, wh):
    """job.py audit: the operational wrapper over the invariant audits
    returns 0 (and an ok report) on a correctly routed warehouse."""
    from watchman_spark.job import main as job_main

    assert job_main(["audit", "--warehouse", wh.root]) == 0
