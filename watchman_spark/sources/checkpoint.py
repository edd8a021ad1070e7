"""Checkpoint ledger — resumable runs with per-partition lineage.

BASELINE.json:14: "resumable from checkpoint with per-partition lineage +
metrics". The work unit is the conv_id hash bucket (FIXTURES.md §4/5):
a bucket is durable iff a ledger row for it exists. Commit order per run:

    sink appends (3 tables) -> aggregate appends -> LEDGER append (last)

so the ledger commit is the transaction's commit point. On startup,
``reconcile`` rolls back any sink/aggregate commits whose buckets never
reached the ledger (crash between sink append and ledger append), restoring
exactly-once append semantics; then ``pending_buckets`` anti-joins the
bucket universe against committed ledger rows (SURVEY.md §2.3 J5).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import LEDGER_SCHEMA, SINKS
from .warehouse import ParquetWarehouse

LEDGER_TABLE = "ledger"
DATA_TABLES = tuple(f"sink_{s}" for s in SINKS) + ("agg_sink_counts", "agg_conv_role_tool")


def committed_buckets(spark: SparkSession, wh: ParquetWarehouse) -> set[int]:
    led = wh.read(spark, LEDGER_TABLE, schema=LEDGER_SCHEMA)
    return {r.bucket for r in led.select("bucket").distinct().collect()}


def pending_buckets(spark: SparkSession, wh: ParquetWarehouse, n_buckets: int) -> list[int]:
    done = committed_buckets(spark, wh)
    return [b for b in range(n_buckets) if b not in done]


def reconcile(spark: SparkSession, wh: ParquetWarehouse) -> list[tuple[str, int]]:
    """Roll back data commits not covered by the ledger. Returns what was
    pruned as (table, commit_id) pairs. Idempotent."""
    done = committed_buckets(spark, wh)
    pruned: list[tuple[str, int]] = []
    for table in DATA_TABLES:
        for c in wh.commits(table):
            buckets = c.get("lineage", {}).get("buckets")
            if buckets is not None and not set(buckets) <= done:
                wh.rollback_commit(table, c["id"])
                pruned.append((table, c["id"]))
    return pruned


def ledger_rows(routed: DataFrame, run_id: str, wall_ms: int) -> DataFrame:
    """Per-bucket lineage rows from the routed pass: row count + conv_id
    range + wall time (FIXTURES.md §5). Computed as a narrow aggregate over
    the already-persisted routed DataFrame."""
    return (
        routed.groupBy("conv_bucket")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("conv_id").alias("min_conv"),
            F.max("conv_id").alias("max_conv"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("conv_bucket").alias("bucket"),
            "rows",
            "min_conv",
            "max_conv",
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.lit(dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)).alias("committed_at"),
        )
    )
