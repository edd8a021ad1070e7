"""The batch pipeline: parse → enrich → route → aggregate (BASELINE.json:6).

Composition of pure DataFrame→DataFrame stages (SURVEY.md §3.1). Physical
shape at scale (the 10^12-turn argument, SURVEY.md §4): scan, parse,
broadcast-enrich and route-tag are all map-side; the single all-to-all
shuffle is the explicit conv_id repartition; the rollup's reduce is salted.
That map-heaviness is what makes ≥0.8 N→4N scaling efficiency plausible.

Resume: work unit = conv_bucket; see sources/checkpoint.py for the commit
protocol. Re-running a fully-committed warehouse is a no-op (idempotence).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..metrics import RunMetrics
from ..operators.aggregate import conv_role_tool_rollup, per_sink_counts
from ..operators.enrich import enrich
from ..operators.parse import with_parsed
from ..operators.route import ordered_by_turn, split_by_sink, with_conv_bucket, with_sink
from ..schema import ROLE_DIM_SCHEMA, TOOL_DIM_SCHEMA, TRANSCRIPT_SCHEMA
from ..sources import checkpoint as ckpt
from ..sources.warehouse import ParquetWarehouse


def build_routed(
    df: DataFrame,
    cfg: PipelineConfig,
    role_dim: DataFrame | None = None,
    tool_dim: DataFrame | None = None,
) -> DataFrame:
    """The logical plan shared by batch, entry() and streaming paths:
    parse → enrich → sink-tag → bucket → conv-ordered. Source-agnostic."""
    parsed = with_parsed(df, cfg.patterns, engine=cfg.parse_engine)
    enriched = enrich(parsed, role_dim, tool_dim)
    tagged = with_conv_bucket(with_sink(enriched), cfg.n_buckets)
    return ordered_by_turn(tagged)


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    input_df: DataFrame | None = None,
    role_dim: DataFrame | None = None,
    tool_dim: DataFrame | None = None,
    metrics_path: str | None = None,
) -> RunMetrics:
    """Execute one resumable batch run against the warehouse."""
    t0 = time.time()
    wh = ParquetWarehouse(cfg.warehouse)
    m = RunMetrics(run_id=cfg.run_id)

    # 0. crash recovery: prune data commits that never reached the ledger
    ckpt.reconcile(spark, wh)

    # 1. source + dims
    if input_df is None:
        input_df = wh.read(spark, cfg.input_table, schema=TRANSCRIPT_SCHEMA)
    if role_dim is None:
        role_dim = wh.read(spark, "role_dim", schema=ROLE_DIM_SCHEMA)
    if tool_dim is None:
        tool_dim = wh.read(spark, "tool_dim", schema=TOOL_DIM_SCHEMA)

    # 2. checkpoint filter: only process buckets without a ledger row.
    #    (On Iceberg the input would be bucket-partitioned so this prunes
    #    at the scan; the parquet fallback filters post-scan.)
    todo = ckpt.pending_buckets(spark, wh, cfg.n_buckets)
    m.buckets = todo
    if not todo:
        m.finish()
        if metrics_path:
            m.write(metrics_path)
        return m
    work = with_conv_bucket(input_df, cfg.n_buckets)
    if len(todo) < cfg.n_buckets:
        work = work.filter(F.col("conv_bucket").isin(todo))
    work = work.drop("conv_bucket")

    # 3-6. parse → enrich → route → order; persist ONCE for all sinks
    routed, sinks = split_by_sink(build_routed(work, cfg, role_dim, tool_dim))
    try:
        lineage = {"run_id": cfg.run_id, "buckets": todo}
        flat_cols = [c for c in routed.columns]  # keep struct; flatten per sink below
        for sink_name, sdf in sinks.items():
            out = sdf.select(
                *[c for c in flat_cols if c != "parsed"],
                F.col("parsed.*"),
                F.to_date("ts").alias("dt"),
            )
            meta = wh.write_append(
                out, f"sink_{sink_name}", partition_by=["conv_bucket", "dt"], lineage=lineage
            )
            m.rows_per_sink[sink_name] = meta["rows"]
        m.rows_in = sum(m.rows_per_sink.values())
        # lines that matched no grok pattern (non-null text, null captures)
        m.parse_miss = routed.filter(
            (F.col("sink") == "conversational") & F.col("text").isNotNull()
        ).count()

        # 7. aggregates (decomposable partials; readers re-aggregate)
        wh.write_append(per_sink_counts(routed), "agg_sink_counts", lineage=lineage)
        wh.write_append(
            conv_role_tool_rollup(routed, salt_n=cfg.salt), "agg_conv_role_tool", lineage=lineage
        )

        # 8. ledger LAST — the transaction commit point
        wall_ms = int((time.time() - t0) * 1000)
        wh.write_append(ckpt.ledger_rows(routed, cfg.run_id, wall_ms), ckpt.LEDGER_TABLE)
    finally:
        routed.unpersist()

    m.finish()
    if metrics_path:
        m.write(metrics_path)
    return m


def read_sink_counts(spark: SparkSession, wh: ParquetWarehouse) -> DataFrame:
    """Final per-sink totals: re-aggregate the per-run partial counts."""
    parts = wh.read(spark, "agg_sink_counts")
    return parts.groupBy("sink").agg(F.sum("n").alias("n"))
