"""Incremental mode: Structured Streaming over arriving transcript files.

The reference class of tool tails logs continuously; the Spark-native
analogue is a file-source stream through the SAME parse/enrich/route
builders (they are pure DataFrame→DataFrame functions — deliberately
source-agnostic, SURVEY.md §3.3) with a foreachBatch fan-out, because a
multi-sink routed write is not a native streaming sink (T8).

Operators (SURVEY.md §2.8): T1 watermark, T2 tumbling / T3 sliding window
counts, T4 session windows, T5 streaming dedup, T7 late-data audit,
T8 micro-batch router. Exactly-once: foreachBatch writes go through the
same commit-log warehouse; the streaming checkpointLocation holds source
offsets (the analogue of the reference's file-offset state)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import PipelineConfig
from ..operators.enrich import enrich
from ..operators.parse import flatten_parsed, with_parsed
from ..operators.route import with_conv_bucket, with_sink
from ..schema import SINKS, TRANSCRIPT_SCHEMA
from ..sources.warehouse import ParquetWarehouse


def read_transcript_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """S6: incremental tail-like ingestion of newly arriving parquet files."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def windowed_sink_counts(
    stream: DataFrame,
    cfg: PipelineConfig,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """T1+T2/T3: per-sink counts per event-time window, late data bounded
    by the watermark so window state can be evicted."""
    tagged = with_sink(with_parsed(stream, cfg.patterns, engine=cfg.parse_engine))
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        tagged.withWatermark("ts", watermark)
        .groupBy(win, "sink")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sessionized_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """T4: conversation sessionization by inactivity gap."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def route_stream(
    spark: SparkSession,
    stream: DataFrame,
    cfg: PipelineConfig,
    role_dim: DataFrame | None = None,
    tool_dim: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
) -> StreamingQuery:
    """T5+T8: streaming dedup + micro-batch router. Each micro-batch runs
    the identical batch logic and appends through the commit-log warehouse
    (lineage records the epoch, so replayed batches are reconcilable)."""
    wh = ParquetWarehouse(cfg.warehouse)
    deduped = stream.dropDuplicates(["conv_id", "turn_idx"])

    def route_batch(batch_df: DataFrame, epoch_id: int) -> None:
        routed = flatten_parsed(
            with_conv_bucket(
                with_sink(
                    enrich(
                        with_parsed(batch_df, cfg.patterns, engine=cfg.parse_engine),
                        role_dim,
                        tool_dim,
                    )
                ),
                cfg.n_buckets,
            )
        ).withColumn("dt", F.to_date("ts")).withColumn("run_id", F.lit(f"epoch-{epoch_id}"))
        lineage = {"run_id": cfg.run_id, "epoch": epoch_id}
        for sink in SINKS:
            part = routed.filter(F.col("sink") == sink).drop("sink")
            wh.write_append(part, f"sink_{sink}", lineage=lineage)

    writer = deduped.writeStream.foreachBatch(route_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def late_data_audit(
    stream: DataFrame, watermark: str = "1 hour", window: str = "5 minutes"
) -> DataFrame:
    """T7: rows older than the watermark are silently dropped by windowed
    aggs; this parallel un-watermarked count-by-window makes the loss
    auditable (compare totals against the watermarked T2 output)."""
    return stream.groupBy(F.window("ts", window)).agg(F.count(F.lit(1)).alias("n_all"))
