"""SQL surface: Spark SQL over warehouse tables (SURVEY.md §2 non-goal
"no SQL parser of our own — Spark SQL is the SQL surface").

``register_views`` exposes every committed warehouse table as a temp view
so users can query sinks/aggregates/ledger with plain SQL; ``job.py sql``
is the CLI entry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.warehouse import ParquetWarehouse


def register_views(
    spark: SparkSession, wh: ParquetWarehouse, tables: list[str] | None = None
) -> list[str]:
    """Create/replace a temp view per committed table. Returns view names."""
    if tables is None:
        tables = wh.tables()
    out = []
    for t in tables:
        if wh.commits(t):
            wh.read(spark, t).createOrReplaceTempView(t)
            out.append(t)
    return out


def sql(spark: SparkSession, wh: ParquetWarehouse, query: str) -> DataFrame:
    register_views(spark, wh)
    return spark.sql(query)
