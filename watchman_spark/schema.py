"""Declared schemas — schema inference is disabled everywhere.

The input transcript schema is pinned by BASELINE.json:15 (`input_hint`):
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). The parsed struct mirrors the grok pattern registry
(FIXTURES.md §1); sink schemas are input + flattened captures + sink tag.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# Grok capture struct — one field per named group across the registry
# (FIXTURES.md §1 "Grok patterns"). Computed from the pattern registry at
# session start in config.py; this constant is the default-registry result.
PARSED_SCHEMA = StructType(
    [
        StructField("tool_name", StringType(), True),
        StructField("args_n", IntegerType(), True),
        StructField("latency_ms", IntegerType(), True),
        StructField("status", StringType(), True),
        StructField("error_code", StringType(), True),
        StructField("error_msg", StringType(), True),
        StructField("err_ms", IntegerType(), True),
    ]
)

ROLE_DIM_SCHEMA = StructType(
    [
        StructField("role", StringType(), False),
        StructField("role_group", StringType(), False),
        StructField("is_agent", BooleanType(), False),
    ]
)

TOOL_DIM_SCHEMA = StructType(
    [
        StructField("tool", StringType(), False),
        StructField("tool_category", StringType(), False),
        StructField("owner_team", StringType(), False),
    ]
)

LEDGER_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("rows", LongType(), False),
        StructField("min_conv", StringType(), True),
        StructField("max_conv", StringType(), True),
        StructField("wall_ms", LongType(), False),
        StructField("committed_at", TimestampType(), False),
    ]
)

SINKS = ("errors", "tool_calls", "conversational")


def routed_schema() -> StructType:
    """Schema of routed (sink) rows: input + flattened parsed + sink tag."""
    fields = list(TRANSCRIPT_SCHEMA.fields)
    fields += [StructField(f.name, f.dataType, True) for f in PARSED_SCHEMA.fields]
    fields.append(StructField("sink", StringType(), False))
    return StructType(fields)
