"""Dimension enrichment — explicit broadcast hash joins.

BASELINE.json:6: "a broadcast hash join enriches turns against role/tool
lookup dimensions". Dimensions are bounded-small by construction
(FIXTURES.md §2-3), so the broadcast hint is always correct — no shuffle,
map-side only. Joins are LEFT OUTER: unknown roles/tools keep their rows
with null dimension attributes (enrichment must never drop rows — the
per-sink count invariants depend on it)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    role_dim: DataFrame | None = None,
    tool_dim: DataFrame | None = None,
) -> DataFrame:
    """Left-broadcast-join role and tool dimensions onto the turn table."""
    out = df
    if role_dim is not None:
        out = out.join(F.broadcast(role_dim), on="role", how="left")
    if tool_dim is not None:
        out = out.join(F.broadcast(tool_dim), on="tool", how="left")
    return out
