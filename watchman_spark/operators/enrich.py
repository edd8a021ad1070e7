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


def scd2_enrich(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    ts_col: str,
    dim_key: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """AS-OF dimension enrichment against a slowly-changing (SCD type 2)
    dimension: each fact row picks the dimension version whose half-open
    validity interval [valid_from, valid_to) contains the fact's
    timestamp — the lookup shape every log enrichment hits once a
    dimension starts versioning (a tool's config changed on date D; rows
    before D must see the old attributes).

    Plan shape: ONE broadcast hash join on the equality key with the two
    interval bounds as a residual join condition — no range-join
    explosion, no shuffle (the versioned dimension is |dim| × versions
    rows, still dimension-sized). LEFT by default: facts with no
    matching key OR no covering version keep their rows with null
    attributes (same never-drop contract as enrich()). A dimension with
    overlapping intervals for one key would duplicate facts — keep
    intervals disjoint per key (the SCD2 invariant; half-open intervals
    make adjacent versions safely non-overlapping at the boundary)."""
    dim_key = dim_key or fact_key
    attrs_set = set(dim.columns) - {dim_key, valid_from, valid_to}
    clash = sorted(attrs_set & set(facts.columns))
    if clash:
        raise ValueError(
            f"scd2_enrich: dim attribute(s) {clash} collide with fact "
            "columns — rename them on one side (appending them verbatim "
            "would create duplicate column names, the never-surprise "
            "contract of enrich())"
        )
    f, d = facts.alias("__f"), dim.alias("__d")
    cond = (
        (F.col(f"__f.{fact_key}") == F.col(f"__d.{dim_key}"))
        & (F.col(f"__f.{ts_col}") >= F.col(f"__d.{valid_from}"))
        & (F.col(f"__f.{ts_col}") < F.col(f"__d.{valid_to}"))
    )
    attrs = [c for c in dim.columns if c not in (dim_key, valid_from, valid_to)]
    return f.join(F.broadcast(d), cond, how).select(
        "__f.*", *[F.col(f"__d.{c}").alias(c) for c in attrs]
    )
