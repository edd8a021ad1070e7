"""Token-budget context assembly over ordered streams (SFT example
construction): for every target row, find the MAXIMAL contiguous window of
preceding rows (target included) whose token sum fits a budget.

The naive shape is a per-conversation loop (or a quadratic self-join:
every target × every candidate start). The Spark-first shape used here is
two window passes over ONE exchange:

1. running token sum ``cum`` per key (rows frame over the turn order);
2. a RANGE frame over ``cum`` itself — ``orderBy(cum).rangeBetween(
   -budget, 0)`` — whose min(idx) IS the searchsorted answer: the earliest
   prefix row with ``cum >= cum_i - budget``, i.e. the last turn that must
   stay OUTSIDE the window. ``cum`` is strictly monotone per key (tokens
   are >= 1), so the range frame is well-defined, and both passes sort by
   the same key order, so Catalyst plans one exchange.

At 10^12 turns this is a linear scan + one shuffle on conv_id — the same
cost as the sessionize window — where the join formulation would be
O(turns × avg_context_len).

Engine-portable: integer token counts make every cumulative sum exact, so
the DuckDB oracle (same two windows in SQL) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assemble_contexts(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    tok_col: str,
    budget: int,
    target: Column | None = None,
) -> DataFrame:
    """Append context-window columns for every row (filter to ``target``
    rows afterwards if given):

    - ``ctx_start``: first idx included in the window,
    - ``n_ctx``: window length in rows,
    - ``ctx_tokens``: window token sum (<= budget unless truncated),
    - ``truncated``: the target row ALONE exceeds the budget (the window
      degenerates to the target itself; a downstream tokenizer truncates).

    Requirements: ``idx_col`` is a CONTIGUOUS integer sequence per key
    (derive one with row_number over the event order first — it shares
    this operator's exchange) and ``tok_col`` is an integer >= 1 (which
    also makes ``cum`` strictly monotone, keeping the range frame total).
    """
    w_idx = Window.partitionBy(key_col).orderBy(idx_col)
    d = df.withColumn(
        "_cum",
        F.sum(tok_col).over(
            w_idx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_rng = (
        Window.partitionBy(key_col).orderBy("_cum").rangeBetween(-budget, 0)
    )
    d = d.withColumn("_minidx", F.min(idx_col).over(w_rng)).withColumn(
        "_mincum", F.min("_cum").over(w_rng)
    )
    first = F.min(idx_col).over(Window.partitionBy(key_col))
    fits = F.col("_cum") <= F.lit(budget)
    alone = (F.col("_minidx") == F.col(idx_col)) & ~fits
    ctx_start = (
        F.when(fits, first)
        .when(alone, F.col(idx_col))
        .otherwise(F.col("_minidx") + 1)
    )
    ctx_tokens = (
        F.when(fits, F.col("_cum"))
        .when(alone, F.col(tok_col))
        .otherwise(F.col("_cum") - F.col("_mincum"))
    )
    out = (
        d.withColumn("ctx_start", ctx_start)
        .withColumn("n_ctx", F.col(idx_col) - F.col("ctx_start") + 1)
        .withColumn("ctx_tokens", ctx_tokens)
        .withColumn("truncated", alone)
        .drop("_cum", "_minidx", "_mincum")
    )
    return out.filter(target) if target is not None else out
