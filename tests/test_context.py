"""Token-budget context assembly (operators/context.py): window
correctness (fit, maximality, contiguity) against an independent
per-group recompute, plus the single-exchange plan property."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from watchman_spark.operators.context import assemble_contexts


@pytest.fixture(scope="module")
def turns(spark):
    # deterministic synthetic conversations: 40 convs, variable turn counts,
    # token counts spanning tiny..oversize relative to the budget
    rows = []
    for c in range(40):
        n = 3 + (c * 7) % 12
        for i in range(1, n + 1):
            tok = 1 + ((c * 31 + i * 17) % 97)
            if (c + i) % 13 == 0:
                tok = 250  # oversize single turn (budget below is 200)
            rows.append((f"c{c}", i, tok))
    return spark.createDataFrame(rows, "conv string, seq int, tok long").cache()


def _expected(rows, budget):
    by_conv: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["conv"], r["seq"])):
        by_conv.setdefault(r["conv"], []).append(r)
    out = {}
    for conv, turns in by_conv.items():
        toks = [t["tok"] for t in turns]
        for i in range(len(turns)):
            j = i
            total = toks[i]
            while j > 0 and total + toks[j - 1] <= budget:
                j -= 1
                total += toks[j]
            truncated = toks[i] > budget
            out[(conv, turns[i]["seq"])] = (
                turns[j]["seq"],
                i - j + 1,
                total if not truncated else toks[i],
                truncated,
            )
    return out


def test_contexts_match_independent_recompute(spark, turns):
    budget = 200
    got = {
        (r["conv"], r["seq"]): (
            r["ctx_start"],
            r["n_ctx"],
            r["ctx_tokens"],
            r["truncated"],
        )
        for r in assemble_contexts(turns, "conv", "seq", "tok", budget).collect()
    }
    want = _expected(turns.collect(), budget)
    assert got == want
    # all three regimes actually occur in the fixture
    assert any(v[3] for v in want.values())  # truncated
    assert any(not v[3] and v[1] > 1 for v in want.values())  # multi-turn fit
    assert any(v[2] <= 200 and v[0] > 1 for v in want.values())  # trimmed


def test_contexts_budget_and_maximality(spark, turns):
    budget = 200
    rows = {(r["conv"], r["seq"]): r for r in turns.collect()}
    for r in assemble_contexts(turns, "conv", "seq", "tok", budget).collect():
        if r["truncated"]:
            assert r["n_ctx"] == 1
            continue
        assert r["ctx_tokens"] <= budget
        # maximality: one more preceding turn would blow the budget
        prev = rows.get((r["conv"], r["ctx_start"] - 1))
        if prev is not None:
            assert r["ctx_tokens"] + prev["tok"] > budget


def test_contexts_single_exchange(spark, turns):
    out = assemble_contexts(turns, "conv", "seq", "tok", 200)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:800]
