"""Oracle parity: every oracle-checked queries() entry vs DuckDB at sf0.01 —
the exact comparison the driver runs, so driver verification never
surprises us (SURVEY.md §5.3-3)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_util import compare, duck_con

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def test_every_query_has_callable():
    assert QUERIES, "registry is empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    sdf = QUERIES[name](spark, SF_DIR)
    ddf = con.execute(ORACLES[name]).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    # rows-only queries must at least execute and return a stable schema
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"sink", "n", "distinct_convs"}
