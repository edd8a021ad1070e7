"""Local mirror of the driver's DuckDB oracle comparison.

Row-count + column-name schema + order-insensitive value compare. Values
are canonicalized to strings cell-wise (floats via repr — i.e. EXACT
double equality; queries are responsible for rounding nondeterministic
float aggregates on both sides)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "∅" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if v is pd.NaT:
        return "∅"
    return str(v)


def canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return cols, rows


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Returns a list of human-readable diffs; empty == match."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    sc, sr = canon(sp)
    dc, dr = canon(duck_df)
    if sc != dc:
        problems.append(f"schema mismatch: spark={sc} duckdb={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"row count mismatch: spark={len(sr)} duckdb={len(dr)}")
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            problems.append(f"first value diff at sorted-row {i}: spark={a} duckdb={b}")
            break
    return problems
