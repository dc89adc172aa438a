"""Mimics the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same parquet, compare row count +
column names + order-insensitive values."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{ORACLE_SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: str(v))
        elif col.dtype.kind == "f":
            df[c] = col.map(lambda v: f"{v:.9g}" if v == v else "nan")
        else:
            df[c] = col.map(lambda v: str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


QUERY_NAMES = sorted(entrymod.queries().keys())
WITH_ORACLE = [n for n in QUERY_NAMES if n in entrymod.oracle_sql()]
ROWS_ONLY = [n for n in QUERY_NAMES if n not in entrymod.oracle_sql()]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, ducks, name):
    q = entrymod.queries()[name]
    sdf = q(spark, ORACLE_SF_DIR).toPandas()
    odf = ducks.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    if len(sdf) == 0:
        return  # both empty: the driver's hash compare passes these
    a, b = _canon(sdf), _canon(odf)
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{a[diff].head(5)}\noracle:\n{b[diff].head(5)}"
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, ORACLE_SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
