"""Bind-variable resolution tests (reference StandardSource.bind,
StandardSource.java:1275-1352; incremental contract README.md:680-727)."""

from __future__ import annotations

import datetime as dt

import pytest

from elasticsearch_jdbc_spark.plans.params import resolve_params, sql_with_params


STATE = {
    "state": "AFTER_FETCH",
    "job": "nightly",
    "lastrowcount": 42,
    "metrics": {
        "counter": 7,
        "lastexecutionstart": "2026-08-15T00:00:00",
        "lastexecutionend": "2026-08-15T00:05:00",
        "totalrows": 1000,
    },
}


def test_pseudo_variables():
    now = dt.datetime(2026, 8, 16, tzinfo=dt.timezone.utc)
    got = resolve_params(
        ["$now", "$state", "$job", "$lastrowcount", "$metrics.counter",
         "$metrics.lastexecutionstart", 99, "plain"],
        STATE, now=now,
    )
    assert got == [now, "AFTER_FETCH", "nightly", 42, 7,
                   "2026-08-15T00:00:00", 99, "plain"]


def test_row_backrefs_pass_through():
    assert resolve_params(["$row.id", "$meta._id"], {}) == ["$row.id", "$meta._id"]


def test_unknown_pseudo_raises():
    with pytest.raises(KeyError):
        resolve_params(["$bogus"], {})


def test_sql_with_params_watermark(spark, sf_dir):
    # the incremental-fetch contract: bind the previous run's start as the
    # as-of watermark (README.md:693-697) via parameterized SQL
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders_v")
    df = sql_with_params(
        spark,
        "SELECT count(*) AS n FROM orders_v WHERE o_orderdate >= :watermark",
        {"watermark": "$metrics.lastexecutionstart"},
        state={"metrics": {"lastexecutionstart": "1997-01-01"}},
    )
    n = df.collect()[0]["n"]
    total = spark.table("orders_v").count()
    assert 0 < n < total


def test_row_backreference_capture_and_bind(spark):
    """$row.* chains statements: the previous statement's LAST row binds
    into the next (StandardSource.java:1100-1110 + bind() :1330-1336)."""
    from elasticsearch_jdbc_spark.plans.params import (
        capture_last_row,
        resolve_params,
        sql_with_params,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "seq int, k string, v int"
    )
    last = capture_last_row(df, "seq")
    assert last == {"$row.seq": 3, "$row.k": "c", "$row.v": 30}
    assert resolve_params(["$row.v", "$row.nope", 7], last_row=last) == [
        30, "$row.nope", 7,  # unresolved falls back to the literal (reference bind())
    ]
    df.createOrReplaceTempView("chain_t")
    out = sql_with_params(
        spark,
        "SELECT k FROM chain_t WHERE v < :prev ORDER BY seq",
        {"prev": "$row.v"},
        last_row=last,
    ).collect()
    assert [r["k"] for r in out] == ["a", "b"]


def test_meta_backreference_and_lastexceptiondate():
    from elasticsearch_jdbc_spark.plans.params import resolve_params

    meta = {"$meta.db.alltablesareselectable": True}
    got = resolve_params(
        ["$meta.db.alltablesareselectable", "$lastexceptiondate"],
        state={"lastexceptiondate": "2026-01-01"},
        meta=meta,
    )
    assert got == [True, "2026-01-01"]


def test_empty_frame_capture(spark):
    from elasticsearch_jdbc_spark.plans.params import capture_last_row

    df = spark.createDataFrame([], "seq int, v int")
    assert capture_last_row(df, "seq") == {}


def test_dollar_literal_passes_through():
    """A literal that merely starts with '$' binds as-is (the reference
    bind() fallback); identifier-shaped '$bogus' still raises."""
    assert resolve_params(["$5.99"], {}) == ["$5.99"]
    assert resolve_params(["$ not-a-var"], {}) == ["$ not-a-var"]
