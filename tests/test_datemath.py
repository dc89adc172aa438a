"""ES date math: `now-1d/d` expressions, `<logs-{now/d}>` index names,
and range-bound context rounding (pure functions — no Spark needed except
the one filter-context integration check)."""

from __future__ import annotations

import datetime as dt

import pytest

from elasticsearch_jdbc_spark.functions.datemath import (
    date_math_index_name,
    date_math_range_sql,
    parse_date_math,
)

NOW = dt.datetime(2026, 8, 18, 14, 35, 27, 123000)


class TestParse:
    def test_now_and_offsets(self):
        assert parse_date_math("now", NOW) == NOW
        assert parse_date_math("now-1d", NOW) == NOW - dt.timedelta(days=1)
        assert parse_date_math("now+2h", NOW) == NOW + dt.timedelta(hours=2)
        assert parse_date_math("now+1w", NOW) == NOW + dt.timedelta(weeks=1)
        # implicit count of 1
        assert parse_date_math("now-m", NOW) == NOW - dt.timedelta(minutes=1)

    def test_rounding(self):
        assert parse_date_math("now/d", NOW) == dt.datetime(2026, 8, 18)
        assert parse_date_math("now/h", NOW) == dt.datetime(2026, 8, 18, 14)
        assert parse_date_math("now/M", NOW) == dt.datetime(2026, 8, 1)
        assert parse_date_math("now/y", NOW) == dt.datetime(2026, 1, 1)
        # week rounds to Monday (2026-08-18 is a Tuesday)
        assert parse_date_math("now/w", NOW) == dt.datetime(2026, 8, 17)

    def test_round_up_context(self):
        assert parse_date_math("now/d", NOW, round_up=True) == dt.datetime(
            2026, 8, 18, 23, 59, 59, 999000
        )
        assert parse_date_math("now/M", NOW, round_up=True) == dt.datetime(
            2026, 8, 31, 23, 59, 59, 999000
        )

    def test_chained_and_anchor(self):
        assert parse_date_math("now-1d+2h/m", NOW) == dt.datetime(
            2026, 8, 17, 16, 35
        )
        assert parse_date_math("2024.01.15||+1M/d", NOW) == dt.datetime(2024, 2, 15)
        assert parse_date_math("2024-01-15T10:30:00||/h", NOW) == dt.datetime(
            2024, 1, 15, 10
        )

    def test_month_clamp(self):
        assert parse_date_math("2024.01.31||+1M", NOW) == dt.datetime(2024, 2, 29)
        assert parse_date_math("2023.01.31||+1M", NOW) == dt.datetime(2023, 2, 28)
        assert parse_date_math("2024.02.29||+1y", NOW) == dt.datetime(2025, 2, 28)

    def test_errors(self):
        for bad in ("tomorrow", "now*1d", "now/2d", "now-1x", "now-1d junk"):
            with pytest.raises(ValueError):
                parse_date_math(bad, NOW)


class TestIndexName:
    def test_default_and_custom_format(self):
        assert date_math_index_name("<logs-{now/d}>", NOW) == "logs-2026.08.18"
        assert (
            date_math_index_name("<logs-{now-1M/M{yyyy-MM}}>", NOW) == "logs-2026-07"
        )
        assert date_math_index_name("<l-{now/d}-end>", NOW) == "l-2026.08.18-end"

    def test_plain_and_malformed(self):
        assert date_math_index_name("plain_index", NOW) == "plain_index"
        with pytest.raises(ValueError):
            date_math_index_name("<unclosed-{now/d}", NOW)


class TestRangeSql:
    def test_bound_context_rounding(self):
        sql = date_math_range_sql("ts", gte="now-1d/d", lte="now/d", now=NOW)
        assert "ts >= timestamp'2026-08-17 00:00:00'" in sql
        assert "ts <= timestamp'2026-08-18 23:59:59.999000'" in sql
        assert " AND " in sql
        lt = date_math_range_sql("ts", lt="now/d", now=NOW)
        assert lt == "ts < timestamp'2026-08-18 00:00:00'"

    def test_validation(self):
        with pytest.raises(ValueError):
            date_math_range_sql("ts", gte="now", gt="now")
        with pytest.raises(ValueError):
            date_math_range_sql("ts")

    def test_filter_context_integration(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2026, 8, 17, 5),), (dt.datetime(2026, 8, 18, 9),),
             (dt.datetime(2026, 8, 19, 0),)],
            "ts timestamp",
        )
        sql = date_math_range_sql("ts", gte="now-1d/d", lte="now/d", now=NOW)
        got = sorted(r["ts"] for r in df.filter(sql).collect())
        assert got == [dt.datetime(2026, 8, 17, 5), dt.datetime(2026, 8, 18, 9)]


def test_range_sql_gt_rounds_up():
    """ES bound-context rounding: gt with /unit rounding EXCLUDES the
    entire rounded unit (regression: gt rounded down, including almost
    the whole unit)."""
    from elasticsearch_jdbc_spark.functions.datemath import (
        date_math_range_sql,
    )

    sql = date_math_range_sql("ts", gt="2014-11-18||/M")
    assert "2014-11-30 23:59:59" in sql, sql
    # gte still rounds down; lt still rounds down; lte still rounds up
    assert "2014-11-01 00:00:00" in date_math_range_sql(
        "ts", gte="2014-11-18||/M")
    assert "2014-11-01 00:00:00" in date_math_range_sql(
        "ts", lt="2014-11-18||/M")
    assert "2014-11-30 23:59:59" in date_math_range_sql(
        "ts", lte="2014-11-18||/M")
