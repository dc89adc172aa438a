"""Cron/interval schedule arithmetic (A14) — Quartz-style 6/7-field
expressions (CronExpression.java semantics for the subset the reference
README documents; scheduling itself is external to the engine)."""

from __future__ import annotations

import datetime as dt

import pytest

from elasticsearch_jdbc_spark.plans.schedule import (
    cron_next,
    fire_times,
    interval_next,
    parse_cron,
)

T0 = dt.datetime(2026, 1, 1, 10, 2, 3)  # Thursday


def test_every_five_minutes():
    assert cron_next("0 0/5 * * * ?", T0) == dt.datetime(2026, 1, 1, 10, 5, 0)


def test_readme_every_second_expression():
    # the reference README's example "0-59 0-59 0-23 ? * *" shape
    assert cron_next("* * * ? * *", T0) == dt.datetime(2026, 1, 1, 10, 2, 4)


def test_weekday_morning():
    # Fri 2026-01-02 11:00 -> next weekday 10:15 is Mon Jan 5
    after = dt.datetime(2026, 1, 2, 11, 0, 0)
    assert cron_next("0 15 10 ? * MON-FRI", after) == dt.datetime(2026, 1, 5, 10, 15, 0)
    # same day when before the fire time
    assert cron_next("0 15 10 ? * MON-FRI", dt.datetime(2026, 1, 2, 9, 0, 0)) == (
        dt.datetime(2026, 1, 2, 10, 15, 0)
    )


def test_month_names_and_dom():
    # T0 is Jan 1 10:02 -> fires later the same day
    assert cron_next("30 0 12 1 JAN,JUL ?", T0) == dt.datetime(2026, 1, 1, 12, 0, 30)
    # past July 2 -> wraps to next January
    assert cron_next("30 0 12 1 JAN,JUL ?", dt.datetime(2026, 7, 2)) == (
        dt.datetime(2027, 1, 1, 12, 0, 30)
    )


def test_fire_times_sequence():
    ts = fire_times("0/15 * * * * ?", T0, 4)
    assert ts == [
        dt.datetime(2026, 1, 1, 10, 2, 15),
        dt.datetime(2026, 1, 1, 10, 2, 30),
        dt.datetime(2026, 1, 1, 10, 2, 45),
        dt.datetime(2026, 1, 1, 10, 3, 0),
    ]


def test_literal_year_exhausts():
    assert cron_next("0 0 0 1 1 ? 2020", T0) is None


def test_seven_field_year_range():
    assert cron_next("0 0 0 1 1 ? 2027-2028", T0) == dt.datetime(2027, 1, 1, 0, 0, 0)


def test_dow_quartz_numbering():
    # Quartz 1=SUN: "0 0 9 ? * 1" fires Sundays — Jan 4 2026 is a Sunday
    assert cron_next("0 0 9 ? * 1", T0) == dt.datetime(2026, 1, 4, 9, 0, 0)


def test_quartz_l_w_hash_modifiers():
    # L: last day of month (Jan 2026)
    assert cron_next("0 0 12 L * ?", T0) == dt.datetime(2026, 1, 31, 12, 0, 0)
    # LW: last weekday — Jan 31 2026 is a Saturday, so Fri Jan 30
    assert cron_next("0 0 12 LW * ?", T0) == dt.datetime(2026, 1, 30, 12, 0, 0)
    # 15W: Jan 15 2026 is a Thursday -> itself
    assert cron_next("0 0 12 15W * ?", T0) == dt.datetime(2026, 1, 15, 12, 0, 0)
    # 15W in a month where the 15th is a Saturday (Aug 2026) -> Fri the 14th
    assert cron_next("0 0 12 15W 8 ?", T0) == dt.datetime(2026, 8, 14, 12, 0, 0)
    # 6#3: third Friday of Jan 2026 = Jan 16
    assert cron_next("0 0 9 ? * 6#3", T0) == dt.datetime(2026, 1, 16, 9, 0, 0)
    # 5L: last Thursday of Jan 2026 = Jan 29
    assert cron_next("0 0 9 ? * 5L", T0) == dt.datetime(2026, 1, 29, 9, 0, 0)
    # bare L in dow = Saturday -> Jan 3
    assert cron_next("0 0 9 ? * L", T0) == dt.datetime(2026, 1, 3, 9, 0, 0)


def test_malformed_modifiers_raise():
    for expr in ("0 0 12 3L * ?", "0 0 12 ? * 8#3", "0 0 12 40W * ?"):
        with pytest.raises(ValueError):
            parse_cron(expr)


def test_bad_field_counts_and_values():
    with pytest.raises(ValueError):
        parse_cron("0 0 12 *")
    with pytest.raises(ValueError):
        parse_cron("0 0 25 * * ?")
    with pytest.raises(ValueError):
        parse_cron("0 0 12 * BOB ?")


def test_interval_next():
    assert interval_next(T0, 90) == dt.datetime(2026, 1, 1, 10, 3, 33)


def test_cron_next_far_horizon():
    """Valid schedules whose next fire is years out resolve instead of
    returning None (Feb 29 across the non-leap 2100; literal years)."""
    import datetime as dt

    from elasticsearch_jdbc_spark.plans.schedule import cron_next

    got = cron_next("0 0 0 29 2 ?", dt.datetime(2097, 1, 1))
    assert got is not None and (got.year, got.month, got.day) == (2104, 2, 29)
    lit = cron_next("0 0 0 1 1 ? 2035", dt.datetime(2026, 1, 1))
    assert lit is not None and lit.year == 2035
