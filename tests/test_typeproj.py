"""Type-projection tests vs the reference's scale/rounding semantics
(StandardSource.java:1624-1656, :266-285 — java.math.RoundingMode), using
java.math.BigDecimal.setScale truth values.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.operators import typeproj as TP


VALUES = ["2.5", "2.4", "-2.5", "-1.1", "3.5", "0.05", "-0.05"]

# java.math.BigDecimal.setScale(1, mode) golden values
GOLDEN = {
    "halfup":   ["2.5", "2.4", "-2.5", "-1.1", "3.5", "0.1", "-0.1"],
    "halfeven": ["2.5", "2.4", "-2.5", "-1.1", "3.5", "0.0", "0.0"],
    "floor":    ["2.5", "2.4", "-2.5", "-1.1", "3.5", "0.0", "-0.1"],
    "ceiling":  ["2.5", "2.4", "-2.5", "-1.1", "3.5", "0.1", "0.0"],
    "down":     ["2.5", "2.4", "-2.5", "-1.1", "3.5", "0.0", "0.0"],
    "up":       ["2.5", "2.4", "-2.5", "-1.1", "3.5", "0.1", "-0.1"],
    "halfdown": ["2.5", "2.4", "-2.5", "-1.1", "3.5", "0.0", "0.0"],
}

SCALE0 = {  # setScale(0, mode) over the same values
    "halfup":   ["3", "2", "-3", "-1", "4", "0", "0"],
    "halfeven": ["2", "2", "-2", "-1", "4", "0", "0"],
    "floor":    ["2", "2", "-3", "-2", "3", "0", "-1"],
    "ceiling":  ["3", "3", "-2", "-1", "4", "1", "0"],
    "down":     ["2", "2", "-2", "-1", "3", "0", "0"],
    "up":       ["3", "3", "-3", "-2", "4", "1", "-1"],
    "halfdown": ["2", "2", "-2", "-1", "3", "0", "0"],
}


@pytest.fixture(scope="module")
def num_df(spark):
    return spark.createDataFrame([(v,) for v in VALUES], "x string").cache()


@pytest.mark.parametrize("mode", sorted(SCALE0))
def test_rounding_modes_scale0(spark, num_df, mode):
    got = num_df.select(TP.project_decimal("x", 0, mode).alias("r")).collect()
    want = [Decimal(s) for s in SCALE0[mode]]
    assert [r["r"] for r in got] == want, mode


@pytest.mark.parametrize("mode", sorted(GOLDEN))
def test_rounding_modes_scale1(spark, num_df, mode):
    got = num_df.select(TP.project_decimal("x", 1, mode).alias("r")).collect()
    want = [Decimal(s) for s in GOLDEN[mode]]
    assert [r["r"] for r in got] == want, mode


def test_unnecessary_mode(spark):
    df = spark.createDataFrame([("2.50",), ("2.55",)], "x string")
    got = df.select(TP.project_decimal("x", 1, "unnecessary").alias("r")).collect()
    assert got[0]["r"] == Decimal("2.5")
    assert got[1]["r"] is None  # would need rounding -> null (caller errors)


def test_plain_string_no_sci_notation(spark):
    # ValueListenerTests.java:262-280: no scientific notation in rendering
    df = spark.createDataFrame([(0.0000123,), (50.940664,)], "x double")
    got = [r["s"] for r in df.select(TP.decimal_plain_string("x").alias("s")).collect()]
    assert "E" not in got[0] and "e" not in got[0]
    assert got[0].startswith("0.0000123")
    assert got[1].startswith("50.940664")


def test_iso8601_format_and_zone(spark):
    df = spark.createDataFrame([("2012-06-12 10:30:00",)], "t string")
    got = df.select(TP.iso8601("t").alias("s")).collect()[0]["s"]
    assert got == "2012-06-12T10:30:00.000"
    # zone conversion: session zone is UTC in tests -> +2 region shifts
    shifted = df.select(TP.iso8601("t", zone="UTC+02:00").alias("s")).collect()[0]["s"]
    assert shifted == "2012-06-12T12:30:00.000"


def test_binary_projection(spark):
    df = spark.createDataFrame([(bytearray(b"abc"),)], "b binary")
    as_str = df.select(TP.binary_projection("b", True).alias("v")).collect()[0]["v"]
    assert as_str == "abc"
    as_bin = df.select(TP.binary_projection("b", False).alias("v")).collect()[0]["v"]
    assert bytes(as_bin) == b"abc"


def test_exact_number_dispatch(spark):
    df = spark.createDataFrame([("2.00",), ("2.25",)], "x string")
    got = [r["v"] for r in df.select(
        TP.decimal_exact_number("x", 2).alias("v")).collect()]
    assert got == [2.0, 2.25]


def test_wide_decimal_floor_exact(spark):
    """floor/down/up on 18+ digit values: the unscale divisor must stay
    DECIMAL (a float64 divisor silently corrupted the low digits)."""
    from decimal import Decimal

    from elasticsearch_jdbc_spark.operators.typeproj import project_decimal

    df = spark.createDataFrame(
        [(Decimal("123456789012345678.99"),)], "v decimal(38,18)"
    )
    got = {
        m: df.select(project_decimal("v", 2, m).alias("r")).collect()[0]["r"]
        for m in ("floor", "ceiling", "down", "up")
    }
    assert got["floor"] == Decimal("123456789012345678.99")
    assert got["down"] == Decimal("123456789012345678.99")
    assert got["ceiling"] == Decimal("123456789012345678.99")
    # a value needing actual rounding at scale 2
    df2 = spark.createDataFrame(
        [(Decimal("123456789012345678.994"),)], "v decimal(38,18)"
    )
    r = df2.select(project_decimal("v", 2, "floor").alias("r")).collect()[0]["r"]
    assert r == Decimal("123456789012345678.99")
