"""Physical-plan regression tests: the properties that make these queries
scale (predicate pushdown to parquet, column pruning, broadcast joins for
dims, whole-stage codegen) must not silently regress."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.plans.registry import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read unused columns
    assert "l_partkey" not in plan
    # (whole-stage codegen markers only materialize in the AQE final plan
    # post-execution, so they are not asserted here)


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24" in plan


def test_q3_broadcasts_dimension(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter pushed pre-join


def test_q5_star_join_no_shuffle_join_on_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_region_revenue")
    # all three dim joins broadcast; the only exchange is the agg shuffle
    assert plan.count("BroadcastHashJoin") >= 3


def test_semi_join_for_exists(spark, sf_dir):
    plan = _plan(spark, sf_dir, "e1_orders_with_big_lineitem")
    assert "LeftSemi" in plan
