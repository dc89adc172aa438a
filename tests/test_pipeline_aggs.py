"""Pipeline aggregations (ES derivative / cumulative_sum / moving_avg /
bucket_script) over bucketed DataFrames: window algebra, partition
scoping (the ES parent-agg nesting), guards."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.index.aggs import pipeline_aggs


def _rows(spark):
    # (group, bucket, value)
    data = [
        ("a", 0, 10), ("a", 1, 13), ("a", 2, 9), ("a", 3, 9),
        ("b", 0, 2), ("b", 1, 4),
    ]
    return spark.createDataFrame(data, "g string, bucket int, v long")


def test_window_algebra(spark):
    df = _rows(spark).filter("g = 'a'").drop("g")
    out = {
        r["bucket"]: r
        for r in pipeline_aggs(
            df,
            order_col="bucket",
            specs={
                "d": ("derivative", "v"),
                "c": ("cumulative_sum", "v"),
                "m2": ("moving_avg", "v", 2),
                "s": ("bucket_script", "v * 2"),
            },
        ).collect()
    }
    assert out[0]["d"] is None and out[1]["d"] == 3.0 and out[2]["d"] == -4.0
    assert [out[i]["c"] for i in range(4)] == [10.0, 23.0, 32.0, 41.0]
    assert out[0]["m2"] == 10.0 and out[1]["m2"] == 11.5 and out[2]["m2"] == 11.0
    assert out[3]["s"] == 18


def test_partition_scoping(spark):
    out = pipeline_aggs(
        _rows(spark),
        order_col="bucket",
        specs={"d": ("derivative", "v"), "c": ("cumulative_sum", "v")},
        partition_cols=["g"],
    ).collect()
    by = {(r["g"], r["bucket"]): r for r in out}
    # each group's chain restarts: first bucket derivative NULL per group
    assert by[("a", 0)]["d"] is None and by[("b", 0)]["d"] is None
    assert by[("b", 1)]["d"] == 2.0
    assert by[("b", 1)]["c"] == 6.0  # b's own running sum, not polluted by a


def test_guards(spark):
    df = _rows(spark)
    with pytest.raises(ValueError, match="unknown pipeline agg"):
        pipeline_aggs(df, "bucket", {"x": ("median", "v")}).collect()
    with pytest.raises(ValueError, match="window must be >= 1"):
        pipeline_aggs(df, "bucket", {"x": ("moving_avg", "v", 0)}).collect()
