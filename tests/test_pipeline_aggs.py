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


def test_serial_diff(spark):
    df = _rows(spark).filter("g = 'a'").drop("g")
    out = {
        r["bucket"]: r["sd2"]
        for r in pipeline_aggs(
            df, "bucket", {"sd2": ("serial_diff", "v", 2)}
        ).collect()
    }
    assert out[0] is None and out[1] is None
    assert out[2] == -1.0 and out[3] == -4.0
    with pytest.raises(ValueError, match="lag must be"):
        pipeline_aggs(df, "bucket", {"x": ("serial_diff", "v", 0)}).collect()


def test_bucket_metrics_and_weighted_avg(spark):
    from elasticsearch_jdbc_spark.index.aggs import (
        bucket_metrics,
        weighted_avg,
    )

    df = _rows(spark)
    row = bucket_metrics(df, "v").collect()[0]
    assert row["n_buckets"] == 6 and row["sum"] == 47.0
    assert row["min"] == 2.0 and row["max"] == 13.0
    per = {r["g"]: r for r in bucket_metrics(df, "v", ["g"]).collect()}
    assert per["b"]["sum"] == 6.0 and per["a"]["n_buckets"] == 4
    # weighted_avg: null on either side contributes nothing
    wdf = spark.createDataFrame(
        [(10.0, 1.0), (20.0, 3.0), (None, 5.0), (7.0, None)],
        "x double, w double",
    )
    got = wdf.agg(weighted_avg(wdf.columns[0], "w").alias("wa")).collect()[0]["wa"]
    assert got == (10 * 1 + 20 * 3) / 4.0


def test_percentile_ranks(spark):
    from elasticsearch_jdbc_spark.index.aggs import percentile_ranks

    df = spark.createDataFrame(
        [(float(v),) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]], "x double"
    )
    got = {r["value"]: r["rank_pct"]
           for r in percentile_ranks(df, "x", [5.0, 10.0, 0.5]).collect()}
    assert got == {5.0: 50.0, 10.0: 100.0, 0.5: 0.0}
    with pytest.raises(ValueError, match="probe"):
        percentile_ranks(df, "x", [])


class TestNormalizeRateMovingPercentiles:
    def test_normalize_methods(self, spark):
        import numpy as np

        from elasticsearch_jdbc_spark.index.aggs import normalize

        vals = [10.0, 20.0, 30.0, 40.0]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "k long, v double")
        a = np.array(vals)
        got = {
            m: [
                r["normalized"]
                for r in normalize(df, "v", m).orderBy("k").collect()
            ]
            for m in ("rescale_0_1", "rescale_0_100", "percent_of_sum",
                      "mean", "z-score", "softmax")
        }
        import pytest as _pt

        assert got["rescale_0_1"] == _pt.approx(list((a - a.min()) / (a.max() - a.min())))
        assert got["rescale_0_100"] == _pt.approx(list(100 * (a - a.min()) / (a.max() - a.min())))
        assert got["percent_of_sum"] == _pt.approx(list(a / a.sum()))
        assert got["mean"] == _pt.approx(list((a - a.mean()) / (a.max() - a.min())))
        assert got["z-score"] == _pt.approx(list((a - a.mean()) / a.std()))
        e = np.exp(a)
        assert got["softmax"] == _pt.approx(list(e / e.sum()))

    def test_normalize_degenerate_and_partitions(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import normalize

        df = spark.createDataFrame(
            [("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 3.0)], "g string, v double"
        )
        out = normalize(df, "v", "rescale_0_1", partition_cols=["g"]).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r["normalized"])
        assert by_g["a"] == [None, None]  # max == min -> NULL like ES skip
        assert sorted(by_g["b"]) == [0.0, 1.0]
        import pytest as _pt

        with _pt.raises(ValueError):
            normalize(df, "v", "sigmoid")

    def test_moving_percentile_and_rate(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import pipeline_aggs

        rows = [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
        df = spark.createDataFrame(rows, "t long, n double")
        out = pipeline_aggs(
            df, "t",
            {
                "p50": ("moving_percentile", "n", 3, 50.0),
                "per_min": ("rate", "n", 60.0 / 3600.0),
            },
        ).orderBy("t").collect()
        # trailing-3 exact medians: [5], [5,1], [5,1,9], [1,9,3], [9,3,7]
        assert [r["p50"] for r in out] == [5.0, 3.0, 5.0, 3.0, 7.0]
        assert [r["per_min"] for r in out] == [v / 60.0 for _, v in rows]
        import pytest as _pt

        with _pt.raises(ValueError):
            pipeline_aggs(df, "t", {"x": ("moving_percentile", "n", 0, 50.0)})
        with _pt.raises(ValueError):
            pipeline_aggs(df, "t", {"x": ("moving_percentile", "n", 3, 101.0)})


def test_cumulative_cardinality_exact(spark):
    from elasticsearch_jdbc_spark.index.aggs import cumulative_cardinality

    rows = [
        (1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "b"),
        (4, "d"), (4, "a"), (5, "e"), (5, "e"),
    ]
    df = spark.createDataFrame(rows, "b long, u string")
    out = cumulative_cardinality(df, "b", "u").collect()
    assert [(r["b"], r["new_keys"], r["value"]) for r in out] == [
        (1, 2, 2),  # a, b
        (2, 1, 3),  # +c
        (3, 0, 3),  # b repeats
        (4, 1, 4),  # +d
        (5, 1, 5),  # +e (dup within bucket counts once)
    ]


def test_variable_width_histogram(spark):
    import numpy as np

    from elasticsearch_jdbc_spark.index.aggs import variable_width_histogram

    vals = [1.0, 2.0, 3.0, 4.0, 10.0, 11.0, 12.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "v double")
    out = variable_width_histogram(df, "v", buckets=3).collect()
    a = np.array(vals)
    b1, b2 = np.percentile(a, 100 / 3), np.percentile(a, 200 / 3)
    expect = {}
    for v in vals:
        k = int(v > b1) + int(v > b2)
        expect.setdefault(k, []).append(v)
    assert len(out) == len(expect)
    for row, k in zip(out, sorted(expect)):
        grp = expect[k]
        assert row["doc_count"] == len(grp)
        assert row["min"] == min(grp) and row["max"] == max(grp)
        assert row["key"] == round(sum(grp) / len(grp), 6)
    # adaptive width: the dense low region gets narrower buckets than
    # the sparse tail
    assert out[0]["max"] - out[0]["min"] < out[-1]["max"] - out[-1]["min"]


def test_variable_width_histogram_ties_and_one_bucket(spark):
    from elasticsearch_jdbc_spark.index.aggs import variable_width_histogram

    ties = spark.createDataFrame([(5.0,)] * 10, "v double")
    out = variable_width_histogram(ties, "v", buckets=4).collect()
    assert len(out) == 1 and out[0]["doc_count"] == 10  # quantiles collapse
    one = variable_width_histogram(ties, "v", buckets=1).collect()
    assert len(one) == 1
    import pytest as _pt

    with _pt.raises(ValueError):
        variable_width_histogram(ties, "v", buckets=0)


def test_geo_line(spark):
    import json

    from elasticsearch_jdbc_spark.index.aggs import geo_line, geo_line_geojson

    rows = [
        ("a", 3, 10.0, 1.0), ("a", 1, 11.0, 2.0), ("a", 2, 12.0, 3.0),
        ("b", 1, 20.0, 5.0), ("b", 2, None, 6.0),  # NULL lon dropped
    ]
    df = spark.createDataFrame(rows, "g string, t long, lon double, lat double")
    out = geo_line(df, ["g"], "lat", "lon", "t").collect()
    got = {}
    for r in out:
        got.setdefault(r["g"], []).append((r["seq"], r["lon"], r["lat"]))
    assert got["a"] == [(0, 11.0, 2.0), (1, 12.0, 3.0), (2, 10.0, 1.0)]
    assert got["b"] == [(0, 20.0, 5.0)]
    # size cap keeps the FIRST points in sort order
    capped = geo_line(df, ["g"], "lat", "lon", "t", size=2).collect()
    a = [(r["seq"], r["lon"]) for r in capped if r["g"] == "a"]
    assert a == [(0, 11.0), (1, 12.0)]
    # GeoJSON reassembly
    gj = {
        r["g"]: json.loads(r["geometry"])
        for r in geo_line_geojson(
            geo_line(df, ["g"], "lat", "lon", "t"), ["g"]
        ).collect()
    }
    assert gj["a"] == {
        "type": "LineString",
        "coordinates": [[11.0, 2.0], [12.0, 3.0], [10.0, 1.0]],
    }
    import pytest as _pt

    with _pt.raises(ValueError):
        geo_line(df, ["g"], "lat", "lon", "t", size=0)


def test_moving_fn_set(spark):
    """The ES moving_fn built-in set (MovingFunctions.max/min/sum/stdDev)
    over a trailing window, vs numpy on the same trailing slices."""
    import numpy as np

    df = _rows(spark).filter("g = 'a'").drop("g")
    out = {
        r["bucket"]: r
        for r in pipeline_aggs(
            df,
            "bucket",
            {
                "mx": ("moving_max", "v", 2),
                "mn": ("moving_min", "v", 2),
                "sm": ("moving_sum", "v", 3),
                "sd": ("moving_stddev", "v", 3),
            },
        ).collect()
    }
    vals = [10, 13, 9, 9]
    for i in range(4):
        w2 = vals[max(0, i - 1): i + 1]
        w3 = vals[max(0, i - 2): i + 1]
        assert out[i]["mx"] == max(w2)
        assert out[i]["mn"] == min(w2)
        assert out[i]["sm"] == sum(w3)
        assert out[i]["sd"] == pytest.approx(float(np.std(w3)), rel=1e-12)
    with pytest.raises(ValueError, match="window must be >= 1"):
        pipeline_aggs(df, "bucket", {"x": ("moving_sum", "v", 0)}).collect()
