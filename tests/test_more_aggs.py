"""Late round-4 ES aggregation batch: bucket_sort / bucket_selector,
multi_terms, diversified_sampler, top_metrics, boxplot +
median_absolute_deviation (exact), t_test (Welch). Golden values are
hand-computed or numpy-derived; the registry twins are oracle-checked
vs DuckDB at sf0.01 by test_oracle_parity."""

from __future__ import annotations

import math

import numpy as np
import pytest

from elasticsearch_jdbc_spark.index.aggs import (
    boxplot,
    bucket_selector,
    bucket_sort,
    diversified_sampler,
    median_absolute_deviation,
    multi_terms,
    t_test,
    top_metrics,
)


def _buckets(spark):
    # (group, key, doc_count)
    data = [
        ("g1", "a", 30), ("g1", "b", 10), ("g1", "c", 20),
        ("g2", "a", 5), ("g2", "b", 50),
    ]
    return spark.createDataFrame(data, "g string, key string, doc_count long")


class TestBucketSortSelector:
    def test_sort_and_truncate(self, spark):
        out = bucket_sort(
            _buckets(spark), [("doc_count", "desc"), ("key", "asc")], size=2
        ).select("g", "key").collect()
        # global window (no partition): top-2 by count overall
        assert [(r.g, r.key) for r in out] == [("g2", "b"), ("g1", "a")]

    def test_partitioned_from_size(self, spark):
        out = bucket_sort(
            _buckets(spark),
            [("doc_count", "desc"), ("key", "asc")],
            size=1,
            from_=1,
            partition_cols=["g"],
        ).select("g", "key").collect()
        # per group, skip the top bucket, keep the next one
        assert [(r.g, r.key) for r in out] == [("g1", "c"), ("g2", "a")]

    def test_selector_predicate(self, spark):
        out = bucket_selector(_buckets(spark), "doc_count >= 20 AND g = 'g1'")
        assert sorted(r.key for r in out.collect()) == ["a", "c"]

    def test_sort_spec_guards(self, spark):
        with pytest.raises(ValueError):
            bucket_sort(_buckets(spark), [])
        with pytest.raises(ValueError):
            bucket_sort(_buckets(spark), [("doc_count", "down")])


class TestMultiTerms:
    def test_composite_buckets(self, spark):
        df = spark.createDataFrame(
            [("en", "web"), ("en", "web"), ("en", "book"),
             ("fr", "web"), (None, "web"), ("fr", None)],
            "lang string, source string",
        )
        out = multi_terms(df, ["lang", "source"], size=10).collect()
        assert [(r.lang, r.source, r.key_as_string, r.doc_count) for r in out] == [
            ("en", "web", "en|web", 2),
            ("en", "book", "en|book", 1),
            ("fr", "web", "fr|web", 1),
        ]

    def test_needs_two_fields(self, spark):
        df = spark.createDataFrame([("x",)], "a string")
        with pytest.raises(ValueError):
            multi_terms(df, ["a"])


class TestDiversifiedSampler:
    def test_caps_per_value(self, spark):
        df = spark.createDataFrame(
            [(1, "en", 9.0), (2, "en", 8.0), (3, "en", 7.0),
             (4, "fr", 5.0), (5, None, 1.0)],
            "id long, lang string, score double",
        )
        out = diversified_sampler(
            df, "lang", [("score", "desc"), ("id", "asc")],
            max_docs_per_value=2,
        )
        ids = sorted(r.id for r in out.collect())
        assert ids == [1, 2, 4]  # en capped at 2 best, null lang dropped

    def test_shard_size_cut(self, spark):
        df = spark.createDataFrame(
            [(1, "en", 9.0), (2, "fr", 8.0), (3, "de", 7.0)],
            "id long, lang string, score double",
        )
        out = diversified_sampler(
            df, "lang", [("score", "desc"), ("id", "asc")],
            max_docs_per_value=1, shard_size=2,
        )
        assert sorted(r.id for r in out.collect()) == [1, 2]

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, "en")], "id long, lang string")
        with pytest.raises(ValueError):
            diversified_sampler(df, "lang", [("id", "asc")], max_docs_per_value=0)
        with pytest.raises(ValueError):
            diversified_sampler(df, "lang", [], max_docs_per_value=1)


class TestTopMetrics:
    def test_latest_per_group(self, spark):
        df = spark.createDataFrame(
            [("u1", 3, 30.0), ("u1", 2, 20.0), ("u1", 1, 10.0),
             ("u2", 5, 50.0)],
            "user string, t long, v double",
        )
        out = top_metrics(df, ["user"], ("t", "desc"), ["v"], size=2).collect()
        assert [(r.user, r.rank, r.sort_value, r.v) for r in out] == [
            ("u1", 1, 3, 30.0), ("u1", 2, 2, 20.0), ("u2", 1, 5, 50.0),
        ]

    def test_tie_breaks_on_metric(self, spark):
        df = spark.createDataFrame(
            [("u", 1, 2.0), ("u", 1, 1.0)], "user string, t long, v double"
        )
        out = top_metrics(df, ["user"], ("t", "desc"), ["v"], size=1).collect()
        assert out[0].v == 1.0  # metric asc is the deterministic tie-break

    def test_size_guard(self, spark):
        df = spark.createDataFrame([("u", 1, 1.0)], "user string, t long, v double")
        with pytest.raises(ValueError):
            top_metrics(df, ["user"], ("t", "desc"), ["v"], size=0)


class TestBoxplotMad:
    def test_exact_quartiles(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        row = boxplot(df, "x").collect()[0]
        assert row.min == 1.0 and row.max == 100.0
        assert row.q1 == pytest.approx(np.percentile(vals, 25), abs=1e-6)
        assert row.q2 == pytest.approx(np.percentile(vals, 50), abs=1e-6)
        assert row.q3 == pytest.approx(np.percentile(vals, 75), abs=1e-6)

    def test_mad(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0, 100.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        row = median_absolute_deviation(df, "x").collect()[0]
        med = np.median(vals)
        assert row.median == pytest.approx(med)
        assert row.mad == pytest.approx(np.median(np.abs(np.array(vals) - med)))

    def test_null_only_rows_ignored(self, spark):
        df = spark.createDataFrame(
            [(None,), (2.0,), (4.0,)], "x double"
        )
        row = boxplot(df, "x").collect()[0]
        assert row.min == 2.0 and row.q2 == 3.0 and row.max == 4.0


class TestTTest:
    def test_welch_statistic(self, spark):
        a = [5.0, 6.0, 7.0, 8.0]
        b = [1.0, 2.0, 3.0]
        rows = [("a", v) for v in a] + [("b", v) for v in b] + [("c", 99.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        row = t_test(df, "v", "g", "a", "b").collect()[0]
        va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
        na, nb = len(a), len(b)
        se = math.sqrt(va / na + vb / nb)
        t_exp = (np.mean(a) - np.mean(b)) / se
        df_exp = (va / na + vb / nb) ** 2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        assert row.n_a == na and row.n_b == nb
        assert row.t_stat == pytest.approx(t_exp, abs=1e-6)
        assert row.welch_df == pytest.approx(df_exp, abs=1e-4)


class TestZeroFill:
    def test_numeric_grid(self, spark):
        b = spark.createDataFrame(
            [(0.0, 3), (40.0, 1)], "bucket double, n_docs long"
        )
        from elasticsearch_jdbc_spark.index.aggs import zero_fill_buckets

        out = zero_fill_buckets(b, 20.0).collect()
        assert [(r.bucket, r.n_docs) for r in out] == [
            (0.0, 3), (20.0, 0), (40.0, 1),
        ]

    def test_date_grid_with_bounds(self, spark):
        import datetime as dt
        from elasticsearch_jdbc_spark.index.aggs import zero_fill_buckets

        b = spark.createDataFrame(
            [(dt.datetime(2024, 1, 3), 2)], "bucket timestamp, n_docs long"
        )
        out = zero_fill_buckets(
            b, "day",
            bounds=(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 4)),
        ).collect()
        assert [r.n_docs for r in out] == [0, 0, 2, 0]
        assert out[0].bucket == dt.datetime(2024, 1, 1)

    def test_metric_cols_stay_null_in_gaps(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import zero_fill_buckets

        b = spark.createDataFrame(
            [(0.0, 1, 5.0), (20.0, 2, 7.0)],
            "bucket double, n_docs long, avg_v double",
        )
        out = zero_fill_buckets(b, 10.0).collect()
        gap = [r for r in out if r.bucket == 10.0][0]
        assert gap.n_docs == 0 and gap.avg_v is None

    def test_empty_input_empty_output(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import zero_fill_buckets

        b = spark.createDataFrame([], "bucket double, n_docs long")
        assert zero_fill_buckets(b, 10.0).count() == 0

    def test_bad_interval(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import zero_fill_buckets

        b = spark.createDataFrame([(0.0, 1)], "bucket double, n_docs long")
        import pytest as _pt
        with _pt.raises(ValueError):
            zero_fill_buckets(b, -5.0)
        with _pt.raises(ValueError):
            zero_fill_buckets(b, "fortnight")


class TestAutoDateHistogram:
    def test_picks_fitting_unit(self, spark):
        import datetime as dt
        from elasticsearch_jdbc_spark.index.aggs import auto_date_histogram

        rows = [
            (dt.datetime(2024, 1, 1) + dt.timedelta(days=d),)
            for d in range(0, 30, 3)
        ]
        df = spark.createDataFrame(rows, "ts timestamp")
        # 30-day span: hour -> 700+ buckets, day -> 30 > 10, week -> ~5 <= 10
        unit, out = auto_date_histogram(df, "ts", target_buckets=10)
        assert unit == "week"
        assert out.count() <= 10
        # tight span at the same target picks hours
        tight = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, h),) for h in range(5)], "ts timestamp"
        )
        unit2, out2 = auto_date_histogram(tight, "ts", target_buckets=10)
        assert unit2 == "hour" and out2.count() == 5

    def test_guards_and_empty(self, spark):
        import pytest as _pt
        from elasticsearch_jdbc_spark.index.aggs import auto_date_histogram

        df = spark.createDataFrame([], "ts timestamp")
        unit, out = auto_date_histogram(df, "ts")
        assert out.count() == 0 and unit == "year"
        with _pt.raises(ValueError):
            auto_date_histogram(df, "ts", target_buckets=0)


class TestApproxTerms:
    def test_exact_regime_matches_groupby(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import approx_terms

        rows = [(f"t{i % 7}",) for i in range(200)]
        df = spark.createDataFrame(rows, "v string").repartition(8)
        out = approx_terms(df, "v", size=7, shard_size=1000).collect()
        exact = {
            r.v: r["count"]
            for r in df.groupBy("v").count().collect()
        }
        assert {r.term: r.doc_count for r in out} == exact
        assert all(r.doc_count_error_upper_bound == 0 for r in out)

    def test_error_bound_covers_true_count(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import approx_terms

        # skewed: many distinct rare terms force the shard cut to bite
        rows = (
            [("hot",)] * 60
            + [(f"warm{i}", ) for i in range(20) for _ in range(3)]
            + [(f"rare{i}",) for i in range(120)]
        )
        df = spark.createDataFrame(rows, "v string").repartition(6)
        out = approx_terms(df, "v", size=5, shard_size=5).collect()
        exact = {r.v: r["count"] for r in df.groupBy("v").count().collect()}
        assert out[0].term == "hot" and out[0].doc_count == 60
        for r in out:
            true = exact[r.term]
            # reported count is a lower bound; the bound covers the gap
            assert r.doc_count <= true <= r.doc_count + r.doc_count_error_upper_bound

    def test_guards(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import approx_terms

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError):
            approx_terms(df, "v", size=0)
        with pytest.raises(ValueError):
            approx_terms(df, "v", size=10, shard_size=3)


class TestGeohashGrid:
    def test_kernel_goldens(self):
        import numpy as np
        from elasticsearch_jdbc_spark.functions.geo import geohash_np

        assert geohash_np(
            np.array([57.64911]), np.array([10.40744]), 11
        )[0] == "u4pruydqqvj"
        assert geohash_np(np.array([42.6]), np.array([-5.6]), 5)[0] == "ezs42"
        # corners and center of the planet
        got = geohash_np(
            np.array([0.0, -90.0, 90.0]), np.array([0.0, -180.0, 180.0]), 4
        )
        assert list(got) == ["s000", "0000", "zzzz"]
        with pytest.raises(ValueError):
            geohash_np(np.array([0.0]), np.array([0.0]), 13)

    def test_grid_agg(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import geohash_grid

        df = spark.createDataFrame(
            [(57.64911, 10.40744), (57.64912, 10.40745),
             (42.6, -5.6), (None, 1.0)],
            "lat double, lon double",
        )
        out = geohash_grid(df, precision=5).collect()
        assert [(r.key, r.doc_count) for r in out] == [
            ("u4pru", 2), ("ezs42", 1),
        ]


class TestRareTerms:
    def test_rare_first_order_and_cut(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import rare_terms

        rows = (
            [("a",)] * 5 + [("b",)] * 2 + [("c",)] * 1 + [("d",)] * 1
            + [(None,)]
        )
        df = spark.createDataFrame(rows, "v string")
        out = [(r.key, r.doc_count) for r in rare_terms(df, "v", 2).collect()]
        assert out == [("c", 1), ("d", 1), ("b", 2)]
        with pytest.raises(ValueError):
            rare_terms(df, "v", 0)


class TestFiltersAgg:
    def test_named_buckets_other_and_zero(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import filters_agg

        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y"), (9, None)], "n long, s string"
        )
        out = {r.key: r.doc_count for r in filters_agg(
            df,
            {"xs": "s = 'x'", "big": "n >= 3", "none": "n > 100"},
            other_bucket=True,
        ).collect()}
        # doc (9, None): s='x' is NULL -> not xs; n>=3 true -> in big
        assert out == {"xs": 2, "big": 2, "none": 0, "_other_": 0}
        # a doc matching NO filter lands in _other_
        df2 = spark.createDataFrame([(1, "z")], "n long, s string")
        out2 = {r.key: r.doc_count for r in filters_agg(
            df2, {"xs": "s = 'x'"}, other_bucket=True
        ).collect()}
        assert out2 == {"xs": 0, "_other_": 1}
        with pytest.raises(ValueError):
            filters_agg(df, {})
        with pytest.raises(ValueError):
            filters_agg(df, {"_other_": "n > 0"}, other_bucket=True)


class TestMissingAgg:
    def test_null_and_empty_array(self, spark):
        from elasticsearch_jdbc_spark.index.aggs import missing_agg

        df = spark.createDataFrame(
            [("a",), (None,), (None,)], "v string"
        )
        assert missing_agg(df, "v").collect()[0].doc_count == 2
        df2 = spark.createDataFrame(
            [([],), (["t"],), (None,)], "v array<string>"
        )
        assert missing_agg(df2, "v").collect()[0].doc_count == 2


class TestExtendedAndStringStats:
    def test_extended_stats_numpy_parity(self, spark):
        vals = [3.0, 7.0, 7.0, 19.0, 24.0, 1.5]
        df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "v double")
        from elasticsearch_jdbc_spark.index.aggs import extended_stats

        r = extended_stats(df, "v", sigma=3.0).collect()[0]
        a = np.array(vals)
        assert r["count"] == len(vals)
        assert r["sum_of_squares"] == pytest.approx(float((a * a).sum()), abs=1e-6)
        assert r["variance"] == pytest.approx(float(a.var()), abs=1e-6)
        assert r["variance_sampling"] == pytest.approx(float(a.var(ddof=1)), abs=1e-6)
        assert r["std_deviation"] == pytest.approx(float(a.std()), abs=1e-6)
        assert r["std_upper"] == pytest.approx(float(a.mean() + 3 * a.std()), abs=1e-6)
        assert r["std_lower"] == pytest.approx(float(a.mean() - 3 * a.std()), abs=1e-6)

    def test_string_stats_entropy(self, spark):
        # 'aab' + 'b' -> chars a:2 b:2 -> entropy exactly 1 bit
        df = spark.createDataFrame([("aab",), ("b",), (None,)], "s string")
        from elasticsearch_jdbc_spark.index.aggs import string_stats

        r = string_stats(df, "s").collect()[0]
        assert r["count"] == 2
        assert (r["min_length"], r["max_length"]) == (1, 3)
        assert r["avg_length"] == pytest.approx(2.0)
        assert r["entropy"] == pytest.approx(1.0, abs=1e-9)

    def test_string_stats_uniform_entropy(self, spark):
        # 16 distinct equiprobable chars -> 4 bits
        df = spark.createDataFrame([("abcdefghijklmnop",)], "s string")
        from elasticsearch_jdbc_spark.index.aggs import string_stats

        assert string_stats(df, "s").collect()[0]["entropy"] == pytest.approx(4.0)


class TestCardinalityPercentiles:
    def test_cardinality_exact_and_approx(self, spark):
        df = spark.range(0, 20000).selectExpr("id % 1337 AS v")
        from elasticsearch_jdbc_spark.index.aggs import cardinality

        assert cardinality(df, "v", exact=True).collect()[0]["value"] == 1337
        approx = cardinality(df, "v", precision_threshold=3000).collect()[0]["value"]
        assert abs(approx - 1337) / 1337 < 0.05  # HLL++ rsd ~ 1.9%

    def test_percentiles_shape_and_approx_twin(self, spark):
        df = spark.range(1, 101).selectExpr("CAST(id AS DOUBLE) AS v")
        from elasticsearch_jdbc_spark.index.aggs import percentiles

        ex = {r["percent"]: r["value"] for r in percentiles(df, "v").collect()}
        assert ex[50.0] == pytest.approx(50.5)  # linear interpolation
        assert ex[99.0] == pytest.approx(np.percentile(np.arange(1, 101), 99))
        ap = {
            r["percent"]: r["value"]
            for r in percentiles(df, "v", exact=False, accuracy=10000).collect()
        }
        for p, v in ex.items():
            assert ap[p] == pytest.approx(v, rel=0.05, abs=1.0)


class TestGeoAggs:
    def test_bounds_and_centroid(self, spark):
        pts = [(10.0, -20.0), (-5.0, 170.0), (42.5, 3.25), (None, 1.0), (1.0, None)]
        df = spark.createDataFrame(pts, "lat double, lon double")
        from elasticsearch_jdbc_spark.index.aggs import geo_bounds, geo_centroid

        b = geo_bounds(df, "lat", "lon").collect()[0]
        assert (b["top_left_lat"], b["top_left_lon"]) == (42.5, -20.0)
        assert (b["bottom_right_lat"], b["bottom_right_lon"]) == (-5.0, 170.0)
        c = geo_centroid(df, "lat", "lon").collect()[0]
        assert c["count"] == 3
        assert c["lat"] == pytest.approx(np.mean([10.0, -5.0, 42.5]), abs=1e-6)
        assert c["lon"] == pytest.approx(np.mean([-20.0, 170.0, 3.25]), abs=1e-6)
