"""ES request-body `aggs` compiler (index/dsl.py aggs_dsl_df): bucket
kinds (terms / histogram / date_histogram / range / filters / missing)
and metric kinds against hand computation over the docs metadata,
nesting with parent doc_counts, size/min_doc_count cuts, live twin."""

from __future__ import annotations

import collections
import datetime

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aggs") / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=66)
    # plant a deterministic timestamp + nullable tag metadata column
    corpus = corpus.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1700000000) + (F.crc32("path") % 86400) * 7
        ),
    ).withColumn(
        "grp",
        F.when(F.crc32("path") % 3 == 0, F.lit(None).cast("string")).otherwise(
            F.concat(F.lit("g"), (F.crc32("path") % 2).cast("string"))
        ),
    )
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    r = IndexReader(spark, d)
    docs = {
        x["doc_id"]: x.asDict()
        for x in spark.read.parquet(f"{d}/docs").collect()
    }
    return d, r, docs


def test_terms_with_nested_metrics_over_query(spark, setup):
    d, r, docs = setup
    aggs = {
        "by_lang": {
            "terms": {"field": "lang", "size": 10},
            "aggs": {
                "avg_dl": {"avg": {"field": "dl"}},
                "dls": {"stats": {"field": "dl"}},
                "uniq_repo": {"cardinality": {"field": "repo", "exact": True}},
                "wavg": {
                    "weighted_avg": {
                        "value": {"field": "dl"},
                        "weight": {"field": "doc_id"},
                    }
                },
            },
        }
    }
    got = {
        x["by_lang"]: x.asDict()
        for x in r.aggs_dsl_df(aggs, query={"match": {"content": "merge"}}).collect()
    }
    m = {x["doc_id"] for x in r.match_df("merge").collect()}
    grp = collections.defaultdict(list)
    for k in m:
        grp[docs[k]["lang"]].append(docs[k])
    assert set(got) == set(grp)
    for lang, rows in grp.items():
        g = got[lang]
        assert g["by_lang_doc_count"] == len(rows)
        assert g["avg_dl"] == pytest.approx(
            sum(x["dl"] for x in rows) / len(rows), rel=1e-12
        )
        assert g["dls_min"] == min(x["dl"] for x in rows)
        assert g["dls_max"] == max(x["dl"] for x in rows)
        assert g["dls_count"] == len(rows)
        assert g["uniq_repo"] == len({x["repo"] for x in rows})
        assert g["wavg"] == pytest.approx(
            sum(x["dl"] * x["doc_id"] for x in rows)
            / sum(x["doc_id"] for x in rows),
            rel=1e-12,
        )


def test_nested_buckets_parent_doc_counts(spark, setup):
    d, r, docs = setup
    aggs = {
        "by_lang": {
            "terms": {"field": "lang"},
            "aggs": {
                "by_dl": {
                    "histogram": {"field": "dl", "interval": 50},
                    "aggs": {"max_dl": {"max": {"field": "dl"}}},
                }
            },
        }
    }
    rows = [x.asDict() for x in r.aggs_dsl_df(aggs).collect()]
    want_parent = collections.Counter(v["lang"] for v in docs.values())
    child_sum: dict = collections.defaultdict(int)
    for x in rows:
        child_sum[x["by_lang"]] += x["by_dl_doc_count"]
        lo = x["by_dl"]
        assert lo <= x["max_dl"] < lo + 50
    for x in rows:
        assert x["by_lang_doc_count"] == want_parent[x["by_lang"]]
        assert child_sum[x["by_lang"]] == want_parent[x["by_lang"]]


def test_range_overlapping_and_missing(spark, setup):
    d, r, docs = setup
    dls = [v["dl"] for v in docs.values()]
    got = {
        x["dl_ranges"]: x["dl_ranges_doc_count"]
        for x in r.aggs_dsl_df(
            {
                "dl_ranges": {
                    "range": {
                        "field": "dl",
                        "ranges": [
                            {"to": 120},
                            {"from": 100, "to": 200, "key": "mid"},
                            {"from": 200},
                        ],
                    }
                }
            }
        ).collect()
    }
    assert got["-120"] == sum(1 for x in dls if x < 120)
    assert got["mid"] == sum(1 for x in dls if 100 <= x < 200)
    assert got["200-"] == sum(1 for x in dls if x >= 200)
    miss = r.aggs_dsl_df({"no_grp": {"missing": {"field": "grp"}}}).collect()
    want = sum(1 for v in docs.values() if v["grp"] is None)
    assert miss[0]["no_grp_doc_count"] == want and want > 0


def test_filters_sql_and_query_body(spark, setup):
    d, r, docs = setup
    m = {x["doc_id"] for x in r.match_df("merge").collect()}
    got = {
        x["langs"]: x["langs_doc_count"]
        for x in r.aggs_dsl_df(
            {
                "langs": {
                    "filters": {
                        "filters": {
                            "rusty": "lang = 'rust'",
                            "mergey": {"match": {"content": "merge"}},
                        }
                    }
                }
            }
        ).collect()
    }
    assert got["rusty"] == sum(1 for v in docs.values() if v["lang"] == "rust")
    assert got["mergey"] == len(m)


def test_date_histogram_calendar_and_fixed(spark, setup):
    d, r, docs = setup
    got = {
        x["by_day"]: x["by_day_doc_count"]
        for x in r.aggs_dsl_df(
            {"by_day": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}}
        ).collect()
    }
    want: dict = collections.defaultdict(int)
    for v in docs.values():
        want[v["ts"].replace(hour=0, minute=0, second=0, microsecond=0)] += 1
    assert got == dict(want) and len(got) > 1
    got12 = {
        x["by_12h"]: x["by_12h_doc_count"]
        for x in r.aggs_dsl_df(
            {"by_12h": {"date_histogram": {"field": "ts", "fixed_interval": "12h"}}}
        ).collect()
    }
    want12: dict = collections.defaultdict(int)
    for v in docs.values():
        epoch = int(v["ts"].replace(tzinfo=datetime.timezone.utc).timestamp())
        want12[
            datetime.datetime.fromtimestamp(
                (epoch // 43200) * 43200, tz=datetime.timezone.utc
            ).replace(tzinfo=None)
        ] += 1
    assert got12 == dict(want12)


def test_terms_size_and_min_doc_count(spark, setup):
    d, r, docs = setup
    full = collections.Counter(v["lang"] for v in docs.values())
    got = [
        (x["top"], x["top_doc_count"])
        for x in r.aggs_dsl_df({"top": {"terms": {"field": "lang", "size": 2}}}).collect()
    ]
    want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert sorted(got) == sorted(want)
    cut = max(full.values())
    got = [
        x["top"]
        for x in r.aggs_dsl_df(
            {"top": {"terms": {"field": "lang", "min_doc_count": cut}}}
        ).collect()
    ]
    assert got == [k for k, v in sorted(full.items()) if v >= cut]


def test_terms_order_and_missing(spark, setup):
    """ES terms `order` picks WHICH buckets survive the size cut —
    _key / _count / a sub-metric name — and `missing` routes null-field
    docs into a named bucket."""
    d, r, docs = setup
    full = collections.Counter(v["lang"] for v in docs.values())

    # order by _key asc: lexicographically first `size` languages
    got = [
        x["top"] for x in r.aggs_dsl_df(
            {"top": {"terms": {"field": "lang", "size": 2,
                               "order": {"_key": "asc"}}}}
        ).collect()
    ]
    assert got == sorted(full)[:2]

    # order by _count asc: the rarest languages win the cut
    got = [
        (x["top"], x["top_doc_count"]) for x in r.aggs_dsl_df(
            {"top": {"terms": {"field": "lang", "size": 2,
                               "order": {"_count": "asc"}}}}
        ).collect()
    ]
    want = sorted(full.items(), key=lambda kv: (kv[1], kv[0]))[:2]
    assert sorted(got) == sorted(want)

    # order by a sub-metric: languages with the highest mean doc length
    got = [
        (x["top"], x["mean_dl"]) for x in r.aggs_dsl_df(
            {"top": {"terms": {"field": "lang", "size": 2,
                               "order": {"mean_dl": "desc"}},
                     "aggs": {"mean_dl": {"avg": {"field": "dl"}}}}}
        ).collect()
    ]
    per = collections.defaultdict(list)
    for v in docs.values():
        per[v["lang"]].append(v["dl"])
    means = {k: sum(v) / len(v) for k, v in per.items()}
    want_keys = sorted(means, key=lambda k: (-means[k], k))[:2]
    assert sorted(k for k, _ in got) == sorted(want_keys)
    for k, m in got:
        assert m == pytest.approx(means[k], rel=1e-9)

    # missing: null grp docs land in the named bucket
    n_null = sum(1 for v in docs.values() if v["grp"] is None)
    assert n_null > 0, "fixture must have null grp docs"
    got = {
        x["g"]: x["g_doc_count"] for x in r.aggs_dsl_df(
            {"g": {"terms": {"field": "grp", "size": 10,
                             "missing": "N/A"}}}
        ).collect()
    }
    assert got["N/A"] == n_null
    assert sum(got.values()) == len(docs)

    # include/exclude: value lists and whole-term-anchored regexes
    full_keys = sorted(full)
    got = sorted(
        x["t"] for x in r.aggs_dsl_df(
            {"t": {"terms": {"field": "lang", "size": 100,
                             "include": full_keys[:2]}}}
        ).collect()
    )
    assert got == full_keys[:2]
    got = sorted(
        x["t"] for x in r.aggs_dsl_df(
            {"t": {"terms": {"field": "lang", "size": 100,
                             "exclude": full_keys[0]}}}
        ).collect()
    )
    assert got == full_keys[1:]
    # regex include is whole-term anchored (ES contract): a prefix
    # pattern without .* matches nothing unless it spans the term
    pat = full_keys[0][0] + ".*"
    got = sorted(
        x["t"] for x in r.aggs_dsl_df(
            {"t": {"terms": {"field": "lang", "size": 100,
                             "include": pat}}}
        ).collect()
    )
    assert got == [k for k in full_keys if k.startswith(full_keys[0][0])]
    with pytest.raises(ValueError, match="include wants"):
        r.aggs_dsl_df({"t": {"terms": {"field": "lang", "include": 7}}})

    # validation: bad order shape / unknown metric / metric above innermost
    with pytest.raises(ValueError, match="terms order wants"):
        r.aggs_dsl_df({"t": {"terms": {"field": "lang", "order": "_key"}}})
    with pytest.raises(ValueError, match="unknown metric"):
        r.aggs_dsl_df(
            {"t": {"terms": {"field": "lang", "size": 2,
                             "order": {"nope": "desc"}}}}
        )
    with pytest.raises(ValueError, match="innermost"):
        r.aggs_dsl_df(
            {"t": {"terms": {"field": "lang", "size": 2,
                             "order": {"m": "desc"}},
                   "aggs": {"g2": {"terms": {"field": "grp"},
                                   "aggs": {"m": {"avg": {"field": "dl"}}}}}}}
        )


def test_top_level_metrics_and_score(spark, setup):
    d, r, docs = setup
    one = r.aggs_dsl_df(
        {
            "n": {"value_count": {"field": "dl"}},
            "p50": {"percentiles": {"field": "dl", "percents": [50.0]}},
        }
    ).collect()[0]
    assert one["n"] == len(docs)
    import statistics

    assert one["p50_p50"] == pytest.approx(
        statistics.median(v["dl"] for v in docs.values()), rel=1e-9
    )
    # metrics over _score follow the query's relevance
    m = {x["doc_id"]: x["score"] for x in r.match_df("merge").collect()}
    got = r.aggs_dsl_df(
        {"best": {"max": {"field": "_score"}}},
        query={"match": {"content": "merge"}},
    ).collect()[0]
    assert got["best"] == pytest.approx(max(m.values()), rel=1e-12)


def test_metric_script_missing_and_tz(spark, setup):
    """ES metric `script` (computed source) and `missing` (null
    substitution) params; date_histogram `time_zone` shifts bucket
    boundaries to the zone's local day while keys stay UTC instants."""
    d, r, docs = setup
    one = r.aggs_dsl_df(
        {"s2": {"sum": {"script": {"source": "dl * 2"}}},
         "p": {"percentiles": {"script": "dl * 2", "percents": [50.0]}},
         "g": {"value_count": {"field": "grp"}},
         "gm": {"value_count": {"field": "grp", "missing": "N/A"}}}
    ).collect()[0]
    tot = sum(v["dl"] for v in docs.values())
    assert one["s2"] == 2 * tot
    import statistics
    assert one["p_p50"] == pytest.approx(
        statistics.median(2 * v["dl"] for v in docs.values()))
    n_null = sum(1 for v in docs.values() if v["grp"] is None)
    assert one["g"] == len(docs) - n_null and one["gm"] == len(docs)

    # avg with missing: nulls count as the substitute
    got = r.aggs_dsl_df(
        {"m": {"value_count": {"field": "grp", "missing": "zz"}}}).collect()
    assert got[0]["m"] == len(docs)

    # time_zone: +05:00 shifts day boundaries; recompute by hand
    import collections as _c
    import datetime as _dt

    tz = _dt.timezone(_dt.timedelta(hours=5))
    want = _c.Counter()
    for v in docs.values():
        loc = v["ts"].replace(tzinfo=_dt.timezone.utc).astimezone(tz)
        day0 = loc.replace(hour=0, minute=0, second=0, microsecond=0)
        want[day0.astimezone(_dt.timezone.utc).replace(tzinfo=None)] += 1
    got = {
        x["t"]: x["t_doc_count"]
        for x in r.aggs_dsl_df(
            {"t": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "day",
                                      "time_zone": "+05:00"}}}).collect()
    }
    assert got == dict(want)
    # and it differs from the UTC bucketing (the shift is real)
    utc = {
        x["t"] for x in r.aggs_dsl_df(
            {"t": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "day"}}}).collect()
    }
    assert set(got) != utc


def test_histogram_dense_fill(spark, setup):
    """Explicit min_doc_count: 0 / extended_bounds fill empty histogram
    buckets (the ES default behavior, opt-in here — documented sparse
    deviation): a dense interval series appears with doc_count 0 and
    null metrics; extended_bounds widen past the data, snapped to the
    bucket grid; sparse stays the default."""
    d, r, docs = setup
    import collections as _c

    interval = 2.0
    byb = _c.Counter((v["dl"] // 2) * 2 for v in docs.values())
    lo, hi = min(byb), max(byb)
    n_buckets = int((hi - lo) / interval) + 1
    assert n_buckets > len(byb), "fixture needs at least one gap"

    # sparse default: only occupied buckets
    sparse = r.aggs_dsl_df(
        {"h": {"histogram": {"field": "dl", "interval": 2}}}).collect()
    assert len(sparse) == len(byb)

    # explicit min_doc_count 0: the dense series
    dense = r.aggs_dsl_df(
        {"h": {"histogram": {"field": "dl", "interval": 2,
                             "min_doc_count": 0}},
         }).collect()
    assert len(dense) == n_buckets
    got = {x["h"]: x["h_doc_count"] for x in dense}
    assert [x["h"] for x in dense] == sorted(got)  # key-ordered
    for k in got:
        assert got[k] == byb.get(k, 0)

    # metrics are null on empty buckets, real elsewhere
    dense_m = r.aggs_dsl_df(
        {"h": {"histogram": {"field": "dl", "interval": 2,
                             "min_doc_count": 0},
               "aggs": {"m": {"avg": {"field": "dl"}}}}}).collect()
    for x in dense_m:
        if x["h_doc_count"] == 0:
            assert x["m"] is None
        else:
            assert x["m"] is not None

    # extended_bounds widen beyond the data (grid-snapped) and imply fill
    eb = r.aggs_dsl_df(
        {"h": {"histogram": {"field": "dl", "interval": 2,
                             "extended_bounds": {"min": lo - 15,
                                                 "max": hi + 15}}}}
    ).collect()
    keys = [x["h"] for x in eb]
    assert min(keys) < lo and max(keys) > hi
    assert len(keys) == int((max(keys) - min(keys)) / interval) + 1

    # pipeline over the dense series sees the zero buckets
    cum = r.aggs_dsl_df(
        {"h": {"histogram": {"field": "dl", "interval": 2,
                             "min_doc_count": 0},
               "aggs": {"c": {"cumulative_sum": {"buckets_path": "_count"}}}}}
    ).collect()
    run = 0.0
    for x in cum:
        run += x["h_doc_count"]
        assert x["c"] == pytest.approx(run)

    # date_histogram fixed_interval dense fill: every 2h slot between
    # the observed extremes appears, zero-count slots included
    import collections as _c2
    import datetime as _dt

    by2h = _c2.Counter(
        _dt.datetime.fromtimestamp(
            (int(v["ts"].replace(tzinfo=_dt.timezone.utc).timestamp())
             // 7200) * 7200,
            tz=_dt.timezone.utc,
        ).replace(tzinfo=None)
        for v in docs.values()
    )
    dts = r.aggs_dsl_df(
        {"t2": {"date_histogram": {"field": "ts", "fixed_interval": "2h",
                                   "min_doc_count": 0}}}).collect()
    lo_t, hi_t = min(by2h), max(by2h)
    assert len(dts) == int((hi_t - lo_t).total_seconds() // 7200) + 1
    for x in dts:
        assert x["t2_doc_count"] == by2h.get(x["t2"], 0)
    assert any(x["t2_doc_count"] == 0 for x in dts)

    # calendar intervals cannot fill
    with pytest.raises(ValueError, match="fixed_interval"):
        r.aggs_dsl_df(
            {"t2": {"date_histogram": {"field": "ts",
                                       "calendar_interval": "day",
                                       "min_doc_count": 0}}})

    # restriction: dense fill only as the single bucket level
    with pytest.raises(ValueError, match="only bucket level"):
        r.aggs_dsl_df(
            {"t": {"terms": {"field": "lang"}, "aggs": {
                "h": {"histogram": {"field": "dl", "interval": 2,
                                    "min_doc_count": 0}}}}}
        )
    with pytest.raises(ValueError, match="extended_bounds wants"):
        r.aggs_dsl_df(
            {"h": {"histogram": {"field": "dl", "interval": 2,
                                 "extended_bounds": {"min": 1}}}})


def test_aggs_validation(spark, setup):
    d, r, _ = setup
    with pytest.raises(ValueError, match="one bucket aggregation"):
        r.aggs_dsl_df(
            {
                "a": {"terms": {"field": "lang"}},
                "b": {"terms": {"field": "repo"}},
            }
        )
    with pytest.raises(ValueError, match="innermost"):
        r.aggs_dsl_df(
            {
                "a": {"terms": {"field": "lang"}},
                "b": {"avg": {"field": "dl"}},
            }
        )
    with pytest.raises(ValueError, match="unknown aggregation"):
        r.aggs_dsl_df({"a": {"banana_sketch": {"field": "lang"}}})
    with pytest.raises(ValueError, match="interval"):
        r.aggs_dsl_df({"a": {"histogram": {"field": "dl", "interval": 0}}})


def test_aggs_live_twin_and_filter(spark, setup):
    d, r, docs = setup
    ri = IncrementalIndexReader(spark, d)
    body = {"by_lang": {"terms": {"field": "lang"}, "aggs": {"avg_dl": {"avg": {"field": "dl"}}}}}
    a = sorted(
        (x["by_lang"], x["by_lang_doc_count"], round(x["avg_dl"], 9))
        for x in ri.aggs_dsl_df(body).collect()
    )
    b = sorted(
        (x["by_lang"], x["by_lang_doc_count"], round(x["avg_dl"], 9))
        for x in r.aggs_dsl_df(body).collect()
    )
    assert a == b
    got = {
        x["by_lang"]: x["by_lang_doc_count"]
        for x in r.aggs_dsl_df(
            {"by_lang": {"terms": {"field": "lang"}}}, filter_sql="dl >= 150"
        ).collect()
    }
    want = collections.Counter(
        v["lang"] for v in docs.values() if v["dl"] >= 150
    )
    assert got == dict(want)


def test_rare_terms(spark, setup):
    """rare_terms keeps buckets with doc_count <= max_doc_count."""
    d, r, docs = setup
    counts = collections.Counter(x["dl"] for x in docs.values())
    for mdc in (1, 3):
        got = {
            x["rare_dl"]: x["rare_dl_doc_count"]
            for x in r.aggs_dsl_df(
                {"rare_dl": {"rare_terms": {"field": "dl", "max_doc_count": mdc}}}
            ).collect()
        }
        want = {k: c for k, c in counts.items() if c <= mdc}
        assert got == want
        assert want, "fixture must have rare dl buckets"
    # and the cut must actually exclude common buckets
    assert any(c > 3 for c in counts.values())


def test_multi_terms_with_metrics(spark, setup):
    """multi_terms composes a multi-field key ('|'-joined), size-cut by
    doc_count desc like terms."""
    d, r, docs = setup
    groups = collections.defaultdict(list)
    for x in docs.values():
        if x["grp"] is None:
            continue  # concat_ws skips NULL parts; exclude like ES missing
        groups[f"{x['lang']}|{x['grp']}"].append(x["dl"])
    aggs = {
        "by_lg": {
            "multi_terms": {
                "terms": [{"field": "lang"}, {"field": "grp"}],
                "size": 4,
            },
            "aggs": {"avg_dl": {"avg": {"field": "dl"}}},
        }
    }
    got = r.aggs_dsl_df(aggs).collect()
    assert len(got) == 4
    want_order = sorted(groups, key=lambda k: (-len(groups[k]), k))[:4]
    # NULL grp rows produce a bare 'lang' key (concat_ws drops nulls) —
    # they form their own bucket and may enter the cut; drop for compare
    got_rows = [x for x in got if "|" in x["by_lg"]]
    want_order = [k for k in want_order]
    for x in got_rows:
        k = x["by_lg"]
        assert x["by_lg_doc_count"] == len(groups[k])
        assert x["avg_dl"] == pytest.approx(
            sum(groups[k]) / len(groups[k]), rel=1e-9
        )
    with pytest.raises(ValueError, match="at least 2"):
        r.aggs_dsl_df(
            {"x": {"multi_terms": {"terms": [{"field": "lang"}]}}}
        )


def test_categorize_text_bucket(spark, tmp_path):
    """categorize_text as a DSL bucket kind: keys fold onto the
    category-defining tokens of a stored metadata column, sized/ordered
    like terms, nested metrics ride along."""
    rows = [
        ("r", f"p/{i}", "c", "t", f"content word{i}",
         f"user {i} logged in from 10.0.0.{i}" if i % 2 == 0
         else f"disk sd{i} at {i}% capacity")
        for i in range(10)
    ]
    d = str(tmp_path / "cat_dsl_idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(
            rows,
            "repo string, path string, commit string, lang string, "
            "content string, msg string",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    out = [
        x.asDict()
        for x in r.aggs_dsl_df(
            {
                "cats": {
                    "categorize_text": {"field": "msg", "size": 5},
                    "aggs": {"max_id": {"max": {"field": "doc_id"}}},
                }
            }
        ).collect()
    ]
    got = {x["cats"]: x["cats_doc_count"] for x in out}
    # 'sd0'..'sd9' and '10.0.0.N' tokens are digit-bearing -> dropped
    assert got == {"user logged in from": 5, "disk at capacity": 5}
    # doc_count ties -> key asc tie-break; size cuts after ordering
    one = r.aggs_dsl_df({"cats": {"categorize_text": {"field": "msg", "size": 1}}})
    assert [x["cats"] for x in one.collect()] == ["disk at capacity"]


def test_terms_bucket_array_field(spark, tmp_path):
    """ES array-field terms semantics: a doc lands in EVERY element's
    bucket, once per bucket even with duplicate elements; doc_count stays
    a doc count (the sum across buckets exceeds n_docs)."""
    rows = [
        ("r", "0", "c", "t", "alpha words here", ["t1", "t2"]),
        ("r", "1", "c", "t", "beta words here", ["t2", "t2", "t3"]),
        ("r", "2", "c", "t", "gamma words here", ["t2"]),
        ("r", "3", "c", "t", "delta words here", []),
    ]
    d = str(tmp_path / "arr_idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(
            rows,
            "repo string, path string, commit string, lang string, "
            "content string, tags array<string>",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    out = {
        x["by_tag"]: x["by_tag_doc_count"]
        for x in r.aggs_dsl_df(
            {"by_tag": {"terms": {"field": "tags", "size": 10}}}
        ).collect()
    }
    assert out == {"t1": 1, "t2": 3, "t3": 1}


def test_global_bucket(spark, setup):
    """ES global: escapes the enclosing query scope — the subtree counts
    ALL live docs while sibling trees stay query-scoped."""
    d, r, docs = setup
    scoped = r.aggs_dsl_df(
        {"by_lang": {"terms": {"field": "lang", "size": 10}}},
        query={"match": {"content": "merge"}},
    ).collect()
    n_scoped = sum(x["by_lang_doc_count"] for x in scoped)
    out = r.aggs_dsl_df(
        {
            "everything": {
                "global": {},
                "aggs": {"n": {"value_count": {"field": "doc_id"}}},
            }
        },
        query={"match": {"content": "merge"}},
    ).collect()
    assert len(out) == 1
    assert out[0]["everything"] == "global"
    assert out[0]["everything_doc_count"] == len(docs)
    assert out[0]["n"] == len(docs) > n_scoped
    with pytest.raises(ValueError, match="top-level"):
        r.aggs_dsl_df(
            {"x": {"terms": {"field": "lang"},
                   "aggs": {"g": {"global": {}}}}}
        )
    with pytest.raises(ValueError, match="no parameters"):
        r.aggs_dsl_df({"g": {"global": {"field": "lang"}}})


def _collect_rows(df):
    return [tuple(x) for x in df.collect()]


def test_composite_dsl_parity_and_pagination(spark, setup):
    """`composite` through the aggs request body: parity with
    composite_df on page 1, then a full after-key page walk covers the
    bucket space exactly once, with metric sub-aggs along for the ride."""
    d, r, docs = setup
    body = {"pages": {"composite": {
        "sources": [
            {"by_lang": {"terms": {"field": "lang"}}},
            {"day": {"date_histogram": {"field": "ts",
                                        "calendar_interval": "day"}}},
        ],
        "size": 4,
    }, "aggs": {"avg_dl": {"avg": {"field": "dl"}}}}}
    q = {"match": {"content": "merge buffer"}}
    page1 = r.aggs_dsl_df(body, query=q)
    assert page1.columns == ["by_lang", "day", "doc_count", "avg_dl"]
    native = r.composite_df(
        "merge buffer", [("by_lang", "lang"), ("day", ("ts", "day"))],
        size=4, metrics={"avg_dl": ("avg", "dl")})
    got = [(x["by_lang"], x["day"], x["doc_count"], x["avg_dl"])
           for x in page1.collect()]
    want = [(x["by_lang"], x["day"], x["n_docs"], x["avg_dl"])
            for x in native.collect()]
    assert got == want and got
    # full page walk == the whole bucket space, each bucket exactly once
    matched = {x["doc_id"] for x in r.match_df("merge buffer").collect()}
    model = collections.Counter(
        (docs[i]["lang"],
         docs[i]["ts"].replace(hour=0, minute=0, second=0, microsecond=0))
        for i in matched)
    walked = {}
    after = None
    for _ in range(100):
        b = dict(body)
        b["pages"] = dict(body["pages"])
        comp = dict(b["pages"]["composite"])
        if after is not None:
            comp["after"] = after
        b["pages"] = {"composite": comp, "aggs": body["pages"]["aggs"]}
        rows = r.aggs_dsl_df(b, query=q).collect()
        if not rows:
            break
        for x in rows:
            key = (x["by_lang"], x["day"])
            assert key not in walked, "bucket served twice"
            walked[key] = x["doc_count"]
        after = {"by_lang": rows[-1]["by_lang"], "day": rows[-1]["day"]}
    assert walked == dict(model)


def test_composite_dsl_desc_and_missing_bucket(spark, setup):
    d, r, docs = setup
    body = {"p": {"composite": {
        "sources": [{"g": {"terms": {"field": "grp", "order": "desc",
                                     "missing_bucket": True}}}],
        "size": 10,
    }}}
    rows = r.aggs_dsl_df(body).collect()
    model = collections.Counter(v["grp"] for v in docs.values())
    # desc order, nulls last (the ES missing_order default for desc)
    keys = [x["g"] for x in rows]
    assert keys == sorted([k for k in model if k is not None], reverse=True) + [None]
    assert {x["g"]: x["doc_count"] for x in rows} == dict(model)
    # paging past a null cursor ends the walk
    comp = dict(body["p"]["composite"])
    comp["after"] = {"g": None}
    assert r.aggs_dsl_df({"p": {"composite": comp}}).count() == 0
    # missing_bucket=False drops the null bucket
    body2 = {"p": {"composite": {
        "sources": [{"g": {"terms": {"field": "grp"}}}], "size": 10}}}
    rows2 = r.aggs_dsl_df(body2).collect()
    assert [x["g"] for x in rows2] == sorted(k for k in model if k is not None)
    with pytest.raises(ValueError, match="metrics only"):
        r.aggs_dsl_df({"p": {"composite": {"sources": [
            {"g": {"terms": {"field": "grp"}}}]},
            "aggs": {"t": {"terms": {"field": "lang"}}}}})


MB = {"match": {"content": "merge buffer"}}


def test_significant_terms_dsl_parity(spark, setup):
    """Request-body significant_terms == the typed JLH kernel."""
    d, r, docs = setup
    via = r.aggs_dsl_df(
        {"sig": {"significant_terms": {"size": 5}}}, query=MB
    ).collect()
    typed = r.significant_terms_df("merge buffer", size=5).collect()
    assert [tuple(x) for x in via] == [tuple(x) for x in typed]
    assert len(via) == 5
    with pytest.raises(ValueError, match="bare"):
        r.aggs_dsl_df(
            {"sig": {"significant_terms": {}}},
            query={"bool": {"must": [MB]}},
        )


def test_top_hits_dsl_parity(spark, setup):
    """terms bucket + top_hits sub-agg == the typed top_hits_df."""
    d, r, docs = setup
    body = {"by_lang": {"terms": {"field": "lang", "size": 4},
                        "aggs": {"top": {"top_hits": {"size": 2}}}}}
    via = r.aggs_dsl_df(body, query=MB).collect()
    typed = r.top_hits_df("merge buffer", "lang", n_buckets=4, size=2).collect()
    assert [tuple(x) for x in via] == [tuple(x) for x in typed]
    assert all(x["hit_rank"] <= 2 for x in via) and len(via) > 0
    with pytest.raises(ValueError, match="_score sort only"):
        r.aggs_dsl_df(
            {"b": {"terms": {"field": "lang"},
                   "aggs": {"t": {"top_hits": {"sort": [{"dl": "desc"}]}}}}},
            query=MB,
        )


def test_sampler_kinds_dsl(spark, setup):
    """sampler / diversified_sampler restrict the row set before the
    subtree; checked against a brute sample built from the match set."""
    d, r, docs = setup
    scores = {
        x["doc_id"]: x["score"]
        for x in r.search_dsl_df(MB, k=None).collect()
    }
    # diversified: top-1 per lang by (score desc, doc_id asc)
    best = {}
    for did, s in scores.items():
        lang = docs[did]["lang"]
        if lang is None:
            continue
        cur = best.get(lang)
        if cur is None or (-s, did) < (-scores[cur], cur):
            best[lang] = did
    out = r.aggs_dsl_df(
        {"div": {"diversified_sampler": {"field": "lang",
                                         "max_docs_per_value": 1},
                 "aggs": {"by_lang": {"terms": {"field": "lang"}}}}},
        query=MB,
    ).collect()
    assert {x["by_lang"]: x["by_lang_doc_count"] for x in out} == {
        lang: 1 for lang in best
    }
    # plain sampler: subtree sees exactly shard_size rows
    tot = r.aggs_dsl_df(
        {"s": {"sampler": {"shard_size": 7},
               "aggs": {"by_lang": {"terms": {"field": "lang"}}}}},
        query=MB,
    ).collect()
    assert sum(x["by_lang_doc_count"] for x in tot) == min(7, len(scores))
    with pytest.raises(ValueError, match="sub-aggregations"):
        r.aggs_dsl_df({"s": {"sampler": {"shard_size": 3}}}, query=MB)


def test_geotile_grid_bucket_dsl(spark, tmp_path):
    """geotile_grid as a request-body bucket kind == the typed surface,
    and composes with metric sub-aggs."""
    from elasticsearch_jdbc_spark.index.aggs import geotile_grid

    d = str(tmp_path / "gt")
    corpus = synthetic_corpus(spark, n_files=120, seed=9)
    did = F.regexp_extract("path", r"(\d+)", 1).cast("long")
    corpus = corpus.withColumn(
        "lat", ((did * 7919) % 160 - 80).cast("double") + 0.25
    ).withColumn("lon", ((did * 104729) % 360 - 180).cast("double") + 0.25)
    IndexBuilder(spark, d, partitions=2).build(corpus, resume=False)
    r = IndexReader(spark, d)
    via = r.aggs_dsl_df(
        {"tiles": {"geotile_grid": {"precision": 3}}}
    ).collect()
    pts = spark.read.parquet(f"{d}/docs").select("lat", "lon")
    typed = geotile_grid(pts, precision=3).collect()
    assert {x["tiles"]: x["tiles_doc_count"] for x in via} == {
        x["key"]: x["doc_count"] for x in typed
    }
    assert len(via) > 3
    # nested metric under the tile key
    withm = r.aggs_dsl_df(
        {"tiles": {"geotile_grid": {"precision": 2},
                   "aggs": {"mean_lat": {"avg": {"field": "lat"}}}}}
    ).collect()
    assert all(x["mean_lat"] is not None for x in withm)


def test_random_sampler_body_kind(spark, setup):
    """random_sampler as a body kind == the typed md5-threshold subset."""
    from elasticsearch_jdbc_spark.index.aggs import random_sampler

    d, r, docs = setup
    out = r.aggs_dsl_df(
        {"s": {"random_sampler": {"probability": 0.4, "seed": 7},
               "aggs": {"n": {"value_count": {"field": "dl"}}}}}
    ).collect()
    docs_df = spark.read.parquet(f"{d}/docs")
    want = random_sampler(docs_df, 0.4, seed=7).count()
    assert out[0]["n"] == want and 0 < want < docs_df.count()


def test_significant_text_body_dispatch(spark, setup):
    d, r, docs = setup
    via = r.aggs_dsl_df(
        {"s": {"significant_text": {"size": 5,
                                    "filter_duplicate_text": True}}},
        query=MB,
    ).collect()
    typed = r.significant_text_df(
        "merge buffer", size=5, filter_duplicate_text=True
    ).collect()
    assert [tuple(x) for x in via] == [tuple(x) for x in typed]
    assert len(via) == 5


def test_extended_stats_and_boxplot_body_kinds(spark, setup):
    """extended_stats / boxplot / percentile_ranks as body metric kinds
    == the typed aggs surfaces, top-level and under a bucket."""
    from elasticsearch_jdbc_spark.index.aggs import boxplot, extended_stats

    d, r, docs = setup
    docs_df = spark.read.parquet(f"{d}/docs")
    got = r.aggs_dsl_df(
        {"es": {"extended_stats": {"field": "dl", "sigma": 3.0}}}
    ).collect()[0]
    want = extended_stats(docs_df, "dl", sigma=3.0).collect()[0]
    for f in ("count", "min", "max", "sum", "avg", "sum_of_squares",
              "variance", "variance_sampling", "std_deviation",
              "std_deviation_sampling", "std_upper", "std_lower"):
        assert got[f"es_{f}"] == pytest.approx(want[f], rel=1e-9), f

    got = r.aggs_dsl_df({"bx": {"boxplot": {"field": "dl"}}}).collect()[0]
    want = boxplot(docs_df, "dl").collect()[0]
    for f in ("min", "q1", "q2", "q3", "max"):
        assert got[f"bx_{f}"] == pytest.approx(want[f], rel=1e-9), f

    vals = sorted(v["dl"] for v in docs.values())
    probe = vals[len(vals) // 2]
    got = r.aggs_dsl_df(
        {"pr": {"percentile_ranks": {"field": "dl", "values": [probe]}}}
    ).collect()[0]
    brute = 100.0 * sum(1 for v in vals if v <= probe) / len(vals)
    key = f"pr_{str(float(probe)).rstrip('0').rstrip('.').replace('.', '_')}"
    assert got[key] == pytest.approx(brute, abs=1e-6)

    # under a terms bucket: per-lang parity with brute computation
    rows = r.aggs_dsl_df(
        {"by_lang": {"terms": {"field": "lang", "size": 100},
                     "aggs": {"es": {"extended_stats": {"field": "dl"}}}}}
    ).collect()
    import statistics

    for x in rows:
        dls = [v["dl"] for v in docs.values() if v["lang"] == x["by_lang"]]
        assert x["es_count"] == len(dls)
        # body kinds round to 6 decimals (the typed-surface rule)
        assert x["es_avg"] == pytest.approx(
            sum(dls) / len(dls), abs=1e-6)
        if len(dls) > 1:
            assert x["es_std_deviation_sampling"] == pytest.approx(
                statistics.stdev(dls), abs=1e-5)


def test_top_metrics_and_geo_body_kinds(spark, setup):
    """top_metrics (size=1) / geo_bounds / geo_centroid body kinds vs
    brute recompute; top_metrics tie-break = smallest metric."""
    d, r, docs = setup

    rows = r.aggs_dsl_df(
        {"by_lang": {"terms": {"field": "lang", "size": 100},
                     "aggs": {"tm": {"top_metrics": {
                         "metrics": [{"field": "dl"}],
                         "sort": {"doc_id": "desc"}}}}}}
    ).collect()
    for x in rows:
        grp = [v for v in docs.values() if v["lang"] == x["by_lang"]]
        top = max(grp, key=lambda v: v["doc_id"])
        assert x["tm_dl"] == pytest.approx(float(top["dl"]))
        assert x["tm_sort_value"] == top["doc_id"]
    # asc order picks the minimum sort row
    one = r.aggs_dsl_df(
        {"tm": {"top_metrics": {"metrics": [{"field": "dl"}],
                                "sort": {"doc_id": {"order": "asc"}}}}}
    ).collect()[0]
    low = min(docs.values(), key=lambda v: v["doc_id"])
    assert one["tm_dl"] == pytest.approx(float(low["dl"]))
    with pytest.raises(ValueError, match="size=1"):
        r.aggs_dsl_df({"tm": {"top_metrics": {
            "metrics": [{"field": "dl"}], "sort": {"doc_id": "asc"},
            "size": 3}}})

    # geo kinds over planted coordinates (split lat/lon convention)
    from pyspark.sql import functions as SF

    d2 = str(d) + "_geo"
    corpus = synthetic_corpus(spark, n_files=60, seed=9)
    did = SF.crc32("path")
    corpus = corpus.withColumn(
        "lat", ((did % 160) - 80).cast("double") + 0.5
    ).withColumn("lon", ((did % 360) - 180).cast("double") + 0.5)
    IndexBuilder(spark, d2, partitions=2).build(corpus, resume=False)
    r2 = IndexReader(spark, d2)
    pts = [(x["lat"], x["lon"])
           for x in spark.read.parquet(f"{d2}/docs").collect()]
    got = r2.aggs_dsl_df(
        {"gb": {"geo_bounds": {}}, "gc": {"geo_centroid": {}}}
    ).collect()[0]
    lats = [p[0] for p in pts]
    lons = [p[1] for p in pts]
    assert got["gb_top_left_lat"] == pytest.approx(max(lats))
    assert got["gb_top_left_lon"] == pytest.approx(min(lons))
    assert got["gb_bottom_right_lat"] == pytest.approx(min(lats))
    assert got["gb_bottom_right_lon"] == pytest.approx(max(lons))
    assert got["gc_lat"] == pytest.approx(sum(lats) / len(lats), abs=1e-6)
    assert got["gc_lon"] == pytest.approx(sum(lons) / len(lons), abs=1e-6)
    assert got["gc_count"] == len(pts)


def test_pipeline_aggs_body_kinds(spark, setup):
    """derivative / cumulative_sum / moving_fn / bucket_script through
    the request-body grammar == brute recompute over the bucket list."""
    d, r, docs = setup
    rows = [x.asDict() for x in r.aggs_dsl_df(
        {"by_dl": {"histogram": {"field": "dl", "interval": 50},
                   "aggs": {
                       "total": {"sum": {"field": "dl"}},
                       "deriv": {"derivative": {"buckets_path": "total"}},
                       "cum": {"cumulative_sum": {"buckets_path": "_count"}},
                       "mavg": {"moving_fn": {
                           "buckets_path": "total", "window": 2,
                           "script": "MovingFunctions.unweightedAvg(values)"}},
                       "ratio": {"bucket_script": {
                           "buckets_path": {"t": "total", "n": "_count"},
                           "script": "params.t / params.n"}},
                   }}}
    ).collect()]
    assert len(rows) > 2
    rows.sort(key=lambda x: x["by_dl"])
    run = 0
    for i, x in enumerate(rows):
        if i == 0:
            assert x["deriv"] is None
        else:
            assert x["deriv"] == pytest.approx(
                x["total"] - rows[i - 1]["total"], rel=1e-12)
        run += x["by_dl_doc_count"]
        assert x["cum"] == pytest.approx(run)
        lo = max(0, i - 1)
        want = sum(y["total"] for y in rows[lo:i + 1]) / (i + 1 - lo)
        assert x["mavg"] == pytest.approx(want, rel=1e-12)
        assert x["ratio"] == pytest.approx(
            x["total"] / x["by_dl_doc_count"], rel=1e-12)


def test_bucket_selector_and_sort_body_kinds(spark, setup):
    """bucket_selector filters buckets by metric predicate;
    bucket_sort truncates top-N by metric; both parent-partitioned."""
    d, r, docs = setup
    import collections as C

    full = C.Counter(v["lang"] for v in docs.values())
    cut = sorted(full.values())[len(full) // 2]
    kept = [x["by_lang"] for x in r.aggs_dsl_df(
        {"by_lang": {"terms": {"field": "lang", "size": 100},
                     "aggs": {"keep": {"bucket_selector": {
                         "buckets_path": {"n": "_count"},
                         "script": f"params.n >= {cut}"}}}}}
    ).collect()]
    assert sorted(kept) == sorted(
        k for k, v in full.items() if v >= cut) and 0 < len(kept) < len(full)

    top2 = [x["by_lang"] for x in r.aggs_dsl_df(
        {"by_lang": {"terms": {"field": "lang", "size": 100},
                     "aggs": {"top": {"bucket_sort": {
                         "sort": [{"_count": {"order": "desc"}},
                                  {"_key": "asc"}],
                         "size": 2}}}}}
    ).collect()]
    want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert sorted(top2) == sorted(k for k, _ in want)

    # guards: ordered kinds demand a histogram parent; pipelines demand
    # a bucket; unresolved buckets_path named
    with pytest.raises(ValueError, match="histogram"):
        r.aggs_dsl_df(
            {"by_lang": {"terms": {"field": "lang"},
                         "aggs": {"d": {"derivative":
                                        {"buckets_path": "_count"}}}}})
    with pytest.raises(ValueError, match="enclosing bucket"):
        r.aggs_dsl_df({"d": {"cumulative_sum": {"buckets_path": "_count"}}})
    with pytest.raises(ValueError, match="does not resolve"):
        r.aggs_dsl_df(
            {"by_dl": {"histogram": {"field": "dl", "interval": 50},
                       "aggs": {"d": {"derivative":
                                      {"buckets_path": "nope"}}}}})


def test_mad_and_string_stats_body_dispatch(spark, setup):
    """median_absolute_deviation / string_stats as top-level body
    dispatches onto the typed two-pass kernels, query-scoped."""
    import statistics

    d, r, docs = setup
    got = r.aggs_dsl_df(
        {"m": {"median_absolute_deviation": {"field": "dl"}}}
    ).collect()[0]
    dls = sorted(float(v["dl"]) for v in docs.values())
    med = statistics.median(dls)
    mad = statistics.median(sorted(abs(x - med) for x in dls))
    assert got["m_median"] == pytest.approx(med, abs=1e-6)
    assert got["m"] == pytest.approx(mad, abs=1e-6)

    got = r.aggs_dsl_df(
        {"s": {"string_stats": {"field": "lang"}}},
        query={"match": {"content": "merge"}},
    ).collect()[0]
    m = {x["doc_id"] for x in r.match_df("merge").collect()}
    langs = [docs[k]["lang"] for k in m]
    assert got["s_count"] == len(langs)
    assert got["s_min_length"] == min(len(x) for x in langs)
    assert got["s_max_length"] == max(len(x) for x in langs)
    assert got["s_avg_length"] == pytest.approx(
        sum(len(x) for x in langs) / len(langs), abs=1e-6)
    import collections as C
    import math

    cnt = C.Counter("".join(langs))
    tot = sum(cnt.values())
    ent = -sum(n / tot * math.log2(n / tot) for n in cnt.values())
    assert got["s_entropy"] == pytest.approx(ent, abs=1e-5)
    with pytest.raises(ValueError, match="sub-aggregations"):
        r.aggs_dsl_df({"m": {"median_absolute_deviation": {"field": "dl"},
                             "aggs": {"x": {"avg": {"field": "dl"}}}}})


def test_geohash_ip_and_geo_distance_bucket_kinds(spark, tmp_path):
    """geohash_grid / ip_range / ip_prefix / geo_distance as body bucket
    kinds == the typed kernels over planted coordinates/addresses."""
    from elasticsearch_jdbc_spark.index.aggs import (
        geo_distance_agg,
        geohash_grid,
        ip_prefix,
        ip_range,
    )

    d = str(tmp_path / "idx")
    corpus = synthetic_corpus(spark, n_files=80, seed=4)
    did = F.crc32("path")
    corpus = (
        corpus.withColumn("lat", ((did % 160) - 80).cast("double") + 0.5)
        .withColumn("lon", ((did % 360) - 180).cast("double") + 0.5)
        .withColumn(
            "addr",
            F.concat_ws(
                ".",
                F.lit(10),
                (did % 3).cast("long"),
                (did % 256).cast("long"),
                ((did * 7) % 256).cast("long"),
            ),
        )
    )
    IndexBuilder(spark, d, partitions=2).build(corpus, resume=False)
    r = IndexReader(spark, d)
    docs_df = spark.read.parquet(f"{d}/docs")

    got = {
        (x["gh"], x["gh_doc_count"])
        for x in r.aggs_dsl_df(
            {"gh": {"geohash_grid": {"precision": 2}}}
        ).collect()
    }
    want = {
        (x["key"], x["doc_count"])
        for x in geohash_grid(docs_df, precision=2).collect()
    }
    assert got == want and len(got) > 1

    ranges = [{"mask": "10.0.0.0/16", "key": "netzero"},
              {"from": "10.1.0.0", "to": "10.2.255.255", "key": "mid"}]
    got = {
        (x["nets"], x["nets_doc_count"])
        for x in r.aggs_dsl_df(
            {"nets": {"ip_range": {"field": "addr", "ranges": ranges}}}
        ).collect()
    }
    want = {
        (x["key"], x["doc_count"])
        for x in ip_range(docs_df, "addr", ranges).collect()
    }
    assert got == want and len(got) == 2

    got = {
        (x["pfx"], x["pfx_doc_count"])
        for x in r.aggs_dsl_df(
            {"pfx": {"ip_prefix": {"field": "addr",
                                   "prefix_length": 16}}}
        ).collect()
    }
    want = {
        (x["key"], x["doc_count"])
        for x in ip_prefix(docs_df, "addr", 16).collect()
    }
    assert got == want and len(got) == 3

    rings = [{"to": 5000, "key": "near"},
             {"from": 5000, "to": 12000, "key": "midr"},
             {"from": 12000, "key": "far"}]
    got = {
        (x["rings"], x["rings_doc_count"])
        for x in r.aggs_dsl_df(
            {"rings": {"geo_distance": {"origin": {"lat": 0.0, "lon": 0.0},
                                        "ranges": rings}}}
        ).collect()
    }
    want = {
        (x["key"], x["doc_count"])
        for x in geo_distance_agg(
            docs_df, "lat", "lon", 0.0, 0.0, rings
        ).collect()
    }
    assert got == want and len(got) >= 2

    # sub-metrics compose under the new kinds (one groupBy, same tree)
    rows = r.aggs_dsl_df(
        {"pfx": {"ip_prefix": {"field": "addr", "prefix_length": 16},
                 "aggs": {"mdl": {"avg": {"field": "dl"}}}}}
    ).collect()
    dmap = [x.asDict() for x in docs_df.collect()]
    for x in rows:
        net = int(x["pfx"].split(".")[1])
        grp = [v["dl"] for v in dmap
               if int(v["addr"].split(".")[1]) == net]
        assert x["pfx_doc_count"] == len(grp)
        assert x["mdl"] == pytest.approx(sum(grp) / len(grp), rel=1e-9)


def test_normalize_and_sibling_reducers_body_kinds(spark, setup):
    """normalize / moving_percentiles / avg_bucket-family through the
    body grammar == brute recompute over the bucket list."""
    d, r, docs = setup
    rows = [x.asDict() for x in r.aggs_dsl_df(
        {"by_dl": {"histogram": {"field": "dl", "interval": 50},
                   "aggs": {
                       "total": {"sum": {"field": "dl"}},
                       "pct": {"normalize": {
                           "buckets_path": "total",
                           "method": "percent_of_sum"}},
                       "z": {"normalize": {
                           "buckets_path": "_count",
                           "method": "z-score"}},
                       "mp": {"moving_percentiles": {
                           "buckets_path": "total", "window": 2,
                           "percent": 50.0}},
                       "mean_n": {"avg_bucket": {"buckets_path": "_count"}},
                       "tot_max": {"max_bucket": {"buckets_path": "total"}},
                   }}}
    ).collect()]
    rows.sort(key=lambda x: x["by_dl"])
    tot = sum(x["total"] for x in rows)
    ns = [x["by_dl_doc_count"] for x in rows]
    mean = sum(ns) / len(ns)
    sd = (sum((n - mean) ** 2 for n in ns) / len(ns)) ** 0.5
    import statistics

    for i, x in enumerate(rows):
        assert x["pct"] == pytest.approx(x["total"] / tot, rel=1e-12)
        assert x["z"] == pytest.approx((x["by_dl_doc_count"] - mean) / sd,
                                       rel=1e-9)
        lo = max(0, i - 1)
        assert x["mp"] == pytest.approx(
            statistics.median(y["total"] for y in rows[lo:i + 1]),
            rel=1e-12)
        assert x["mean_n"] == pytest.approx(mean, rel=1e-12)
        assert x["tot_max"] == pytest.approx(
            max(y["total"] for y in rows), rel=1e-12)
    # bucket_sort may reference a pipeline output (engine extension)
    top = [x.asDict() for x in r.aggs_dsl_df(
        {"by_dl": {"histogram": {"field": "dl", "interval": 50},
                   "aggs": {
                       "total": {"sum": {"field": "dl"}},
                       "d": {"derivative": {"buckets_path": "total"}},
                       "cut": {"bucket_sort": {
                           "sort": [{"d": "desc"}], "size": 1}}}}}
    ).collect()]
    want_total_deltas = [rows[i]["total"] - rows[i - 1]["total"]
                         for i in range(1, len(rows))]
    assert len(top) == 1 and top[0]["d"] == pytest.approx(max(want_total_deltas))


def test_adjacency_auto_dh_vwh_body_dispatch(spark, setup):
    """adjacency_matrix / auto_date_histogram / variable_width_histogram
    as top-level body dispatches onto the typed kernels."""
    from elasticsearch_jdbc_spark.index.aggs import (
        adjacency_matrix,
        auto_date_histogram,
        variable_width_histogram,
    )

    d, r, docs = setup
    docs_df = spark.read.parquet(f"{d}/docs")

    flt = {"rusty": "lang = 'rust'", "long": "dl >= 150"}
    got = {(x["adj"], x["adj_doc_count"])
           for x in r.aggs_dsl_df(
               {"adj": {"adjacency_matrix": {"filters": flt}}}).collect()}
    # typed twin runs over the docs relation + _score (absent there) —
    # predicates only touch metadata, so recompute typed over docs_df
    want = {(x["key"], x["doc_count"])
            for x in adjacency_matrix(docs_df, flt).collect()}
    assert got == want
    n_rust = sum(1 for v in docs.values() if v["lang"] == "rust")
    n_both = sum(1 for v in docs.values()
                 if v["lang"] == "rust" and v["dl"] >= 150)
    assert ("rusty", n_rust) in got
    if n_both:
        assert ("long&rusty", n_both) in got

    rows = r.aggs_dsl_df(
        {"adh": {"auto_date_histogram": {"field": "ts", "buckets": 5}}}
    ).collect()
    # the aggs fixture's ts column exists only on the corpus side of the
    # planted metadata; assert response shape + totals
    assert sum(x["adh_doc_count"] for x in rows) == len(docs)
    assert len(rows) <= 5 and len({x["adh_interval"] for x in rows}) == 1

    got = [x.asDict() for x in r.aggs_dsl_df(
        {"v": {"variable_width_histogram": {"field": "dl", "buckets": 4}}}
    ).collect()]
    want = [x.asDict() for x in
            variable_width_histogram(docs_df, "dl", 4).collect()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["v"] == w["key"] and g["v_min"] == w["min"]
        assert g["v_max"] == w["max"] and g["v_doc_count"] == w["doc_count"]
    with pytest.raises(ValueError, match="sql predicate"):
        r.aggs_dsl_df({"adj": {"adjacency_matrix": {
            "filters": {"q": {"match": {"content": "x"}}}}}})


def test_t_test_metric_body_kind(spark, setup):
    """t_test as a body metric kind == the typed aggs.t_test."""
    from elasticsearch_jdbc_spark.index.aggs import t_test

    d, r, docs = setup
    docs_df = spark.read.parquet(f"{d}/docs")
    langs = sorted({v["lang"] for v in docs.values()})[:2]
    got = r.aggs_dsl_df(
        {"tt": {"t_test": {"field": "dl", "group_field": "lang",
                           "a": langs[0], "b": langs[1]}}}
    ).collect()[0]
    want = t_test(docs_df, "dl", "lang", langs[0], langs[1]).collect()[0]
    for f in ("n_a", "n_b", "mean_a", "mean_b", "t_stat", "welch_df"):
        assert got[f"tt_{f}"] == pytest.approx(want[f], abs=1e-6), f
    # and under a bucket: group sizes recompute per bucket
    rows = r.aggs_dsl_df(
        {"by_repo": {"terms": {"field": "repo", "size": 3},
                     "aggs": {"tt": {"t_test": {
                         "field": "dl", "group_field": "lang",
                         "a": langs[0], "b": langs[1]}}}}}
    ).collect()
    for x in rows:
        grp = [v for v in docs.values() if v["repo"] == x["by_repo"]]
        assert x["tt_n_a"] == sum(1 for v in grp if v["lang"] == langs[0])
        assert x["tt_n_b"] == sum(1 for v in grp if v["lang"] == langs[1])


def test_cumulative_cardinality_body_kind(spark, setup):
    """cumulative_cardinality via buckets_path -> sibling cardinality
    (the ES shape): running count of distinct keys by first bucket."""
    d, r, docs = setup
    rows = [x.asDict() for x in r.aggs_dsl_df(
        {"by_day": {"date_histogram": {"field": "ts",
                                       "calendar_interval": "day"},
                    "aggs": {
                        "langs": {"cardinality": {"field": "lang",
                                                  "exact": True}},
                        "tot": {"cumulative_cardinality": {
                            "buckets_path": "langs"}}}}}
    ).collect()]
    rows.sort(key=lambda x: x["by_day"])
    seen: set = set()
    for x in rows:
        day = x["by_day"]
        for v in docs.values():
            if v["ts"].replace(hour=0, minute=0, second=0,
                               microsecond=0) <= day:
                seen.add(v["lang"])
        # recompute: distinct langs whose FIRST day <= this bucket
        assert x["tot"] == len(seen)
    assert rows[-1]["tot"] == len({v["lang"] for v in docs.values()})
    with pytest.raises(ValueError, match="single bucket"):
        r.aggs_dsl_df(
            {"a": {"terms": {"field": "lang"},
                   "aggs": {"b": {"histogram": {"field": "dl",
                                                "interval": 50},
                                  "aggs": {"c": {"cumulative_cardinality":
                                                 {"field": "repo"}}}}}}})


def test_filter_single_bucket_kind(spark, setup):
    """ES `filter` (single-bucket) kind: the subtree aggregates over the
    matching rows only; one bucket keyed by the agg name. SQL-string and
    query-body filters agree with brute recompute over the docs map."""
    d, r, docs = setup
    rows = [x.asDict() for x in r.aggs_dsl_df(
        {"rusty": {"filter": "lang = 'rust'",
                   "aggs": {"avg_dl": {"avg": {"field": "dl"}}}}}
    ).collect()]
    want = [v["dl"] for v in docs.values() if v["lang"] == "rust"]
    assert len(rows) == 1 and rows[0]["rusty"] == "rusty"
    assert rows[0]["rusty_doc_count"] == len(want)
    assert rows[0]["avg_dl"] == pytest.approx(sum(want) / len(want))
    # query-body filter restricts via the compiled match set
    m = {x["doc_id"] for x in r.match_df("merge").collect()}
    got = [x.asDict() for x in r.aggs_dsl_df(
        {"mergey": {"filter": {"match": {"content": "merge"}},
                    "aggs": {"n": {"value_count": {"field": "doc_id"}}}}}
    ).collect()]
    assert got[0]["mergey_doc_count"] == len(m) and got[0]["n"] == len(m)
    with pytest.raises(ValueError, match="filter bucket"):
        r.aggs_dsl_df({"bad": {"filter": {}}})


def test_date_range_bucket_kind(spark, setup):
    """`date_range` buckets: anchor||date-math endpoints, gte/lt bounds,
    explicit keys, doc membership == brute recompute."""
    d, r, docs = setup
    lo = datetime.datetime(2023, 11, 15)
    got = {
        x["when"]: x["when_doc_count"]
        for x in r.aggs_dsl_df(
            {"when": {"date_range": {
                "field": "ts",
                "ranges": [
                    {"key": "early", "to": "2023-11-15||/d"},
                    {"key": "late", "from": "2023-11-15||/d"},
                ]}}}
        ).collect()
    }
    early = sum(1 for v in docs.values() if v["ts"] < lo)
    late = sum(1 for v in docs.values() if v["ts"] >= lo)
    assert got.get("early", 0) == early and got.get("late", 0) == late
    assert early + late == len(docs) and early > 0 and late > 0


def test_rate_metric_body_kind(spark, setup):
    """`rate` under a date_histogram: sum (or doc count) scaled by
    unit_length / bucket_length, resolved at compile time."""
    d, r, docs = setup
    rows = [x.asDict() for x in r.aggs_dsl_df(
        {"by_day": {"date_histogram": {"field": "ts",
                                       "calendar_interval": "day"},
                    "aggs": {
                        "dl_per_hour": {"rate": {"field": "dl",
                                                 "unit": "hour"}},
                        "docs_per_day": {"rate": {"unit": "day"}},
                    }}}
    ).collect()]
    want: dict = collections.defaultdict(lambda: [0.0, 0])
    for v in docs.values():
        day = v["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        want[day][0] += v["dl"]
        want[day][1] += 1
    assert len(rows) == len(want)
    for x in rows:
        s, n = want[x["by_day"]]
        assert x["dl_per_hour"] == pytest.approx(s / 24.0, rel=1e-12)
        assert x["docs_per_day"] == pytest.approx(float(n))
    with pytest.raises(ValueError, match="incompatible"):
        r.aggs_dsl_df(
            {"b": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "month"},
                   "aggs": {"r": {"rate": {"unit": "day"}}}}})
    with pytest.raises(ValueError, match="enclosing date_histogram"):
        r.aggs_dsl_df(
            {"b": {"terms": {"field": "lang"},
                   "aggs": {"r": {"rate": {"unit": "day"}}}}})


def test_stats_bucket_family_body_kinds(spark, setup):
    """stats_bucket / extended_stats_bucket / percentiles_bucket sibling
    reducers over a sibling metric's bucket values == brute recompute."""
    d, r, docs = setup
    rows = [x.asDict() for x in r.aggs_dsl_df(
        {"by_dl": {"histogram": {"field": "dl", "interval": 50},
                   "aggs": {
                       "total": {"sum": {"field": "dl"}},
                       "st": {"stats_bucket": {"buckets_path": "total"}},
                       "ext": {"extended_stats_bucket": {
                           "buckets_path": "total"}},
                       "pct": {"percentiles_bucket": {
                           "buckets_path": "total",
                           "percents": [50.0, 100.0]}},
                   }}}
    ).collect()]
    tots = sorted(x["total"] for x in rows)
    n = len(tots)
    mean = sum(tots) / n
    var = sum((t - mean) ** 2 for t in tots) / n
    import statistics

    for x in rows:
        assert x["st_count"] == n
        assert x["st_min"] == pytest.approx(min(tots))
        assert x["st_max"] == pytest.approx(max(tots))
        assert x["st_avg"] == pytest.approx(mean)
        assert x["st_sum"] == pytest.approx(sum(tots))
        assert x["ext_variance"] == pytest.approx(var, rel=1e-9)
        assert x["ext_std_deviation"] == pytest.approx(var ** 0.5, rel=1e-9)
        assert x["ext_sum_of_squares"] == pytest.approx(
            sum(t * t for t in tots), rel=1e-12)
        assert x["pct_p50"] == pytest.approx(
            statistics.median(tots), rel=1e-12)
        assert x["pct_p100"] == pytest.approx(max(tots))


def test_geo_line_metric_kind(spark, setup):
    """ES geo_line: per-bucket [lon, lat] track ordered by the sort
    field, truncated to size, include_sort values — vs hand computation.
    Engine-native split coordinate columns (lat_col/lon_col)."""
    d, r, docs = setup
    body = {"by_lang": {"terms": {"field": "lang", "size": 10}, "aggs": {
        "track": {"geo_line": {"sort": {"field": "doc_id"}, "size": 3,
                               "lat_col": "dl", "lon_col": "doc_id",
                               "include_sort": True}},
    }}}
    got = {x["by_lang"]: x for x in r.aggs_dsl_df(body).collect()}
    bylang = collections.defaultdict(list)
    for x in docs.values():
        bylang[x["lang"]].append(x)
    for lang, rows in bylang.items():
        want = sorted(rows, key=lambda x: x["doc_id"])[:3]
        assert got[lang]["track"] == [
            [float(x["doc_id"]), float(x["dl"])] for x in want
        ]
        assert got[lang]["track_type"] == "LineString"
        assert got[lang]["track_sort_values"] == [
            float(x["doc_id"]) for x in want
        ]
    # desc reverses the walk
    body["by_lang"]["aggs"]["track"]["geo_line"]["sort_order"] = "desc"
    got_d = {x["by_lang"]: x for x in r.aggs_dsl_df(body).collect()}
    for lang, rows in bylang.items():
        want = sorted(rows, key=lambda x: -x["doc_id"])[:3]
        assert got_d[lang]["track"] == [
            [float(x["doc_id"]), float(x["dl"])] for x in want
        ]


def test_geo_line_guards(spark, setup):
    d, r, docs = setup
    with pytest.raises(ValueError, match="geo_line wants sort"):
        r.aggs_dsl_df({"t": {"terms": {"field": "lang"}, "aggs": {
            "g": {"geo_line": {"lat_col": "dl", "lon_col": "dl"}}}}})
    with pytest.raises(ValueError, match=r"\[1, 10000\]"):
        r.aggs_dsl_df({"t": {"terms": {"field": "lang"}, "aggs": {
            "g": {"geo_line": {"sort": {"field": "doc_id"}, "size": 0,
                               "lat_col": "dl", "lon_col": "dl"}}}}})
    with pytest.raises(ValueError, match="sort_order"):
        r.aggs_dsl_df({"t": {"terms": {"field": "lang"}, "aggs": {
            "g": {"geo_line": {"sort": {"field": "doc_id"},
                               "sort_order": "up",
                               "lat_col": "dl", "lon_col": "dl"}}}}})


def test_time_series_bucket_kind(spark, setup):
    """ES TSDB time_series bucket: one bucket per dimension tuple (the
    _tsid analogue), sub-aggs nest normally — vs hand computation.
    NULL dimension values carry a sentinel token (distinct tuples stay distinct)."""
    d, r, docs = setup
    body = {"series": {"time_series": {"dimensions": ["lang", "grp"]},
                       "aggs": {"avg_dl": {"avg": {"field": "dl"}}}}}
    got = {
        x["series"]: (x["series_doc_count"], round(x["avg_dl"], 6))
        for x in r.aggs_dsl_df(body).collect()
    }
    series = collections.defaultdict(list)
    for x in docs.values():
        # NULL dims carry a sentinel so distinct tuples stay distinct
        key = "|".join(
            p if p is not None else "\x00" for p in (x["lang"], x["grp"])
        )
        series[key].append(x["dl"])
    want = {
        k: (len(v), round(sum(v) / len(v), 6)) for k, v in series.items()
    }
    assert got == want
    with pytest.raises(ValueError, match="dimensions"):
        r.aggs_dsl_df({"series": {"time_series": {}, "aggs": {
            "n": {"value_count": {"field": "dl"}}}}})


def test_time_series_with_date_histogram_subtree(spark, setup):
    """The TSDB shape: time_series -> date_histogram -> metric, all in
    the one-groupBy tree; per-series bucket sums re-derive by hand."""
    d, r, docs = setup
    body = {"series": {"time_series": {"dimensions": ["lang"]}, "aggs": {
        "by_hour": {"date_histogram": {"field": "ts",
                                       "fixed_interval": "6h"},
                    "aggs": {"sum_dl": {"sum": {"field": "dl"}}}},
    }}}
    rows = r.aggs_dsl_df(body).collect()
    got = {
        (x["series"], x["by_hour"]): (x["by_hour_doc_count"], x["sum_dl"])
        for x in rows
    }
    # a key name shadowing a non-dimension docs column is rejected (it
    # would overwrite the column the subtree still addresses)
    with pytest.raises(ValueError, match="shadows"):
        r.aggs_dsl_df({"ts": {"time_series": {"dimensions": ["lang"]},
                              "aggs": {"by_hour": {"date_histogram": {
                                  "field": "ts", "fixed_interval": "6h"}}}}})
    want = collections.defaultdict(lambda: [0, 0])
    for x in docs.values():
        epoch = int(x["ts"].timestamp())
        bucket = epoch - epoch % 21600
        k = (x["lang"], datetime.datetime.fromtimestamp(
            bucket, datetime.timezone.utc).replace(tzinfo=None))
        want[k][0] += 1
        want[k][1] += x["dl"]
    assert got == {k: tuple(v) for k, v in want.items()}


def test_cartesian_bounds_and_centroid(spark, setup):
    """ES cartesian_bounds / cartesian_centroid: the planar twins of the
    geo metrics over x/y point columns — vs hand computation (x=doc_id,
    y=dl via explicit column naming)."""
    d, r, docs = setup
    body = {"by_lang": {"terms": {"field": "lang", "size": 10}, "aggs": {
        "box": {"cartesian_bounds": {"x_col": "doc_id", "y_col": "dl"}},
        "c": {"cartesian_centroid": {"x_col": "doc_id", "y_col": "dl"}},
    }}}
    got = {x["by_lang"]: x for x in r.aggs_dsl_df(body).collect()}
    bylang = collections.defaultdict(list)
    for x in docs.values():
        bylang[x["lang"]].append((x["doc_id"], x["dl"]))
    for lang, pts in bylang.items():
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        row = got[lang]
        assert (row["box_top_left_x"], row["box_top_left_y"]) == (
            min(xs), max(ys))
        assert (row["box_bottom_right_x"], row["box_bottom_right_y"]) == (
            max(xs), min(ys))
        assert row["c_x"] == round(sum(xs) / len(xs), 6)
        assert row["c_y"] == round(sum(ys) / len(ys), 6)
        assert row["c_count"] == len(pts)


def test_percentile_ranks_ignores_nulls(spark, setup):
    """percentile_ranks: null field values are not observations (the ES
    missing-value rule) — regression: they used to count in the
    denominator as values above every probe."""
    d, r, docs = setup
    got = r.aggs_dsl_df({"pr": {"percentile_ranks": {
        "field": "grp_len", "values": [1.0]}}},
        runtime_mappings={"grp_len": "length(grp)"},
    ).collect()[0]
    vals = [len(x["grp"]) for x in docs.values() if x["grp"] is not None]
    want = round(100.0 * sum(1 for v in vals if v <= 1.0) / len(vals), 6)
    assert got["pr_1"] == want


def test_time_series_null_dims_stay_distinct(spark, setup):
    """Multi-dimension series with NULL values must not merge: (x, null)
    and (null, x) are different series (concat_ws would fold them)."""
    d, r, docs = setup
    out = r.aggs_dsl_df(
        {"series": {"time_series": {"dimensions": ["grp", "lang"]},
                    "aggs": {"n": {"value_count": {"field": "dl"}}}}}
    ).collect()
    got = {x["series"]: x["series_doc_count"] for x in out}
    want = collections.Counter(
        "|".join(v if v is not None else "\x00"
                 for v in (x["grp"], x["lang"]))
        for x in docs.values()
    )
    assert got == dict(want)
    # single-dimension series carry the SAME sentinel for nulls
    one = {
        x["s1"]: x["s1_doc_count"]
        for x in r.aggs_dsl_df({"s1": {"time_series": {
            "dimensions": ["grp"]},
            "aggs": {"n": {"value_count": {"field": "dl"}}}}}).collect()
    }
    want1 = collections.Counter(
        x["grp"] if x["grp"] is not None else "\x00"
        for x in docs.values()
    )
    assert one == dict(want1)
