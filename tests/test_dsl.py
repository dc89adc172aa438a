"""ES JSON query-DSL compiler (index/dsl.py): every node class checked
against the typed surface or a hand computation, composition algebra
(bool / dis_max / boosting / function_score / script_score) against
score arithmetic over the leaf match sets, field routing on a
fields-indexed corpus, and base/live tier twins rank-identical."""

from __future__ import annotations

import base64
import collections
import json
import math

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
    d = str(tmp_path_factory.mktemp("dsl") / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=66).cache()
    IndexBuilder(spark, d, partitions=4, with_positions=True).build(
        corpus, resume=False
    )
    r = IndexReader(spark, d)
    docs = {
        x["doc_id"]: x.asDict()
        for x in spark.read.parquet(f"{d}/docs").collect()
    }
    return d, r, docs


def _ids(df):
    return {x["doc_id"] for x in df.collect()}


def _scores(df):
    return {x["doc_id"]: x["score"] for x in df.collect()}


def test_leafs_match_typed_surfaces(spark, setup):
    d, r, docs = setup
    cases = [
        ({"match": {"content": "merge buffer"}}, r.match_df("merge buffer")),
        (
            {"match": {"content": {"query": "merge buffer", "operator": "and"}}},
            r.match_df("merge buffer", min_should_match=2),
        ),
        (
            {"match_phrase": {"content": {"query": "merge buffer", "slop": 1}}},
            r.search_phrase_df("merge buffer", k=None, slop=1),
        ),
        (
            {"match_bool_prefix": {"content": "merge buf"}},
            r.match_bool_prefix_df("merge buf", k=None),
        ),
        ({"prefix": {"content": "buf"}}, r.search_prefix_df("buf", k=None)),
        (
            {"fuzzy": {"content": {"value": "mrge", "fuzziness": 1}}},
            r.search_fuzzy_df("mrge", k=None, fuzziness=1),
        ),
        (
            {"wildcard": {"content": "buf*er"}},
            r.search_wildcard_df("buf*er", k=None),
        ),
        (
            {"regexp": {"content": "buf.*"}},
            r.search_regexp_df("buf.*", k=None),
        ),
        (
            {"intervals": {"content": {"match": {"query": "merge buffer", "max_gaps": 3, "ordered": False}}}},
            r.search_intervals_df("merge buffer", max_gaps=3, ordered=False, k=None),
        ),
        (
            {"query_string": {"query": "+merge -rust buf*"}},
            r.query_string_df("+merge -rust buf*", k=None),
        ),
        ({"term": {"content": "merge"}}, r.search_terms_df(["merge"], None)),
    ]
    for body, want_df in cases:
        got = _scores(r.search_dsl_df(body, k=None))
        want = _scores(want_df)
        assert got.keys() == want.keys(), body
        for k in got:
            assert got[k] == pytest.approx(want[k], rel=1e-12), body
        assert got, body


def test_filter_context_leafs(spark, setup):
    d, r, docs = setup
    got = _scores(r.search_dsl_df({"range": {"dl": {"gte": 100, "lt": 150}}}, k=None))
    want = {k for k, v in docs.items() if 100 <= v["dl"] < 150}
    assert set(got) == want and set(got.values()) == {1.0}
    got = _scores(
        r.search_dsl_df({"term": {"lang": {"value": "rust", "boost": 2.0}}}, k=None)
    )
    assert set(got) == {k for k, v in docs.items() if v["lang"] == "rust"}
    assert set(got.values()) == {2.0}
    got = _ids(r.search_dsl_df({"terms": {"lang": ["rust", "go"]}}, k=None))
    assert got == {k for k, v in docs.items() if v["lang"] in ("rust", "go")}
    got = _ids(r.search_dsl_df({"exists": {"field": "lang"}}, k=None))
    assert got == set(docs)
    some = sorted(v["path"] for v in docs.values())[:3]
    got = _ids(r.search_dsl_df({"ids": {"values": some}}, k=None))
    assert got == {k for k, v in docs.items() if v["path"] in some}
    got = _ids(r.search_dsl_df({"match_all": {}}, k=None))
    assert got == set(docs)


def test_bool_composition_arithmetic(spark, setup):
    d, r, docs = setup
    m1 = _scores(r.match_df("merge"))
    m2 = _scores(r.match_df("buffer"))
    body = {
        "bool": {
            "must": [
                {"match": {"content": "merge"}},
                {"match": {"content": "buffer"}},
            ],
            "filter": [{"range": {"dl": {"gte": 80}}}],
            "must_not": [{"term": {"lang": "go"}}],
            "should": [{"rank_feature": {"field": "dl", "saturation": {"pivot": 120}}}],
            "boost": 2.0,
        }
    }
    got = _scores(r.search_dsl_df(body, k=None))
    want = {
        k: 2.0 * (m1[k] + m2[k] + v["dl"] / (v["dl"] + 120.0))
        for k, v in docs.items()
        if k in m1 and k in m2 and v["dl"] >= 80 and v["lang"] != "go"
    }
    assert got.keys() == want.keys() and want
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_bool_pure_should_msm(spark, setup):
    d, r, _ = setup
    body = {
        "bool": {
            "should": [
                {"match": {"content": "merge"}},
                {"match": {"content": "buffer"}},
            ],
            "minimum_should_match": 2,
        }
    }
    got = _ids(r.search_dsl_df(body, k=None))
    want = _ids(r.match_df("merge buffer", min_should_match=2))
    assert got == want and want


def test_dis_max_boosting_constant_wrapper(spark, setup):
    d, r, docs = setup
    m1 = _scores(r.match_df("merge"))
    m2 = _scores(r.match_df("buffer"))
    dm = {
        "dis_max": {
            "queries": [
                {"match": {"content": "merge"}},
                {"match": {"content": "buffer"}},
            ],
            "tie_breaker": 0.3,
        }
    }
    got = _scores(r.search_dsl_df(dm, k=None))
    for k, s in got.items():
        a, b = m1.get(k, 0.0), m2.get(k, 0.0)
        best, other = max(a, b), min(a, b)
        assert s == pytest.approx(best + 0.3 * other, rel=1e-12)
    wrapped = {
        "wrapper": {"query": base64.b64encode(json.dumps(dm).encode()).decode()}
    }
    assert _scores(r.search_dsl_df(wrapped, k=None)) == got
    boosting = {
        "boosting": {
            "positive": {"match": {"content": "merge"}},
            "negative": {"term": {"lang": "rust"}},
            "negative_boost": 0.25,
        }
    }
    got = _scores(r.search_dsl_df(boosting, k=None))
    for k, s in got.items():
        want = m1[k] * (0.25 if docs[k]["lang"] == "rust" else 1.0)
        assert s == pytest.approx(want, rel=1e-12)
    cs = {"constant_score": {"filter": {"match": {"content": "merge"}}, "boost": 3.5}}
    got = _scores(r.search_dsl_df(cs, k=None))
    assert set(got) == set(m1) and set(got.values()) == {3.5}


def test_function_and_script_score(spark, setup):
    d, r, docs = setup
    m = _scores(r.match_df("merge"))
    fs = {
        "function_score": {
            "query": {"match": {"content": "merge"}},
            "field_value_factor": {"field": "dl", "factor": 0.01, "modifier": "log1p"},
            "boost_mode": "sum",
        }
    }
    got = _scores(r.search_dsl_df(fs, k=None))
    assert got.keys() == m.keys()
    for k in got:
        assert got[k] == pytest.approx(
            m[k] + math.log(0.01 * docs[k]["dl"] + 1.0), rel=1e-12
        )
    rewritten = {k: v * 2 + docs[k]["dl"] / 1000.0 for k, v in m.items()}
    floor = sorted(rewritten.values())[len(rewritten) // 2]
    ss = {
        "script_score": {
            "query": {"match": {"content": "merge"}},
            "script": {"source": "_score * 2 + dl / 1000.0"},
            "min_score": floor,
        }
    }
    got = _scores(r.search_dsl_df(ss, k=None))
    want = {k: v for k, v in rewritten.items() if v >= floor}
    assert got.keys() == want.keys() and want
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_function_score_functions_array(spark, setup):
    """ES functions array: per-entry filter + weight / random_score /
    field_value_factor, score_mode combining the APPLYING functions,
    max_boost cap, boost_mode replace — hand model end-to-end."""
    d, r, docs = setup
    m = _scores(r.match_df("merge"))
    rust = {k for k in m if docs[k]["lang"] == "rust"}
    fs = {
        "function_score": {
            "query": {"match": {"content": "merge"}},
            "functions": [
                {"filter": {"term": {"lang": {"query": "rust"}}},
                 "weight": 3.0},
                {"field_value_factor": {"field": "dl", "factor": 0.5},
                 "weight": 2.0},
            ],
            "score_mode": "sum",
            "boost_mode": "multiply",
        }
    }
    got = _scores(r.search_dsl_df(fs, k=None))
    assert got.keys() == m.keys()
    for k in got:
        f = (3.0 if k in rust else 0.0) + 2.0 * 0.5 * docs[k]["dl"]
        assert got[k] == pytest.approx(m[k] * f, rel=1e-12)

    # weight-only shorthand == scale; max_boost caps; replace drops _score
    fs2 = {
        "function_score": {
            "query": {"match": {"content": "merge"}},
            "functions": [{"field_value_factor": {"field": "dl"}}],
            "max_boost": 50.0,
            "boost_mode": "replace",
        }
    }
    got = _scores(r.search_dsl_df(fs2, k=None))
    for k in got:
        assert got[k] == pytest.approx(min(docs[k]["dl"], 50.0), rel=1e-12)

    # random_score: deterministic in [0, 1), stable across calls
    rs = {
        "function_score": {
            "query": {"match": {"content": "merge"}},
            "random_score": {"seed": 7},
            "boost_mode": "replace",
        }
    }
    a = _scores(r.search_dsl_df(rs, k=None))
    b = _scores(r.search_dsl_df(rs, k=None))
    assert a == b and all(0.0 <= v < 1.0 for v in a.values())
    assert len(set(a.values())) > 1
    # different seed -> different draw
    rs2 = {"function_score": {"query": {"match": {"content": "merge"}},
                              "random_score": {"seed": 8},
                              "boost_mode": "replace"}}
    assert _scores(r.search_dsl_df(rs2, k=None)) != a

    # score_mode first / no-function-applies neutrality
    fs3 = {
        "function_score": {
            "query": {"match": {"content": "merge"}},
            "functions": [
                {"filter": {"term": {"lang": {"query": "nope"}}},
                 "weight": 9.0},
            ],
            "score_mode": "multiply",
        }
    }
    got = _scores(r.search_dsl_df(fs3, k=None))
    for k in got:
        assert got[k] == pytest.approx(m[k], rel=1e-12)
    with pytest.raises(ValueError, match="unsupported score_mode"):
        r.search_dsl_df({"function_score": {
            "query": {"match": {"content": "merge"}},
            "weight": 2.0, "score_mode": "median"}}, k=3)


def test_minimum_should_match_syntax(spark, setup):
    """The full ES minimum_should_match syntax on the bool compound and
    the match leaf: percentages, negatives, and n<spec combinations."""
    d, r, docs = setup
    clauses = [{"match": {"content": "merge"}},
               {"match": {"content": "buffer"}},
               {"match": {"content": "stream"}},
               {"match": {"content": "quick"}}]
    sets = [_ids(r.search_dsl_df(c, k=None)) for c in clauses]

    def hits(ids, n):
        return {i for i in ids if sum(i in s for s in sets) >= n}

    allids = set().union(*sets)
    for msm, n in (("50%", 2), ("75%", 3), (-1, 3), ("-25%", 3),
                   ("2<75%", 3), ("9<75%", 4), ("2<50% 3<75%", 3)):
        got = _ids(r.search_dsl_df(
            {"bool": {"should": clauses, "minimum_should_match": msm}},
            k=None))
        assert got == hits(allids, n), (msm, n)
    # match leaf percentage: 3 tokens, 67% -> 2 required
    got = _ids(r.search_dsl_df(
        {"match": {"content": {"query": "merge buffer stream",
                               "minimum_should_match": "67%"}}}, k=None))
    want = {i for i in allids if sum(i in s for s in sets[:3]) >= 2}
    assert got == want
    with pytest.raises(ValueError, match="bad minimum_should_match"):
        r.search_dsl_df({"bool": {"should": clauses,
                                  "minimum_should_match": "x%"}}, k=3)


def test_span_via_dsl_both_spellings(spark, setup):
    d, r, _ = setup
    native = {
        "span_near": {
            "clauses": [{"span_term": "merge"}, {"span_term": "buffer"}],
            "slop": 2,
            "in_order": True,
        }
    }
    es_style = {
        "span_near": {
            "clauses": [
                {"span_term": {"content": "merge"}},
                {"span_term": {"content": "buffer"}},
            ],
            "slop": 2,
            "in_order": True,
        }
    }
    a = _scores(r.search_dsl_df(native, k=None))
    b = _scores(r.search_dsl_df(es_style, k=None))
    assert a == b and a
    assert a == _scores(
        r.search_span_df(
            {
                "span_near": {
                    "clauses": [{"span_term": "merge"}, {"span_term": "buffer"}],
                    "slop": 2,
                    "in_order": True,
                }
            },
            k=None,
        )
    )


def test_envelope_and_errors(spark, setup):
    d, r, _ = setup
    # full request-body envelope accepted
    got = _ids(r.search_dsl_df({"query": {"match": {"content": "merge"}}}, k=None))
    assert got == _ids(r.match_df("merge"))
    with pytest.raises(ValueError, match="unsupported query kind"):
        r.search_dsl_df({"knn_banana": {}})
    with pytest.raises(ValueError, match="plain corpus"):
        r.search_dsl_df({"match": {"title": "x"}})
    with pytest.raises(ValueError, match="positive clause"):
        r.search_dsl_df({"bool": {"must_not": [{"match": {"content": "x"}}]}})
    with pytest.raises(ValueError, match="metadata column"):
        r.search_dsl_df({"range": {"content": {"gte": 1}}})


def test_geo_distance_dsl(spark, setup):
    """geo leafs compile to the same haversine filter-context SQL the
    typed geo path uses (corpus lacks lat/lon -> synthesize via dl as a
    fake coordinate is wrong; instead just assert the clean error)."""
    d, r, _ = setup
    with pytest.raises(Exception):
        # synthetic corpus docs carry no lat/lon columns -> the filter
        # SQL must fail loudly, not silently match nothing
        r.search_dsl_df(
            {"geo_distance": {"distance_km": 5, "lat": 0.0, "lon": 0.0}},
            k=None,
        ).collect()


def test_dsl_live_twin_and_k_cut(spark, setup):
    d, r, _ = setup
    ri = IncrementalIndexReader(spark, d)
    body = {
        "bool": {
            "must": [{"match": {"content": "merge"}}],
            "should": [
                {"match_phrase": {"content": "merge buffer"}},
                {"rank_feature": {"field": "dl", "saturation": {"pivot": 120}}},
            ],
        }
    }
    base = r.search_dsl_df(body, k=10).collect()
    live = ri.search_dsl_df(body, k=10).collect()
    assert [(x["doc_id"], round(x["score"], 9)) for x in live] == [
        (x["doc_id"], round(x["score"], 9)) for x in base
    ]
    assert len(base) == 10
    # k cut is ordered by score desc
    scores = [x["score"] for x in base]
    assert scores == sorted(scores, reverse=True)


def test_dsl_fields_corpus_routing(spark, tmp_path):
    idx = str(tmp_path / "idx")
    rows = [
        ("r", "0", "c", "t", "spark engine", "a long body about other things"),
        ("r", "1", "c", "t", "unrelated title", "spark spark spark body text"),
        ("r", "2", "c", "t", "engine room", "machinery and boilers"),
    ]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    IndexBuilder(spark, idx, partitions=2, fields=["title", "body"]).build(
        df, resume=False
    )
    r = IndexReader(spark, idx)
    paths = {
        x["doc_id"]: x["path"]
        for x in spark.read.parquet(f"{idx}/docs").collect()
    }
    # match routes to ONE field
    got = {paths[i] for i in _ids(r.search_dsl_df({"match": {"title": "spark"}}, k=None))}
    assert got == {"0"}
    got = {paths[i] for i in _ids(r.search_dsl_df({"match": {"body": "spark"}}, k=None))}
    assert got == {"1"}
    # term namespaces into the field
    got = {paths[i] for i in _ids(r.search_dsl_df({"term": {"title": "engine"}}, k=None))}
    assert got == {"0", "2"}
    # bool across fields composes
    body = {
        "bool": {
            "must": [{"match": {"title": "engine"}}],
            "must_not": [{"match": {"body": "boilers"}}],
        }
    }
    got = {paths[i] for i in _ids(r.search_dsl_df(body, k=None))}
    assert got == {"0"}
    # multi_match with per-field boosts
    got = _scores(r.search_dsl_df(
        {"multi_match": {"query": "spark", "fields": ["title^2", "body"]}}, k=None
    ))
    want = _scores(r.multi_match_df("spark", boosts={"title": 2.0, "body": 1.0}, k=None))
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # wildcard / prefix namespace into the field (regression: bare
    # str.split() treats the \x1f namespace separator as whitespace and
    # shredded fields-corpus wildcard patterns into two dead tokens)
    got = {paths[i] for i in _ids(
        r.search_dsl_df({"wildcard": {"title": {"value": "eng*"}}}, k=None))}
    assert got == {"0", "2"}
    got = {paths[i] for i in _ids(
        r.search_dsl_df({"wildcard": {"body": {"value": "boil*s"}}}, k=None))}
    assert got == {"2"}
    got = {paths[i] for i in _ids(
        r.search_dsl_df({"prefix": {"title": {"value": "spa"}}}, k=None))}
    assert got == {"0"}
    # live twin of the fields wildcard
    live = IncrementalIndexReader(spark, idx)
    got = {paths[i] for i in {
        x["doc_id"] for x in live.search_dsl_df(
            {"wildcard": {"title": {"value": "eng*"}}}, k=None).collect()}}
    assert got == {"0", "2"}
    # more_like_this namespaces like-tokens per field on a fields corpus
    # (regression: raw tokens matched nothing in the namespaced dict);
    # list-of-texts concatenates, field scoping restricts, doc refs err
    got = {paths[i] for i in _ids(r.search_dsl_df(
        {"more_like_this": {"like": ["spark engine"], "min_term_freq": 1,
                            "min_doc_freq": 1}}, k=None))}
    assert got == {"0", "1", "2"}
    got = {paths[i] for i in _ids(r.search_dsl_df(
        {"more_like_this": {"fields": ["body"], "like": "spark engine",
                            "min_term_freq": 1, "min_doc_freq": 1}},
        k=None))}
    assert got == {"1"}
    with pytest.raises(ValueError, match="doc references"):
        r.search_dsl_df({"more_like_this": {"like": [{"_id": "1"}],
                                            "min_term_freq": 1}}, k=3)
    with pytest.raises(ValueError, match="unknown MLT fields"):
        r.search_dsl_df({"more_like_this": {"fields": ["nope"],
                                            "like": "spark",
                                            "min_term_freq": 1,
                                            "min_doc_freq": 1}}, k=3)
    # unknown field rejected
    with pytest.raises(ValueError, match="unknown field"):
        r.search_dsl_df({"match": {"nope": "x"}})


def test_intervals_all_of_any_of_compile_to_spans(spark, setup):
    """intervals all_of/any_of compile onto the span algebra: any_of ==
    union of its alternatives; all_of ordered slop-0 over single terms ==
    the flat match rule; nested trees equal the directly-spelled span
    query."""
    d, r, docs = setup
    # any_of == union of the two matches (scores: disjunctive BM25 of
    # the scoring leafs -- compare SETS here, score contract is span's)
    a = _ids(r.search_dsl_df(
        {"intervals": {"content": {"any_of": {"intervals": [
            {"match": {"query": "merge"}},
            {"match": {"query": "buffer"}},
        ]}}}}, k=None))
    assert a == _ids(r.match_df("merge buffer", min_should_match=1))
    # all_of over single-term matches == the flat ordered match rule
    b = _ids(r.search_dsl_df(
        {"intervals": {"content": {"all_of": {"intervals": [
            {"match": {"query": "merge"}},
            {"match": {"query": "buffer"}},
        ], "max_gaps": 3, "ordered": True}}}}, k=None))
    assert b == _ids(r.search_intervals_df(
        "merge buffer", max_gaps=3, ordered=True, k=None))
    # nested tree == the equivalent span query through the DSL
    nested = {"intervals": {"content": {"all_of": {"intervals": [
        {"match": {"query": "merge"}},
        {"any_of": {"intervals": [
            {"match": {"query": "buffer"}},
            {"match": {"query": "sort"}},
        ]}},
    ], "max_gaps": 2, "ordered": True}}}}
    spans = {"span_near": {"clauses": [
        {"span_term": {"content": {"query": "merge"}}},
        {"span_or": {"clauses": [
            {"span_term": {"content": {"query": "buffer"}}},
            {"span_term": {"content": {"query": "sort"}}},
        ]}},
    ], "slop": 2, "in_order": True}}
    assert _scores(r.search_dsl_df(nested, k=None)) == _scores(
        r.search_dsl_df(spans, k=None))
    with pytest.raises(ValueError, match="match, all_of, any_of"):
        r.search_dsl_df(
            {"intervals": {"content": {"prefix": {"prefix": "mer"}}}}, k=None)


def test_match_none_and_script_query(spark, setup):
    d, r, docs = setup
    # match_none: the empty match set, usable inside compositions
    assert _ids(r.search_dsl_df({"match_none": {}}, k=None)) == set()
    body = {"bool": {"should": [
        {"match": {"content": "merge"}}, {"match_none": {}},
    ]}}
    assert _scores(r.search_dsl_df(body, k=None)) == _scores(
        r.search_dsl_df({"match": {"content": "merge"}}, k=None))
    # script query: filter-context Spark SQL predicate over docs metadata
    got = _ids(r.search_dsl_df(
        {"script": {"script": {"source": "lang = 'java'"}}}, k=None))
    want = {i for i, x in docs.items() if x["lang"] == "java"}
    assert got == want
    sc = _scores(r.search_dsl_df(
        {"script": {"script": {"source": "lang = 'java'"}, "boost": 2.5}},
        k=None))
    assert set(sc.values()) == {2.5}
    with pytest.raises(ValueError, match="script query wants"):
        r.search_dsl_df({"script": {}}, k=None)


def test_match_phrase_prefix_leaf(spark, setup):
    """match_phrase_prefix == the ordered span gate with a span_multi
    prefix tail: match SET equals the dedicated search_phrase_prefix
    kernel's, and equals the span query spelled directly."""
    d, r, docs = setup
    body = {"match_phrase_prefix": {"content": "merge buf"}}
    got = _ids(r.search_dsl_df(body, k=None))
    want = {i for i, _ in r.search_phrase_prefix("merge buf", k=10_000, limit=50)}
    assert got == want and got
    spans = r.search_span_df(
        {"span_near": {"clauses": [
            {"span_term": "merge"},
            {"span_multi": {"match": {"prefix": {"value": "buf"}},
                            "max_expansions": 50}},
        ], "slop": 0, "in_order": True}}, k=None)
    assert _scores(r.search_dsl_df(body, k=None)) == _scores(spans)
    # single-token form degrades to the bare prefix-in-span-position
    # (equal expansion caps -> equal match sets)
    one = _ids(r.search_dsl_df(
        {"match_phrase_prefix": {"content": {"query": "buf",
                                             "max_expansions": 1000}}},
        k=None))
    assert one == _ids(r.search_dsl_df(
        {"prefix": {"content": {"query": "buf", "rewrite_limit": 1000}}},
        k=None))


def test_combined_fields_leaf(spark, tmp_path):
    idx = str(tmp_path / "idx")
    rows = [
        ("r", "0", "c", "t", "spark engine", "a long body about other things"),
        ("r", "1", "c", "t", "unrelated title", "spark spark spark body text"),
        ("r", "2", "c", "t", "engine room", "machinery and boilers"),
    ]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    IndexBuilder(spark, idx, partitions=2, fields=["title", "body"]).build(
        df, resume=False
    )
    r = IndexReader(spark, idx)
    got = _scores(r.search_dsl_df(
        {"combined_fields": {"query": "spark engine",
                             "fields": ["title^2", "body"]}}, k=None))
    want = _scores(r.search_combined_df(
        "spark engine", boosts={"title": 2.0, "body": 1.0}, k=None))
    assert got.keys() == want.keys() and got
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # operator and -> every token must land
    both = _ids(r.search_dsl_df(
        {"combined_fields": {"query": "spark engine", "operator": "and",
                             "fields": ["title", "body"]}}, k=None))
    assert both == _ids(r.search_combined_df(
        "spark engine", k=None, min_should_match=2))
    with pytest.raises(ValueError, match="unknown field"):
        r.search_dsl_df(
            {"combined_fields": {"query": "x", "fields": ["nope"]}}, k=None)


def test_collapse_field(spark, setup):
    """ES field collapsing: one hit per collapse-key value — the
    best-scoring doc per key; collapse_count = group size."""
    d, r, docs = setup
    body = {"query": {"match": {"content": "merge buffer"}},
            "collapse": {"field": "lang"}}
    out = r.search_dsl_df(body, k=None).collect()
    scores = _scores(r.search_dsl_df({"match": {"content": "merge buffer"}}, k=None))
    # hand-collapse: best (score desc, doc_id asc) per lang
    best, counts = {}, {}
    for i, s in scores.items():
        lg = docs[i]["lang"]
        counts[lg] = counts.get(lg, 0) + 1
        if lg not in best or (s, -i) > (best[lg][1], -best[lg][0]):
            best[lg] = (i, s)
    assert {x["lang"]: x["doc_id"] for x in out} == {
        lg: i for lg, (i, _) in best.items()}
    assert {x["lang"]: x["collapse_count"] for x in out} == counts
    # k cuts AFTER collapsing, ordered by score
    top2 = r.search_dsl_df(body, k=2).collect()
    want2 = sorted(((s, -i) for i, s in
                    ((i, s) for i, s in best.values())), reverse=True)[:2]
    assert [x["doc_id"] for x in top2] == [-ni for _, ni in want2]
    with pytest.raises(ValueError, match="collapse"):
        r.search_dsl_df({"query": {"match_all": {}},
                         "collapse": {"field": "nope"}}, k=None)


def test_runtime_mappings(spark, setup):
    """ES runtime fields (runtime-search-request.html): query-time
    computed columns over docs metadata — usable in filter-context
    leaves, collapse, aggs bucket keys; shadowing a mapped column."""
    d, r, docs = setup
    rm = {
        "path_depth": {
            "type": "long",
            "script": {"source": "size(split(path, '/')) - 1"},
        },
        "is_java": "lang = 'java'",  # shorthand spelling
    }
    depth = {i: x["path"].count("/") for i, x in docs.items()}

    # term leaf on a runtime boolean field
    out = _ids(r.search_dsl_df(
        {"query": {"term": {"is_java": True}}, "runtime_mappings": rm},
        k=None,
    ))
    assert out == {i for i, x in docs.items() if x["lang"] == "java"}

    # range leaf on a runtime long field, composed in a bool with a
    # scoring match clause
    base = _ids(r.search_dsl_df({"match": {"content": "merge buffer"}}, k=None))
    thr = sorted(depth[i] for i in base)[len(base) // 2]  # median: both sides
    body = {
        "query": {"bool": {
            "must": [{"match": {"content": "merge buffer"}}],
            "filter": [{"range": {"path_depth": {"gte": thr}}}],
        }},
        "runtime_mappings": rm,
    }
    got = _ids(r.search_dsl_df(body, k=None))
    assert got == {i for i in base if depth[i] >= thr}
    assert got  # non-degenerate

    # collapse on a runtime field
    col = r.search_dsl_df(
        {"query": {"match": {"content": "merge buffer"}},
         "collapse": {"field": "is_java"},
         "runtime_mappings": rm},
        k=None,
    ).collect()
    assert {bool(x["is_java"]) for x in col} <= {True, False}
    assert sum(x["collapse_count"] for x in col) == len(base)

    # aggs bucket key on a runtime field (both tiers share the compiler)
    agg = {x["path_depth"]: x["path_depth_doc_count"]
           for x in r.aggs_dsl_df(
               {"path_depth": {"terms": {"field": "path_depth",
                                         "size": 100}}},
               runtime_mappings=rm,
           ).collect()}
    want = collections.Counter(depth.values())
    assert agg == dict(want)

    # shadowing: a runtime field named like a mapped column wins
    sh = r.search_dsl_df(
        {"query": {"term": {"lang": "JAVA"}},
         "runtime_mappings": {"lang": "upper(lang)"}},
        k=None,
    )
    assert _ids(sh) == {i for i, x in docs.items() if x["lang"] == "java"}

    # unknown runtime type errors
    with pytest.raises(ValueError, match="runtime field type"):
        r.search_dsl_df(
            {"query": {"match_all": {}},
             "runtime_mappings": {"x": {"type": "geo_shape",
                                        "script": {"source": "1"}}}},
            k=None,
        )


def test_profile_dsl(spark, setup):
    """ES profile analogue: dispatch tree mirrors _compile's tables, the
    physical plan is the compiled DataFrame's own explain, hits are
    rank-identical to search_dsl_df."""
    d, r, docs = setup
    body = {"query": {"bool": {
        "must": [{"match": {"content": "merge buffer"}}],
        "should": [{"constant_score": {
            "filter": {"term": {"lang": "java"}}, "boost": 0.5}}],
        "must_not": [{"wildcard": {"content": "zz*"}}],
    }}}
    p = r.profile_dsl(body, k=7)
    t = p["query_tree"]
    assert t["type"] == "bool" and t["surface"] == "_compound_bool"
    kinds = [c["type"] for c in t["children"]]
    assert kinds == ["match", "constant_score", "wildcard"]
    cs = t["children"][1]
    assert cs["children"][0]["type"] == "term"
    assert "Exchange" in p["physical_plan"] or "Scan" in p["physical_plan"]
    want = [(x["doc_id"], x["score"])
            for x in r.search_dsl_df(body, k=7).collect()]
    got = [(x["doc_id"], x["score"]) for x in p["hits"].collect()]
    assert got == want

    # retriever tree shape; unsupported kind fails like search
    rt = r.profile_dsl({"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"content": "merge"}}}},
        {"standard": {"query": {"match": {"content": "buffer"}}}},
    ], "rank_constant": 60}}}, k=3)
    assert rt["query_tree"]["type"] == "rrf"
    assert len(rt["query_tree"]["children"]) == 2
    with pytest.raises(ValueError, match="unsupported query kind"):
        r.profile_dsl({"query": {"nope": {}}})

    # live tier: the multi-segment plan profiles through the same path
    live = IncrementalIndexReader(spark, d)
    lp = live.profile_dsl({"match": {"content": "merge buffer"}}, k=3)
    assert lp["query_tree"]["surface"] == "_leaf_match"
    assert [x["doc_id"] for x in lp["hits"].collect()] == [
        x["doc_id"] for x in live.search_dsl_df(
            {"match": {"content": "merge buffer"}}, k=3).collect()]


def test_body_sort_from_size(spark, setup):
    """ES request-body sort / from / size: field sort with tie-break,
    _score entries, script sort, missing placement, size overriding k,
    from offsetting after the global order, runtime-field sort."""
    d, r, docs = setup
    base = {"match": {"content": "merge buffer"}}
    m = _scores(r.search_dsl_df(base, k=None))

    # sort by dl desc, doc_id tie-break; size wins over k
    out = r.search_dsl_df(
        {"query": base, "sort": [{"dl": "desc"}], "size": 5}, k=99
    ).collect()
    want = sorted(m, key=lambda i: (-docs[i]["dl"], i))[:5]
    assert [x["doc_id"] for x in out] == want
    assert [x["dl"] for x in out] == [docs[i]["dl"] for i in want]

    # from: page 2 continues exactly where page 1 ended
    all10 = sorted(m, key=lambda i: (-docs[i]["dl"], i))[:10]
    page2 = r.search_dsl_df(
        {"query": base, "sort": [{"dl": "desc"}], "from": 5, "size": 5}
    ).collect()
    assert [x["doc_id"] for x in page2] == all10[5:]

    # multi-key: lang asc then _score desc
    out = r.search_dsl_df(
        {"query": base, "sort": [{"lang": "asc"}, "_score"], "size": 8}
    ).collect()
    want = sorted(m, key=lambda i: (docs[i]["lang"], -m[i], i))[:8]
    assert [x["doc_id"] for x in out] == want

    # script sort (expression over docs metadata) comes back as sort_0
    out = r.search_dsl_df(
        {"query": base, "sort": [{"dl % 7": "asc"}], "size": 6}
    ).collect()
    want = sorted(m, key=lambda i: (docs[i]["dl"] % 7, i))[:6]
    assert [x["doc_id"] for x in out] == want
    assert [x["sort_0"] for x in out] == [docs[i]["dl"] % 7 for i in want]

    # runtime field as the sort key
    out = r.search_dsl_df(
        {"query": base, "sort": [{"neg_dl": "asc"}], "size": 4,
         "runtime_mappings": {"neg_dl": "-dl"}}
    ).collect()
    assert [x["doc_id"] for x in out] == sorted(
        m, key=lambda i: (-docs[i]["dl"], i))[:4]

    # unknown bare column errors; live tier twin agrees
    with pytest.raises(ValueError, match="unknown sort field"):
        r.search_dsl_df({"query": base, "sort": ["nope"], "size": 3})
    live = IncrementalIndexReader(spark, d)
    lout = live.search_dsl_df(
        {"query": base, "sort": [{"dl": "desc"}], "size": 5})
    assert [x["doc_id"] for x in lout.collect()] == [
        x["doc_id"] for x in r.search_dsl_df(
            {"query": base, "sort": [{"dl": "desc"}], "size": 5}).collect()]


def test_body_fields_source(spark, setup):
    """ES response shaping in the body: `fields` / `_source` enrich the
    ranked page with docs metadata (runtime fields included), ranking
    preserved; unknown fields error."""
    d, r, docs = setup
    base = {"match": {"content": "merge buffer"}}
    want = [x["doc_id"] for x in r.search_dsl_df(base, k=5).collect()]

    out = r.search_dsl_df({"query": base, "fields": ["lang", "dl"], "size": 5})
    rows = out.collect()
    assert [x["doc_id"] for x in rows] == want
    assert all(x["lang"] == docs[x["doc_id"]]["lang"] and
               x["dl"] == docs[x["doc_id"]]["dl"] for x in rows)

    # ES {"field": name} objects; _source: true = all metadata columns
    rows = r.search_dsl_df(
        {"query": base, "fields": [{"field": "repo"}], "size": 3}).collect()
    assert all(x["repo"] == docs[x["doc_id"]]["repo"] for x in rows)
    allcols = r.search_dsl_df({"query": base, "_source": True, "size": 2})
    for c in ("repo", "path", "lang", "dl"):
        assert c in allcols.columns
    # runtime field in the response
    rows = r.search_dsl_df(
        {"query": base, "fields": ["dl2"], "size": 3,
         "runtime_mappings": {"dl2": "dl * 2"}}).collect()
    assert all(x["dl2"] == 2 * docs[x["doc_id"]]["dl"] for x in rows)
    # composes with sort+from; unknown field errors
    rows = r.search_dsl_df(
        {"query": base, "sort": [{"dl": "desc"}], "from": 1, "size": 2,
         "fields": ["lang"]}).collect()
    m = _ids(r.search_dsl_df(base, k=None))
    wantp = sorted(m, key=lambda i: (-docs[i]["dl"], i))[1:3]
    assert [x["doc_id"] for x in rows] == wantp
    with pytest.raises(ValueError, match="unknown fields"):
        r.search_dsl_df({"query": base, "fields": ["nope"], "size": 2})


def test_body_docvalue_and_script_fields(spark, setup):
    """ES `docvalue_fields` (columnar-values twin of `fields` — same
    enrichment join here) and `script_fields` (per-hit computed columns,
    Spark-SQL script dialect, `_score` addressable), composing with
    fields/sort, ranking preserved; malformed script_fields error."""
    d, r, docs = setup
    base = {"match": {"content": "merge buffer"}}
    want = [x["doc_id"] for x in r.search_dsl_df(base, k=5).collect()]

    # docvalue_fields: bare names and {"field": name, "format": ...}
    rows = r.search_dsl_df(
        {"query": base, "size": 5,
         "docvalue_fields": ["lang", {"field": "dl", "format": "int"}]}
    ).collect()
    assert [x["doc_id"] for x in rows] == want
    assert all(x["lang"] == docs[x["doc_id"]]["lang"] and
               x["dl"] == docs[x["doc_id"]]["dl"] for x in rows)

    # script_fields: computed from docs columns and _score
    rows = r.search_dsl_df(
        {"query": base, "size": 5,
         "script_fields": {
             "dl_sq": {"script": {"source": "dl * dl"}},
             "boosted": {"script": "_score * 10"},
         }}
    ).collect()
    assert [x["doc_id"] for x in rows] == want
    for x in rows:
        assert x["dl_sq"] == docs[x["doc_id"]]["dl"] ** 2
        assert x["boosted"] == pytest.approx(10 * x["score"])
    # scripts do NOT leak the joined metadata columns
    assert "lang" not in {f for f in rows[0].asDict()}

    # all three shaping sections compose; unknown docvalue field errors
    rows = r.search_dsl_df(
        {"query": base, "size": 3, "fields": ["repo"],
         "docvalue_fields": ["lang"],
         "script_fields": {"tag": {"script": "concat(repo, ':', lang)"}}}
    ).collect()
    assert all(x["tag"] == f"{x['repo']}:{x['lang']}" for x in rows)
    with pytest.raises(ValueError, match="unknown fields"):
        r.search_dsl_df(
            {"query": base, "docvalue_fields": ["nope"], "size": 2})
    with pytest.raises(ValueError, match="script_fields wants"):
        r.search_dsl_df({"query": base, "script_fields": [], "size": 2})
    # k=None unranked match set also shapes
    out = r.search_dsl_df(
        {"query": base, "script_fields": {"d2": {"script": "dl + 1"}}},
        k=None,
    )
    assert "d2" in out.columns and out.count() == len(_ids(
        r.search_dsl_df(base, k=None)))


def test_body_rescore(spark, setup):
    """ES request-body rescore: window re-rank with any rescore query,
    the five score modes, weights, miss-keeps-query-score, and
    sequential rescorer lists."""
    d, r, docs = setup
    base = {"match": {"content": "merge"}}
    m = _scores(r.search_dsl_df(base, k=None))
    ph = _scores(r.search_dsl_df(
        {"match_phrase": {"content": "merge buffer"}}, k=None))
    win = sorted(m, key=lambda i: (-m[i], i))[:20]

    def combined(i, wq, wr, mode):
        q = wq * m[i]
        if i not in ph:
            return q
        rr = wr * ph[i]
        return {"total": q + rr, "multiply": q * rr, "avg": (q + rr) / 2,
                "max": max(q, rr), "min": min(q, rr)}[mode]

    for mode in ("total", "multiply", "avg", "max", "min"):
        body = {"query": base, "rescore": {
            "window_size": 20,
            "query": {"rescore_query":
                      {"match_phrase": {"content": "merge buffer"}},
                      "query_weight": 0.7, "rescore_query_weight": 1.2,
                      "score_mode": mode}}}
        got = _scores(r.search_dsl_df(body, k=None))
        assert set(got) == set(win), mode
        for i in win:
            assert got[i] == pytest.approx(
                combined(i, 0.7, 1.2, mode), rel=1e-12), mode

    # sequential rescorers: second pass windows the FIRST pass's scores
    body = {"query": base, "rescore": [
        {"window_size": 20, "query": {
            "rescore_query": {"match_phrase": {"content": "merge buffer"}}}},
        {"window_size": 5, "query": {
            "rescore_query": {"term": {"lang": "java"}},
            "rescore_query_weight": 10.0}},
    ]}
    got = _scores(r.search_dsl_df(body, k=None))
    s1 = {i: combined(i, 1.0, 1.0, "total") for i in win}
    w2 = sorted(s1, key=lambda i: (-s1[i], i))[:5]
    assert set(got) == set(w2)
    for i in w2:
        want = s1[i] + (10.0 if docs[i]["lang"] == "java" else 0.0)
        assert got[i] == pytest.approx(want, rel=1e-12)

    with pytest.raises(ValueError, match="score_mode"):
        r.search_dsl_df({"query": base, "rescore": {
            "window_size": 5,
            "query": {"rescore_query": base, "score_mode": "sum"}}})
    # live twin
    live = IncrementalIndexReader(spark, d)
    lb = {"query": base, "rescore": {"window_size": 10, "query": {
        "rescore_query": {"match_phrase": {"content": "merge buffer"}}}}}
    got = {x["doc_id"]: x["score"] for x in live.search_dsl_df(lb, k=5).collect()}
    wantw = sorted(m, key=lambda i: (-m[i], i))[:10]
    s = {i: combined(i, 1.0, 1.0, "total") for i in wantw}
    want = dict(sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_post_filter_min_score_search_request(spark, setup):
    """ES post_filter (hits narrowed, aggs NOT), min_score floor, and the
    full _search response shape (hits + aggregations from one body)."""
    d, r, docs = setup
    base = {"match": {"content": "merge buffer"}}
    m = _scores(r.search_dsl_df(base, k=None))

    # min_score floors the hit set
    floor = sorted(m.values())[len(m) // 2]
    got = _ids(r.search_dsl_df({"query": base, "min_score": floor}, k=None))
    assert got == {i for i, s in m.items() if s >= floor} and got

    # post_filter narrows hits, scores unchanged
    got = _scores(r.search_dsl_df(
        {"query": base, "post_filter": {"term": {"lang": "java"}}}, k=None))
    assert set(got) == {i for i in m if docs[i]["lang"] == "java"}
    for i in got:
        assert got[i] == pytest.approx(m[i], rel=1e-12)

    # search_request: hits honor post_filter, aggregations do NOT
    res = r.search_request({
        "query": base,
        "post_filter": {"term": {"lang": "java"}},
        "size": 5,
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}}},
    })
    hits = res["hits"].collect()
    assert all(docs[x["doc_id"]]["lang"] == "java" for x in hits)
    agg = {x["by_lang"]: x["by_lang_doc_count"]
           for x in res["aggregations"].collect()}
    want = collections.Counter(docs[i]["lang"] for i in m)
    assert agg == dict(want)  # full match set, not the filtered hits

    # aggs-only request: size 0, stable hit schema, aggs over match_all
    res = r.search_request({
        "size": 0,
        "aggs": {"langs": {"terms": {"field": "lang", "size": 10}}},
    })
    assert res["hits"].count() == 0
    assert "score" in res["hits"].columns
    agg = {x["langs"]: x["langs_doc_count"]
           for x in res["aggregations"].collect()}
    assert agg == dict(collections.Counter(v["lang"] for v in docs.values()))


def test_aggs_body_guard(spark, setup):
    """search_dsl_df rejects an aggs body with a pointer to
    search_request; profile_dsl profiles the query side of one."""
    d, r, docs = setup
    body = {"query": {"match": {"content": "merge"}},
            "aggs": {"l": {"terms": {"field": "lang"}}}}
    with pytest.raises(ValueError, match="search_request"):
        r.search_dsl_df(body)
    p = r.profile_dsl(body, k=3)
    assert p["query_tree"]["type"] == "match"
    assert p["hits"].count() == 3


def test_sort_collapse_interplay_and_guards(spark, setup):
    """Sort on a column the collapsed output already carries (the
    collapse field, collapse_count) joins nothing twice; duplicate sort
    fields don't crash; unknown body sections name themselves."""
    d, r, docs = setup
    base = {"match": {"content": "merge buffer"}}
    out = r.search_dsl_df({
        "query": base, "collapse": {"field": "lang"},
        "sort": [{"collapse_count": "desc"}, {"lang": "asc"}], "size": 10,
    }).collect()
    pairs = [(x["collapse_count"], x["lang"]) for x in out]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    # duplicate field in the sort spec
    out2 = r.search_dsl_df(
        {"query": base, "sort": [{"dl": "desc"}, {"dl": "asc"}], "size": 5})
    dls = [x["dl"] for x in out2.collect()]
    assert dls == sorted(dls, reverse=True)
    with pytest.raises(ValueError, match="unsupported request-body sections"):
        r.search_dsl_df({"query": base, "suggest": {"s": {}}})


def test_collapse_head_by_sort(spark, setup):
    """ES field collapsing with a `sort` section selects each group's
    head by the SEARCH SORT, not by score (ADVICE r4)."""
    d, r, docs = setup
    base = {"match": {"content": "merge buffer"}}
    out = r.search_dsl_df({
        "query": base, "collapse": {"field": "lang"},
        "sort": [{"dl": "desc"}], "size": 50,
    }).collect()
    # brute force: per lang, the matching doc with the largest dl
    match = {x["doc_id"] for x in r.search_dsl_df({"query": base}, k=None).collect()}
    groups = {}
    for did in match:
        groups.setdefault(docs[did]["lang"], []).append(did)
    want = {
        lang: max(ids, key=lambda i: (docs[i]["dl"], -i))
        for lang, ids in groups.items()
    }
    got = {x["lang"]: x["doc_id"] for x in out}
    assert got == want
    # hits themselves come back in the sort order
    dls = [x["dl"] for x in out]
    assert dls == sorted(dls, reverse=True)
    # group sizes intact
    assert {x["lang"]: x["collapse_count"] for x in out} == {
        lang: len(ids) for lang, ids in groups.items()
    }


def test_collapse_inner_hits_and_id_sort(spark, setup):
    """collapse.inner_hits returns each group's top-N members (ordered
    like the head selection) as an array column; `_id` / `_doc` sort
    entries map to the monotone internal doc id."""
    d, r, docs = setup
    base = {"match": {"content": "merge"}}
    m = _scores(r.search_dsl_df(base, k=None))
    out = r.search_dsl_df(
        {"query": base,
         "collapse": {"field": "lang",
                      "inner_hits": {"name": "members", "size": 2}},
         "size": 10},
    ).collect()
    per = {}
    for i, s in m.items():
        per.setdefault(docs[i]["lang"], []).append((i, s))
    for row in out:
        want = sorted(per[row["lang"]], key=lambda t: (-t[1], t[0]))[:2]
        got = [(x["doc_id"], x["score"]) for x in row["members"]]
        assert got == want
        assert row["doc_id"] == want[0][0]
        # member order column is the rank
        assert [x["_rn"] for x in row["members"]] == list(
            range(1, len(want) + 1))
    # head-by-sort path carries inner_hits too
    out2 = r.search_dsl_df(
        {"query": base, "sort": [{"dl": "desc"}],
         "collapse": {"field": "lang",
                      "inner_hits": {"name": "members", "size": 2}},
         "size": 10},
    ).collect()
    for row in out2:
        ids = [x["doc_id"] for x in row["members"]]
        want = sorted(
            (i for i, _ in per[row["lang"]]),
            key=lambda i: (-docs[i]["dl"], i),
        )[:2]
        assert ids == want and row["doc_id"] == want[0]
    with pytest.raises(ValueError, match="unsupported inner_hits"):
        r.search_dsl_df(
            {"query": base,
             "collapse": {"field": "lang",
                          "inner_hits": {"sort": [{"dl": "asc"}]}}},
            k=3)
    # _id / _doc sorts
    ids_sorted = sorted(m)
    got = [x["doc_id"] for x in r.search_dsl_df(
        {"query": base, "sort": [{"_id": "asc"}], "size": 5}).collect()]
    assert got == ids_sorted[:5]
    got = [x["doc_id"] for x in r.search_dsl_df(
        {"query": base, "sort": ["_doc"], "size": 5}).collect()]
    assert got == ids_sorted[:5]


def test_rescore_sort_rejected(spark, setup):
    """ES rejects rescore combined with a sort other than _score
    (ADVICE r4); a bare _score sort stays allowed."""
    d, r, docs = setup
    body = {
        "query": {"match": {"content": "merge buffer"}},
        "rescore": {"window_size": 10, "query": {
            "rescore_query": {"match": {"content": "stream"}}}},
    }
    with pytest.raises(ValueError, match="rescore.*sort"):
        r.search_dsl_df({**body, "sort": [{"dl": "desc"}]})
    ok = r.search_dsl_df({**body, "sort": ["_score"], "size": 5})
    assert ok.count() > 0


def test_terms_set_missing_terms_rejected(spark, setup):
    """A terms_set body without 'terms' must error, not silently query
    the literal string 'None' (ADVICE r4)."""
    d, r, docs = setup
    with pytest.raises(ValueError, match="terms_set"):
        r.search_dsl_df({"terms_set": {"lang": {
            "minimum_should_match_field": "dl"}}})


def test_flat_bool_fast_path_parity(spark, setup):
    """The one-scan flat-bool kernel route is score-identical to the
    generic per-leaf compiler (forced via a no-op clause boost)."""
    d, r, docs = setup
    clauses = {
        "must": [{"match": {"content": "merge buffer"}}],
        "should": [{"match": {"content": "stream"}},
                   {"match": {"content": "segment index"}}],
        "must_not": [{"match": {"content": "error"}}],
    }
    fast = _scores(r.search_dsl_df({"bool": clauses}, k=None))
    slow_clauses = {
        "must": [{"match": {"content": {"query": "merge buffer",
                                        "boost": 1.0}}}],
        "should": clauses["should"],
        "must_not": clauses["must_not"],
    }
    slow = _scores(r.search_dsl_df({"bool": slow_clauses}, k=None))
    assert set(fast) == set(slow) and len(fast) > 0
    for did, s in slow.items():
        assert fast[did] == pytest.approx(s, rel=1e-9)
    # duplicate term across clauses must NOT take the kernel (it would
    # score the shared term once instead of twice)
    dup = {"must": [{"match": {"content": "merge"}}],
           "should": [{"match": {"content": "merge stream"}}]}
    sdup = _scores(r.search_dsl_df({"bool": dup}, k=None))
    sslow = _scores(r.search_dsl_df({"bool": {
        "must": [{"match": {"content": {"query": "merge", "boost": 1.0}}}],
        "should": dup["should"]}}, k=None))
    for did, s in sslow.items():
        assert sdup[did] == pytest.approx(s, rel=1e-9)
    # pure-should flat bool: >=1 clause qualifies (ES msm default)
    ps = _scores(r.search_dsl_df({"bool": {"should": clauses["should"]}},
                                 k=None))
    assert set(ps) == set(_scores(r.search_dsl_df(
        {"bool": {"should": [
            {"match": {"content": {"query": "stream", "boost": 1.0}}},
            {"match": {"content": "segment index"}}]}}, k=None)))


def test_body_search_after_pagination(spark, setup):
    """Request-body search_after: cursor pages equal the from-based
    pages on a unique sort key, tie-break cursor works on a non-unique
    key, and the guards fire."""
    d, r, docs = setup
    base = {"query": {"match": {"content": "merge buffer"}}}
    body = {**base, "sort": [{"dl": "desc"}], "size": 5}
    all_rows = r.search_dsl_df({**base, "sort": [{"dl": "desc"}],
                                "size": 10000}).collect()
    page1 = r.search_dsl_df(body).collect()
    assert [x["doc_id"] for x in page1] == [x["doc_id"] for x in all_rows[:5]]
    # dl is non-unique -> cursor carries (dl, doc_id) with the tie-break
    cur = [page1[-1]["dl"], page1[-1]["doc_id"]]
    page2 = r.search_dsl_df({**body, "search_after": cur}).collect()
    assert [x["doc_id"] for x in page2] == [
        x["doc_id"] for x in all_rows[5:10]
    ]
    # walk to exhaustion: union of pages == the full sorted set, no dups
    seen = [x["doc_id"] for x in page1]
    cur_rows = page2
    while cur_rows:
        seen.extend(x["doc_id"] for x in cur_rows)
        c = [cur_rows[-1]["dl"], cur_rows[-1]["doc_id"]]
        cur_rows = r.search_dsl_df({**body, "search_after": c}).collect()
    assert seen == [x["doc_id"] for x in all_rows]
    with pytest.raises(ValueError, match="requires a sort"):
        r.search_dsl_df({**base, "size": 5, "search_after": [1]})
    with pytest.raises(ValueError, match="from"):
        r.search_dsl_df({**body, "from": 5, "search_after": [1, 2]})
    with pytest.raises(ValueError, match="wants 1 values"):
        r.search_dsl_df({**body, "search_after": [1, 2, 3]})
    with pytest.raises(ValueError, match="collapse"):
        r.search_dsl_df({**body, "collapse": {"field": "lang"},
                         "search_after": [3.0]})


def test_match_bool_prefix(spark, setup):
    """match_bool_prefix == bool should of term clauses + a prefix on
    the last analyzed token."""
    d, r, docs = setup
    got = _scores(r.search_dsl_df(
        {"match_bool_prefix": {"content": "merge buf"}}, k=None))
    want = _scores(r.search_dsl_df(
        {"bool": {"should": [
            {"match": {"content": {"query": "merge", "boost": 1.0}}},
            {"prefix": {"content": {"query": "buf"}}}]}}, k=None))
    assert set(got) == set(want) and len(got) > 0
    for did, s in want.items():
        assert got[did] == pytest.approx(s, rel=1e-9)
    # the prefix leg really matches tokens beyond the literal 'buf'
    lit = _scores(r.search_dsl_df(
        {"bool": {"should": [{"match": {"content": "merge buf"}}]}}, k=None))
    assert set(got) - set(lit)
    with pytest.raises(ValueError, match="no tokens"):
        r.search_dsl_df({"match_bool_prefix": {"content": "..."}})
    # operator 'and': every clause must hit — a strict subset, identical
    # scores on the surviving docs, and equal to the typed surface
    got_and = _scores(r.search_dsl_df(
        {"match_bool_prefix":
            {"content": {"query": "merge buf", "operator": "and"}}},
        k=None))
    assert set(got_and) < set(got) and len(got_and) > 0
    typed_and = _scores(r.match_bool_prefix_df(
        "merge buf", k=None, operator="and"))
    assert got_and.keys() == typed_and.keys()
    for did, s in typed_and.items():
        assert got_and[did] == pytest.approx(s, rel=1e-9)


def test_body_search_after_live_tier_segment_cursor(spark, tmp_path):
    """Live tier: the body search_after cursor's tie-break is (segment,
    doc_id) — +2 values — because the tier's ordering is (segment
    recency-rank desc, doc_id asc). Sort-value ties that straddle base
    and delta must paginate with no loss and no duplication (regression:
    a bare doc_id tie-break dropped page-boundary rows)."""
    from elasticsearch_jdbc_spark.index import (
        IncrementalIndexReader,
        IndexBuilder,
        apply_incremental,
    )

    d = str(tmp_path / "sa_live")
    schema = (
        "repo string, path string, commit string, lang string,"
        " content string, grp long"
    )
    # every doc carries grp 0/1 -> massive sort ties across segments
    base = [("r", f"b{i}", "c", "t", "alpha beta", i % 2) for i in range(8)]
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(base, schema), resume=False
    )
    ops = spark.createDataFrame(
        [("r", f"d{i}", "c", "t", "alpha beta", i % 2, "index")
         for i in range(6)],
        schema + ", _optype string",
    )
    apply_incremental(spark, d, ops)
    r = IncrementalIndexReader(spark, d)
    body = {"query": {"match": {"content": "alpha"}},
            "sort": [{"grp": "asc"}], "size": 3}
    seen = []
    cursor = None
    for _ in range(10):
        b = dict(body)
        if cursor is not None:
            b["search_after"] = cursor
        page = r.search_dsl_df(b).collect()
        if not page:
            break
        live = {
            (x["segment"], x["doc_id"]): x["path"]
            for x in r.live_docs().select(
                "segment", "doc_id", "path").collect()
        }
        seen += [live[(x["segment"], x["doc_id"])] for x in page]
        last = page[-1]
        cursor = [last["grp"], last["segment"], last["doc_id"]]
    want = sorted(p for _, p, *_ in base) + [f"d{i}" for i in range(6)]
    assert sorted(seen) == sorted(want), "no loss, no duplication"
    assert len(seen) == 14
    # a bare +1 doc-id tie-break is rejected on the live tier
    with pytest.raises(ValueError, match=r"\+2"):
        r.search_dsl_df({**body, "search_after": [0, 3]})


def test_simple_query_string_quote_aware_rewrite(spark, tmp_path):
    """SQS operators inside a quoted phrase are literal (ES: analysis
    drops them) — the +/| infix rewrite must not corrupt the phrase
    with an AND/OR token."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    d = str(tmp_path / "sqs")
    docs = [
        ("r", "0", "c", "t", "fast key lookup path"),
        ("r", "1", "c", "t", "fast lane key lookup"),   # not adjacent
        ("r", "2", "c", "t", "slow key"),
    ]
    IndexBuilder(spark, d, partitions=1, with_positions=True).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    m = {x["doc_id"]: x["path"]
         for x in spark.read.parquet(f"{d}/docs").collect()}

    def paths(q):
        df = r.search_dsl_df({"simple_query_string": {"query": q}}, k=None)
        return sorted(m[x["doc_id"]] for x in df.collect())

    # in-phrase '+' is literal: the slop-0 phrase still matches doc 0
    assert paths('"fast + key"') == ["0"]
    assert paths('"fast key"') == ["0"]
    # standalone + OUTSIDE quotes still means AND
    assert paths("fast + key") == ["0", "1"]
    assert paths("slow | lane") == ["1", "2"]


def test_multi_match_operator_and(spark, tmp_path):
    """multi_match `operator: and` requires EVERY analyzed term to match
    (regression: the option was silently ignored -> OR semantics)."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    d = str(tmp_path / "mmop")
    docs = [
        ("r", "0", "c", "t", "merge segment", "x"),
        ("r", "1", "c", "t", "merge only", "x"),
        ("r", "2", "c", "t", "nothing here", "segment"),
    ]
    IndexBuilder(spark, d, partitions=1, fields=["content", "extra"]).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string, extra string",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    m = {x["doc_id"]: x["path"]
         for x in spark.read.parquet(f"{d}/docs").collect()}

    def paths(body):
        return sorted(
            m[x["doc_id"]]
            for x in r.search_dsl_df(body, k=None).collect()
        )

    # OR default: any term in any field
    assert paths({"multi_match": {"query": "merge segment"}}) == ["0", "1", "2"]
    # operator and: every term, each in SOME field (doc 2: segment via
    # `extra` only, no merge anywhere -> excluded; doc 1 lacks segment)
    assert paths({"multi_match": {"query": "merge segment",
                                  "operator": "and"}}) == ["0"]
    # explicit msm still wins over operator
    assert paths({"multi_match": {"query": "merge segment",
                                  "operator": "and",
                                  "minimum_should_match": 1}}) == ["0", "1", "2"]


def test_sqs_sign_attached_to_quote(spark, tmp_path):
    """A '+' attached directly to a quoted phrase ('+\"a b\"') must stay
    the parser's sign, not become AND glued onto the quote (regression
    from the quote-aware rewrite)."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    d = str(tmp_path / "sqsq")
    docs = [
        ("r", "0", "c", "t", "fast key merge"),
        ("r", "1", "c", "t", "fast merge"),
    ]
    IndexBuilder(spark, d, partitions=1, with_positions=True).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    m = {x["doc_id"]: x["path"]
         for x in spark.read.parquet(f"{d}/docs").collect()}

    def paths(q):
        df = r.search_dsl_df({"simple_query_string": {"query": q}}, k=None)
        return sorted(m[x["doc_id"]] for x in df.collect())

    assert paths('merge +"fast key"') == ["0"]
    assert paths('-"fast key" merge') == ["1"]
    # '|' attached to a quote is NOT a parser sign: it detaches as the
    # OR connective, keeping the phrase intact
    assert paths('merge |"fast key"') == ["0", "1"]


def test_operator_case_and_validation(spark, tmp_path):
    """`operator` is case-insensitive (ES Operator.fromString); unknown
    values are rejected instead of silently meaning OR."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    d = str(tmp_path / "opcase")
    IndexBuilder(spark, d, partitions=1).build(
        spark.createDataFrame(
            [("r", "0", "c", "t", "alpha beta"),
             ("r", "1", "c", "t", "alpha only")],
            "repo string, path string, commit string, lang string,"
            " content string",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    up = r.search_dsl_df(
        {"match": {"content": {"query": "alpha beta",
                               "operator": "AND"}}}, k=None).count()
    lo = r.search_dsl_df(
        {"match": {"content": {"query": "alpha beta",
                               "operator": "and"}}}, k=None).count()
    assert up == lo == 1
    with pytest.raises(ValueError, match="operator must be"):
        r.search_dsl_df({"match": {"content": {
            "query": "alpha", "operator": "banana"}}}, k=None)
    # validation also runs when an explicit msm overrides the operator
    with pytest.raises(ValueError, match="operator must be"):
        r.search_dsl_df({"match": {"content": {
            "query": "alpha", "operator": "banana",
            "minimum_should_match": 1}}}, k=None)
