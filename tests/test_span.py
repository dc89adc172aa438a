"""ES span query family (span_term / span_near / span_first / span_or /
span_not): the canonical minimal-antichain algebra property-checked
against an independently written plain-loop reference, flat nears
gate-checked against an all-combinations (Lucene-like) brute force, and
the Spark kernel checked end-to-end on both reader tiers."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.index.spans import (
    eval_span,
    span_leaf_texts,
    span_scoring_texts,
    validate_span,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus


def _minimal(spanset):
    return set(
        (s, e)
        for s, e in spanset
        if not any(
            (s2 >= s and e2 <= e and (s2, e2) != (s, e)) for s2, e2 in spanset
        )
    )


def _ref_eval(spec, by_term):
    """Independent plain-loop reference of the canonical algebra (see
    index/spans.py docstring for the rules)."""
    kind = next(iter(spec))
    body = spec[kind]
    if kind == "span_term":
        return _minimal({(int(x), int(x) + 1) for x in by_term.get(body, [])})
    if kind == "span_or":
        out = set()
        for c in body["clauses"]:
            out |= _ref_eval(c, by_term)
        return _minimal(out)
    if kind == "span_first":
        return _minimal(
            {(s, e) for s, e in _ref_eval(body["match"], by_term) if e <= body["end"]}
        )
    if kind == "span_not":
        inc = _ref_eval(body["include"], by_term)
        exc = _ref_eval(body["exclude"], by_term)
        pre, post = body.get("pre", 0), body.get("post", 0)
        return _minimal(
            {
                (s, e)
                for s, e in inc
                if not any(xs < e + post and xe > s - pre for xs, xe in exc)
            }
        )
    if kind in ("span_within", "span_containing"):
        lit = _ref_eval(body["little"], by_term)
        big = _ref_eval(body["big"], by_term)
        if kind == "span_within":
            return _minimal(
                {(s, e) for s, e in lit
                 if any(bs <= s and e <= be for bs, be in big)}
            )
        return _minimal(
            {(bs, be) for bs, be in big
             if any(bs <= s and e <= be for s, e in lit)}
        )
    clause = [sorted(_ref_eval(c, by_term)) for c in body["clauses"]]
    if any(not cs for cs in clause):
        return set()
    slop = body.get("slop", 0)
    out = set()
    if body.get("in_order", True):
        for s0, e0 in clause[0]:
            cur_e, gaps, ok = e0, 0, True
            for cs in clause[1:]:
                nxt = [x for x in cs if x[0] >= cur_e]
                if not nxt:
                    ok = False
                    break
                gaps += nxt[0][0] - cur_e
                cur_e = nxt[0][1]
            if ok and gaps <= slop:
                out.add((s0, cur_e))
    else:
        for s in sorted({s for cs in clause for s, _ in cs}):
            we, credit, ok = -1, 0, True
            for cs in clause:
                nxt = [x for x in cs if x[0] >= s]
                if not nxt:
                    ok = False
                    break
                we = max(we, nxt[0][1])
                credit += nxt[0][1] - nxt[0][0]
            if ok and (we - s) - credit <= slop:
                out.add((s, we))
    return _minimal(out)


def _rand_spec(rng, terms, depth=0):
    kinds = ["span_term"] * 3 + (
        ["span_near", "span_or", "span_first", "span_not",
         "span_within", "span_containing"] if depth < 2 else []
    )
    k = rng.choice(kinds)
    if k == "span_term":
        return {"span_term": rng.choice(terms)}
    if k == "span_or":
        return {
            "span_or": {
                "clauses": [_rand_spec(rng, terms, depth + 1) for _ in range(rng.randint(2, 3))]
            }
        }
    if k == "span_first":
        return {
            "span_first": {
                "match": _rand_spec(rng, terms, depth + 1),
                "end": rng.randint(1, 8),
            }
        }
    if k == "span_not":
        return {
            "span_not": {
                "include": _rand_spec(rng, terms, depth + 1),
                "exclude": _rand_spec(rng, terms, depth + 1),
                "pre": rng.randint(0, 1),
                "post": rng.randint(0, 1),
            }
        }
    if k in ("span_within", "span_containing"):
        return {
            k: {
                "little": _rand_spec(rng, terms, depth + 1),
                "big": _rand_spec(rng, terms, depth + 1),
            }
        }
    return {
        "span_near": {
            "clauses": [_rand_spec(rng, terms, depth + 1) for _ in range(rng.randint(2, 3))],
            "slop": rng.randint(0, 3),
            "in_order": rng.random() < 0.5,
        }
    }


def test_algebra_matches_plain_loop_reference():
    rng = random.Random(7)
    terms = list("abcd")
    for _ in range(1200):
        doc = [rng.choice(terms) for _ in range(rng.randint(1, 12))]
        by_term: dict = {}
        for i, t in enumerate(doc):
            by_term.setdefault(t, []).append(i)
        by_np = {t: np.asarray(p, np.int64) for t, p in by_term.items()}
        spec = _rand_spec(rng, terms)
        validate_span(spec)
        got_s, got_e = eval_span(spec, by_np)
        assert set(zip(got_s.tolist(), got_e.tolist())) == _ref_eval(spec, by_term)


def test_flat_near_gate_matches_all_combinations_brute():
    """For flat (leaf-term) nears, the canonical algebra must make the
    SAME match decision as enumerating every one-span-per-clause combo
    under the Lucene-style slop rules — the class of specs where the
    canonical/all-spans distinction collapses."""
    rng = random.Random(11)
    terms = list("abcd")
    for _ in range(1200):
        doc = [rng.choice(terms) for _ in range(rng.randint(1, 14))]
        by_term: dict = {}
        for i, t in enumerate(doc):
            by_term.setdefault(t, []).append(i)
        by_np = {t: np.asarray(p, np.int64) for t, p in by_term.items()}
        k = rng.randint(2, 3)
        qs = [rng.choice(terms) for _ in range(k)]
        slop = rng.randint(0, 4)
        in_order = rng.random() < 0.5
        spec = {
            "span_near": {
                "clauses": [{"span_term": t} for t in qs],
                "slop": slop,
                "in_order": in_order,
            }
        }
        got = len(eval_span(spec, by_np)[0]) > 0
        lists = [sorted(by_term.get(t, [])) for t in qs]
        want = False
        if all(lists):
            for combo in itertools.product(*lists):
                spans = [(p, p + 1) for p in combo]
                if in_order:
                    if all(b[0] >= a[1] for a, b in zip(spans, spans[1:])) and sum(
                        b[0] - a[1] for a, b in zip(spans, spans[1:])
                    ) <= slop:
                        want = True
                        break
                else:
                    ws = min(s for s, _ in spans)
                    we = max(e for _, e in spans)
                    if (we - ws) - k <= slop:
                        want = True
                        break
        assert got == want, (doc, qs, slop, in_order)


def test_leaf_helpers_and_validation():
    spec = {
        "span_not": {
            "include": {
                "span_near": {
                    "clauses": [{"span_term": "a"}, {"span_term": "b"}],
                    "slop": 1,
                    "in_order": True,
                }
            },
            "exclude": {"span_term": "c"},
        }
    }
    assert span_leaf_texts(spec) == ["a", "b", "c"]
    assert span_scoring_texts(spec) == ["a", "b"]
    for bad in (
        {"span_banana": "x"},
        {"span_term": ""},
        {"span_near": {"clauses": []}},
        {"span_near": {"clauses": [{"span_term": "a"}], "slop": -1}},
        {"span_first": {"match": {"span_term": "a"}, "end": 0}},
        {"span_not": {"include": {"span_term": "a"}}},
    ):
        with pytest.raises(ValueError):
            validate_span(bad)


# ---------------------------------------------------------------- Spark


Q1, Q2 = "merge", "buffer"


@pytest.fixture()
def setup(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=66).cache()
    IndexBuilder(spark, d, partitions=4, with_positions=True).build(
        corpus, resume=False
    )
    return d, corpus


def _positions(reader, corpus):
    """{doc_id: {token: [positions]}} straight from the analyzer."""
    keymap = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in reader.spark.read.parquet(f"{reader.index_dir}/docs").collect()
    }
    out = {}
    for r in corpus.collect():
        toks = reader.analyze(r["content"], lang=r["lang"])
        pos: dict = {}
        for t in toks:
            pos.setdefault(t["token"], []).append(t["position"])
        out[keymap[(r["repo"], r["path"], r["commit"])]] = pos
    return out


@pytest.mark.parametrize(
    "spec",
    [
        {"span_near": {"clauses": [{"span_term": Q1}, {"span_term": Q2}], "slop": 2, "in_order": True}},
        {"span_near": {"clauses": [{"span_term": Q1}, {"span_term": Q2}], "slop": 4, "in_order": False}},
        {"span_first": {"match": {"span_term": Q1}, "end": 12}},
        {"span_or": {"clauses": [{"span_term": Q1}, {"span_term": "zlib"}]}},
        {"span_not": {"include": {"span_term": Q1}, "exclude": {"span_term": Q2}, "pre": 1, "post": 1}},
        {"span_within": {"little": {"span_term": Q1},
                         "big": {"span_near": {"clauses": [{"span_term": Q2}, {"span_term": Q1}], "slop": 6, "in_order": False}}}},
        {"span_containing": {"little": {"span_term": Q1},
                             "big": {"span_near": {"clauses": [{"span_term": Q2}, {"span_term": Q1}], "slop": 6, "in_order": False}}}},
    ],
)
def test_engine_matches_analyzer_walk(spark, setup, spec):
    d, corpus = setup
    r = IndexReader(spark, d)
    got = {x["doc_id"] for x in r.search_span_df(spec, k=None).collect()}
    pos = _positions(r, corpus)
    want = {
        doc_id
        for doc_id, by_term in pos.items()
        if _ref_eval(spec, by_term)
    }
    assert got == want
    assert want  # fixture must exercise the match path


def test_span_scoring_is_bm25_sum_of_present_leafs(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    spec = {"span_or": {"clauses": [{"span_term": Q1}, {"span_term": Q2}]}}
    got = r.search_span_df(spec, k=None).collect()
    assert got
    full = {x["doc_id"]: x["score"] for x in r.match_df(f"{Q1} {Q2}").collect()}
    for x in got:
        assert x["score"] == pytest.approx(full[x["doc_id"]], rel=1e-12)


def test_span_near_slop0_ordered_is_phrase_set(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    spec = {
        "span_near": {
            "clauses": [{"span_term": Q1}, {"span_term": Q2}],
            "slop": 0,
            "in_order": True,
        }
    }
    sp = {x["doc_id"] for x in r.search_span_df(spec, k=None).collect()}
    ph = {x["doc_id"] for x in r.search_phrase_df(f"{Q1} {Q2}", k=None).collect()}
    assert sp == ph


def test_multi_token_span_term_desugars_to_phrase(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    sp = {
        x["doc_id"]
        for x in r.search_span_df({"span_term": f"{Q1} {Q2}"}, k=None).collect()
    }
    ph = {x["doc_id"] for x in r.search_phrase_df(f"{Q1} {Q2}", k=None).collect()}
    assert sp == ph


def test_span_incremental_twin(spark, setup):
    d, _ = setup
    spec = {
        "span_near": {
            "clauses": [{"span_term": Q1}, {"span_term": Q2}],
            "slop": 3,
            "in_order": False,
        }
    }
    base = IndexReader(spark, d).search_span_df(spec, k=12).collect()
    ri = IncrementalIndexReader(spark, d)
    live = ri.search_span_df(spec, k=12).collect()
    assert [(x["doc_id"], round(x["score"], 9)) for x in live] == [
        (x["doc_id"], round(x["score"], 9)) for x in base
    ]
    top = live[0]
    key = (
        ri.live_docs()
        .filter(
            (F.col("segment") == top["segment"]) & (F.col("doc_id") == top["doc_id"])
        )
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, d, key)
    after = IncrementalIndexReader(spark, d).search_span_df(spec, k=12).collect()
    assert (top["segment"], top["doc_id"]) not in {
        (x["segment"], x["doc_id"]) for x in after
    }


def test_span_validation_and_empty(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    with pytest.raises(ValueError, match="span"):
        r.search_span_df({"span_banana": "x"})
    assert r.search_span_df({"span_term": "zzznohit"}, k=5).count() == 0


def test_span_within_containing_goldens():
    """within keeps enclosed little-spans; containing keeps enclosing
    big-spans; empty branches gate to empty."""
    import numpy as np

    by = {
        "a": np.array([5, 20]),
        "x": np.array([2, 18]),
        "y": np.array([9, 19]),
    }
    big = {"span_near": {"clauses": [{"span_term": "x"}, {"span_term": "y"}],
                         "slop": 8, "in_order": True}}
    w = eval_span({"span_within": {"little": {"span_term": "a"}, "big": big}}, by)
    assert list(w[0]) == [5] and list(w[1]) == [6]  # a@20 not enclosed
    c = eval_span(
        {"span_containing": {"little": {"span_term": "a"}, "big": big}}, by
    )
    assert list(c[0]) == [2] and list(c[1]) == [10]
    none = eval_span(
        {"span_within": {"little": {"span_term": "zz"}, "big": big}}, by
    )
    assert len(none[0]) == 0
    with pytest.raises(ValueError, match="little"):
        validate_span({"span_within": {"big": big}})


def test_span_multi_rewrite_and_engine(spark, setup):
    """span_multi (prefix/fuzzy/wildcard in span position) rewrites to a
    span_or over the dictionary expansion (SpanRewriteMethod); zero
    expansions match nothing (not an error)."""
    d, corpus = setup
    r = IndexReader(spark, d)
    # rewrite shape: prefix expands to >= 1 dictionary terms
    native = r._analyze_span(
        {"span_multi": {"match": {"prefix": "mer"}}}, None
    )
    kinds = next(iter(native))
    assert kinds in ("span_term", "span_or")
    exp = r.expand_prefix("mer", 50)
    assert exp
    got = {
        x["doc_id"]
        for x in r.search_span_df(
            {"span_multi": {"match": {"prefix": "mer"}}}, k=None
        ).collect()
    }
    want = {
        x["doc_id"]
        for x in r.search_span_df(
            {"span_or": {"clauses": [{"span_term": t} for t in exp]}}, k=None
        ).collect()
    }
    assert got == want and got
    # inside a near: "mer* buffer" within slop 3
    near = {
        "span_near": {
            "clauses": [
                {"span_multi": {"match": {"prefix": "mer"}}},
                {"span_term": "buffer"},
            ],
            "slop": 3,
            "in_order": True,
        }
    }
    assert r.search_span_df(near, k=None).count() > 0
    # wildcard + max_expansions cap
    one = r._analyze_span(
        {"span_multi": {"match": {"wildcard": "mer*"}, "max_expansions": 1}},
        None,
    )
    assert next(iter(one)) == "span_term"
    # zero expansions -> empty result, no raise
    assert (
        r.search_span_df(
            {"span_multi": {"match": {"prefix": "zzzzqqq"}}}, k=None
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="prefix|fuzzy|wildcard"):
        r.search_span_df({"span_multi": {"match": {"regexp": "a.*"}}}, k=None)


def test_span_field_masking(spark, tmp_path):
    """ES span_field_masking: the masked clause reads ITS OWN field's
    positions/terms, combines positionally with clauses on the masked
    field, and satisfies the single-field rule under the mask
    (span-field-masking-query.html; deviation: scores use the actual
    field's statistics)."""
    idx = str(tmp_path / "fmask")
    rows = [
        # body:quick@0 + title:brown@1 -> adjacent under the mask
        ("r", "0", "c", "t", "quick brown fox", "quick brown fox jumps"),
        # title:brown@0, body:quick@0 -> order violated, no match
        ("r", "1", "c", "t", "brown quick fox", "quick stone wall"),
        # brown only in BODY; masked clause reads TITLE -> no match
        ("r", "2", "c", "t", "quick slate fox", "quick brown fox"),
    ]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    IndexBuilder(
        spark, idx, partitions=2, fields=["title", "body"],
        with_positions=True,
    ).build(df, resume=False)
    r = IndexReader(spark, idx)
    paths = {
        x["doc_id"]: x["path"]
        for x in spark.read.parquet(f"{idx}/docs").collect()
    }
    masked = {
        "span_near": {
            "clauses": [
                {"span_term": {"body": "quick"}},
                {"span_field_masking": {
                    "query": {"span_term": {"title": "brown"}},
                    "field": "body",
                }},
            ],
            "slop": 0,
            "in_order": True,
        }
    }
    hits = r.search_dsl_df(masked, k=None).collect()
    assert {paths[x["doc_id"]] for x in hits} == {"0"}
    assert all(x["score"] > 0 for x in hits)
    # without masking, mixing fields violates the single-field rule
    with pytest.raises(ValueError, match="one field"):
        r.search_dsl_df({
            "span_near": {
                "clauses": [
                    {"span_term": {"body": "quick"}},
                    {"span_term": {"title": "brown"}},
                ],
                "slop": 0, "in_order": True,
            }
        }, k=None)
    # top-level masking node == the plain query on its actual field
    top = r.search_dsl_df({
        "span_field_masking": {
            "query": {"span_term": {"title": "brown"}}, "field": "body",
        }
    }, k=None)
    plain = r.search_dsl_df({"span_term": {"title": "brown"}}, k=None)
    assert (
        {x["doc_id"] for x in top.collect()}
        == {x["doc_id"] for x in plain.collect()}
        == {i for i, p in paths.items() if p in {"0", "1"}}
    )
    # native-grammar validation
    with pytest.raises(ValueError, match="span_field"):
        validate_span({"span_field": {"field": "", "query": {"span_term": "x"}}})
    with pytest.raises(ValueError, match="span_field"):
        validate_span({"span_field": {"field": "body"}})
    # incremental twin agrees
    inc = IncrementalIndexReader(spark, idx)
    got_inc = {paths[x["doc_id"]] for x in inc.search_span_df(
        {"span_near": {"clauses": [
            {"span_term": "quick"},
            {"span_field": {"field": "body", "query": {"span_term": "brown"}}},
        ], "slop": 0, "in_order": True}},
        k=None, field="body",
    ).collect()}
    assert got_inc == {"0", "2"}
