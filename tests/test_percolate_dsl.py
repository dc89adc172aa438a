"""ES `percolate` QUERY (percolate-query.html) — the request-body
reverse-search leaf: docs REGISTER saved queries (text in a metadata
column), the body supplies a document, and the match set is the
registered queries the document satisfies. Matching follows the
percolate_df / _mlt_min_match model in the reverse direction: >= msm of
a stored query's DISTINCT terms must occur in the document's token set,
msm resolved PER QUERY against that query's own term count.

Also pins the codegen tokenizer (tokens_col) bit-parity with
tokenize_py — the leaf's correctness rests on the two token streams
agreeing for any stored text.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py, tokens_col
from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

# (path -> stored saved-query text); camel/snake shapes exercise the
# codegen tokenizer; doc 6 registers no query (NULL -> never matches)
DOCS = [
    ("r", "0", "c", "t", "alpha", "getValue fastPath"),
    ("r", "1", "c", "t", "alpha", "merge segment"),
    ("r", "2", "c", "t", "alpha", "hash_map value"),
    ("r", "3", "c", "t", "alpha", "config cluster zz"),
    ("r", "4", "c", "t", "alpha", "bufferPool"),
    ("r", "5", "c", "t", "alpha", "zzzz qqqq"),
    ("r", "6", "c", "t", "alpha", None),
]
SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " stored_query string"
)
# document tokens: get value fast path merge hash buffer pool
DOC_TEXT = "getValue fast path merge hash bufferPool"


def _body(**kw):
    spec = {"field": "stored_query", "document": {"text": DOC_TEXT}}
    spec.update(kw)
    return {"percolate": spec}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("percdsl") / "idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


def _hits(spark, d, df):
    docs = spark.read.parquet(f"{d}/docs").select("doc_id", "path")
    return {
        x["path"]: x["score"]
        for x in df.join(docs, "doc_id").select("path", "score").collect()
    }


def _brute(msm=1):
    have = set(tokenize_py(DOC_TEXT))
    out = {}
    for _, path, _, _, _, stored in DOCS:
        if stored is None:
            continue
        terms = set(tokenize_py(stored))
        n = len(terms)
        if n == 0:
            continue
        if isinstance(msm, str) and msm.endswith("%"):
            neg = msm.startswith("-")
            cnt = int(abs(float(msm[:-1])) * n / 100.0)
            req = (n - cnt) if neg else cnt
        else:
            req = int(msm) if int(msm) >= 0 else n + int(msm)
        req = max(1, min(req, n))
        matched = len(terms & have)
        if matched >= req:
            out[path] = float(matched)
    return out


def test_tokens_col_parity(spark):
    """The codegen tokenizer produces tokenize_py's exact stream on a
    broad battery: camel humps, acronym boundaries, digits, snake/kebab,
    punctuation, unicode accents/CJK (non-ASCII acts as a separator in
    both engines), empties — plus 300 seeded random strings."""
    battery = [
        "getValue", "HTTPServer", "parseHTTPResponse2XX", "snake_case_name",
        "kebab-case-name", "camelCase123Mixed", "ALLCAPS", "a", "A", "1",
        "", "   ", "___", "--", "...", "über_schnell", "naïveBayes",
        "中文分词test", "tabs\tand\nnewlines", "x" * 500,
        "Already lower case words", "trailing_", "_leading",
        "Mixed123Digits456End", "IOError2Fix", "v2Beta3",
    ]
    rng = random.Random(20260821)
    pool = "abcdefXYZ0123_ -.émZ中"
    battery += [
        "".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(battery)],
                               "i int, s string")
    got = {
        x["i"]: x["toks"]
        for x in df.select("i", tokens_col("s").alias("toks")).collect()
    }
    for i, s in enumerate(battery):
        assert got[i] == tokenize_py(s), f"mismatch on {s!r}"


def test_leaf_matches_bruteforce_default_msm(spark, idx):
    r = IndexReader(spark, idx)
    got = _hits(spark, idx, r.search_dsl_df(_body(), k=None))
    assert got == _brute(1)
    assert got == {"0": 4.0, "1": 1.0, "2": 2.0, "4": 2.0}


@pytest.mark.parametrize("msm", [2, "100%", "50%", -1, "-50%"])
def test_msm_forms(spark, idx, msm):
    r = IndexReader(spark, idx)
    got = _hits(
        spark, idx,
        r.search_dsl_df(_body(minimum_should_match=msm), k=None),
    )
    assert got == _brute(msm), f"msm={msm!r}"


def test_msm_100pct_is_conjunction(spark, idx):
    r = IndexReader(spark, idx)
    got = _hits(
        spark, idx,
        r.search_dsl_df(_body(minimum_should_match="100%"), k=None),
    )
    # only docs whose ENTIRE stored query occurs in the document
    assert got == {"0": 4.0, "4": 2.0}


def test_boost_scales_matched_count(spark, idx):
    r = IndexReader(spark, idx)
    got = _hits(spark, idx, r.search_dsl_df(_body(boost=3.0), k=None))
    assert got == {p: s * 3.0 for p, s in _brute(1).items()}


def test_string_document_and_empty_document(spark, idx):
    r = IndexReader(spark, idx)
    got = _hits(
        spark, idx,
        r.search_dsl_df(
            {"percolate": {"field": "stored_query", "document": DOC_TEXT}},
            k=None,
        ),
    )
    assert got == _brute(1)
    # a document with no tokens satisfies no stored query
    empty = r.search_dsl_df(
        {"percolate": {"field": "stored_query", "document": "!!! ..."}},
        k=None,
    )
    assert empty.count() == 0


def test_composes_in_bool(spark, idx):
    """percolate is a normal scoring leaf: filter context restricts it."""
    r = IndexReader(spark, idx)
    got = _hits(
        spark, idx,
        r.search_dsl_df(
            {"bool": {
                "must": [_body()],
                "filter": [
                    {"script": {"script": {"source": "path <> '1'"}}}
                ],
            }},
            k=None,
        ),
    )
    want = {p: s for p, s in _brute(1).items() if p != "1"}
    assert got == want


def test_validation(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError, match="metadata column"):
        r.search_dsl_df(_body(field="nope"))
    with pytest.raises(ValueError, match="single 'document'"):
        r.search_dsl_df(
            {"percolate": {"field": "stored_query",
                           "documents": [{"text": "a"}, {"text": "b"}]}}
        )
    with pytest.raises(ValueError, match="needs a 'document'"):
        r.search_dsl_df({"percolate": {"field": "stored_query"}})
    with pytest.raises(ValueError, match="n<spec"):
        r.search_dsl_df(_body(minimum_should_match="2<50%"))
    with pytest.raises(ValueError, match="bad minimum_should_match"):
        r.search_dsl_df(_body(minimum_should_match="abc"))


def test_live_tier_upsert_and_delete(spark, idx, tmp_path):
    """The leaf rides ctx.docs() == live_docs(): an upsert re-registering
    a doc's saved query moves it into the match set; a delete removes
    it."""
    import shutil

    d = str(tmp_path / "live")
    shutil.copytree(idx, d)
    r0 = IncrementalIndexReader(spark, d)
    live_docs = r0.live_docs().select("segment", "doc_id", "path")
    base = sorted(
        x["path"]
        for x in r0.search_dsl_df(_body(), k=None)
        .join(live_docs, ["segment", "doc_id"]).select("path").collect()
    )
    assert base == ["0", "1", "2", "4"]
    ops = spark.createDataFrame(
        [
            # doc 3 re-registers a matching query -> enters
            ("r", "3", "c2", "t", "alpha", "get merge", "index"),
            # doc 0 deleted -> leaves (delete identity = full key triple)
            ("r", "0", "c", "t", "alpha", None, "delete"),
        ],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, d, ops)
    r1 = IncrementalIndexReader(spark, d)
    live_docs = r1.live_docs().select("segment", "doc_id", "path")
    got = sorted(
        x["path"]
        for x in r1.search_dsl_df(_body(), k=None)
        .join(live_docs, ["segment", "doc_id"]).select("path").collect()
    )
    assert got == ["1", "2", "3", "4"]


def test_profile_names_the_surface():
    from elasticsearch_jdbc_spark.index.dsl import _profile_node

    prof = _profile_node(_body())
    assert prof == {
        "type": "percolate", "surface": "_leaf_percolate", "children": []
    }


def test_percolate_required_col_matches_parse_msm(spark):
    """The per-doc Column msm grammar must agree with the scalar
    _parse_msm + the percolate family's [1, n] clamp for every (form, n)
    pair — one Spark job over the whole grid."""
    from elasticsearch_jdbc_spark.index.dsl import (
        _parse_msm,
        _percolate_required_col,
    )

    forms = [1, 2, 5, -1, -3, "2", "-1", "-3", "60%", "100%", "-25%",
             "-100%", "0%"]
    ns = list(range(1, 9)) + [50, 58, 100]  # 100: the 58% FP-floor edge
    df = spark.createDataFrame([(n,) for n in ns], "n int")
    cols = [
        _percolate_required_col(m, F.col("n")).alias(f"m{i}")
        for i, m in enumerate(forms)
    ]
    got = {r["n"]: r.asDict() for r in df.select("n", *cols).collect()}
    for n in ns:
        for i, m in enumerate(forms):
            want = max(1, min(_parse_msm(m, n), n))
            assert got[n][f"m{i}"] == want, (m, n)


def test_stream_query_rows_matches_required_col(spark):
    """The streaming percolator's driver-side msm resolution and the DSL
    leaf's Column resolution are separate implementations of ONE grammar
    — this grid comparison makes any drift fail loudly."""
    from elasticsearch_jdbc_spark.index.dsl import _percolate_required_col
    from elasticsearch_jdbc_spark.streaming.percolate import _query_rows

    forms = [1, 3, -1, "2", "-1", "58%", "60%", "100%", "-25%", "-50%"]
    letters = "abcdefgh"
    texts = {n: " ".join(letters[:n]) for n in (1, 2, 3, 5, 8)}
    df = spark.createDataFrame([(n,) for n in texts], "n int")
    cols = [
        _percolate_required_col(m, F.col("n")).alias(f"m{i}")
        for i, m in enumerate(forms)
    ]
    col_req = {r["n"]: r.asDict() for r in df.select("n", *cols).collect()}
    for i, m in enumerate(forms):
        rows = _query_rows([(n, t, m) for n, t in texts.items()], 1)
        stream_req = {qid: req for qid, _terms, req in rows}
        for n in texts:
            assert stream_req[n] == col_req[n][f"m{i}"], (m, n)


def test_nested_document_values_only(spark, idx):
    """Nested document objects flatten to their VALUES — field names
    and repr punctuation must not become matchable tokens."""
    r = IndexReader(spark, idx)
    # stored query 'config cluster zz' (doc 3): a nested document whose
    # KEY is 'config' but whose values never mention it must not match
    none = r.search_dsl_df(
        {"percolate": {"field": "stored_query",
                       "document": {"config": {"other": "nothing"}}}},
        k=None,
    )
    assert _hits(spark, idx, none) == {}
    # values nested two levels deep DO match
    deep = r.search_dsl_df(
        {"percolate": {"field": "stored_query",
                       "document": {"a": {"b": ["config", "cluster"]}}}},
        k=None,
    )
    assert _hits(spark, idx, deep) == {"3": 2.0}
    # a TOP-LEVEL list document flattens to values too (no repr keys)
    lst = r.search_dsl_df(
        {"percolate": {"field": "stored_query",
                       "document": [{"config": "nothing"}]}},
        k=None,
    )
    assert _hits(spark, idx, lst) == {}


def test_mlt_min_match_strictness():
    """The canonical scalar msm rule rejects what the Column twin
    rejects: floats, None, bools, junk strings, n<spec combos."""
    from elasticsearch_jdbc_spark.index.query import IndexReader

    f = IndexReader._mlt_min_match
    assert f("-25%", 8) == 6 and f(-2, 8) == 6 and f("-2", 8) == 6
    assert f("58%", 100) == 58
    import pytest as _pt

    for bad in (2.5, None, True, "abc", "2<75%"):
        with _pt.raises(ValueError):
            f(bad, 5)
