"""ES multi_match type=best_fields (the default multi_match): dis_max
over per-field BM25 scores with tie_breaker, plus the multi_match
dispatcher routing."""

from __future__ import annotations

import math

import pytest

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

SCHEMA = "repo string, path string, commit string, lang string, title string, body string"
DOCS = [
    ("r", "0", "c", "t", "merge sort speed", "the quick merge of sorted runs"),
    ("r", "1", "c", "t", "hash join", "hash tables join rows by key merge"),
    ("r", "2", "c", "t", "sort order", "rows sort in key order quick quick"),
    ("r", "3", "c", "t", "stream filter", "filter a stream of rows lazily"),
    ("r", "4", "c", "t", "quick scan", "scan segments and merge results"),
]
K1, B = 1.2, 0.75
FIELDS = {"title": 4, "body": 5}


def brute(query, boosts, tie_breaker=0.0):
    per_doc = []
    for row in DOCS:
        ftoks = {f: tokenize_py(row[i]) for f, i in FIELDS.items()}
        per_doc.append((row[1], ftoks, sum(len(v) for v in ftoks.values())))
    n = len(per_doc)
    avgdl = sum(d[2] for d in per_doc) / n
    toks, seen = [], set()
    for t in tokenize_py(query):
        if t not in seen:
            seen.add(t)
            toks.append(t)
    out = {}
    for path, ftoks, dl in per_doc:
        fscores = []
        for f, w in boosts.items():
            s = 0.0
            for tok in toks:
                tf = ftoks[f].count(tok)
                if not tf:
                    continue
                df = sum(1 for _, ft, _ in per_doc if tok in ft[f])
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += w * idf * (K1 + 1.0) * tf / (
                    tf + K1 * (1.0 - B + B * dl / avgdl)
                )
            fscores.append(s)
        if any(s > 0 for s in fscores):
            best, total = max(fscores), sum(fscores)
            out[path] = best + tie_breaker * (total - best)
    return out


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bf") / "idx")
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


def _by_path(spark, idx_dir, rows):
    m = {
        r["doc_id"]: r["path"]
        for r in spark.read.parquet(f"{idx_dir}/docs").select("doc_id", "path").collect()
    }
    return {m[r["doc_id"]]: r["score"] for r in rows}


@pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
def test_brute_parity(spark, idx, tb):
    r = IndexReader(spark, idx)
    got = _by_path(
        spark, idx,
        r.search_best_fields_df("quick merge key", k=None, tie_breaker=tb).collect(),
    )
    want = brute("quick merge key", {"title": 1.0, "body": 1.0}, tb)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)


def test_tie_breaker_one_equals_most_fields(spark, idx):
    r = IndexReader(spark, idx)
    bf = _by_path(
        spark, idx,
        r.search_best_fields_df("quick merge", k=None, tie_breaker=1.0).collect(),
    )
    mf = _by_path(spark, idx, r.search_fields_df("quick merge", k=None).collect())
    assert set(bf) == set(mf)
    for p in bf:
        assert bf[p] == pytest.approx(mf[p], rel=1e-9)


def test_boosts_and_msm(spark, idx):
    r = IndexReader(spark, idx)
    got = _by_path(
        spark, idx,
        r.search_best_fields_df(
            "quick merge", boosts={"title": 3.0, "body": 0.5}, k=None
        ).collect(),
    )
    want = brute("quick merge", {"title": 3.0, "body": 0.5})
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)
    # msm=2: doc must match both tokens (in any field combination)
    two = _by_path(
        spark, idx,
        r.search_best_fields_df("quick merge", k=None, min_should_match=2).collect(),
    )
    both = {
        p for p in brute("quick", {"title": 1, "body": 1})
    } & {p for p in brute("merge", {"title": 1, "body": 1})}
    assert set(two) == both


def test_dispatcher(spark, idx):
    r = IndexReader(spark, idx)
    a = {x["doc_id"]: x["score"] for x in r.multi_match_df("quick merge", k=None).collect()}
    b = {x["doc_id"]: x["score"] for x in r.search_best_fields_df("quick merge", k=None).collect()}
    assert a == b
    c = {x["doc_id"]: x["score"] for x in r.multi_match_df("quick merge", match_type="combined_fields", k=None).collect()}
    d = {x["doc_id"]: x["score"] for x in r.search_combined_df("quick merge", k=None).collect()}
    assert c == d
    e = {x["doc_id"]: x["score"] for x in r.multi_match_df("quick merge", match_type="cross_fields", k=None).collect()}
    f = {x["doc_id"]: x["score"] for x in r.search_cross_fields_df("quick merge", k=None).collect()}
    assert e == f
    with pytest.raises(ValueError):
        r.multi_match_df("x", match_type="nope_fields")
    with pytest.raises(ValueError):
        r.search_best_fields_df("x", tie_breaker=1.5)


# ---------------- live tier ----------------


def test_live_best_fields(spark, tmp_path):
    from elasticsearch_jdbc_spark.index import (
        IncrementalIndexReader,
        apply_incremental,
    )

    d = str(tmp_path / "live")
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        spark.createDataFrame(DOCS[:3], SCHEMA), resume=False
    )
    adds = spark.createDataFrame(
        [(*row, "create") for row in DOCS[3:]], SCHEMA + ", _optype string"
    )
    apply_incremental(spark, d, adds)
    inc = IncrementalIndexReader(spark, d)
    cdir = str(tmp_path / "compact")
    inc.compact_to(cdir)
    base = IndexReader(spark, cdir)
    m = {
        (x["segment"], x["doc_id"]): x["path"]
        for x in inc.live_docs().select("segment", "doc_id", "path").collect()
    }
    got = {
        m[(x["segment"], x["doc_id"])]: x["score"]
        for x in inc.search_best_fields_df("quick merge", k=None, tie_breaker=0.3).collect()
    }
    want = _by_path(
        spark, cdir,
        base.search_best_fields_df("quick merge", k=None, tie_breaker=0.3).collect(),
    )
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)
    # live dispatcher parity
    md = {
        m[(x["segment"], x["doc_id"])]: x["score"]
        for x in inc.multi_match_df("quick merge", tie_breaker=0.3, k=None).collect()
    }
    assert md == got
    # most_fields routing on the live tier equals the base most_fields
    lf = {
        m[(x["segment"], x["doc_id"])]: x["score"]
        for x in inc.multi_match_df("quick merge", match_type="most_fields", k=None).collect()
    }
    bf = _by_path(spark, cdir, base.search_fields_df("quick merge", k=None).collect())
    for p in bf:
        assert lf[p] == pytest.approx(bf[p], rel=1e-9)


def test_best_fields_pagination(spark, idx):
    r = IndexReader(spark, idx)
    full = r.search_best_fields_df("quick merge key", k=10, tie_breaker=0.3).collect()
    pages, cursor = [], None
    while True:
        page = r.search_best_fields_df(
            "quick merge key", k=2, tie_breaker=0.3, search_after=cursor
        ).collect()
        if not page:
            break
        pages.extend(page)
        cursor = (page[-1]["score"], page[-1]["doc_id"])
    assert [(x["doc_id"], round(x["score"], 9)) for x in pages] == [
        (x["doc_id"], round(x["score"], 9)) for x in full
    ]
