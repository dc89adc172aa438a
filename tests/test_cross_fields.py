"""ES multi_match type=cross_fields: term-centric dis_max over the
queried fields with BLENDED document frequency (max over fields — the
Lucene BlendedTermQuery pseudo stats), tokens sum, min_should_match
counts tokens matched in ANY field. Brute parity, tie_breaker
arithmetic, dispatcher routing, live-tier twin."""

from __future__ import annotations

import math

import pytest

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
)

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "title string, body string"
)
DOCS = [
    ("r", "0", "c", "t", "merge sort speed", "the quick merge of sorted runs"),
    ("r", "1", "c", "t", "hash join", "hash tables join rows by key merge"),
    ("r", "2", "c", "t", "sort order", "rows sort in key order quick quick"),
    ("r", "3", "c", "t", "stream filter", "filter a stream of rows lazily"),
    ("r", "4", "c", "t", "quick scan", "scan segments and merge results"),
]
K1, B = 1.2, 0.75
FIELDS = {"title": 4, "body": 5}


def brute(query, boosts, tie_breaker=0.0, msm=1, docs=DOCS):
    per_doc = []
    for row in docs:
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
        score, nmatch = 0.0, 0
        for tok in toks:
            # blended df: max over fields of the per-field df
            df_b = max(
                sum(1 for _, ft, _ in per_doc if tok in ft[f])
                for f in boosts
            )
            if df_b == 0:
                continue
            idf = math.log(1.0 + (n - df_b + 0.5) / (df_b + 0.5))
            parts = []
            for f, w in boosts.items():
                tf = ftoks[f].count(tok)
                if not tf:
                    continue
                sat = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
                parts.append(w * (K1 + 1.0) * sat)
            if not parts:
                continue
            nmatch += 1
            best, total = max(parts), sum(parts)
            score += idf * (best + tie_breaker * (total - best))
        if nmatch >= msm and nmatch > 0:
            out[path] = score
    return out


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("xf") / "idx")
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


def _by_path(spark, idx_dir, rows):
    m = {
        r["doc_id"]: r["path"]
        for r in spark.read.parquet(f"{idx_dir}/docs")
        .select("doc_id", "path")
        .collect()
    }
    return {m[r["doc_id"]]: r["score"] for r in rows}


@pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
def test_brute_parity(spark, idx, tb):
    r = IndexReader(spark, idx)
    boosts = {"title": 2.0, "body": 1.0}
    got = _by_path(
        spark, idx,
        r.search_cross_fields_df(
            "quick merge", boosts, k=10, tie_breaker=tb
        ).collect(),
    )
    want = brute("quick merge", boosts, tie_breaker=tb)
    assert set(got) == set(want)
    for p, s in want.items():
        assert got[p] == pytest.approx(s, rel=1e-9)


def test_blended_df_differs_from_most_fields(spark, idx):
    """'merge' is in 3 bodies but 1 title: blended df = 3 everywhere, so
    a title-only scorer must still use df 3 — pin the blend is real by
    checking doc 0's title contribution uses the body df."""
    r = IndexReader(spark, idx)
    got = _by_path(
        spark, idx,
        r.search_cross_fields_df("merge", {"title": 1.0, "body": 1.0},
                                 k=10).collect(),
    )
    want = brute("merge", {"title": 1.0, "body": 1.0})
    assert got == pytest.approx(want, rel=1e-9)
    # most_fields on the same query scores per-field idfs — different sums
    mf = _by_path(
        spark, idx,
        r.multi_match_df("merge", {"title": 1.0, "body": 1.0},
                         match_type="most_fields", k=10).collect(),
    )
    assert mf.keys() == got.keys()
    assert any(abs(mf[p] - got[p]) > 1e-9 for p in got)


def test_msm_counts_any_field(spark, idx):
    """msm=2 keeps docs whose two tokens each matched SOMEWHERE — the
    cross_fields operator semantics (title hit + body hit qualifies)."""
    r = IndexReader(spark, idx)
    boosts = {"title": 1.0, "body": 1.0}
    got = _by_path(
        spark, idx,
        r.search_cross_fields_df(
            "quick merge", boosts, k=10, min_should_match=2
        ).collect(),
    )
    want = brute("quick merge", boosts, msm=2)
    assert set(got) == set(want) and len(want) > 0
    # doc 0: 'quick' (body) + 'merge' (title+body) -> qualifies
    assert "0" in got


def test_dispatcher_and_validation(spark, idx):
    r = IndexReader(spark, idx)
    via = _by_path(
        spark, idx,
        r.multi_match_df("quick merge", {"title": 2.0, "body": 1.0},
                         match_type="cross_fields", k=10,
                         tie_breaker=0.4).collect(),
    )
    direct = _by_path(
        spark, idx,
        r.search_cross_fields_df("quick merge", {"title": 2.0, "body": 1.0},
                                 k=10, tie_breaker=0.4).collect(),
    )
    assert via == direct
    with pytest.raises(ValueError, match="unknown fields"):
        r.search_cross_fields_df("x", {"nope": 1.0})
    assert r.search_cross_fields_df("zzzqqq", None, k=5).count() == 0


def test_live_tier_twin(spark, idx, tmp_path):
    """Incremental twin: base+delta scores == a fresh merged build; a
    delete drops the doc and the blended dfs stay the Lucene
    deleted-docs stats (masked docs counted)."""
    import shutil

    from elasticsearch_jdbc_spark.index import apply_incremental

    d2 = str(tmp_path / "live")
    shutil.copytree(idx, d2)
    inc = IncrementalIndexReader(spark, d2)
    base = _by_path(
        spark, idx,
        IndexReader(spark, idx).search_cross_fields_df(
            "quick merge", {"title": 2.0, "body": 1.0}, k=10,
            tie_breaker=0.3,
        ).collect(),
    )
    live_rows = inc.search_cross_fields_df(
        "quick merge", {"title": 2.0, "body": 1.0}, k=10, tie_breaker=0.3
    ).collect()
    docs_map = {
        r["doc_id"]: r["path"]
        for r in spark.read.parquet(f"{idx}/docs").select("doc_id", "path").collect()
    }
    live = {docs_map[r["doc_id"]]: r["score"] for r in live_rows}
    assert live == pytest.approx(base, rel=1e-9)
    dele = spark.createDataFrame(
        [("r", "0", "c", "t", "", "", "delete")], SCHEMA + ", _optype string"
    )
    apply_incremental(spark, d2, dele)
    inc = IncrementalIndexReader(spark, d2)
    after = {
        docs_map[r["doc_id"]]
        for r in inc.search_cross_fields_df(
            "quick merge", {"title": 2.0, "body": 1.0}, k=10
        ).collect()
    }
    assert "0" not in after and after == set(base) - {"0"}


def test_dsl_leaf_routes_cross_fields(spark, idx):
    """{'multi_match': {'type': 'cross_fields', ...}} through the request
    -body compiler == the typed surface."""
    r = IndexReader(spark, idx)
    got = {
        x["doc_id"]: x["score"]
        for x in r.search_dsl_df(
            {"multi_match": {"query": "quick merge",
                             "fields": ["title^2", "body"],
                             "type": "cross_fields",
                             "tie_breaker": 0.3}},
            k=None,
        ).collect()
    }
    want = {
        x["doc_id"]: x["score"]
        for x in r.search_cross_fields_df(
            "quick merge", {"title": 2.0, "body": 1.0}, k=None,
            tie_breaker=0.3,
        ).collect()
    }
    assert got == pytest.approx(want, rel=1e-9)
