"""ES `combined_fields` query (Lucene CombinedFieldQuery — the BM25F
term-centric blend): per token, tfs SUM across fields (weighted) BEFORE
the BM25 saturation; length norm is the blended total-tokens dl; df is
either Lucene's max-per-field pseudo stat (default, one postings decode)
or the exact any-field distinct-doc count. Both reader tiers, brute-force
parity, and the live-tier exact-df-after-delete property."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

SCHEMA = "repo string, path string, commit string, lang string, title string, body string"
DOCS = [
    ("r", "0", "c", "t", "merge sort speed", "the quick merge of sorted runs"),
    ("r", "1", "c", "t", "hash join", "hash tables join rows by key merge"),
    ("r", "2", "c", "t", "sort order", "rows sort in key order quick quick"),
    ("r", "3", "c", "t", "stream filter", "filter a stream of rows lazily"),
    ("r", "4", "c", "t", "quick scan", "scan segments and merge results"),
    ("r", "5", "c", "t", "key value store", "store values by key"),
]
K1, B = 1.2, 0.75


def brute(
    query: str, boosts: dict[str, float], df_mode: str = "max_field"
) -> dict[str, float]:
    """The contract, computed independently: weighted-tf blend over the
    boosted fields, blended dl over ALL indexed fields; df either the
    MAX of the boosted fields' per-term dfs (Lucene pseudo stats, the
    default) or the exact distinct docs matching in any boosted field."""
    fields = {"title": 4, "body": 5}  # name -> tuple index
    per_doc = []
    for row in DOCS:
        ftoks = {f: tokenize_py(row[i]) for f, i in fields.items()}
        per_doc.append((row[1], ftoks, sum(len(v) for v in ftoks.values())))
    n = len(per_doc)
    avgdl = sum(d[2] for d in per_doc) / n
    toks, seen = [], set()
    for t in tokenize_py(query):
        if t not in seen:
            seen.add(t)
            toks.append(t)
    scores: dict[str, float] = {}
    for tok in toks:
        tfc = {}
        for path, ftoks, dl in per_doc:
            v = sum(w * ftoks[f].count(tok) for f, w in boosts.items())
            if v > 0:
                tfc[path] = (v, dl)
        if not tfc:
            continue
        if df_mode == "exact":
            df = len(tfc)
        else:
            df = max(
                sum(1 for _, ftoks, _ in per_doc if tok in ftoks[f])
                for f in boosts
            )
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for path, (v, dl) in tfc.items():
            w = v / (v + K1 * (1.0 - B + B * dl / avgdl))
            scores[path] = scores.get(path, 0.0) + idf * (K1 + 1.0) * w
    return scores


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cf") / "idx")
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


@pytest.mark.parametrize("df_mode", ["max_field", "exact"])
def test_brute_parity_equal_boosts(spark, idx, df_mode):
    r = IndexReader(spark, idx)
    got = _by_path(
        spark, idx,
        r.search_combined_df("quick merge key", k=None, df_mode=df_mode).collect(),
    )
    want = brute("quick merge key", {"title": 1.0, "body": 1.0}, df_mode)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)


def test_df_modes_genuinely_differ(spark, idx):
    # 'quick' lives in title-only docs AND body-only docs: exact df (union)
    # exceeds max per-field df, so the two modes must score differently
    mf = _by_path(spark, idx, IndexReader(spark, idx).search_combined_df("quick", k=None).collect())
    ex = _by_path(spark, idx, IndexReader(spark, idx).search_combined_df("quick", k=None, df_mode="exact").collect())
    assert set(mf) == set(ex)
    assert any(abs(mf[p] - ex[p]) > 1e-12 for p in mf)
    with pytest.raises(ValueError):
        IndexReader(spark, idx).search_combined_df("quick", df_mode="median")


def test_brute_parity_weighted(spark, idx):
    r = IndexReader(spark, idx)
    got = _by_path(
        spark, idx,
        r.search_combined_df("quick merge", boosts={"title": 2.0, "body": 0.5}, k=None).collect(),
    )
    want = brute("quick merge", {"title": 2.0, "body": 0.5})
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)


def test_subset_fields_df_scope(spark, idx):
    # boosting only `title` restricts BOTH tf and df to that field
    r = IndexReader(spark, idx)
    got = _by_path(
        spark, idx, r.search_combined_df("quick", boosts={"title": 1.0}, k=None).collect()
    )
    want = brute("quick", {"title": 1.0})
    assert set(got) == set(want) == {"4"}  # 'quick' in a title only there
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)


def test_blend_differs_from_most_fields(spark, idx):
    # term-centric blend saturates summed tf ONCE; most_fields saturates
    # per field and sums — doc 2 ('quick quick' in body + none in title)
    # must score differently across the two surfaces for 'quick'
    r = IndexReader(spark, idx)
    cf = _by_path(spark, idx, r.search_combined_df("quick", k=None).collect())
    mf = _by_path(spark, idx, r.search_fields_df("quick", k=None).collect())
    assert set(cf) == set(mf)
    assert any(abs(cf[p] - mf[p]) > 1e-12 for p in cf)


def test_msm_counts_token_groups(spark, idx):
    r = IndexReader(spark, idx)
    out = _by_path(
        spark, idx, r.search_combined_df("quick merge key", k=None, min_should_match=2).collect()
    )
    want = brute("quick merge key", {"title": 1.0, "body": 1.0})
    matched = {}
    for tok in ("quick", "merge", "key"):
        for p in brute(tok, {"title": 1.0, "body": 1.0}):
            matched[p] = matched.get(p, 0) + 1
    assert set(out) == {p for p, c in matched.items() if c >= 2}
    for p in out:
        assert out[p] == pytest.approx(want[p], rel=1e-9)


def test_filter_and_pagination(spark, idx):
    r = IndexReader(spark, idx)
    full = r.search_combined_df("quick merge key", k=6).collect()
    # filter context prunes without rescoring
    doc0 = {
        r2["doc_id"]
        for r2 in spark.read.parquet(f"{idx}/docs").filter("path = '0'").collect()
    }
    flt = r.search_combined_df(
        "quick merge key", k=6, filter_sql="path <> '0'"
    ).collect()
    assert {x["doc_id"] for x in flt} == {x["doc_id"] for x in full} - doc0
    assert {x["doc_id"]: x["score"] for x in flt} == {
        x["doc_id"]: x["score"] for x in full if x["doc_id"] not in doc0
    }
    # search_after page walk reproduces the full ranking without dups
    pages, cursor = [], None
    while True:
        page = r.search_combined_df("quick merge key", k=2, search_after=cursor).collect()
        if not page:
            break
        pages.extend(page)
        cursor = (page[-1]["score"], page[-1]["doc_id"])
    assert [(x["doc_id"], round(x["score"], 9)) for x in pages] == [
        (x["doc_id"], round(x["score"], 9)) for x in full
    ]


def test_validation(spark, idx, tmp_path):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError):
        r.search_combined_df("quick", boosts={"nope": 1.0})
    plain = str(tmp_path / "plain")
    IndexBuilder(spark, plain, partitions=2, text_col="title").build(
        spark.createDataFrame(DOCS, SCHEMA).drop("body"), resume=False
    )
    with pytest.raises(ValueError):
        IndexReader(spark, plain).search_combined_df("quick")
    assert r.search_combined_df("", k=None).count() == 0


# ---------------- live tier ----------------


@pytest.fixture()
def live(spark, tmp_path):
    d = str(tmp_path / "live")
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        spark.createDataFrame(DOCS[:4], SCHEMA), resume=False
    )
    adds = spark.createDataFrame(
        [(*row, "create") for row in DOCS[4:]], SCHEMA + ", _optype string"
    )
    apply_incremental(spark, d, adds)
    return d


def _live_by_path(r, rows):
    m = {
        (x["segment"], x["doc_id"]): x["path"]
        for x in r.live_docs().select("segment", "doc_id", "path").collect()
    }
    return {m[(x["segment"], x["doc_id"])]: x["score"] for x in rows}


@pytest.mark.parametrize("df_mode", ["max_field", "exact"])
def test_live_adds_match_compact(spark, live, tmp_path, df_mode):
    # adds-only: summed global dfs == rebuilt dfs, so BOTH modes match a
    # compacted rebuild exactly
    inc = IncrementalIndexReader(spark, live)
    cdir = str(tmp_path / "compact")
    inc.compact_to(cdir)
    base = IndexReader(spark, cdir)
    got = _live_by_path(
        inc, inc.search_combined_df("quick merge key", k=None, df_mode=df_mode).collect()
    )
    want = _by_path(
        spark, cdir,
        base.search_combined_df("quick merge key", k=None, df_mode=df_mode).collect(),
    )
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)


def test_live_delete_corrects_df_exactly(spark, live, tmp_path):
    # delete doc 2 -> with df_mode='exact' the live scores equal a
    # compacted rebuild WITHOUT it (the tombstone anti-join runs BEFORE
    # the df agg + tombstone-corrected N/avgdl); max_field keeps counting
    # the masked doc in df until a merge (the Lucene deleted-docs stats
    # rule), so it must diverge from the rebuild on affected terms
    dele = spark.createDataFrame(
        [("r", "2", "c", "t", "", "", "delete")], SCHEMA + ", _optype string"
    )
    apply_incremental(spark, live, dele)
    inc = IncrementalIndexReader(spark, live)
    cdir = str(tmp_path / "compact2")
    inc.compact_to(cdir)
    base = IndexReader(spark, cdir)
    mf_live = _live_by_path(
        inc, inc.search_combined_df("quick", k=None).collect()
    )
    mf_compact = _by_path(
        spark, cdir, base.search_combined_df("quick", k=None).collect()
    )
    assert set(mf_live) == set(mf_compact)
    assert any(abs(mf_live[p] - mf_compact[p]) > 1e-12 for p in mf_live)
    got = _live_by_path(
        inc, inc.search_combined_df("quick merge key", k=None, df_mode="exact").collect()
    )
    want = _by_path(
        spark, cdir,
        base.search_combined_df("quick merge key", k=None, df_mode="exact").collect(),
    )
    assert "2" not in got
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9)
