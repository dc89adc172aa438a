"""End-to-end: build index over the synthetic corpus, verify rank-identical
BM25 top-k (docIDs AND scores) against the independent pure-Python oracle,
plus the sha256 ingest invariant and WAND == brute-force."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index.build import IndexBuilder
from elasticsearch_jdbc_spark.index.oracle import BM25Oracle
from elasticsearch_jdbc_spark.index.query import IndexReader
from elasticsearch_jdbc_spark.sources.corpus import synthetic_corpus

N_FILES = 800

QUERIES = [
    "merge segment posting",
    "getValue buffer flush",
    "snake_case token stream",
    "public static void query",
    "encode decode varint block",
    "reader writer lock pool",
    "index",
    "nosuchtermanywhere",
    "fetch batch cursor row column",
    "func struct interface range",
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("idx"))
    corpus = synthetic_corpus(spark, n_files=N_FILES, seed=42)
    builder = IndexBuilder(spark, idx_dir, partitions=8)
    manifest = builder.build(corpus, resume=False)
    return idx_dir, manifest, corpus


@pytest.fixture(scope="module")
def oracle(built, spark):
    idx_dir, _, _ = built
    docs = spark.read.parquet(os.path.join(idx_dir, "docs"))
    tok = spark.read.parquet(os.path.join(idx_dir, "tokenized"))
    # reconstruct doc_id -> content is not stored; rebuild corpus text by key
    corpus = synthetic_corpus(spark, n_files=N_FILES, seed=42)
    joined = docs.join(corpus, ["repo", "path", "commit"]).select("doc_id", "content")
    return BM25Oracle({r["doc_id"]: r["content"] for r in joined.collect()})


def test_manifest_stats(built, spark):
    idx_dir, manifest, _ = built
    assert manifest["n_docs"] == N_FILES
    assert manifest["avgdl"] > 0
    docs = spark.read.parquet(os.path.join(idx_dir, "docs"))
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    # unique, near-dense ids (partition offsets align up to block_size)
    assert len(set(ids)) == N_FILES
    assert min(ids) == 0 and max(ids) < N_FILES + 128 * 16


def test_sha256_ingest_invariant(built, spark):
    """Per-row sha256(content) equality vs the source (input_hint contract)."""
    idx_dir, _, corpus = built
    docs = spark.read.parquet(os.path.join(idx_dir, "docs"))
    src = corpus.withColumn("expect", F.sha2("content", 256))
    mismatch = (
        docs.join(src, ["repo", "path", "commit"])
        .filter(F.col("sha256") != F.col("expect"))
        .count()
    )
    assert mismatch == 0
    # spot-check one row against hashlib (independent of Spark)
    row = corpus.limit(1).collect()[0]
    expect = hashlib.sha256(row["content"].encode()).hexdigest()
    got = (
        docs.filter(
            (F.col("repo") == row["repo"])
            & (F.col("path") == row["path"])
            & (F.col("commit") == row["commit"])
        )
        .collect()[0]["sha256"]
    )
    assert got == expect


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identical_vs_oracle(built, oracle, spark, query):
    idx_dir, _, _ = built
    reader = IndexReader(spark, idx_dir)
    got = reader.search(query, k=10)
    want = oracle.search(query, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], f"docID rank mismatch for {query!r}"
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12, abs=1e-12)


def test_all_driver_paths_rank_identical(built, spark):
    """dense (default), block-max WAND, and brute must agree exactly —
    same docIDs, same scores (dense accumulates in the same FP order as
    brute; WAND scores within 1e-12 reorder noise, ranks identical)."""
    idx_dir, _, _ = built
    reader = IndexReader(spark, idx_dir)
    for q in QUERIES:
        brute = reader.search_brute(q, k=10)
        assert reader.search(q, k=10) == brute
        wand = reader.search_wand(q, k=10)
        assert [d for d, _ in wand] == [d for d, _ in brute]
        for (_, ws), (_, bs) in zip(wand, brute):
            assert ws == pytest.approx(bs, rel=1e-12, abs=1e-12)


def test_distributed_equals_driver(built, spark):
    idx_dir, _, _ = built
    reader = IndexReader(spark, idx_dir)
    for q in QUERIES[:4]:
        want = reader.search(q, k=10)
        got = [(r["doc_id"], r["score"]) for r in reader.search_df(q, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_prefix_expansion_and_search(built, spark):
    """Prefix queries: expansion comes from the sorted term dictionary;
    scoring equals a hand-expanded dense query (scoring_boolean rewrite)."""
    idx_dir, _, _ = built
    reader = IndexReader(spark, idx_dir)
    exp = reader.expand_prefix("enc")
    assert exp and all(t.startswith("enc") for t in exp)
    hits = reader.search_prefix("enc", k=10)
    assert hits
    manual = reader._search_dense_terms(list(exp), k=10)
    assert hits == manual
    # non-prefix sanity: exact term search of the expansion superset covers
    # at least the exact-term hits
    exact = reader.search(exp[0], k=5)
    assert set(d for d, _ in exact) <= set(
        d for d, _ in reader.search_prefix("enc", k=reader.n_docs)
    )
    assert reader.expand_prefix("zzzzno") == []
    assert reader.search_prefix("zzzzno", k=5) == []


def test_search_with_keys(built, spark):
    idx_dir, _, corpus = built
    reader = IndexReader(spark, idx_dir)
    hits = reader.search_with_keys("merge segment posting", k=5)
    assert len(hits) == 5
    for h in hits:
        assert {"doc_id", "score", "repo", "path", "commit", "sha256"} <= set(h)
    # keys resolve to real corpus rows
    row = corpus.filter(
        (F.col("repo") == hits[0]["repo"]) & (F.col("path") == hits[0]["path"])
    ).collect()
    assert len(row) == 1


def test_minimum_should_match(spark, tmp_path):
    """ES minimum_should_match: docs below the distinct-term floor are
    excluded regardless of score — dense and WAND paths agree with a
    brute-force model."""
    from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    docs = [
        ("r", "0", "c", "t", "alpha alpha alpha alpha alpha"),   # 1 term, high tf
        ("r", "1", "c", "t", "alpha beta filler words here"),    # 2 terms
        ("r", "2", "c", "t", "alpha beta gamma more filler"),    # 3 terms
        ("r", "3", "c", "t", "unrelated content entirely"),
    ]
    idx = str(tmp_path / "msm")
    df = spark.createDataFrame(
        docs, "repo string, path string, commit string, lang string, content string"
    )
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    reader = IndexReader(spark, idx)
    q = "alpha beta gamma"
    qterms = set(tokenize_py(q))
    texts = {int(p): set(tokenize_py(c)) for _, p, _, _, c in docs}
    id_of = {r["path"]: r["doc_id"] for r in spark.read.parquet(f"{idx}/docs").collect()}
    base = dict(reader.search(q, k=10))
    for m in (1, 2, 3):
        want = {
            id_of[str(p)]
            for p, toks in texts.items()
            if len(qterms & toks) >= m
        }
        dense = reader.search(q, k=10, min_should_match=m)
        assert {d for d, _ in dense} == want, m
        # scores unchanged — mSM only filters
        assert all(s == base[d] for d, s in dense)
        reader.DENSE_LIMIT = 0
        try:
            assert reader.search(q, k=10, min_should_match=m) == dense, m
        finally:
            del reader.DENSE_LIMIT
    assert reader.search(q, k=10, min_should_match=4) == []


def test_search_after_pagination(spark, sf_dir, tmp_path):
    """ES search_after: paging via a (score, doc_id) cursor tiles the full
    ranking without overlap — the deep-pagination path that never
    materializes page*k rows."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
    from elasticsearch_jdbc_spark.sources import corpus_from_documents

    idx = str(tmp_path / "pg")
    IndexBuilder(spark, idx, partitions=4).build(
        corpus_from_documents(spark, sf_dir), resume=False
    )
    reader = IndexReader(spark, idx)
    q = "fast key merge sort"
    full = [(r["doc_id"], r["score"]) for r in reader.search_df(q, k=15).collect()]
    pages, cursor = [], None
    for _ in range(3):
        page = [
            (r["doc_id"], r["score"])
            for r in reader.search_df(q, k=5, search_after=cursor).collect()
        ]
        assert len(page) <= 5
        pages += page
        if len(page) < 5:
            break
        last_doc, last_score = page[-1]
        cursor = (last_score, last_doc)  # ES sort-values order (score, doc)
    assert pages == full


def test_explain_and_count(spark, sf_dir, tmp_path):
    """ES _explain/_count analogues: per-term breakdown sums exactly to the
    search() score; count equals the unranked match-set size, mSM-aware."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
    from elasticsearch_jdbc_spark.sources import corpus_from_documents

    idx = str(tmp_path / "ex")
    IndexBuilder(spark, idx, partitions=4).build(
        corpus_from_documents(spark, sf_dir), resume=False
    )
    reader = IndexReader(spark, idx)
    q = "fast key merge sort"
    hits = reader.search(q, k=5)
    for doc, score in hits:
        ex = reader.explain(q, doc)
        assert ex["score"] == score  # same decode + accumulation order
        assert ex["matched"] == len(ex["terms"]) >= 1
        assert abs(sum(t["contribution"] for t in ex["terms"].values()) - score) < 1e-12
        for t, d in ex["terms"].items():
            assert d["tf"] >= 1 and d["idf"] > 0
    # a doc that matches nothing explains to zero
    no = reader.explain("zzznope", hits[0][0])
    assert no["score"] == 0.0 and no["matched"] == 0
    # count == size of the full match set, for each mSM level
    for msm in (1, 2, 4):
        want = len(reader.search(q, k=reader.n_docs, min_should_match=msm))
        assert reader.count(q, min_should_match=msm) == want, msm
    assert reader.count("zzznope") == 0


def test_facet_df_matches_brute(spark, sf_dir, tmp_path):
    """ES terms-agg over the match set: bucket counts equal a brute-force
    scan, best scores equal the per-doc search scores."""
    from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
    from elasticsearch_jdbc_spark.sources import corpus_from_documents

    idx = str(tmp_path / "fc")
    corpus = corpus_from_documents(spark, sf_dir)
    IndexBuilder(spark, idx, partitions=4).build(corpus, resume=False)
    reader = IndexReader(spark, idx)
    q = "fast key merge sort"
    buckets = {
        r["lang"]: (r["n_docs"], r["max_score"])
        for r in reader.facet_df(q, by="lang").collect()
    }
    # brute: tokenize every doc, bucket the matchers by lang
    qterms = set(reader.query_terms(q))
    rows = corpus.collect()
    docs_meta = {
        (r["repo"], r["path"], r["commit"]): r["lang"] for r in rows
    }
    matches = {}
    for r in rows:
        if qterms & set(tokenize_py(r["content"])):
            matches[r["lang"]] = matches.get(r["lang"], 0) + 1
    assert {b: n for b, (n, _) in buckets.items()} == matches
    assert sum(n for n, _ in buckets.values()) == reader.count(q)
    # best score per bucket belongs to a real hit with that score
    all_hits = dict(reader.search(q, k=reader.n_docs))
    id2lang = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{idx}/docs").collect()
    }
    for lang, (_, mx) in buckets.items():
        best = max(
            s for d, s in all_hits.items() if id2lang[d] == lang
        )
        assert abs(mx - best) < 1e-9, lang
    with pytest.raises(ValueError, match="facet column"):
        reader.facet_df(q, by="nope")
