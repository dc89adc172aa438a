"""Regression pins for the round-5 core-hardening review: dispatcher
keyword bugs, crash-window ordering in apply_incremental, snapshot
commit-point pinning/ordering, schema evolution across segments,
index-contract inheritance (text_col, index_sort generations), ngram
sidecars across tiered compaction, and segment-rank tie-breaks."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.index.storage import LocalFS, MemoryFS

SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def _mk(spark, d, rows, schema=SCHEMA, **kw):
    IndexBuilder(spark, d, partitions=2, **kw).build(
        spark.createDataFrame(rows, schema), resume=False
    )
    return d


def test_best_fields_filter_sql_keyword(spark, tmp_path):
    """multi_match best_fields + filter_sql: the filter must APPLY (it
    used to land positionally in search_after and crash)."""
    d = str(tmp_path / "bf")
    rows = [("r", f"{i}", "c", "t", "merge quick value",
             "merge QUICK") for i in range(6)]
    IndexBuilder(spark, d, partitions=1,
                 fields=["content", "extra"]).build(
        spark.createDataFrame(
            rows, SCHEMA + ", extra string"), resume=False)
    for r in (IndexReader(spark, d), IncrementalIndexReader(spark, d)):
        out = r.multi_match_df(
            "merge", match_type="best_fields", k=10,
            filter_sql="path in ('1', '2')",
        ).collect()
        assert len(out) == 2


def test_fs_rename_local_and_memory(tmp_path):
    lfs = LocalFS()
    src = str(tmp_path / "a")
    os.makedirs(src)
    open(os.path.join(src, "x.txt"), "w").write("1")
    lfs.rename(src, str(tmp_path / "b"))
    assert not os.path.exists(src)
    assert open(str(tmp_path / "b/x.txt")).read() == "1"
    mfs = MemoryFS()
    mfs.makedirs("/t/a")
    mfs.write_text("/t/a/x.txt", "1")
    mfs.rename("/t/a", "/t/b")
    assert not mfs.isdir("/t/a") and mfs.isdir("/t/b")
    assert mfs.read_text("/t/b/x.txt") == "1"
    mfs.rename("/t/b/x.txt", "/t/b/y.txt")
    assert mfs.read_text("/t/b/y.txt") == "1"


def test_staged_tombstones_never_masked_early(spark, tmp_path):
    """A stale '.staging-*' tombstone dir (a crashed batch) must be
    ignored by readers and swept by the next apply; the published batch
    still lands under the plain delta=N name."""
    d = _mk(spark, str(tmp_path / "st"),
            [("r", f"{i}", "c", "t", "alpha beta") for i in range(6)])
    # forge a stale staging dir holding a would-be tombstone for doc 0
    r0 = IncrementalIndexReader(spark, d)
    stale = os.path.join(d, "tombstones", ".staging-delta=9")
    os.makedirs(stale)
    r0.live_docs().filter(F.col("path") == "0").select(
        "segment", "doc_id", "dl"
    ).write.mode("overwrite").parquet(stale)
    r1 = IncrementalIndexReader(spark, d)
    assert r1.live_docs().count() == 6  # staging is NOT a tombstone source
    # a real batch sweeps the stale dir and publishes its own atomically
    ops = spark.createDataFrame(
        [("r", "1", "c", "t", "alpha beta", "delete")],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, d, ops)
    assert not os.path.exists(stale)
    r2 = IncrementalIndexReader(spark, d)
    assert r2.live_docs().count() == 5
    assert sorted(
        x["path"] for x in r2.live_docs().select("path").collect()
    ) == ["0", "2", "3", "4", "5"]


def test_live_docs_schema_evolution(spark, tmp_path):
    """A delta batch with a DIFFERENT metadata column set must not break
    live surfaces: missing columns union as NULL (ES sparse fields)."""
    d = _mk(spark, str(tmp_path / "ev"),
            [("r", "0", "c", "t", "alpha", 5)],
            SCHEMA + ", stars long")
    ops = spark.createDataFrame(
        [("r", "1", "c", "t", "alpha", "new", "index")],
        SCHEMA + ", extra string, _optype string",
    )
    apply_incremental(spark, d, ops)
    r = IncrementalIndexReader(spark, d)
    rows = {x["path"]: x for x in r.live_docs().collect()}
    assert rows["0"]["stars"] == 5 and rows["0"]["extra"] is None
    assert rows["1"]["extra"] == "new" and rows["1"]["stars"] is None
    # filter context over the evolved column still compiles
    got = r.search_dsl_df(
        {"bool": {"must": [{"match": {"content": "alpha"}}],
                  "filter": [{"exists": {"field": "stars"}}]}},
        k=None,
    )
    assert got.count() == 1


def test_update_by_query_custom_text_col(spark, tmp_path):
    """text_col is part of the recorded index contract: update batches
    on a text_col='body' index must tokenize 'body' (it used to default
    back to 'content' and crash)."""
    schema = "repo string, path string, commit string, lang string, body string"
    d = str(tmp_path / "tc")
    IndexBuilder(spark, d, partitions=1, text_col="body").build(
        spark.createDataFrame(
            [("r", "0", "c", "t", "alpha beta"),
             ("r", "1", "c", "t", "gamma delta")], schema),
        resume=False,
    )
    ops = spark.createDataFrame(
        [("r", "0", "c", "t", "epsilon zeta", "index")],
        schema + ", _optype string",
    )
    apply_incremental(spark, d, ops)
    r = IncrementalIndexReader(spark, d)
    assert r.search_df("epsilon", k=None).count() == 1
    assert r.search_df("alpha", k=None).count() == 0  # old version masked


def test_live_hits_df_segment_rank_tiebreak(spark, tmp_path):
    """Equal-score ties in hits_df order by segment RANK (newest first),
    not the segment string (which puts base first)."""
    d = _mk(spark, str(tmp_path / "tie"),
            [("r", "base0", "c", "t", "alpha")])
    ops = spark.createDataFrame(
        [("r", "newdoc", "c", "t", "alpha", "index")],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, d, ops)
    r = IncrementalIndexReader(spark, d)
    rows = r.hits_df("alpha", k=2).collect()
    assert len(rows) == 2
    assert rows[0]["segment"].startswith("delta="), "newest wins ties"


def test_snapshot_pins_commit_point(spark, tmp_path):
    """create_snapshot writes the PINNED segment list as segments.json —
    never the live file's bytes — and skips uncommitted delta dirs."""
    from elasticsearch_jdbc_spark.index.incremental_index import (
        _commit_segments,
    )
    from elasticsearch_jdbc_spark.index.snapshot import (
        create_snapshot,
        restore_snapshot,
    )

    d = _mk(spark, str(tmp_path / "sp"),
            [("r", "0", "c", "t", "alpha beta")])
    ops = spark.createDataFrame(
        [("r", "1", "c", "t", "alpha", "index")], SCHEMA + ", _optype string"
    )
    apply_incremental(spark, d, ops)
    # commit point lists ONLY the base — delta=0 exists but uncommitted
    _commit_segments(d, [""])
    repo = str(tmp_path / "repo")
    m = create_snapshot(d, repo, "s1")
    assert m["segments"] == [""]
    snap_cp = json.loads(
        open(os.path.join(repo, "snap=s1", "files", "segments.json")).read()
    )
    assert snap_cp == {"segments": [""]}
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "s1", dest)
    rr = IncrementalIndexReader(spark, dest)
    assert rr.segments == [""]
    assert rr.live_docs().count() == 1


def test_restore_orders_commit_files_last():
    """The restore copy order: data files, then delta manifests, then
    the base manifest, then segments.json very last."""
    from elasticsearch_jdbc_spark.index.snapshot import _commit_rank

    rels = [
        "segments.json", "manifest.json", "delta=0/manifest.json",
        "delta=0/postings/p.parquet", "docs/d.parquet", "terms/t.parquet",
    ]
    ordered = sorted(rels, key=lambda r: (_commit_rank(r), r))
    assert ordered[-1] == "segments.json"
    assert ordered[-2] == "manifest.json"
    assert ordered[-3] == "delta=0/manifest.json"
    assert set(ordered[:3]) == {
        "delta=0/postings/p.parquet", "docs/d.parquet", "terms/t.parquet"
    }


def test_compact_deltas_keeps_ngram_sidecar(spark, tmp_path):
    """Tiered compaction rebuilds the merged delta's bigram sidecar so
    phrase_suggest keeps working on ngram-enabled indexes."""
    from elasticsearch_jdbc_spark.index.phrase_suggest import (
        build_ngram_stats,
    )

    d = _mk(spark, str(tmp_path / "ng"),
            [("r", f"{i}", "c", "t", "merge segment buffer stream")
             for i in range(30)])
    build_ngram_stats(spark, d)
    for i in range(2):
        ops = spark.createDataFrame(
            [("r", f"n{i}", "c", "t", "merge segment extra", "index")],
            SCHEMA + ", _optype string",
        )
        apply_incremental(spark, d, ops)
    r = IncrementalIndexReader(spark, d)
    assert r.phrase_suggest("merge segmant")  # works pre-compaction
    merged = r.compact_deltas(max_ratio=10.0)
    assert merged is not None
    r2 = IncrementalIndexReader(spark, d)
    assert len(r2.segments) == 2  # base + one merged delta
    assert r2.phrase_suggest("merge segmant")  # still works


def test_generation_lifecycle_with_index_sort(spark, tmp_path):
    """init_generation/rollover on an index-sorted contract: the empty
    build's sort columns resolve with the SOURCE's types (it used to
    crash in repartitionByRange)."""
    from elasticsearch_jdbc_spark.index.alias import (
        compact_to_generation,
        flip_alias,
        generation_dir,
        init_generation,
        record_generation,
    )

    root = str(tmp_path / "gens")
    g1 = generation_dir(root, "g-000001")
    IndexBuilder(spark, g1, partitions=1,
                 index_sort=[("stars", "desc")]).build(
        spark.createDataFrame(
            [("r", "0", "c", "t", "alpha", 5),
             ("r", "1", "c", "t", "beta", 9)],
            SCHEMA + ", stars long"),
        resume=False,
    )
    record_generation(root, "g-000001", 1.0)
    flip_alias(root, "g-000001")
    g2 = init_generation(spark, root, "g-000002")
    assert os.path.exists(os.path.join(g2, "manifest.json"))
    # the empty generation inherited the sort contract
    m = json.loads(open(os.path.join(g2, "manifest.json")).read())
    assert m["index_sort"] == [["stars", "desc"]] or m["index_sort"] == [("stars", "desc")]
    # collision guard: compacting onto an existing generation refuses
    r = IncrementalIndexReader(spark, g1)
    with pytest.raises(ValueError, match="already exists"):
        compact_to_generation(r, root, "g-000002")


def test_phrase_on_fields_corpus_all_surfaces(spark, tmp_path):
    """Quoted phrases on a fields-indexed corpus: multi_match
    type=phrase and query_string phrases fold per-field matches
    best_fields-style instead of raising the pass-field error. Both
    tiers."""
    d = str(tmp_path / "phf")
    rows = [
        ("r", "0", "c", "t", "fast key lookup", "other words"),
        ("r", "1", "c", "t", "other words", "fast key here"),
        ("r", "2", "c", "t", "fast lane key", "nothing"),
    ]
    IndexBuilder(spark, d, partitions=1, with_positions=True,
                 fields=["content", "extra"]).build(
        spark.createDataFrame(rows, SCHEMA + ", extra string"),
        resume=False,
    )
    for r in (IndexReader(spark, d), IncrementalIndexReader(spark, d)):
        m = {x["doc_id"]: x["path"]
             for x in spark.read.parquet(f"{d}/docs").collect()}
        got = sorted(
            m[x["doc_id"]]
            for x in r.multi_match_df("fast key", match_type="phrase",
                                      k=None).collect()
        )
        assert got == ["0", "1"]  # phrase found in EITHER field
        qs = sorted(
            m[x["doc_id"]]
            for x in r.query_string_df('"fast key" lane', k=None).collect()
        )
        assert "0" in qs and "1" in qs and "2" in qs
        # negated phrase excludes across fields too
        neg = sorted(
            m[x["doc_id"]]
            for x in r.query_string_df('fast -"fast key"', k=None).collect()
        )
        assert neg == ["2"]


def test_zero_fill_fp_grid_exact(spark):
    """Histogram dense fill joins on an integer grid index: buckets at
    0.0..0.5 step 0.1 keep all six (the FP quotient used to truncate the
    grid to five and ulp-mismatched keys zeroed real counts)."""
    from elasticsearch_jdbc_spark.index.aggs import zero_fill_buckets

    buckets = spark.createDataFrame(
        [(i * 0.1, 10 + i) for i in range(6) if i != 2],
        "bucket double, n_docs long",
    )
    out = zero_fill_buckets(buckets, 0.1).collect()
    assert len(out) == 6
    got = {round(x["bucket"], 6): x["n_docs"] for x in out}
    assert got[0.5] == 15          # the last REAL bucket survives
    assert got[0.2] == 0           # the gap fills with zero
    assert sum(v for v in got.values()) == 10 + 11 + 13 + 14 + 15


def test_matrix_stats_complete_pair_count(spark):
    """The pair row's count is the COMPLETE-pair n the covariance was
    computed over, not least(n_a, n_b)."""
    from elasticsearch_jdbc_spark.index.aggs import matrix_stats

    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (None, 5.0), (4.0, 6.0), (5.0, 7.0)],
        "a double, b double",
    )
    rows = {(x["field_a"], x["field_b"]): x
            for x in matrix_stats(df, ["a", "b"]).collect()}
    assert rows[("a", "b")]["count"] == 2  # only two complete pairs
    assert rows[("a", "a")]["count"] == 4
    assert rows[("b", "b")]["count"] == 3


def test_cumulative_cardinality_null_buckets(spark):
    """NULL bucket values are excluded: no leading NULL bucket, no
    undercounted curve."""
    from elasticsearch_jdbc_spark.index.aggs import cumulative_cardinality

    df = spark.createDataFrame(
        [(None, "u1"), ("2024-01-01", "u1"), ("2024-01-01", "u2"),
         ("2024-01-02", "u2"), ("2024-01-02", "u3")],
        "b string, u string",
    )
    out = cumulative_cardinality(df, "b", "u").collect()
    assert [x["b"] for x in out] == ["2024-01-01", "2024-01-02"]
    assert [x["value"] for x in out] == [2, 3]


def test_ks_test_empty_buckets_clear_error(spark):
    from elasticsearch_jdbc_spark.index.aggs import bucket_count_ks_test

    empty = spark.createDataFrame([], "k string, n long")
    with pytest.raises(ValueError, match="non-empty bucket list"):
        bucket_count_ks_test(empty, "k", "n")


def test_hits_df_k_none_unranked(spark, tmp_path):
    """hits_df honors the engine-wide k=None unranked contract: no
    global Sort over the full enriched match set."""
    d = _mk(spark, str(tmp_path / "hk"),
            [("r", f"{i}", "c", "t", "alpha beta") for i in range(5)])
    r = IndexReader(spark, d)
    df = r.hits_df("alpha", k=None)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Sort" not in plan
    assert df.count() == 5


def test_cosine_zero_norm_null_not_crash(spark):
    """Zero-norm embeddings score NULL — never a DIVIDE_BY_ZERO under
    ANSI, never a NaN rank-1 neighbor."""
    from elasticsearch_jdbc_spark.operators.similarity import knn_bruteforce

    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.6, 0.8])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, qvec array<double>"
    )
    rows = knn_bruteforce(corpus, q, k=3).collect()
    ids = [x["neighbor_id"] for x in rows]
    assert ids[0] == 1            # the true neighbor leads
    assert 0 not in ids[:2]       # the zero vector never outranks real ones


def test_minhash_bands_validation_and_chunk_identity(spark):
    from elasticsearch_jdbc_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " * 3) for i in range(4)],
        "id long, text string",
    )
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(df, "id", "text", num_perm=8, bands=16)
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(df, "id", "text", num_perm=64, bands=12)
    # the permutation-chunked kernel is bit-identical at a non-multiple
    # perm count (num_perm=20 -> chunks 8+8+4)
    sigs = {x["id"]: x["sig"]
            for x in minhash_signatures(df, "id", "text",
                                        num_perm=20).collect()}
    assert len(sigs) == 4 and all(len(s) == 20 for s in sigs.values())
    assert sigs[0] == sigs[1]  # identical docs, identical signatures


def test_exact_dedup_null_text_singletons(spark):
    from elasticsearch_jdbc_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same")],
        "id long, text string",
    )
    out = {x["keep_id"]: x["n_copies"] for x in exact_dedup(df, "id", "text").collect()}
    assert out == {1: 1, 2: 1, 3: 2}  # null texts never cluster


def test_paragraph_dedup_metachar_separator(spark):
    from elasticsearch_jdbc_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "keep me|dup line|tail one"), (2, "dup line|other text")],
        "id long, text string",
    )
    out = {x["id"]: x["text"]
           for x in paragraph_dedup(df, "id", "text", sep="|",
                                    max_docs=1).collect()}
    # 'dup line' occurs in BOTH docs -> dropped everywhere; the other
    # lines survive intact (previously '|' split per CHARACTER and the
    # reassembled text was shredded)
    assert out[1] == "keep me|tail one"
    assert out[2] == "other text"


def test_substring_scrub_keeps_empty_docs(spark):
    from elasticsearch_jdbc_spark.operators.dedup import exact_substring_scrub

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, ""), (3, "   ")],
        "id long, text string",
    )
    out = {x["id"]: x for x in exact_substring_scrub(df, "id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_tokens"] == 0 and out[2]["n_removed"] == 0
    assert out[3]["text"] == ""


def test_knn_ivf_empty_filter_clear_error(spark):
    from elasticsearch_jdbc_spark.operators.similarity import kmeans_centroids

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors to cluster"):
        kmeans_centroids(empty, k=2, vec_col="embedding")


def test_synthetic_corpus_avg_tokens_guard(spark):
    from elasticsearch_jdbc_spark.sources import synthetic_corpus

    with pytest.raises(ValueError, match="avg_tokens"):
        synthetic_corpus(spark, n_files=5, avg_tokens=1)
