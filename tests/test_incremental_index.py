"""Delta/tombstone incremental index semantics (reference optype sink,
SinkKeyValueStreamListener.java:57-77 + column strategy deletes,
ColumnSource.java:116-190): upsert masks the old version, delete masks
entirely, compaction folds segments back into one exact index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

KEYS = ("repo", "path", "commit")


@pytest.fixture(scope="module")
def base_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("inc") / "idx")
    corpus = synthetic_corpus(spark, n_files=300, seed=3).cache()
    b = IndexBuilder(spark, idx, partitions=4)
    b.reset()
    b.build(corpus, resume=False)
    return idx, corpus


def _key_of(reader, spark, seg, doc_id):
    docs = reader.live_docs()
    r = docs.filter((F.col("segment") == seg) & (F.col("doc_id") == doc_id)).collect()
    return tuple(r[0][k] for k in KEYS) if r else None


def test_delete_masks_doc(spark, base_idx):
    idx, corpus = base_idx
    reader = IncrementalIndexReader(spark, idx)
    hits = reader.search("merge segment buffer", k=3)
    assert hits
    seg, did, _ = hits[0]
    victim = _key_of(reader, spark, seg, did)
    ops = (
        corpus.filter(
            (F.col(KEYS[0]) == victim[0])
            & (F.col(KEYS[1]) == victim[1])
            & (F.col(KEYS[2]) == victim[2])
        ).withColumn("_optype", F.lit("delete"))
    )
    res = apply_incremental(spark, idx, ops)
    assert res["tombstones"] >= 1 and res["upserts"] == 0

    r2 = IncrementalIndexReader(spark, idx)
    live_keys = {
        tuple(r[k] for k in KEYS) for r in r2.live_docs().collect()
    }
    assert victim not in live_keys
    for s, d, _sc in r2.search("merge segment buffer", k=5):
        assert _key_of(r2, spark, s, d) != victim
    assert r2.n_docs == reader.n_docs - 1


def test_upsert_replaces_content(spark, base_idx):
    idx, corpus = base_idx
    r1 = IncrementalIndexReader(spark, idx)
    row = corpus.limit(1).collect()[0]
    key = tuple(row[k] for k in KEYS)
    new_content = "zanzibar quixotic flume " * 5
    ops = spark.createDataFrame(
        [(*key, row["lang"], new_content, "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    res = apply_incremental(spark, idx, ops)
    assert res["upserts"] == 1 and res["tombstones"] >= 1

    r2 = IncrementalIndexReader(spark, idx)
    assert r2.n_docs == r1.n_docs  # one masked, one added
    hits = r2.search("zanzibar quixotic flume", k=3)
    assert hits, "new content must be findable"
    seg, did, _ = hits[0]
    assert seg.startswith("delta="), "hit must come from the delta segment"
    assert _key_of(r2, spark, seg, did) == key
    # the same key appears exactly once among live docs
    n = (
        r2.live_docs()
        .filter(
            (F.col(KEYS[0]) == key[0])
            & (F.col(KEYS[1]) == key[1])
            & (F.col(KEYS[2]) == key[2])
        )
        .count()
    )
    assert n == 1


def test_compaction_equals_fresh_build(spark, base_idx, tmp_path):
    """compact_to() over live tokenized rows == a from-scratch build of the
    live corpus: same n_docs, same search results (exact df restored)."""
    idx, corpus = base_idx
    r = IncrementalIndexReader(spark, idx)
    compact_dir = str(tmp_path / "compact")
    m = r.compact_to(compact_dir, partitions=4)
    assert m["n_docs"] == r.n_docs

    from elasticsearch_jdbc_spark.index import IndexReader

    cr = IndexReader(spark, compact_dir)
    hits = cr.search("merge segment buffer", k=5)
    assert hits
    # deleted victim still absent, upserted content present
    h2 = cr.search("zanzibar quixotic flume", k=1)
    assert h2
    # compare against an IncrementalIndexReader over the compacted dir:
    # stats now exact — idf from single segment
    r2 = IncrementalIndexReader(spark, compact_dir)
    assert [d for _s, d, _ in r2.search("merge segment buffer", k=5)] == [
        d for d, _ in hits
    ]


def test_should_compact_policy(spark, base_idx):
    r = IncrementalIndexReader(spark, base_idx[0])
    # after the delete + upsert above: few deltas, small tombstone fraction
    assert r.should_compact(max_deltas=0) is True      # any delta triggers
    assert r.should_compact(max_deltas=8, max_tombstone_frac=0.5) is False
    assert r.should_compact(max_deltas=8, max_tombstone_frac=0.001) is True


def test_search_df_matches_driver_search(spark, base_idx):
    """Distributed search over base+deltas is rank-identical to the driver
    path (same global stats, same tombstone masking, same tie-break)."""
    r = IncrementalIndexReader(spark, base_idx[0])
    for q in ["merge segment buffer", "zanzibar quixotic flume", "hash index scan"]:
        drv = r.search(q, k=10)
        dist = [
            (row["segment"], row["doc_id"], row["score"])
            for row in r.search_df(q, k=10).collect()
        ]
        assert [(s, d) for s, d, _ in dist] == [(s, d) for s, d, _ in drv]
        for (_, _, a), (_, _, b) in zip(dist, drv):
            assert abs(a - b) < 1e-9


def test_tie_break_newest_segment_wins(spark, tmp_path):
    """Two live docs with identical content (base vs delta) score equally;
    the delta (newest) doc must rank first — driver AND distributed path."""
    idx = str(tmp_path / "tie")
    base = spark.createDataFrame(
        [
            ("r", "a.txt", "c1", "py", "xylophone zebra quartet"),
            ("r", "b.txt", "c1", "py", "unrelated filler content here"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    b = IndexBuilder(spark, idx, partitions=2)
    b.reset()
    b.build(base, resume=False)
    ops = spark.createDataFrame(
        [("r", "z.txt", "c2", "py", "xylophone zebra quartet", "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    hits = r.search("xylophone zebra", k=3)
    assert len(hits) == 2
    assert abs(hits[0][2] - hits[1][2]) < 1e-12, "scores must tie"
    assert hits[0][0].startswith("delta="), "newest segment must win the tie"
    assert hits[1][0] == ""
    dist = r.search_df("xylophone zebra", k=3).collect()
    assert dist[0]["segment"].startswith("delta=")
    assert dist[1]["segment"] == ""


def test_delta_inherits_index_contract(spark, tmp_path):
    """Deltas and compactions carry the base manifest's k1/b/block_size/
    with_positions/lang_filter through (ADVICE: defaults here silently
    rescore or drop phrase capability)."""
    import json as _json
    import os as _os

    from elasticsearch_jdbc_spark.index import IndexReader

    idx = str(tmp_path / "contract")
    corpus = synthetic_corpus(spark, n_files=60, seed=7)
    b = IndexBuilder(
        spark, idx, partitions=2, k1=1.6, b=0.6, block_size=64, with_positions=True
    )
    b.reset()
    b.build(corpus, resume=False)
    ops = spark.createDataFrame(
        [("r", "new.txt", "c9", "py", "grape banana grape banana", "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    res = apply_incremental(spark, idx, ops)
    with open(_os.path.join(idx, f"delta={res['delta']}", "manifest.json")) as f:
        dm = _json.load(f)
    assert (dm["k1"], dm["b"], dm["block_size"], dm["with_positions"]) == (
        1.6, 0.6, 64, True,
    )
    # full compaction keeps the contract too — phrase search still works
    r = IncrementalIndexReader(spark, idx)
    cdir = str(tmp_path / "contract_compact")
    r.compact_to(cdir, partitions=2)
    cr = IndexReader(spark, cdir)
    assert (cr.k1, cr.b) == (1.6, 0.6)
    assert cr.manifest["with_positions"] is True
    assert cr.search_phrase("grape banana", k=3), "positions must survive compaction"


def test_compact_deltas_tiered(spark, tmp_path):
    """Minor compaction merges ONLY deltas: base untouched byte-for-byte,
    results identical (delta batches are pure inserts + one base delete, so
    no df drift), segments.json commit point honored by later deltas."""
    import os as _os

    idx = str(tmp_path / "tiered")
    corpus = synthetic_corpus(spark, n_files=200, seed=11).cache()
    b = IndexBuilder(spark, idx, partitions=2)
    b.reset()
    b.build(corpus, resume=False)
    # two pure-insert delta batches with brand-new keys
    ops1 = spark.createDataFrame(
        [("r2", "n1.txt", "c1", "py", "quixotic flume zanzibar engine", "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    ops2 = spark.createDataFrame(
        [("r2", "n2.txt", "c1", "py", "quixotic flume harbor engine", "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    apply_incremental(spark, idx, ops1)
    apply_incremental(spark, idx, ops2)
    # one delete of a base doc
    victim = corpus.limit(1).collect()[0]
    dele = spark.createDataFrame(
        [(victim["repo"], victim["path"], victim["commit"], victim["lang"], victim["content"], "delete")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    apply_incremental(spark, idx, dele)

    r = IncrementalIndexReader(spark, idx)
    before = r.search("quixotic flume", k=10)
    # resolve keys NOW — compaction removes the old delta dirs
    before_keyed = [
        (_key_of(r, spark, s, d), round(sc, 9)) for s, d, sc in before
    ]
    n_before = r.n_docs
    base_files = {
        f: _os.path.getmtime(_os.path.join(idx, "postings", f))
        for f in _os.listdir(_os.path.join(idx, "postings"))
    }
    # refuse when deltas are too big relative to the base
    assert r.compact_deltas(max_ratio=1e-9) is None
    m = r.compact_deltas(partitions=2)
    assert m is not None and m["n_docs"] == 2

    after_files = {
        f: _os.path.getmtime(_os.path.join(idx, "postings", f))
        for f in _os.listdir(_os.path.join(idx, "postings"))
    }
    assert after_files == base_files, "base segment must not be rewritten"

    r2 = IncrementalIndexReader(spark, idx)
    assert r2.segments[0] == "" and len(r2.segments) == 2
    assert r2.n_docs == n_before
    after = r2.search("quixotic flume", k=10)
    # delta doc_ids are reassigned by the merge — compare by doc KEY, and
    # tie-insensitively (equal-score docs legitimately reorder when their
    # segments merge: recency rank collapses to doc_id order, as in Lucene)
    after_keyed = [
        (_key_of(r2, spark, s, d), round(sc, 9)) for s, d, sc in after
    ]
    canon = lambda rows: sorted(rows, key=lambda x: (-x[1], x[0]))  # noqa: E731
    assert canon(after_keyed) == canon(before_keyed)
    # the deleted base doc stays masked (its tombstone carried forward)
    live_keys = {tuple(x[k] for k in KEYS) for x in r2.live_docs().collect()}
    assert (victim["repo"], victim["path"], victim["commit"]) not in live_keys
    # a post-compaction delta lands in segments.json and is searchable
    ops3 = spark.createDataFrame(
        [("r3", "n3.txt", "c1", "py", "brand new post compact doc", "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    apply_incremental(spark, idx, ops3)
    r3 = IncrementalIndexReader(spark, idx)
    assert len(r3.segments) == 3
    assert r3.search("post compact doc", k=1)


def test_incremental_phrase_search(spark, tmp_path):
    """Cross-segment phrase search: global stats, tombstone masking,
    equals a full compaction rebuild when nothing is masked."""
    idx = str(tmp_path / "phr")
    base = spark.createDataFrame(
        [
            ("r", "a.txt", "c1", "py", "alpha beta gamma delta"),
            ("r", "b.txt", "c1", "py", "beta alpha noise words here"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    b = IndexBuilder(spark, idx, partitions=2, with_positions=True)
    b.reset()
    b.build(base, resume=False)
    ops = spark.createDataFrame(
        [("r", "c.txt", "c2", "py", "alpha beta again alpha beta", "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    hits = r.search_phrase("alpha beta", k=5)
    keys = [_key_of(r, spark, s, d) for s, d, _ in hits]
    assert ("r", "c.txt", "c2") in keys and ("r", "a.txt", "c1") in keys
    assert ("r", "b.txt", "c1") not in keys  # non-adjacent order never matches
    # pf=2 in the delta doc outranks pf=1 (shorter dl also helps)
    assert keys[0] == ("r", "c.txt", "c2")
    # no masked docs -> identical to a compacted rebuild (exact df)
    cdir = str(tmp_path / "phr_compact")
    r.compact_to(cdir, partitions=2)
    rc = IncrementalIndexReader(spark, cdir)
    chits = rc.search_phrase("alpha beta", k=5)
    ckeys = [_key_of(rc, spark, s, d) for s, d, _ in chits]
    assert ckeys == keys
    assert [round(s, 9) for _, _, s in chits] == [round(s, 9) for _, _, s in hits]
    # delete the top doc: its phrase hit disappears
    dele = spark.createDataFrame(
        [("r", "c.txt", "c2", "py", "", "delete")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    apply_incremental(spark, idx, dele)
    r2 = IncrementalIndexReader(spark, idx)
    keys2 = [_key_of(r2, spark, s, d) for s, d, _ in r2.search_phrase("alpha beta", k=5)]
    assert ("r", "c.txt", "c2") not in keys2 and ("r", "a.txt", "c1") in keys2


def test_incremental_prefix_and_fuzzy(spark, tmp_path):
    """Expanded-term search across segments: a delta-only term must be
    found by prefix AND fuzzy expansion (per-segment vocab union); results
    equal a compacted rebuild when nothing is masked."""
    idx = str(tmp_path / "exp")
    base = spark.createDataFrame(
        [
            ("r", "a.txt", "c1", "py", "quantify the results"),
            ("r", "b.txt", "c1", "py", "other unrelated words"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    b = IndexBuilder(spark, idx, partitions=2)
    b.reset()
    b.build(base, resume=False)
    ops = spark.createDataFrame(
        [("r", "c.txt", "c2", "py", "quantum leap forward", "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    # prefix 'quant' matches base 'quantify' AND delta-only 'quantum'
    pref = r.search_prefix("quant", k=5)
    pref_keys = {_key_of(r, spark, s, d) for s, d, _ in pref}
    assert ("r", "a.txt", "c1") in pref_keys and ("r", "c.txt", "c2") in pref_keys
    # fuzzy 'quantun' (1 edit from delta-only 'quantum')
    fz = r.search_fuzzy("quantun", k=5, fuzziness=1)
    fz_keys = {_key_of(r, spark, s, d) for s, d, _ in fz}
    assert fz_keys == {("r", "c.txt", "c2")}
    # no masks -> identical ranking+scores vs a compacted rebuild
    cdir = str(tmp_path / "exp_compact")
    r.compact_to(cdir, partitions=2)
    rc = IncrementalIndexReader(spark, cdir)
    for got, want in (
        (pref, rc.search_prefix("quant", k=5)),
        (fz, rc.search_fuzzy("quantun", k=5, fuzziness=1)),
    ):
        assert [(_key_of(r, spark, s, d), round(sc, 9)) for s, d, sc in got] == [
            (_key_of(rc, spark, s, d), round(sc, 9)) for s, d, sc in want
        ]


def test_incremental_search_with_keys(spark, base_idx):
    r = IncrementalIndexReader(spark, base_idx[0])
    hits = r.search_with_keys("merge segment buffer", k=3)
    assert len(hits) == 3
    for h in hits:
        assert {"segment", "doc_id", "score", *KEYS} <= set(h)
        assert _key_of(r, spark, h["segment"], h["doc_id"]) == tuple(
            h[k] for k in KEYS
        )
