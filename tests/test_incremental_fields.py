"""Fields-aware incremental search (VERDICT r02 #2: the incremental reader
must namespace query tokens per field like IndexReader, never silently
return []), plus lazy/stale-filtered tombstone loading (VERDICT r02 #3,
ADVICE r02 medium)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "title string, body string"
)
BASE = [
    ("r", "0", "c", "t", "spark engine", "a long body about other things"),
    ("r", "1", "c", "t", "unrelated title", "spark spark spark body text"),
    ("r", "2", "c", "t", "engine room", "machinery and boilers"),
]
DELTA = [
    ("r", "3", "c", "t", "spark delta doc", "fresh body content", "create"),
    # dl differs from doc 3's so no cross-doc score tie (tie order would
    # depend on internal doc_ids, which differ between the incremental and
    # rebuilt layouts)
    ("r", "4", "c", "t", "quiet calm title", "spark appears here too", "create"),
]


@pytest.fixture()
def inc_idx(spark, tmp_path):
    idx = str(tmp_path / "idx")
    IndexBuilder(
        spark, idx, partitions=2, fields=["title", "body"], with_positions=True
    ).build(spark.createDataFrame(BASE, SCHEMA), resume=False)
    ops = spark.createDataFrame(DELTA, SCHEMA + ", _optype string")
    apply_incremental(spark, idx, ops)
    return idx


def _full_idx(spark, tmp_path):
    """From-scratch rebuild over base+delta (no masked docs, so scores must
    match the incremental reader exactly)."""
    idx = str(tmp_path / "full")
    rows = BASE + [d[:-1] for d in DELTA]
    IndexBuilder(
        spark, idx, partitions=2, fields=["title", "body"], with_positions=True
    ).build(spark.createDataFrame(rows, SCHEMA), resume=False)
    return IndexReader(spark, idx)


def _paths(reader, spark, hits):
    live = {
        (r["segment"], r["doc_id"]): r["path"]
        for r in reader.live_docs().collect()
    }
    return [(live[(s, d)], round(sc, 9)) for s, d, sc in hits]


def _full_paths(full, hits):
    meta = full.lookup_docs([d for d, _ in hits])
    return [(meta[d]["path"], round(s, 9)) for d, s in hits]


def test_fields_search_matches_full_rebuild(spark, inc_idx, tmp_path):
    inc = IncrementalIndexReader(spark, inc_idx)
    full = _full_idx(spark, tmp_path)
    assert inc.fields == ["title", "body"]
    for q in ("spark", "spark engine", "machinery"):
        got = _paths(inc, spark, inc.search(q, k=10))
        want = _full_paths(full, full.search(q, k=10))
        assert got == want, q
    # boosted multi_match parity
    for boosts in ({"title": 10.0, "body": 1.0}, {"title": 1.0}):
        got = _paths(inc, spark, inc.search_fields("spark", boosts=boosts, k=10))
        want = _full_paths(full, full.search_fields("spark", boosts=boosts, k=10))
        assert got == want, boosts


def test_fields_search_df_matches_driver(spark, inc_idx):
    inc = IncrementalIndexReader(spark, inc_idx)
    drv = inc.search("spark engine", k=10)
    dist = [
        (r["segment"], r["doc_id"], r["score"])
        for r in inc.search_df("spark engine", k=10).collect()
    ]
    assert [(s, d, round(sc, 9)) for s, d, sc in dist] == [
        (s, d, round(sc, 9)) for s, d, sc in drv
    ]
    boosted_drv = inc.search_fields("spark", boosts={"title": 5.0, "body": 1.0}, k=10)
    boosted_dist = [
        (r["segment"], r["doc_id"], round(r["score"], 9))
        for r in inc.search_fields_df(
            "spark", boosts={"title": 5.0, "body": 1.0}, k=10
        ).collect()
    ]
    assert boosted_dist == [(s, d, round(sc, 9)) for s, d, sc in boosted_drv]


def test_fields_prefix_fuzzy_phrase_surfaces(spark, inc_idx, tmp_path):
    inc = IncrementalIndexReader(spark, inc_idx)
    full = _full_idx(spark, tmp_path)
    got = _paths(inc, spark, inc.search_prefix("spar", k=10))
    assert got == _full_paths(full, full.search_prefix("spar", k=10))
    only_title = _paths(
        inc, spark, inc.search_prefix("spar", boosts={"title": 1.0}, k=10)
    )
    assert {p for p, _ in only_title} == {"0", "3"}
    fz = _paths(inc, spark, inc.search_fuzzy("sparkk", fuzziness=1, k=10))
    assert fz == _full_paths(full, full.search_fuzzy("sparkk", fuzziness=1, k=10))
    # phrase requires an explicit field on a fields index (both readers)
    with pytest.raises(ValueError, match="field"):
        inc.search_phrase("spark engine")
    with pytest.raises(ValueError, match="field"):
        full.search_phrase("spark engine")
    ph = _paths(inc, spark, inc.search_phrase("spark engine", field="title"))
    assert [p for p, _ in ph] == ["0"]
    assert ph == _full_paths(full, full.search_phrase("spark engine", field="title"))
    assert inc.search_phrase("engine spark", field="title") == []


def test_plain_corpus_rejects_boosts(spark, tmp_path):
    idx = str(tmp_path / "plain")
    IndexBuilder(spark, idx, partitions=1).build(
        spark.createDataFrame(
            [("r", "0", "c", "t", "hello world")],
            "repo string, path string, commit string, lang string, content string",
        ),
        resume=False,
    )
    inc = IncrementalIndexReader(spark, idx)
    with pytest.raises(ValueError, match="fields"):
        inc.search_fields("hello")
    with pytest.raises(ValueError, match="boosts"):
        inc.search_prefix("hel", boosts={"title": 1.0})


def test_tombstones_load_lazily(spark, inc_idx):
    """search_df must never materialize driver-side tombstone sets; the
    driver paths load them on first use only."""
    ops = spark.createDataFrame(
        [("r", "1", "c", "t", "x", "x", "delete")], SCHEMA + ", _optype string"
    )
    apply_incremental(spark, inc_idx, ops)
    inc = IncrementalIndexReader(spark, inc_idx)
    assert inc._tombs_cache is None
    rows = inc.search_df("spark", k=10).collect()
    assert inc._tombs_cache is None, "distributed path touched driver tomb sets"
    paths = {
        (r["segment"], r["doc_id"]) for r in rows
    }
    live = {(r["segment"], r["doc_id"]): r["path"] for r in inc.live_docs().collect()}
    assert "1" not in {live.get(p) for p in paths}
    hits = inc.search("spark", k=10)  # driver path -> lazy load happens now
    assert inc._tombs_cache is not None
    assert [(s, d) for s, d, _ in hits] == [
        (r["segment"], r["doc_id"]) for r in rows
    ]


def test_stale_tombstones_are_inert(spark, inc_idx):
    """Tombstone batches targeting segments absent from the committed list
    (post-commit cleanup crash) must not perturb stats or results (ADVICE
    r02 medium)."""
    before = IncrementalIndexReader(spark, inc_idx)
    n, avgdl = before.n_docs, before.avgdl
    hits = before.search("spark", k=10)
    stale_dir = os.path.join(inc_idx, "tombstones", "delta=99")
    os.makedirs(stale_dir, exist_ok=True)
    spark.createDataFrame(
        [("delta=77", 0, 1000)], "segment string, doc_id long, dl long"
    ).coalesce(1).write.mode("overwrite").parquet(stale_dir)
    after = IncrementalIndexReader(spark, inc_idx)
    assert (after.n_docs, after.avgdl) == (n, avgdl)
    assert after.search("spark", k=10) == hits
    assert [r for r in after.search_df("spark", k=10).collect()] == [
        r for r in after.search_df("spark", k=10).collect()
    ]


def test_incremental_bool_df(spark, inc_idx, tmp_path):
    """Cross-segment distributed bool: no-tombstone corpus scores equal a
    from-scratch rebuild's search_bool_df; after a delete the masked doc
    vanishes from bool results."""
    inc = IncrementalIndexReader(spark, inc_idx)
    full = _full_idx(spark, tmp_path)
    cases = [
        {"must": "spark"},
        {"must": "spark", "must_not": "engine"},
        {"must": "spark", "should": "fresh"},
        {"must": "spark", "boosts": {"title": 5.0, "body": 1.0}},
    ]
    live = {
        (r["segment"], r["doc_id"]): r["path"] for r in inc.live_docs().collect()
    }
    for case in cases:
        got = [
            (live[(r["segment"], r["doc_id"])], round(r["score"], 9))
            for r in inc.search_bool_df(**case, k=10).collect()
        ]
        want = _full_paths(
            full,
            [(r["doc_id"], r["score"]) for r in full.search_bool_df(**case, k=10).collect()],
        )
        assert got == want, case
    # delete doc 1 (the body-spark doc): bool results must drop it
    ops = spark.createDataFrame(
        [("r", "1", "c", "t", "x", "x", "delete")], SCHEMA + ", _optype string"
    )
    apply_incremental(spark, inc_idx, ops)
    inc2 = IncrementalIndexReader(spark, inc_idx)
    live2 = {
        (r["segment"], r["doc_id"]): r["path"] for r in inc2.live_docs().collect()
    }
    got2 = {
        live2[(r["segment"], r["doc_id"])]
        for r in inc2.search_bool_df(must="spark", k=10).collect()
    }
    assert "1" not in got2 and got2 == {"0", "3", "4"}


def test_incremental_min_should_match(spark, inc_idx, tmp_path):
    """mSM across segments: driver and distributed paths agree with a full
    rebuild's results."""
    inc = IncrementalIndexReader(spark, inc_idx)
    full = _full_idx(spark, tmp_path)
    for msm in (1, 2):
        got = _paths(inc, spark, inc.search("spark engine", k=10, min_should_match=msm))
        want = _full_paths(full, full.search("spark engine", k=10, min_should_match=msm))
        assert got == want, msm
        dist = [
            (r["segment"], r["doc_id"], round(r["score"], 9))
            for r in inc.search_df("spark engine", k=10, min_should_match=msm).collect()
        ]
        drv = [(s, d, round(sc, 9)) for s, d, sc in
               inc.search("spark engine", k=10, min_should_match=msm)]
        assert dist == drv, msm
    # only doc 0 carries both tokens
    strict = _paths(inc, spark, inc.search("spark engine", k=10, min_should_match=2))
    assert [p for p, _ in strict] == ["0"]


def test_incremental_phrase_df(spark, inc_idx, tmp_path):
    """Cross-segment distributed phrase: rank/score-identical to the driver
    cross-segment path (global stats), and a from-scratch rebuild's
    search_phrase_df on the no-tombstone corpus; masked docs vanish."""
    inc = IncrementalIndexReader(spark, inc_idx)
    full = _full_idx(spark, tmp_path)
    drv = inc.search_phrase("spark engine", field="title", k=10)
    dist = [
        (r["segment"], r["doc_id"], round(r["score"], 9))
        for r in inc.search_phrase_df("spark engine", field="title", k=10).collect()
    ]
    assert dist == [(s, d, round(sc, 9)) for s, d, sc in drv]
    got = _paths(inc, spark, [(s, d, sc) for s, d, sc in
                              ((r[0], r[1], r[2]) for r in dist)])
    want = _full_paths(
        full,
        [(r["doc_id"], r["score"])
         for r in full.search_phrase_df("spark engine", field="title", k=10).collect()],
    )
    assert got == want
    # slop + lucene mode parity across segments
    for kw in ({"slop": 1}, {"slop": 2, "weight_mode": "lucene"}):
        d1 = inc.search_phrase("spark delta", field="title", k=10, **kw)
        d2 = [
            (r["segment"], r["doc_id"], round(r["score"], 9))
            for r in inc.search_phrase_df("spark delta", field="title", k=10, **kw).collect()
        ]
        assert d2 == [(s, d, round(sc, 9)) for s, d, sc in d1], kw
    # delete the only 'spark engine' title doc: phrase results go empty
    ops = spark.createDataFrame(
        [("r", "0", "c", "t", "x", "x", "delete")], SCHEMA + ", _optype string"
    )
    apply_incremental(spark, inc_idx, ops)
    inc2 = IncrementalIndexReader(spark, inc_idx)
    assert inc2.search_phrase_df("spark engine", field="title", k=10).count() == 0
    assert inc2.search_phrase("spark engine", field="title", k=10) == []


def test_stats_and_delete_by_query(spark, inc_idx):
    """ES _stats/_delete_by_query analogues: stats reflect segments and
    masking; delete_by_query tombstones exactly the match set."""
    inc = IncrementalIndexReader(spark, inc_idx)
    st = inc.stats()
    assert st["n_segments"] == 2 and st["n_docs_live"] == 5
    assert st["fields"] == ["title", "body"] and st["with_positions"]
    assert set(st["segments"]) == {"<base>", "delta=0"}
    assert st["segments"]["<base>"]["n_docs"] == 3
    # delete every doc matching 'engine' (docs 0 and 2, any field)
    res = inc.delete_by_query("engine")
    assert res["tombstones"] == 2 and res["upserts"] == 0
    inc2 = IncrementalIndexReader(spark, inc_idx)
    live = {r["path"] for r in inc2.live_docs().collect()}
    assert live == {"1", "3", "4"}
    assert inc2.search("engine", k=10) == []
    st2 = inc2.stats()
    assert st2["n_docs_live"] == 3 and st2["masked_docs"] == 2
    # idempotent: nothing left to delete
    res2 = inc2.delete_by_query("engine")
    assert res2["tombstones"] == 0
