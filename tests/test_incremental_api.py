"""Round-4 incremental-reader API parity (VERDICT r03 missing #2/#3 and
wrong #1): count/facet_df/explain/search_phrase_prefix/search_after on the
live base+delta index must behave like the base reader on an equivalent
single-segment index, and the delete-by-query match set must compute with
NO global ordered cut.

Equality baseline: an ADDS-ONLY delta (no tombstones) — there the
incremental reader's global stats (summed df, N, avgdl) equal a fresh
compacted rebuild exactly, so scores must match to float tolerance. With
tombstones, df keeps counting masked docs until a merge (the Lucene
deleted-doc rule), so those tests assert set/count semantics instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

KEYS = ("repo", "path", "commit")
Q = "merge segment buffer"


@pytest.fixture(scope="module")
def adds_idx(spark, tmp_path_factory):
    """base(200 docs) + delta(60 new docs), positions on, NO tombstones —
    plus a compacted single-segment twin (the equality oracle)."""
    root = tmp_path_factory.mktemp("incapi")
    idx = str(root / "idx")
    base = synthetic_corpus(spark, n_files=200, seed=11).cache()
    b = IndexBuilder(spark, idx, partitions=4, with_positions=True)
    b.reset()
    b.build(base, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=60, seed=12)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, idx, extra)
    r = IncrementalIndexReader(spark, idx)
    cdir = str(root / "compact")
    r.compact_to(cdir)
    return r, IncrementalIndexReader(spark, cdir), IndexReader(spark, cdir)


def test_count_matches_compacted(spark, adds_idx):
    inc, comp, base = adds_idx
    for msm in (1, 2, 3):
        assert inc.count(Q, min_should_match=msm) == base.count(
            Q, min_should_match=msm
        )


def test_count_is_unranked_plan(spark, adds_idx):
    inc, _, _ = adds_idx
    plan = inc.match_df(Q)._jdf.queryExecution().optimizedPlan().toString()
    assert "Sort" not in plan and "Limit" not in plan


def test_facet_terms_matches_compacted(spark, adds_idx):
    inc, comp, base = adds_idx
    got = {
        r["lang"]: (r["n_docs"], round(r["max_score"], 6))
        for r in inc.facet_df(Q, by="lang").collect()
    }
    want = {
        r["lang"]: (r["n_docs"], round(r["max_score"], 6))
        for r in base.facet_df(Q, by="lang").collect()
    }
    assert got == want


def test_facet_ranges_and_histogram(spark, adds_idx):
    inc, comp, base = adds_idx
    ranges = [(None, 40), (40, 80), (80, None)]
    got = {
        r["bucket"]: (r["n_docs"], round(r["max_score"], 6))
        for r in inc.facet_df(Q, by="dl", ranges=ranges).collect()
    }
    want = {
        r["bucket"]: (r["n_docs"], round(r["max_score"], 6))
        for r in base.facet_df(Q, by="dl", ranges=ranges).collect()
    }
    assert got == want and got  # non-empty
    # overlap allowed: a (None, None) range catches every match once
    all_docs = inc.facet_df(Q, by="dl", ranges=[(None, None)]).collect()
    assert all_docs[0]["n_docs"] == inc.count(Q)
    # histogram buckets partition the match set
    hist = inc.facet_df(Q, by="dl", interval=25).collect()
    assert sum(r["n_docs"] for r in hist) == inc.count(Q)
    want_h = {
        float(r["bucket"]): r["n_docs"]
        for r in base.facet_df(Q, by="dl", interval=25).collect()
    }
    assert {float(r["bucket"]): r["n_docs"] for r in hist} == want_h


def test_explain_matches_search_score(spark, adds_idx):
    inc, _, _ = adds_idx
    hits = inc.search(Q, k=3)
    assert hits
    for seg, doc, score in hits:
        ex = inc.explain(Q, seg, doc)
        assert ex["live"] is True
        assert ex["score"] == pytest.approx(score, rel=1e-9)
        assert ex["matched"] >= 1
        assert ex["score"] == pytest.approx(
            sum(t["contribution"] for t in ex["terms"].values()), rel=1e-12
        )


def test_phrase_prefix_matches_compacted(spark, adds_idx):
    inc, comp, base = adds_idx
    got = inc.search_phrase_prefix("merge seg", k=8)
    want = base.search_phrase_prefix("merge seg", k=8)
    assert [s for (_seg, _d, s) in got] == pytest.approx(
        [s for (_d, s) in want], rel=1e-9
    )
    # same docs by key (internal doc ids differ across segment layouts)
    def keys_of(reader, pairs):
        out = []
        for seg, d in pairs:
            m = reader.readers[seg].lookup_docs([d])[d]
            out.append(tuple(m[k] for k in KEYS))
        return out

    got_keys = keys_of(inc, [(seg, d) for seg, d, _ in got])
    want_keys = [
        tuple(base.lookup_docs([d])[d][k] for k in KEYS) for d, _ in want
    ]
    assert got_keys == want_keys


def test_search_after_pagination_stitches(spark, adds_idx):
    inc, _, _ = adds_idx
    full = [tuple(r) for r in inc.search_df(Q, k=12).collect()]
    pages, cursor = [], None
    for _ in range(4):
        page = [
            tuple(r) for r in inc.search_df(Q, k=3, search_after=cursor).collect()
        ]
        assert len(page) <= 3
        if not page:
            break
        pages += page
        last = page[-1]
        cursor = (last[2], last[0], last[1])  # (score, segment, doc_id)
    assert pages == full


def test_search_after_rejects_dead_segment(spark, adds_idx):
    inc, _, _ = adds_idx
    with pytest.raises(ValueError, match="not live"):
        inc.search_df(Q, k=3, search_after=(1.0, "delta=99", 0)).collect()


def test_k_none_returns_full_match_set(spark, adds_idx):
    inc, _, _ = adds_idx
    unranked = {
        (r["segment"], r["doc_id"]) for r in inc.search_df(Q, k=None).collect()
    }
    ranked = {
        (r["segment"], r["doc_id"])
        for r in inc.search_df(Q, k=inc.n_docs).collect()
    }
    assert unranked == ranked and len(unranked) == inc.count(Q)


@pytest.fixture()
def mutable_idx(spark, tmp_path):
    idx = str(tmp_path / "mut")
    corpus = synthetic_corpus(spark, n_files=150, seed=21).cache()
    b = IndexBuilder(spark, idx, partitions=4)
    b.reset()
    b.build(corpus, resume=False)
    return idx


def test_delete_by_query_unranked_and_effective(spark, mutable_idx):
    r = IncrementalIndexReader(spark, mutable_idx)
    n_before = r.count(Q)
    assert n_before > 0
    res = r.delete_by_query(Q)
    assert res["tombstones"] == n_before
    r2 = IncrementalIndexReader(spark, mutable_idx)
    assert r2.count(Q) == 0
    assert r2.search(Q, k=5) == []
    # a tombstoned doc explains as dead
    masked = r2._tombs.get("", set())
    assert masked
    ex = r2.explain(Q, "", next(iter(masked)))
    assert ex["live"] is False and ex["score"] == 0.0


def test_facet_metrics_match_compacted_and_brute(spark, adds_idx):
    """ES metric sub-aggregations (avg/min/max/sum over dl) per bucket:
    incremental == compacted, and every metric equals a brute-force
    recomputation from the per-bucket dl values."""
    inc, comp, base = adds_idx
    METRICS = {
        "avg_dl": ("avg", "dl"),
        "min_dl": ("min", "dl"),
        "max_dl": ("max", "dl"),
        "sum_dl": ("sum", "dl"),
    }
    cols = ["n_docs", "avg_dl", "min_dl", "max_dl", "sum_dl"]

    def snap(rdr):
        return {
            r["lang"]: tuple(
                round(float(r[c]), 6) for c in cols
            )
            for r in rdr.facet_df(Q, by="lang", metrics=METRICS).collect()
        }

    got, want = snap(inc), snap(base)
    assert got == want and got
    # brute: recompute from the live match set joined to docs
    docs = {
        (r["segment"], r["doc_id"]): (r["lang"], r["dl"])
        for r in inc.live_docs().collect()
    }
    per_lang: dict = {}
    for r in inc.match_df(Q).collect():
        lang, dl = docs[(r["segment"], r["doc_id"])]
        per_lang.setdefault(lang, []).append(dl)
    for lang, dls in per_lang.items():
        n, a, lo, hi, s = got[lang]
        assert n == len(dls)
        assert a == round(sum(dls) / len(dls), 6)
        assert (lo, hi, s) == (min(dls), max(dls), sum(dls))
    # unknown metric column / op fail loudly
    with pytest.raises(ValueError, match="facet column"):
        inc.facet_df(Q, by="lang", metrics={"x": ("avg", "nope")})
    with pytest.raises(ValueError, match="metric op"):
        inc.facet_df(Q, by="lang", metrics={"x": ("median", "dl")})
    # metrics compose with range buckets on the base reader too
    rng = base.facet_df(
        Q, by="dl", ranges=[(None, 40), (40, None)],
        metrics={"avg_dl": ("avg", "dl")},
    ).collect()
    for r in rng:
        lo = None if r["bucket"].startswith("*") else int(r["bucket"].split("-")[0])
        hi = None if r["bucket"].endswith("*") else int(r["bucket"].split("-")[1])
        sel = [
            dl for dls in per_lang.values() for dl in dls
            if (lo is None or dl >= lo) and (hi is None or dl < hi)
        ]
        assert r["n_docs"] == len(sel)
        assert abs(r["avg_dl"] - sum(sel) / len(sel)) < 1e-9


def test_facet_extended_metrics_match_brute(spark, adds_idx):
    """Round-4b metric ops: exact percentiles (p50/p99), extended_stats
    moments (variance/std_deviation/sum_of_squares), value_count and
    cardinality (exact) against a numpy brute force per bucket;
    approx_cardinality lands within HLL++ tolerance of the exact count."""
    import numpy as np

    inc, comp, base = adds_idx
    METRICS = {
        "p50_dl": ("p50", "dl"),
        "p99_dl": ("p99", "dl"),
        "var_dl": ("variance", "dl"),
        "sd_dl": ("std_deviation", "dl"),
        "ss_dl": ("sum_of_squares", "dl"),
        "cnt_dl": ("value_count", "dl"),
        "card_dl": ("cardinality", "dl"),
        "acard_dl": ("approx_cardinality", "dl"),
    }
    rows = {
        r["lang"]: r
        for r in inc.facet_df(Q, by="lang", metrics=METRICS).collect()
    }
    docs = {
        (r["segment"], r["doc_id"]): (r["lang"], r["dl"])
        for r in inc.live_docs().collect()
    }
    per_lang: dict = {}
    for r in inc.match_df(Q).collect():
        lang, dl = docs[(r["segment"], r["doc_id"])]
        per_lang.setdefault(lang, []).append(dl)
    assert set(rows) == set(per_lang) and rows
    for lang, dls in per_lang.items():
        a = np.array(dls, dtype=float)
        r = rows[lang]
        assert r["p50_dl"] == pytest.approx(
            np.percentile(a, 50, method="linear"), rel=1e-9
        )
        assert r["p99_dl"] == pytest.approx(
            np.percentile(a, 99, method="linear"), rel=1e-9
        )
        assert r["var_dl"] == pytest.approx(a.var(), rel=1e-9)
        assert r["sd_dl"] == pytest.approx(a.std(), rel=1e-9)
        assert r["ss_dl"] == pytest.approx((a * a).sum(), rel=1e-9)
        assert r["cnt_dl"] == len(a)
        assert r["card_dl"] == len(set(dls))
        # HLL++ default rsd is 5%; allow a generous band
        assert abs(r["acard_dl"] - len(set(dls))) <= max(2, 0.2 * len(set(dls)))
    # incremental == base-on-compacted for the deterministic ops
    det = {k: v for k, v in METRICS.items() if k != "acard_dl"}
    want = {
        r["lang"]: tuple(round(float(r[k]), 6) for k in det)
        for r in base.facet_df(Q, by="lang", metrics=det).collect()
    }
    got = {
        r["lang"]: tuple(round(float(r[k]), 6) for k in det)
        for r in inc.facet_df(Q, by="lang", metrics=det).collect()
    }
    assert got == want
    # malformed percentile op still fails loudly
    with pytest.raises(ValueError, match="metric op"):
        inc.facet_df(Q, by="lang", metrics={"x": ("p200", "dl")})


def test_disk_usage(spark, adds_idx):
    inc, _, _ = adds_idx
    du = inc.disk_usage()
    assert set(du["segments"]) == {"<base>"} | {
        s for s in inc.segments if s
    }
    for seg, row in du["segments"].items():
        assert row["docs"] > 0 and row["postings"] > 0 and row["terms"] > 0
        assert row["total"] == sum(v for k, v in row.items() if k != "total")
    assert du["total_bytes"] == (
        sum(r["total"] for r in du["segments"].values())
        + du["tombstones_bytes"]
    )
    # adds-only fixture still writes an (empty) tombstone batch file
    assert du["tombstones_bytes"] >= 0
