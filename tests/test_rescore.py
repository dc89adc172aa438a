"""ES rescore: second-pass phrase re-ranking of the first-pass top
window. Oracle-checked in the registry (rescore_index_search — full-match
window); here the WINDOW mechanics (docs outside the window never
rescore), score modes, weights, and incremental==compacted equality.
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

Q = "merge segment"
PH = "merge segment"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rsc") / "idx")
    corpus = synthetic_corpus(spark, n_files=200, seed=71).cache()
    IndexBuilder(spark, d, partitions=4, with_positions=True).build(
        corpus, resume=False
    )
    return d


def test_total_mode_combines(spark, idx):
    r = IndexReader(spark, idx)
    first = {
        row["doc_id"]: row["score"]
        for row in r.search_df(Q, k=None).collect()
    }
    phrase = {
        row["doc_id"]: row["score"]
        for row in r.search_phrase_df(PH, k=None).collect()
    }
    got = r.rescore_df(Q, PH, window_size=None, k=None, rescore_weight=2.0)
    for row in got.collect():
        exp = first[row["doc_id"]] + 2.0 * phrase.get(row["doc_id"], 0.0)
        assert abs(row["score"] - exp) < 1e-9
        assert abs(row["query_score"] - first[row["doc_id"]]) < 1e-12
    # a doc the phrase misses keeps its query score (r=0 contribution)
    misses = [d for d in first if d not in phrase]
    assert misses
    got_map = {row["doc_id"]: row for row in got.collect()}
    assert all(got_map[d]["rescore_score"] == 0.0 for d in misses)


def test_window_limits_rescoring(spark, idx):
    r = IndexReader(spark, idx)
    win = 5
    window_ids = {
        row["doc_id"] for row in r.search_df(Q, k=win).collect()
    }
    out = r.rescore_df(Q, PH, window_size=win, k=win).collect()
    assert {row["doc_id"] for row in out} == window_ids
    # rescoring reorders WITHIN the window only
    assert len(out) == win


def test_multiply_mode_and_errors(spark, idx):
    r = IndexReader(spark, idx)
    rows = r.rescore_df(Q, PH, window_size=None, k=None, score_mode="multiply").collect()
    for row in rows:
        if row["rescore_score"] == 0.0:
            assert abs(row["score"] - row["query_score"]) < 1e-12
        else:
            assert abs(row["score"] - row["query_score"] * row["rescore_score"]) < 1e-9
    with pytest.raises(ValueError):
        r.rescore_df(Q, PH, window_size=10, k=20)
    with pytest.raises(ValueError):
        r.rescore_df(Q, PH, score_mode="bogus")


def test_incremental_adds_only_matches_compacted(spark, idx, tmp_path_factory):
    root = tmp_path_factory.mktemp("rscinc")
    import shutil

    live = str(root / "idx")
    shutil.copytree(idx, live)
    extra = (
        synthetic_corpus(spark, n_files=50, seed=72)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, live, extra)
    inc = IncrementalIndexReader(spark, live)
    cdir = str(root / "compact")
    inc.compact_to(cdir)
    comp = IndexReader(spark, cdir)
    a = inc.rescore_df(Q, PH, window_size=None, k=None, rescore_weight=1.5)
    b = comp.rescore_df(Q, PH, window_size=None, k=None, rescore_weight=1.5)
    sa = sorted(round(row["score"], 9) for row in a.collect())
    sb = sorted(round(row["score"], 9) for row in b.collect())
    assert sa == sb
