"""Query-time synonym expansion (ES synonym token filter): OR-group
semantics under min_should_match, scoring = boolean expansion where each
variant scores with its own idf, identical on both reader tiers."""

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

SYN = {"fast": ["slow"]}


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    IndexBuilder(spark, d, partitions=4).build(
        synthetic_corpus(spark, n_files=150, seed=88), resume=False
    )
    return d


def _ids(rows):
    return {r["doc_id"] for r in rows}


def test_empty_synonyms_is_plain_match(spark, idx):
    r = IndexReader(spark, idx)
    want = r.search_df("fast merge", k=20).collect()
    got = r.search_synonyms_df("fast merge", {}, k=20).collect()
    assert [(x["doc_id"], round(x["score"], 9)) for x in got] == [
        (x["doc_id"], round(x["score"], 9)) for x in want
    ]


def test_group_msm_and_scoring(spark, idx):
    r = IndexReader(spark, idx)
    # msm=2: (fast OR slow) AND merge — group satisfied by the synonym
    got = r.search_synonyms_df("fast merge", SYN, k=None, min_should_match=2)
    merge_ids = _ids(r.match_df("merge").collect())
    fs_ids = _ids(r.match_df("fast slow").collect())  # msm=1 disjunction
    assert _ids(got.collect()) == merge_ids & fs_ids
    # scoring = disjunctive sum over the expanded terms on the qualified set
    full = {
        x["doc_id"]: x["score"]
        for x in r.match_df("fast slow merge").collect()
    }
    for x in got.collect():
        assert x["score"] == pytest.approx(full[x["doc_id"]], rel=1e-12)
    # msm=1 degenerates to the full disjunction's match set
    loose = r.search_synonyms_df("fast merge", SYN, k=None, min_should_match=1)
    assert _ids(loose.collect()) == set(full)


def test_incremental_twin_and_liveness(spark, idx):
    rb = IndexReader(spark, idx)
    ri = IncrementalIndexReader(spark, idx)
    base = rb.search_synonyms_df("fast merge", SYN, k=15).collect()
    live = ri.search_synonyms_df("fast merge", SYN, k=15).collect()
    assert [(x["doc_id"], round(x["score"], 9)) for x in base] == [
        (x["doc_id"], round(x["score"], 9)) for x in live
    ]
    # a delete disappears from the synonym path like any other
    top = live[0]
    key = (
        ri.live_docs()
        .filter((F.col("segment") == top["segment"]) & (F.col("doc_id") == top["doc_id"]))
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, idx, key)
    after = IncrementalIndexReader(spark, idx).search_synonyms_df(
        "fast merge", SYN, k=15
    ).collect()
    assert (top["segment"], top["doc_id"]) not in {
        (x["segment"], x["doc_id"]) for x in after
    }


def test_synonym_validation(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError, match="multi-token"):
        r.search_synonyms_df("fast", {"fast": ["new york"]})
    with pytest.raises(ValueError, match="keys must be single"):
        r.search_synonyms_df("fast", {"very fast": ["quick"]})
    # camelCase analyzes to two tokens -> rejected, not silently split
    with pytest.raises(ValueError):
        r.search_synonyms_df("fast", {"fast": ["quickSort"]})
