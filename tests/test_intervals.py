"""ES intervals query (ordered / unordered proximity with max_gaps):
exact minimal-interval gating checked against a brute-force position
walk over the analyzer's own token stream, scoring = disjunctive BM25
sum on the qualified set, identical on both reader tiers."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.index.query import (
    _ordered_chain_match,
    _unordered_window_match,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge buffer"


@pytest.fixture()
def setup(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=66).cache()
    IndexBuilder(spark, d, partitions=4, with_positions=True).build(
        corpus, resume=False
    )
    return d, corpus


def _brute_match(reader, corpus, query, max_gaps, ordered):
    """Reference interval semantics straight from the analyzer's token
    stream (pure python, no reuse of the engine's chain/window code)."""
    qt = [t["token"] for t in reader.analyze(query)]
    uniq = list(dict.fromkeys(qt))
    n = len(uniq)
    docs = {
        (r["repo"], r["path"], r["commit"]): (r["content"], r["lang"])
        for r in corpus.collect()
    }
    keymap = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in reader.spark.read.parquet(f"{reader.index_dir}/docs").collect()
    }
    out = set()
    for key, (content, lang) in docs.items():
        toks = reader.analyze(content, lang=lang)
        pos = {t: [] for t in uniq}
        for t in toks:
            if t["token"] in pos:
                pos[t["token"]].append(t["position"])
        if any(not v for v in pos.values()):
            continue
        lists = [pos[t] for t in uniq]
        limit = max_gaps + n - 1
        ok = False
        if ordered:
            import itertools
            # brute: try every combination (lists are short)
            for combo in itertools.product(*lists):
                if all(a < b for a, b in zip(combo, combo[1:])) and (
                    combo[-1] - combo[0] <= limit
                ):
                    ok = True
                    break
        else:
            import itertools
            for combo in itertools.product(*lists):
                if max(combo) - min(combo) <= limit:
                    ok = True
                    break
        if ok:
            out.add(keymap[key])
    return out


@pytest.mark.parametrize("ordered,max_gaps", [
    (True, 0), (True, 3), (False, 2), (False, 8),
])
def test_intervals_brute_parity(spark, setup, ordered, max_gaps):
    d, corpus = setup
    r = IndexReader(spark, d)
    got = {
        x["doc_id"]
        for x in r.search_intervals_df(
            Q, max_gaps=max_gaps, ordered=ordered, k=None
        ).collect()
    }
    want = _brute_match(r, corpus, Q, max_gaps, ordered)
    assert got == want
    assert want  # fixture must exercise the match path


def test_intervals_scoring_is_bm25_sum(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    got = r.search_intervals_df(Q, max_gaps=5, ordered=False, k=None).collect()
    assert got
    full = {x["doc_id"]: x["score"] for x in r.match_df(Q).collect()}
    for x in got:
        assert x["score"] == pytest.approx(full[x["doc_id"]], rel=1e-12)


def test_intervals_ordered_zero_gaps_is_phrase_set(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    iv = {x["doc_id"] for x in r.search_intervals_df(Q, 0, True, k=None).collect()}
    ph = {x["doc_id"] for x in r.search_phrase_df(Q, k=None).collect()}
    assert iv == ph


def test_intervals_incremental_twin(spark, setup):
    d, _ = setup
    base = IndexReader(spark, d).search_intervals_df(Q, 4, True, k=12).collect()
    ri = IncrementalIndexReader(spark, d)
    live = ri.search_intervals_df(Q, 4, True, k=12).collect()
    assert [(x["doc_id"], round(x["score"], 9)) for x in live] == [
        (x["doc_id"], round(x["score"], 9)) for x in base
    ]
    # a delete disappears; stats stay global
    top = live[0]
    key = (
        ri.live_docs()
        .filter((F.col("segment") == top["segment"]) & (F.col("doc_id") == top["doc_id"]))
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, d, key)
    after = IncrementalIndexReader(spark, d).search_intervals_df(
        Q, 4, True, k=12
    ).collect()
    assert (top["segment"], top["doc_id"]) not in {
        (x["segment"], x["doc_id"]) for x in after
    }


def test_interval_kernels_unit():
    o = _ordered_chain_match
    u = _unordered_window_match
    a = np.array([2, 10], dtype=np.int64)
    b = np.array([5, 8], dtype=np.int64)
    assert o([a, b], 3)          # 2 -> 5, width 3
    assert not o([a, b], 2)      # no chain within 2 (10 has no successor)
    assert o([b, a], 2)          # 8 -> 10
    assert u([a, b], 2)          # {8, 10}
    assert not u([a, b], 1)
    c = np.array([100], dtype=np.int64)
    assert not o([a, b, c], 97)  # 2<5<100 width 98
    assert o([a, b, c], 98)
    assert u([a, b, c], 92)      # {8,10,100}: width 92
    assert not u([a, b, c], 91)


def test_intervals_validation(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    with pytest.raises(ValueError, match="max_gaps"):
        r.search_intervals_df(Q, max_gaps=-1)
    assert r.search_intervals_df("zzznohit qqq", k=5).count() == 0
