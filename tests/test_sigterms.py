"""ES significant_terms aggregation: JLH-scored fg/bg doc frequencies.

The base reader is oracle-checked in the registry (sigterms_index_search);
here the incremental reader must be tombstone-EXACT — bg frequencies computed
over the LIVE corpus only — verified against a brute-force recompute from the
live docs' raw content."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge buffer"


def _brute(rows, query_terms, size, min_doc_count=3, fg_keys=None):
    """rows: [(key, content)] of live docs; fg_keys optionally restricts
    the foreground (the filter-context analogue)."""
    doc_terms = {k: set(tokenize_py(c)) for k, c in rows}
    fg = {k for k, ts in doc_terms.items() if ts & set(query_terms)}
    if fg_keys is not None:
        fg &= fg_keys
    n, fg_n = float(len(doc_terms)), float(len(fg))
    counts = {}
    for k, ts in doc_terms.items():
        for t in ts:
            bgc, fgc = counts.get(t, (0, 0))
            counts[t] = (bgc + 1, fgc + (1 if k in fg else 0))
    out = []
    for t, (bgc, fgc) in counts.items():
        if fgc < min_doc_count:
            continue
        fr, br = fgc / fg_n, bgc / n
        out.append((t, fgc, bgc, round((fr - br) * (fr / br), 6)))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:size]


def test_incremental_sigterms_tombstone_exact(spark, tmp_path):
    d = str(tmp_path / "sig_idx")
    corpus = synthetic_corpus(spark, n_files=200, seed=71).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=40, seed=72)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
        .cache()
    )
    apply_incremental(spark, d, extra)
    ri = IncrementalIndexReader(spark, d)
    ri.delete_by_query("stream")  # tombstone a real slice
    ri = IncrementalIndexReader(spark, d)

    live_keys = {
        (row["repo"], row["path"]) for row in ri.live_docs().collect()
    }
    rows = [
        ((row["repo"], row["path"]), row["content"])
        for row in corpus.unionByName(extra.drop("_optype")).collect()
        if (row["repo"], row["path"]) in live_keys
    ]
    assert len(rows) == ri.n_docs and len(rows) < 240  # deletes happened

    expected = _brute(rows, Q.split(), size=12)
    got = [
        (r["term"], r["fg_count"], r["bg_count"], r["score"])
        for r in ri.significant_terms_df(Q, size=12).collect()
    ]
    assert got == expected

    # a filter-context foreground (proper subset) must surface terms that
    # are genuinely overrepresented — scores strictly positive on top
    java_keys = {
        (row["repo"], row["path"])
        for row in ri.live_docs().filter("lang = 'java'").collect()
    }
    expected_f = _brute(rows, Q.split(), size=12, fg_keys=java_keys)
    got_f = [
        (r["term"], r["fg_count"], r["bg_count"], r["score"])
        for r in ri.significant_terms_df(
            Q, size=12, filter_sql="lang = 'java'"
        ).collect()
    ]
    assert got_f == expected_f
    assert got_f[0][3] > 0


def test_base_sigterms_filter_context(spark, tmp_path):
    d = str(tmp_path / "sigf_idx")
    corpus = synthetic_corpus(spark, n_files=200, seed=73).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    r = IndexReader(spark, d)
    unfiltered = r.significant_terms_df(Q, size=10).collect()
    filtered = r.significant_terms_df(
        Q, size=10, filter_sql="lang = 'java'"
    ).collect()
    assert unfiltered and filtered
    # filter context shrinks the foreground, never the background
    uf = {row["term"]: (row["fg_count"], row["bg_count"]) for row in unfiltered}
    fl = {row["term"]: (row["fg_count"], row["bg_count"]) for row in filtered}
    for t in set(uf) & set(fl):
        assert fl[t][0] <= uf[t][0]
        assert fl[t][1] == uf[t][1]
