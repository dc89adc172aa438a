"""ES index.sort / Lucene index sorting (IndexBuilder index_sort=...):
doc_ids are the global rank in the declared order, docs parquet row
groups get monotone min/max on the sort columns (the range-predicate
pruning substrate), search results stay identical to an unsorted build,
and the sorted-search fast path orders by the long doc_id."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
)
from elasticsearch_jdbc_spark.index.incremental_index import apply_incremental
from elasticsearch_jdbc_spark.sources import synthetic_corpus


def _corpus(spark, n=200, seed=7):
    # planted deterministic numeric column (source metadata — index_sort
    # columns must exist in the SOURCE, they are not generated)
    return synthetic_corpus(spark, n_files=n, seed=seed).withColumn(
        "ts", (F.crc32("path") % 1000).cast("long")
    )


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("isort")
    d_sorted, d_plain = str(root / "sorted"), str(root / "plain")
    corpus = _corpus(spark).cache()
    IndexBuilder(
        spark, d_sorted, partitions=4, index_sort=[("ts", "desc")]
    ).build(corpus, resume=False)
    IndexBuilder(spark, d_plain, partitions=4).build(corpus, resume=False)
    return d_sorted, d_plain


def test_docid_is_global_rank(spark, built):
    d_sorted, _ = built
    rows = spark.read.parquet(f"{d_sorted}/docs").select(
        "doc_id", "ts", "repo", "path", "commit"
    ).collect()
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    want = sorted(rows, key=lambda r: (-r["ts"], r["repo"], r["path"], r["commit"]))
    assert [r["doc_id"] for r in by_id] == [r["doc_id"] for r in want]
    # manifest records the contract
    assert IndexReader(spark, d_sorted).manifest["index_sort"] == [["ts", "desc"]]


def test_rowgroup_minmax_monotone(spark, built):
    """The pruning substrate: parquet files (pid = range order) carry
    non-overlapping ts ranges modulo boundary ties."""
    import pyarrow.parquet as pq

    d_sorted, _ = built
    docs = os.path.join(d_sorted, "docs")
    ranges = []
    for f in sorted(x for x in os.listdir(docs) if x.endswith(".parquet")):
        md = pq.read_metadata(os.path.join(docs, f))
        col = [
            md.row_group(i).column(j)
            for i in range(md.num_row_groups)
            for j in range(md.row_group(0).num_columns)
            if md.row_group(i).column(j).path_in_schema == "ts"
        ]
        if col:
            ranges.append(
                (max(c.statistics.max for c in col),
                 min(c.statistics.min for c in col))
            )
    assert len(ranges) >= 2
    for (hi1, lo1), (hi2, lo2) in zip(ranges, ranges[1:]):
        assert lo1 >= hi2  # desc layout: later files hold smaller ts


def test_search_identical_to_unsorted(spark, built):
    d_sorted, d_plain = built
    rs, rp = IndexReader(spark, d_sorted), IndexReader(spark, d_plain)
    assert rs.n_docs == rp.n_docs and rs.avgdl == pytest.approx(rp.avgdl)
    for q in ("merge buffer", "index segment"):
        hs = {(r["score"],) for r in rs.search_df(q, k=None).collect()}
        hp = {(r["score"],) for r in rp.search_df(q, k=None).collect()}
        assert sorted(x[0] for x in hs) == pytest.approx(
            sorted(x[0] for x in hp)
        )


def test_sorted_fast_path_rank_identity(spark, built):
    d_sorted, d_plain = built
    rs, rp = IndexReader(spark, d_sorted), IndexReader(spark, d_plain)
    docs = {
        r["path"]: r["ts"]
        for r in spark.read.parquet(f"{d_plain}/docs").collect()
    }
    # same-direction prefix -> fast path; results must equal the plain
    # index's slow path, compared on the stable (ts, path) identity
    fast = rs.search_sorted_df("merge buffer", sort=[("ts", "desc")], k=15)
    slow = rp.search_sorted_df("merge buffer", sort=[("ts", "desc")], k=15)
    fmap = spark.read.parquet(f"{d_sorted}/docs").select("doc_id", "path")
    pmap = spark.read.parquet(f"{d_plain}/docs").select("doc_id", "path")
    fkeys = [r["path"] for r in fast.join(fmap, "doc_id")
             .orderBy(F.desc("ts"), F.asc("path")).collect()]
    pkeys = [r["path"] for r in slow.join(pmap, "doc_id")
             .orderBy(F.desc("ts"), F.asc("path")).collect()]
    assert sorted(docs[p] for p in fkeys) == sorted(docs[p] for p in pkeys)
    assert set(fkeys) == set(pkeys)
    # opposite direction must NOT take the fast path (contract: doc_id
    # asc tie-break) — spot-check it still returns the right ts order
    up = rs.search_sorted_df("merge buffer", sort=[("ts", "asc")], k=10)
    ts = [r["ts"] for r in up.collect()]
    assert ts == sorted(ts)


def test_delta_and_compaction_inherit(spark, built, tmp_path):
    d_sorted, _ = built
    d = str(tmp_path / "idx")
    import shutil

    shutil.copytree(d_sorted, d)
    ops = _corpus(spark, n=20, seed=99).withColumn(
        "_optype", F.lit("index")
    )
    apply_incremental(spark, d, ops, key_cols=("repo", "path", "commit"))
    live = IncrementalIndexReader(spark, d)
    delta = [s for s in live.segments if s][-1]
    m = live.readers[delta].manifest
    assert m["index_sort"] == [["ts", "desc"]] or m["index_sort"] == [("ts", "desc")]
    # the delta segment itself is internally sorted
    rows = spark.read.parquet(os.path.join(d, delta, "docs")).select(
        "doc_id", "ts"
    ).collect()
    by_id = [r["ts"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    assert by_id == sorted(by_id, reverse=True)
    out = str(tmp_path / "compacted")
    live.compact_to(out)
    m2 = IndexReader(spark, out).manifest
    assert m2["index_sort"] in ([["ts", "desc"]], [("ts", "desc")])


def test_bad_index_sort_rejected(spark):
    with pytest.raises(ValueError, match="reserved or a key"):
        IndexBuilder(spark, "/tmp/x_isort_bad", index_sort=[("dl", "desc")])
    with pytest.raises(ValueError, match="reserved or a key"):
        IndexBuilder(spark, "/tmp/x_isort_bad", index_sort=["path"])
    with pytest.raises(ValueError, match="asc/desc"):
        IndexBuilder(spark, "/tmp/x_isort_bad", index_sort=[("ts", "down")])


def test_dsl_body_sort_fast_path(spark, built):
    """The request-body sort takes the doc_id fast path on a matching
    same-direction prefix (null placement matched), and falls back
    otherwise — results identical either way."""
    d_sorted, d_plain = built
    rs, rp = IndexReader(spark, d_sorted), IndexReader(spark, d_plain)
    body = {"query": {"match": {"content": "merge buffer"}},
            "sort": [{"ts": "desc"}], "size": 12}
    fast = rs.search_dsl_df(body)
    slow = rp.search_dsl_df(body)
    assert [x["ts"] for x in fast.collect()] == [
        x["ts"] for x in slow.collect()]
    plan = fast._jdf.queryExecution().executedPlan().toString()
    line = next(l for l in plan.split("\n") if "TakeOrderedAndProject" in l)
    order_sec = line.split("orderBy=[")[1].split("]")[0]
    assert "ts#" not in order_sec  # fast path: doc_id is the whole order
    sline = next(
        l for l in slow._jdf.queryExecution().executedPlan().toString()
        .split("\n") if "TakeOrderedAndProject" in l)
    assert "ts#" in sline.split("orderBy=[")[1].split("]")[0]
    # asc with the ES default missing=_last mismatches the build's
    # nulls-first asc layout -> slow path (still correct)
    up = rs.search_dsl_df({"query": {"match": {"content": "merge buffer"}},
                           "sort": [{"ts": "asc"}], "size": 12})
    ts = [x["ts"] for x in up.collect()]
    assert ts == sorted(ts)
    # asc + missing _first matches the layout -> fast path, same order
    up2 = rs.search_dsl_df({"query": {"match": {"content": "merge buffer"}},
                            "sort": [{"ts": {"order": "asc",
                                             "missing": "_first"}}],
                            "size": 12})
    assert [x["ts"] for x in up2.collect()] == ts


def test_runtime_shadow_disables_fast_path(spark, built):
    """A runtime field shadowing an index_sort column must NOT take the
    doc_id fast path: doc_id order reflects the STORED ts, but the user
    is sorting on the runtime expression (ADVICE r4)."""
    d_sorted, _ = built
    rs = IndexReader(spark, d_sorted)
    body = {
        "query": {"match": {"content": "merge buffer"}},
        "runtime_mappings": {
            "ts": {"type": "long", "script": {"source": "1000 - ts"}}
        },
        "sort": [{"ts": "desc"}],
        "size": 12,
    }
    out = rs.search_dsl_df(body).collect()
    got = [x["ts"] for x in out]
    assert got == sorted(got, reverse=True)
    # the runtime values are the INVERTED stored values, so a doc_id-asc
    # cut would have returned the opposite extreme: check against the
    # stored-ts order of the same body without the runtime shadow
    stored = rs.search_dsl_df(
        {"query": {"match": {"content": "merge buffer"}},
         "sort": [{"ts": "desc"}], "size": 12}
    ).collect()
    assert [x["ts"] for x in out] != [x["ts"] for x in stored]
    # and the runtime-desc head is the stored-asc head's inversion
    assert got[0] == 1000 - min(x["ts"] for x in stored) or got[0] >= stored[-1]["ts"]
