"""Resume-from-checkpoint: kill after phase K, resume, identical index
(BASELINE.md resumability target; reference statefile semantics,
StandardContext.java:240-277)."""

import os

import duckdb
import pytest

from elasticsearch_jdbc_spark.index.build import IndexBuilder
from elasticsearch_jdbc_spark.sources.corpus import synthetic_corpus


def _postings_digest(idx_dir: str):
    con = duckdb.connect()
    return con.execute(
        f"""SELECT COUNT(*), SUM(hash(term || '|' || block_id || '|' || first_doc
            || '|' || n || '|' || max_tf)), SUM(tf_sum)
            FROM read_parquet('{idx_dir}/postings/*.parquet')"""
    ).fetchall()


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_corpus(spark, n_files=400, seed=11)


def test_kill_after_ingest_resume_identical(spark, corpus, tmp_path_factory):
    full_dir = str(tmp_path_factory.mktemp("full"))
    IndexBuilder(spark, full_dir, partitions=4).build(corpus, resume=False)
    want = _postings_digest(full_dir)

    # simulate kill: run ingest only, then resume the rest
    part_dir = str(tmp_path_factory.mktemp("part"))
    b = IndexBuilder(spark, part_dir, partitions=4)
    b._phase_ingest(corpus)
    assert not os.path.exists(os.path.join(part_dir, "manifest.json"))
    manifest = b.build(corpus, resume=True)  # must skip ingest, finish rest
    assert manifest["phases"]["ingest"]["status"] == "done"
    assert _postings_digest(part_dir) == want


def test_resume_is_noop_when_complete(spark, corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("noop"))
    b = IndexBuilder(spark, idx, partitions=4)
    m1 = b.build(corpus, resume=False)
    before = _postings_digest(idx)
    m2 = b.build(corpus, resume=True)
    assert m2["phases"]["ingest"]["wall_s"] == m1["phases"]["ingest"]["wall_s"]
    assert _postings_digest(idx) == before


def test_lineage_recorded(spark, corpus, tmp_path_factory):
    """Per-partition lineage: rows/bytes per file for every phase output +
    source fingerprint (the reference's statefile carries counters,
    StandardContext.java:240-277; ours carries partition lineage)."""
    idx = str(tmp_path_factory.mktemp("lin"))
    m = IndexBuilder(spark, idx, partitions=4).build(corpus, resume=False)
    ing = m["phases"]["ingest"]
    assert ing["source_fingerprint"] != 0
    assert sum(p["rows"] for p in ing["partitions"]["tokenized"].values()) == 400
    po = m["phases"]["postings"]
    assert po["n_terms"] > 0
    assert len(po["partitions"]["postings"]) > 0
    assert all(p["bytes"] > 0 for p in po["partitions"]["postings"].values())