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

def test_control_plane_storage_abstraction():
    """Phase markers, sidecars and segment commit points round-trip through
    the storage interface: MemoryFS sees exactly what LocalFS would write
    (VERDICT r02 missing #6 — object-store readiness without behavior
    change)."""
    import json

    from elasticsearch_jdbc_spark.index.build import IndexBuilder
    from elasticsearch_jdbc_spark.index.incremental_index import (
        _commit_segments,
        _list_segments,
        _next_delta_id,
        _segment_manifest,
    )
    from elasticsearch_jdbc_spark.index.storage import MemoryFS

    fs = MemoryFS()
    b = IndexBuilder.__new__(IndexBuilder)
    b.index_dir = "/idx"
    b.fs = fs
    fs.makedirs("/idx")
    assert b._phase_done("ingest") is None
    payload = b._commit_phase("ingest", {"n_rows": 7, "offsets": {"0": 0}})
    assert b._phase_done("ingest") == payload
    assert json.loads(fs.read_text("/idx/_phase_ingest.json"))["n_rows"] == 7
    # sidecar write path (the executor-side call shape)
    fs.write_text("/idx/partstats/pid=0.json", json.dumps({"pid": 0, "cnt": 3}),
                  tmp_suffix="123")
    assert sorted(fs.listdir("/idx/partstats")) == ["pid=0.json"]
    # segment commit point + manifest + delta-id arithmetic
    fs.write_text("/idx/manifest.json", json.dumps({"n_docs": 7, "k1": 1.2}))
    assert _list_segments("/idx", fs) == [""]
    fs.makedirs("/idx/delta=0")
    fs.write_text("/idx/delta=0/manifest.json", json.dumps({"n_docs": 1}))
    assert _list_segments("/idx", fs) == ["", "delta=0"]
    _commit_segments("/idx", ["", "delta=3"], fs)
    assert _list_segments("/idx", fs) == ["", "delta=3"]  # commit point wins
    assert _segment_manifest("/idx", "", fs)["n_docs"] == 7
    fs.makedirs("/idx/tombstones/delta=5")
    assert _next_delta_id("/idx", fs) == 6
    fs.rmtree("/idx/delta=0")
    assert not fs.exists("/idx/delta=0/manifest.json")
