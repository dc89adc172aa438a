"""Column-strategy jobspec wiring (VERDICT r02 #1): run_import must route
changed rows through apply_incremental — delta segments + tombstones — and
advance the checkpointed last_run, instead of skipping (resume=True) or
overwriting the base corpus (resume=False)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import IncrementalIndexReader, IndexBuilder, IndexReader
from elasticsearch_jdbc_spark.plans.jobspec import read_import_state, run_import

SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "created_at timestamp, updated_at timestamp, deleted_at timestamp"
)
import datetime as dt

T1, T3 = dt.datetime(2026, 1, 1), dt.datetime(2026, 1, 3)

V1 = [
    ("r", "keep", "c", "t", "stable quartz document", T1, T1, None),
    ("r", "upd", "c", "t", "original walrus content", T1, T1, None),
    ("r", "gone", "c", "t", "doomed ocelot text", T1, T1, None),
]
V2 = [
    ("r", "keep", "c", "t", "stable quartz document", T1, T1, None),
    ("r", "upd", "c", "t", "replacement zeppelin content", T1, T3, None),
    ("r", "gone", "c", "t", "doomed ocelot text", T1, T1, T3),
    ("r", "new", "c", "t", "fresh albatross arrival", T3, T3, None),
]


def _spec(tmp_path, src, now):
    return {
        "source": {"format": "parquet", "path": src},
        "strategy": "column",
        "index_dir": str(tmp_path / "idx"),
        "partitions": 2,
        "incremental": {
            "created_col": "created_at",
            "updated_col": "updated_at",
            "deleted_col": "deleted_at",
            "now": now,
        },
    }


@pytest.fixture()
def synced(spark, tmp_path):
    src1, src2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame(V1, SCHEMA).write.parquet(src1)
    spark.createDataFrame(V2, SCHEMA).write.parquet(src2)
    m1 = run_import(spark, _spec(tmp_path, src1, "2026-01-02 00:00:00"))
    r2 = run_import(spark, _spec(tmp_path, src2, "2026-01-04 00:00:00"))
    return tmp_path, m1, r2


def test_second_run_is_a_delta_not_a_rebuild(spark, synced):
    tmp_path, m1, r2 = synced
    assert m1["n_docs"] == 3  # initial fetch: live v1 rows
    assert r2["mode"] == "incremental"
    assert r2["upserts"] == 2          # upd (index) + new (create)
    assert r2["tombstones"] == 2       # old 'upd' version + 'gone'
    idx = str(tmp_path / "idx")
    assert os.path.isdir(os.path.join(idx, f"delta={r2['delta']}"))
    # base segment untouched (a rebuild would have replaced it)
    with open(os.path.join(idx, "manifest.json")) as f:
        assert json.load(f)["n_docs"] == 3
    assert read_import_state(idx)["last_run"] == "2026-01-04 00:00:00"


def test_sync_matches_fresh_rebuild(spark, synced, tmp_path):
    tmp, _, _ = synced
    inc = IncrementalIndexReader(spark, str(tmp / "idx"))
    live = {r["path"] for r in inc.live_docs().collect()}
    assert live == {"keep", "upd", "new"}
    # updates visible, old version masked, deletes masked, adds findable
    paths = lambda q: {  # noqa: E731
        r["path"]
        for r in inc.search_with_keys(q, k=5)
    }
    assert paths("replacement zeppelin") == {"upd"}
    assert paths("original walrus") == set()
    assert paths("doomed ocelot") == set()
    assert paths("fresh albatross") == {"new"}
    # same hit keys as a from-scratch rebuild over the final live rows
    fresh_dir = str(tmp_path / "fresh")
    final = [row for row in V2 if row[7] is None]
    IndexBuilder(spark, fresh_dir, partitions=2).build(
        spark.createDataFrame(final, SCHEMA).drop(
            "created_at", "updated_at", "deleted_at"
        ),
        resume=False,
    )
    fresh = IndexReader(spark, fresh_dir)
    for q in ("stable quartz", "replacement zeppelin", "fresh albatross"):
        want = {h["path"] for h in fresh.search_with_keys(q, k=5)}
        assert paths(q) == want, q


def test_no_change_run_is_a_noop(spark, synced, tmp_path):
    tmp, _, _ = synced
    src2 = str(tmp / "v2")
    r3 = run_import(spark, _spec(tmp, src2, "2026-01-05 00:00:00"))
    assert r3["mode"] == "incremental"
    assert r3["upserts"] == 0 and r3["tombstones"] == 0
    assert read_import_state(str(tmp / "idx"))["last_run"] == "2026-01-05 00:00:00"


def test_overlap_reprocessing_is_idempotent(spark, synced):
    """overlap_seconds re-reads the tail of the previous window; upserting
    an unchanged doc masks the old copy and indexes an identical one, so
    results don't change."""
    tmp, _, _ = synced
    spec = _spec(tmp, str(tmp / "v2"), "2026-01-06 00:00:00")
    spec["incremental"]["overlap_seconds"] = 3 * 24 * 3600  # back to T1 exactly
    r = run_import(spark, spec)
    assert r["upserts"] == 3  # keep/upd/new all re-enter the window (>= T1)
    inc = IncrementalIndexReader(spark, str(tmp / "idx"))
    assert {h["path"] for h in inc.search_with_keys("replacement zeppelin", k=5)} == {"upd"}
    assert {h["path"] for h in inc.search_with_keys("fresh albatross", k=5)} == {"new"}
    assert {r2["path"] for r2 in inc.live_docs().collect()} == {"keep", "upd", "new"}


def test_column_requires_incremental_block(spark, tmp_path):
    with pytest.raises(ValueError, match="created_col"):
        run_import(
            spark,
            {
                "source": {"format": "parquet", "path": str(tmp_path / "nope")},
                "strategy": "column",
                "index_dir": str(tmp_path / "idx"),
            },
        )
