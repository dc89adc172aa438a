"""ES `_rollover` lifecycle: condition evaluation (docs/size/age) against
the alias's live generation, empty contract-inherited next generation,
atomic alias flip, writers continuing into the fresh index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    cat_indices,
    IndexBuilder,
    alias_target,
    apply_incremental,
    flip_alias,
    generation_created_at,
    generation_dir,
    list_generations,
    open_alias,
    record_generation,
    rollover,
)
from elasticsearch_jdbc_spark.index.alias import _next_rollover_name
from elasticsearch_jdbc_spark.sources import synthetic_corpus


def test_next_rollover_name():
    assert _next_rollover_name("logs") == "logs-000001"
    assert _next_rollover_name("logs-000001") == "logs-000002"
    assert _next_rollover_name("logs-000009") == "logs-000010"
    assert _next_rollover_name("logs-999999") == "logs-1000000"


def test_rollover_flow(spark, tmp_path):
    root = str(tmp_path / "roll")
    corpus = synthetic_corpus(spark, n_files=60, seed=7).cache()
    g1 = "logs-000001"
    IndexBuilder(
        spark, generation_dir(root, g1), partitions=2, with_positions=True
    ).build(corpus, resume=False)
    flip_alias(root, g1)
    record_generation(root, g1, created_at=1000.0)

    with pytest.raises(ValueError, match="at least one condition"):
        rollover(spark, root)

    # unmet conditions -> no action
    res = rollover(spark, root, max_docs=1000, max_age_s=3600, now=2000.0)
    assert res["rolled_over"] is False and alias_target(root) == g1
    assert res["conditions"] == {
        "max_docs=1000": False,
        "max_age_s=3600": False,
    }

    # dry_run: condition met, alias untouched
    res = rollover(spark, root, max_docs=50, dry_run=True)
    assert res["conditions"]["max_docs=50"] is True
    assert res["rolled_over"] is False and alias_target(root) == g1

    # real rollover on docs count: auto-incremented name, contract
    # inherited (with_positions), creation time recorded, alias flipped
    res = rollover(spark, root, max_docs=50, now=5000.0)
    assert res == {
        "rolled_over": True,
        "old": g1,
        "new": "logs-000002",
        "conditions": {"max_docs=50": True},
        "dry_run": False,
    }
    assert alias_target(root) == "logs-000002"
    assert sorted(list_generations(root)) == [g1, "logs-000002"]
    assert generation_created_at(root, "logs-000002") == 5000.0
    fresh = open_alias(spark, root)
    assert fresh.n_docs == 0
    assert fresh.search("merge segment", k=5) == []
    assert fresh.readers[""].manifest["with_positions"] is True

    # old generation keeps serving
    old = IncrementalIndexReader(spark, generation_dir(root, g1))
    assert old.n_docs == 60 and len(old.search("merge segment", k=5)) > 0

    # writers land in the fresh generation; phrase capability inherited
    batch = synthetic_corpus(spark, n_files=8, seed=99).withColumn(
        "_optype", F.lit("index")
    )
    apply_incremental(spark, generation_dir(root, "logs-000002"), batch)
    fresh2 = open_alias(spark, root)
    assert fresh2.n_docs == 8
    assert IncrementalIndexReader(spark, generation_dir(root, g1)).n_docs == 60

    # age-based rollover now that creation time is recorded
    res = rollover(spark, root, max_age_s=3600, now=5000.0 + 3599)
    assert res["rolled_over"] is False
    res = rollover(spark, root, max_age_s=3600, now=5000.0 + 3600)
    assert res["rolled_over"] is True and res["new"] == "logs-000003"

    # size-based: any built index tree exceeds 1 KiB
    res = rollover(spark, root, max_size_bytes=1024, new_name="big")
    assert res["rolled_over"] is True and alias_target(root) == "big"
    # explicit-name collision refused
    with pytest.raises(ValueError, match="already exists"):
        rollover(spark, root, max_size_bytes=1, new_name="big")

    # _cat/indices analogue: one row per generation, alias flagged
    cat = cat_indices(root)
    assert [c["index"] for c in cat] == sorted(
        ["logs-000001", "logs-000002", "logs-000003", "big"]
    )
    by = {c["index"]: c for c in cat}
    assert by["logs-000001"]["docs_count"] == 60
    assert by["big"]["is_alias_target"] is True
    assert all(c["store_bytes"] > 0 for c in cat)
    assert by["logs-000002"]["created_at"] == 5000.0
