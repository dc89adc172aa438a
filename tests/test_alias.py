"""Index generations + alias flip (StandardSink.java:95-123 date-pattern
names, :351-398 switch-alias-after-build): readers resolve the alias, a
compaction builds a NEW generation and flips atomically, an already-open
reader keeps serving its old generation untouched."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    alias_target,
    apply_incremental,
    compact_to_generation,
    drop_generation,
    flip_alias,
    generation_dir,
    list_generations,
    open_alias,
    resolve_index_name,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge segment buffer"


def test_resolve_index_name_patterns():
    when = dt.datetime(2015, 5, 30, 7, 8, 9)
    assert resolve_index_name("'myindex_'yyyy.MM.dd", when) == "myindex_2015.05.30"
    assert resolve_index_name("'logs-'yyyy.MM.dd'-cold'", when) == "logs-2015.05.30-cold"
    assert resolve_index_name("'plain_literal'", when) == "plain_literal"
    assert resolve_index_name("yyyyMMddHHmmss", when) == "20150530070809"


def test_blue_green_generation_flow(spark, tmp_path):
    root = str(tmp_path / "aliased")
    corpus = synthetic_corpus(spark, n_files=120, seed=31).cache()
    gen_a = resolve_index_name("'idx_'yyyy.MM.dd", dt.datetime(2026, 1, 1))
    b = IndexBuilder(spark, generation_dir(root, gen_a), partitions=4)
    b.reset()
    b.build(corpus, resume=False)

    # no alias yet -> open fails; flipping to a manifest-less gen fails
    with pytest.raises(FileNotFoundError):
        open_alias(spark, root)
    with pytest.raises(FileNotFoundError):
        flip_alias(root, "missing")

    flip_alias(root, gen_a)
    assert alias_target(root) == gen_a
    old_reader = open_alias(spark, root)
    baseline = old_reader.search(Q, k=5)
    assert baseline

    # mutate the live generation (delta + tombstones), then compact into a
    # fresh generation and flip
    ops = (
        synthetic_corpus(spark, n_files=30, seed=32)
        .withColumn("path", F.concat(F.lit("x/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, generation_dir(root, gen_a), ops)
    live = open_alias(spark, root)  # re-open: sees base + delta
    assert live.n_docs == 150
    gen_b = resolve_index_name("'idx_'yyyy.MM.dd", dt.datetime(2026, 2, 2))
    manifest = compact_to_generation(live, root, gen_b)
    assert manifest["n_docs"] == 150
    assert alias_target(root) == gen_b
    assert list_generations(root) == sorted([gen_a, gen_b])

    # the new reader serves the compacted generation; the OLD handle still
    # works (its files were never touched by the flip)
    new_reader = open_alias(spark, root)
    assert new_reader.segments == [""]
    assert new_reader.n_docs == 150
    assert old_reader.search(Q, k=5) == baseline

    # retiring: the live target is protected, the old gen drops cleanly
    with pytest.raises(ValueError):
        drop_generation(root, gen_b)
    drop_generation(root, gen_a)
    assert list_generations(root) == [gen_b]
    assert open_alias(spark, root).search(Q, k=3)
