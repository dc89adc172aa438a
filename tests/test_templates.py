"""Search templates (`_scripts` + `_search/template`): store/render/
dispatch — typed placeholder substitution, defaults, both reader tiers,
storage-abstraction round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
    get_template,
    list_templates,
    delete_template,
    put_template,
    render_template,
    search_template,
)
from elasticsearch_jdbc_spark.index.storage import MemoryFS

DOCS = [
    ("r", "0", "c", "py", "merge segment buffer"),
    ("r", "1", "c", "go", "merge segment"),
    ("r", "2", "c", "py", "slow query scan"),
]
SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_render_typed_and_defaults():
    t = {
        "query": "{{q}}",
        "k": "{{k}}",
        "note": "top {{k}} for {{q}}",
        "nested": [{"x": "{{missing:fallback}}"}],
    }
    r = render_template(t, {"q": "merge segment", "k": 3})
    assert r == {
        "query": "merge segment",
        "k": 3,  # raw typed value, not "3"
        "note": "top 3 for merge segment",
        "nested": [{"x": "fallback"}],
    }
    with pytest.raises(KeyError, match="missing template param"):
        render_template({"q": "{{nope}}"}, {})


@pytest.fixture(scope="module")
def tpl_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("tpl") / "idx")
    IndexBuilder(spark, idx, partitions=2, with_positions=True).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return IndexReader(spark, idx)


def test_store_roundtrip(tmp_path):
    root = str(tmp_path / "store")
    put_template(root, "t1", {"query": "{{q}}", "k": "{{k:10}}"})
    put_template(root, "t2", {"phrase": "{{p}}"})
    assert list_templates(root) == ["t1", "t2"]
    assert get_template(root, "t1")["query"] == "{{q}}"
    delete_template(root, "t1")
    assert list_templates(root) == ["t2"]
    with pytest.raises(KeyError, match="no template"):
        get_template(root, "t1")
    # storage abstraction: same flow through MemoryFS
    fs = MemoryFS()
    put_template("/mem", "m", {"query": "x"}, fs=fs)
    assert list_templates("/mem", fs=fs) == ["m"]


def test_dispatch_matches_direct_calls(tpl_idx, tmp_path):
    root = str(tmp_path / "t")
    put_template(root, "find", {
        "query": "{{q}}", "k": "{{k:10}}", "filter_sql": "lang = '{{lang}}'",
    })
    got = search_template(
        tpl_idx, "find", {"q": "merge segment", "lang": "py"}, root=root
    ).collect()
    want = tpl_idx.search_df(
        "merge segment", k=10, filter_sql="lang = 'py'"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    # inline phrase template with slop
    got = search_template(
        tpl_idx, {"phrase": "{{a}} {{b}}", "slop": "{{s:0}}"},
        {"a": "merge", "b": "segment", "s": 1},
    ).collect()
    want = tpl_idx.search_phrase_df("merge segment", k=10, slop=1).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    # query_string dispatch
    got = search_template(
        tpl_idx, {"query_string": "+merge -buffer", "k": None}
    ).collect()
    want = tpl_idx.query_string_df("+merge -buffer", k=None).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in want)


def test_dispatch_guards(tpl_idx):
    with pytest.raises(ValueError, match="exactly one of"):
        search_template(tpl_idx, {"query": "a", "phrase": "b"})
    with pytest.raises(ValueError, match="exactly one of"):
        search_template(tpl_idx, {"k": 5})
    with pytest.raises(ValueError, match="needs root="):
        search_template(tpl_idx, "stored-name")


def test_incremental_tier(spark, tmp_path):
    idx = str(tmp_path / "tinc")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    ops = spark.createDataFrame(
        [("r", "9", "c", "py", "merge fresh")], SCHEMA
    ).withColumn("_optype", F.lit("index"))
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    got = search_template(r, {"query": "{{q}}", "k": 10}, {"q": "fresh"}).collect()
    assert len(got) == 1  # the delta doc is live through the template
