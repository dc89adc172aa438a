"""hits_df response shaping (`fields` + `script_fields`): enrichment,
computed runtime fields, ordering, live-tier newest-version metadata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

DOCS = [
    ("r", "0", "c", "py", "merge segment buffer", 10),
    ("r", "1", "c", "go", "merge segment", 20),
    ("r", "2", "c", "py", "slow query", 30),
]
SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " stars int"
)


def test_hits_df_base(spark, tmp_path):
    idx = str(tmp_path / "h")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    r = IndexReader(spark, idx)
    rows = r.hits_df(
        "merge segment",
        fields=["path", "lang", "stars"],
        script_fields={"stars2": "stars * 2", "tag": "concat(lang, ':', path)"},
    ).collect()
    want = r.search_df("merge segment").collect()
    # same ranking as search_df
    assert [x["doc_id"] for x in rows] == [x["doc_id"] for x in want]
    by = {x["path"]: x for x in rows}
    assert by["0"]["stars2"] == 20 and by["0"]["tag"] == "py:0"
    assert by["1"]["lang"] == "go"
    # fields=None -> all docs columns present
    all_cols = r.hits_df("merge").columns
    assert {"sha256", "dl", "stars"} <= set(all_cols)
    with pytest.raises(ValueError, match="unknown fields"):
        r.hits_df("merge", fields=["nope"])


def test_hits_df_live_newest_version(spark, tmp_path):
    idx = str(tmp_path / "hl")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    ops = spark.createDataFrame(
        [("r", "1", "c", "go", "merge segment", 99)], SCHEMA
    ).withColumn("_optype", F.lit("index"))
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    rows = r.hits_df(
        "merge segment", fields=["path", "stars"],
        script_fields={"s10": "stars + 10"},
    ).collect()
    by = {x["path"]: x for x in rows}
    # the upserted doc enriches from its NEWEST metadata
    assert by["1"]["stars"] == 99 and by["1"]["s10"] == 109
    assert by["0"]["stars"] == 10
