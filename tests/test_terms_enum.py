"""ES `_terms_enum` API: sorted prefix enumeration of the term
dictionary on both reader tiers, field-namespaced on fields corpora."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

SCHEMA = "repo string, path string, commit string, lang string, content string"
DOCS = [
    ("r", "0", "c", "t", "merge sort sorted sorting speed"),
    ("r", "1", "c", "t", "scan segment stream store"),
    ("r", "2", "c", "t", "quick query queue"),
]


def _brute(prefix):
    terms = set()
    for d in DOCS:
        terms.update(tokenize_py(d[4]))
    return sorted(t for t in terms if t.startswith(prefix))


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("te") / "idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


def test_prefix_enumeration(spark, idx):
    r = IndexReader(spark, idx)
    assert r.terms_enum("s", size=100) == _brute("s")
    assert r.terms_enum("sort", size=100) == ["sort", "sorted", "sorting"]
    assert r.terms_enum("sort", size=2) == ["sort", "sorted"]
    assert r.terms_enum("zzz") == []
    assert r.terms_enum("", size=1000) == _brute("")


def test_validation(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError):
        r.terms_enum("s", size=0)
    with pytest.raises(ValueError):
        r.terms_enum("s", field="content")  # not a fields corpus


def test_fields_namespace(spark, tmp_path):
    d = str(tmp_path / "f")
    docs = [("r", "0", "c", "t", "alpha apple", "beta banana")]
    IndexBuilder(spark, d, partitions=1, fields=["t1", "t2"]).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string, t1 string, t2 string",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    assert r.terms_enum("a", field="t1") == ["alpha", "apple"]
    assert r.terms_enum("a", field="t2") == []
    assert r.terms_enum("b", field="t2") == ["banana", "beta"]
    with pytest.raises(ValueError):
        r.terms_enum("a")  # field required
    with pytest.raises(ValueError):
        r.terms_enum("a", field="nope")


def test_live_tier_delta_terms(spark, tmp_path):
    d = str(tmp_path / "live")
    IndexBuilder(spark, d, partitions=1).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    apply_incremental(
        spark,
        d,
        spark.createDataFrame(
            [("r", "9", "c", "t", "sortable zebra", "create")],
            SCHEMA + ", _optype string",
        ),
    )
    r = IncrementalIndexReader(spark, d)
    assert r.terms_enum("sort", size=100) == [
        "sort", "sortable", "sorted", "sorting",
    ]
    assert r.terms_enum("z", size=10) == ["zebra"]
