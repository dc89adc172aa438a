"""Golden tests for the document-fold layer, porting the semantics of the
reference's ValueListenerTests (ValueListenerTests.java:29-396) to the
DataFrame fold: id-grouped folding, multi-value dedup, nested docs, null
rules, optype routing."""

import json

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.operators.fold import (
    fold_rows,
    ignore_nulls,
    nested_doc,
    render_cell,
    route_optype,
)


@pytest.fixture(scope="module")
def rows(spark):
    # mirrors the orders fixture shape of ValueListenerTests.java:108-124:
    # consecutive same-id rows with scalar collisions
    data = [
        # (seq, id, name, city)
        (0, 1, "Big", "Amsterdam"),
        (1, 1, "Large", "Amsterdam"),
        (2, 2, "Small", None),
        (3, 2, "Small", "Utrecht"),
        (4, 3, None, None),
    ]
    return spark.createDataFrame(data, "seq int, id int, name string, city string")


def test_fold_multivalue_dedup(spark, rows):
    """Scalar collisions promote to arrays; duplicates collapse; order is
    first-encounter (Values.java:43-94)."""
    out = {
        r["id"]: (r["name"], r["city"])
        for r in fold_rows(rows, ["id"], "seq", ["name", "city"]).collect()
    }
    assert out[1] == (["Big", "Large"], ["Amsterdam"])
    assert out[2] == (["Small"], ["Utrecht"])  # null never joins the list
    assert out[3] == ([], [])


def test_render_cell_scalar_vs_array(spark, rows):
    """1 value -> scalar, n -> array, 0 -> null (Values.java:161-176)."""
    folded = fold_rows(rows, ["id"], "seq", ["name"])
    out = {r["id"]: r["name"] for r in folded.select("id", render_cell("name")).collect()}
    assert json.loads(out[1]) == ["Big", "Large"]
    assert json.loads(out[2]) == "Small"
    assert out[3] is None


def test_nested_doc_paths(spark):
    """Dot paths nest (README.md:493-532): product.customer.bill."""
    df = spark.createDataFrame([(1, "Bill", 100.0)], "id int, customer string, bill double")
    out = nested_doc(
        df, {"id": "id", "product.customer.name": "customer", "product.customer.bill": "bill"}
    ).collect()[0]["doc"]
    assert json.loads(out) == {
        "id": 1,
        "product": {"customer": {"name": "Bill", "bill": 100.0}},
    }


def test_ignore_nulls(spark, rows):
    """ignore_null_values drops all-null rows (PlainIndexableObject.java:151-155)."""
    out = ignore_nulls(rows, ["name", "city"])
    assert out.count() == 4  # row (4,3,None,None) dropped


def test_route_optype_default(spark):
    """Unknown optypes default to 'index' (PlainKeyValueStreamListener.java:205-229)."""
    df = spark.createDataFrame(
        [("index",), ("delete",), ("bogus",), (None,)], "op string"
    )
    out = [r["_optype"] for r in route_optype(df, F.col("op")).collect()]
    assert out == ["index", "delete", "index", "index"]
