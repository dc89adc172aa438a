"""Golden-output tests for the label-driven document builder, mirroring the
reference's semantic spec (ValueListenerTests.java:29-396). The expected
JSON bodies below are the exact bodies from the reference's golden strings.
"""

from __future__ import annotations

import json

import pytest

from elasticsearch_jdbc_spark.operators.doc_builder import fold_documents, parse_labels


def _mkdf(spark, labels, rows):
    """Rows arrive with an explicit source order (the reference's cursor
    order, README.md:490)."""
    data = [tuple([i] + list(r)) for i, r in enumerate(rows)]
    schema = ", ".join(["_seq long"] + [f"`{c}` string" for c in labels])
    return spark.createDataFrame(data, schema)


def _docs(spark, labels, rows, **kw) -> dict[str, dict]:
    df = _mkdf(spark, labels, rows)
    out = fold_documents(df, labels, order_col="_seq", **kw).collect()
    return {r["_id"]: json.loads(r["doc"]) for r in out}


def test_id_folding_two_docs(spark):
    # ValueListenerTests.testRowId/testTwoRows (:30-47,...): consecutive
    # same-_id rows -> one doc each
    labels = ["_id", "person.salary", "person.name",
              "person.position.name", "person.position.since"]
    rows = [
        ("1", "$1000", "Joe Doe", "Worker", "2012-06-12"),
        ("2", "$2000", "Bill Smith", "Boss", "2012-06-13"),
    ]
    docs = _docs(spark, labels, rows)
    assert docs["1"] == {"person": {"salary": "$1000", "name": "Joe Doe",
                                    "position": {"name": "Worker", "since": "2012-06-12"}}}
    assert docs["2"]["person"]["position"] == {"name": "Boss", "since": "2012-06-13"}


def test_multiple_values_promote_array(spark):
    # testMultipleValues (:108-124): colliding scalar -> deduped array
    labels = ["_id", "person.salary", "person.name",
              "person.position.name", "person.position.since"]
    rows = [
        ("1", "$1000", "Joe Doe", "Worker", "2012-06-12"),
        ("1", "$1000", "Joe Doe", "Worker", "2012-06-13"),
    ]
    docs = _docs(spark, labels, rows)
    assert docs["1"] == {"person": {"salary": "$1000", "name": "Joe Doe",
                                    "position": {"name": "Worker",
                                                 "since": ["2012-06-12", "2012-06-13"]}}}


def test_null_replaced_by_first_non_null(spark):
    # testMultipleValuesWithNull (:126-143): null then value -> scalar value
    labels = ["_id", "person.salary", "person.name",
              "person.position.name", "person.position.since"]
    rows = [
        ("1", "$1000", "Joe Doe", "Worker", None),
        ("1", "$1000", "Joe Doe", "Worker", "2012-06-13"),
    ]
    docs = _docs(spark, labels, rows)
    assert docs["1"]["person"]["position"]["since"] == "2012-06-13"


def test_sequence_comma_split(spark):
    # testSequenceValues (:145-164): name[] comma-splits and merges
    labels = ["_id", "person.salary", "person.name[]",
              "person.position.name", "person.position.since"]
    rows = [
        ("1", "$1000", "Joe,John", "Worker", None),
        ("1", "$1000", "Mark", "Worker", "2012-06-13"),
        ("2", "$1000", "Mark", "Worker", "2012-06-13"),
    ]
    docs = _docs(spark, labels, rows)
    assert docs["1"] == {"person": {"salary": "$1000", "name": ["Joe", "John", "Mark"],
                                    "position": {"name": "Worker", "since": "2012-06-13"}}}
    assert docs["2"]["person"]["name"] == "Mark"


def test_bracket_object_arrays(spark):
    # testSequenceObjects (:166-190): p[k] labels -> array of objects,
    # one element per row, NO dedup
    labels = ["_id", "person.name", "person.coursename[name]", "person.coursename[count]"]
    rows = [
        ("1", "Andrew Ng", "Machine Learning", "5"),
        ("1", "Andrew Ng", "Recommender Systems", "5"),
        ("2", "Doug Cutting", "Hadoop Internals", "12"),
        ("2", "Doug Cutting", "Basic of Lucene", "25"),
        ("2", "Doug Cutting", "Advanced Lucene", "5"),
        ("2", "Doug Cutting", "Introduction to Apache Avro", "5"),
    ]
    docs = _docs(spark, labels, rows)
    assert docs["1"] == {"person": {"name": "Andrew Ng", "coursename": [
        {"name": "Machine Learning", "count": "5"},
        {"name": "Recommender Systems", "count": "5"}]}}
    assert [c["name"] for c in docs["2"]["person"]["coursename"]] == [
        "Hadoop Internals", "Basic of Lucene", "Advanced Lucene",
        "Introduction to Apache Avro"]


def test_bracket_keeps_duplicate_rows(spark):
    # testArrays (:243-260): identical association rows stay triplicated
    labels = ["_id", "blog.name", "blog.association[id]", "blog.association[name]",
              "blog.attachment[id]", "blog.attachment[name]"]
    rows = [
        ("4679", "Tesla, Abe and Elba", "3917", "Idris Elba", "9450", "/web/q/g/h/57436356.jpg"),
        ("4679", "Tesla, Abe and Elba", "3917", "Idris Elba", "9965", "/web/i/s/q/GS3193626.jpg"),
        ("4679", "Tesla, Abe and Elba", "3917", "Idris Elba", "9451", "/web/i/s/q/GS3193626.jpg"),
    ]
    docs = _docs(spark, labels, rows)
    blog = docs["4679"]["blog"]
    assert blog["association"] == [{"id": "3917", "name": "Idris Elba"}] * 3
    assert [a["id"] for a in blog["attachment"]] == ["9450", "9965", "9451"]


def test_nested_dots_inside_brackets(spark):
    # testNestedDots (:282-306): p[teacher.id] -> sub-objects inside array
    labels = ["_id", "person.name", "person.coursename[teacher.id]",
              "person.coursename[teacher.name]"]
    rows = [
        ("1", "Andrew Ng", "1", "Brian Smith"),
        ("1", "Andrew Ng", "2", "Marc Levengood"),
    ]
    docs = _docs(spark, labels, rows)
    assert docs["1"] == {"person": {"name": "Andrew Ng", "coursename": [
        {"teacher": {"id": "1", "name": "Brian Smith"}},
        {"teacher": {"id": "2", "name": "Marc Levengood"}}]}}


def test_source_passthrough(spark):
    # testJSONSource (:192-206): _source cell IS the body
    labels = ["_optype", "_id", "_source"]
    rows = [("index", "1", '{"Hello":"World"}')]
    df = _mkdf(spark, labels, rows)
    out = fold_documents(df, labels, order_col="_seq").collect()
    assert json.loads(out[0]["doc"]) == {"Hello": "World"}
    assert out[0]["_optype"] == "index"


def test_json_detection_inlines_structure(spark):
    # testJSON (:208-227): string cells parsing as JSON inline as structure
    labels = ["_optype", "_id", "message", "person", "person.attributes"]
    rows = [("index", "1", '{"Hello":"World"}', '{"name":["Joe","John"]}',
             '{"haircolor":"blue"}')]
    docs = _docs(spark, labels, rows, detect_json=True)
    assert docs["1"]["message"] == {"Hello": "World"}
    assert docs["1"]["person"]["name"] == ["Joe", "John"]
    assert docs["1"]["person"]["attributes"] == {"haircolor": "blue"}


def test_null_rendering_and_ignore_null(spark):
    # testIgnoreNull (:308-396): nulls render as null unless ignored
    labels = ["_id", "col1", "col2"]
    rows = [("1", "Hello World", None)]
    docs = _docs(spark, labels, rows)
    assert docs["1"] == {"col1": "Hello World", "col2": None}
    docs = _docs(spark, labels, rows, ignore_null=True)
    assert docs["1"] == {"col1": "Hello World"}


def test_column_name_map(spark):
    # column_name_map rewrites dot segments (StandardSource.java:1938-1955)
    labels = ["_id", "a.b"]
    rows = [("1", "v")]
    docs = _docs(spark, labels, rows, column_name_map={"a": "alpha", "b": "beta"})
    assert docs["1"] == {"alpha": {"beta": "v"}}


def test_escaping_special_chars(spark):
    # JSON escaping must go through the JVM writer, not Python
    labels = ["_id", "msg"]
    rows = [("1", 'he said "hi"\nline2\\end')]
    docs = _docs(spark, labels, rows)
    assert docs["1"]["msg"] == 'he said "hi"\nline2\\end'


def test_parse_labels_grammar():
    spec = parse_labels(["_id", "a.b", "a.c[]", "p[x]", "p[y.z]"])
    assert spec["control"] == ["_id"]
    kinds = [(raw, k) for raw, k, *_ in spec["fields"]]
    assert kinds == [("a.b", "scalar"), ("a.c[]", "seq"), ("p[x]", "bracket"),
                     ("p[y.z]", "bracket")]


def test_fold_order_independent_of_partitioning(spark):
    # same input, different physical partitioning -> identical docs
    labels = ["_id", "person.name"]
    rows = [("1", "A"), ("1", "B"), ("2", "C")]
    df1 = _mkdf(spark, labels, rows).repartition(1)
    df8 = _mkdf(spark, labels, rows).repartition(8)
    d1 = {r["_id"]: r["doc"] for r in fold_documents(df1, labels, "_seq").collect()}
    d8 = {r["_id"]: r["doc"] for r in fold_documents(df8, labels, "_seq").collect()}
    assert d1 == d8


def test_numeric_and_boolean_render_plain(spark):
    """JDBC numerics/booleans render UNQUOTED (the reference's Jackson
    typing); strings stay quoted/escaped."""
    import json

    from elasticsearch_jdbc_spark.operators.doc_builder import fold_documents

    df = spark.createDataFrame(
        [(1, 0, "Joe", 42, 3.5, True)],
        "_id long, _seq long, name string, age long, score double, ok boolean",
    )
    doc = fold_documents(df).collect()[0]["doc"]
    parsed = json.loads(doc)
    assert parsed == {"name": "Joe", "age": 42, "score": 3.5, "ok": True}
    assert '"age":42' in doc and '"ok":true' in doc  # genuinely unquoted


def test_scalar_self_under_children_valid_json(spark):
    """A scalar value on a path that also has children lands in the
    engine-native 'value' slot (previously malformed JSON: the splice
    stripped the scalar's first/last characters)."""
    import json

    from elasticsearch_jdbc_spark.operators.doc_builder import fold_documents

    df = spark.createDataFrame(
        [(1, 0, "Joe", "blue")],
        "_id long, _seq long, person string, `person.hair` string",
    )
    doc = fold_documents(df).collect()[0]["doc"]
    parsed = json.loads(doc)
    assert parsed == {"person": {"value": "Joe", "hair": "blue"}}


def test_underscore_field_not_in_control_set_folds(spark):
    """Only the reference's fixed control-key set diverts; other
    underscore labels are ordinary JSON fields."""
    import json

    from elasticsearch_jdbc_spark.operators.doc_builder import fold_documents

    df = spark.createDataFrame(
        [(1, 0, "x", "v")],
        "_id long, _seq long, `_custom` string, plain string",
    )
    doc = fold_documents(df).collect()[0]["doc"]
    assert json.loads(doc) == {"_custom": "x", "plain": "v"}
