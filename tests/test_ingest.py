"""ES ingest-pipeline compiler (operators/ingest.py): every processor
vs hand computation, conditionals, ignore_missing, dissect grammar,
guards, and the _simulate surface."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.operators.ingest import (
    apply_pipeline,
    dissect_regex,
    simulate_pipeline,
)


def _rows(df):
    return [r.asDict() for r in df.orderBy(*df.columns[:1]).collect()]


def test_set_rename_remove_append(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, v string")
    out = _rows(
        apply_pipeline(
            df,
            [
                {"set": {"field": "w", "value": "x"}},
                {"set": {"field": "v", "value": "filled", "override": False}},
                {"set": {"field": "cp", "copy_from": "v"}},
                {"rename": {"field": "w", "target_field": "w2"}},
                {"append": {"field": "tags", "value": ["t1", "t2"]}},
                {"append": {"field": "tags", "value": "t1",
                            "allow_duplicates": False}},
                {"remove": {"field": "cp"}},
            ],
        )
    )
    assert out[0] == {"id": 1, "v": "a", "w2": "x", "tags": ["t1", "t2"]}
    assert out[1]["v"] == "filled"  # override=False fills only nulls
    with pytest.raises(ValueError, match="already exists"):
        apply_pipeline(df, [{"rename": {"field": "id", "target_field": "v"}}])
    with pytest.raises(ValueError, match="unknown column"):
        apply_pipeline(df, [{"remove": {"field": "nope"}}])
    # ignore_missing: silent no-op
    assert apply_pipeline(
        df, [{"remove": {"field": "nope", "ignore_missing": True}}]
    ).columns == ["id", "v"]


def test_string_ops_and_conditionals(spark):
    df = spark.createDataFrame(
        [(1, "  A<b>B</b>  ", "a%20b"), (2, "xy", "c")],
        "id int, s string, u string",
    )
    out = _rows(
        apply_pipeline(
            df,
            [
                {"html_strip": {"field": "s"}},
                {"trim": {"field": "s"}},
                {"uppercase": {"field": "s", "if": "id = 1"}},
                {"urldecode": {"field": "u"}},
                {"gsub": {"field": "u", "pattern": " ", "replacement": "_"}},
            ],
        )
    )
    assert out[0]["s"] == "AB" and out[0]["u"] == "a_b"
    assert out[1]["s"] == "xy"  # `if` skipped the uppercase


def test_split_join_csv(spark):
    df = spark.createDataFrame([(1, "a,b,,", "x|y|z ")], "id int, c string, k string")
    out = _rows(
        apply_pipeline(
            df,
            [
                {"split": {"field": "c", "separator": ",", "target_field": "cs"}},
                {"split": {"field": "c", "separator": ",",
                           "preserve_trailing": True, "target_field": "ct"}},
                {"join": {"field": "cs", "separator": "-", "target_field": "cj"}},
                {"csv": {"field": "k", "separator": "|", "trim": True,
                         "target_fields": ["k1", "k2", "k3"]}},
            ],
        )
    )
    r = out[0]
    assert r["cs"] == ["a", "b"]          # ES default drops trailing empties
    assert r["ct"] == ["a", "b", "", ""]  # preserve_trailing keeps them
    assert r["cj"] == "a-b"
    assert (r["k1"], r["k2"], r["k3"]) == ("x", "y", "z")


def test_convert_bytes_date(spark):
    df = spark.createDataFrame(
        [(1, "42", "1.5kb", "2024-01-31"), (2, "4x2", "3GB", "31/01/2024")],
        "id int, n string, b string, d string",
    )
    out = _rows(
        apply_pipeline(
            df,
            [
                {"convert": {"field": "n", "type": "integer"}},
                {"bytes": {"field": "b"}},
                {"date": {"field": "d", "formats": ["yyyy-MM-dd", "dd/MM/yyyy"],
                          "output_format": "yyyy-MM-dd"}},
            ],
        )
    )
    assert out[0]["n"] == 42 and out[1]["n"] is None  # try-cast delta
    assert out[0]["b"] == 1536 and out[1]["b"] == 3 * 1024**3
    assert out[0]["@timestamp"] == out[1]["@timestamp"] == "2024-01-31"
    with pytest.raises(ValueError, match="not in"):
        apply_pipeline(df, [{"convert": {"field": "n", "type": "ip"}}])


def test_dissect_grammar():
    rx, names = dissect_regex("%{a} %{?skip} [%{b}] %{c->} %{d}")
    assert names == ["a", "b", "c", "d"]
    import re

    # `->` skips repeats of the following delimiter (the ES padding rule)
    m = re.match(rx, "one two [three] four      five")
    assert m and m.groups() == ("one", "three", "four", "five")
    with pytest.raises(ValueError, match="no keys"):
        dissect_regex("plain literal")


def test_dissect_fingerprint_script_drop(spark):
    df = spark.createDataFrame(
        [(1, "u1 GET /a"), (2, "u2 POST /b")], "id int, log string"
    )
    out = _rows(
        apply_pipeline(
            df,
            [
                {"dissect": {"field": "log", "pattern": "%{u} %{m} %{p}"}},
                {"fingerprint": {"fields": ["u", "m"], "method": "md5"}},
                {"script": {"source": "id * 10", "target_field": "x"}},
                {"drop": {"if": "m = 'POST'"}},
            ],
        )
    )
    assert len(out) == 1 and out[0]["u"] == "u1" and out[0]["x"] == 10
    import hashlib

    assert out[0]["fingerprint"] == hashlib.md5(b"u1|GET").hexdigest()
    with pytest.raises(ValueError, match="target_field"):
        apply_pipeline(df, [{"script": {"source": "id"}}])
    with pytest.raises(ValueError, match="unsupported processor"):
        apply_pipeline(df, [{"geoip": {"field": "log"}}])


def test_simulate(spark):
    got = simulate_pipeline(
        spark,
        [{"lowercase": {"field": "s"}}],
        [{"s": "AB"}, {"s": "Cd"}],
    )
    assert [r["s"] for r in got] == ["ab", "cd"]
    with pytest.raises(ValueError, match="at least one doc"):
        simulate_pipeline(spark, [], [])


def test_append_keeps_base_duplicates(spark):
    """allow_duplicates=false skips only APPENDED values already present;
    pre-existing duplicates inside the base array survive (ADVICE r4)."""
    from elasticsearch_jdbc_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(["a", "a"],)], "tags array<string>"
    )
    out = apply_pipeline(
        df,
        [{"append": {"field": "tags", "value": ["b", "a"],
                     "allow_duplicates": False}}],
    ).collect()
    assert out[0]["tags"] == ["a", "a", "b"]
