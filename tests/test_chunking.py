"""Context-window chunking: window/overlap invariants, reconstruction,
edge docs, guards."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.operators.chunking import chunk_documents


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(df, **kw).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    got = _chunks(spark, [text], max_tokens=4, overlap=1)[0]
    # stride 3: starts 0,3,6,9
    assert got == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
        (3, 1, "w9"),
    ]
    # every token appears; consecutive windows share exactly `overlap`
    toks = [c.split() for _, _, c in got]
    assert set(text.split()) == {t for c in toks for t in c}
    for a, b in zip(toks, toks[1:]):
        assert a[-1:] == b[:1]


def test_short_empty_and_whitespace_docs(spark):
    got = _chunks(
        spark, ["one two", "", "   ", "single"], max_tokens=8, overlap=2
    )
    assert got.get(0) == [(0, 2, "one two")]
    assert 1 not in got and 2 not in got
    assert got.get(3) == [(0, 1, "single")]


def test_no_overlap_partition(spark):
    text = " ".join(f"t{i}" for i in range(7))
    got = _chunks(spark, [text], max_tokens=3, overlap=0)[0]
    # disjoint partition of the token stream
    assert [c for _, _, c in got] == ["t0 t1 t2", "t3 t4 t5", "t6"]


def test_guards(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)
