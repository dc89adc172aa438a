"""C4 cleaning pass (Raffel et al. 2020 §2.2): terminal-punctuation +
min-words line filter, Javascript-line rule, lorem-ipsum / curly-brace /
min-sentences doc drops. Registry twin oracle-checked by
test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.text import c4_clean_cols


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "id long, text string"
    )
    return {
        r["id"]: r.asDict()
        for r in df.select("id", *c4_clean_cols("text", **kw)).collect()
    }


GOOD = (
    "This is a perfectly normal first sentence of prose.\n"
    "Here is another sentence that clearly ends with punctuation!\n"
    "Does this corpus contain questions with enough words?\n"
    'And a quoted line can end with a closing quote."'
)


def test_good_doc_survives_whole(spark):
    r = _run(spark, [GOOD])[0]
    assert r["kept"] is True
    assert r["n_lines"] == 4 and r["n_kept"] == 4
    assert r["text"] == GOOD


def test_line_rules(spark):
    doc = (
        "This line ends with terminal punctuation and survives fine.\n"
        "no terminal punctuation so this line is dropped\n"
        "Too short.\n"
        "This line mentions JavaScript so out it goes.\n"
        "Final line stays because it has words and a period."
    )
    r = _run(spark, [doc], min_lines=2)[0]
    assert r["kept"] is True
    assert r["n_kept"] == 2
    assert r["text"].split("\n") == [
        "This line ends with terminal punctuation and survives fine.",
        "Final line stays because it has words and a period.",
    ]


def test_doc_rules(spark):
    docs = [
        "Only one surviving sentence lives inside this document.",  # < min_lines
        GOOD + "\nSome template with { braces } inside it.",        # '{' drop
        GOOD.replace("questions", "lorem ipsum dolor"),             # lorem drop
    ]
    out = _run(spark, docs)
    assert all(out[i]["kept"] is False and out[i]["text"] == "" for i in out)


def test_threshold_overrides(spark):
    r = _run(
        spark,
        ["short line here\nanother short line"],
        min_words_per_line=2,
        min_lines=2,
        require_terminal_punct=False,
    )[0]
    assert r["kept"] is True and r["n_kept"] == 2


def test_empty_doc(spark):
    r = _run(spark, [""])[0]
    assert r["kept"] is False and r["text"] == "" and r["n_kept"] == 0
