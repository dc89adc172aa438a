"""Gopher document-quality rules (Rae et al. 2021 §A1.1.1): each rule
exercised by a crafted document that fails it alone; the registry twin is
oracle-checked vs DuckDB by test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.text import gopher_keep, gopher_signals

GOOD = (
    "The quick brown fox and the lazy dog have agreed to cooperate with "
    "several other animals of the forest so that everyone can be safe and "
    "warm this winter season. "
) * 3  # ~90 words of plain prose


def _run(spark, docs, **thresholds):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "id long, text string")
    out = df.select("id", *gopher_signals("text")).withColumn(
        "keep", F.coalesce(gopher_keep(**thresholds), F.lit(False))
    )
    return {r["id"]: r.asDict() for r in out.collect()}


def test_good_doc_passes(spark):
    r = _run(spark, [GOOD])[0]
    assert r["keep"] is True
    assert r["n_words"] >= 50
    assert 3 <= r["mean_word_len"] <= 10
    assert r["stop_word_hits"] >= 2


def test_each_rule_fails_alone(spark):
    docs = [
        GOOD,                                    # 0: control
        "too short to pass the word count",      # 1: n_words < 50
        GOOD + " " + "# " * 40,                  # 2: symbol ratio (hash per word)
        "\n".join(["- bullet item of the list"] * 60),  # 3: bullets, every line
        GOOD.replace(". ", "...\n", 40),         # 4: ellipsis line endings
        GOOD + " " + "12345 " * 60,              # 5: alpha ratio sinks
        " ".join(["zq"] * 80),                   # 6: mean word len < 3 + no stopwords
    ]
    out = _run(spark, docs)
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["n_words"] < 50
    assert out[2]["keep"] is False and out[2]["symbol_word_ratio"] > 0.1
    assert out[3]["keep"] is False and out[3]["bullet_line_ratio"] > 0.9
    assert out[4]["keep"] is False and out[4]["ellipsis_line_ratio"] > 0.3
    assert out[5]["keep"] is False and out[5]["alpha_word_ratio"] < 0.8
    assert out[6]["keep"] is False and out[6]["mean_word_len"] < 3
    assert out[6]["stop_word_hits"] == 0


def test_empty_doc_fails_closed(spark):
    out = _run(spark, ["", "   \n  "])
    assert out[0]["keep"] is False and out[0]["n_words"] == 0
    assert out[1]["keep"] is False and out[1]["n_words"] == 0


def test_thresholds_overridable(spark):
    out = _run(
        spark,
        ["the cat and the hat have to be with us now ok"],
        min_words=5,
        min_stop_words=1,
        min_mean_word_len=2.0,
    )
    assert out[0]["keep"] is True
