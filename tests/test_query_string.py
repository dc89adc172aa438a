"""ES query_string mini-language on both readers: parser goldens, and the
compiled plans checked rank/score-identical against manual compositions
of the engine's typed surfaces (which are themselves oracle-checked).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.index.query import parse_query_string
from elasticsearch_jdbc_spark.sources import synthetic_corpus


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qs") / "idx")
    corpus = synthetic_corpus(spark, n_files=180, seed=91).cache()
    IndexBuilder(spark, d, partitions=4, with_positions=True).build(
        corpus, resume=False
    )
    return d, corpus


def test_parser_goldens():
    got = parse_query_string(
        '+merge -stream "read lock"~2 seg* fuzz~1 auto~ lang:go plain'
    )
    assert got == [
        ("must", "term", "merge"),
        ("must_not", "term", "stream"),
        ("should", "phrase", ("read lock", 2)),
        ("should", "wildcard", "seg*"),
        ("should", "fuzzy", ("fuzz", "1")),
        ("should", "fuzzy", ("auto", "")),
        ("should", "fielded", ("lang", "go")),
        ("should", "term", "plain"),
    ]
    # default_operator=and promotes bare clauses to must
    got = parse_query_string('alpha "b c"', default_operator="and")
    assert got == [
        ("must", "term", "alpha"),
        ("must", "phrase", ("b c", 0)),
    ]
    with pytest.raises(ValueError):
        parse_query_string("x", default_operator="xor")
    # empty phrase is dropped, quoted phrase keeps inner spacing
    assert parse_query_string('""') == []


def test_parser_connectives():
    """Lucene AND/OR/NOT (uppercase only) with the classic-parser
    pairwise rules: AND promotes both neighbors, OR demotes an unsigned
    default-must neighbor, NOT negates the next clause, +/- signs and
    connective-set occurs never get overridden."""
    assert parse_query_string("title:spark AND body:merge") == [
        ("must", "fielded", ("title", "spark")),
        ("must", "fielded", ("body", "merge")),
    ]
    assert parse_query_string("a b AND c") == [
        ("should", "term", "a"),
        ("must", "term", "b"),
        ("must", "term", "c"),
    ]
    # the classic QueryParser quirk: "a AND b OR c" keeps +b
    assert parse_query_string("a AND b OR c") == [
        ("must", "term", "a"),
        ("must", "term", "b"),
        ("should", "term", "c"),
    ]
    assert parse_query_string("a NOT b") == [
        ("should", "term", "a"),
        ("must_not", "term", "b"),
    ]
    assert parse_query_string("+a AND -b") == [
        ("must", "term", "a"),
        ("must_not", "term", "b"),
    ]
    assert parse_query_string("a && b || c ! d") == [
        ("must", "term", "a"),
        ("must", "term", "b"),
        ("should", "term", "c"),
        ("must_not", "term", "d"),
    ]
    # OR under default_operator=and demotes both neighbors
    assert parse_query_string("a OR b", default_operator="and") == [
        ("should", "term", "a"),
        ("should", "term", "b"),
    ]
    # lowercase and/or/not are plain terms (Lucene contract)
    assert parse_query_string("and or not") == [
        ("should", "term", "and"),
        ("should", "term", "or"),
        ("should", "term", "not"),
    ]


def test_sqs_infix_operators(spark, idx):
    """simple_query_string spells AND as `+` and OR as `|` — the DSL
    leaf translates token-wise onto the same parser; `flags` accepted
    and ignored."""
    from elasticsearch_jdbc_spark.index import IndexReader

    r = IndexReader(spark, idx[0])
    plus = {x["doc_id"] for x in r.search_dsl_df(
        {"simple_query_string": {"query": "merge + stream",
                                 "flags": "ALL"}}, k=None).collect()}
    want = {x["doc_id"] for x in r.search_dsl_df(
        {"query_string": {"query": "merge AND stream"}}, k=None).collect()}
    assert plus == want and plus
    bar = {x["doc_id"] for x in r.search_dsl_df(
        {"simple_query_string": {"query": "merge | stream"}}, k=None).collect()}
    wor = {x["doc_id"] for x in r.search_dsl_df(
        {"query_string": {"query": "merge OR stream"}}, k=None).collect()}
    assert bar == wor and plus < bar


def _scores(df, ident=("doc_id",)):
    if len(ident) == 1:
        return {row[ident[0]]: row["score"] for row in df.collect()}
    return {
        tuple(row[c] for c in ident): row["score"] for row in df.collect()
    }


def test_bool_terms_equivalence(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    got = _scores(r.query_string_df("+merge +segment -stream", k=None))
    want = _scores(r.search_bool_df("merge segment", "", "stream", k=None))
    assert got == want and want
    # default OR == bool should
    got = _scores(r.query_string_df("merge segment", k=None))
    want = _scores(r.search_bool_df("", "merge segment", "", k=None))
    assert got == want
    # default AND == bool must
    got = _scores(r.query_string_df("merge segment", k=None, default_operator="and"))
    want = _scores(r.search_bool_df("merge segment", "", "", k=None))
    assert got == want


def test_wildcard_and_fuzzy_equivalence(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    got = _scores(r.query_string_df("mer*", k=None))
    want = _scores(r.search_wildcard_df("mer*", k=None))
    assert got == want and want
    got = _scores(r.query_string_df("segmant~1", k=None))
    want = _scores(r.search_fuzzy_df("segmant", k=None, fuzziness=1))
    assert got == want and want
    # unsatisfiable must wildcard -> empty, not error
    assert r.query_string_df("+zzzqqq* merge", k=None).count() == 0
    # the same wildcard as should -> degrades to the plain term query
    got = _scores(r.query_string_df("zzzqqq* merge", k=None))
    want = _scores(r.search_bool_df("", "merge", "", k=None))
    assert got == want


def test_phrase_clause_semantics(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    phrase = {row["doc_id"]: row["score"] for row in r.search_phrase_df("merge segment", k=None).collect()}
    stream = {row["doc_id"]: row["score"] for row in r.search_bool_df("", "stream", "", k=None).collect()}
    assert phrase and stream
    # must phrase + optional term: candidacy == phrase set, scores add
    got = _scores(r.query_string_df('+"merge segment" stream', k=None))
    assert set(got) == set(phrase)
    for did, s in got.items():
        assert s == pytest.approx(phrase[did] + stream.get(did, 0.0), rel=1e-9)
    # pure-should phrase + term: union, scores add
    got = _scores(r.query_string_df('"merge segment" stream', k=None))
    assert set(got) == set(phrase) | set(stream)
    for did, s in got.items():
        assert s == pytest.approx(
            phrase.get(did, 0.0) + stream.get(did, 0.0), rel=1e-9
        )
    # negated phrase excludes from the whole query
    got = _scores(r.query_string_df('stream -"merge segment"', k=None))
    assert set(got) == set(stream) - set(phrase)
    # must_not binds phrase-qualified docs too (exclusion after combine)
    got = _scores(r.query_string_df('+"merge segment" -stream', k=None))
    assert set(got) == set(phrase) - set(stream)
    # slop carries through
    sloppy = {
        row["doc_id"]: row["score"]
        for row in r.search_phrase_df("merge stream", k=None, slop=3).collect()
    }
    got = _scores(r.query_string_df('"merge stream"~3', k=None))
    assert got.keys() == sloppy.keys()


def test_validation_and_ranking(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    with pytest.raises(ValueError):
        r.query_string_df("-merge", k=None)
    with pytest.raises(ValueError):
        r.query_string_df("lang:go merge")  # not a fields index
    # ranked cut respects (score desc, doc_id asc)
    full = _scores(r.query_string_df("merge segment stream", k=None))
    top = r.query_string_df("merge segment stream", k=5).collect()
    exp = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(row["doc_id"], pytest.approx(row["score"], rel=1e-9)) for row in top] == exp


def test_incremental_twin_and_upsert(spark, idx, tmp_path):
    d0, corpus = idx
    d = str(tmp_path / "live")
    shutil.copytree(d0, d)
    ri0 = IncrementalIndexReader(spark, d)
    # compact-equivalence before any delta: identical relation to base
    r = IndexReader(spark, d)
    base = _scores(r.query_string_df('+merge seg* -"read lock"', k=None))
    live = _scores(
        ri0.query_string_df('+merge seg* -"read lock"', k=None),
        ident=("segment", "doc_id"),
    )
    assert {did: s for (_, did), s in live.items()} == pytest.approx(base)
    # upsert a matching doc; it must requalify as its delta version
    hit = ri0.query_string_df("+merge", k=1).collect()[0]
    vdoc = (
        ri0.live_docs()
        .filter(
            (F.col("segment") == hit["segment"])
            & (F.col("doc_id") == hit["doc_id"])
        )
        .first()
    )
    upd = (
        corpus.filter(
            (F.col("repo") == vdoc["repo"]) & (F.col("path") == vdoc["path"])
        )
        .withColumn("content", F.concat(F.col("content"), F.lit(" merge")))
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, d, upd)
    ri = IncrementalIndexReader(spark, d)
    after = _scores(
        ri.query_string_df("+merge", k=None), ident=("segment", "doc_id")
    )
    assert (hit["segment"], hit["doc_id"]) not in after
    assert any(seg.startswith("delta") for seg, _ in after)


def test_attached_negation():
    """`!b` (attached Lucene prefix NOT) must exclude b, same as `-b`
    and `! b` — regression: it used to parse as a POSITIVE term."""
    from elasticsearch_jdbc_spark.index.query import parse_query_string

    assert parse_query_string("a !b") == [
        ("should", "term", "a"), ("must_not", "term", "b")]
    assert parse_query_string("a AND !b") == [
        ("must", "term", "a"), ("must_not", "term", "b")]
    assert parse_query_string("!field:x") == [
        ("must_not", "fielded", ("field", "x"))]
    # degenerate bangs still parse (never-error contract)
    assert parse_query_string("!") == []
    assert parse_query_string("!!")[0][0] == "must_not"
