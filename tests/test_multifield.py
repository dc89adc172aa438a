"""Multi-field indexing + boosted multi_match (field-namespaced postings,
per-field df, query-time boosts)."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

DOCS = [
    # (repo, path, commit, lang, title, body)
    ("r", "0", "c", "t", "spark engine", "a long body about other things entirely"),
    ("r", "1", "c", "t", "unrelated title", "spark spark spark in the body text"),
    ("r", "2", "c", "t", "engine room", "machinery and boilers"),
]


@pytest.fixture(scope="module")
def mf_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("mf") / "idx")
    df = spark.createDataFrame(
        DOCS,
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    IndexBuilder(spark, idx, partitions=2, fields=["title", "body"]).build(
        df, resume=False
    )
    reader = IndexReader(spark, idx)
    docs = spark.read.parquet(f"{idx}/docs").collect()
    return reader, {r["path"]: r["doc_id"] for r in docs}


def test_fields_recorded_and_namespaced(mf_idx, spark):
    reader, _ = mf_idx
    assert reader.manifest["fields"] == ["title", "body"]
    import os

    import pyarrow.dataset as ds

    terms = set(
        ds.dataset(os.path.join(reader.index_dir, "terms"), format="parquet")
        .to_table(columns=["term"]).column("term").to_pylist()
    )
    assert "title\x1fspark" in terms and "body\x1fspark" in terms
    assert "spark" not in terms  # only namespaced terms exist


def test_title_boost_changes_ranking(mf_idx):
    reader, key2id = mf_idx
    # balanced: body doc wins on tf (spark x3)
    flat = reader.search_fields("spark", boosts={"title": 1.0, "body": 1.0}, k=3)
    # title-heavy boost: the title match outranks the tf-heavy body match
    boosted = reader.search_fields("spark", boosts={"title": 10.0, "body": 1.0}, k=3)
    assert boosted[0][0] == key2id["0"]
    assert {d for d, _ in flat} == {key2id["0"], key2id["1"]}


def test_single_field_restriction(mf_idx):
    reader, key2id = mf_idx
    only_title = reader.search_fields("spark", boosts={"title": 1.0}, k=5)
    assert [d for d, _ in only_title] == [key2id["0"]]
    only_body = reader.search_fields("spark", boosts={"body": 1.0}, k=5)
    assert [d for d, _ in only_body] == [key2id["1"]]


def test_field_errors(mf_idx, spark, tmp_path):
    reader, _ = mf_idx
    with pytest.raises(ValueError, match="unknown fields"):
        reader.search_fields("spark", boosts={"nope": 1.0})
    df = spark.createDataFrame(
        [("r", "0", "c", "t", "x")],
        "repo string, path string, commit string, lang string, content string",
    )
    idx = str(tmp_path / "plain")
    IndexBuilder(spark, idx, partitions=1).build(df, resume=False)
    with pytest.raises(ValueError, match="fields"):
        IndexReader(spark, idx).search_fields("x")


def test_sha_invariant_over_concatenated_fields(mf_idx, spark):
    import hashlib

    reader, key2id = mf_idx
    docs = {r["path"]: r["sha256"] for r in
            spark.read.parquet(f"{reader.index_dir}/docs").collect()}
    for _, p, _, _, title, body in DOCS:
        expect = hashlib.sha256(f"{title}\x1e{body}".encode()).hexdigest()
        assert docs[p] == expect


def test_plain_search_routes_to_all_fields(mf_idx):
    reader, key2id = mf_idx
    plain = reader.search("spark", k=5)
    mm = reader.search_fields("spark", boosts={"title": 1.0, "body": 1.0}, k=5)
    assert plain == mm
    assert {d for d, _ in plain} == {key2id["0"], key2id["1"]}


def test_fields_prefix_fuzzy_bool_surfaces(mf_idx):
    """Prefix/fuzzy/bool on a fields-indexed corpus expand tokens to
    per-field namespaced terms instead of silently returning [] (ADVICE
    r01)."""
    reader, key2id = mf_idx
    pref = {d for d, _ in reader.search_prefix("spar", k=5)}
    assert pref == {key2id["0"], key2id["1"]}
    fz = {d for d, _ in reader.search_fuzzy("sparkk", k=5, fuzziness=1)}
    assert fz == {key2id["0"], key2id["1"]}
    b = reader.search_bool(must="spark", must_not="engine", k=5)
    assert [d for d, _ in b] == [key2id["1"]]
    # must = AND across tokens, ANY field per token
    b2 = reader.search_bool(must="spark engine", k=5)
    assert [d for d, _ in b2] == [key2id["0"]]
    # title-only boost restricts prefix matches to the title field
    only_title = {d for d, _ in reader.search_prefix("spar", boosts={"title": 1.0}, k=5)}
    assert only_title == {key2id["0"]}


def test_fields_surfaces_wand_rank_identical(mf_idx):
    reader, _ = mf_idx
    dense_pref = reader.search_prefix("spar", k=5)
    dense_fz = reader.search_fuzzy("sparkk", k=5, fuzziness=1)
    dense_mm = reader.search_fields("spark", boosts={"title": 3.0, "body": 1.0}, k=5)
    reader.DENSE_LIMIT = 0
    try:
        assert reader.search_prefix("spar", k=5) == dense_pref
        assert reader.search_fuzzy("sparkk", k=5, fuzziness=1) == dense_fz
        assert (
            reader.search_fields("spark", boosts={"title": 3.0, "body": 1.0}, k=5)
            == dense_mm
        )
    finally:
        del reader.DENSE_LIMIT


def test_search_fields_df_rank_identical(mf_idx):
    """Distributed multi_match equals the driver path, boosts included."""
    reader, _ = mf_idx
    for boosts in ({"title": 1.0, "body": 1.0}, {"title": 10.0, "body": 1.0},
                   {"title": 1.0}):
        drv = reader.search_fields("spark engine", boosts=boosts, k=5)
        dist = [
            (r["doc_id"], round(r["score"], 9))
            for r in reader.search_fields_df("spark engine", boosts=boosts, k=5).collect()
        ]
        assert dist == [(d, round(s, 9)) for d, s in drv], boosts


def test_min_should_match_counts_token_groups(mf_idx):
    """min_should_match on a fields index counts distinct TOKENS matched in
    any field — and is no longer silently dropped by search() (ADVICE
    r02)."""
    reader, key2id = mf_idx
    loose = {d for d, _ in reader.search("spark engine", k=5)}
    assert loose == {key2id["0"], key2id["1"], key2id["2"]}
    strict = reader.search("spark engine", k=5, min_should_match=2)
    # only doc 0 has both tokens (title: "spark engine")
    assert [d for d, _ in strict] == [key2id["0"]]
    # the strict doc's score equals its loose score (mSM filters, never
    # rescores)
    loose_scores = dict(reader.search("spark engine", k=5))
    assert strict[0][1] == loose_scores[key2id["0"]]
    # the WAND fallback counts token groups too (distinct groups among the
    # aligned cursors) — rank-identical to dense
    reader.DENSE_LIMIT = 0
    try:
        assert reader.search("spark engine", k=5, min_should_match=2) == strict
        assert reader.search("spark engine", k=5) == sorted(
            reader.search("spark engine", k=5), key=lambda x: (-x[1], x[0])
        )
    finally:
        del reader.DENSE_LIMIT


def test_fuzzy_edit_budget_cannot_span_field_name(spark, tmp_path_factory):
    """With similarly-named fields ('title'/'titles'), a fuzzy expansion for
    field='title' must not admit terms of field 'titles' by spending the
    edit budget on the field name (ADVICE r02)."""
    idx = str(tmp_path_factory.mktemp("mf_fz") / "idx")
    df = spark.createDataFrame(
        [("r", "0", "c", "t", "spark rules", "other words"),
         ("r", "1", "c", "t", "nothing here", "spark text")],
        "repo string, path string, commit string, lang string, "
        "title string, titles string",
    )
    IndexBuilder(spark, idx, partitions=1, fields=["title", "titles"]).build(
        df, resume=False
    )
    reader = IndexReader(spark, idx)
    exp = reader.expand_fuzzy("spark", max_dist=1, field="title")
    assert "title\x1fspark" in exp
    assert all(t.split("\x1f")[0] == "title" for t in exp)
    # and the per-field restriction holds end-to-end
    hits = {d for d, _ in reader.search_fuzzy("spark", fuzziness=1,
                                              boosts={"title": 1.0}, k=5)}
    docs = {r["path"]: r["doc_id"] for r in
            spark.read.parquet(f"{idx}/docs").collect()}
    assert hits == {docs["0"]}


def test_distributed_min_should_match(mf_idx):
    """search_df/search_fields_df honor min_should_match via the in-
    aggregation group count — rank-identical to the driver."""
    reader, key2id = mf_idx
    for msm in (1, 2):
        drv = reader.search("spark engine", k=5, min_should_match=msm)
        dist = [
            (r["doc_id"], round(r["score"], 9))
            for r in reader.search_df("spark engine", k=5, min_should_match=msm).collect()
        ]
        assert dist == [(d, round(s, 9)) for d, s in drv], msm
    strict = reader.search_df("spark engine", k=5, min_should_match=2).collect()
    assert [r["doc_id"] for r in strict] == [key2id["0"]]


def test_explain_count_fields(mf_idx):
    """explain/count on a fields corpus: namespaced per-field breakdown with
    boosts; count groups tokens across fields."""
    reader, key2id = mf_idx
    boosts = {"title": 10.0, "body": 1.0}
    top_doc, top_score = reader.search_fields("spark", boosts=boosts, k=1)[0]
    ex = reader.explain("spark", top_doc, boosts=boosts)
    assert ex["score"] == top_score
    assert all("\x1f" in t for t in ex["terms"])
    assert reader.count("spark engine") == 3
    assert reader.count("spark engine", min_should_match=2) == 1
