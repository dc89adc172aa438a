"""Term suggester (`_suggest` "did you mean") tests: prefix-gated,
length-windowed Levenshtein candidates from the term dictionary ranked
(distance asc, df desc, term asc), on all three tiers — distributed
suggest_df, driver suggest(), and the incremental live-index twin."""

from __future__ import annotations

import os

import pytest

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
from elasticsearch_jdbc_spark.index.incremental_index import (
    IncrementalIndexReader,
    apply_incremental,
)

# vocabulary with controlled dfs: merge x3 docs, merged x2, marge x1,
# stream x2, streams x1, xylophone (no shared prefix with anything)
DOCS = [
    ("r", "0", "c", "t", "merge stream alpha"),
    ("r", "1", "c", "t", "merge merged stream beta"),
    ("r", "2", "c", "t", "merge merged marge gamma"),
    ("r", "3", "c", "t", "streams xylophone delta"),
]

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _lev(a: str, b: str) -> int:
    import numpy as np

    d = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = d.copy()
        d[0] = i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return int(d[-1])


def _brute(vocab: list[tuple[str, int]], tok: str, size=5, max_edits=2,
           prefix_length=1) -> list[tuple[str, int, int]]:
    """(suggestion, distance, df) ranked exactly like the engine."""
    cands = []
    for term, df in vocab:
        if prefix_length and term[:prefix_length] != tok[:prefix_length]:
            continue
        if abs(len(term) - len(tok)) > max_edits:
            continue
        d = _lev(term, tok)
        if 1 <= d <= max_edits:
            cands.append((d, -df, term))
    cands.sort()
    return [(t, d, -negdf) for d, negdf, t in cands[:size]]


@pytest.fixture(scope="module")
def sg_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sg") / "idx")
    df = spark.createDataFrame(DOCS, SCHEMA)
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    return IndexReader(spark, idx)


def _vocab(reader) -> list[tuple[str, int]]:
    import pyarrow.dataset as ds

    t = ds.dataset(
        os.path.join(reader.index_dir, "terms"), format="parquet"
    ).to_table(columns=["term", "df"])
    return list(zip(t.column("term").to_pylist(), t.column("df").to_pylist()))


def test_suggest_df_matches_bruteforce(sg_idx):
    vocab = _vocab(sg_idx)
    for tok in ("merge", "merg", "stream", "streem", "marg"):
        got = [
            (r["suggestion"], r["distance"], r["df"])
            for r in sg_idx.suggest_df(tok).collect()
        ]
        assert got == _brute(vocab, tok), tok


def test_suggest_ranking_distance_then_df(sg_idx):
    # input "merge": merged (d=1, df=2) and marge (d=1, df=1) both at
    # distance 1 -> df breaks the tie; "merge" itself (d=0) is excluded
    got = [
        (r["suggestion"], r["distance"], r["df"])
        for r in sg_idx.suggest_df("merge").collect()
    ]
    assert got[0] == ("merged", 1, 2)
    assert ("marge", 1, 1) in got
    assert all(s != "merge" for s, _, _ in got)


def test_suggest_driver_matches_df(sg_idx):
    for text in ("merge streem", "marg"):
        df_rows = {}
        for r in sg_idx.suggest_df(text).collect():
            df_rows.setdefault(r["input_term"], []).append(
                (r["suggestion"], r["distance"], r["df"])
            )
        drv = sg_idx.suggest(text)
        assert set(drv) == set(sg_idx.query_terms(text))
        for tok, opts in drv.items():
            assert [(o["text"], o["distance"], o["df"]) for o in opts] == \
                df_rows.get(tok, []), tok


def test_suggest_prefix_gate_and_no_candidates(sg_idx):
    # 'xylophone' misspelled with a different first letter finds nothing
    # (prefix_length=1 gate), but prefix_length=0 widens to the full dict
    assert sg_idx.suggest_df("zylophone").count() == 0
    wide = sg_idx.suggest_df("zylophone", prefix_length=0).collect()
    assert [r["suggestion"] for r in wide] == ["xylophone"]
    # empty analyzed input -> empty frame with the contract schema
    empty = sg_idx.suggest_df("")
    assert empty.count() == 0
    assert empty.columns == ["input_term", "suggestion", "distance", "df"]


def test_suggest_fields_namespace(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sgf") / "idx")
    df = spark.createDataFrame(
        [("r", "0", "c", "t", "merge title", "stream body")],
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    IndexBuilder(spark, idx, partitions=1, fields=["title", "body"]).build(
        df, resume=False
    )
    reader = IndexReader(spark, idx)
    got = [r["suggestion"] for r in reader.suggest_df("merg", field="title").collect()]
    assert got == ["merge"]
    # the other field's namespace does not leak in
    assert reader.suggest_df("streem", field="title").count() == 0
    assert [
        r["suggestion"] for r in reader.suggest_df("streem", field="body").collect()
    ] == ["stream"]
    with pytest.raises(ValueError):
        reader.suggest_df("merg")  # field= required on a fields corpus
    with pytest.raises(ValueError):
        reader.suggest_df("merg", field="nope")


def test_suggest_incremental_sums_df(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sgi") / "idx")
    base = spark.createDataFrame(DOCS[:2], SCHEMA)
    IndexBuilder(spark, idx, partitions=1).build(base, resume=False)
    delta = spark.createDataFrame(
        [(r, p, c, l, t, "index") for r, p, c, l, t in DOCS[2:]],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, idx, delta)
    live = IncrementalIndexReader(spark, idx)
    got = [
        (r["suggestion"], r["distance"], r["df"])
        for r in live.suggest_df("merge").collect()
    ]
    # df summed across base+delta segments: merged 1+1, marge 0+1
    assert got == [("merged", 1, 2), ("marge", 1, 1)]
    # multi-token driver text routes each token independently
    both = live.suggest_df("merge streem").collect()
    assert {r["input_term"] for r in both} == {"merge", "streem"}
    # interactive tier is rank-identical to the distributed tier
    drv = live.suggest("merge streem")
    df_rows: dict = {}
    for r in both:
        df_rows.setdefault(r["input_term"], []).append(
            (r["suggestion"], r["distance"], r["df"])
        )
    for tok, opts in drv.items():
        assert [(o["text"], o["distance"], o["df"]) for o in opts] == \
            df_rows.get(tok, []), tok


def test_suggest_mode(spark, sg_idx, tmp_path):
    """ES suggest_mode contract on all tiers (engine default 'always'; ES
    body default 'missing' applied by the request-body dispatch):
    missing mutes present tokens, popular keeps only candidates strictly
    more frequent than the input token."""
    r = sg_idx
    # dfs: merge=3, merged=2, marge=1
    # missing: present token -> nothing; absent token -> unchanged
    assert r.suggest_df("merge", suggest_mode="missing").count() == 0
    absent_always = [
        (x["suggestion"], x["distance"], x["df"])
        for x in r.suggest_df("merje").collect()
    ]
    absent_missing = [
        (x["suggestion"], x["distance"], x["df"])
        for x in r.suggest_df("merje", suggest_mode="missing").collect()
    ]
    assert absent_missing == absent_always and absent_always
    # popular: df must strictly beat the input token's df
    pop = [
        (x["suggestion"], x["df"])
        for x in r.suggest_df("merged", suggest_mode="popular").collect()
    ]
    assert pop == [("merge", 3)]  # marge (df 1) < merged (df 2) dropped
    assert r.suggest_df("merge", suggest_mode="popular").count() == 0
    # driver tier is rank-identical per mode
    assert r.suggest("merge", suggest_mode="missing")["merge"] == []
    drv_pop = r.suggest("merged", suggest_mode="popular")["merged"]
    assert [(d["text"], d["df"]) for d in drv_pop] == [("merge", 3)]
    with pytest.raises(ValueError, match="suggest_mode"):
        r.suggest_df("merge", suggest_mode="sometimes")
    with pytest.raises(ValueError, match="suggest_mode"):
        r.suggest("merge", suggest_mode="sometimes")
    # incremental twins agree (df summed across segments)
    idx = str(tmp_path / "sgm")
    df = spark.createDataFrame(DOCS, SCHEMA)
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    delta = spark.createDataFrame(
        [("r", "9", "c", "t", "merge epsilon", "index")],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, idx, delta)
    live = IncrementalIndexReader(spark, idx)
    # merge now df 4 across segments; merged still 2
    assert live.suggest_df("merge", suggest_mode="missing").count() == 0
    lp = [
        (x["suggestion"], x["df"])
        for x in live.suggest_df("merged", suggest_mode="popular").collect()
    ]
    assert lp == [("merge", 4)]
    assert live.suggest("merged", suggest_mode="popular")["merged"] == [
        {"text": "merge", "distance": 1, "df": 4}
    ]
    assert live.suggest("merge", suggest_mode="missing")["merge"] == []
    # body dispatch defaults to ES's 'missing'
    res = r.search_request({
        "query": {"match": {"content": "alpha"}},
        "suggest": {"s": {"text": "merge", "term": {}}},
    })
    assert res["suggest"]["s"].count() == 0
    res2 = r.search_request({
        "query": {"match": {"content": "alpha"}},
        "suggest": {"s": {"text": "merge",
                          "term": {"suggest_mode": "always"}}},
    })
    assert res2["suggest"]["s"].count() > 0
