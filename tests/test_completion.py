"""Completion suggester (ES completion field) tests: named sorted-parquet
dictionaries, weighted prefix ranking, fuzzy prefixes, driver/distributed
tier parity, and the incremental live twin."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
from elasticsearch_jdbc_spark.index.incremental_index import (
    IncrementalIndexReader,
    apply_incremental,
)

# title = a completion input shared across docs (dedupe -> max pop wins);
# pop = the ES weight field
DOCS = [
    ("r", "a/0", "c", "t", "alpha tokens one", "search basics", 7),
    ("r", "a/1", "c", "t", "alpha tokens two", "search basics", 9),
    ("r", "a/2", "c", "t", "alpha tokens three", "search advanced", 4),
    ("r", "b/0", "c", "t", "beta tokens", "serve traffic", 12),
    ("r", "b/1", "c", "t", "beta tokens", "server tuning", 2),
    ("r", "b/2", "c", "t", "beta tokens", "shard sizing", 5),
]
SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " title string, pop int"
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(prefix, size=5, fuzziness=0, prefix_length=1, live=None):
    """(suggestion, weight) ranked exactly like the engine, from DOCS
    (or an overriding live (title, pop) list)."""
    rows = live if live is not None else [(d[5], d[6]) for d in DOCS]
    best: dict[str, int] = {}
    for title, pop in rows:
        if fuzziness == 0:
            if not title.startswith(prefix):
                continue
        else:
            if not title.startswith(prefix[:prefix_length]):
                continue
            if len(title) < len(prefix) - fuzziness:
                continue
            if _lev(title[: len(prefix)], prefix) > fuzziness:
                continue
        best[title] = max(best.get(title, -1), pop)
    ranked = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:size]


@pytest.fixture(scope="module")
def comp_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("comp") / "idx")
    df = spark.createDataFrame(DOCS, SCHEMA)
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    r = IndexReader(spark, idx)
    r.build_completions("title", weight_col="pop")
    return r


def _rows(df):
    return [(r["suggestion"], r["weight"]) for r in df.collect()]


def test_exact_prefix_weight_ranking(comp_idx):
    # "se" -> serve traffic (12), search basics (9: max of 7/9 dedupe),
    # search advanced (4), server tuning (2)
    assert _rows(comp_idx.complete_df("se")) == _brute("se") == [
        ("serve traffic", 12),
        ("search basics", 9),
        ("search advanced", 4),
        ("server tuning", 2),
    ]


def test_size_cut_and_no_match(comp_idx):
    assert _rows(comp_idx.complete_df("se", size=2)) == _brute("se", size=2)
    assert _rows(comp_idx.complete_df("zz")) == []


def test_dedupe_keeps_min_docid_of_best(comp_idx):
    # 'search basics' appears on internal docs for a/0 (pop 7) and a/1
    # (pop 9); weight = max = 9
    row = comp_idx.complete_df("search ba").collect()[0]
    assert (row["suggestion"], row["weight"]) == ("search basics", 9)


def test_fuzzy_prefix(comp_idx):
    # typo'd prefix "saarch" (1 edit from "search"), anchor 's' exact
    got = _rows(comp_idx.complete_df("saarch", fuzziness=1))
    assert got == _brute("saarch", fuzziness=1)
    assert [s for s, _ in got] == ["search basics", "search advanced"]
    # fuzziness=0 on the same typo finds nothing
    assert _rows(comp_idx.complete_df("saarch")) == []


def test_driver_tier_parity(comp_idx):
    for kw in (
        dict(prefix="se"),
        dict(prefix="s", size=3),
        dict(prefix="saarch", fuzziness=1),
        dict(prefix="zz"),
    ):
        df = _rows(comp_idx.complete_df(**kw))
        drv = [(o["text"], o["weight"]) for o in comp_idx.complete(**kw)]
        assert df == drv, kw


def test_named_dictionaries(comp_idx):
    comp_idx.build_completions("path")  # weight = doc count = 1 each
    got = _rows(comp_idx.complete_df("a/", name="path"))
    assert got == [("a/0", 1), ("a/1", 1), ("a/2", 1)]
    # two dictionaries now -> name= required
    with pytest.raises(ValueError, match="pass name="):
        comp_idx.complete_df("a/")
    with pytest.raises(ValueError, match="unknown completion dictionary"):
        comp_idx.complete_df("a/", name="nope")
    # title dictionary still intact beside the new one
    assert _rows(comp_idx.complete_df("se", name="title")) == _brute("se")


def test_errors(spark, comp_idx, tmp_path):
    with pytest.raises(ValueError, match="no completion dictionary"):
        IndexReader(spark, comp_idx.index_dir).complete_df  # ok: attr only
        from elasticsearch_jdbc_spark.index.completion import complete_df

        complete_df(spark, str(tmp_path), "se")
    with pytest.raises(ValueError, match="not in docs table"):
        comp_idx.build_completions("nope")
    with pytest.raises(ValueError, match="non-empty"):
        comp_idx.complete_df("", name="title")


def test_incremental_live_completion(spark, tmp_path):
    idx = str(tmp_path / "inc")
    df = spark.createDataFrame(DOCS, SCHEMA)
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    # upsert: 'search basics' doc a/1 retitled 'search rewritten' pop 20;
    # delete b/0 ('serve traffic')
    ops = spark.createDataFrame(
        [
            ("r", "a/1", "c", "t", "alpha tokens two", "search rewritten", 20, "index"),
            ("r", "b/0", "c", "t", "", "", 0, "delete"),
        ],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    live = [("search basics", 7), ("search advanced", 4), ("server tuning", 2),
            ("shard sizing", 5), ("search rewritten", 20)]
    got = [
        (x["suggestion"], x["weight"])
        for x in r.complete_df("s", "title", weight_col="pop", size=10).collect()
    ]
    assert got == _brute("s", size=10, live=live)
    # fuzzy on the live view too
    got_f = [
        (x["suggestion"], x["weight"])
        for x in r.complete_df("saarch", "title", weight_col="pop",
                               fuzziness=1).collect()
    ]
    assert got_f == _brute("saarch", fuzziness=1, live=live)
