"""ES significant_text aggregation: re-analysis foreground over the stored
token streams + the deterministic filter_duplicate_text variant.

Contract points (SignificantTextAggregationBuilder):
  * without duplicate filtering, fg stats from re-analysis must equal
    significant_terms' postings-derived fg stats (same analyzed corpus) and
    bg must equal the dictionary df — so the two aggs must return the SAME
    rows on a fresh index;
  * filter_duplicate_text counts byte-identical analyzed streams once;
  * the live tier masks tombstones in the FOREGROUND while background
    follows the Lucene deleted-docs stats rule (summed segment dfs);
  * on a fields corpus the agg is single-field (field= required) and both
    fg tokens and bg stats resolve inside the namespace."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge buffer"

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _brute_sigtext(contents, query_terms, size, min_doc_count=1, dedup=False):
    """contents: list of raw doc texts (the live corpus). Returns the JLH
    table with optional exact-duplicate-stream folding of the FG set."""
    toks = [tokenize_py(c) for c in contents]
    n = float(len(toks))
    bg: dict[str, int] = {}
    for ts in toks:
        for t in set(ts):
            bg[t] = bg.get(t, 0) + 1
    fg_lists = [ts for ts in toks if set(ts) & set(query_terms)]
    if dedup:
        seen, ded = set(), []
        for ts in fg_lists:
            key = "\x1e".join(ts)
            if key not in seen:
                seen.add(key)
                ded.append(ts)
        fg_lists = ded
    fg_n = float(len(fg_lists))
    fg: dict[str, int] = {}
    for ts in fg_lists:
        for t in set(ts):
            fg[t] = fg.get(t, 0) + 1
    out = []
    for t, fgc in fg.items():
        if fgc < min_doc_count:
            continue
        fr, br = fgc / fg_n, bg[t] / n
        out.append((t, fgc, bg[t], round((fr - br) * (fr / br), 6)))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:size]


def _rows(df):
    return [
        (r["term"], r["fg_count"], r["bg_count"], r["score"]) for r in df.collect()
    ]


def test_base_equals_significant_terms(spark, tmp_path):
    """Fresh index, no duplicate filtering: re-analysis fg == postings fg
    and dictionary bg == live postings bg, so the two aggs agree exactly."""
    d = str(tmp_path / "st_idx")
    corpus = synthetic_corpus(spark, n_files=200, seed=74).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    r = IndexReader(spark, d)
    got = _rows(r.significant_text_df(Q, size=12))
    want = _rows(r.significant_terms_df(Q, size=12))
    assert got and got == want
    # filter context restricts the foreground through the same match set
    got_f = _rows(r.significant_text_df(Q, size=12, filter_sql="lang = 'java'"))
    want_f = _rows(r.significant_terms_df(Q, size=12, filter_sql="lang = 'java'"))
    assert got_f == want_f


def test_filter_duplicate_text(spark, tmp_path):
    """Planted cut-and-paste boilerplate: six copies of one matching doc
    dominate the raw counts but fold to ONE vote under the filter."""
    boiler = "merge sort merge the buffer boiler plate reply chain text"
    uniq = [
        "merge interval tree walk",
        "buffer pool eviction clock sweep",
        "merge policy tiered segments",
        "quiet unrelated document no match here",
    ]
    rows = [("r", f"b/{i}", "c", "t", boiler) for i in range(6)]
    rows += [("r", f"u/{i}", "c", "t", c) for i, c in enumerate(uniq)]
    d = str(tmp_path / "dup_idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(rows, SCHEMA), resume=False
    )
    r = IndexReader(spark, d)
    contents = [boiler] * 6 + uniq

    raw = _rows(r.significant_text_df(Q, size=20, min_doc_count=1))
    assert raw == _brute_sigtext(contents, Q.split(), 20, dedup=False)
    ded = _rows(
        r.significant_text_df(
            Q, size=20, min_doc_count=1, filter_duplicate_text=True
        )
    )
    assert ded == _brute_sigtext(contents, Q.split(), 20, dedup=True)
    # the boilerplate-only tokens ('boiler') collapse from 6 votes to 1
    raw_fg = {t: fgc for t, fgc, _, _ in raw}
    ded_fg = {t: fgc for t, fgc, _, _ in ded}
    assert raw_fg["boiler"] == 6 and ded_fg["boiler"] == 1


def test_live_tier(spark, tmp_path):
    d = str(tmp_path / "live_idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=75).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=30, seed=76)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
        .cache()
    )
    apply_incremental(spark, d, extra)
    ri = IncrementalIndexReader(spark, d)
    # adds-only: summed segment dfs == union-corpus dfs, so the live agg
    # equals the brute recompute over the whole union
    contents = [
        row["content"]
        for row in corpus.unionByName(extra.drop("_optype")).collect()
    ]
    got = _rows(ri.significant_text_df(Q, size=12))
    assert got == _brute_sigtext(contents, Q.split(), 12, min_doc_count=3)

    # deletes: foreground is tombstone-exact (shrinks or holds), background
    # follows the Lucene deleted-docs stats rule (unchanged until merge)
    before = {t: (fgc, bgc) for t, fgc, bgc, _ in got}
    ri.delete_by_query("merge")
    ri = IncrementalIndexReader(spark, d)
    after = {
        t: (fgc, bgc)
        for t, fgc, bgc, _ in _rows(
            ri.significant_text_df(Q, size=50, min_doc_count=1)
        )
    }
    assert any(t not in after or after[t][0] < before[t][0] for t in before)
    for t in set(before) & set(after):
        assert after[t][0] <= before[t][0]
        assert after[t][1] == before[t][1]


def test_fields_namespace(spark, tmp_path):
    schema = (
        "repo string, path string, commit string, lang string, "
        "title string, body string"
    )
    rows = [
        ("r", "0", "c", "t", "merge engine title", "buffer body merge pool"),
        ("r", "1", "c", "t", "merge title twice merge", "quiet body text"),
        ("r", "2", "c", "t", "unrelated words here", "merge buffer body blend"),
        ("r", "3", "c", "t", "another merge title", "other body content"),
    ]
    d = str(tmp_path / "f_idx")
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        spark.createDataFrame(rows, schema), resume=False
    )
    r = IndexReader(spark, d)
    with pytest.raises(ValueError, match="pass field="):
        r.significant_text_df(Q)
    got_t = _rows(r.significant_text_df(Q, size=20, min_doc_count=1, field="title"))
    got_b = _rows(r.significant_text_df(Q, size=20, min_doc_count=1, field="body"))
    # brute: fg = docs matching the query in ANY field (the engine's
    # multi_match default); counted tokens restricted to the one field
    fg_rows = [x for x in rows if set(tokenize_py(x[4] + " " + x[5])) & set(Q.split())]
    assert len(fg_rows) == 4  # every planted doc matches somewhere

    def brute_field(col):
        n = float(len(rows))
        fgl = [tokenize_py(x[col]) for x in fg_rows]
        bg: dict[str, int] = {}
        for x in rows:
            for t in set(tokenize_py(x[col])):
                bg[t] = bg.get(t, 0) + 1
        fg_n = float(len(fgl))
        out = []
        fgc: dict[str, int] = {}
        for ts in fgl:
            for t in set(ts):
                fgc[t] = fgc.get(t, 0) + 1
        for t, c in fgc.items():
            fr, br = c / fg_n, bg[t] / n
            out.append((t, c, bg[t], round((fr - br) * (fr / br), 6)))
        out.sort(key=lambda x: (-x[3], x[0]))
        return out[:20]

    assert got_t == brute_field(4)
    assert got_b == brute_field(5)
    assert got_t != got_b

    # plain index rejects field=
    d2 = str(tmp_path / "plain_idx")
    IndexBuilder(spark, d2, partitions=2).build(
        spark.createDataFrame(
            [("r", "0", "c", "t", "merge buffer words")], SCHEMA
        ),
        resume=False,
    )
    with pytest.raises(ValueError, match="not a fields index"):
        IndexReader(spark, d2).significant_text_df(Q, field="title")
