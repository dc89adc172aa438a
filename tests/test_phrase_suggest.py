"""Phrase suggester tests: StupidBackoff bigram LM + Laplace unigram
floor + edit error model, brute-forced from the raw corpus, on both tiers
(driver phrase_suggest, distributed phrase_suggest_df), plus the
per-field LM on a fields-indexed corpus."""

from __future__ import annotations

import itertools
import math

import pytest

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

DOCS = [
    ("r", "0", "c", "t", "merge segment buffer merge segment"),
    ("r", "1", "c", "t", "merge segment merge buffer"),
    ("r", "2", "c", "t", "slow query scan slow query"),
    ("r", "3", "c", "t", "flow query scan"),
    ("r", "4", "c", "t", "merge stream segment buffer"),
]
SCHEMA = "repo string, path string, commit string, lang string, content string"


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _stats(docs=DOCS):
    cf, c2 = {}, {}
    n = 0
    for d in docs:
        toks = tokenize_py(d[4])
        n += len(toks)
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    return cf, c2, n


def _brute(text, size=3, max_edits=2, prefix_length=1, per_token=5,
           backoff=0.4, alpha=0.5, error_discount=0.5, docs=DOCS,
           v_override=None):
    cf, c2, n = _stats(docs)
    # live tier sums per-segment vocabularies (documented approximation)
    v = v_override if v_override is not None else len(cf)
    toks = tokenize_py(text)
    # dedup first-occurrence like query_terms
    seen, tokens = set(), []
    for t in toks:
        if t not in seen:
            seen.add(t)
            tokens.append(t)
    shortlists = []
    for tok in tokens:
        cands = []
        for term, tcf in cf.items():
            if prefix_length and term[:prefix_length] != tok[:prefix_length]:
                continue
            if abs(len(term) - len(tok)) > max_edits:
                continue
            d = _lev(term, tok)
            if d <= max_edits:
                cands.append((d, -tcf, term))
        cands.sort()
        shortlists.append([(t, -negcf, d) for d, negcf, t in cands[:per_token]])
    if any(not s for s in shortlists):
        return []

    def p_uni(c):
        return (c + alpha) / (n + alpha * v)

    out = []
    ident = " ".join(tokens)
    for beam in itertools.product(*shortlists):
        score = math.log(p_uni(beam[0][1]))
        edits = beam[0][2]
        for (w1, cf1, _), (w2, cf2, d2) in zip(beam, beam[1:]):
            pair = c2.get((w1, w2), 0)
            score += (math.log(pair / cf1) if pair > 0
                      else math.log(backoff * p_uni(cf2)))
            edits += d2
        score += edits * math.log(error_discount)
        phrase = " ".join(w for w, _, _ in beam)
        if phrase != ident:
            out.append((round(score, 4), phrase))
    out.sort(key=lambda sp: (-sp[0], sp[1]))
    return [(p, s) for s, p in out[:size]]


@pytest.fixture(scope="module")
def ps_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("ps") / "idx")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    r = IndexReader(spark, idx)
    r.build_ngram_stats()
    return r


CASES = ["mrge segent", "slow quary", "merge segment", "flow query scan",
         "merge", "xyz segment"]


def test_driver_matches_bruteforce(ps_idx):
    for text in CASES:
        got = [(o["text"], o["score"]) for o in ps_idx.phrase_suggest(text)]
        assert got == _brute(text), text


def test_df_matches_driver(ps_idx):
    for text in CASES:
        df = [(r["suggestion"], r["score"])
              for r in ps_idx.phrase_suggest_df(text).collect()]
        drv = [(o["text"], o["score"]) for o in ps_idx.phrase_suggest(text)]
        assert df == drv, text


def test_bigram_beats_distance(ps_idx):
    # prefix_length=0 lets slow/flow compete for the first slot; the
    # (slow, query) bigram is corpus-frequent so 'slow query' must rank
    # above 'flow query' despite flow's extra edit being only one step
    got = [o["text"] for o in ps_idx.phrase_suggest("slow quary", prefix_length=0)]
    assert got == [p for p, _ in _brute("slow quary", prefix_length=0)]
    assert got[0] == "slow query"
    assert "flow query" in got
    dfg = [r["suggestion"]
           for r in ps_idx.phrase_suggest_df("slow quary", prefix_length=0).collect()]
    assert dfg == got


def test_identity_excluded_and_empty(ps_idx):
    assert all(o["text"] != "merge segment"
               for o in ps_idx.phrase_suggest("merge segment"))
    assert ps_idx.phrase_suggest("") == []
    assert ps_idx.phrase_suggest_df("").collect() == []
    # no candidates at one position -> no phrase suggestions
    assert ps_idx.phrase_suggest("xyz segment") == []


def test_guards(spark, ps_idx, tmp_path):
    with pytest.raises(ValueError, match="caps input"):
        ps_idx.phrase_suggest("a b c d e f")
    idx2 = str(tmp_path / "nostats")
    IndexBuilder(spark, idx2, partitions=2).build(
        spark.createDataFrame(DOCS[:2], SCHEMA), resume=False
    )
    with pytest.raises(ValueError, match="no ngram stats"):
        IndexReader(spark, idx2).phrase_suggest("merge segment")


def test_incremental_live_lm(spark, tmp_path):
    """Live tier: deltas extend the LM (cf/c2 summed across segments —
    masked docs still counted, the deleted-docs stats rule), tier parity
    holds, and a base without ngram stats refuses clearly."""
    from pyspark.sql import functions as F

    from elasticsearch_jdbc_spark.index import (
        IncrementalIndexReader,
        apply_incremental,
    )

    idx = str(tmp_path / "live")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    base = IndexReader(spark, idx)
    base.build_ngram_stats()
    # delta introduces a new bigram (merge gamma) x3 — strong enough that
    # 'merge gamma' outranks alternatives for the typo "mrge gamma"
    ops = spark.createDataFrame(
        [
            ("r", "9", "c", "t", "merge gamma merge gamma merge gamma"),
        ],
        SCHEMA,
    ).withColumn("_optype", F.lit("index"))
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    live_docs = DOCS + [("r", "9", "c", "t", "merge gamma merge gamma merge gamma")]
    # engine V = sum of per-segment vocabularies: base 8 terms + delta 2
    v_sum = len(_stats(DOCS)[0]) + len(_stats([live_docs[-1]])[0])
    got = [(o["text"], o["score"]) for o in r.phrase_suggest("mrge gamma")]
    assert got == _brute("mrge gamma", docs=live_docs, v_override=v_sum)
    assert got[0][0] == "merge gamma"
    dfg = [(x["suggestion"], x["score"])
           for x in r.phrase_suggest_df("mrge gamma").collect()]
    assert dfg == got
    # base segment without the sidecar -> clear refusal
    idx2 = str(tmp_path / "nongrams")
    IndexBuilder(spark, idx2, partitions=1).build(
        spark.createDataFrame(DOCS[:2], SCHEMA), resume=False
    )
    apply_incremental(spark, idx2, ops)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no ngram stats on segment"):
        IncrementalIndexReader(spark, idx2).phrase_suggest("mrge gamma")


def test_fields_namespaced_lm(spark, tmp_path):
    """Per-field LM: the same surface token sequence in different fields
    must not cross-pollinate bigrams."""
    docs = [
        ("r", "0", "c", "t", "merge segment buffer", "alpha beta"),
        ("r", "1", "c", "t", "merge segment", "alpha gamma"),
    ]
    schema = SCHEMA + ", title string"
    idx = str(tmp_path / "fidx")
    IndexBuilder(spark, idx, partitions=2, fields=("content", "title")).build(
        spark.createDataFrame(docs, schema), resume=False
    )
    r = IndexReader(spark, idx)
    r.build_ngram_stats()
    got = r.phrase_suggest("mrge segent", field="content")
    assert got and got[0]["text"] == "merge segment"
    dfg = [(x["suggestion"], x["score"])
           for x in r.phrase_suggest_df("mrge segent", field="content").collect()]
    assert dfg == [(o["text"], o["score"]) for o in got]
    # title field has no such vocabulary
    assert r.phrase_suggest("mrge segent", field="title") == []
    with pytest.raises(ValueError, match="pass field="):
        r.phrase_suggest("mrge segent")
