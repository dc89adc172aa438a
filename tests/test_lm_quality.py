"""In-corpus bigram-LM quality scoring (CCNet-style perplexity signal):
brute-force parity with the pinned LM contract, and the ranking property
the filter exists for (typical text < unusual text)."""

from __future__ import annotations

import math

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.operators.lm_quality import lm_scores

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox sleeps"),
    (2, "the lazy dog jumps"),
    (3, "zxqv wmbl kjhg zxqv"),  # gibberish: rare unigrams, unseen bigrams
    (4, "the"),                   # single token: unigram floor only
    (5, ""),                      # empty: excluded
]


def _brute(alpha=0.5, backoff=0.4):
    toks = {i: tokenize_py(t) for i, t in DOCS}
    cf, c2 = {}, {}
    n = 0
    for ts in toks.values():
        n += len(ts)
        for w in ts:
            cf[w] = cf.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(cf)

    def p_uni(w):
        return (cf[w] + alpha) / (n + alpha * v)

    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        lp = math.log(p_uni(ts[0]))
        for a, b in zip(ts, ts[1:]):
            pair = c2.get((a, b), 0)
            lp += (math.log(pair / cf[a]) if pair > 0
                   else math.log(backoff * p_uni(b)))
        out[i] = (len(ts), round(-lp / len(ts), 4))
    return out


def test_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"])
        for r in lm_scores(df).collect()
    }
    assert got == _brute()
    assert 5 not in got  # empty doc excluded


def test_gibberish_scores_higher(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_nll"] for r in lm_scores(df).collect()}
    # the corpus-typical doc is far more likely than the gibberish doc
    assert got[0] < got[3]
    assert got[1] < got[3]
