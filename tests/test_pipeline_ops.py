"""Pretraining-pipeline quality/decontamination operators: Gopher-style
duplicate-n-gram fractions (pure JVM array ops) and benchmark n-gram
contamination (broadcast shingle join). Oracle-checked in the registry
(pipeline_repetition / pipeline_contamination); here brute-force parity
and edge cases.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions import text as X
from elasticsearch_jdbc_spark.operators.dedup import ngram_contamination

DOCS = [
    (0, "the cat sat on the mat the cat sat again"),
    (1, "one two three four five six"),
    (2, "repeat repeat repeat repeat repeat"),
    (3, "short"),
    (4, ""),
    (5, "alpha beta gamma alpha beta gamma alpha beta"),
]


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _dup_frac(s, n):
    toks = _toks(s)
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return 0.0
    return 1.0 - len(set(grams)) / len(grams)


def test_dup_ngram_fraction_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    rows = df.select(
        "id",
        X.dup_ngram_fraction("text", 2).alias("d2"),
        X.dup_ngram_fraction("text", 3).alias("d3"),
    ).collect()
    for row in rows:
        s = DOCS[row["id"]][1]
        assert abs(row["d2"] - _dup_frac(s, 2)) < 1e-12, (row["id"], 2)
        assert abs(row["d3"] - _dup_frac(s, 3)) < 1e-12, (row["id"], 3)
    # doc 2 is maximally repetitive at n=1..2; doc 1 has no repeats
    by = {row["id"]: row for row in rows}
    assert by[2]["d2"] == 0.75  # 4 bigrams, 1 distinct
    assert by[1]["d2"] == 0.0 and by[1]["d3"] == 0.0
    assert by[3]["d2"] == 0.0 and by[4]["d2"] == 0.0  # too short / empty


def test_ngram_contamination_bruteforce(spark):
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta unique words here"),
            (11, "nothing in common with anything at all"),
            (12, "alpha beta gamma appears twice alpha beta gamma yes"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "the eval question mentions alpha beta gamma delta")],
        "doc_id long, text string",
    )
    got = {
        (row["doc_id"], row["bench_doc_id"]): row["overlap"]
        for row in ngram_contamination(corpus, bench, n=3).collect()
    }
    # doc 10 shares 'alpha beta gamma' and 'beta gamma delta'; doc 12
    # shares 'alpha beta gamma' (distinct shingles per doc -> counts once)
    assert got == {(10, 0): 2, (12, 0): 1}
    # min_overlap filters
    got2 = ngram_contamination(corpus, bench, n=3, min_overlap=2).collect()
    assert [(row["doc_id"], row["overlap"]) for row in got2] == [(10, 2)]
    # empty benchmark -> empty result, not an error
    assert (
        ngram_contamination(
            corpus, bench.filter("doc_id < 0"), n=3
        ).count()
        == 0
    )


def test_pii_scrub_and_counts(spark):
    from elasticsearch_jdbc_spark.functions.text import pii_counts, scrub_pii

    samples = [
        (0, "contact jane.doe+x@ex-ample.co.uk or 10.0.255.3 now"),
        (1, "call +1 415 555 0199 or 415-555-0101, server 192.168.1.1"),
        (2, "no pii here"),
        (3, None),
    ]
    df = spark.createDataFrame(samples, "id long, t string")
    rows = {
        r["id"]: r
        for r in df.select(
            "id", scrub_pii("t").alias("s"), *pii_counts("t")
        ).collect()
    }
    assert rows[0]["s"] == "contact <EMAIL> or <IP> now"
    assert (rows[0]["email"], rows[0]["ip"], rows[0]["phone"]) == (1, 1, 0)
    assert rows[1]["s"] == "call <PHONE> or <PHONE>, server <IP>"
    assert (rows[1]["email"], rows[1]["ip"], rows[1]["phone"]) == (0, 1, 2)
    assert rows[2]["s"] == "no pii here"
    assert rows[3]["s"] is None
    # idempotent: scrubbing scrubbed text changes nothing, counts drop to 0
    twice = df.select(
        "id",
        scrub_pii(scrub_pii("t")).alias("s2"),
        *[
            c.alias(f"c_{i}")
            for i, c in enumerate(pii_counts(scrub_pii("t")))
        ],
    ).collect()
    for r in twice:
        assert r["s2"] == rows[r["id"]]["s"]
        assert (r["c_0"] or 0) + (r["c_1"] or 0) + (r["c_2"] or 0) == 0


# ---------------------------------------------------------------------
# paragraph_dedup (CCNet/RefinedWeb boilerplate-removal pass)
# ---------------------------------------------------------------------

def _para_brute(docs: dict, max_docs: int) -> dict:
    """Brute-force model: line -> set of docs containing its normalized
    form; rebuild each doc dropping hot lines."""
    from collections import defaultdict

    seen = defaultdict(set)
    for did, text in docs.items():
        for ln in text.split("\n"):
            k = ln.strip().lower()
            if k:
                seen[k].add(did)
    hot = {k for k, s in seen.items() if len(s) > max_docs}
    out = {}
    for did, text in docs.items():
        lines = text.split("\n")
        kept = [
            ln
            for ln in lines
            if not ln.strip() or ln.strip().lower() not in hot
        ]
        out[did] = ("\n".join(kept), len(lines), len(kept))
    return out


def test_paragraph_dedup_bruteforce(spark):
    from elasticsearch_jdbc_spark.operators.dedup import paragraph_dedup

    boiler = "Subscribe to our newsletter"
    docs = {
        0: f"alpha unique one\n{boiler}\nbeta unique two",
        1: f"{boiler.upper()}\ngamma text",          # case variant collapses
        2: f"  {boiler}  \ndelta text\n\nepsilon",    # trim variant + empty line
        3: "zeta only here\n\n  \ntail line",         # whitespace lines survive
        4: boiler,                                     # doc entirely boilerplate
        5: "shared rare\nzz last",
        6: "shared rare\nyy other",                    # rare pair: <= max_docs
    }
    sdf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"], r["n_removed"])
        for r in paragraph_dedup(sdf, max_docs=2).collect()
    }
    want = _para_brute(docs, max_docs=2)
    assert set(got) == set(want)
    for did, (text, n_lines, n_kept) in want.items():
        assert got[did][0] == text, did
        assert got[did][1] == n_lines
        assert got[did][2] == n_kept
        assert got[did][3] == n_lines - n_kept
    # the boilerplate (4 docs > 2) is gone everywhere, incl. variants
    assert "newsletter" not in " ".join(g[0].lower() for g in got.values())
    # the rare pair (2 docs <= 2) survives
    assert "shared rare" in got[5][0] and "shared rare" in got[6][0]
    # doc 4 fully scrubbed
    assert got[4] == ("", 1, 0, 1)


def test_paragraph_dedup_threshold_one(spark):
    from elasticsearch_jdbc_spark.operators.dedup import paragraph_dedup

    docs = {0: "a\nb", 1: "b\nc", 2: "c\na"}
    sdf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(sdf, max_docs=1).collect()
    }
    # every line appears in exactly 2 docs > 1 -> everything removed
    assert got == {0: "", 1: "", 2: ""}


# ---------------------------------------------------------------------
# URL canonicalization + URL-level dedup
# ---------------------------------------------------------------------

def test_canonicalize_url_goldens(spark):
    from elasticsearch_jdbc_spark.functions.url import canonicalize_url

    cases = [
        # scheme/host case, www, default port, trailing slash, utm, fragment
        ("http://WWW.Example.com:80/a/?utm_source=x&b=1#top",
         "http://example.com/a?b=1"),
        ("HTTPS://Example.COM:443/a/b/", "https://example.com/a/b"),
        # tracking params dropped, survivors sorted, bare host -> "/"
        ("https://example.com/?z=2&a=1&gclid=xyz&fbclid=1&ref=tw",
         "https://example.com/?a=1&z=2"),
        ("https://example.com?a=1&z=2", "https://example.com/?a=1&z=2"),
        ("  https://example.com  ", "https://example.com/"),
        # non-default port kept; non-http schemes keep their port
        ("ftp://Host.Com:21/file", "ftp://host.com:21/file"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        # no scheme -> trimmed passthrough
        (" not a url ", "not a url"),
        # percent-encoding preserved verbatim (no decode pass)
        ("https://example.com/search?q=a%20b&utm_campaign=c",
         "https://example.com/search?q=a%20b"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "id long, url string"
    )
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonicalize_url("url").alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0])
    # idempotent: canonical form is its own fixed point
    df2 = spark.createDataFrame(
        [(i, c) for i, c in got.items()], "id long, url string"
    )
    got2 = {
        r["id"]: r["c"]
        for r in df2.select("id", canonicalize_url("url").alias("c")).collect()
    }
    assert got2 == got


def test_url_dedup_groups(spark):
    from elasticsearch_jdbc_spark.functions.url import url_dedup

    df = spark.createDataFrame(
        [
            (3, "http://WWW.a.com:80/x/?utm_source=s"),
            (1, "http://a.com/x"),
            (2, "http://a.com/x#frag"),
            (9, "https://b.com/y?p=1&q=2"),
            (8, "https://b.com/y?q=2&p=1"),
            (7, "https://c.com/z"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["canon_url"]: (r["keep_id"], r["n_copies"])
        for r in url_dedup(df).collect()
    }
    assert got == {
        "http://a.com/x": (1, 3),
        "https://b.com/y?p=1&q=2": (8, 2),
        "https://c.com/z": (7, 1),
    }


def _brute_spans(texts: dict[int, str], k: int, min_count: int = 2):
    """Reference implementation: mark every position covered by a k-gram
    occurring >= min_count times corpus-wide, union intervals per doc."""
    toks = {i: [t for t in re.split(r"\s+", s.lower()) if t] for i, s in texts.items()}
    from collections import Counter

    counts = Counter(
        " ".join(ts[p : p + k])
        for ts in toks.values()
        for p in range(len(ts) - k + 1)
    )
    spans = {}
    for i, ts in toks.items():
        ivs = [
            (p, p + k)
            for p in range(len(ts) - k + 1)
            if counts[" ".join(ts[p : p + k])] >= min_count
        ]
        merged = []
        for lo, hi in ivs:
            if merged and lo <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        for lo, hi in merged:
            spans[(i, lo)] = (hi, " ".join(toks[i][lo:hi]))
    return spans


def test_exact_substring_spans_bruteforce(spark):
    from elasticsearch_jdbc_spark.operators.dedup import exact_substring_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    texts = {
        0: f"intro words here {shared} tail zero unique",
        1: f"other opening {shared} closing one follows now",
        # within-doc repetition also counts as duplication
        2: "x1 x2 x3 x4 x5 pad x1 x2 x3 x4 x5 end",
        3: "totally unrelated content with no duplicated grams at all kept",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["span_text"])
        for r in exact_substring_spans(df, min_len=5, min_count=2).collect()
    }
    assert got == _brute_spans(texts, k=5)
    # doc 3 has no duplicated 5-gram
    assert not any(i == 3 for i, _ in got)
    # doc 2's self-repeat is caught
    assert any(i == 2 for i, _ in got)


def test_exact_substring_scrub(spark):
    from elasticsearch_jdbc_spark.operators.dedup import (
        exact_substring_scrub,
        exact_substring_spans,
    )

    shared = "one two three four five six"
    texts = {
        0: f"head {shared} tail0",
        1: f"start0 {shared} end0 extra",
        2: "clean document nothing shared here at all",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in exact_substring_scrub(df, min_len=6, min_count=2).collect()
    }
    assert out[0] == ("head tail0", 8, 6)
    assert out[1] == ("start0 end0 extra", 9, 6)
    assert out[2] == ("clean document nothing shared here at all", 7, 0)
    # scrub removes exactly the span mass reported by spans
    spans = exact_substring_spans(df, min_len=6, min_count=2).collect()
    per_doc = {}
    for r in spans:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["span_tokens"]
    for i, (_t, _n, removed) in out.items():
        assert removed == per_doc.get(i, 0)


def test_normalize_text_col(spark):
    """Unicode normalization kernel: NFC composes combining marks, NFKC
    additionally folds compatibility forms; idempotent; NULL passthrough;
    NFC output matches DuckDB's nfc_normalize (the oracle contract)."""
    import duckdb
    import pytest as _pytest
    from pyspark.sql import functions as F

    from elasticsearch_jdbc_spark.functions.text import normalize_text_col

    rows = [
        ("éclair",),        # combining acute -> precomposed
        ("① ﬁle ａ",),  # circled 1, fi ligature, fullwidth a
        ("plain ascii",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "t string")
    nfc = [r["n"] for r in df.select(normalize_text_col("t").alias("n")).collect()]
    assert nfc[0] == "éclair"
    assert nfc[1] == "① ﬁle ａ"  # NFC keeps compatibility forms
    assert nfc[2] == "plain ascii" and nfc[3] is None
    nfkc = [
        r["n"]
        for r in df.select(normalize_text_col("t", "NFKC").alias("n")).collect()
    ]
    assert nfkc[1] == "1 file a"
    # idempotent fixed point
    twice = [
        r["n"]
        for r in df.select(
            normalize_text_col(normalize_text_col("t"), "NFC").alias("n")
        ).collect()
    ]
    assert twice == nfc
    # DuckDB parity on the NFC contract
    for raw, got in zip([r[0] for r in rows], nfc):
        if raw is None:
            continue
        want = duckdb.sql("select nfc_normalize(?)", params=[raw]).fetchone()[0]
        assert got == want
    with _pytest.raises(ValueError, match="normalization form"):
        normalize_text_col("t", "NFX")
