"""Phrase query tests: positional postings roundtrip + match_phrase
semantics (adjacent-position intersection, Lucene PhraseQuery scoring)
against a pure-Python model."""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

DOCS = [
    ("r", "a.py", "c0", "py", "alpha beta gamma delta"),
    ("r", "b.py", "c0", "py", "beta alpha gamma beta alpha"),      # no 'alpha beta'
    ("r", "c.py", "c0", "py", "alpha beta alpha beta zeta"),       # phrase twice
    ("r", "d.py", "c0", "py", "gamma delta epsilon"),
    ("r", "e.py", "c0", "py", "go go gadget go go"),               # duplicate-term phrase
    ("r", "f.py", "c0", "py", "alpha zeta beta"),                  # both words, not adjacent
]


@pytest.fixture(scope="module")
def pos_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("ph") / "idx")
    df = spark.createDataFrame(
        DOCS, "repo string, path string, commit string, lang string, content string"
    )
    b = IndexBuilder(spark, idx, partitions=2, block_size=4, with_positions=True)
    b.reset()
    b.build(df, resume=False)
    reader = IndexReader(spark, idx)
    docs = spark.read.parquet(f"{idx}/docs").collect()
    key2id = {r["path"]: r["doc_id"] for r in docs}
    return reader, key2id


def _model_phrase_freq(content: str, phrase: str) -> int:
    toks = tokenize_py(content)
    p = tokenize_py(phrase)
    return sum(
        1
        for i in range(len(toks) - len(p) + 1)
        if toks[i : i + len(p)] == p
    )


def test_phrase_matches_only_adjacent(pos_idx):
    reader, key2id = pos_idx
    hits = dict(reader.search_phrase("alpha beta", k=10))
    assert key2id["a.py"] in hits
    assert key2id["c.py"] in hits
    assert key2id["b.py"] not in hits  # words present, wrong order
    assert key2id["f.py"] not in hits  # words present, not adjacent


def test_phrase_freq_scoring(pos_idx):
    reader, key2id = pos_idx
    hits = dict(reader.search_phrase("alpha beta", k=10))
    # c.py has the phrase twice -> higher tf -> higher score than a.py
    # (same dl=5 vs 4 — check the model agrees on ordering)
    freqs = {p: _model_phrase_freq(c, "alpha beta") for _, p, _, _, c in
             [(d[0], d[1], d[2], d[3], d[4]) for d in DOCS]}
    assert freqs["c.py"] == 2 and freqs["a.py"] == 1
    assert hits[key2id["c.py"]] > hits[key2id["a.py"]]


def test_phrase_with_duplicate_terms(pos_idx):
    reader, key2id = pos_idx
    hits = dict(reader.search_phrase("go go", k=10))
    assert set(hits) == {key2id["e.py"]}
    assert _model_phrase_freq("go go gadget go go", "go go") == 2


def test_three_term_phrase(pos_idx):
    reader, key2id = pos_idx
    hits = dict(reader.search_phrase("alpha beta gamma", k=10))
    assert set(hits) == {key2id["a.py"]}


def test_phrase_absent(pos_idx):
    reader, _ = pos_idx
    assert reader.search_phrase("epsilon alpha", k=10) == []
    assert reader.search_phrase("nosuchterm here", k=10) == []


def test_regular_search_unaffected_by_positions(pos_idx):
    reader, key2id = pos_idx
    assert reader.search("alpha", k=10) == reader.search_brute("alpha", k=10)


def test_positions_roundtrip(pos_idx):
    """Decoded positions equal the token positions recomputed from text."""
    reader, key2id = pos_idx
    blocks = reader._collect_blocks(["alpha"], positions=True)["alpha"]
    from elasticsearch_jdbc_spark.index.codec import (
        decode_positions,
        decode_term_blocks,
    )

    first_docs = np.array([b[2] for b in blocks], np.int64)
    ns = np.array([b[1] for b in blocks], np.int64)
    docs, tf, _dl = decode_term_blocks(
        first_docs, ns,
        b"".join(b[3] for b in blocks),
        b"".join(b[4] for b in blocks),
        b"".join(b[5] for b in blocks),
    )
    pos = decode_positions(tf, b"".join(b[7] for b in blocks))
    id2path = {v: k for k, v in key2id.items()}
    content = {p: c for _, p, _, _, c in DOCS}
    off = 0
    for d, t in zip(docs.tolist(), tf.tolist()):
        toks = tokenize_py(content[id2path[d]])
        expect = [i for i, tok in enumerate(toks) if tok == "alpha"]
        assert pos[off : off + t].tolist() == expect
        off += t


def test_phrase_requires_positions(spark, tmp_path):
    df = spark.createDataFrame(
        DOCS[:2], "repo string, path string, commit string, lang string, content string"
    )
    idx = str(tmp_path / "nopos")
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError, match="positions"):
        r.search_phrase("alpha beta")


def test_distributed_phrase_equals_driver(pos_idx):
    reader, _ = pos_idx
    for q in ("alpha beta", "go go", "alpha beta gamma"):
        want = reader.search_phrase(q, k=10)
        got = [(r["doc_id"], r["score"]) for r in reader.search_phrase_df(q, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9
    assert reader.search_phrase_df("nosuchterm here", k=5).count() == 0


def _brute_sloppy_pf(token_lists, qterms, slop):
    """Reference model of the documented span criterion: anchor p in
    shifted S_0 counts iff some integer window [a, a+slop] contains p and
    one member of every shifted S_i."""
    out = {}
    for doc, toks in token_lists.items():
        shifted = []
        for i, t in enumerate(qterms):
            shifted.append([p - i for p, x in enumerate(toks) if x == t])
        if any(not s for s in shifted):
            continue
        pf = 0
        for p in shifted[0]:
            hit = False
            for a in range(p - slop, p + 1):
                if all(any(a <= c <= a + slop for c in s) for s in shifted[1:]):
                    hit = True
                    break
            if hit:
                pf += 1
        if pf:
            out[doc] = pf
    return out


def test_sloppy_phrase_vs_brute_model(spark, tmp_path):
    from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    DOCS = [
        ("r", "0", "c", "t", "alpha beta gap"),                 # exact adjacency
        ("r", "1", "c", "t", "alpha filler beta end"),          # 1 insert
        ("r", "2", "c", "t", "beta alpha swapped order"),       # reorder (needs slop>=2)
        ("r", "3", "c", "t", "alpha one two three beta far"),   # 3 inserts
        ("r", "4", "c", "t", "alpha only here"),                # missing term
        ("r", "5", "c", "t", "alpha beta alpha x beta twice"),  # multiple matches
    ]
    idx = str(tmp_path / "slop")
    df = spark.createDataFrame(
        DOCS, "repo string, path string, commit string, lang string, content string"
    )
    IndexBuilder(spark, idx, partitions=2, with_positions=True).build(df, resume=False)
    reader = IndexReader(spark, idx)
    id_of = {r["path"]: r["doc_id"] for r in spark.read.parquet(f"{idx}/docs").collect()}
    toks = {id_of[p]: tokenize_py(c) for _, p, _, _, c in DOCS}
    qterms = ["alpha", "beta"]
    for slop in (0, 1, 2, 3):
        want = _brute_sloppy_pf(toks, qterms, slop)
        got = {d: pf for d, pf, _ in reader._phrase_freqs(qterms, slop=slop)}
        assert got == want, slop
    # monotonic: larger slop never loses a match
    prev = set()
    for slop in (0, 1, 2, 3, 5):
        cur = {d for d, _ in reader.search_phrase("alpha beta", k=10, slop=slop)}
        assert prev <= cur, slop
        prev = cur
    # slop=0 equals the exact path; reorder doc appears only at slop>=2
    assert id_of["2"] not in {d for d, _ in reader.search_phrase("alpha beta", k=10, slop=1)}
    assert id_of["2"] in {d for d, _ in reader.search_phrase("alpha beta", k=10, slop=2)}


def _brute_sloppy_weighted(token_lists, qterms, slop):
    """Weighted model: each matching anchor counts 1/(d+1) with d the
    MINIMAL window width admitting it (Lucene sloppyFreq shape)."""
    out = {}
    for doc, toks in token_lists.items():
        shifted = []
        for i, t in enumerate(qterms):
            shifted.append([p - i for p, x in enumerate(toks) if x == t])
        if any(not s for s in shifted):
            continue
        pf = 0.0
        for p in shifted[0]:
            best = None
            for w in range(slop + 1):
                hit = any(
                    all(any(a <= c <= a + w for c in s) for s in shifted[1:])
                    for a in range(p - w, p + 1)
                )
                if hit:
                    best = w
                    break
            if best is not None:
                pf += 1.0 / (best + 1)
        if pf:
            out[doc] = pf
    return out


@pytest.fixture(scope="module")
def slop_idx(spark, tmp_path_factory):
    DOCS2 = [
        ("r", "0", "c", "t", "alpha beta gap"),
        ("r", "1", "c", "t", "alpha filler beta end"),
        ("r", "2", "c", "t", "beta alpha swapped order"),
        ("r", "3", "c", "t", "alpha one two three beta far"),
        ("r", "4", "c", "t", "alpha only here"),
        ("r", "5", "c", "t", "alpha beta alpha x beta twice"),
    ]
    idx = str(tmp_path_factory.mktemp("slopw") / "idx")
    df = spark.createDataFrame(
        DOCS2, "repo string, path string, commit string, lang string, content string"
    )
    IndexBuilder(spark, idx, partitions=2, with_positions=True).build(df, resume=False)
    reader = IndexReader(spark, idx)
    id_of = {r["path"]: r["doc_id"] for r in spark.read.parquet(f"{idx}/docs").collect()}
    toks = {id_of[p]: tokenize_py(c) for _, p, _, _, c in DOCS2}
    return reader, id_of, toks


def test_lucene_sloppy_weight_vs_brute_model(slop_idx):
    """Opt-in 1/(distance+1) weighting (Lucene SloppyPhraseScorer) against
    the weighted brute model; the default contract stays integral."""
    reader, id_of, toks = slop_idx
    qterms = ["alpha", "beta"]
    for slop in (1, 2, 3):
        want = _brute_sloppy_weighted(toks, qterms, slop)
        got = {
            d: pf
            for d, pf, _ in reader._phrase_freqs(qterms, slop=slop, lucene_weight=True)
        }
        assert {d: round(v, 9) for d, v in got.items()} == {
            d: round(v, 9) for d, v in want.items()
        }, slop
    # exact adjacency counts full weight; a distance-2 reorder counts 1/3
    got2 = {
        d: pf for d, pf, _ in reader._phrase_freqs(qterms, slop=2, lucene_weight=True)
    }
    assert got2[id_of["0"]] == 1.0
    assert abs(got2[id_of["2"]] - 1 / 3) < 1e-12
    # weighted mode never scores higher than count mode
    cnt = {d: pf for d, pf, _ in reader._phrase_freqs(qterms, slop=2)}
    assert all(got2[d] <= cnt[d] for d in got2)
    with pytest.raises(ValueError, match="weight_mode"):
        reader.search_phrase("alpha beta", slop=2, weight_mode="nope")


def test_distributed_slop_phrase_equals_driver(slop_idx):
    """search_phrase_df(slop=...) rank-identical to the driver path, both
    weight modes (VERDICT r02 #5: the distributed path was exact-only)."""
    reader, _, _ = slop_idx
    for slop in (0, 1, 2, 3):
        for mode in ("count", "lucene"):
            want = reader.search_phrase("alpha beta", k=10, slop=slop, weight_mode=mode)
            got = [
                (r["doc_id"], r["score"])
                for r in reader.search_phrase_df(
                    "alpha beta", k=10, slop=slop, weight_mode=mode
                ).collect()
            ]
            assert [d for d, _ in got] == [d for d, _ in want], (slop, mode)
            for (_, gs), (_, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-9


def test_match_phrase_prefix_vs_brute(spark, tmp_path):
    """match_phrase_prefix: the last token is a prefix; match iff the body
    phrase is followed by ANY token with that prefix — checked against a
    naive token-scan model."""
    DOCS3 = [
        ("r", "0", "c", "t", "quick brown foxes jumped"),
        ("r", "1", "c", "t", "quick brown fox"),
        ("r", "2", "c", "t", "quick brown dog"),
        ("r", "3", "c", "t", "brown quick foxtrot"),         # wrong order
        ("r", "4", "c", "t", "quick red brown foxhole"),     # body not adjacent
        ("r", "5", "c", "t", "foxglove quick brown force"),  # 'fo' prefix differs
    ]
    idx = str(tmp_path / "mpp")
    IndexBuilder(spark, idx, partitions=2, with_positions=True).build(
        spark.createDataFrame(
            DOCS3,
            "repo string, path string, commit string, lang string, content string",
        ),
        resume=False,
    )
    reader = IndexReader(spark, idx)
    id_of = {r["path"]: r["doc_id"] for r in spark.read.parquet(f"{idx}/docs").collect()}
    toks = {p: tokenize_py(c) for _, p, _, _, c in DOCS3}

    def brute(body, prefix):
        hits = set()
        for p, ts in toks.items():
            for i in range(len(ts) - len(body)):
                if ts[i:i + len(body)] == body and ts[i + len(body)].startswith(prefix):
                    hits.add(id_of[p])
        return hits

    got = {d for d, _ in reader.search_phrase_prefix("quick brown fox", k=10)}
    assert got == brute(["quick", "brown"], "fox") == {id_of["0"], id_of["1"]}
    # 'fo' also reaches 'force' (doc 5 'brown force' adjacent? body = quick
    # brown then fo* -> doc 5 has 'quick brown force': yes) and 'foxhole'
    # is non-adjacent in doc 4 -> excluded
    got_fo = {d for d, _ in reader.search_phrase_prefix("quick brown fo", k=10)}
    assert got_fo == brute(["quick", "brown"], "fo")
    assert id_of["5"] in got_fo and id_of["4"] not in got_fo
    # slop=2 lets doc 4's displaced body in ('quick red brown foxhole')
    got_slop = {d for d, _ in reader.search_phrase_prefix("quick brown fo", k=10, slop=2)}
    assert id_of["4"] in got_slop and got_fo <= got_slop
    # single-token: degrades to prefix matching with phrase scoring —
    # every doc containing any fox* token (foxes/fox/foxtrot/foxhole/
    # foxglove)
    one = {d for d, _ in reader.search_phrase_prefix("fox", k=10)}
    assert one == {id_of[p] for p in ("0", "1", "3", "4", "5")}
    # no expansions -> []
    assert reader.search_phrase_prefix("quick brown zzz", k=10) == []
    # max_expansions cap respected (limit=1 keeps only the first expansion
    # lexicographically: 'force')
    capped = {d for d, _ in reader.search_phrase_prefix("quick brown fo", k=10, limit=1)}
    assert capped == {id_of["5"]}
