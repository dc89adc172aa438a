"""Fuzzy (edit-distance-1) query tests: SymSpell deletion-table expansion
+ scoring_boolean rewrite, vs exhaustive Levenshtein over the vocabulary."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

DOCS = [
    ("r", "0", "c", "t", "merge buffer stream"),
    ("r", "1", "c", "t", "merg buffr streem"),       # 1-edit variants
    ("r", "2", "c", "t", "merged buffers"),          # 1-edit of merge? 'merged' ed=1
    ("r", "3", "c", "t", "completely different words"),
    ("r", "4", "c", "t", "emrge stream"),            # transposition: ed=2 under plain Lev
]


def _lev(a: str, b: str) -> int:
    import numpy as np

    d = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = d.copy()
        d[0] = i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return int(d[-1])


@pytest.fixture(scope="module")
def fz_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("fz") / "idx")
    df = spark.createDataFrame(
        DOCS, "repo string, path string, commit string, lang string, content string"
    )
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    return IndexReader(spark, idx)


def test_expand_fuzzy_matches_exhaustive(fz_idx, spark):
    import pyarrow.dataset as ds
    import os

    vocab = ds.dataset(
        os.path.join(fz_idx.index_dir, "terms"), format="parquet"
    ).to_table(columns=["term"]).column("term").to_pylist()
    for tok in ("merge", "buffer", "stream", "xyzzy", "merg"):
        got = set(fz_idx.expand_fuzzy(tok))
        want = {t for t in vocab if _lev(tok, t) <= 1}
        assert got == want, tok


def test_fuzzy_search_covers_variant_docs(fz_idx, spark):
    hits = {d for d, _ in fz_idx.search_fuzzy("merge buffer", k=10)}
    meta = fz_idx.lookup_docs(list(hits))
    paths = {meta[d]["path"] for d in hits}
    # doc "0" (exact), "1" (1-edit terms), "2" ('merged'/'buffers' ed=1)
    assert {"0", "1", "2"} <= paths
    assert "3" not in paths and "4" not in paths  # ed>1 stays out
    exact = {d for d, _ in fz_idx.search("merge buffer", k=10)}
    assert exact < hits  # fuzzy is a strict superset here


def test_fuzzy_exact_term_ranks_first_expansion(fz_idx):
    exp = fz_idx.expand_fuzzy("merge")
    assert exp[0] == "merge"


def test_fuzzy_no_match(fz_idx):
    assert fz_idx.search_fuzzy("qqqqqqqq", k=5) == []


def test_fuzzy_table_idempotent(fz_idx):
    import os

    fdir = os.path.join(fz_idx.index_dir, "fuzzy")
    before = sorted(os.listdir(fdir))
    fz_idx.enable_fuzzy()  # second call must not rebuild
    assert sorted(os.listdir(fdir)) == before


def test_expand_fuzzy_distance2_matches_exhaustive(fz_idx, spark):
    import os

    import pyarrow.dataset as ds

    vocab = ds.dataset(
        os.path.join(fz_idx.index_dir, "terms"), format="parquet"
    ).to_table(columns=["term"]).column("term").to_pylist()
    for tok in ("merge", "buffer", "stream", "emrge", "bufr", "xyzzy"):
        got = set(fz_idx.expand_fuzzy(tok, max_dist=2))
        want = {t for t in vocab if _lev(tok, t) <= 2}
        assert got == want, tok


def test_auto_fuzziness_policy(fz_idx):
    # ES AUTO:3,6 — <3 exact, 3..5 one edit, >=6 two edits
    assert fz_idx._auto_fuzziness("ab") == 0
    assert fz_idx._auto_fuzziness("abc") == 1
    assert fz_idx._auto_fuzziness("abcde") == 1
    assert fz_idx._auto_fuzziness("abcdef") == 2


def test_search_fuzzy_auto_finds_transposition(fz_idx):
    """'stream' (6 chars -> 2 edits under AUTO) matches doc 4's 'emrge
    stream'; and querying 'emrge'(5 chars -> 1 edit) alone must NOT match
    'merge' docs (transposition = 2 plain-Levenshtein edits)."""
    hits = {d for d, _ in fz_idx.search_fuzzy("stream", k=10, fuzziness="AUTO")}
    meta = fz_idx.lookup_docs(list(hits))
    assert "4" in {meta[d]["path"] for d in hits}
    one = {d for d, _ in fz_idx.search_fuzzy("emrge", k=10, fuzziness=1)}
    paths = {fz_idx.lookup_docs(list(one))[d]["path"] for d in one}
    assert "0" not in paths and "2" not in paths
    two = {d for d, _ in fz_idx.search_fuzzy("emrge", k=10, fuzziness=2)}
    paths2 = {fz_idx.lookup_docs(list(two))[d]["path"] for d in two}
    assert "0" in paths2  # distance 2 reaches 'merge'


def test_fuzzy_deeper_table_rebuild_is_idempotent(fz_idx):
    import os

    fz_idx.enable_fuzzy(2)
    assert fz_idx._fuzzy_depth() == 2
    fdir = os.path.join(fz_idx.index_dir, "fuzzy")
    before = sorted(os.listdir(fdir))
    fz_idx.enable_fuzzy(1)  # shallower request must not downgrade/rebuild
    assert sorted(os.listdir(fdir)) == before
    assert fz_idx._fuzzy_depth() == 2


def test_plain_surfaces_wand_rank_identical(fz_idx):
    """Forcing the WAND fallback (DENSE_LIMIT=0) must not change expanded-
    term results on a plain index either."""
    dense_fz = fz_idx.search_fuzzy("merge buffer", k=10)
    dense_pref = fz_idx.search_prefix("mer", k=10)
    fz_idx.DENSE_LIMIT = 0
    try:
        assert fz_idx.search_fuzzy("merge buffer", k=10) == dense_fz
        assert fz_idx.search_prefix("mer", k=10) == dense_pref
    finally:
        del fz_idx.DENSE_LIMIT


def test_fuzzy_depth_above_es_cap_raises(fz_idx):
    """ES caps fuzziness at 2; deeper tables would be combinatorial and the
    old code silently recorded a depth it never built (ADVICE r02)."""
    with pytest.raises(ValueError, match="caps at depth 2"):
        fz_idx.enable_fuzzy(3)
    with pytest.raises(ValueError, match="caps at depth 2"):
        fz_idx.expand_fuzzy("merge", max_dist=3)


def test_prefix_fuzzy_min_should_match_token_groups(fz_idx, spark):
    """mSM on expansion surfaces counts TOKENS (any expansion satisfies its
    token), not raw expanded terms."""
    # "merge stream" @ed1: docs 0/1 match both tokens, doc 2 only 'merge'
    # (via 'merged'), doc 4 only 'stream'
    loose = {d for d, _ in fz_idx.search_fuzzy("merge stream", k=10, fuzziness=1)}
    strict = {d for d, _ in fz_idx.search_fuzzy("merge stream", k=10, fuzziness=1,
                                                min_should_match=2)}
    assert strict < loose
    meta = fz_idx.lookup_docs(list(loose))
    assert {meta[d]["path"] for d in loose} == {"0", "1", "2", "4"}
    assert {meta[d]["path"] for d in strict} == {"0", "1"}
    p_loose = {d for d, _ in fz_idx.search_prefix("mer str", k=10)}
    p_strict = {d for d, _ in fz_idx.search_prefix("mer str", k=10,
                                                   min_should_match=2)}
    assert p_strict <= p_loose
    pmeta = fz_idx.lookup_docs(list(p_strict))
    # both prefixes must match: doc 0 (merge+stream) and 1 (merg+streem)
    assert {pmeta[d]["path"] for d in p_strict} == {"0", "1"}
    # scores are unchanged by the filter (mSM filters, never rescores)
    loose_scores = dict(fz_idx.search_fuzzy("merge stream", k=10, fuzziness=1))
    for d, s in fz_idx.search_fuzzy("merge stream", k=10, fuzziness=1,
                                    min_should_match=2):
        assert s == loose_scores[d]
