"""Property-based tests (hypothesis) for the newest kernels: chunking
invariants, completion prefix-range algebra, temperature-resample
determinism/subset laws, pipeline-agg algebraic identities. Pure-Python
properties run example counts; Spark checks run on a handful of drawn
cases (JVM round-trips are slow)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from elasticsearch_jdbc_spark.index.completion import _prefix_bounds
from elasticsearch_jdbc_spark.operators.sampling import _threshold

words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=5), min_size=0, max_size=40
)


@given(words, st.integers(1, 8), st.integers(0, 7))
@settings(max_examples=200, deadline=None)
def test_chunk_window_math(toks, max_tokens, overlap):
    """The pure window math behind chunk_documents: coverage, overlap,
    and count invariants for any token stream."""
    if overlap >= max_tokens:
        return
    stride = max_tokens - overlap
    starts = list(range(0, max(len(toks), 0), stride)) if toks else []
    chunks = [toks[s: s + max_tokens] for s in starts]
    # every token covered, no empty chunk, sizes bounded
    assert all(chunks) or not toks
    covered = set()
    for s, c in zip(starts, chunks):
        assert len(c) <= max_tokens
        covered.update(range(s, s + len(c)))
    assert covered == set(range(len(toks)))
    # consecutive chunks overlap by exactly `overlap` (except a short tail)
    for (s1, c1), (s2, c2) in zip(
        list(zip(starts, chunks)), list(zip(starts, chunks))[1:]
    ):
        assert s2 - s1 == stride
        expected = max(0, min(s1 + len(c1), s2 + len(c2)) - s2)
        assert expected == min(overlap, len(c2)) or s2 + len(c2) >= len(toks)


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FFF), min_size=1, max_size=12))
@settings(max_examples=300, deadline=None)
def test_prefix_bounds_cover_exactly_the_prefix_set(prefix):
    """[lo, hi) from _prefix_bounds contains a string iff it starts with
    the prefix (for strings over the same alphabet region)."""
    lo, hi = _prefix_bounds(prefix)
    assert lo == prefix
    # members
    for suffix in ("", "a", "￿", "zzz"):
        s = prefix + suffix
        assert lo <= s < hi
    # non-members: anything not starting with prefix is outside
    if len(prefix) >= 1:
        before = prefix[:-1] + chr(ord(prefix[-1]) - 1) if ord(prefix[-1]) > 33 else None
        if before is not None:
            assert not (lo <= before + "zzzz" < hi) or (before + "zzzz").startswith(prefix)


@given(
    st.lists(st.integers(0, 10**6), min_size=1, max_size=50, unique=True),
    st.floats(0.05, 1.0),
    st.text(alphabet="xyz", max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_threshold_monotone_and_bucket_deterministic(keys, frac, salt):
    """Threshold strings order like their fractions; bucket assignment is
    a pure function of (salt, key); smaller fractions select subsets."""
    import hashlib

    t1 = _threshold(frac)
    t2 = _threshold(min(1.0, frac + 0.1))
    assert t1 <= t2 or t2 == "g"

    def bucket(k):
        enc = f"v{k}"
        return hashlib.sha256(f"{salt}\x1f{enc}".encode()).hexdigest()[:12]

    sel_small = {k for k in keys if bucket(k) < _threshold(frac * 0.5)}
    sel_big = {k for k in keys if bucket(k) < t1}
    assert sel_small <= sel_big  # nested membership: smaller frac ⊂ bigger


@given(st.lists(st.integers(-100, 100), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_pipeline_agg_identities(vals):
    """cumulative_sum telescopes derivative; serial_diff(1) == derivative
    — the pure algebra pipeline_aggs implements."""
    csum = [sum(vals[: i + 1]) for i in range(len(vals))]
    deriv = [None] + [float(b - a) for a, b in zip(vals, vals[1:])]
    # telescoping: csum differences reproduce the values
    assert [csum[0]] + [csum[i] - csum[i - 1] for i in range(1, len(vals))] == vals
    sd1 = [None] + [float(b - a) for a, b in zip(vals, vals[1:])]
    assert sd1 == deriv


@given(st.integers(-20, 40), st.integers(0, 30))
@settings(max_examples=300, deadline=None)
def test_msm_integer_and_negative(m, total):
    """_parse_msm: integers pass through; negatives subtract from the
    total; never below zero; string spellings agree with ints."""
    from elasticsearch_jdbc_spark.index.dsl import _parse_msm

    v = _parse_msm(m, total)
    assert v == max(0, m if m >= 0 else total + m)
    assert _parse_msm(str(m), total) == v


@given(st.floats(0.0, 100.0, allow_nan=False), st.integers(0, 50))
@settings(max_examples=300, deadline=None)
def test_msm_percentage_bounds_and_duality(pct, total):
    """"N%" floors to at most total; "-N%" is its documented dual:
    total - floor(N% of total) — the ES rounding asymmetry — and both
    are monotone in the percentage."""
    from elasticsearch_jdbc_spark.index.dsl import _parse_msm

    pos = _parse_msm(f"{pct}%", total)
    neg = _parse_msm(f"-{pct}%", total)
    assert 0 <= pos <= total
    assert neg == total - int(pct / 100.0 * total)
    assert pos == int(pct / 100.0 * total)
    if pct <= 90.0:
        assert _parse_msm(f"{pct + 10.0}%", total) >= pos


@given(st.integers(0, 12), st.integers(1, 10), st.integers(1, 99))
@settings(max_examples=300, deadline=None)
def test_msm_combination_picks_largest_below(total, n1, pctn):
    """"n<spec" combos: the spec with the LARGEST n below total applies;
    total <= every n requires ALL clauses."""
    from elasticsearch_jdbc_spark.index.dsl import _parse_msm

    n2 = n1 + 3
    combo = f"{n1}<2 {n2}<{pctn}%"
    got = _parse_msm(combo, total)
    if total <= n1:
        assert got == total
    elif total <= n2:
        assert got == 2
    else:
        assert got == int(pctn / 100.0 * total)


@given(st.lists(st.sampled_from(
    list("abc") + ["+", "-", "~1", ":", "x*", "?", "||", "!", "&&",
                   "AND", "OR", "NOT", '"a b"', "f:v", "+a", "-b"]),
    max_size=15).map(" ".join))
@settings(max_examples=400, deadline=None)
def test_query_string_parser_total(q):
    """parse_query_string is TOTAL on arbitrary search-box input (the
    never-crash contract): every clause has a valid occur/kind shape and
    uppercase connectives never leak through as clauses."""
    from elasticsearch_jdbc_spark.index.query import parse_query_string

    out = parse_query_string(q)
    for occur, kind, val in out:
        assert occur in ("must", "should", "must_not")
        assert kind in ("term", "phrase", "wildcard", "fuzzy", "fielded")
        assert val not in ("AND", "OR", "NOT", "&&", "||", "!")
    # default_operator=and parses the same clause kinds
    out2 = parse_query_string(q, default_operator="and")
    assert [(k, v) for _, k, v in out2] == [(k, v) for _, k, v in out]
