"""Code-aware tokenizer — the analyzer chain of the engine.

The reference delegates analysis to Elasticsearch's analyzer configured via
`type_mapping` (reference StandardSink.java:360-368); our engine implements
the analyzer natively. Spec (applies identically in the vectorized pandas
path used by Spark and the pure-Python oracle used by tests):

  1. Insert a break at camelCase humps:  ``getValue`` -> ``get Value``,
     ``HTTPServer`` -> ``HTTP Server`` (acronym boundary).
  2. Lowercase.
  3. Tokens are maximal runs of ``[a-z0-9]`` — underscores, punctuation and
     whitespace all split (so ``snake_case`` -> ``snake case``).

No stemming, no stopwords: BM25 scoring must be rank-identical between the
Spark engine and the oracle, so the token stream is the entire contract.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CAMEL = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
_TOKEN = re.compile(r"[a-z0-9]+")

# SQL-oracle equivalent for ALREADY-LOWERCASE text (e.g. the testdata
# `documents.text` column): camel splitting is a no-op there, so DuckDB can
# reproduce the token stream with a plain regex split.
DUCKDB_TOKENIZE_SQL = "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), t -> t <> '')"


# Language-aware filtering (the "lang-aware" leg of the analyzer chain):
# per-language keyword stop-sets — code keywords carry almost no BM25
# signal (near-ubiquitous within a language, so idf ~ 0) but inflate
# posting volume. Opt-in, recorded in the index manifest; the same sets
# apply in the Python oracle so rank-identity is preserved.
LANG_STOPTOKENS: dict[str, frozenset] = {
    "py": frozenset(
        "def return self import from class if else elif for while in not "
        "and or is none true false with as pass lambda try except raise".split()
    ),
    "go": frozenset(
        "func var const type struct interface package import return if "
        "else for range go defer chan map nil true false switch case".split()
    ),
    "java": frozenset(
        "public private protected static final void class interface extends "
        "implements return if else for while new this null true false "
        "import package try catch throw throws".split()
    ),
    "js": frozenset(
        "function var let const return if else for while new this null "
        "undefined true false import export class extends async await".split()
    ),
    "rs": frozenset(
        "fn let mut pub struct enum impl trait use mod return if else for "
        "while loop match self none some true false".split()
    ),
}


def tokenize_py(text: str, lang: str | None = None, lang_filter: bool = False) -> list[str]:
    """Pure-Python reference tokenizer (the oracle side)."""
    if text is None:
        return []
    toks = _TOKEN.findall(_CAMEL.sub(" ", text).lower())
    if lang_filter:
        stop = LANG_STOPTOKENS.get(lang or "", frozenset())
        if stop:
            toks = [t for t in toks if t not in stop]
    return toks


def tokenize_pandas(
    s: pd.Series, langs: pd.Series | None = None, lang_filter: bool = False
) -> pd.Series:
    """Vectorized pandas implementation — same output as tokenize_py.
    With lang_filter, each row's tokens are filtered by its language's
    stop-set (unknown languages pass through unfiltered)."""
    toks = (
        s.fillna("")
        .str.replace(_CAMEL, " ", regex=True)
        .str.lower()
        .str.findall(_TOKEN)
    )
    if lang_filter and langs is not None:
        stops = langs.map(lambda la: LANG_STOPTOKENS.get(la or "", frozenset()))
        toks = pd.Series(
            [
                [t for t in ts if t not in st] if st else ts
                for ts, st in zip(toks, stops)
            ],
            index=toks.index,
        )
    return toks


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_udf(s: pd.Series) -> pd.Series:
    return tokenize_pandas(s)


def tokens_col(c):
    """Pure-Catalyst (whole-stage-codegen) twin of ``tokenize_py``: a
    Column expression producing the SAME token array as the pandas/Python
    paths, for surfaces that tokenize STORED text at query time without
    ever leaving the JVM (the percolate query's stored-query field). Java
    regex supports the camel lookarounds verbatim, so the chain is
    regexp_replace(camel) -> lower -> split(non-alnum) -> drop empties —
    no UDF, no Arrow hop. Parity with tokenize_py is pinned by a
    property test (test_percolate_dsl.py); the ASCII token classes make
    the two regex engines agree on any input."""
    if isinstance(c, str):
        c = F.col(c)
    return F.filter(
        F.split(
            F.lower(F.regexp_replace(c.cast("string"), _CAMEL.pattern, " ")),
            "[^a-z0-9]+",
        ),
        lambda t: t != "",
    )


def tokenize_spans_py(text: str) -> list[tuple[str, int, int]]:
    """Span-aware tokenizer: [(token, start, end)] with start/end in
    ORIGINAL text coordinates (token = lowercase(text[start:end]) after
    camel splitting — a camel hump splits one source word into several
    tokens whose spans tile it). The highlight path needs original-text
    offsets to wrap matched tokens in tags without disturbing the
    surrounding source.

    Camel boundaries are zero-width in the source; `_CAMEL.sub(' ')`
    inserts exactly one char per boundary, so transformed position t maps
    back to t - (#inserted spaces at positions < t)."""
    if not text:
        return []
    import bisect

    # inserted-space positions in TRANSFORMED coordinates: the k-th
    # boundary (original pos b_k) lands at b_k + k after k prior inserts
    inserts = [m.start() + k for k, m in enumerate(_CAMEL.finditer(text))]
    transformed = _CAMEL.sub(" ", text).lower()
    out = []
    for m in _TOKEN.finditer(transformed):
        shift_s = bisect.bisect_left(inserts, m.start())
        shift_e = bisect.bisect_left(inserts, m.end())
        out.append((m.group(), m.start() - shift_s, m.end() - shift_e))
    return out


def analyze_py(
    text: str, lang: str | None = None, lang_filter: bool = False
) -> list[dict]:
    """ES _analyze analogue: run the full analyzer chain (camel/snake
    split -> lowercase -> [a-z0-9]+ tokenize -> optional per-language
    keyword filter) and return [{token, start_offset, end_offset,
    position}] — offsets in ORIGINAL text coordinates (tokenize_spans_py),
    position = the ordinal the positional index records (the
    post-filter sequence, matching dl and phrase positions exactly)."""
    stop = (
        LANG_STOPTOKENS.get(lang or "", frozenset()) if lang_filter else frozenset()
    )
    out: list[dict] = []
    pos = 0
    for tok, s, e in tokenize_spans_py(text):
        if tok in stop:
            continue
        out.append(
            {"token": tok, "start_offset": s, "end_offset": e, "position": pos}
        )
        pos += 1
    return out
