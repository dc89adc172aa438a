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


def tokenize_py(text: str) -> list[str]:
    """Pure-Python reference tokenizer (the oracle side)."""
    if text is None:
        return []
    return _TOKEN.findall(_CAMEL.sub(" ", text).lower())


def tokenize_pandas(s: pd.Series) -> pd.Series:
    """Vectorized pandas implementation — same output as tokenize_py."""
    return (
        s.fillna("")
        .str.replace(_CAMEL, " ", regex=True)
        .str.lower()
        .str.findall(_TOKEN)
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_udf(s: pd.Series) -> pd.Series:
    return tokenize_pandas(s)
