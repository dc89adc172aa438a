"""Text analysis functions for corpus pipelines: language ID, quality
scoring, token counting, fingerprinting. All built from JVM-side
pyspark.sql.functions (codegen) — the expressions are deliberately
SQL-expressible so DuckDB can oracle-check them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language -> characteristic stopwords (tiny, deterministic heuristic).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
]


def word_tokens(col: str | Column) -> Column:
    """Whitespace+punct word tokens, lowercase, empties dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9]+"), lambda t: t != ""
    )


def token_count(col: str | Column) -> Column:
    return F.size(word_tokens(col))


def distinct_token_count(col: str | Column) -> Column:
    return F.size(F.array_distinct(word_tokens(col)))


def stopword_ratio(col: str | Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    toks = word_tokens(col)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: str | Column) -> Column:
    """Heuristic doc quality in [0,1]: rewards moderate length, lexical
    diversity, and some stopword presence (prose-likeness)."""
    toks = word_tokens(col)
    n = F.size(toks)
    diversity = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    len_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.5))
    sw = stopword_ratio(col)
    prose = F.when((sw > 0.01) & (sw < 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((diversity + len_ok + prose) / 3.0, 6)


def lang_id(col: str | Column) -> Column:
    """Marker-stopword language vote; 'unknown' when no marker hits.
    A real pipeline plugs a model here — the Spark shape (scalar expr over
    tokens, no shuffle) is the contract."""
    toks = word_tokens(col)
    best_lang, best_score = None, None
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        m = F.array(*[F.lit(x) for x in markers])
        score_cols.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(m, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*score_cols))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def fingerprint64(col: str | Column) -> Column:
    """Order-insensitive 64-bit content fingerprint: XOR-fold of token
    hashes over distinct tokens — a cheap document sketch for joins/dedup
    prefilters. XOR (not sum) so the fold can never overflow under ANSI
    mode and stays commutative/associative."""
    toks = F.array_distinct(word_tokens(col))
    return F.aggregate(
        F.transform(toks, lambda t: F.xxhash64(t)),
        F.lit(0).cast("long"),
        lambda acc, h: acc.bitwiseXOR(h),
    )


def token_ngrams(toks: Column, n: int) -> Column:
    """All n-grams (space-joined, with duplicates) over a token-array
    Column. JVM-only: sequence -> slice -> concat_ws. The single shared
    gram kernel — word_ngrams (regex tokens) and the dedup/contamination
    shingle family (whitespace tokens) both build on it, so gram
    construction can never silently diverge between the two surfaces."""
    if n == 1:
        return toks
    k = F.size(toks) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: str | Column, n: int) -> Column:
    """All word n-grams (space-joined, with duplicates — repetition
    signals need the multiset). JVM-only: split -> sequence -> slice."""
    return token_ngrams(word_tokens(col), n)


def dup_ngram_fraction(col: str | Column, n: int) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier
    n-gram in the same doc: 1 - distinct/total (0 when the doc has no
    n-grams). The Gopher-style repetition quality signal — boilerplate,
    keyword stuffing, and generator loops all push it toward 1. Whole
    expression stays in the JVM (no UDF)."""
    grams = word_ngrams(col, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        1.0 - F.size(F.array_distinct(grams)) / total,
    ).otherwise(F.lit(0.0))


# PII redaction patterns, applied in this order (emails first — their
# local parts contain digits a later phone pass would otherwise nibble;
# IPs before phones — dotted quads never overlap dash/space digit runs).
# Deliberately Java-regex/RE2-compatible (no lookaround, no backrefs) so
# the DuckDB oracle runs the IDENTICAL patterns.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # bounded run: E.164 caps phones at 15 digits; an unbounded {7,}
    # would swallow entire numeric tables ("100 200 300 ...") as one
    # <PHONE>
    ("phone", r"\+?\d[\d -]{7,18}\d", "<PHONE>"),
]


def scrub_pii(col: str | Column) -> Column:
    """Redact emails / IPv4s / phone-like digit runs with typed tokens —
    the standard pre-training privacy pass. A chain of JVM
    regexp_replace expressions (whole-stage codegen, no UDF); idempotent
    (the replacement tokens match none of the patterns)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, tok in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tok)
    return c


def pii_counts(col: str | Column) -> list[Column]:
    """Per-kind PII match counts (aliased email/ip/phone), counted on the
    same progressively-scrubbed text scrub_pii sees — so a digit run
    inside an email is an email, never ALSO a phone, and the counts sum
    to exactly the redactions scrub_pii makes."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for name, pat, tok in PII_PATTERNS:
        out.append(F.regexp_count(c, F.lit(pat)).alias(name))
        c = F.regexp_replace(c, pat, tok)
    return out


# Gopher document-quality rules (Rae et al. 2021, "Scaling Language
# Models" §A1.1.1 — the canonical pretraining-corpus filter set). All
# signals are Catalyst expressions (no Python in the hot path) over
# whitespace words / raw lines, so the filter is one codegen'd
# projection + filter at any corpus size.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signals(col: str | Column) -> list[Column]:
    """The Gopher rule signals as named columns:
    n_words, mean_word_len (whitespace words, punctuation attached —
    the Gopher definition), symbol_word_ratio ('#' and '...' per word),
    bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
    stop_word_hits (distinct Gopher stopwords present)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    mean_wl = F.when(n_words > 0, sum_len / n_words)
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3
    sym_ratio = F.when(n_words > 0, (n_hash + n_ell) / n_words)
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.startswith(F.ltrim(l), F.lit("-"))
            | F.startswith(F.ltrim(l), F.lit("*"))
            | F.startswith(F.ltrim(l), F.lit("•")),
        )
    )
    ell_lines = F.size(
        F.filter(
            lines,
            lambda l: F.endswith(F.rtrim(l), F.lit("..."))
            | F.endswith(F.rtrim(l), F.lit("…")),
        )
    )
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    toks = word_tokens(c)
    stops = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return [
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet / n_lines, 6).alias("bullet_line_ratio"),
        F.round(ell_lines / n_lines, 6).alias("ellipsis_line_ratio"),
        F.round(F.when(n_words > 0, alpha / n_words), 6).alias(
            "alpha_word_ratio"
        ),
        stops.cast("long").alias("stop_word_hits"),
    ]


def gopher_keep(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_words: int = 2,
) -> Column:
    """The Gopher pass/fail verdict over gopher_signals columns (apply
    AFTER selecting them; thresholds default to the paper's). NULL
    signals (empty doc) fail closed."""
    return (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_ratio") <= max_bullet_ratio)
        & (F.col("ellipsis_line_ratio") <= max_ellipsis_ratio)
        & (F.col("alpha_word_ratio") >= min_alpha_ratio)
        & (F.col("stop_word_hits") >= min_stop_words)
    ).alias("keep")


def c4_clean_cols(
    col: str | Column,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    require_terminal_punct: bool = True,
    drop_line_substrings: tuple = ("javascript",),
    drop_doc_substrings: tuple = ("lorem ipsum", "{"),
) -> list[Column]:
    """The C4 cleaning pass (Raffel et al. 2020 §2.2) as named columns:
    keep lines that end in terminal punctuation (. ! ? ") AND have >=
    min_words_per_line whitespace words AND contain none of
    drop_line_substrings (case-insensitive, the 'Javascript' rule);
    drop the whole DOC when fewer than min_lines lines survive or the
    raw text contains any drop_doc_substrings ('lorem ipsum', '{').

    Returns [text (reassembled survivors), n_lines, n_kept, kept].
    Every rule is a higher-order Catalyst expression over the split
    array — ONE codegen'd projection, no explode, no shuffle, no
    Python; at 100 TB this is a map-only pass."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")

    def line_ok(l):  # noqa: E741
        w = F.size(F.filter(F.split(l, r"\s+"), lambda x: x != ""))
        ok = w >= int(min_words_per_line)
        if require_terminal_punct:
            r = F.rtrim(l)
            ok = ok & (
                F.endswith(r, F.lit("."))
                | F.endswith(r, F.lit("!"))
                | F.endswith(r, F.lit("?"))
                | F.endswith(r, F.lit('"'))
            )
        low = F.lower(l)
        for s in drop_line_substrings:
            ok = ok & ~low.contains(s.lower())
        return ok

    kept_lines = F.filter(lines, line_ok)
    n_kept = F.size(kept_lines)
    doc_ok = n_kept >= int(min_lines)
    low_doc = F.lower(c)
    for s in drop_doc_substrings:
        doc_ok = doc_ok & ~low_doc.contains(s.lower())
    return [
        F.when(doc_ok, F.array_join(kept_lines, "\n")).otherwise(F.lit("")).alias("text"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        F.coalesce(doc_ok, F.lit(False)).alias("kept"),
    ]


def dedup_lines_cols(col: str | Column, normalize: bool = True) -> list[Column]:
    """WITHIN-document exact line dedup (keep the FIRST occurrence,
    preserve order) — the in-doc companion to operators.dedup.
    paragraph_dedup's corpus-wide pass: collapses repeated nav blocks,
    quoted-reply pyramids and template streaks inside one document.
    normalize=True compares lines trim+lowercased (whitespace-only lines
    always survive — structure is content); False compares raw.

    Returns [text (reassembled), n_lines, n_kept]. One higher-order
    aggregate over the split array — no explode, no shuffle, no Python:
    map-only at any corpus size."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    norm = (lambda l: F.lower(F.trim(l))) if normalize else (lambda l: l)
    # fold: accumulate (seen keys, kept lines); blank lines always kept
    kept = F.aggregate(
        lines,
        F.struct(
            F.array().cast("array<string>").alias("seen"),
            F.array().cast("array<string>").alias("keep"),
        ),
        lambda acc, l: F.when(
            F.trim(l) == "",
            F.struct(
                acc["seen"].alias("seen"),
                F.concat(acc["keep"], F.array(l)).alias("keep"),
            ),
        ).otherwise(
            F.when(
                F.array_contains(acc["seen"], norm(l)),
                acc,
            ).otherwise(
                F.struct(
                    F.concat(acc["seen"], F.array(norm(l))).alias("seen"),
                    F.concat(acc["keep"], F.array(l)).alias("keep"),
                )
            )
        ),
        lambda acc: acc["keep"],
    )
    return [
        F.array_join(kept, "\n").alias("text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    ]


def compression_ratio_col(
    col: str = "text", out: str = "compression_ratio"
):
    """zlib compression ratio (compressed/raw bytes) — the classic
    repetition/boilerplate quality proxy (low ratio = highly repetitive
    text; prose sits ~0.3-0.5). Needs a real compressor, so this is an
    Arrow-batched kernel for mapInPandas over (any) columns + `col`:
    returns (schema_fn, map_fn). NULL/empty text -> NULL ratio."""
    import pandas as pd

    def map_fn(batches):
        import zlib

        for pdf in batches:
            vals = []
            for s in pdf[col]:
                if s:
                    raw = s.encode("utf-8")
                    vals.append(len(zlib.compress(raw, 6)) / len(raw))
                else:
                    vals.append(None)
            pdf[out] = pd.Series(vals, index=pdf.index, dtype="float64")
            yield pdf

    def schema_of(df):
        from pyspark.sql import types as T

        # never .add() onto df.schema — it mutates the DataFrame's cached
        # StructType and corrupts later column resolution
        return T.StructType(
            list(df.schema.fields) + [T.StructField(out, T.DoubleType())]
        )

    return map_fn, schema_of


def normalize_text_col(col: str | Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC / NFD / NFKC / NFKD) — the canonical
    first step of a web-corpus cleaning pipeline: 'e' + COMBINING ACUTE
    and precomposed 'é' must fingerprint, dedup, and tokenize identically,
    and NFKC folds compatibility forms (ligatures, circled digits,
    full-width ASCII) that otherwise split token statistics.

    Spark has no built-in normalizer, so this is an Arrow-batched pandas
    UDF over stdlib unicodedata (pandas Series.str.normalize) — the
    documented exception to the JVM-only rule: a pure stateless map, no
    shuffle, safe at any scale. Idempotent; NULL passes through. The
    NFC output is bit-compatible with DuckDB's nfc_normalize (both
    implement UAX #15 canonical composition), which is the oracle
    contract."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm(F.col(col) if isinstance(col, str) else col)
