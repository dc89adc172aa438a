"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
training-data-pipeline step that turns a cleaned corpus into a subword
vocabulary. No external tokenizer library: the classic algorithm expressed
Spark-first.

The standard formulation operates on the corpus's WORD VOCABULARY with
frequencies, not on raw text: at web scale the (word, count) relation is
millions of rows where the corpus is trillions of tokens, so every merge
round touches a relation ~6 orders of magnitude smaller than the corpus.
Here:

  * one corpus pass builds (word, count)  — the only corpus-sized job;
  * each merge round is ONE map-side-combinable pair-count aggregation
    over the vocab + a driver argmax (a single (pair, count) row) + ONE
    filtered rewrite of just the vocab rows containing the merged pair;
  * the symbol-array rewrite is a pure Catalyst aggregate fold (no Python
    in the loop) — state = (rebuilt array, skip flag), one pass per row;
  * ties break deterministically (count DESC, then pair lexicographic),
    so the merge table is reproducible on any cluster/partitioning —
    unlike implementations that rely on hash-map iteration order.

Scale note: rounds are sequential by nature (merge k+1 depends on k); at
a production vocab_size the driver loop issues num_merges tiny jobs over
the (cached) vocab relation. The per-round cost is O(vocab) with map-side
combine, not O(corpus) — the reason the word-frequency formulation is the
one every real BPE trainer uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# end-of-word sentinel (the Sennrich '</w>' marker, one codepoint here so
# it can never collide with a real character sequence post-merge)
EOW = "\u2581"  # LOWER ONE EIGHTH BLOCK, the sentencepiece word-marker glyph


def word_vocab(df: DataFrame, col: str, lowercase: bool = True) -> DataFrame:
    """(word, count) over whitespace-split words — the corpus-sized pass.
    One explode + one map-side-combinable groupBy."""
    c = F.col(col)
    if lowercase:
        c = F.lower(c)
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, n) adjacent-symbol pair frequencies, count-weighted — one
    projection + one map-side-combinable groupBy over the vocab."""
    idx = F.sequence(F.lit(1), F.size("syms") - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at("syms", i).alias("a"),
            F.element_at("syms", i + 1).alias("b"),
        ),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "count")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("count").alias("n"))
    )


def _merge_pair(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite syms merging every adjacent (a, b) -> a||b, leftmost-first
    non-overlapping (the BPE rule: 'aaa' with pair (a,a) -> ['aa','a']).
    Pure Catalyst: an aggregate fold with (rebuilt, just_merged) state —
    no Python, no shuffle; only rows containing the pair rewrite."""
    la, lb = F.lit(a), F.lit(b)
    # when-guarded: sequence(1, size-1) on a 1-symbol row auto-steps DOWN
    # to [1, 0] and element_at(syms, 0) raises under ANSI — and splitting
    # keep/candidate relations instead would union-DOUBLE the partition
    # count every round (observed: 4096 tasks by merge 12)
    has = F.when(
        F.size("syms") >= 2,
        F.exists(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: (F.element_at("syms", i) == la)
            & (F.element_at("syms", i + 1) == lb),
        ),
    ).otherwise(F.lit(False))
    state = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("skip"),
    )

    def step(acc, s):
        # when-guarded last element: conjunctions don't short-circuit, and
        # ANSI mode makes element_at(-1) on an empty array a runtime error
        last = F.when(F.size(acc["out"]) >= 1, F.element_at(acc["out"], -1))
        merged = F.coalesce(
            ~acc["skip"] & (last == la) & (s == lb), F.lit(False)
        )
        out = F.when(
            merged,
            F.concat(
                F.slice(acc["out"], 1, F.size(acc["out"]) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc["out"], F.array(s)))
        return F.struct(out.alias("out"), merged.alias("skip"))

    rewritten = F.aggregate("syms", state, step)["out"]
    return vocab.withColumn(
        "syms", F.when(has, rewritten).otherwise(F.col("syms"))
    )


def train_bpe(
    df: DataFrame,
    col: str,
    num_merges: int,
    lowercase: bool = True,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merge rules from the corpus. Returns the
    ordered merge table [(a, b), ...] — the artifact a tokenizer ships.

    Stops early when no pair reaches min_pair_count (the Sennrich
    convention: merging hapax pairs only memorizes noise). Deterministic:
    the argmax tie-breaks (count DESC, a ASC, b ASC)."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    spark = df.sparkSession
    vocab = word_vocab(df, col, lowercase=lowercase).withColumn(
        "syms",
        F.concat(
            # split('') yields codepoints; drop any empty artifacts
            F.filter(F.split(F.col("word"), ""), lambda ch: ch != ""),
            F.array(F.lit(EOW)),
        ),
    ).select("syms", "count")
    # iterative lineage MUST truncate each round: cache() materializes but
    # keeps the analyzed plan, and Catalyst's projection collapse re-inlines
    # the fold expression at every `acc` reference — by ~10 rounds the plan
    # string is gigabytes (observed: a 1.3 GB UTF16 OOM building round 12's
    # lineage). localCheckpoint(eager=True) pins the round's rows in
    # executor storage AND cuts the plan, the standard pattern for
    # iterative algorithms (old checkpoint blocks are GC-reclaimed).
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = _merge_pair(vocab, a, b).localCheckpoint(eager=True)
    return merges


def bpe_encode_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder (driver-side, for tests and spot checks): apply
    the merge table in learned order to one word. The distributed twin is
    bpe_segment_df."""
    syms = list(word) + [EOW]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_segment_df(
    df: DataFrame,
    col: str,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize a corpus with a learned merge table: (original columns...,
    bpe_tokens array<string>, bpe_len). The merge loop runs INSIDE one
    Arrow-batched kernel per row batch (the table is a broadcast-sized
    plan literal via closure capture) — one map-only pass, no shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    rules = list(merges)

    def seg(batches):
        # rank-indexed pair table: repeatedly merge the best-ranked pair
        # present (equivalent to applying rules in order; standard trick)
        rank = {p: i for i, p in enumerate(rules)}

        def enc(text):
            if text is None:
                return None
            toks: list[str] = []
            for w in (text.lower() if lowercase else text).split():
                syms = list(w) + [EOW]
                while len(syms) >= 2:
                    best, where = None, -1
                    for i in range(len(syms) - 1):
                        r = rank.get((syms[i], syms[i + 1]))
                        if r is not None and (best is None or r < best):
                            best, where = r, i
                    if best is None:
                        break
                    a, b = rules[best]
                    out: list[str] = []
                    i = 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                toks.extend(syms)
            return toks

        for pdf in batches:
            toks = pdf[col].map(enc)
            pdf = pdf.assign(
                bpe_tokens=toks,
                bpe_len=toks.map(lambda t: len(t) if t is not None else None),
            )
            yield pdf

    fields = list(df.schema.fields) + [
        T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
        T.StructField("bpe_len", T.LongType()),
    ]
    return df.mapInPandas(seg, T.StructType(fields))
