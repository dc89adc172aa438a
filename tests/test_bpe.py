"""Distributed BPE tokenizer training vs a pure-Python reference trainer:
identical merge tables (incl. deterministic tie-breaks) on any partitioning,
encoder parity between the driver reference and the distributed segmenter,
lossless reconstruction."""

from __future__ import annotations

from collections import defaultdict

import pytest

from elasticsearch_jdbc_spark.operators.bpe import (
    EOW,
    bpe_encode_py,
    bpe_segment_df,
    train_bpe,
    word_vocab,
)

CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3 + ["new"] * 2
)
TEXT = " ".join(CORPUS)


def _merge_tuple(syms: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(word_counts: dict, n: int, min_count: int = 2):
    vocab: dict = defaultdict(int)
    for w, c in word_counts.items():
        vocab[tuple(list(w) + [EOW])] += c
    merges = []
    for _ in range(n):
        pairs: dict = defaultdict(int)
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b))
        nxt: dict = defaultdict(int)
        for syms, c in vocab.items():
            nxt[_merge_tuple(syms, (a, b))] += c
        vocab = nxt
    return merges


def test_train_matches_reference_and_partitioning(spark):
    counts: dict = defaultdict(int)
    for w in CORPUS:
        counts[w] += 1
    want = _ref_train(dict(counts), 12)
    assert len(want) == 12
    for parts in (1, 8):
        df = spark.createDataFrame([(TEXT,)], "text string").repartition(parts)
        got = train_bpe(df, "text", 12)
        assert got == want
    # word_vocab is the corpus-sized substrate
    wv = {
        r["word"]: r["count"]
        for r in word_vocab(
            spark.createDataFrame([(TEXT,)], "text string"), "text"
        ).collect()
    }
    assert wv == dict(counts)


def test_encoder_parity_and_reconstruction(spark):
    df = spark.createDataFrame([(TEXT,), (None,)], "text string")
    merges = train_bpe(df, "text", 10)
    seg = bpe_segment_df(df, "text", merges).collect()
    by_null = {r["text"] is None: r for r in seg}
    assert by_null[True]["bpe_tokens"] is None
    toks = by_null[False]["bpe_tokens"]
    assert by_null[False]["bpe_len"] == len(toks)
    # distributed segmenter == driver reference encoder, word by word
    want = []
    for w in TEXT.split():
        want.extend(bpe_encode_py(w, merges))
    assert toks == want
    # lossless: stripping the EOW sentinel reconstructs the text
    assert "".join(toks).replace(EOW, " ").strip() == TEXT
    # merged symbols actually compress the stream
    assert len(toks) < sum(len(w) + 1 for w in TEXT.split())


def test_early_stop_and_validation(spark):
    # all-unique words -> every pair is hapax -> min_pair_count stops at 0
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    assert train_bpe(df, "text", 5) == []
    # min_pair_count=1 merges hapaxes too
    assert len(train_bpe(df, "text", 2, min_pair_count=1)) == 2
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(df, "text", 0)
