"""The vectorized word-hash kernel (VERDICT r03 wrong #2 + ADVICE r03):
token length is capped so one pathological multi-KB token cannot inflate
the vocab char matrix to O(vocab x maxlen), and the splitmix64 finalizer
restores avalanche behavior over plain FNV-1a."""

from __future__ import annotations

import numpy as np

from elasticsearch_jdbc_spark.operators.dedup import (
    HASH_TOKEN_CAP,
    _hash_words64,
    minhash_signatures,
    simhash64,
)


def test_token_cap_bounds_matrix_width():
    huge = "x" * 100_000
    vocab = ["alpha", "beta", huge]
    h = _hash_words64(vocab, 7)
    # the huge token hashes by its first HASH_TOKEN_CAP chars — same value
    # as the explicitly-truncated token, so the domain change is exactly
    # "prefix at the cap", nothing else
    h_trunc = _hash_words64([huge[:HASH_TOKEN_CAP]], 7)
    assert h[2] == h_trunc[0]
    # short tokens are unaffected by a pathological neighbor in the batch
    assert np.array_equal(h[:2], _hash_words64(["alpha", "beta"], 7))


def test_pathological_token_among_many_docs(spark):
    # one minified-bundle-style doc among many normal ones: the kernel
    # must stay batch-vectorized and finish promptly (pre-cap this
    # allocated a len(vocab) x 100k char matrix)
    import time

    rows = [(i, f"normal words doc {i} alpha beta gamma delta") for i in range(2000)]
    rows.append((2000, "prefix " + "y" * 100_000 + " suffix"))
    df = spark.createDataFrame(rows, "id long, text string")
    t0 = time.time()
    sigs = minhash_signatures(df, "id", "text", n=2, num_perm=16).collect()
    assert len(sigs) == 2001
    assert time.time() - t0 < 60


def test_avalanche_bias():
    # sequential short keys (FNV's worst case) must still flip ~half the
    # output bits between neighbors after the splitmix64 finalizer
    vocab = [f"k{i}" for i in range(4096)]
    h = _hash_words64(vocab, 0)
    flips = np.unpackbits(
        (h[:-1] ^ h[1:]).view(np.uint8).reshape(-1, 8), axis=1
    ).sum(axis=1)
    assert 20 <= flips.mean() <= 44  # ~32 expected for 64-bit avalanche


def test_simhash_stable_under_cap(spark):
    df = spark.createDataFrame(
        [(0, "merge sort buffer stream"), (1, "merge sort buffer stream"),
         (2, "z" * 200_000)],
        "id long, text string",
    )
    bits = {r["id"]: r["simhash"] for r in simhash64(df, "id", "text").collect()}
    assert bits[0] == bits[1]
    assert bits[2] != bits[0]
