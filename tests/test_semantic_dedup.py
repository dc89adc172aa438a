"""SemDeDup-style semantic dedup (operators/dedup.semantic_dedup):
deterministic lowest-k centroids, argmax-cosine assignment, within-
cluster prune at a threshold — brute parity, chain semantics,
partitioning invariance."""

from __future__ import annotations

import math

import pytest

from elasticsearch_jdbc_spark.operators.dedup import semantic_dedup


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb) if na and nb else 0.0


def _brute(vecs: dict, k: int, thr: float):
    cents = {i: vecs[i] for i in sorted(vecs)[:k]}
    cluster = {}
    for i, v in vecs.items():
        best = max(
            cents, key=lambda c: (round(_cos(v, cents[c]), 9), -c)
        )
        cluster[i] = best
    dropped = set()
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if cluster[a] == cluster[b] and round(_cos(vecs[a], vecs[b]), 9) >= thr:
                dropped.add(b)
    return cluster, dropped


def _mk(seed, dim=8, n=40):
    import random

    rng = random.Random(seed)
    vecs = {}
    for i in range(n):
        if i % 5 == 4:
            # planted near-dup of the previous vector
            base = vecs[i - 1]
            vecs[i] = [x + rng.uniform(-1e-4, 1e-4) for x in base]
        else:
            vecs[i] = [rng.uniform(-1, 1) for _ in range(dim)]
    return vecs


def test_brute_parity(spark):
    vecs = _mk(7)
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        x["vec_id"]: (x["cluster"], x["kept"])
        for x in semantic_dedup(df, k=4, threshold=0.999).collect()
    }
    cluster, dropped = _brute(vecs, 4, 0.999)
    assert len(got) == len(vecs)
    for i in vecs:
        assert got[i][0] == cluster[i], i
        assert got[i][1] == (i not in dropped), i
    # the planted near-dups actually exercised the prune
    assert dropped and all(i % 5 == 4 for i in dropped)


def test_chain_keeps_lowest(spark):
    """a~b and b~c (a!~c): b and c both drop, a survives — the lowest id
    of the chain is the kept representative."""
    a = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (0, a),
        (1, [0.9999, 0.0141067, 0.0, 0.0]),   # ~0.99990 vs 0
        (2, [0.9996, 0.0282809, 0.0, 0.0]),   # ~0.99990 vs 1, ~0.9996 vs 0
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        x["vec_id"]: x["kept"]
        for x in semantic_dedup(df, k=1, threshold=0.9998).collect()
    }
    assert got == {0: True, 1: False, 2: False, 3: True}


def test_partitioning_invariance_and_validation(spark):
    vecs = _mk(11)
    rows = [(i, v) for i, v in vecs.items()]
    out = []
    for p in (1, 7):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(p)
        out.append(
            sorted(
                (x["vec_id"], x["cluster"], x["kept"])
                for x in semantic_dedup(df, k=3, threshold=0.999).collect()
            )
        )
    assert out[0] == out[1]
    with pytest.raises(ValueError, match="k must be"):
        semantic_dedup(spark.range(1).selectExpr(
            "id as vec_id", "array(1.0) as embedding"), k=0)
