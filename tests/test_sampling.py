"""Deterministic hash split + stratified sampling (training-pipeline
surface): membership must be a pure function of (salt, keys) — identical
across partitionings and cluster sizes — and proportions must track the
requested weights. Oracle-checked row-exact in the registry
(sample_split_docs); here brute-force parity with hashlib and the
determinism/distribution contracts df.sample cannot give.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.operators import sampling


def _brute_bucket(salt: str, *keys: str | None) -> str:
    # mirrors _bucket_hex's null-marking: 'v'+value, 'n' for NULL
    enc = ["n" if k is None else f"v{k}" for k in keys]
    payload = "\x1f".join([salt, *enc])
    return hashlib.sha256(payload.encode()).hexdigest()[:12]


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).withColumn(
        "stratum", (F.col("id") % 4).cast("string")
    )


def test_split_matches_hashlib_and_weights(spark, ids):
    out = sampling.hash_split(
        ids, ["id"], {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s"
    )
    rows = out.collect()
    thr_train = sampling._threshold(0.8)
    thr_val = sampling._threshold(0.9)
    for row in rows[:500]:
        b = _brute_bucket("s", str(row["id"]))
        exp = "train" if b < thr_train else ("val" if b < thr_val else "test")
        assert row["split"] == exp
    from collections import Counter

    c = Counter(row["split"] for row in rows)
    assert set(c) == {"train", "val", "test"}
    assert abs(c["train"] / 20_000 - 0.8) < 0.02
    assert abs(c["val"] / 20_000 - 0.1) < 0.01
    assert abs(c["test"] / 20_000 - 0.1) < 0.01


def test_membership_partitioning_invariant(spark, ids):
    a = set(
        row["id"]
        for row in sampling.stratified_sample(
            ids.repartition(3), ["id"], 0.3, salt="x"
        ).collect()
    )
    b = set(
        row["id"]
        for row in sampling.stratified_sample(
            ids.repartition(17, "stratum"), ["id"], 0.3, salt="x"
        ).collect()
    )
    assert a == b and abs(len(a) / 20_000 - 0.3) < 0.02
    # a different salt draws an (almost entirely) different sample
    c = set(
        row["id"]
        for row in sampling.stratified_sample(
            ids, ["id"], 0.3, salt="y"
        ).collect()
    )
    assert len(a & c) / len(a) < 0.45  # ~0.3 expected under independence


def test_per_stratum_fractions(spark, ids):
    out = sampling.stratified_sample(
        ids, ["id"], {"0": 1.0, "1": 0.5, "2": 0.0},
        strata_col="stratum", salt="z",
    )
    from collections import Counter

    c = Counter(row["stratum"] for row in out.collect())
    assert c["0"] == 5000  # fraction 1.0 keeps everything
    assert abs(c["1"] / 5000 - 0.5) < 0.05
    assert "2" not in c and "3" not in c  # 0.0 and unlisted both drop


def test_edges_and_errors(spark, ids):
    assert sampling.stratified_sample(ids, ["id"], 0.0).count() == 0
    assert sampling.stratified_sample(ids, ["id"], 1.0).count() == 20_000
    with pytest.raises(ValueError):
        sampling.hash_split(ids, ["id"], {"a": 0.6, "b": 0.6})
    with pytest.raises(ValueError):
        sampling.stratified_sample(ids, ["id"], {"0": 0.5})  # no strata_col
    with pytest.raises(ValueError):
        sampling._threshold(1.5)


def test_null_keys_spread_not_collapsed(spark):
    """NULL keys must spread across splits like any other value domain
    (code-review r04: raw concat_ws drops null positions, so every
    null-keyed row shared ONE bucket and the whole null cohort landed in
    a single split) — and ('a', NULL) must hash differently from
    (NULL, 'a')."""
    df = spark.range(0, 3_000).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id").cast("string")).alias("k"),
        F.col("id"),
    )
    out = sampling.hash_split(df, ["k", "id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    from collections import Counter

    null_splits = Counter(
        r["split"] for r in out.filter(F.col("k").isNull()).collect()
    )
    # 1000 null-keyed rows: all three splits populated, ~80/10/10
    assert set(null_splits) == {"train", "val", "test"}
    assert abs(null_splits["train"] / 1000 - 0.8) < 0.08
    # brute-force parity including the null marker
    row = out.filter(F.col("k").isNull()).limit(1).collect()[0]
    b = _brute_bucket("", None, str(row["id"]))
    thr_train, thr_val = sampling._threshold(0.8), sampling._threshold(0.9)
    exp = "train" if b < thr_train else ("val" if b < thr_val else "test")
    assert row["split"] == exp
    # order sensitivity: ('a', NULL) != (NULL, 'a')
    assert _brute_bucket("s", "a", None) != _brute_bucket("s", None, "a")


def test_temperature_resample(spark):
    from elasticsearch_jdbc_spark.operators.sampling import (
        temperature_resample,
    )

    rows = [(i, "big") for i in range(400)] + \
           [(i + 1000, "mid") for i in range(100)] + \
           [(i + 2000, "small") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")

    # alpha=1: rates all 1.0 -> identity
    kept1 = temperature_resample(df, "dom", ["doc_id"], alpha=1.0)
    assert kept1.count() == len(rows)

    kept = temperature_resample(df, "dom", ["doc_id"], alpha=0.5, salt="t")
    by = {r["dom"]: r["cnt"] for r in
          kept.groupBy("dom").agg(F.count("*").alias("cnt")).collect()}
    # smallest domain fully kept (rate 1.0 by construction)
    assert by["small"] == 25
    # expected rates: (n_d/25)^(alpha-1) -> big 0.25, mid 0.5
    assert abs(by["big"] - 400 * 0.25) <= 3 * (400 * 0.25 * 0.75) ** 0.5
    assert abs(by["mid"] - 100 * 0.5) <= 3 * (100 * 0.25) ** 0.5
    # deterministic: same call, same membership
    ids = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in temperature_resample(
            df, "dom", ["doc_id"], alpha=0.5, salt="t"
        ).collect()
    )
    assert ids == ids2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        temperature_resample(df, "dom", ["doc_id"], alpha=0.0)


def test_temperature_resample_keeps_null_domains(spark):
    """The NULL-domain cohort survives (null-safe rates join); at
    alpha=1.0 every row passes through."""
    from elasticsearch_jdbc_spark.operators.sampling import (
        temperature_resample,
    )

    df = spark.createDataFrame(
        [(i, None if i % 2 else "d0") for i in range(40)],
        "doc_id long, source string",
    )
    out = temperature_resample(df, alpha=1.0, domain_col="source",
                               key_cols=["doc_id"])
    assert out.count() == 40
    assert out.filter(F.col("source").isNull()).count() == 20
