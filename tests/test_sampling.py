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
