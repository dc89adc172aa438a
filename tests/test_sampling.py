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


def _brute_bucket(salt: str, key: str) -> str:
    return hashlib.sha256(f"{salt}\x1f{key}".encode()).hexdigest()[:12]


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
