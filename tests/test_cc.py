"""Connected components (operators/cc.py) and fuzzy-dedup cluster
formation (dedup.near_dup_clusters)."""

import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.operators.cc import connected_components
from elasticsearch_jdbc_spark.operators import dedup


def _uf_components(edges):
    """Reference union-find: {node: min id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, "src", "dst").collect()
    return {r.node: r.component for r in got}


class TestConnectedComponents:
    def test_chain_collapses_to_one(self, spark):
        # the diameter case min-label propagation is slow on
        edges = [(i, i + 1) for i in range(1, 20)]
        got = _run(spark, edges)
        assert set(got.values()) == {1}
        assert set(got) == set(range(1, 21))

    def test_disjoint_clusters_and_orientation(self, spark):
        # reversed/duplicated/self-loop edges must not matter
        edges = [(5, 3), (3, 5), (3, 9), (9, 9), (20, 21), (21, 20)]
        got = _run(spark, edges)
        assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}

    def test_random_graphs_match_union_find(self, spark):
        rng = random.Random(7)
        for trial in range(3):
            n = 60
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(45)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            want = _uf_components(edges)
            got = _run(spark, edges)
            assert got == want, f"trial {trial}"

    def test_empty_edges(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        assert connected_components(df, "src", "dst").collect() == []


class TestNearDupClusters:
    def test_chained_near_dups_one_cluster(self, spark):
        # A~B and B~C near-identical neighbours, A vs C below threshold:
        # pairwise keep rules split them, components must not.
        base = "the quick brown fox jumps over the lazy dog " * 4
        a = base + "alpha beta gamma delta epsilon zeta"
        b = base + "alpha beta gamma delta epsilon eta theta"
        # j(a,b)=13/16=0.81, j(b,c)=14/16=0.875, j(a,c)=12/17=0.71
        c = base + "alpha beta gamma epsilon eta theta kappa"
        rows = [(1, a), (2, b), (3, c), (10, "completely different text about spark shuffles and parquet row groups")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.minhash_lsh_pairs(
            df, "doc_id", "text", n=1, num_perm=128, bands=32,
            verify_threshold=0.8,
        )
        got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert (1, 2) in got_pairs and (2, 3) in got_pairs
        assert (1, 3) not in got_pairs  # genuinely chained
        out = dedup.near_dup_clusters(
            df, "doc_id", "text", n=1, num_perm=128, bands=32,
            verify_threshold=0.8,
        ).collect()
        got = {r.id: (r.cluster, r.is_canonical) for r in out}
        assert got == {
            1: (1, True),
            2: (1, False),
            3: (1, False),
            10: (10, True),
        }

    def test_singletons_are_canonical(self, spark):
        df = spark.createDataFrame(
            [(i, f"unique document number {i} with entirely distinct words w{i}a w{i}b w{i}c") for i in range(5)],
            "doc_id long, text string",
        )
        out = dedup.near_dup_clusters(df, "doc_id", "text", n=1).collect()
        assert all(r.cluster == r.id and r.is_canonical for r in out)
        assert len(out) == 5
