"""Distributed connected components over an edge DataFrame.

The transitive-closure primitive fuzzy dedup needs for CLUSTER formation:
minhash/simhash/embedding near-dup passes emit pairwise edges, but "keep
one doc per duplicate cluster" is a property of the connected component,
not the pair — A~B and B~C must collapse to one survivor even when A and
C themselves are below the similarity threshold (the chained-near-dup
case minhash_dedup's single min-propagation round deliberately leaves to
this operator).

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond"), the shape GraphFrames
ships for the same problem. Each round is two narrow hashed-key shuffles
(a groupBy-min per node and an equi-join back); the edge set provably
converges to disjoint stars rooted at each component's minimum id in
O(log^2 n) rounds — independent of component diameter, unlike plain
min-label propagation whose round count is the graph diameter (a 100M-doc
duplicate chain would need 100M rounds under label propagation; star
contraction needs ~27). Lineage is truncated every round with an eager
localCheckpoint, so the plan never grows with the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to min(N(u) + {u})."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(
        F.least(F.first("u"), F.min("v")).alias("m")
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high->low, connect every small neighbor (and u) to
    the minimum."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    others = (
        oriented.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfe = m.select(F.col("u"), F.col("m").alias("v"))
    return others.unionByName(selfe).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    component is the SMALLEST node id reachable from it. Ids must be
    integral (cast to long). Self-loops are ignored; nodes with no edges
    don't appear (callers coalesce(component, id) over their full id set
    — see dedup.near_dup_clusters).

    Convergence is detected by an order-insensitive edge-set signature
    (count + sum of per-edge hashes) going stable — one tiny driver action
    per round, which the round's localCheckpoint materialization pays for
    anyway.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        # materialize BEFORE iterating: each star round references its
        # input several times (sym union, groupBy, join-back) — without
        # this the caller's (possibly expensive) edge pipeline would be
        # re-evaluated per reference in round 1
        .localCheckpoint(eager=True)
    )
    if not e.take(1):
        return e.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )

    def _sig(df: DataFrame):
        row = df.agg(
            F.count("*").alias("n"),
            # xor, not sum: order-insensitive and can't overflow under ANSI
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = _sig(e)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # fixed point = disjoint stars (u -> component min); roots map to
    # themselves
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(
        F.col("v").alias("node"), F.col("v").alias("component")
    ).distinct()
    return (
        members.unionByName(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
