"""Physical-plan regression tests: the properties that make these queries
scale (predicate pushdown to parquet, column pruning, broadcast joins for
dims, whole-stage codegen) must not silently regress."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.plans.registry import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read unused columns
    assert "l_partkey" not in plan
    # (whole-stage codegen markers only materialize in the AQE final plan
    # post-execution, so they are not asserted here)


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24" in plan


def test_q3_broadcasts_dimension(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter pushed pre-join


def test_q5_star_join_no_shuffle_join_on_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_region_revenue")
    # all three dim joins broadcast; the only exchange is the agg shuffle
    assert plan.count("BroadcastHashJoin") >= 3


def test_semi_join_for_exists(spark, sf_dir):
    plan = _plan(spark, sf_dir, "e1_orders_with_big_lineitem")
    assert "LeftSemi" in plan


def test_fingerprint64_order_insensitive_no_overflow(spark):
    """XOR-fold fingerprint: order-insensitive, ANSI-safe (the additive fold
    crashed with ARITHMETIC_OVERFLOW under ANSI mode — CORRECTNESS_r01)."""
    from pyspark.sql import functions as F

    from elasticsearch_jdbc_spark.functions.text import fingerprint64

    df = spark.createDataFrame(
        [("alpha beta gamma",), ("gamma beta alpha",), ("alpha beta delta",), ("",)],
        "text string",
    ).select(fingerprint64("text").alias("fp"))
    a, b, c, empty = [r["fp"] for r in df.collect()]
    assert a == b, "token order must not matter"
    assert a != c
    assert empty == 0


def test_bm25_phrase_topk_survives_short_docs(spark, tmp_path):
    """Docs with 0/1 tokens must not crash the adjacent-bigram scan
    (F.sequence(1, size-1) steps DOWN when size<=1 — ADVICE r01)."""
    from elasticsearch_jdbc_spark.plans.registry import QUERIES

    d = spark.createDataFrame(
        [
            (0, "fast key lookup wins", "s", "en", 20),
            (1, "x", "s", "en", 1),
            (2, "", "s", "en", 0),
            (3, "hash value store", "s", "en", 16),
        ],
        "doc_id long, text string, source string, lang string, n_chars int",
    )
    sf = str(tmp_path / "mini")
    d.write.parquet(f"{sf}/documents.parquet")
    out = QUERIES["bm25_phrase_topk"](spark, sf).collect()
    assert {r["doc_id"] for r in out} == {0, 3}


def test_search_df_pushes_term_filter_to_postings_scan(spark, tmp_path):
    """The distributed searcher must read ONLY the query terms' posting
    rows: the term IN-filter has to reach the parquet scan."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    idx = str(tmp_path / "pidx")
    df = spark.createDataFrame(
        [("r", str(i), "c", "t", f"alpha beta w{i}") for i in range(30)],
        "repo string, path string, commit string, lang string, content string",
    )
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    plan = (
        IndexReader(spark, idx)
        .search_df("alpha beta", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(term" in plan


def test_dedup_plans_have_no_cartesian(spark, sf_dir):
    """MinHash/SimHash/LSH candidate generation must stay equi-join —
    a CartesianProduct anywhere means the O(n^2) path snuck back in."""
    from elasticsearch_jdbc_spark.plans.registry import QUERIES

    for name in ("dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_lsh",
                 "dedup_jaccard_pairs"):
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_simhash_pairs_single_join(spark):
    """The Manku tables must compile to ONE self-join over the exploded
    (combo, key) rows, not C(6,3)=20 separate joins."""
    from elasticsearch_jdbc_spark.operators import dedup

    sim = dedup.simhash64(
        spark.createDataFrame([(1, "a b c"), (2, "a b d")], "id long, t string"),
        "id", "t",
    )
    plan = (
        dedup.simhash_near_pairs(sim, max_hamming=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count("ShuffledHashJoin")
    assert n_joins == 1, f"expected one equi-join, saw {n_joins}"
