"""Plan-shape regression guards for the round-4 surfaces: the properties
that make them 100 TB-safe, asserted on the actual Catalyst plans so a
refactor cannot silently reintroduce a global sort or a second postings
decode (VERDICT r03 flagged exactly such regressions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " tags array<string>, req long, parent string"
)
DOCS = [
    ("r", f"{i}", "c", "t", "merge sort quick value", ["red", "blue"], 1,
     None if i % 10 == 0 else f"{i - i % 10}")
    for i in range(40)
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ps") / "idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ps") / "fidx")
    docs = [(r, p, c, l, t, t.upper()) for r, p, c, l, t, *_ in DOCS]
    IndexBuilder(spark, d, partitions=2, fields=["content", "upper"]).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string, upper string",
        ),
        resume=False,
    )
    return d


def _opt(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_terms_set_is_scan_only(spark, idx):
    r = IndexReader(spark, idx)
    plan = _opt(r.terms_set_df("tags", ["red"], msm_field="req"))
    assert "Sort" not in plan and "Limit" not in plan
    assert "Join" not in plan  # one docs scan + filter, nothing else


def test_has_child_has_no_global_sort(spark, idx):
    r = IndexReader(spark, idx)
    plan = _opt(r.has_child_df("merge", "parent", "path"))
    assert "Sort" not in plan and "GlobalLimit" not in plan


def test_match_df_unranked(spark, idx):
    r = IndexReader(spark, idx)
    plan = _opt(r.match_df("merge quick"))
    assert "Sort" not in plan and "Limit" not in plan


def test_combined_fields_single_decode(spark, fidx):
    r = IndexReader(spark, fidx)
    phys = _phys(r.search_combined_df("merge quick", k=5))
    # the max_field default must decode postings exactly ONCE
    assert phys.count("MapInPandas") == 1
    assert phys.count("FileScan") == 1
    assert "TakeOrderedAndProject" in phys
    # exact mode pays the documented second decode — no more than that
    phys2 = _phys(r.search_combined_df("merge quick", k=5, df_mode="exact"))
    assert phys2.count("MapInPandas") == 2


def test_combined_fields_term_filter_pushed(spark, fidx):
    r = IndexReader(spark, fidx)
    phys = _phys(r.search_combined_df("merge", k=5))
    assert "PushedFilters: [In(term" in phys


def test_pinned_organic_side_unranked_until_cut(spark, idx):
    r = IndexReader(spark, idx)
    plan = _phys(r.search_pinned_df("merge", ["3"], k=5))
    # exactly one ordered cut (the final top-k), nothing upstream
    assert plan.count("TakeOrderedAndProject") == 1
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dsl_bool_pushes_filters_one_ordered_cut(spark, idx):
    r = IndexReader(spark, idx)
    body = {
        "bool": {
            "must": [{"match": {"content": "merge"}}],
            "filter": [{"range": {"req": {"gte": 1}}}],
            "must_not": [{"term": {"lang": "zz"}}],
        }
    }
    phys = _phys(r.search_dsl_df(body, k=5))
    # metadata predicates reach the docs parquet scan
    assert "PushedFilters" in phys and "GreaterThanOrEqual(req,1)" in phys
    # exactly one ordered cut; no global Sort, no cartesian product
    assert phys.count("TakeOrderedAndProject") == 1
    assert "CartesianProduct" not in phys
    # unranked compile has no sort/limit at all
    opt = _opt(r.search_dsl_df(body, k=None))
    assert "Sort" not in opt and "Limit" not in opt


def test_aggs_dsl_single_aggregation_pass(spark, idx):
    r = IndexReader(spark, idx)
    aggs = {
        "by_lang": {
            "terms": {"field": "lang"},
            "aggs": {"avg_req": {"avg": {"field": "req"}}},
        }
    }
    phys = _phys(r.aggs_dsl_df(aggs, query={"match": {"content": "merge"}}))
    # the whole bucket/metric tree is ONE aggregation (partial+final pairs
    # over a single grouping), never one groupBy per bucket level
    assert phys.count("HashAggregate") <= 4
    assert "CartesianProduct" not in phys


def test_significant_text_no_postings_decode(spark, idx):
    """significant_text's fg comes from the tokenized checkpoint: the only
    Python stage allowed is the match set's block decode — one fewer than
    significant_terms, which decodes the WHOLE postings table."""
    r = IndexReader(spark, idx)
    st = _phys(r.significant_text_df("merge", size=5, min_doc_count=1))
    sg = _phys(r.significant_terms_df("merge", size=5, min_doc_count=1))
    assert st.count("MapInPandas") == sg.count("MapInPandas") - 1
    assert st.count("TakeOrderedAndProject") == 1


def test_categorize_text_single_shuffle(spark, idx):
    """categorize_text (unscoped): one codegen projection + ONE narrow
    shuffle on the category key; no Python, no extra exchange, the final
    cut is a TakeOrdered."""
    r = IndexReader(spark, idx)
    phys = _phys(r.categorize_text_df(size=5))
    assert "MapInPandas" not in phys and "EvalPython" not in phys
    assert phys.count("Exchange") == 1
    assert phys.count("TakeOrderedAndProject") == 1


def test_quantize_embeddings_map_only(spark):
    """int8 quantization is one codegen projection: no shuffle, no UDF."""
    from elasticsearch_jdbc_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.range(100).select(
        F.col("id"), F.array(F.rand(7), F.rand(8), F.rand(9)).alias("v")
    )
    phys = _phys(quantize_embeddings(df, "v"))
    assert "Exchange" not in phys
    assert "EvalPython" not in phys and "MapInPandas" not in phys


def test_bpe_pair_counts_map_side_combine(spark):
    """BPE's per-round pair count must map-side combine: partial + final
    HashAggregate around exactly ONE exchange."""
    from elasticsearch_jdbc_spark.operators.bpe import _pair_counts, word_vocab

    df = spark.createDataFrame([("low low lower newest",)], "text string")
    vocab = word_vocab(df, "text").withColumn(
        "syms", F.concat(F.split("word", ""), F.array(F.lit("▁")))
    )
    phys = _phys(_pair_counts(vocab))
    # vocab build (1 exchange) + pair groupBy (1 exchange), nothing more
    assert phys.count("Exchange") == 2
    assert "partial_" in phys.lower() or "HashAggregate" in phys


def test_scripted_metric_by_one_shuffle(spark):
    from elasticsearch_jdbc_spark.operators.scripted import scripted_metric_by

    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")

    def m(s, pdf):
        s["n"] = s.get("n", 0) + len(pdf)

    out = scripted_metric_by(
        df, ["g"], m, lambda s: s, lambda ps: {"n": sum(p.get("n", 0) for p in ps)},
        "n bigint",
    )
    phys = _phys(out)
    assert phys.count("Exchange") == 1
    assert "FlatMapGroupsInPandas" in phys


def test_ingest_pipeline_fuses_to_projection(spark):
    from elasticsearch_jdbc_spark.operators.ingest import apply_pipeline

    df = spark.createDataFrame(
        [(1, " A ", "2kb", "u1 GET /a")], "id int, s string, b string, log string"
    )
    out = apply_pipeline(df, [
        {"trim": {"field": "s"}},
        {"lowercase": {"field": "s"}},
        {"bytes": {"field": "b"}},
        {"dissect": {"field": "log", "pattern": "%{u} %{m} %{p}"}},
        {"fingerprint": {"fields": ["s", "u"]}},
        {"drop": {"if": "m = 'DELETE'"}},
    ])
    phys = _phys(out)
    # the whole 6-processor chain is one codegen pass: no shuffle, no
    # UDF, a single WholeStageCodegen span over the scan
    assert "Exchange" not in phys
    assert "BatchEvalPython" not in phys and "MapInPandas" not in phys
    # one codegen stage ("*(1)") over one scan — the chain fully fused
    assert "*(1) Project" in phys or "*(1) Filter" in phys
    assert phys.count("Scan") == 1


def test_downsample_one_shuffle_partial_agg(spark):
    from elasticsearch_jdbc_spark.index.aggs import downsample

    df = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 1.0)], "k string, ts string, v double"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    phys = _phys(downsample(df, "ts", "day", ["k"], ["v"], last_value=["k"]))
    # one groupBy shuffle + the presentation sort, map-side partials
    assert phys.count("Exchange") == 2  # hashpartitioning + rangepartitioning
    assert "partial" in phys.lower()


def test_geo_rings_one_shuffle(spark):
    from elasticsearch_jdbc_spark.index.aggs import geo_distance_agg

    df = spark.createDataFrame([(1.0, 2.0)], "lat double, lon double")
    phys = _phys(
        geo_distance_agg(df, "lat", "lon", 0.0, 0.0, [{"to": 5.0, "key": "x"}])
    )
    # ring tagging is pure projection (no UDF); one agg shuffle + sort
    assert "BatchEvalPython" not in phys and "MapInPandas" not in phys
    assert phys.count("Exchange") == 2


def test_pinned_dsl_broadcasts_pins_no_sort_unranked(spark, idx):
    r = IndexReader(spark, idx)
    body = {
        "pinned": {
            "ids": ["3", "5"],
            "organic": {"match": {"content": "merge"}},
        }
    }
    opt = _opt(r.search_dsl_df(body, k=None))
    # unranked compile: pins broadcast, organic anti-joined, NO global sort
    assert "Sort" not in opt
    phys = _phys(r.search_dsl_df(body, k=None))
    assert "BroadcastHashJoin" in phys
    assert "CartesianProduct" not in phys


def test_flat_bool_single_postings_scan(spark, idx):
    """A flat bool (bare match clauses only) through search_dsl_df must
    route through the ONE-scan search_bool_df kernel: one postings
    FileScan, one decode, conjunction/exclusion as aggregation
    predicates — not one postings scan per leaf (VERDICT r4 #4)."""
    r = IndexReader(spark, idx)
    body = {"bool": {
        "must": [{"match": {"content": "merge"}}],
        "should": [{"match": {"content": "quick"}}],
        "must_not": [{"match": {"content": "zebra"}}],
    }}
    df = r.search_dsl_df(body, k=None)
    phys = _phys(df)
    assert phys.count("FileScan") == 1
    assert phys.count("MapInPandas") == 1
    assert "Sort" not in _opt(df) and "Limit" not in _opt(df)
    # a clause with options falls back to the generic per-leaf compiler
    slow = r.search_dsl_df({"bool": {
        "must": [{"match": {"content": {"query": "merge", "boost": 1.0}}}],
        "should": [{"match": {"content": "quick"}}],
        "must_not": [{"match": {"content": "zebra"}}],
    }}, k=None)
    assert _phys(slow).count("FileScan") > 1


def test_nested_and_geo_shape_are_scan_only(spark, tmp_path):
    """The round-5 filter-context leaves stay whole-stage-codegen
    projections over the docs scan: no UDF, no explode, no join."""
    d = str(tmp_path / "r5")
    docs = [
        ("r", f"{i}", "c", "t", "merge sort quick value",
         [(f"u{i % 3}", i % 5)], float(i % 90) - 45.0, float(i % 180) - 90.0)
        for i in range(30)
    ]
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string,"
            " comments array<struct<author string, stars bigint>>,"
            " lat double, lon double",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    nested = r.nested_df(
        "comments",
        {"bool": {"must": [{"term": {"comments.author": "u1"}},
                           {"range": {"comments.stars": {"gte": 2}}}]}},
    )
    plan = _opt(nested)
    assert "Join" not in plan and "Generate" not in plan  # no explode
    assert "MapInPandas" not in _phys(nested) and "BatchEvalPython" not in _phys(nested)
    shape = r.search_dsl_df(
        {"geo_shape": {"shape": {"type": "Polygon", "coordinates": [
            [[-50.0, -30.0], [50.0, -30.0], [50.0, 30.0], [-50.0, 30.0],
             [-50.0, -30.0]]]}}},
        k=None,
    )
    plan = _opt(shape)
    assert "Join" not in plan and "Sort" not in plan and "Limit" not in plan
    assert "MapInPandas" not in _phys(shape)


def test_body_metric_kinds_one_aggregation_no_window(spark, idx):
    """The round-5 metric kinds (extended_stats / boxplot /
    percentile_ranks / top_metrics size=1 / t_test) all compile to
    aggregate Columns inside the tree's SINGLE aggregation — no
    WindowExec (max_by carries top_metrics), no join, no second scan."""
    r = IndexReader(spark, idx)
    phys = _phys(r.aggs_dsl_df({
        "h": {"histogram": {"field": "dl", "interval": 50},
              "aggs": {
                  "es": {"extended_stats": {"field": "dl"}},
                  "bx": {"boxplot": {"field": "dl"}},
                  "pr": {"percentile_ranks": {"field": "dl",
                                              "values": [10.0]}},
                  "tm": {"top_metrics": {"metrics": [{"field": "dl"}],
                                         "sort": {"req": "desc"}}},
                  "tt": {"t_test": {"field": "dl", "group_field": "lang",
                                    "a": "t", "b": "x"}},
              }}}))
    assert "Window" not in phys
    assert "CartesianProduct" not in phys
    assert "Join" not in phys


def test_body_pipeline_kinds_one_window_over_buckets(spark, idx):
    """derivative + cumulative_sum + moving_fn + serial_diff +
    bucket_script all ride ONE WindowExec over the bucket list (the
    typed pipeline_aggs contract) — the window never sees raw rows."""
    r = IndexReader(spark, idx)
    df = r.aggs_dsl_df({
        "h": {"histogram": {"field": "dl", "interval": 50},
              "aggs": {
                  "t": {"sum": {"field": "dl"}},
                  "d": {"derivative": {"buckets_path": "t"}},
                  "c": {"cumulative_sum": {"buckets_path": "_count"}},
                  "m": {"moving_fn": {
                      "buckets_path": "t", "window": 2,
                      "script": "MovingFunctions.unweightedAvg(values)"}},
                  "s": {"serial_diff": {"buckets_path": "t"}},
                  "r": {"bucket_script": {
                      "buckets_path": {"a": "t", "b": "_count"},
                      "script": "params.a / params.b"}},
              }}})
    phys = _phys(df)
    # Spark materializes one Window node per distinct frame spec, but
    # all share one partitioning — the scale contract is the SHUFFLE
    # count: the bucket aggregation's partial/final pair plus at most
    # one exchange feeding the window chain, never a per-kind shuffle
    # and never a window over raw rows (the windows sit above the
    # HashAggregate output).
    assert phys.count("Window") <= 4
    assert phys.count("Exchange") <= 3
    assert "CartesianProduct" not in phys


@pytest.fixture(scope="module")
def nidx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ps") / "nidx")
    docs = spark.range(40).select(
        F.lit("r").alias("repo"),
        F.col("id").cast("string").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("t").alias("lang"),
        F.lit("merge sort quick value").alias("content"),
        F.expr(
            "transform(sequence(0, cast(id % 3 as int)), j -> named_struct("
            "'author', concat('u', cast((id + j) % 3 as string)), "
            "'stars', cast((id * 7 + j) % 5 as bigint)))"
        ).alias("comments"),
    )
    IndexBuilder(spark, d, partitions=2).build(docs, resume=False)
    return d


def test_nested_agg_one_explode_no_join(spark, nidx):
    """The nested aggregation context switch is ONE Generate (explode)
    feeding the tree's single aggregation — no join, no cartesian, no
    second docs scan; reverse_nested's distinct-parent count rides the
    same aggregation (its two-phase pair + the bucket-list windows are
    the only exchanges, never one per kind)."""
    r = IndexReader(spark, nidx)
    phys = _phys(r.aggs_dsl_df({
        "cn": {"nested": {"path": "comments"}, "aggs": {
            "by": {"terms": {"field": "comments.author", "size": 10},
                   "aggs": {
                       "p": {"reverse_nested": {}},
                       "m": {"avg": {"field": "comments.stars"}},
                   }}}}}))
    assert phys.count("Generate") == 1
    assert "Join" not in phys and "CartesianProduct" not in phys
    assert phys.count("Exchange") <= 4


def test_dense_histogram_broadcast_series(spark, nidx):
    """The empty-bucket fill generates its series from a TWO-SCALAR
    bounds row (one Generate over the sequence) and joins it back as a
    broadcast — never a shuffled join, never a window over raw rows;
    the pipeline window still sits above the bucket list."""
    r = IndexReader(spark, nidx)
    phys = _phys(r.aggs_dsl_df({
        "h": {"histogram": {"field": "dl", "interval": 2,
                            "min_doc_count": 0},
              "aggs": {"c": {"cumulative_sum":
                             {"buckets_path": "_count"}}}}}))
    assert phys.count("Generate") == 1
    assert phys.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in phys and "CartesianProduct" not in phys
    assert phys.count("Exchange") <= 3


def test_cross_fields_single_decode_filter_pushed(spark, fidx):
    """cross_fields: ONE postings scan over the field-namespaced term
    variants (filter pushed to parquet), one vectorized decode, one
    TakeOrdered cut — never a scan per field or per token."""
    r = IndexReader(spark, fidx)
    phys = _phys(r.search_cross_fields_df("merge quick", k=5,
                                          tie_breaker=0.3))
    assert phys.count("MapInPandas") == 1
    assert phys.count("FileScan") == 1
    assert "TakeOrderedAndProject" in phys
    assert "PushedFilters: [In(term" in phys


def test_percolate_leaf_scan_only_codegen(spark, tmp_path):
    """The percolate DSL leaf is ONE docs-table scan with the stored
    query tokenized by the pure-Catalyst tokenizer: no postings read, no
    join, no shuffle, no sort, no Python — percolation cost stays
    O(stored queries) at any corpus scale."""
    d = str(tmp_path / "perc")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(
            [("r", f"{i}", "c", "t", "merge sort", f"q{i % 4} merge")
             for i in range(30)],
            "repo string, path string, commit string, lang string,"
            " content string, stored_query string",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    df = r.search_dsl_df(
        {"percolate": {"field": "stored_query",
                       "document": "merge q1 value",
                       "minimum_should_match": "100%"}},
        k=None,
    )
    phys = _phys(df)
    assert phys.count("FileScan") == 1
    assert "Exchange" not in phys and "Join" not in phys
    assert "Sort" not in phys and "TakeOrdered" not in phys
    assert "MapInPandas" not in phys and "BatchEvalPython" not in phys


def test_children_agg_semi_join_no_cartesian(spark, idx):
    """The children/parent context switch is ONE left-semi join on the
    join key — never a cartesian product, never a forced broadcast of
    the corpus side; the subtree still compiles to the single groupBy."""
    r = IndexReader(spark, idx)
    df = r.aggs_dsl_df(
        {"kids": {"children": {}, "aggs": {
            "by_parent": {"terms": {"field": "parent", "size": 10}}}}},
        query={"term": {"content": "merge"}},
    )
    phys = _phys(df)
    assert "CartesianProduct" not in phys
    assert "LeftSemi" in phys
    plan = _opt(df)
    assert plan.count("Aggregate") <= 3  # partial/final of the ONE groupBy


def test_flat_bool_with_filter_stays_fast(spark, idx):
    """A flat bool WITH metadata filter clauses still routes through the
    one-scan kernel: exactly ONE postings FileScan (the filters add a
    docs scan, never a second postings decode), and scores are
    byte-identical to the generic per-leaf compiler (filter context
    never scores)."""
    r = IndexReader(spark, idx)
    body = {"bool": {
        "must": [{"match": {"content": "merge"}}],
        "filter": [{"range": {"req": {"gte": 1}}},
                   {"exists": {"field": "parent"}}],
        "must_not": [{"match": {"content": "zebra"}}],
    }}
    df = r.search_dsl_df(body, k=None)
    phys = _phys(df)
    assert phys.count("MapInPandas") == 1  # one postings decode
    # generic compiler (forced via an explicit msm, which bails the fast
    # path without changing must-only semantics) agrees exactly
    slow_body = {"bool": dict(body["bool"], minimum_should_match=0)}
    slow = r.search_dsl_df(slow_body, k=None)
    fast_rows = {tuple(x) for x in df.collect()}
    slow_rows = {tuple(x) for x in slow.collect()}
    assert fast_rows == slow_rows and fast_rows


def test_flat_bool_should_filter_no_must_falls_back(spark, idx):
    """should+filter WITHOUT must: ES defaults minimum_should_match to 0
    when a filter clause exists, so docs matching only the filter
    qualify at score 0 — the one-scan kernel cannot express that, so
    the fast path must fall back to the generic compiler (regression
    guard for the round-5 fast-path widening)."""
    r = IndexReader(spark, idx)
    body = {"bool": {
        "should": [{"match": {"content": "zebra"}}],   # matches nothing
        "filter": [{"range": {"req": {"gte": 1}}}],
    }}
    out = r.search_dsl_df(body, k=None)
    # every doc passes the filter; none matches the should -> ALL docs
    # at score 0 (the ES contract), not the empty set
    rows = out.collect()
    assert len(rows) == len(DOCS)
    assert {x["score"] for x in rows} == {0.0}
