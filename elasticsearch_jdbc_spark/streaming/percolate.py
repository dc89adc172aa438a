"""Streaming percolation — continuous reverse search over an ingest
stream.

The percolator's natural habitat is alerting: a registered-query set
("notify me when a doc mentioning X arrives") evaluated against every
NEW document as it streams in, long before anything reaches an index.
The reference serves this via ES 2.x percolation on freshly imported
rows (README.md's percolation surface); here it compiles to a STATELESS
whole-stage-codegen projection, so the same operator runs identically on
a streaming DataFrame (any trigger, no watermark, no state store) and on
a batch DataFrame (the tests' parity oracle — IndexReader.percolate_df
over the same rows must agree exactly).

Shape: the query set is tokenized ONCE on the driver (a percolator
carries rules, not data — bytes, the broadcast-side contract of
percolate_df); each document tokenizes JVM-side via the codegen
tokenizer (functions.tokenizer.tokens_col — bit-identical stream to the
indexing path) and intersects with each query's literal term array. One
explode over a per-row literal-built match array emits (doc, query_id,
matched) alert rows. Cost is O(rows x queries) comparisons inside
codegen — no shuffle, no join, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_py, tokens_col


def _query_rows(queries, min_should_match) -> list[tuple[int, list, int]]:
    """[(query_id, distinct_terms, required)] — the percolate_df query
    map, resolved driver-side through THE canonical msm rule
    (IndexReader._mlt_min_match — shared with percolate_df and
    grid-tested against the DSL leaf's Column twin), so one registered
    rule fires on the same documents on every percolate surface."""
    from ..index.query import IndexReader

    if isinstance(queries, dict):
        queries = list(queries.items())
    out = []
    for q in queries:
        qid, text, msm = (*q, min_should_match)[:3]
        terms = sorted(set(tokenize_py(text)))
        if not terms:
            continue
        req = IndexReader._mlt_min_match(msm, len(terms))
        out.append((int(qid), terms, req))
    return out


def stream_percolate(
    docs: DataFrame,
    queries,
    text_col: str = "content",
    min_should_match=1,
) -> DataFrame:
    """Match every incoming document against the registered-query set:
    returns the input rows exploded to one ALERT row per (doc, matching
    query), with `query_id` and `matched` (distinct matched terms)
    appended — the percolate_df output contract on a stream.

    `queries` is [(query_id, text)] (or dict, or (id, text, msm)
    triples); a query matches when >= msm of its DISTINCT terms occur in
    the document's token set. Stateless map-only plan: safe under any
    trigger, restarts are exactly-once from the sink's checkpoint alone,
    and the operator applies unchanged to batch DataFrames."""
    qrows = _query_rows(queries, min_should_match)
    if not qrows:
        # no usable queries -> no alerts; keep the schema contract.
        # filter(False), not limit(0): limit is unsupported on streaming
        # DataFrames and would throw at plan time
        return (
            docs.withColumn("query_id", F.lit(0))
            .withColumn("matched", F.lit(0))
            .filter(F.lit(False))
        )
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    entries = [
        F.struct(
            F.lit(qid).alias("query_id"),
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(t) for t in terms]))
            ).alias("matched"),
            F.lit(req).alias("req"),
        )
        for qid, terms, req in qrows
    ]
    m = F.explode(F.array(*entries)).alias("_m")
    return (
        docs.select("*", m)
        .filter(F.col("_m.matched") >= F.col("_m.req"))
        .select("*", F.col("_m.query_id"), F.col("_m.matched"))
        .drop("_m")
    )
