"""ES Ranking Evaluation API (`_rank_eval`) analogue: score a query set's
ranked results against a table of relevance judgments, producing the
standard IR metrics per query — precision@k, recall@k, MRR, DCG@k and
NDCG@k — in one declarative plan over the (tiny) queries x k hit
relation.

The reference feeds indexes whose owners tune queries against judgment
lists exactly this way (the ES side of the pipeline); here the ranked
run comes from the engine's own batch search path (`msearch_df` — one
postings scan for the whole query set), and the metric layer is pure
DataFrame algebra usable over ANY (query_id, *id, score) relation, so a
harness can evaluate an external run too.

Metric contract (the ES rank_eval definitions):
  precision@k  relevant_retrieved / retrieved  (unrated docs count as
               irrelevant; retrieved = hits returned, <= k)
  recall@k     relevant_retrieved / total_relevant (0 when the judgment
               list has no relevant docs)
  mrr          1 / rank of the first relevant hit, else 0
  dcg@k        sum (2^rating - 1) / log2(rank + 1)
  ndcg@k       dcg@k / ideal dcg@k over the judgment list, else 0
"relevant" means rating >= relevant_min. Every requested query gets a
row, hits or not. All relations involved are queries x k sized — the
corpus-scale work happened inside the search that produced the run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def rank_eval_metrics(
    ranked: DataFrame,
    ratings: DataFrame,
    k: int = 10,
    relevant_min: int = 1,
    query_ids: list | None = None,
) -> DataFrame:
    """Metric layer: `ranked` is (query_id, *id_cols, score) — any run;
    `ratings` is (query_id, *id_cols, rating). Ranks are (re)assigned
    deterministically as row_number over (score desc, id_cols asc), then
    cut at k; the ideal ordering uses the same tie-break so ndcg is
    engine-order-independent."""
    id_cols = [c for c in ranked.columns if c not in ("query_id", "score")]
    if not id_cols:
        raise ValueError("ranked needs identity columns besides query_id/score")
    rw = W.partitionBy("query_id").orderBy(
        F.desc("score"), *[F.asc(c) for c in id_cols]
    )
    hits = (
        ranked.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .join(ratings.select("query_id", *id_cols, "rating"),
              ["query_id", *id_cols], "left")
        .withColumn("rating", F.coalesce(F.col("rating"), F.lit(0)))
        .withColumn("rel", (F.col("rating") >= relevant_min).cast("int"))
    )
    log2 = F.log(F.lit(2.0))
    per = hits.groupBy("query_id").agg(
        F.count("*").alias("retrieved"),
        F.sum("rel").alias("relevant_retrieved"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rating")) - F.lit(1.0))
            / (F.log(F.col("rank") + F.lit(1.0)) / log2)
        ).alias("dcg"),
    )
    iw = W.partitionBy("query_id").orderBy(
        F.desc("rating"), *[F.asc(c) for c in id_cols]
    )
    ideal = (
        ratings.withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rating")) - F.lit(1.0))
                / (F.log(F.col("irank") + F.lit(1.0)) / log2)
            ).alias("idcg")
        )
    )
    totals = (
        ratings.filter(F.col("rating") >= relevant_min)
        .groupBy("query_id")
        .agg(F.count("*").alias("total_relevant"))
    )
    # the evaluated query set: explicit (a query with no hits AND no
    # judgments still reports all-zero metrics), else everything either
    # side mentions
    if query_ids is not None:
        qid_type = ranked.schema["query_id"].dataType.simpleString()
        qids = ranked.sparkSession.createDataFrame(
            [(q,) for q in query_ids], f"query_id {qid_type}"
        )
    else:
        qids = ranked.select("query_id").union(
            ratings.select("query_id")
        ).distinct()
    return (
        qids.join(per, "query_id", "left")
        .join(ideal, "query_id", "left")
        .join(totals, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(
                F.col("relevant_retrieved") / F.col("retrieved"), F.lit(0.0)
            ).alias("precision"),
            F.coalesce(
                F.col("relevant_retrieved") / F.col("total_relevant"), F.lit(0.0)
            ).alias("recall"),
            F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)).alias("mrr"),
            F.coalesce(F.col("dcg"), F.lit(0.0)).alias("dcg"),
            F.coalesce(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")),
                F.lit(0.0),
            ).alias("ndcg"),
        )
    )


def rank_eval_df(
    reader,
    queries: list[str],
    ratings: DataFrame,
    k: int = 10,
    relevant_min: int = 1,
    min_should_match: int = 1,
    boosts: dict[str, float] | None = None,
    filter_sql: str | None = None,
) -> DataFrame:
    """Evaluate `queries` (query_id = list position, the msearch
    convention) on an index reader — base or incremental, whose identity
    columns the ratings table must match ((doc_id) resp. (segment,
    doc_id)). The whole query set runs as ONE msearch job."""
    ranked = reader.msearch_df(
        queries, k=k, min_should_match=min_should_match,
        boosts=boosts, filter_sql=filter_sql,
    )
    return rank_eval_metrics(
        ranked, ratings, k=k, relevant_min=relevant_min,
        query_ids=list(range(len(queries))),
    )
