"""DataFrame-native BM25 scoring over a raw document table, plus the
equivalent ANSI-SQL oracle (DuckDB-runnable) — the driver's correctness
gate for the flagship full-text capability (B11/B12).

This is the same scoring contract as the index path (codec.bm25_weight /
bm25_idf, k1=1.2, b=0.75, Lucene idf) expressed as one declarative plan:
tokenize -> tf -> df -> join query terms -> score -> per-query top-k.
Cross-engine float determinism: every per-term contribution is a fixed
sequence of double ops on integers (exact inputs), and the final per-doc
sum is rounded to 4 digits, far above the 1e-15 reorder noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import word_tokens
from ..functions.tokenizer import tokenize_py

K1 = 1.2
B = 0.75
TOP_K = 10

# The reference query set (fixed, checked in — plays the role of the
# reference's test query workload).
REFERENCE_QUERIES: list[tuple[int, str]] = [
    (0, "fast key merge sort"),
    (1, "window filter stream"),
    (2, "customer order line"),
    (3, "spark batch value"),
    (4, "hash join group row"),
    (5, "slow query scan"),
]


def _query_term_pairs() -> list[tuple[int, str]]:
    pairs = []
    for qid, q in REFERENCE_QUERIES:
        seen = set()
        for t in tokenize_py(q):
            if t not in seen:
                seen.add(t)
                pairs.append((qid, t))
    return pairs


def bm25_topk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE action, one tokenization pass per consumer: corpus stats ride in
    as a broadcast 1-row cross join instead of a driver collect (no
    separate job, no second analysis of the plan)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.select(
        "doc_id", word_tokens("text").alias("toks")
    ).select("doc_id", F.size("toks").alias("dl"), "toks")
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    pairs = _query_term_pairs()
    qterms = sorted({t for _qid, t in pairs})
    # prune to query terms AT the explode — the declarative analogue of
    # reading only the query terms' posting lists; df per term is then a
    # window count over the surviving (term, doc) rows, so tf is computed
    # exactly once (a broadcast of a separate df aggregate would force the
    # whole corpus tf twice)
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(qterms))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
        .withColumn("df", F.count("*").over(W.partitionBy("term")))
    )
    q = spark.createDataFrame(pairs, "query_id int, term string")

    scored = (
        tf.join(F.broadcast(q), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "w",
            F.col("tf")
            / (
                F.col("tf")
                + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("idf") * F.lit(K1 + 1.0) * F.col("w")).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", F.round("score", 4).alias("score"))
    )


def _build_sql() -> str:
    values = ", ".join(f"({qid}, '{t}')" for qid, t in _query_term_pairs())
    return f"""
    WITH q(query_id, term) AS (VALUES {values}),
    tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents
    ),
    flat AS (
      SELECT doc_id, len(toks) AS dl, t.term
      FROM tok, UNNEST(toks) AS t(term)
    ),
    tf AS (
      SELECT term, doc_id, dl, COUNT(*) AS tf FROM flat GROUP BY 1, 2, 3
    ),
    stats AS (
      SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl
      FROM (SELECT doc_id, len(toks) AS dl FROM tok)
    ),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             SUM(
               ln(1.0 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
               * {K1 + 1.0}
               * (tf.tf / (tf.tf + {K1} * ({1.0 - B} + {B} * tf.dl / stats.avgdl)))
             ) AS score
      FROM tf JOIN q USING (term) JOIN dft USING (term), stats
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT query_id, CAST(rank AS INT) AS rank, doc_id, ROUND(score, 4) AS score
    FROM ranked WHERE rank <= {TOP_K}
    """


BM25_SQL = _build_sql()
