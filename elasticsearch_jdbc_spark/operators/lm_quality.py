"""In-corpus language-model quality scoring — the CCNet/RefinedWeb-style
LM-perplexity filter signal, computed against the corpus's OWN bigram
model instead of an external LM (no model download, fully reproducible
in SQL).

CCNet buckets documents by LM perplexity (head/middle/tail) to filter
web text; the reference pipeline ships documents to ES and leaves
quality to consumers. Here the signal is first-class: each document's
average negative log-likelihood (cross-entropy, nats/token) under a
StupidBackoff bigram LM with a Laplace unigram floor — the same pinned
LM contract as the phrase suggester (index/phrase_suggest.py), so one
set of semantics serves both surfaces:

  P_uni(w)        = (cf(w) + alpha) / (N + alpha * V)
  P(w_i | w_prev) = c2(prev, w_i) / cf(prev)   if c2 > 0
                    backoff * P_uni(w_i)       otherwise
  P(w_1)          = P_uni(w_1)
  avg_nll(doc)    = -(1/n) * sum_i log P(w_i | w_{i-1})

Low avg_nll = the document looks like the corpus (fluent/typical); high
= unusual (gibberish, wrong language, boilerplate soup). Unlike an
external-LM perplexity, in-corpus scoring needs no vocabulary mapping
and scales with two aggregations.

Scale shape (100 TB): one explode+groupBy builds the unigram table, one
array-transform+groupBy the bigram table (both map-side combinable);
scoring pairs each token with its predecessor INSIDE the token array
(no window, no per-doc shuffle), then two equi-joins against the stats
tables and one final groupBy(doc) — every join key is a term string, so
AQE handles skew, and nothing ever collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_tokens


def lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    backoff: float = 0.4,
) -> DataFrame:
    """(id_col, n_tokens, avg_nll) per document with >= 1 token, avg_nll
    rounded to 4 digits (cross-engine float stability)."""
    toks = df.select(id_col, word_tokens(text_col).alias("toks")).filter(
        F.size("toks") >= 1
    )
    flat = toks.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.explode(
            F.expr(
                "transform(toks, (t, i) -> "
                "struct(t as w, CASE WHEN i = 0 THEN NULL ELSE toks[i - 1] END as pw))"
            )
        ).alias("p"),
    ).select(id_col, "n_tokens", "p.w", "p.pw")

    uni = (
        flat.groupBy("w")
        .agg(F.count("*").alias("cf"))
    )
    stats = uni.agg(
        F.sum("cf").cast("double").alias("n"),
        F.count("*").cast("double").alias("v"),
    )
    big = (
        flat.filter(F.col("pw").isNotNull())
        .groupBy("pw", "w")
        .agg(F.count("*").alias("c2"))
    )

    p_uni = (F.col("cf") + F.lit(alpha)) / (F.col("n") + F.lit(alpha) * F.col("v"))
    scored = (
        flat.join(uni, "w")
        .join(
            uni.select(F.col("w").alias("pw"), F.col("cf").alias("cf_prev")),
            "pw",
            "left",
        )
        .join(big, ["pw", "w"], "left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "lp",
            F.when(F.col("pw").isNull(), F.log(p_uni))
            .when(
                F.col("c2").isNotNull() & (F.col("c2") > 0),
                F.log(F.col("c2") / F.col("cf_prev").cast("double")),
            )
            .otherwise(F.log(F.lit(backoff) * p_uni)),
        )
    )
    return (
        scored.groupBy(id_col, "n_tokens")
        .agg(F.round(-F.sum("lp") / F.col("n_tokens"), 4).alias("avg_nll"))
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "avg_nll",
        )
    )
