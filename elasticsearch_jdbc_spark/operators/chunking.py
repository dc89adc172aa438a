"""Document chunking — context-window splitting for training pipelines.

Pretraining/fine-tuning data prep slices long documents into
token-budgeted windows with overlap (so no training example straddles a
context boundary and boundary content appears in two windows). The
contract, pinned for SQL reproducibility:

  tokens    whitespace split (the token-budget proxy; byte-exact
            reconstruction is ' '.join of the window)
  windows   starts at 0, stride = max_tokens - overlap, last window may
            be short, every token appears in >= 1 window, consecutive
            windows share exactly `overlap` tokens (except a short tail)
  output    (id, chunk_id 0-based, n_tokens, chunk)

Scale shape: one whole-stage-codegen projection — split -> sequence of
starts -> per-start array slice -> posexplode. No shuffle, no UDF; a
100 TB corpus chunks at scan speed, and the explode fans each doc into
its windows inside the same task that read it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Slice each document's whitespace-token stream into windows of
    `max_tokens` with `overlap` tokens shared between consecutive
    windows. Documents with zero tokens yield no rows."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < max_tokens, got {overlap}"
        )
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    base = df.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") >= 1
    )
    starts = F.expr(f"sequence(0, size(toks) - 1, {stride})")
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.least(F.size("toks") - s, F.lit(max_tokens)).alias("n_tokens"),
            F.concat_ws(
                " ", F.slice("toks", s + 1, max_tokens)
            ).alias("chunk"),
        ),
    )
    return base.select(
        id_col, F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
        F.col("c.chunk").alias("chunk"),
    )
