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
    windows. Documents with zero tokens yield no rows. A tail start
    landing within `overlap` of the document end is SKIPPED: its window
    would sit entirely inside the previous one — a fully redundant
    training example that inflates token counts and triplicates
    boundary text."""
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
    starts = F.filter(
        F.expr(f"sequence(0, size(toks) - 1, {stride})"),
        lambda st: (st == 0) | (F.size("toks") - st > overlap),
    )
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


def pack_chunks_concat(
    df: DataFrame,
    context_len: int,
    token_col: str = "n_tokens",
    order_cols: tuple = ("doc_id", "chunk_id"),
    buckets: int = 64,
) -> DataFrame:
    """GPT-style sequence packing: conceptually concatenate the token
    streams of all chunks (in `order_cols` order) and cut every
    `context_len` tokens — the classic pretraining packed-dataset
    layout, where an example may straddle a cut.

    Each chunk is assigned the pack its FIRST token falls in
    (pack_id = floor(exclusive-cumsum / context_len)) plus the offset of
    the chunk inside that pack and whether it spills across the cut —
    everything a loader needs to materialize the packed examples.

    Scale shape: fully declarative — one hash-bucket assignment (so the
    running sum never becomes a single global serial chain; each bucket
    is an independent packed stream, the way a 1000-executor job would
    shard a 100 TB corpus anyway) and one window cumsum per bucket =
    ONE shuffle. pack_id is globally unique via (bucket << 40) | seq.
    Deterministic for fixed `buckets`."""
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    from pyspark.sql import Window

    ids = [F.col(c) for c in order_cols]
    bucket = F.pmod(F.xxhash64(*ids), F.lit(buckets)).alias("bucket")
    w = Window.partitionBy("bucket").orderBy(*ids)
    cum_excl = F.coalesce(
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    start = cum_excl.alias("_start")
    out = df.select(*order_cols, token_col, bucket).select(
        "*", start
    )
    local_pack = F.floor(F.col("_start") / F.lit(context_len))
    return out.select(
        *order_cols,
        F.col(token_col).cast("long").alias(token_col),
        F.col("bucket").cast("int").alias("bucket"),
        (
            F.shiftleft(F.col("bucket").cast("long"), 40)
            + local_pack
        ).alias("pack_id"),
        (F.col("_start") % F.lit(context_len)).cast("long").alias("pack_offset"),
        (
            (F.col("_start") % F.lit(context_len)) + F.col(token_col)
            > F.lit(context_len)
        ).alias("spills"),
    )


def pack_chunks_greedy(
    df: DataFrame,
    context_len: int,
    token_col: str = "n_tokens",
    order_cols: tuple = ("doc_id", "chunk_id"),
    buckets: int = 64,
) -> DataFrame:
    """Greedy NEXT-FIT bin packing: walk chunks in `order_cols` order
    and start a new pack whenever the next chunk would overflow
    `context_len` — the no-splitting packing used when every training
    example must stay intact (instruction tuning, contrastive pairs).
    A chunk longer than context_len gets a pack of its own (truncation
    is the caller's policy, not the packer's).

    Scale shape: hash-bucketed like pack_chunks_concat — each bucket
    packs independently inside ONE applyInPandas pass (the running
    reset-on-overflow state is inherently sequential, so the
    parallelism unit is the bucket; 64+ buckets keep every core busy
    and no bucket ever holds more than ~1/buckets of the data).
    Deterministic for fixed `buckets`. Returns the input ids plus
    (bucket, pack_id, pack_offset); pack_id globally unique via
    (bucket << 40) | seq."""
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    import numpy as np
    import pandas as pd

    ids = [F.col(c) for c in order_cols]
    bucket = F.pmod(F.xxhash64(*ids), F.lit(buckets)).alias("bucket")
    base = df.select(*order_cols, token_col, bucket)
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in zip(
            order_cols,
            [dict(base.dtypes)[c] for c in order_cols],
        ))
        + f", {token_col} bigint, bucket int, pack_id bigint, pack_offset bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort").reset_index(
            drop=True
        )
        n = np.asarray(pdf[token_col], dtype=np.int64)
        packs = np.empty(len(n), dtype=np.int64)
        offs = np.empty(len(n), dtype=np.int64)
        pid, fill = 0, 0
        for i, t in enumerate(n):
            if fill and fill + t > context_len:
                pid += 1
                fill = 0
            packs[i] = pid
            offs[i] = fill
            fill += t
        b = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        pdf = pdf.assign(
            **{token_col: n},
            pack_id=(b << 40) + packs,
            pack_offset=offs,
        )
        return pdf[list(order_cols) + [token_col, "bucket", "pack_id", "pack_offset"]]

    return base.groupBy("bucket").applyInPandas(pack, out_schema)
