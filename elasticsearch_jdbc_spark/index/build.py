"""Resumable, phase-based inverted-index build.

The Spark-native reimagining of the reference's ingest pipeline
(StandardContext BEFORE_FETCH->FETCH->AFTER_FETCH state machine,
StandardContext.java:160-214, and StandardSink bulk indexing,
StandardSink.java:191-349): rows are folded into identified documents,
tokenized, and turned into compressed posting lists — but the "sink" is our
own index layout instead of Elasticsearch, and every stage is a declarative
DataFrame job.

Index layout on disk (all parquet + a JSON manifest):

    <index_dir>/
      docs/        doc_id, repo, path, commit, lang, sha256, dl   (sorted by doc_id)
      tokenized/   pid, local_seq, repo, path, commit, lang, sha256, dl, tokens
                   (phase checkpoint; doc_id = offset[pid] + local_seq)
      terms/       term, df, cf                                   (sorted by term)
      postings/    term, block_id, n, first_doc, doc_gaps, tfs, dls,
                   max_tf, max_weight                 (sorted by term, block_id)
      _phase_<name>.json   per-phase completion marker + lineage + metrics
      manifest.json        global stats + phase lineage (committed LAST —
                           mirrors the reference's refresh-interval discipline:
                           segments become visible only at manifest commit,
                           StandardSink.java:372-377)

Scale notes (the design target is 10^12 files on a multi-executor cluster):
  * doc_id assignment is a range-partition + partition-local sequence +
    per-partition offset — one shuffle, no global single-partition window.
    IDs depend only on the global (repo,path,commit) order, not on partition
    boundaries, so they are deterministic across cluster sizes.
  * tf aggregation is groupBy(term, doc_id) — Spark's hash aggregate does
    map-side partial aggregation, so shuffle volume is distinct (term,doc)
    pairs, not raw token occurrences.
  * posting encode shuffles on (term, block_id) via repartitionByRange: a
    hot term's blocks spread across MANY partitions at block granularity —
    this is the skew defusal (no single reducer ever sees a whole hot term).
  * postings parquet is written sorted by (term, block_id) within
    range partitions -> tight min/max term stats per file/row-group ->
    query-time term filters prune at the file level.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.tokenizer import tokenize_pandas
from .codec import bm25_weight, varint_encode

TOKENIZED_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType(), False),
        T.StructField("local_seq", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("max_weight", T.DoubleType(), False),
    ]
)


class IndexBuilder:
    """Builds the inverted index. Phases: ingest -> stats -> postings -> commit."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        k1: float = 1.2,
        b: float = 0.75,
        block_size: int = 128,
        key_cols: tuple = ("repo", "path", "commit"),
        text_col: str = "content",
        partitions: int | None = None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.k1, self.b = k1, b
        self.block_size = block_size
        self.key_cols = list(key_cols)
        self.text_col = text_col
        self.partitions = partitions or spark.sparkContext.defaultParallelism

    # ---------- phase bookkeeping (reference statefile analogue,
    # StandardContext.writeState, StandardContext.java:240-277) ----------

    def _marker_path(self, phase: str) -> str:
        return os.path.join(self.index_dir, f"_phase_{phase}.json")

    def _phase_done(self, phase: str) -> dict | None:
        p = self._marker_path(phase)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def _commit_phase(self, phase: str, payload: dict) -> dict:
        payload = {"phase": phase, "status": "done", **payload}
        tmp = self._marker_path(phase) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, self._marker_path(phase))  # write-temp-then-rename
        return payload

    @staticmethod
    def _dir_lineage(path: str) -> dict:
        """Per-partition lineage from parquet footers: file -> rows/bytes."""
        import pyarrow.parquet as pq

        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        parts = {}
        for fn in files:
            fp = os.path.join(path, fn)
            md = pq.read_metadata(fp)
            parts[fn] = {"rows": md.num_rows, "bytes": os.path.getsize(fp)}
        return parts

    # ---------- phases ----------

    def build(self, df: DataFrame, resume: bool = True) -> dict:
        """Run all phases; with resume=True completed phases are skipped
        (their markers carry the lineage needed by later phases)."""
        os.makedirs(self.index_dir, exist_ok=True)
        t0 = time.time()
        ing = self._phase_done("ingest") if resume else None
        if not ing:
            ing = self._phase_ingest(df)
        st = self._phase_done("stats") if resume else None
        if not st:
            st = self._phase_stats()
        po = self._phase_done("postings") if resume else None
        if not po:
            po = self._phase_postings(st)
        manifest = {
            "version": 1,
            "k1": self.k1,
            "b": self.b,
            "block_size": self.block_size,
            "key_cols": self.key_cols,
            "n_docs": st["n_docs"],
            "avgdl": st["avgdl"],
            "n_terms": po["n_terms"],
            "built_wall_s": round(time.time() - t0, 3),
            "phases": {"ingest": ing, "stats": st, "postings": po},
        }
        tmp = os.path.join(self.index_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self.index_dir, "manifest.json"))
        return manifest

    def _phase_ingest(self, df: DataFrame) -> dict:
        """Assign stable identities + tokenize, one pass.

        Mirrors the reference's row->document identity mapping (_id from
        key columns, PlainKeyValueStreamListener.java:205-229) with
        sha256(content) as the per-row ingest invariant.
        """
        t0 = time.time()
        keys = self.key_cols
        keyed = (
            df.withColumn("sha256", F.sha2(F.col(self.text_col), 256))
            .repartitionByRange(self.partitions, *[F.col(k) for k in keys])
            .sortWithinPartitions(*keys)
        )
        text_col = self.text_col
        other_cols = [c for c in keyed.columns if c not in (*keys, text_col, "sha256")]
        lang_col = "lang" if "lang" in other_cols else None

        def ingest_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            seq = 0
            for pdf in batches:
                toks = tokenize_pandas(pdf[text_col])
                out = pd.DataFrame(
                    {
                        "pid": np.full(len(pdf), pid, np.int32),
                        "local_seq": np.arange(seq, seq + len(pdf), dtype=np.int64),
                    }
                )
                for k in keys:
                    out[k] = pdf[k].to_numpy()
                out["lang"] = pdf[lang_col].to_numpy() if lang_col else None
                out["sha256"] = pdf["sha256"].to_numpy()
                out["dl"] = toks.str.len().to_numpy(dtype=np.int32)
                out["tokens"] = toks.to_numpy()
                seq += len(pdf)
                yield out

        tokenized_dir = os.path.join(self.index_dir, "tokenized")
        keyed.mapInPandas(ingest_part, TOKENIZED_SCHEMA).write.mode("overwrite").parquet(tokenized_dir)

        tok = self.spark.read.parquet(tokenized_dir)
        counts = {
            r["pid"]: r["cnt"]
            for r in tok.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        # docs table: doc_id = offset[pid] + local_seq (broadcast-joined)
        off_df = self.spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "pid int, offset long"
        )
        docs = (
            tok.join(F.broadcast(off_df), "pid")
            .select(
                (F.col("offset") + F.col("local_seq")).alias("doc_id"),
                *self.key_cols,
                "lang",
                "sha256",
                "dl",
            )
            .repartitionByRange(max(1, self.partitions // 4), "doc_id")
            .sortWithinPartitions("doc_id")
        )
        docs_dir = os.path.join(self.index_dir, "docs")
        docs.write.mode("overwrite").parquet(docs_dir)
        fp = tok.agg(
            F.count("*").alias("n"), F.sum(F.crc32(F.col("sha256"))).alias("crc")
        ).collect()[0]
        return self._commit_phase(
            "ingest",
            {
                "n_rows": fp["n"],
                "source_fingerprint": int(fp["crc"] or 0),
                "offsets": {str(k): v for k, v in offsets.items()},
                "partitions": {
                    "tokenized": self._dir_lineage(tokenized_dir),
                    "docs": self._dir_lineage(docs_dir),
                },
                "wall_s": round(time.time() - t0, 3),
            },
        )

    def _phase_stats(self) -> dict:
        t0 = time.time()
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        r = docs.agg(
            F.count("*").alias("n"), F.avg(F.col("dl").cast("double")).alias("avgdl")
        ).collect()[0]
        return self._commit_phase(
            "stats",
            {"n_docs": r["n"], "avgdl": float(r["avgdl"] or 0.0), "wall_s": round(time.time() - t0, 3)},
        )

    def _tf_pairs(self) -> DataFrame:
        """(term, doc_id, dl, tf) from the tokenized checkpoint."""
        ing = self._phase_done("ingest")
        offsets = {int(k): v for k, v in ing["offsets"].items()}
        off_df = self.spark.createDataFrame(
            [(p, o) for p, o in offsets.items()], "pid int, offset long"
        )
        tok = self.spark.read.parquet(os.path.join(self.index_dir, "tokenized"))
        return (
            tok.join(F.broadcast(off_df), "pid")
            .select(
                (F.col("offset") + F.col("local_seq")).alias("doc_id"),
                "dl",
                F.explode("tokens").alias("term"),
            )
            # map-side partial aggregation makes this shuffle carry distinct
            # (term, doc) pairs only, not raw token occurrences
            .groupBy("term", "doc_id", "dl")
            .agg(F.count("*").alias("tf"))
        )

    def _phase_postings(self, stats: dict) -> dict:
        t0 = time.time()
        bs, k1, b = self.block_size, self.k1, self.b
        avgdl = stats["avgdl"]
        tf = self._tf_pairs()
        terms_dir = os.path.join(self.index_dir, "terms")
        (
            tf.groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .repartitionByRange(max(1, self.partitions // 4), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(terms_dir)
        )

        blocks = tf.withColumn("block_id", (F.col("doc_id") / bs).cast("long"))
        enc_input = blocks.repartitionByRange(
            self.partitions, "term", "block_id"
        ).sortWithinPartitions("term", "block_id", "doc_id")

        def encode_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            buf = None
            for pdf in batches:
                if buf is not None and len(buf):
                    pdf = pd.concat([buf, pdf], ignore_index=True)
                if not len(pdf):
                    continue
                # hold back the final (possibly incomplete) group
                last_term = pdf["term"].iat[-1]
                last_blk = pdf["block_id"].iat[-1]
                tail_mask = (pdf["term"] == last_term) & (pdf["block_id"] == last_blk)
                # tail rows are contiguous at the end (input sorted)
                n_tail = int(tail_mask.to_numpy()[::-1].cumprod().sum())
                buf = pdf.iloc[len(pdf) - n_tail :]
                head = pdf.iloc[: len(pdf) - n_tail]
                if len(head):
                    yield _encode_groups(head, avgdl, k1, b)
            if buf is not None and len(buf):
                yield _encode_groups(buf, avgdl, k1, b)

        postings_dir = os.path.join(self.index_dir, "postings")
        enc_input.mapInPandas(encode_part, POSTINGS_SCHEMA).write.mode("overwrite").parquet(postings_dir)
        n_terms = self.spark.read.parquet(terms_dir).count()
        return self._commit_phase(
            "postings",
            {
                "n_terms": n_terms,
                "partitions": {
                    "terms": self._dir_lineage(terms_dir),
                    "postings": self._dir_lineage(postings_dir),
                },
                "wall_s": round(time.time() - t0, 3),
            },
        )

    def reset(self):
        """Delete all phase outputs + markers (full rebuild)."""
        if os.path.isdir(self.index_dir):
            shutil.rmtree(self.index_dir)
        os.makedirs(self.index_dir, exist_ok=True)


def _encode_groups(pdf: pd.DataFrame, avgdl: float, k1: float, b: float) -> pd.DataFrame:
    """Encode all complete (term, block_id) groups in a sorted chunk.

    Group detection and varint layout are vectorized; the per-group loop
    only slices precomputed byte arrays.
    """
    terms = pdf["term"].to_numpy()
    blks = pdf["block_id"].to_numpy()
    docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)

    new_grp = np.ones(len(pdf), bool)
    new_grp[1:] = (terms[1:] != terms[:-1]) | (blks[1:] != blks[:-1])
    starts = np.flatnonzero(new_grp)
    ends = np.concatenate((starts[1:], [len(pdf)]))

    # gaps: doc deltas, zeroed at group starts (first doc stored absolutely)
    gaps = np.zeros(len(pdf), np.uint64)
    np.subtract(docs[1:], docs[:-1], out=gaps[1:], casting="unsafe")
    gaps[starts] = 0

    weights = bm25_weight(tfs, dls, avgdl, k1, b)

    gap_bytes, gap_len = varint_encode(gaps)
    tf_bytes, tf_len = varint_encode(tfs.astype(np.uint64))
    dl_bytes, dl_len = varint_encode(dls.astype(np.uint64))
    gap_off = np.concatenate(([0], np.cumsum(gap_len)))
    tf_off = np.concatenate(([0], np.cumsum(tf_len)))
    dl_off = np.concatenate(([0], np.cumsum(dl_len)))
    gap_mv, tf_mv, dl_mv = gap_bytes.tobytes(), tf_bytes.tobytes(), dl_bytes.tobytes()

    rows = {k: [] for k in POSTINGS_SCHEMA.names}
    for s, e in zip(starts.tolist(), ends.tolist()):
        rows["term"].append(terms[s])
        rows["block_id"].append(int(blks[s]))
        rows["n"].append(e - s)
        rows["first_doc"].append(int(docs[s]))
        # skip the zeroed first gap: start at s+1
        rows["doc_gaps"].append(gap_mv[gap_off[s + 1] : gap_off[e]] if e > s + 1 else b"")
        rows["tfs"].append(tf_mv[tf_off[s] : tf_off[e]])
        rows["dls"].append(dl_mv[dl_off[s] : dl_off[e]])
        rows["max_tf"].append(int(tfs[s:e].max()))
        rows["max_weight"].append(float(weights[s:e].max()))
    out = pd.DataFrame(rows)
    out["block_id"] = out["block_id"].astype(np.int64)
    out["n"] = out["n"].astype(np.int32)
    out["first_doc"] = out["first_doc"].astype(np.int64)
    out["max_tf"] = out["max_tf"].astype(np.int32)
    return out
