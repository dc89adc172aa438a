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
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.tokenizer import tokenize_pandas
from .codec import bm25_weight, varint_encode
from .storage import LocalFS

def tokenized_schema(
    key_fields: list[T.StructField],
    meta_fields: list[T.StructField] = (),
) -> T.StructType:
    """Checkpoint schema for the tokenized table — key columns keep their
    source types (key_cols is configurable, jobspec `key_cols`).
    meta_fields: non-key, non-text source columns carried through to the
    docs table (ES stores arbitrary doc fields; filter context / sort /
    function_score / collapse program against them). Appended LAST so the
    zero-metadata layout is byte-identical to prior indexes."""
    return T.StructType(
        [
            T.StructField("pid", T.IntegerType(), False),
            T.StructField("local_seq", T.LongType(), False),
            *[T.StructField(f.name, f.dataType, f.nullable) for f in key_fields],
            T.StructField("lang", T.StringType(), True),
            T.StructField("sha256", T.StringType(), False),
            T.StructField("dl", T.IntegerType(), False),
            T.StructField("tokens", T.ArrayType(T.StringType()), False),
            *[T.StructField(f.name, f.dataType, f.nullable) for f in meta_fields],
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
        T.StructField("tf_sum", T.LongType(), False),
        # varint position stream (phrase queries): per posting, tf position
        # entries — first absolute, then gaps; empty when the index is
        # built without positions
        T.StructField("positions", T.BinaryType(), True),
    ]
)

TF_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("block_id", T.LongType(), False),
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
        pretokenized: bool = False,
        with_positions: bool = False,
        lang_filter: bool = False,
        fields: list[str] | None = None,
        index_sort: list | None = None,
        fs=None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        # control-plane storage (markers/sidecars/manifest/commit files);
        # the parquet data plane always goes through Spark/pyarrow
        self.fs = fs or LocalFS()
        self.k1, self.b = k1, b
        self.block_size = block_size
        self.key_cols = list(key_cols)
        reserved = {"pid", "local_seq", "doc_id", "dl", "tokens", "sha256"}
        clash = reserved.intersection(self.key_cols)
        if clash:
            raise ValueError(
                f"key_cols {sorted(clash)} collide with reserved index "
                "columns; rename them first (jobspec 'rename', the "
                "column_name_map analogue)"
            )
        self.text_col = text_col
        self.partitions = partitions or spark.sparkContext.defaultParallelism
        # pretokenized: input already carries (sha256, dl, tokens) — the
        # compaction path (IncrementalIndexReader.compact_to) reuses the
        # tokenized checkpoints, skipping re-tokenization entirely
        self.pretokenized = pretokenized
        # with_positions: store per-posting token positions (phrase
        # queries); ~doubles the posting payload, so it is opt-in like
        # disabling _source/positions is in ES mappings
        self.with_positions = with_positions
        # lang_filter: drop per-language code keywords at tokenize time
        # (near-zero idf, large posting volume); the analyzer setting is
        # part of the index contract, so it is recorded in the manifest
        self.lang_filter = lang_filter
        # fields: multi-field indexing (ES multi_match substrate). Each
        # field's tokens are namespaced as "<field>\x1f<token>", so every
        # field gets its own postings and df; query-time boosts weight the
        # per-field term scores (IndexReader.search_fields). Length norm is
        # the doc's TOTAL token count across fields (the blended-norm
        # simplification vs full BM25F per-field norms — documented index
        # contract, recorded in the manifest).
        # with pretokenized=True, fields is a manifest-only declaration:
        # the checkpointed tokens are assumed already field-namespaced
        # (compaction of a fields index re-uses them verbatim)
        # index_sort: ES index.sort / Lucene index sorting — docs within
        # the segment are laid out (and doc_ids assigned) in the order of
        # these metadata columns, key_cols as the final tie-break. Two
        # scale effects: (1) the docs parquet gets monotone row-group
        # min/max on the sort columns, so filter_sql range predicates
        # prune row groups at the scan; (2) doc_id becomes MONOTONE with
        # the sort, so a same-direction-prefix `sort` query orders by the
        # long doc_id instead of the joined metadata (search_sorted_df
        # fast path). Per-segment, exactly Lucene's contract — deltas and
        # compactions inherit it through the manifest. Costs one extra
        # source scan (range partitioning samples bounds), the same
        # index-time price ES pays.
        self.index_sort = None
        if index_sort:
            norm = []
            for s in index_sort:
                c, o = (s, "asc") if isinstance(s, str) else (s[0], s[1])
                if o not in ("asc", "desc"):
                    raise ValueError(f"index_sort order {o!r} not asc/desc")
                if c in reserved or c in self.key_cols:
                    raise ValueError(
                        f"index_sort column {c!r} is reserved or a key "
                        "column (keys are already the tie-break)"
                    )
                norm.append((c, o))
            self.index_sort = norm
        self.fields = list(fields) if fields else None
        if self.fields and not pretokenized:
            missing = [f for f in self.fields if f in self.key_cols]
            if missing:
                raise ValueError(f"fields {missing} collide with key_cols")

    # ---------- phase bookkeeping (reference statefile analogue,
    # StandardContext.writeState, StandardContext.java:240-277) ----------

    def _marker_path(self, phase: str) -> str:
        return os.path.join(self.index_dir, f"_phase_{phase}.json")

    def _phase_done(self, phase: str) -> dict | None:
        p = self._marker_path(phase)
        if self.fs.exists(p):
            return json.loads(self.fs.read_text(p))
        return None

    def _commit_phase(self, phase: str, payload: dict) -> dict:
        payload = {"phase": phase, "status": "done", **payload}
        # write-temp-then-rename via the storage abstraction
        self.fs.write_text(self._marker_path(phase), json.dumps(payload, indent=1))
        return payload

    def _dir_lineage(self, path: str) -> dict:
        """Per-partition lineage from parquet footers: file -> rows/bytes."""
        import pyarrow.parquet as pq

        files = sorted(
            f for f in self.fs.listdir(path) if f.endswith(".parquet")
        )
        parts = {}
        for fn in files:
            fp = os.path.join(path, fn)
            md = pq.read_metadata(fp)
            parts[fn] = {"rows": md.num_rows, "bytes": self.fs.getsize(fp)}
        return parts

    # ---------- phases ----------

    def build(self, df: DataFrame, resume: bool = True) -> dict:
        """Run all phases; with resume=True completed phases are skipped
        (their markers carry the lineage needed by later phases)."""
        self.fs.makedirs(self.index_dir)
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
            "with_positions": self.with_positions,
            "lang_filter": self.lang_filter,
            "fields": self.fields,
            "index_sort": self.index_sort,
            "text_col": self.text_col,
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
        self.fs.write_text(
            os.path.join(self.index_dir, "manifest.json"),
            json.dumps(manifest, indent=1),
        )
        return manifest

    def _phase_ingest(self, df: DataFrame) -> dict:
        """Assign stable identities + tokenize, one pass.

        Mirrors the reference's row->document identity mapping (_id from
        key columns, PlainKeyValueStreamListener.java:205-229) with
        sha256(content) as the per-row ingest invariant.
        """
        t0 = time.time()
        keys = self.key_cols
        # hash partition on the doc key (ONE scan of the source — range
        # partitioning would sample-scan it twice), then sort within
        # partitions: doc_id = offset[hash-partition] + local rank is dense
        # and deterministic in (keys, partitions) — independent of cluster
        # size and input order. sha256 is computed AFTER the shuffle so the
        # (possibly few-task) source scan stays I/O-only.
        pretok = self.pretokenized
        lfilter = self.lang_filter
        fields = self.fields
        if self.index_sort:
            # index sorting: RANGE partition + sort on (sort cols, keys) —
            # doc_id (offset[pid] + local rank, offsets cumulative in pid
            # order) is then the GLOBAL rank in this total order. The
            # composite includes the keys, so ties never straddle
            # partitions nondeterministically; doc_ids are a pure function
            # of the data regardless of where sampling puts the bounds.
            sort_exprs = [
                F.col(c).desc() if o == "desc" else F.col(c).asc()
                for c, o in self.index_sort
            ] + [F.col(k) for k in keys]
            keyed = df.repartitionByRange(
                self.partitions, *sort_exprs
            ).sortWithinPartitions(*sort_exprs)
        else:
            keyed = df.repartition(self.partitions, *[F.col(k) for k in keys]).sortWithinPartitions(*keys)
        if not pretok:
            # multi-field: the ingest invariant hashes the concatenated
            # field contents (RS-separated, deterministic)
            content = (
                F.concat_ws("\x1e", *[F.col(f) for f in fields])
                if fields
                else F.col(self.text_col)
            )
            keyed = keyed.withColumn("sha256", F.sha2(content, 256))
        text_col = self.text_col
        other_cols = [c for c in keyed.columns if c not in (*keys, text_col, "sha256")]
        lang_col = "lang" if "lang" in other_cols else None
        # metadata passthrough: every non-key, non-text, non-reserved
        # source column rides through the tokenized checkpoint into the
        # docs table (ES doc fields — the filter-context / sort /
        # function_score / collapse / geo substrate)
        text_like = set(fields or ()) | {text_col}
        meta_cols = [
            c
            for c in keyed.columns
            if c not in keys
            and c not in text_like
            and c not in ("pid", "local_seq", "doc_id", "dl", "tokens",
                          "sha256", "lang")
        ]
        stats_dir = os.path.join(self.index_dir, "partstats")
        if self.fs.isdir(stats_dir):  # stale sidecars from an aborted run
            self.fs.rmtree(stats_dir)
        self.fs.makedirs(stats_dir)
        fs = self.fs  # picklable; executors write sidecars through it

        def ingest_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import zlib

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            seq = 0
            sum_dl = 0
            crc = 0
            for pdf in batches:
                if pretok:
                    toks = pdf["tokens"]
                elif fields:
                    # per-field tokenize, then namespace as field\x1ftoken
                    langs = pdf[lang_col] if (lfilter and lang_col) else None
                    per_field = [
                        (f, tokenize_pandas(pdf[f], langs, lfilter))
                        for f in fields
                    ]
                    toks = pd.Series(
                        [
                            [
                                f + "\x1f" + t
                                for f, ts in zip(
                                    (pf[0] for pf in per_field), row_lists
                                )
                                for t in ts
                            ]
                            for row_lists in zip(*(pf[1] for pf in per_field))
                        ],
                        index=pdf.index,
                    )
                else:
                    toks = tokenize_pandas(
                        pdf[text_col],
                        pdf[lang_col] if (lfilter and lang_col) else None,
                        lfilter,
                    )
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
                dls = (
                    pdf["dl"].to_numpy().astype(np.int32)
                    if pretok
                    else toks.str.len().to_numpy(dtype=np.int32)
                )
                out["dl"] = dls
                out["tokens"] = toks.to_numpy()
                for m in meta_cols:
                    out[m] = pdf[m].to_numpy()
                seq += len(pdf)
                sum_dl += int(dls.sum())
                crc += int(
                    sum(zlib.crc32(s.encode()) for s in pdf["sha256"])
                )
                yield out
            # per-partition checkpoint sidecar (the reference's statefile,
            # sharded per partition, StandardContext.java:240-277): counts
            # feed doc_id offsets, sums feed corpus stats — no second
            # aggregation job over the tokenized table. Task retries
            # overwrite idempotently (write-temp-then-rename).
            payload = {"pid": pid, "cnt": seq, "sum_dl": sum_dl, "crc": crc}
            fs.write_text(
                os.path.join(stats_dir, f"pid={pid}.json"),
                json.dumps(payload),
                tmp_suffix=str(os.getpid()),
            )

        tokenized_dir = os.path.join(self.index_dir, "tokenized")
        out_schema = tokenized_schema(
            [keyed.schema[k] for k in keys],
            [keyed.schema[m] for m in meta_cols],
        )
        keyed.mapInPandas(ingest_part, out_schema).write.mode("overwrite").parquet(tokenized_dir)

        tok = self.spark.read.parquet(tokenized_dir)
        per_pid = []
        for fn in sorted(self.fs.listdir(stats_dir)):
            if fn.endswith(".json"):
                per_pid.append(
                    json.loads(self.fs.read_text(os.path.join(stats_dir, fn)))
                )
        counts = {r["pid"]: r["cnt"] for r in per_pid}
        # offsets are aligned UP to block_size multiples: doc ids stay
        # unique and partition-contiguous, and no 128-doc posting block ever
        # spans two partitions -> postings encode needs no shuffle (the
        # merge phase re-clusters already-encoded blocks instead).
        bs = self.block_size
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
            acc = ((acc + bs - 1) // bs) * bs
        # docs table: doc_id = offset[pid] + local_seq (broadcast-joined);
        # keeps the tokenized partitioning (no extra shuffle)
        off_df = self.spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "pid int, offset long"
        )
        meta_cols = [
            c
            for c in tok.columns
            if c
            not in ("pid", "local_seq", *self.key_cols, "lang", "sha256",
                    "dl", "tokens")
        ]
        docs = tok.join(F.broadcast(off_df), "pid").select(
            (F.col("offset") + F.col("local_seq")).alias("doc_id"),
            *self.key_cols,
            "lang",
            "sha256",
            "dl",
            *meta_cols,
        )
        docs_dir = os.path.join(self.index_dir, "docs")
        if self.index_sort:
            # physically lay the docs table out in doc_id order (= the
            # index sort order): the parquet read-back above repacked the
            # tokenized files arbitrarily, and monotone per-file/row-group
            # min/max on the sort columns is the whole point — that is
            # what lets a range filter_sql prune row groups at the scan.
            # One extra shuffle of the NARROW docs projection, build-time
            # only (the ES index-time sorting price).
            docs = docs.repartitionByRange(
                self.partitions, F.col("doc_id")
            ).sortWithinPartitions("doc_id")
        docs.write.mode("overwrite").parquet(docs_dir)
        n_rows = int(sum(r["cnt"] for r in per_pid))
        sum_dl = int(sum(r["sum_dl"] or 0 for r in per_pid))
        return self._commit_phase(
            "ingest",
            {
                "n_rows": n_rows,
                "sum_dl": sum_dl,
                "source_fingerprint": int(sum(r["crc"] or 0 for r in per_pid)),
                "offsets": {str(k): v for k, v in offsets.items()},
                "partitions": {
                    "tokenized": self._dir_lineage(tokenized_dir),
                    "docs": self._dir_lineage(docs_dir),
                },
                "wall_s": round(time.time() - t0, 3),
            },
        )

    def _phase_stats(self) -> dict:
        """Corpus stats, derived from the ingest marker (no extra job)."""
        t0 = time.time()
        ing = self._phase_done("ingest")
        n = ing["n_rows"]
        return self._commit_phase(
            "stats",
            {
                "n_docs": n,
                "avgdl": (ing["sum_dl"] / n) if n else 0.0,
                "wall_s": round(time.time() - t0, 3),
            },
        )

    def _phase_postings(self, stats: dict) -> dict:
        """Tokenized docs -> encoded posting segments -> merged layout.

        SHUFFLE-FREE ENCODE: doc ids are contiguous per ingest partition and
        partition offsets are block-aligned, so every (term, 128-doc block)
        group is complete inside one partition — tf counting, sorting and
        varint block encoding all happen partition-locally in one Arrow
        kernel (the reference's analogue: a bulk batch is built entirely
        from the rows the source streams, StandardSink.java:191-228).

        The wide exchange happens AFTER compression, in the merge: encoded
        block rows (~10x smaller than raw tf rows) are range-repartitioned
        by (term, block_id) — a hot term's blocks spread across partitions
        at block granularity, which is the skew defusal — and written
        sorted, so query-time term filters prune parquet files/row-groups.
        """
        t0 = time.time()
        k1, b, bs = self.k1, self.b, self.block_size
        wpos = self.with_positions
        flds = self.fields
        avgdl = stats["avgdl"]
        ing = self._phase_done("ingest")
        offsets = {int(k): v for k, v in ing["offsets"].items()}
        # One task per tokenized file, driven by an explicit file list:
        # Spark's scan would PACK the (small) per-partition files into a
        # handful of read tasks (maxPartitionBytes-sized), capping encode
        # parallelism — and a file SPLIT would let a 128-doc block group
        # straddle tasks. Reading whole files inside the kernel guarantees
        # both full parallelism and block alignment; doc_id = offset[pid] +
        # local_seq is computed in the kernel, so no join/shuffle at all.
        tokenized_dir = os.path.join(self.index_dir, "tokenized")
        files = sorted(
            os.path.join(tokenized_dir, f)
            for f in self.fs.listdir(tokenized_dir)
            if f.endswith(".parquet")
        )
        paths_df = self.spark.createDataFrame(
            [(p,) for p in files], "path string"
        ).repartition(max(1, len(files)))

        def build_segments(batches):
            import pyarrow as pa
            import pyarrow.parquet as pq

            for batch in batches:
                for path in batch.column("path").to_pylist():
                    tbl = pq.read_table(
                        path, columns=["pid", "local_seq", "dl", "tokens"]
                    )
                    if tbl.num_rows == 0:
                        continue
                    pids = pa.compute.unique(tbl.column("pid")).to_pylist()
                    if len(pids) != 1:  # one file == one ingest partition
                        raise ValueError(f"{path}: expected single pid, got {pids}")
                    doc_id = pa.compute.add(
                        tbl.column("local_seq"), offsets[pids[0]]
                    ).cast(pa.int64())
                    tbl = pa.table(
                        {"doc_id": doc_id, "dl": tbl.column("dl"), "tokens": tbl.column("tokens")}
                    )
                    out = _segment_from_tokens(tbl, bs, avgdl, k1, b, wpos, flds)
                    if out is not None:
                        yield out

        segments_dir = os.path.join(self.index_dir, "segments")
        t_seg = time.time()
        paths_df.mapInArrow(build_segments, POSTINGS_SCHEMA).write.mode("overwrite").parquet(segments_dir)
        seg_s = time.time() - t_seg

        # merge: re-cluster the already-encoded blocks into term-range
        # partitions (sort-merge over compressed data)
        t_merge = time.time()
        seg = self.spark.read.parquet(segments_dir)
        postings_dir = os.path.join(self.index_dir, "postings")
        (
            seg.repartitionByRange(self.partitions, "term", "block_id")
            .sortWithinPartitions("term", "block_id")
            .write.mode("overwrite")
            .parquet(postings_dir)
        )
        merge_s = time.time() - t_merge
        # term dictionary (df/cf) aggregated from the tiny block rows —
        # never recomputes the token stream
        t_terms = time.time()
        terms_dir = os.path.join(self.index_dir, "terms")
        (
            self.spark.read.parquet(postings_dir)
            .groupBy("term")
            .agg(F.sum("n").alias("df"), F.sum("tf_sum").alias("cf"))
            .repartition(max(1, self.partitions // 8))
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(terms_dir)
        )
        terms_s = time.time() - t_terms
        terms_lineage = self._dir_lineage(terms_dir)
        n_terms = int(sum(p["rows"] for p in terms_lineage.values()))
        return self._commit_phase(
            "postings",
            {
                "n_terms": n_terms,
                "sub_wall_s": {
                    "segments": round(seg_s, 3),
                    "merge": round(merge_s, 3),
                    "terms": round(terms_s, 3),
                },
                "partitions": {
                    "terms": terms_lineage,
                    "segments": self._dir_lineage(segments_dir),
                    "postings": self._dir_lineage(postings_dir),
                },
                "wall_s": round(time.time() - t0, 3),
            },
        )

    def reset(self):
        """Delete all phase outputs + markers (full rebuild)."""
        if self.fs.isdir(self.index_dir):
            self.fs.rmtree(self.index_dir)
        self.fs.makedirs(self.index_dir)


def _segment_from_tokens(tbl, bs: int, avgdl: float, k1: float, b: float,
                         with_positions: bool = False,
                         fields: list | None = None):
    """One ingest partition's (doc_id, dl, tokens) -> encoded block rows.

    Single fused Arrow/numpy kernel, no per-row Python:
      1. flatten token lists (zero-copy), dictionary-encode terms (C++ hash)
      2. per-(doc, term) tf via one np.unique over packed int keys
      3. lexsort by (lexicographic term rank, block, doc)
      4. per-(term, block) groups: ufunc.reduceat aggregates + varint
         streams sliced into zero-copy Arrow binary arrays (slices are
         contiguous because every group's gap stream starts with a 0).
      5. optional positions: the token stream re-sorted by (term, block,
         doc, position) aligns 1:1 with the posting order, so each
         posting's tf position entries are a contiguous run — gap-encoded
         (first absolute), sliced per (term, block) group.
    """
    import pyarrow as pa

    tokens = tbl.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    flat = tokens.flatten()
    if len(flat) == 0:
        return None
    lens = pa.compute.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    denc = flat.dictionary_encode()
    codes0 = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = denc.dictionary
    nv = len(vocab)
    doc_id = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    dl_col = tbl.column("dl").to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(doc_id)), lens)

    # per-(doc, term) tf in one sort
    key = doc_idx * nv + codes0
    uk, counts = np.unique(key, return_counts=True)
    g_doc = (uk // nv).astype(np.int64)
    g_code = (uk % nv).astype(np.int64)
    docs = doc_id[g_doc]
    dls = dl_col[g_doc].astype(np.int64)
    tfs = counts.astype(np.int64)
    blks = docs // bs

    # order groups by lexicographic term, then block, then doc
    vorder = pa.compute.sort_indices(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    vrank = np.empty_like(vorder)
    vrank[vorder] = np.arange(nv)
    order = np.lexsort((docs, blks, vrank[g_code]))
    codes, blks, docs, tfs, dls = g_code[order], blks[order], docs[order], tfs[order], dls[order]
    n = len(codes)

    new_grp = np.ones(n, bool)
    new_grp[1:] = (codes[1:] != codes[:-1]) | (blks[1:] != blks[:-1])
    starts = np.flatnonzero(new_grp)
    ends = np.concatenate((starts[1:], [n]))

    gaps = np.zeros(n, np.uint64)
    np.subtract(docs[1:], docs[:-1], out=gaps[1:], casting="unsafe")
    gaps[starts] = 0

    weights = bm25_weight(tfs, dls, avgdl, k1, b)

    def binary_col(values: np.ndarray, seg_ends: np.ndarray) -> pa.Array:
        """Varint-encode `values` and slice the byte stream at the
        positions given by `seg_ends` (exclusive ends in value space);
        segments tile the stream so offsets are contiguous."""
        data, lens_ = varint_encode(values)
        off = np.zeros(len(seg_ends) + 1, np.int32)
        np.cumsum(lens_, out=lens_)
        off[1:] = lens_[seg_ends - 1]
        return pa.Array.from_buffers(
            pa.binary(), len(seg_ends),
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(data.tobytes())],
        )

    if with_positions:
        if fields:
            # multi-field corpus: positions restart at each field's start
            # (ES keeps an independent position space per field — this is
            # what makes span_first field-relative and span_field_masking
            # alignable; within-field gaps are unchanged, and every
            # position consumer is field-namespaced, so same-field phrase
            # / span / intervals semantics cannot observe the rebase).
            # Tokens are field-major per doc (ingest concatenation order),
            # so (doc, field) runs are contiguous.
            # int32, not int8: a corpus can declare >127 fields, and an
            # overflowing field id would corrupt run detection (or raise
            # under numpy 2.x)
            fid_vocab = np.zeros(nv, np.int32)
            for i, f in enumerate(fields):
                m = pa.compute.starts_with(
                    vocab, f + "\x1f"
                ).to_numpy(zero_copy_only=False)
                fid_vocab[m] = i
            tok_field = fid_vocab[codes0]
            chg = np.ones(len(codes0), bool)
            chg[1:] = (doc_idx[1:] != doc_idx[:-1]) | (
                tok_field[1:] != tok_field[:-1]
            )
            run_starts = np.flatnonzero(chg)
            run_id = np.cumsum(chg) - 1
            tokpos = np.arange(len(codes0), dtype=np.int64) - run_starts[run_id]
        else:
            # token position within its doc
            doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            tokpos = np.arange(len(codes0), dtype=np.int64) - doc_starts[doc_idx]
        tok_doc = doc_id[doc_idx]
        tok_blk = tok_doc // bs
        order2 = np.lexsort((tokpos, tok_doc, tok_blk, vrank[codes0]))
        pos_sorted = tokpos[order2].astype(np.int64)
        # runs of length tf per posting, in posting order; gap-encode with
        # absolute first entry per run
        tf_cum = np.concatenate(([0], np.cumsum(tfs)))
        run_starts = tf_cum[:-1]
        pg = np.zeros(len(pos_sorted), np.uint64)
        np.subtract(pos_sorted[1:], pos_sorted[:-1], out=pg[1:], casting="unsafe")
        pg[run_starts] = pos_sorted[run_starts]
        pos_col = binary_col(pg, tf_cum[ends])
    else:
        pos_col = pa.nulls(len(starts), pa.binary())

    return pa.RecordBatch.from_arrays(
        [
            vocab.take(pa.array(codes[starts])),
            pa.array(blks[starts], pa.int64()),
            pa.array((ends - starts).astype(np.int32), pa.int32()),
            pa.array(docs[starts], pa.int64()),
            binary_col(gaps, ends),
            binary_col(tfs.astype(np.uint64), ends),
            binary_col(dls.astype(np.uint64), ends),
            pa.array(np.maximum.reduceat(tfs, starts).astype(np.int32), pa.int32()),
            pa.array(np.maximum.reduceat(weights, starts), pa.float64()),
            pa.array(np.add.reduceat(tfs, starts), pa.int64()),
            pos_col,
        ],
        names=POSTINGS_SCHEMA.names,
    )
