"""Completion suggester (the ES `completion` field + `_search` suggest
`completion` block): weighted prefix autocomplete over a dictionary of
suggestion inputs.

ES materializes completion fields into an in-memory FST per segment and
answers prefix queries by walking it, ranked by a per-suggestion weight.
The reference feeds such indexes through stock ES (its README mapping
examples define completion-style lookup fields); the Spark-native
analogue replaces the FST with the same trick the term dictionary uses:

  <index>/completions/name=<name>/   parquet sorted GLOBALLY by `input`
                              (repartitionByRange + sortWithinPartitions),
                              so a prefix query is a point-range scan the
                              parquet reader prunes to O(matching
                              row-groups) via min/max stats — the columnar
                              stand-in for an FST prefix walk; one dir per
                              named dictionary (ES indexes may carry
                              several completion fields)
  <index>/completions.json    {name: {input_col, weight_col, n_inputs}}
                              manifest, written LAST through the storage
                              abstraction (temp + rename), so readers
                              never observe a half-built dictionary

Weights follow the ES contract: a caller-named numeric column (the
document's `weight` field), or — when absent — the number of documents
carrying the input (doc-frequency weighting, what ES's older prefix
suggester effectively ranked by). Duplicate inputs dedupe to one
suggestion carrying the MAX weight (ES returns each suggestion text once,
best entry wins) with the smallest contributing doc_id as its example hit.

Fuzzy completion mirrors ES `fuzzy.fuzziness`: the PREFIX may differ from
the dictionary entry's first len(prefix) characters by up to `fuzziness`
edits, with the first `prefix_length` characters required exact (the ES
default 1 keeps the range prune alive — candidates still cut to the
first-char point range before any edit-distance work, all JVM-side via
threshold-capped `levenshtein`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .storage import LocalFS

COMPLETIONS_MANIFEST = "completions.json"


def build_completions(
    spark: SparkSession,
    index_dir: str,
    input_col: str,
    weight_col: str | None = None,
    partitions: int | None = None,
    name: str | None = None,
    fs=None,
) -> dict:
    """Materialize a named completion dictionary from the index's docs
    table (name defaults to input_col; an index may carry several, like
    ES indexes with several completion fields).

    One groupBy over the docs metadata (map-side combinable: max + min),
    then a range-repartition on `input` so the dictionary lands globally
    sorted — the same layout/pruning contract as the term dictionary. At
    10^12 docs the groupBy shuffles only (input, weight, doc_id) triples,
    and distinct inputs are typically orders of magnitude fewer than docs.
    """
    fs = fs or LocalFS()
    name = name or input_col
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    if input_col not in docs.columns:
        raise ValueError(
            f"input_col {input_col!r} not in docs table (have {docs.columns})"
        )
    if weight_col is not None and weight_col not in docs.columns:
        raise ValueError(
            f"weight_col {weight_col!r} not in docs table (have {docs.columns})"
        )
    w = (
        F.max(F.col(weight_col).cast("long")).alias("weight")
        if weight_col
        else F.count("*").alias("weight")
    )
    comp = (
        docs.filter(F.col(input_col).isNotNull())
        .groupBy(F.col(input_col).cast("string").alias("input"))
        .agg(w, F.min("doc_id").alias("doc_id"))
    )
    n_parts = partitions or max(1, comp.rdd.getNumPartitions() // 4)
    out_dir = _dict_dir(index_dir, name)
    (
        comp.repartitionByRange(n_parts, "input")
        .sortWithinPartitions("input")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    import pyarrow.parquet as pq

    n_inputs = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in fs.listdir(out_dir)
        if f.endswith(".parquet")
    )
    entry = {
        "input_col": input_col,
        "weight_col": weight_col,
        "n_inputs": int(n_inputs),
    }
    mpath = os.path.join(index_dir, COMPLETIONS_MANIFEST)
    manifest = json.loads(fs.read_text(mpath)) if fs.exists(mpath) else {}
    manifest[name] = entry
    fs.write_text(mpath, json.dumps(manifest))
    return entry


def _dict_dir(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, "completions", f"name={name}")


def _resolve(index_dir: str, name: str | None, fs) -> str:
    """Validate the dictionary name against the manifest (a lone
    dictionary resolves without naming it)."""
    p = os.path.join(index_dir, COMPLETIONS_MANIFEST)
    if not fs.exists(p):
        raise ValueError(
            f"no completion dictionary under {index_dir} — call "
            "build_completions(spark, index_dir, input_col=...) first"
        )
    manifest = json.loads(fs.read_text(p))
    if name is None:
        if len(manifest) != 1:
            raise ValueError(
                f"index has {sorted(manifest)} completion dictionaries: pass name="
            )
        return next(iter(manifest))
    if name not in manifest:
        raise ValueError(
            f"unknown completion dictionary {name!r} (have {sorted(manifest)})"
        )
    return name


def _prefix_bounds(prefix: str) -> tuple[str, str]:
    """[lo, hi) range covering every string starting with `prefix`."""
    if not prefix:
        raise ValueError("completion prefix must be non-empty")
    return prefix, prefix[:-1] + chr(ord(prefix[-1]) + 1)


def complete_df(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    size: int = 5,
    fuzziness: int = 0,
    prefix_length: int = 1,
    name: str | None = None,
    fs=None,
) -> DataFrame:
    """Distributed completion query: (suggestion, weight, doc_id) ranked
    (weight desc, suggestion asc), limit `size`.

    Exact mode prunes to the [prefix, next) point range (row-group min/max
    on the sorted dictionary). Fuzzy mode prunes on the first
    `prefix_length` characters exact, then keeps entries whose first
    len(prefix) characters are within `fuzziness` edits — threshold-capped
    JVM `levenshtein`, no Python in the plan."""
    fs = fs or LocalFS()
    name = _resolve(index_dir, name, fs)
    d = spark.read.parquet(_dict_dir(index_dir, name))
    if fuzziness < 0 or prefix_length < 0:
        raise ValueError("fuzziness / prefix_length must be >= 0")
    if fuzziness == 0:
        lo, hi = _prefix_bounds(prefix)
        d = d.filter((F.col("input") >= lo) & (F.col("input") < hi))
    else:
        anchor = prefix[:prefix_length]
        if anchor:
            lo, hi = _prefix_bounds(anchor)
            d = d.filter((F.col("input") >= lo) & (F.col("input") < hi))
        head = F.substring("input", 1, len(prefix))
        dist = F.levenshtein(head, F.lit(prefix), fuzziness)
        d = d.filter(
            (F.length("input") >= F.lit(len(prefix) - fuzziness)) & (dist >= 0)
        )
    return (
        d.select(
            F.col("input").alias("suggestion"),
            F.col("weight").cast("long").alias("weight"),
            F.col("doc_id").cast("long").alias("doc_id"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(size)
    )


def complete(
    index_dir: str,
    prefix: str,
    size: int = 5,
    fuzziness: int = 0,
    prefix_length: int = 1,
    name: str | None = None,
    fs=None,
) -> list[dict]:
    """Interactive-tier twin of complete_df (same candidates, same
    ranking — pytest-verified): one pyarrow point-range dictionary read,
    no Spark job. Returns [{"text", "weight", "doc_id"}, ...]."""
    import pyarrow.dataset as ds

    fs = fs or LocalFS()
    name = _resolve(index_dir, name, fs)
    dset = ds.dataset(_dict_dir(index_dir, name), format="parquet")
    anchor = prefix if fuzziness == 0 else prefix[:prefix_length]
    flt = None
    if anchor:
        lo, hi = _prefix_bounds(anchor)
        flt = (ds.field("input") >= lo) & (ds.field("input") < hi)
    t = dset.to_table(filter=flt, columns=["input", "weight", "doc_id"])
    rows = []
    for inp, w, did in zip(
        t.column("input").to_pylist(),
        t.column("weight").to_pylist(),
        t.column("doc_id").to_pylist(),
    ):
        if fuzziness == 0:
            if not inp.startswith(prefix):
                continue
        else:
            if len(inp) < len(prefix) - fuzziness:
                continue
            if _lev(inp[: len(prefix)], prefix) > fuzziness:
                continue
        rows.append({"text": inp, "weight": int(w), "doc_id": int(did)})
    rows.sort(key=lambda r: (-r["weight"], r["text"]))
    return rows[:size]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def live_complete_df(
    reader,
    prefix: str,
    input_col: str,
    weight_col: str | None = None,
    size: int = 5,
    fuzziness: int = 0,
    prefix_length: int = 1,
) -> DataFrame:
    """Completion over an INCREMENTAL index's live view: the dictionary is
    derived on the fly from live_docs() (segments unioned, tombstones
    anti-joined, so upserts suggest as their newest version and deletes
    vanish immediately) — the ES near-real-time suggester contract, where
    in-memory segment FSTs serve fresh docs before a merge.

    The prefix predicate is applied BEFORE the groupBy, so the aggregate
    sees only matching rows (pushes into each segment's docs scan as a
    range/StartsWith filter); cost is O(matching rows), not O(live docs).
    After compaction, build_completions on the compacted dir restores the
    sorted-dictionary fast path."""
    docs = reader.live_docs()
    if input_col not in docs.columns:
        raise ValueError(f"input_col {input_col!r} not in live docs table")
    inp = F.col(input_col).cast("string")
    if fuzziness == 0:
        lo, hi = _prefix_bounds(prefix)
        docs = docs.filter((inp >= lo) & (inp < hi))
    else:
        anchor = prefix[:prefix_length]
        if anchor:
            lo, hi = _prefix_bounds(anchor)
            docs = docs.filter((inp >= lo) & (inp < hi))
        head = F.substring(inp, 1, len(prefix))
        docs = docs.filter(
            (F.length(inp) >= F.lit(len(prefix) - fuzziness))
            & (F.levenshtein(head, F.lit(prefix), fuzziness) >= 0)
        )
    w = (
        F.max(F.col(weight_col).cast("long")).alias("weight")
        if weight_col
        else F.count("*").alias("weight")
    )
    return (
        docs.groupBy(inp.alias("input"))
        .agg(w, F.min("doc_id").alias("doc_id"))
        .select(
            F.col("input").alias("suggestion"),
            F.col("weight").cast("long").alias("weight"),
            F.col("doc_id").cast("long").alias("doc_id"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(size)
    )
