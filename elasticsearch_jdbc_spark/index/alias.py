"""Index generations + alias indirection (blue-green reindex).

The reference's sink resolves date-pattern index names
(`'myindex_'yyyy.MM.dd`, StandardSink.java:95-123) and switches an alias
to the finished index after a build (StandardSink.java:351-398), so
queries always hit the alias while a new generation builds beside the
live one. The Spark-native analogue:

  <root>/gen=<name>/      one complete index (or incremental index tree)
                          per generation — IndexBuilder output, deltas and
                          tombstones included
  <root>/alias.json       {"target": "<name>"} — the ONE control-plane
                          file readers resolve; flipped atomically via
                          storage.write_text (tmp + rename; a single PUT
                          on object stores)

An already-open reader keeps serving its generation (nothing under it is
touched by a flip), matching ES where an alias swap never disturbs
in-flight scrolls; the next `open_alias` resolves the new target. Old
generations are garbage, not state — `drop_generation` removes them once
no reader needs them.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re

from pyspark.sql import SparkSession

from .incremental_index import IncrementalIndexReader
from .query import IndexReader
from .storage import LocalFS

# Joda-style tokens the reference's date patterns use (StandardSink
# resolves them through ES date math; we cover the tokens its README
# examples exercise: year/month/day/hour/minute/second)
_JODA = [
    ("yyyy", "%Y"), ("yy", "%y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"),
]


def resolve_index_name(pattern: str, when: _dt.datetime | None = None) -> str:
    """Resolve a date-pattern index name: single-quoted runs are literal,
    everything else is a Joda-style date pattern — `'myindex_'yyyy.MM.dd`
    with when=2015-05-30 -> `myindex_2015.05.30` (the README.md:1042-1251
    date-pattern example). A pattern with no quotes is all-literal unless
    it contains date tokens."""
    when = when or _dt.datetime.now()

    def fmt(seg: str) -> str:
        if not seg:
            return ""
        out = seg
        for tok, strf in _JODA:
            out = out.replace(tok, strf)
        return when.strftime(out)

    parts = re.split(r"'([^']*)'", pattern)
    # even indices: unquoted (date-pattern) segments; odd: quoted literals
    return "".join(
        seg if i % 2 else fmt(seg) for i, seg in enumerate(parts)
    )


def _alias_path(root: str) -> str:
    return os.path.join(root, "alias.json")


def generation_dir(root: str, name: str) -> str:
    return os.path.join(root, f"gen={name}")


def alias_target(root: str, fs=None) -> str | None:
    """The live generation name, or None if no alias exists yet."""
    fs = fs or LocalFS()
    p = _alias_path(root)
    if not fs.exists(p):
        return None
    return json.loads(fs.read_text(p))["target"]


def flip_alias(root: str, generation: str, fs=None) -> None:
    """Atomically point the alias at `generation` (which must be a
    complete index — its manifest is the completeness witness, written
    last by the builder's commit protocol)."""
    fs = fs or LocalFS()
    gdir = generation_dir(root, generation)
    if not fs.exists(os.path.join(gdir, "manifest.json")):
        raise FileNotFoundError(
            f"generation {generation!r} has no manifest under {gdir}; "
            "refusing to alias an incomplete index"
        )
    fs.makedirs(root)
    fs.write_text(_alias_path(root), json.dumps({"target": generation}))


def list_generations(root: str, fs=None) -> list[str]:
    fs = fs or LocalFS()
    if not fs.isdir(root):
        return []
    return sorted(
        d[len("gen="):] for d in fs.listdir(root) if d.startswith("gen=")
    )


def drop_generation(root: str, name: str, fs=None) -> None:
    """Remove a retired generation's tree. Refuses to drop the alias
    target (the live index)."""
    fs = fs or LocalFS()
    if alias_target(root, fs) == name:
        raise ValueError(f"generation {name!r} is the live alias target")
    fs.rmtree(generation_dir(root, name), ignore_errors=True)


def open_alias(
    spark: SparkSession, root: str, fs=None, incremental: bool = True
):
    """Open the live generation through the alias — the reader every
    query-side consumer should construct. incremental=True (default)
    returns an IncrementalIndexReader (serves deltas + tombstones too);
    False returns the base IndexReader of the generation."""
    fs = fs or LocalFS()
    target = alias_target(root, fs)
    if target is None:
        raise FileNotFoundError(f"no alias at {root}; flip_alias one first")
    gdir = generation_dir(root, target)
    if incremental:
        return IncrementalIndexReader(spark, gdir, fs=fs)
    return IndexReader(spark, gdir, fs=fs)


# ---------- rollover (ES _rollover) ----------

GENERATIONS_META = "generations.json"


def record_generation(root: str, name: str, created_at: float, fs=None) -> None:
    """Record a generation's creation time (the ES index
    `creation_date` setting — the max_age rollover condition's clock).
    Read-modify-write of one small control-plane file; single-writer like
    every alias mutation."""
    fs = fs or LocalFS()
    p = os.path.join(root, GENERATIONS_META)
    meta = json.loads(fs.read_text(p)) if fs.exists(p) else {}
    meta[name] = {"created_at": created_at}
    fs.makedirs(root)
    fs.write_text(p, json.dumps(meta))


def generation_created_at(root: str, name: str, fs=None) -> float | None:
    fs = fs or LocalFS()
    p = os.path.join(root, GENERATIONS_META)
    if not fs.exists(p):
        return None
    return json.loads(fs.read_text(p)).get(name, {}).get("created_at")


def _tree_size(fs, path: str) -> int:
    """Total bytes under a directory via the storage abstraction (the
    max_size rollover condition; ES uses the shard store size)."""
    if not fs.isdir(path):
        return fs.getsize(path) if fs.exists(path) else 0
    total = 0
    for entry in fs.listdir(path):
        total += _tree_size(fs, os.path.join(path, entry))
    return total


def init_generation(
    spark: SparkSession,
    root: str,
    name: str,
    like: str | None = None,
    partitions: int = 2,
    created_at: float | None = None,
    fs=None,
) -> str:
    """Create a new EMPTY generation inheriting the index contract
    (k1/b/block_size/positions/lang_filter/fields/key_cols) from `like`
    (default: the current alias target) — the ES rollover move of
    creating the next write index with the same mappings. Does NOT flip
    the alias. Returns the new generation's dir."""
    import time as _time

    from pyspark.sql import types as T

    from .build import IndexBuilder
    from .incremental_index import (
        _builder_kwargs_from_manifest,
        _segment_manifest,
    )

    fs = fs or LocalFS()
    if name in list_generations(root, fs):
        raise ValueError(f"generation {name!r} already exists under {root}")
    kwargs: dict = {}
    src = like or alias_target(root, fs)
    if src is not None:
        kwargs = _builder_kwargs_from_manifest(
            _segment_manifest(generation_dir(root, src), "", fs)
        )
    keys = list(kwargs.get("key_cols", ("repo", "path", "commit")))
    text_cols = (
        list(kwargs.get("fields") or ())
        or [kwargs.get("text_col", "content")]
    )
    fields = [
        T.StructField(c, T.StringType()) for c in (*keys, "lang", *text_cols)
    ]
    # index-sorted contract: the empty build's repartitionByRange needs
    # the sort columns to RESOLVE, and later generations' docs must
    # union with matching types — take them from the source docs schema
    sort_cols = [c for c, _ in (kwargs.get("index_sort") or ())]
    missing_sort = [c for c in sort_cols if c not in {f.name for f in fields}]
    if missing_sort and src is not None:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_type

        sdocs = os.path.join(generation_dir(root, src), "docs")
        pfile = next(
            f for f in sorted(fs.listdir(sdocs)) if f.endswith(".parquet")
        )
        asch = pq.read_schema(os.path.join(sdocs, pfile))
        for c in missing_sort:
            fields.append(
                T.StructField(c, from_arrow_type(asch.field(c).type))
            )
    schema = T.StructType(fields)
    gdir = generation_dir(root, name)
    IndexBuilder(spark, gdir, partitions=partitions, **kwargs).build(
        spark.createDataFrame([], schema), resume=False
    )
    record_generation(root, name, created_at or _time.time(), fs)
    return gdir


def _next_rollover_name(current: str) -> str:
    """ES auto-naming: increment a trailing -NNNNNN counter (added at
    -000001 if absent)."""
    m = re.fullmatch(r"(.*)-(\d{6})", current)
    if m:
        return f"{m.group(1)}-{int(m.group(2)) + 1:06d}"
    return f"{current}-000001"


def rollover(
    spark: SparkSession,
    root: str,
    max_docs: int | None = None,
    max_size_bytes: int | None = None,
    max_age_s: float | None = None,
    new_name: str | None = None,
    now: float | None = None,
    dry_run: bool = False,
    fs=None,
) -> dict:
    """ES `_rollover`: evaluate conditions against the alias's live
    generation; when ANY is met, create the next (empty, contract-
    inherited) generation and flip the alias to it, so subsequent
    apply_incremental batches land in the fresh index while readers of
    the old generation keep working — the date-pattern index lifecycle
    (StandardSink.java:95-123 resolves such rolling names) driven by
    size/count/age instead of the calendar.

    Conditions (pass at least one):
      max_docs        live docs (tombstone-corrected, the ES docs.count)
      max_size_bytes  bytes under the generation tree (ES store.size)
      max_age_s       seconds since the generation's recorded
                      creation_date (record_generation /
                      init_generation write it; unrecorded -> unmet)

    Returns {"rolled_over", "old", "new", "conditions": {...}} — the ES
    response shape. dry_run evaluates without acting."""
    import time as _time

    from .incremental_index import IncrementalIndexReader

    fs = fs or LocalFS()
    if max_docs is None and max_size_bytes is None and max_age_s is None:
        raise ValueError("rollover needs at least one condition")
    target = alias_target(root, fs)
    if target is None:
        raise FileNotFoundError(f"no alias at {root}; flip_alias one first")
    gdir = generation_dir(root, target)
    conditions: dict[str, bool] = {}
    if max_docs is not None:
        n_live = IncrementalIndexReader(spark, gdir, fs=fs).n_docs
        conditions[f"max_docs={max_docs}"] = n_live >= max_docs
    if max_size_bytes is not None:
        conditions[f"max_size_bytes={max_size_bytes}"] = (
            _tree_size(fs, gdir) >= max_size_bytes
        )
    if max_age_s is not None:
        created = generation_created_at(root, target, fs)
        conditions[f"max_age_s={max_age_s}"] = (
            created is not None
            and ((now or _time.time()) - created) >= max_age_s
        )
    out = {
        "rolled_over": False,
        "old": target,
        "new": None,
        "conditions": conditions,
        "dry_run": dry_run,
    }
    if not any(conditions.values()) or dry_run:
        return out
    name = new_name or _next_rollover_name(target)
    init_generation(
        spark, root, name, like=target, created_at=now, fs=fs
    )
    flip_alias(root, name, fs)
    out.update(rolled_over=True, new=name)
    return out


def cat_indices(root: str, fs=None) -> list[dict]:
    """ES `_cat/indices` analogue over a generation root: one row per
    generation — docs/terms from its manifest, store size from a
    storage-abstraction tree walk, recorded creation time, and whether
    the alias points at it. Driver-side metadata reads only, no Spark
    job."""
    fs = fs or LocalFS()
    live = alias_target(root, fs)
    out = []
    for name in list_generations(root, fs):
        gdir = generation_dir(root, name)
        mpath = os.path.join(gdir, "manifest.json")
        m = json.loads(fs.read_text(mpath)) if fs.exists(mpath) else {}
        out.append(
            {
                "index": name,
                "docs_count": m.get("n_docs"),
                "terms_count": m.get("n_terms"),
                "store_bytes": _tree_size(fs, gdir),
                "created_at": generation_created_at(root, name, fs),
                "is_alias_target": name == live,
            }
        )
    return out


def compact_to_generation(
    reader: IncrementalIndexReader,
    root: str,
    name: str,
    partitions: int | None = None,
    fs=None,
) -> dict:
    """Blue-green compaction: fold the reader's base + deltas − tombstones
    into a FRESH generation under `root` and flip the alias to it — the
    StandardSink.java:351-398 switch-alias-after-build flow. The old
    generation stays on disk untouched (drop_generation retires it once
    its readers drain). Returns the new generation's build manifest."""
    fs = fs or LocalFS()
    if name in list_generations(root, fs) or fs.isdir(
        generation_dir(root, name)
    ):
        # compact_to's reset() rmtree's its target — without this guard
        # a name collision would silently destroy an existing generation
        # (the LIVE one included: deleting the source mid-read)
        raise ValueError(
            f"generation {name!r} already exists under {root}; compact "
            "to a fresh name, then drop_generation the old one"
        )
    manifest = reader.compact_to(generation_dir(root, name), partitions=partitions)
    flip_alias(root, name, fs)
    return manifest
