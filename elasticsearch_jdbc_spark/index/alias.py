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
    manifest = reader.compact_to(generation_dir(root, name), partitions=partitions)
    flip_alias(root, name, fs)
    return manifest
