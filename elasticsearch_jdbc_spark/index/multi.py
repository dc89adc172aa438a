"""Multi-index search — the ES `GET /logs-2015.05.*/_search` surface.

The reference's sink builds date-pattern indexes (`'myindex_'yyyy.MM.dd`,
StandardSink.java:95-123) precisely so consumers can query a period by
name pattern. MultiIndexReader opens every member index matching a glob
under one root and serves the whole IncrementalIndexReader query surface
over their union: each member becomes a virtual segment, so all the
cross-segment machinery — global df/N/avgdl, one-scan grouped search,
msearch, facets, phrase — applies unchanged and scores come out
IDENTICAL to one merged index. (ES itself only approximates cross-index
idf consistency unless callers opt into dfs_query_then_fetch; summing
exact global stats is the stricter contract, and it is free here because
the per-segment readers already expose their term dictionaries.)

Members must be sealed (a single base segment, no deltas, no
tombstones): a member with live mutations has member-relative segment
names its tombstone rows refer to, which the union's namespaced segment
ids could silently mis-mask — so the constructor refuses and says to
compact. Date-pattern members are sealed per period by construction.
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import SparkSession

from .incremental_index import IncrementalIndexReader, _list_segments
from .query import IndexReader
from .storage import LocalFS


class MultiIndexReader(IncrementalIndexReader):
    """Read-only federated reader over the member indexes under `root`
    whose directory names match `pattern` (default `gen=*`, the
    generation layout alias.py writes; pass e.g. `logs_2015.05.*` for
    custom naming). Results carry (segment, doc_id) identity where
    segment is the member's directory name — the `_index` field of an ES
    multi-index hit."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        pattern: str = "gen=*",
        fs=None,
    ):
        self.spark = spark
        self.index_dir = root
        self.fs = fs or LocalFS()
        if not self.fs.isdir(root):
            raise FileNotFoundError(f"no directory at {root}")
        names = sorted(
            d for d in self.fs.listdir(root)
            if fnmatch.fnmatch(d, pattern)
            and self.fs.exists(os.path.join(root, d, "manifest.json"))
        )
        if not names:
            raise FileNotFoundError(
                f"no index matches {pattern!r} under {root}"
            )
        for n in names:
            mdir = os.path.join(root, n)
            if _list_segments(mdir, self.fs) != [""] or self.fs.isdir(
                os.path.join(mdir, "tombstones")
            ):
                raise ValueError(
                    f"member {n!r} has live deltas/tombstones; multi-index "
                    "members must be sealed — compact_to/compact_to_generation "
                    "it first"
                )
        self.segments = names
        self.readers = {
            n: IndexReader(spark, os.path.join(root, n), fs=self.fs)
            for n in names
        }
        r0 = self.readers[names[0]]
        self.k1, self.b = r0.k1, r0.b
        self.fields = r0.manifest.get("fields")
        for n in names[1:]:
            m = self.readers[n].manifest
            if (m["k1"], m["b"], m.get("fields")) != (
                self.k1, self.b, self.fields,
            ):
                raise ValueError(
                    f"member {n!r} has an incompatible index contract "
                    f"(k1/b/fields differ from {names[0]!r}); scores across "
                    "members would not be comparable"
                )
        # sealed members -> no tombstones anywhere; stats are plain sums
        self._tombs_cache = None
        self._tomb_dirs_cache = []
        self.n_docs = sum(r.n_docs for r in self.readers.values())
        self.avgdl = (
            sum(r.n_docs * r.avgdl for r in self.readers.values()) / self.n_docs
            if self.n_docs
            else 0.0
        )

    def _tomb_sources(self) -> list[str]:
        # sealed members: the union has no tombstones by construction, and
        # the root's tombstones dir (if a caller ever wrote one) uses
        # member-relative segment ids this reader must not interpret
        return []

    def search_df_boosted(
        self,
        query: str,
        indices_boost: dict[str, float],
        k: int | None = 10,
        **kw,
    ):
        """ES `indices_boost`: multiply each hit's score by its member
        index's boost before the final cut (hits from a boosted index
        rank higher without touching BM25 stats — the ES contract; e.g.
        recency-weighting date-pattern members). Unknown members keep
        boost 1.0; every named member must exist. The boost map rides as
        one broadcast join over the UNRANKED union match set, then one
        TakeOrdered cut — no extra scan."""
        from pyspark.sql import functions as F

        unknown = sorted(set(indices_boost) - set(self.segments))
        if unknown:
            raise ValueError(
                f"indices_boost names unknown member(s) {unknown} "
                f"(have {self.segments})"
            )
        hits = self.search_df(query, k=None, **kw)
        bmap = self.spark.createDataFrame(
            [(s, float(indices_boost.get(s, 1.0))) for s in self.segments],
            "segment string, _boost double",
        )
        boosted = (
            hits.join(F.broadcast(bmap), "segment")
            .withColumn("score", F.col("score") * F.col("_boost"))
            .drop("_boost")
        )
        if k is None:
            return boosted
        return boosted.orderBy(
            F.desc("score"), F.asc("segment"), F.asc("doc_id")
        ).limit(k)

    # Mutations route through a member index's own IncrementalIndexReader:
    # writing union-level tombstones would use segment ids no member
    # reader resolves, silently un-deleting on the next member-level open.
    def delete_by_query(self, *a, **kw):
        raise ValueError(
            "MultiIndexReader is read-only; open the member index with "
            "IncrementalIndexReader and delete there"
        )

    def update_by_query(self, *a, **kw):
        raise ValueError(
            "MultiIndexReader is read-only; open the member index with "
            "IncrementalIndexReader and update there"
        )
