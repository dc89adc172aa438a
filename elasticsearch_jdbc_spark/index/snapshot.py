"""Snapshot / restore — the ES `_snapshot` repository API.

The reference's operators back up the Elasticsearch indexes it feeds via
snapshot repositories; the engine-native analogue copies a COMMITTED
view of an index tree into a repository directory and restores it to a
fresh location:

  <repo>/snap=<name>/files/<relpath>   copied index files
  <repo>/snap=<name>/snapshot.json     manifest, written LAST — a
                                       snapshot without it is invisible
                                       (crash-consistent, like every
                                       other commit point in the engine)

Consistency: the segment list is read from the index's commit point
(segments.json / manifest presence) FIRST, and only committed segments
copy — a delta landing mid-snapshot is simply not part of the snapshot,
exactly like ES snapshotting a Lucene commit. Segment files are
immutable once committed (write-temp-then-rename everywhere), so the
copied bytes are internally consistent. Live tombstone batches are
included; run snapshots outside heavy delete traffic or accept that a
tombstone batch committing mid-copy lands in the next snapshot instead.

All I/O goes through the storage abstraction (copy_file = temp+rename
locally, a server-side copy on object stores). At object-store scale
the per-file copy parallelizes trivially and segment immutability makes
snapshots naturally incremental — a dedup layer keyed on content hash
is the upgrade path, not a semantic change.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from .incremental_index import _list_segments
from .storage import LocalFS


def _walk_files(fs, base: str, rel: str = "") -> list[str]:
    """Relative file paths under base, via the fs abstraction."""
    out = []
    cur = os.path.join(base, rel) if rel else base
    for name in sorted(fs.listdir(cur)):
        r = os.path.join(rel, name) if rel else name
        p = os.path.join(base, r)
        if fs.isdir(p):
            out.extend(_walk_files(fs, base, r))
        else:
            out.append(r)
    return out


def _snap_dir(repo_dir: str, name: str) -> str:
    return os.path.join(repo_dir, f"snap={name}")


def _commit_rank(r: str) -> int:
    """Restore copy order: data files (0) < per-segment manifests (1) <
    the base manifest (2) < segments.json (3) — every commit-point file
    lands only after the data it governs."""
    if r == "segments.json":
        return 3
    if r == "manifest.json":
        return 2
    if os.path.basename(r) == "manifest.json":
        return 1
    return 0


def create_snapshot(
    index_dir: str, repo_dir: str, name: str, fs=None
) -> dict:
    """Copy the committed view of the index at `index_dir` into the
    repository as snapshot `name`. Returns the snapshot manifest."""
    fs = fs or LocalFS()
    sdir = _snap_dir(repo_dir, name)
    if fs.exists(os.path.join(sdir, "snapshot.json")):
        raise FileExistsError(f"snapshot {name!r} already exists in {repo_dir}")
    segments = _list_segments(index_dir, fs)
    if not segments:
        raise FileNotFoundError(f"no committed index at {index_dir}")
    # the committed tree: base files (skipping delta dirs not in the
    # commit point), committed delta segments, live tombstone batches
    skip_roots = set()
    for d in fs.listdir(index_dir):
        if d.startswith("delta=") and d not in segments:
            skip_roots.add(d)
    rels = []
    for r in _walk_files(fs, index_dir):
        top = r.split(os.sep, 1)[0]
        if top in skip_roots:
            continue
        parts = r.split(os.sep)
        if len(parts) > 1 and parts[-2].startswith(".staging-"):
            # an unpublished tombstone batch is not part of any commit
            continue
        if r == "segments.json":
            # the LIVE file may change mid-copy (a delta committing) and
            # would then reference segments this snapshot excluded — the
            # pinned list from the start of the snapshot is written
            # below instead
            continue
        rels.append(r)
    files = []
    for r in rels:
        src = os.path.join(index_dir, r)
        fs.copy_file(src, os.path.join(sdir, "files", r))
        files.append({"path": r, "size": fs.getsize(src)})
    if fs.exists(os.path.join(index_dir, "segments.json")):
        # re-synthesize the commit point from the PINNED segment list
        pinned = json.dumps({"segments": segments})
        fs.write_text(
            os.path.join(sdir, "files", "segments.json"), pinned, ".tmp"
        )
        files.append({"path": "segments.json", "size": len(pinned)})
    manifest = {
        "name": name,
        "source": index_dir,
        "segments": segments,
        "n_files": len(files),
        "total_bytes": sum(f["size"] for f in files),
        "files": files,
        "created_utc": _dt.datetime.now(_dt.timezone.utc).isoformat(),
    }
    # visibility commit: manifest last
    fs.write_text(
        os.path.join(sdir, "snapshot.json"), json.dumps(manifest), ".tmp"
    )
    return manifest


def list_snapshots(repo_dir: str, fs=None) -> list[str]:
    """Names of COMPLETE snapshots (manifest present) in the repository."""
    fs = fs or LocalFS()
    if not fs.isdir(repo_dir):
        return []
    return sorted(
        d[len("snap="):]
        for d in fs.listdir(repo_dir)
        if d.startswith("snap=")
        and fs.exists(os.path.join(repo_dir, d, "snapshot.json"))
    )


def delete_snapshot(repo_dir: str, name: str, fs=None) -> None:
    fs = fs or LocalFS()
    fs.rmtree(_snap_dir(repo_dir, name), ignore_errors=True)


def restore_snapshot(
    repo_dir: str, name: str, dest_dir: str, fs=None
) -> dict:
    """Materialize snapshot `name` at `dest_dir` (which must not already
    hold an index — restores never overwrite, like ES refusing to restore
    onto an open index). Returns the snapshot manifest; the restored tree
    opens with IndexReader/IncrementalIndexReader as usual."""
    fs = fs or LocalFS()
    mpath = os.path.join(_snap_dir(repo_dir, name), "snapshot.json")
    if not fs.exists(mpath):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    if fs.exists(os.path.join(dest_dir, "manifest.json")):
        raise FileExistsError(f"an index already exists at {dest_dir}")
    manifest = json.loads(fs.read_text(mpath))
    froot = os.path.join(_snap_dir(repo_dir, name), "files")
    # ALL commit-point files copy after their data: per-segment
    # manifest.json files (a delta manifest landing before its postings
    # would expose a half-copied segment to the directory-scan
    # fallback), then the base manifest, then segments.json very last —
    # a torn restore is invisible to readers, mirroring the builder's
    # own commit protocol
    rels = [f["path"] for f in manifest["files"]]
    rels.sort(key=lambda r: (_commit_rank(r), r))
    for r in rels:
        fs.copy_file(os.path.join(froot, r), os.path.join(dest_dir, r))
    return manifest
