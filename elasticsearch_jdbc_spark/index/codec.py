"""Varint / delta posting-list codec, numpy-vectorized.

Posting lists are stored as 128-doc blocks: absolute first docID per block +
LEB128-varint-encoded gaps, with parallel varint arrays for term frequencies
and document lengths, plus per-block max metadata for block-max WAND.

The reference ships documents to Elasticsearch and lets Lucene encode
postings; this codec is our native equivalent. Pure data engineering on top
of numpy — encode/decode never touch per-row Python: bytes are laid out with
<=10 vectorized scatter/gather passes (one per varint byte position).
"""

from __future__ import annotations

import numpy as np


def varint_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array.

    Returns (bytes_array uint8, per-value byte lengths). Vectorized: one
    scatter per byte position (max 10 for 64-bit values).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    # bytes needed: 1 + (#7-bit thresholds <= value); early-exit per band
    nbytes = np.ones(v.shape, np.int64)
    for j in range(7, 64, 7):
        mask = v >= np.uint64(1) << np.uint64(j)
        if not mask.any():
            break
        nbytes += mask
    total = int(nbytes.sum())
    out = np.zeros(total, np.uint8)
    # start offset of each value's byte run
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    maxb = int(nbytes.max())
    for j in range(maxb):
        sel = nbytes > j
        byte = ((v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] > j + 1).astype(np.uint8) << 7
        out[starts[sel] + j] = byte | cont
    return out, nbytes


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte stream back to uint64. Fully vectorized, with a
    fast path for all-single-byte streams (the common case for gap/tf
    streams: hot terms have tiny gaps) — that path is a plain uint8 view."""
    b = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, np.uint64)
    cont = b & 0x80
    if not cont.any():
        return b.astype(np.uint64)
    ends = cont == 0
    n = int(ends.sum())
    # group id per byte: 0-based index of the value this byte belongs to
    group = np.zeros(b.size, np.int64)
    group[1:] = np.cumsum(ends)[:-1]
    end_pos = np.flatnonzero(ends)
    starts = np.concatenate(([0], end_pos[:-1] + 1))
    pos = np.arange(b.size) - starts[group]
    vals = np.zeros(n, np.uint64)
    np.bitwise_or.at(vals, group, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64))
    return vals


def decode_term_blocks(
    first_docs: np.ndarray,
    ns: np.ndarray,
    gaps_cat: bytes,
    tfs_cat: bytes,
    dls_cat: bytes,
):
    """Decode ALL blocks of one term in three vectorized passes.

    Block streams are self-contained (each gap stream starts with a 0 for
    the absolute first doc), so the per-block byte strings can be
    concatenated and decoded as one stream; absolute doc ids come from a
    segmented cumsum (block-relative prefix sums + per-block first_doc).
    Replaces one decode_block call per 128-doc block — ~100x fewer Python
    transitions on hot terms.
    """
    g = varint_decode(gaps_cat).astype(np.int64)
    ns = np.asarray(ns, np.int64)
    starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
    block_idx = np.repeat(np.arange(len(ns)), ns)
    g[starts] = 0
    cs = np.cumsum(g)
    docs = np.asarray(first_docs, np.int64)[block_idx] + (cs - cs[starts][block_idx])
    tfs = varint_decode(tfs_cat).astype(np.int64)
    dls = varint_decode(dls_cat).astype(np.int64)
    return docs, tfs, dls


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> tuple[bytes, bytes, bytes]:
    """Encode one posting block (doc_ids strictly ascending).

    The gap stream holds n entries with a leading 0 (first doc is stored
    absolutely in the block row): one padding byte per block buys contiguous
    per-group slices in the bulk encoder (zero-copy Arrow binary arrays).
    """
    gaps = np.empty(doc_ids.shape, np.uint64)
    gaps[0] = 0
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:], casting="unsafe")
    g, _ = varint_encode(gaps)
    t, _ = varint_encode(tfs.astype(np.uint64))
    d, _ = varint_encode(dls.astype(np.uint64))
    return g.tobytes(), t.tobytes(), d.tobytes()


def decode_block(first_doc: int, n: int, gaps_bin: bytes, tfs_bin: bytes, dls_bin: bytes):
    """Decode one block -> (doc_ids int64, tfs int64, dls int64)."""
    docs = varint_decode(gaps_bin).astype(np.int64)
    docs[0] = first_doc
    np.cumsum(docs, out=docs)
    tfs = varint_decode(tfs_bin).astype(np.int64)
    dls = varint_decode(dls_bin).astype(np.int64)
    return docs, tfs, dls


def decode_positions(tfs: np.ndarray, pos_cat: bytes) -> np.ndarray:
    """Decode a concatenated position stream (per posting: tf entries,
    first absolute then gaps) into absolute positions, aligned with the
    postings' flattened order — segmented cumsum with run lengths = tfs."""
    p = varint_decode(pos_cat).astype(np.int64)
    tfs = np.asarray(tfs, np.int64)
    run_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    run_idx = np.repeat(np.arange(len(tfs)), tfs)
    first = p[run_starts].copy()
    p[run_starts] = 0
    cs = np.cumsum(p)
    return first[run_idx] + (cs - cs[run_starts][run_idx])


def bm25_weight(tf, dl, avgdl: float, k1: float, b: float):
    """Per-posting BM25 weight (idf excluded): tf / (tf + k1*(1-b+b*dl/avgdl)).

    float64 throughout — rank-identity with the oracle depends on it.
    """
    tf = np.asarray(tf, np.float64)
    dl = np.asarray(dl, np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_idf(df, n_docs: int):
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    df = np.asarray(df, np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
