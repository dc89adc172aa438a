import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_jdbc_spark.index.codec import (
    decode_block,
    encode_block,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**35, 2**63 - 1], np.uint64)
    enc, lens = varint_encode(v)
    assert lens.tolist() == [1, 1, 1, 2, 2, 2, 3, 6, 9]
    assert (varint_decode(enc) == v).all()


def test_varint_roundtrip_bulk():
    rng = np.random.default_rng(7)
    v = rng.integers(0, 2**45, 50_000).astype(np.uint64)
    enc, _ = varint_encode(v)
    assert (varint_decode(enc) == v).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_roundtrip_property(xs):
    v = np.array(xs, np.uint64)
    enc, _ = varint_encode(v)
    assert varint_decode(enc).tolist() == xs


def test_block_roundtrip():
    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(10**7, 128, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, 128).astype(np.int64)
    dls = rng.integers(5, 2000, 128).astype(np.int64)
    g, t, d = encode_block(docs, tfs, dls)
    dd, tt, ll = decode_block(int(docs[0]), 128, g, t, d)
    assert (dd == docs).all() and (tt == tfs).all() and (ll == dls).all()


def test_block_singleton():
    docs = np.array([42], np.int64)
    g, t, d = encode_block(docs, np.array([3]), np.array([9]))
    assert g == b"\x00"  # explicit leading zero gap
    dd, tt, ll = decode_block(42, 1, g, t, d)
    assert dd.tolist() == [42] and tt.tolist() == [3] and ll.tolist() == [9]
