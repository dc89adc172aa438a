"""Context-window chunking: window/overlap invariants, reconstruction,
edge docs, guards."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.operators.chunking import chunk_documents


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(df, **kw).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    got = _chunks(spark, [text], max_tokens=4, overlap=1)[0]
    # stride 3: starts 0,3,6 — the start-9 window is just [w9], fully
    # contained in the previous window, so it is skipped (no redundant
    # training example)
    assert got == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
    ]
    # every token appears; consecutive windows share exactly `overlap`
    toks = [c.split() for _, _, c in got]
    assert set(text.split()) == {t for c in toks for t in c}
    for a, b in zip(toks, toks[1:]):
        assert a[-1:] == b[:1]


def test_short_empty_and_whitespace_docs(spark):
    got = _chunks(
        spark, ["one two", "", "   ", "single"], max_tokens=8, overlap=2
    )
    assert got.get(0) == [(0, 2, "one two")]
    assert 1 not in got and 2 not in got
    assert got.get(3) == [(0, 1, "single")]


def test_no_overlap_partition(spark):
    text = " ".join(f"t{i}" for i in range(7))
    got = _chunks(spark, [text], max_tokens=3, overlap=0)[0]
    # disjoint partition of the token stream
    assert [c for _, _, c in got] == ["t0 t1 t2", "t3 t4 t5", "t6"]


def test_guards(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)


class TestPackChunksConcat:
    def test_boundary_math_single_bucket(self, spark):
        from elasticsearch_jdbc_spark.operators.chunking import pack_chunks_concat

        rows = [(1, 0, 100), (1, 1, 100), (2, 0, 100), (3, 0, 50)]
        df = spark.createDataFrame(
            rows, "doc_id long, chunk_id long, n_tokens long"
        )
        out = {
            (r.doc_id, r.chunk_id): (r.pack_id, r.pack_offset, r.spills)
            for r in pack_chunks_concat(df, 256, buckets=1).collect()
        }
        assert out[(1, 0)] == (0, 0, False)
        assert out[(1, 1)] == (0, 100, False)
        # starts at 200, ends at 300 > 256: straddles the cut
        assert out[(2, 0)] == (0, 200, True)
        assert out[(3, 0)] == (1, 300 % 256, False)

    def test_bucketed_pack_ids_disjoint(self, spark):
        from elasticsearch_jdbc_spark.operators.chunking import pack_chunks_concat

        rows = [(i, 0, 64) for i in range(200)]
        df = spark.createDataFrame(
            rows, "doc_id long, chunk_id long, n_tokens long"
        )
        out = pack_chunks_concat(df, 128, buckets=8).collect()
        # pack ids carry the bucket in the high bits -> disjoint per bucket
        for r in out:
            assert r.pack_id >> 40 == r.bucket
        # every token accounted for exactly once
        assert sum(r.n_tokens for r in out) == 200 * 64

    def test_guards(self, spark):
        from elasticsearch_jdbc_spark.operators.chunking import pack_chunks_concat

        df = spark.createDataFrame([(1, 0, 5)], "doc_id long, chunk_id long, n_tokens long")
        with pytest.raises(ValueError):
            pack_chunks_concat(df, 0)
        with pytest.raises(ValueError):
            pack_chunks_concat(df, 10, buckets=0)


class TestPackChunksGreedy:
    def test_next_fit_never_overflows(self, spark):
        from elasticsearch_jdbc_spark.operators.chunking import pack_chunks_greedy

        rows = [(1, 0, 100), (1, 1, 100), (2, 0, 100), (3, 0, 50), (4, 0, 300)]
        df = spark.createDataFrame(
            rows, "doc_id long, chunk_id long, n_tokens long"
        )
        out = pack_chunks_greedy(df, 256, buckets=1).collect()
        by_pack = {}
        for r in out:
            by_pack.setdefault(r.pack_id, []).append(r)
        for pid, items in by_pack.items():
            tot = sum(r.n_tokens for r in items)
            # a pack only exceeds the budget when it holds ONE oversize item
            assert tot <= 256 or (len(items) == 1 and items[0].n_tokens > 256)
        # walk order: (1,0)+(1,1) fill 200; (2,0) would hit 300 -> new pack
        m = {(r.doc_id, r.chunk_id): r.pack_id for r in out}
        assert m[(1, 0)] == m[(1, 1)] != m[(2, 0)]
        assert m[(2, 0)] == m[(3, 0)]  # 100+50 fits
        assert m[(4, 0)] not in (m[(1, 0)], m[(2, 0)])  # oversize isolated

    def test_offsets_are_running_fill(self, spark):
        from elasticsearch_jdbc_spark.operators.chunking import pack_chunks_greedy

        rows = [(1, i, 60) for i in range(5)]
        df = spark.createDataFrame(
            rows, "doc_id long, chunk_id long, n_tokens long"
        )
        out = sorted(
            pack_chunks_greedy(df, 128, buckets=1).collect(),
            key=lambda r: (r.pack_id, r.pack_offset),
        )
        assert [(r.chunk_id, r.pack_offset) for r in out] == [
            (0, 0), (1, 60), (2, 0), (3, 60), (4, 0),
        ]

    def test_deterministic_across_runs(self, spark):
        from elasticsearch_jdbc_spark.operators.chunking import pack_chunks_greedy

        rows = [(i, j, 30 + (i * 7 + j) % 90) for i in range(40) for j in range(3)]
        df = spark.createDataFrame(
            rows, "doc_id long, chunk_id long, n_tokens long"
        ).repartition(16)
        a = sorted(
            (r.doc_id, r.chunk_id, r.pack_id)
            for r in pack_chunks_greedy(df, 128, buckets=8).collect()
        )
        b = sorted(
            (r.doc_id, r.chunk_id, r.pack_id)
            for r in pack_chunks_greedy(df, 128, buckets=8).collect()
        )
        assert a == b
