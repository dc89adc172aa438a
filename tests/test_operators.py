"""Unit tests for dedup / similarity / incremental / text / geo /
multimodal operators beyond what the DuckDB-oracle harness covers."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.geo import detect_json, wkt_to_geojson_py
from elasticsearch_jdbc_spark.functions.multimodal import (
    extract_features,
    frame_sample_stub,
    synthetic_media,
)
from elasticsearch_jdbc_spark.operators import dedup, incremental, similarity


def test_wkt_point_polygon():
    assert json.loads(wkt_to_geojson_py("POINT (100.0 0.0)")) == {
        "type": "Point", "coordinates": [100.0, 0.0],
    }
    gj = json.loads(wkt_to_geojson_py("POLYGON ((30 10, 40 40, 20 40, 30 10))"))
    assert gj["type"] == "Polygon"
    assert gj["coordinates"][0][0] == [30.0, 10.0]
    assert wkt_to_geojson_py("not wkt") is None
    assert wkt_to_geojson_py(None) is None


def test_detect_json(spark):
    df = spark.createDataFrame(
        [('{"a": 1}',), ("plain text",), ("[1,2,3]",), ("{broken",)], "s string"
    )
    out = [r[0] for r in df.select(detect_json("s")).collect()]
    assert json.loads(out[0]) == {"a": 1}
    assert out[1] is None
    assert json.loads(out[2]) == [1, 2, 3]
    assert out[3] is None


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id long, t string"
    )
    out = {r["keep_id"]: r["n_copies"] for r in dedup.exact_dedup(df, "id", "t").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    other = "completely different words nothing shared here at all " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "id long, t string"
    )
    pairs = dedup.minhash_lsh_pairs(df, "id", "t", n=2, num_perm=64, bands=16,
                                    verify_threshold=0.3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_simhash_hamming(spark):
    # near-dup: one token changed in a 180-token doc -> tiny hamming;
    # distinct doc -> ~32 bits apart (independent hashes)
    words = " ".join(f"w{i % 60}" for i in range(180))
    near = words.replace("w7 ", "w99 ", 1)
    other = " ".join(f"z{i}" for i in range(180))
    df = spark.createDataFrame(
        [(1, words), (2, near), (3, other)], "id long, t string"
    )
    sim = dedup.simhash64(df, "id", "t")
    pairs = dedup.simhash_near_pairs(sim, max_hamming=6).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 6
    assert (1, 3) not in got and (2, 3) not in got


def test_knn_lsh_recall_vs_brute(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    brute = similarity.knn_bruteforce(e, q, k=5).collect()
    approx = similarity.knn_lsh(e, q, k=5, n_planes=4).collect()
    bs = {(r["query_id"], r["neighbor_id"]) for r in brute}
    as_ = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # LSH with few planes on random gaussian vectors: just require overlap
    # plus correctly ranked output shape
    assert len(as_ & bs) >= 1
    assert all(r["rank"] >= 1 for r in approx)


def test_knn_filtered_prefilter_semantics(spark, sf_dir):
    """ES knn.filter = PRE-filter: k nearest AMONG matching vectors —
    ranks re-pack within the filtered sub-space, not a post-cut filter
    that leaves holes; every neighbor satisfies the predicate."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = similarity.knn_bruteforce(e, q, k=5, filter_sql="label = 1").collect()
    labels = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    assert got and all(labels[r["neighbor_id"]] == 1 for r in got)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # equivalent to brute force over the pre-filtered corpus
    want = similarity.knn_bruteforce(e.filter("label = 1"), q, k=5).collect()
    assert [(r["query_id"], r["rank"], r["neighbor_id"]) for r in got] == [
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in want
    ]
    # and the ANN paths accept the same clause
    lsh = similarity.knn_lsh(
        e, q, k=3, n_planes=4, n_tables=8, probe_hamming=1, filter_sql="label = 1"
    ).collect()
    assert all(labels[r["neighbor_id"]] == 1 for r in lsh)
    ivf = similarity.knn_ivf(
        e, q, k=3, n_centroids=4, n_probe=4, filter_sql="label = 1"
    ).collect()
    assert all(labels[r["neighbor_id"]] == 1 for r in ivf)


def test_classify_ops(spark):
    t0 = dt.datetime(2024, 6, 1)
    rows = [
        (t0 + dt.timedelta(days=2), t0 + dt.timedelta(days=2), None),   # create
        (t0 - dt.timedelta(days=9), t0 + dt.timedelta(days=1), None),   # index (updated)
        (t0 - dt.timedelta(days=9), t0 - dt.timedelta(days=5), None),   # dropped
        (t0 - dt.timedelta(days=9), t0 - dt.timedelta(days=5), t0 + dt.timedelta(days=1)),  # delete
    ]
    df = spark.createDataFrame(rows, "created_at timestamp, updated_at timestamp, deleted_at timestamp")
    out = [r["_optype"] for r in incremental.classify_ops(df, "created_at", "updated_at", "deleted_at", t0).collect()]
    assert sorted(out) == ["create", "delete", "index"]


def test_multimodal_features(spark):
    media = synthetic_media(spark, n=32)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(len(r["sha256"]) == 64 for r in rows)
    # determinism: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert again == first
    frames = frame_sample_stub(media, every_n=32)
    assert frames.count() > 0


def test_jobspec_roundtrip(spark, tmp_path):
    from elasticsearch_jdbc_spark.plans.jobspec import run_import
    from elasticsearch_jdbc_spark.sources import synthetic_corpus

    src_dir = str(tmp_path / "corpus")
    synthetic_corpus(spark, n_files=200, seed=5).write.parquet(src_dir)
    manifest = run_import(
        spark,
        {"source": {"format": "parquet", "path": src_dir},
         "index_dir": str(tmp_path / "idx"), "partitions": 4},
    )
    assert manifest["n_docs"] == 200
    assert manifest["n_terms"] > 0


def test_simhash_pairs_match_bruteforce(spark):
    """Manku block tables find EXACTLY the brute-force Hamming<=k pairs
    (the guarantee: <=k differing bits leave some (B-k)-block subset
    untouched)."""
    import numpy as np

    rows = []
    for i in range(40):
        words = " ".join(f"t{j}_{i % 8}" for j in range(50))
        rows.append((i, words))
    df = spark.createDataFrame(rows, "id long, t string")
    sim = dedup.simhash64(df, "id", "t")
    fps = {r["id"]: np.uint64(r["simhash"]) for r in sim.collect()}
    want = set()
    ids = sorted(fps)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = bin(int(fps[ids[x]] ^ fps[ids[y]])).count("1")
            if h <= 3:
                want.add((ids[x], ids[y]))
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_pairs(sim, max_hamming=3).collect()
    }
    assert got == want
    assert want, "fixture must contain at least one near pair"


def test_simhash_kernel_is_shuffle_free_and_scales(spark):
    """simhash64 must stay one mapInPandas pass (no per-doc Python groups)
    and handle a 30k-doc corpus; hot identical-content clusters must not
    blow the block join (keys are ~32 bits, not 16)."""
    from elasticsearch_jdbc_spark.sources import synthetic_corpus

    plan = dedup.simhash64(
        spark.createDataFrame([(1, "x y z")], "id long, t string"), "id", "t"
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan, "per-doc applyInPandas is back"

    corpus = synthetic_corpus(spark, n_files=30_000, seed=5).select(
        F.monotonically_increasing_id().alias("id"), F.col("content").alias("t")
    )
    sim = dedup.simhash64(corpus, "id", "t").cache()
    try:
        assert sim.count() == 30_000
        pairs = dedup.simhash_near_pairs(sim, max_hamming=3)
        n = pairs.count()  # must complete without a quadratic candidate blowup
        assert n >= 0
    finally:
        sim.unpersist()


def test_wkt_multipolygon_and_envelope():
    """Golden tests mirroring GeoJSONShapeSerializer: MultiPolygon
    (:160-175, each polygon = [exterior ring, holes...]) and Rectangle ->
    type 'Envelope' with [[minX, maxY], [maxX, minY]] (:70-77); ENVELOPE
    WKT order is spatial4j's (minX, maxX, maxY, minY)."""
    import json

    mp = json.loads(
        wkt_to_geojson_py(
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 0), (5 5, 7 5, 7 7, 5 5)), "
            "((20 20, 30 20, 30 30, 20 20)))"
        )
    )
    assert mp == {
        "type": "MultiPolygon",
        "coordinates": [
            [
                [[0, 0], [10, 0], [10, 10], [0, 0]],
                [[5, 5], [7, 5], [7, 7], [5, 5]],
            ],
            [[[20, 20], [30, 20], [30, 30], [20, 20]]],
        ],
    }
    env = json.loads(wkt_to_geojson_py("ENVELOPE (10, 30, 40, 20)"))
    assert env == {"type": "Envelope", "coordinates": [[10, 40], [30, 20]]}
    # all six shapes parse; junk still rejected
    for s in (
        "POINT (1 2)",
        "LINESTRING (1 2, 3 4)",
        "POLYGON ((0 0, 1 0, 1 1, 0 0))",
        "MULTIPOINT (1 2, 3 4)",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
        "ENVELOPE (0, 1, 1, 0)",
    ):
        assert wkt_to_geojson_py(s) is not None, s
    assert wkt_to_geojson_py("ENVELOPE (1, 2, 3)") is None
    assert wkt_to_geojson_py("CIRCLE (0 0, 5)") is None


def test_multimodal_resize_and_audio_windows(spark):
    from elasticsearch_jdbc_spark.functions.multimodal import (
        audio_windows_stub,
        resize_image_stub,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30)
    resized = resize_image_stub(media, max_side=100).collect()
    assert resized, "fixture contains images"
    for r in resized:
        assert max(r["target_width"], r["target_height"]) <= 100
        # aspect preserved within rounding
        assert abs(
            r["target_width"] / r["target_height"] - r["width"] / r["height"]
        ) < 0.05
        # never upscale
        assert r["target_width"] <= r["width"] and r["target_height"] <= r["height"]
    wins = audio_windows_stub(media, window_bytes=100, overlap=0.5).collect()
    assert wins, "fixture contains audio"
    by_media = {}
    for w in wins:
        by_media.setdefault(w["media_id"], []).append(w)
    for rows in by_media.values():
        rows.sort(key=lambda r: r["window_no"])
        assert rows[0]["offset"] == 0
        assert all(r["length"] > 0 for r in rows)
        # 50% overlap stride
        if len(rows) > 1:
            assert rows[1]["offset"] - rows[0]["offset"] == 50


def test_quantize_embeddings(spark):
    """Symmetric int8 quantization: golden codes, clamp, zero vector,
    reconstruction error bounded by scale/2, rank fidelity on a dot."""
    from pyspark.sql import functions as F

    from elasticsearch_jdbc_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [-2.0, 2.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "id int, v array<float>")
    q = {r["id"]: r for r in quantize_embeddings(df, "v").collect()}
    assert q[0]["q_scale"] == 1.0 / 127.0
    assert q[0]["q_codes"] == [127, -64, 32, 0]  # round(0.25*127)=round(31.75)=32
    assert q[1]["q_scale"] == 0.0 and q[1]["q_codes"] == [0, 0, 0, 0]
    assert q[2]["q_codes"] == [-127, 127, 64, -64]
    out = dequantize_embeddings(quantize_embeddings(df, "v"), out_col="deq")
    for r in out.collect():
        orig = dict(rows)[r["id"]]
        assert len(r["deq"]) == len(orig)
        for x, xq in zip(orig, r["deq"]):
            assert abs(x - xq) <= (r["q_scale"] / 2.0) + 1e-12
