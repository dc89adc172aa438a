"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata, with decode/feature steps as Arrow-batched UDFs.

The decode kernels are STUBBED (no image/audio libs in this container):
`decode_image_stub` produces a deterministic fake decode so the Spark-side
plumbing — schema, batch shape, partitioning — is real and tested; swap the
stub body for PIL/ffmpeg in production. Marked clearly below.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),  # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads) for tests."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {"media_id": ids, "kind": [], "mime": [], "payload": [], "meta": []}
            for i in ids.tolist():
                rng = np.random.default_rng(seed + i)
                kind = ["image", "audio", "video"][i % 3]
                rows["kind"].append(kind)
                rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
                rows["payload"].append(rng.integers(0, 256, 128 + i % 512, dtype=np.uint8).tobytes())
                rows["meta"].append({"w": str(64 + i % 256), "h": str(64 + (i * 7) % 256)})
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, 4).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image_stub(payload: bytes, meta: dict) -> tuple[int, int, np.ndarray]:
    """STUB — production replaces this with a real decoder (PIL/libvips).

    Deterministic fake: dims from metadata, 8-dim 'embedding' from a
    sha256-seeded projection of the payload bytes.
    """
    def _dim(v):
        # malformed metadata degrades to None, like a missing key — one
        # bad row must not fail the whole mapInPandas task
        try:
            return int(v) or None
        except (TypeError, ValueError):
            return None

    w = _dim((meta or {}).get("w", 0))
    h = _dim((meta or {}).get("h", 0))
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    feat = rng.standard_normal(8).astype(np.float32)
    return w, h, feat


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow-batched,
    partition-parallel; the real decode slots into decode_image_stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in FEATURE_SCHEMA.names}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                payload = bytes(payload)
                w, h, feat = decode_image_stub(payload, meta)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload))
                out["sha256"].append(hashlib.sha256(payload).hexdigest())
                out["feature"].append(feat.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_image_stub(
    media: DataFrame, max_side: int = 224
) -> DataFrame:
    """Image-resize plumbing: aspect-preserving target dims computed
    JVM-side from metadata (REAL — this is the part that matters for the
    pipeline shape: pure column math, no shuffle); the pixel resample
    itself is production-stubbed (payload passes through untouched)."""
    w = F.col("meta").getItem("w").cast("int")
    h = F.col("meta").getItem("h").cast("int")
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double")
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
        # STUB: a real resample replaces payload here (PIL/libvips kernel
        # in a mapInPandas over this same frame)
        "payload",
    )


def audio_windows_stub(
    media: DataFrame, window_bytes: int = 4000, overlap: float = 0.5
) -> DataFrame:
    """Audio windowing plumbing: one row per (overlapping) analysis window
    over the payload byte-range — the 1->N explode shape of a real
    spectrogram/VAD pass, with stride math done JVM-side. The per-window
    DSP is production-stubbed."""
    stride = max(1, int(window_bytes * (1.0 - overlap)))
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length("payload") - F.lit(window_bytes)) / F.lit(stride)) + 1,
    ).cast("int")
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.length("payload").alias("n_bytes"),
            F.explode(F.sequence(F.lit(0), n - 1)).alias("window_no"),
        )
        .select(
            "media_id",
            "window_no",
            (F.col("window_no") * stride).alias("offset"),
            F.least(
                F.lit(window_bytes),
                F.col("n_bytes") - F.col("window_no") * stride,
            ).alias("length"),
        )
    )


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no) rows for
    videos; the decode of each frame is production-stubbed. Demonstrates
    the 1->N explode shape a real sampler uses."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                # every_n-th frame over the FULL frame range — the
                # previous length/every_n upper bound divided twice and
                # emitted ~1/every_n of the intended samples
                F.sequence(
                    F.lit(0),
                    (F.length("payload") - 1).cast("int"),
                    F.lit(every_n),
                )
            ).alias("frame_no"),
        )
    )
