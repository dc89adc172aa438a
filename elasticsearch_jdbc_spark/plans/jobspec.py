"""Job specification -> pipeline wiring.

The reference is driven by a JSON settings document piped to stdin
(`echo '{jdbc-spec}' | java ... JDBCImporter`, README.md:20-34), with a
statefile merged over it on restart (JDBCImporter.java:82-120). This module
is the Spark-native equivalent: a dict/JSON spec selects source, strategy
and index options; resume state lives in the index manifest (not a separate
statefile — the manifest IS the lineage).

Spec shape (all keys optional except source):

    {
      "source": {"format": "parquet", "path": ".../corpus"},
      "strategy": "standard" | "column",          # column = incremental
      "key_cols": ["repo", "path", "commit"],
      "text_col": "content",
      "index_dir": "/data/index",
      "incremental": {"ts_col": "commit_ts", "overlap_seconds": 60},
      "k1": 1.2, "b": 0.75, "block_size": 128, "partitions": 64,
      "positions": false            # true -> phrase-query support
    }
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..index.build import IndexBuilder
from ..operators.incremental import watermark_filter


def load_spec(spec: dict | str) -> dict:
    if isinstance(spec, str):
        spec = json.loads(spec)
    if "source" not in spec:
        raise ValueError("jobspec requires a 'source' block")
    return {
        "strategy": "standard",
        "key_cols": ["repo", "path", "commit"],
        "text_col": "content",
        "k1": 1.2,
        "b": 0.75,
        "block_size": 128,
        "partitions": None,
        "positions": False,
        **spec,
    }


def read_source(spark: SparkSession, spec: dict) -> DataFrame:
    """Read the spec's source — a single block or a LIST of blocks (the
    reference's `sql` statement list, SQLCommand.java:49-57: multiple
    statements feed one sink; here multiple sources union into one build).
    All blocks must project the same columns."""
    src = spec["source"]
    if isinstance(src, list):
        dfs = [_read_one(spark, s) for s in src]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
    return _read_one(spark, src)


def _read_one(spark: SparkSession, src: dict) -> DataFrame:
    """Format dispatch. Driver-jar requirements (not bundled here — ship
    them via spark-submit --jars / --packages exactly as any Spark job):
      * jdbc:    the database's JDBC driver jar (e.g. org.postgresql:
                 postgresql); options url/dbtable/user/password/fetchsize/
                 partitionColumn per Spark's JDBC source docs.
      * iceberg: org.apache.iceberg:iceberg-spark-runtime matching the
                 Spark version, plus catalog conf; `path` is the table
                 identifier or metadata location.
    Both branches are plain `spark.read.format(...)` passthroughs, so the
    dispatch itself is unit-testable without the jars (test_jobspec_sources).
    """
    fmt = src.get("format", "parquet")
    reader = spark.read
    for k, v in src.get("options", {}).items():
        reader = reader.option(k, v)
    if fmt == "jdbc":
        # the reference's home turf (StandardSource.java:460-517): Spark's
        # JDBC source handles fetchsize/partitioned reads declaratively
        return reader.format("jdbc").load()
    if fmt == "csv":
        reader = reader.option("header", src.get("header", "true"))
        if "schema" in src:
            reader = reader.schema(src["schema"])
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(src["path"])
    return reader.format(fmt).load(src["path"])


def write_ack(spark: SparkSession, manifest: dict, ack_dir: str) -> None:
    """Write-back acknowledgment (A17): the reference's sink acks each bulk
    request and exposes run metrics (`metrics` settings, MetricsLogger);
    here one append-only parquet row per completed run carries the run's
    metrics + lineage digest, so downstream jobs (or the next run) can
    JOIN on ingest state instead of parsing manifests. Append mode — the
    directory is a run log."""
    m = build_metrics(manifest)
    row = [
        (
            manifest["phases"]["ingest"]["source_fingerprint"],
            manifest["n_docs"],
            manifest["n_terms"],
            float(m["wall_s"]),
            float(m["dps"] or 0.0),
            int(m["bytes_written"]),
        )
    ]
    spark.createDataFrame(
        row,
        "source_fingerprint long, n_docs long, n_terms long, "
        "wall_s double, dps double, bytes_written long",
    ).coalesce(1).write.mode("append").parquet(ack_dir)


def run_import(spark: SparkSession, spec: dict | str, resume: bool = True) -> dict:
    """Execute one import run (the reference's Context.execute state
    machine, StandardContext.java:160-214): read -> (optional rename,
    the column_name_map analogue, StandardSource.java:1938-1955) ->
    (optional incremental filter) -> index build -> manifest ->
    (optional `ack_dir` write-back, A17)."""
    spec = load_spec(spec)
    df = read_source(spark, spec)
    for old, new in spec.get("rename", {}).items():
        df = df.withColumnRenamed(old, new)
    if spec["strategy"] == "column" and "incremental" in spec:
        inc = spec["incremental"]
        if inc.get("last_run"):
            df = watermark_filter(
                df, inc["ts_col"], inc["last_run"], inc.get("overlap_seconds", 0)
            )
    builder = IndexBuilder(
        spark,
        spec["index_dir"],
        k1=spec["k1"],
        b=spec["b"],
        block_size=spec["block_size"],
        key_cols=tuple(spec["key_cols"]),
        text_col=spec["text_col"],
        partitions=spec["partitions"],
        with_positions=spec["positions"],
    )
    manifest = builder.build(df, resume=resume)
    if spec.get("ack_dir"):
        write_ack(spark, manifest, spec["ack_dir"])
    return manifest


def build_metrics(manifest: dict) -> dict:
    """The reference's metrics vocabulary (MetricsLogger.java:40-110:
    dps = rows*1000/elapsed_ms, MB/s, avg size) derived from a build
    manifest — total and per-phase, plus per-partition rows/bytes from the
    lineage (SourceMetric analogue, per-partition instead of per-thread)."""
    phases = manifest["phases"]
    n = manifest["n_docs"]
    wall = manifest["built_wall_s"]
    per_phase = {}
    total_bytes = 0
    for name, ph in phases.items():
        pw = ph.get("wall_s", 0.0)
        parts = ph.get("partitions", {})
        nbytes = sum(
            f["bytes"] for d in parts.values() for f in d.values()
        )
        total_bytes += nbytes
        per_phase[name] = {
            "wall_s": pw,
            "dps": round(n / pw, 1) if pw else None,
            "bytes_written": nbytes,
            "mb_per_s": round(nbytes / 1e6 / pw, 2) if pw else None,
        }
    return {
        "n_docs": n,
        "wall_s": wall,
        "dps": round(n / wall, 1) if wall else None,
        "bytes_written": total_bytes,
        "mb_per_s": round(total_bytes / 1e6 / wall, 2) if wall else None,
        "avg_doc_tokens": round(manifest["avgdl"], 1),
        "phases": per_phase,
    }
