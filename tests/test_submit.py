"""End-to-end spark-submit --py-files smoke test: packages the zip, ships
it to a fresh local[4] cluster via spark-submit, builds an index from a
JSON job spec, and checks the printed manifest — the north rule's delivery
path, exercised for real (no repo on the child's PYTHONPATH)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path, spark, sf_dir):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)

    # corpus: a small parquet drop from the shared documents table
    corpus_dir = str(tmp_path / "corpus")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200).select(
        "source", "doc_id", "lang", "text"
    ).write.parquet(corpus_dir)

    spec = {
        "source": {"format": "parquet", "path": corpus_dir},
        "rename": {"doc_id": "docno"},  # doc_id is a reserved index column
        "key_cols": ["source", "docno"],
        "text_col": "text",
        "index_dir": str(tmp_path / "idx"),
        "partitions": 4,
    }
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    r = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(ROOT, "scripts", "submit_index_build.py"),
            json.dumps(spec),
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    manifest = json.loads(r.stdout.strip().splitlines()[-1])
    assert manifest["n_docs"] == 200
    assert (tmp_path / "idx" / "manifest.json").exists()
