#!/usr/bin/env python
"""Build dist/elasticsearch_jdbc_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import shutil


def main() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dist = os.path.join(root, "dist")
    os.makedirs(dist, exist_ok=True)
    out = shutil.make_archive(
        os.path.join(dist, "elasticsearch_jdbc_spark"),
        "zip",
        root_dir=root,
        base_dir="elasticsearch_jdbc_spark",
    )
    print(out)
    return out


if __name__ == "__main__":
    main()
