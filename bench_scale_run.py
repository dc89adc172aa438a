"""Single-parallelism-level index-build throughput run (invoked as a
subprocess by bench.py — a fresh process per level so each SparkSession
gets its own local[N] master).

Prints one line: SCALE_RESULT {json}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    n_files = int(sys.argv[2])
    timed_builds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
    from elasticsearch_jdbc_spark.session import get_spark
    from elasticsearch_jdbc_spark.sources import synthetic_corpus

    spark = get_spark(f"bench-scale-{cores}", cores=cores)
    corpus_dir = f"/dev/shm/bench_corpus_{n_files}"
    if not os.path.exists(corpus_dir):
        # 64 files: the scan stage parallelism is bounded by row groups, so
        # a corpus written with few partitions would cap every level's read
        # at that width (input layout must not throttle the 4N level)
        synthetic_corpus(spark, n_files=n_files, seed=7, partitions=64).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    idx_dir = f"/dev/shm/bench_idx_{cores}"

    def one_build() -> float:
        b = IndexBuilder(spark, idx_dir, partitions=64)
        b.reset()
        t0 = time.time()
        b.build(corpus, resume=False)
        return time.time() - t0

    one_build()  # warmup: python workers, JIT, page cache
    times = sorted(one_build() for _ in range(timed_builds))
    # min = the contention-free estimate (shared-VM runs show >30% noise;
    # the min is the reproducible figure, all_times shows the spread)
    wall = times[0]
    reader = IndexReader(spark, idx_dir)
    t0 = time.time()
    for q in ("merge segment buffer", "read write lock", "encode decode stream"):
        reader.search(q, k=10)
    q_lat = (time.time() - t0) / 3
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(
        "SCALE_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "files": n_files,
                "build_wall_s": round(wall, 2),
                "files_per_sec": round(n_files / wall, 1),
                "search_latency_s": round(q_lat, 3),
                "all_times": [round(t, 2) for t in times],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
