"""SparkSession factory tuned for this engine.

Local-mode testing runs on local[N]; the same settings are what we would
ship via spark-submit --py-files on a real cluster (AQE on, Arrow on,
shuffle partitions sized to cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "elasticsearch_jdbc_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores=None -> local[*]. shuffle_partitions defaults to the core count:
    on local mode 200 shuffle partitions just add task-launch overhead.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(cores_env) if cores_env else 0
    master = f"local[{cores}]" if cores else "local[*]"
    if not shuffle_partitions:
        shuffle_partitions = cores if cores else (os.cpu_count() or 8)
    # heap must scale with task concurrency: in local mode ONE JVM serves
    # all N task threads, so a fixed heap that is fine at local[4] GC-
    # thrashes at local[16] (measured: the posting merge went 2.9s -> 8.8s
    # anti-scaling until the heap grew). On a real cluster this is
    # spark.executor.memory per executor; 3 GiB/core mirrors a common
    # executor sizing.
    n_threads = cores if cores else (os.cpu_count() or 8)
    # cap the scaled default by physical RAM (70%) so many-core hosts with
    # modest memory don't get a swapping/OOM-killed JVM; floor drops to
    # what the box can actually hold when even 16g doesn't fit
    ram_cap = 64
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    ram_cap = max(2, int(int(line.split()[1]) * 0.7 / (1024 * 1024)))
                    break
    except OSError:
        pass
    default_mem = f"{min(max(16, 3 * n_threads), 64, ram_cap)}g"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", default_mem))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # smaller split size than the 128MB default: local corpora are a
        # few hundred MB, and a 2-task scan serializes the first stage of
        # every build (on a 100TB cluster the default is fine — files are
        # big; this only LOWERS the per-task bytes, never merges files)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    # shuffle/spill on tmpfs when available: local-mode shuffles are
    # disk-bound under high task concurrency on virtio disks
    if os.path.isdir("/dev/shm"):
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors (the spark-submit
    --py-files equivalent, done automatically so any entrypoint works).

    The zip is named by a content fingerprint of the package sources
    (paths + sizes + mtimes), so concurrent sessions never collide: a
    session that registered yesterday's zip keeps fetching IT while a
    session started after an edit ships a differently-named zip —
    Spark's addPyFile hard-errors if a same-named file changes content
    mid-session (measured: one stale shared name failed every task of a
    running suite)."""
    import hashlib
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha1()
    for root, dirs, files in sorted(os.walk(pkg_dir)):
        dirs.sort()
        if "__pycache__" in root:
            continue
        for fn in sorted(files):
            if fn.endswith((".pyc", ".pyo")):
                continue
            p = os.path.join(root, fn)
            st = os.stat(p)
            h.update(
                f"{os.path.relpath(p, pkg_dir)}|{st.st_size}|{st.st_mtime_ns}".encode()
            )
    tag = h.hexdigest()[:12]
    zip_path = os.path.join(
        tempfile.gettempdir(), f"elasticsearch_jdbc_spark_pkg_{tag}"
    )
    if not os.path.exists(zip_path + ".zip"):
        tmp = zip_path + f".build{os.getpid()}"
        shutil.make_archive(
            tmp, "zip", root_dir=os.path.dirname(pkg_dir),
            base_dir=os.path.basename(pkg_dir),
        )
        os.replace(tmp + ".zip", zip_path + ".zip")
    spark.sparkContext.addPyFile(zip_path + ".zip")
