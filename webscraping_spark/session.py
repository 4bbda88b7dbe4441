"""SparkSession factory with the engine's tuned defaults.

Local-mode sizing notes (this sandbox is local[32], 128 GiB, single JVM):
  - shuffle partitions default to 2x cores — small enough to avoid tiny-task
    overhead at test scale, and AQE coalesces further at runtime.
  - AQE on: runtime shuffle-partition coalescing + skew-join splitting are
    the free half of the hot-domain skew story (the other half, salting of
    applyInPandas politeness groups, is explicit in operators/politeness).
  - Arrow on: every Python crossing in this engine is an Arrow batch.
On a real cluster the same conf applies; only master/memory change (the job
is submitted via spark-submit --py-files, see bench.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _tune_worker_allocator() -> None:
    """Python workers inherit the driver env (local mode). Default pymalloc
    arenas mmap/munmap 256 KB blocks constantly; under a memory cgroup every
    returned page re-enters the kernel's memcg accounting on the next fault,
    which serializes at high core counts (measured: 2.5x slowdown at
    local[32], workers stuck in count_memcg_events). Keeping freed memory
    in-process removes the kernel from the loop."""
    os.environ.setdefault("PYTHONMALLOC", "malloc")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    os.environ.setdefault("MALLOC_ARENA_MAX", "2")


def get_spark(
    app_name: str = "webscraping_spark",
    master: str | None = None,
    cores: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _tune_worker_allocator()
    cores = cores or default_parallelism()
    master = master or f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # large Arrow batches: the Python<->JVM loopback round trip is
        # syscall-bound at high core counts (measured: 5k-row batches are
        # 2.3x slower than 100k at local[32]); ~20 MB/batch/worker is cheap
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # local-mode shuffle goes through spark.local.dir; on this box /dev/shm
    # is a 126 GB tmpfs — keeping shuffle files off the disk removes the
    # serial I/O bottleneck that otherwise caps multi-core scaling. On a
    # real cluster this conf is a no-op decision for the cluster manager.
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        local_dir = os.path.join(shm, "spark-local")
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # spark.driver.memory set via builder is a no-op under spark-submit
    # (the JVM is already up), so the 64 MB broadcast threshold can exceed
    # what a default 1g driver can actually BUILD (HashedRelation memory is
    # several x the size estimate). Scale the threshold to the real heap:
    # a 24g driver keeps 64 MB; a 1g driver drops to ~32 MB and lets big
    # builds fall back to shuffle joins instead of dying.
    try:
        max_heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
        thr = min(64 * 1024 * 1024, max(16 * 1024 * 1024, max_heap // 32))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))
    except Exception:
        pass  # non-JVM backends (connect) — keep the builder default
    return spark
