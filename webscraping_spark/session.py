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


def get_spark(
    app_name: str = "webscraping_spark",
    master: str | None = None,
    cores: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
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
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
