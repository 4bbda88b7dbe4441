"""Anti-join strategy probe for the unseen filter (round-5 VERDICT #3).

The r4 isolated profile put unseen_anti_join at eff_raw 0.47 / eff_rel
0.51 on the 4->16 pair — the worst stage — with cpu_inflation only ~1.08,
i.e. NOT a DRAM ceiling. The broadcast anti-join has an Amdahl term the
other stages don't: the seen side (n/5 = 12.8M hashes at 64M rows) is
collected and built into a LongHashedRelation ON THE DRIVER,
single-threaded, identically at every parallelism level. Solving
t = s + p/c from the r4 pair gives s ≈ 8 s serial — almost exactly the
scaling shortfall.

This probe times the competing strategies ISOLATED at two pinned levels
(orchestrated like bench_stage_scaling.py):

  bcast   - current: broadcast anti-join (serial driver build, no exchange)
  shash   - plain shuffle_hash anti-join, no Bloom, no NULL keys (the r4
            NULL-skew pathology belonged to the bloom-cleared probe-key
            trick, not to a plain anti-join whose 64-bit keys hash
            uniformly)
  smj     - sort-merge anti-join (AQE skew-splittable)
  floor   - scan + project only (the stage's irreducible input cost)

Usage (inputs are built once, shared via /dev/shm):
  taskset -c 0-15 /opt/spark/bin/spark-submit --master local[16] \
      --driver-memory 24g --driver-java-options -XX:-DontCompileHugeMethods \
      --py-files BENCH/webscraping_spark.zip bench_unseen_probe.py
with SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_N env. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def canon_path(n: int) -> str:
    return os.path.join(SHM, f"iso_canon_{n}.parquet")


def build_canon(spark, n: int) -> None:
    import bench
    from webscraping_spark.functions import udfs

    path = canon_path(n)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    bench.materialized_frontier(spark, n)
    frontier = spark.read.parquet(
        os.path.join(SHM, f"bench_frontier_{n}_f256.parquet")
    )
    df = (
        udfs.canonicalize_split(frontier, "base_url", "raw_link", "url", compact=True)
        .select("priority", "seq", "url")
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("domain", udfs.get_domain_col(F.col("url")))
        .withColumn("depth", F.lit(1))
    )
    df.write.mode("overwrite").parquet(path)


def seen_rows(spark, n: int):
    n_domains = max(n // 200, 10)
    u = F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0 + 0.0000005
    domain_id = F.floor(F.exp(u * F.log(F.lit(float(n_domains))))).cast("long")
    return (
        spark.range(n)
        .filter(F.pmod(F.col("id"), F.lit(10)) >= 8)
        .select(
            F.xxhash64(
                F.concat(
                    F.lit("http://d"),
                    domain_id.cast("string"),
                    F.lit(".com/abs"),
                    F.col("id").cast("string"),
                    F.lit(".html"),
                )
            ).alias("url_hash"),
            F.lit(0).alias("depth"),
        )
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(os.environ.get("SPARK_GRAFT_BENCH_N", 64_000_000))
    from webscraping_spark.operators.seen import ExactSeenSet
    from webscraping_spark.session import get_spark

    spark = get_spark(app_name=f"unseen_probe_local{cpus}", cores=cpus)
    build_canon(spark, n)

    def canon():
        return spark.read.parquet(canon_path(n))

    def variant(kind: str):
        c = canon()
        if kind == "floor":
            return c.select("priority", "seq", "url", "url_hash", "domain", "depth")
        exact = ExactSeenSet(seen_rows(spark, n))
        if kind == "bcast":
            seen = exact.df.select(F.col("url_hash").alias("_s")).hint("broadcast")
        elif kind == "shash":
            seen = exact.df.select(F.col("url_hash").alias("_s")).hint("shuffle_hash")
        elif kind == "smj":
            seen = exact.df.select(F.col("url_hash").alias("_s")).hint("merge")
        else:
            raise ValueError(kind)
        return c.join(seen, F.col("url_hash") == F.col("_s"), "left_anti")

    out: dict[str, dict] = {}
    for kind in ("floor", "bcast", "shash", "smj"):
        variant(kind).limit(200_000).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(2):
            t = time.time()
            variant(kind).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t, 3))
        out[kind] = {"sec": min(runs), "runs": runs}

    print(json.dumps({"cores": cpus, "n": n, "variants": out}))
    spark.stop()


if __name__ == "__main__":
    main()
