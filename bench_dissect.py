"""Stage-dissection of the bench pipeline: time each prefix of the fused
superstep separately at one parallelism level, so non-scaling stages can be
located by diffing two runs (local[8] vs local[32]).

Usage (run once per level, pinned):
  taskset -c 0-7  spark-submit --master local[8]  --driver-memory 24g \
      --py-files BENCH/webscraping_spark.zip bench_dissect.py
  taskset -c 0-31 spark-submit --master local[32] --driver-memory 24g \
      --py-files BENCH/webscraping_spark.zip bench_dissect.py

Prints one JSON line: {"cores": C, "n": N, "stages": {name: best_sec}}.
Each stage is the CUMULATIVE pipeline up to that point, executed with a
noop write, best of 2 (first run pays codegen warm-in).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def stages(spark, n: int):
    from webscraping_spark.functions import udfs
    from webscraping_spark.operators import politeness
    from webscraping_spark.operators.seen import BloomSeenSet, ExactSeenSet

    import bench

    def s0_frontier():
        return bench.materialized_frontier(spark, n)

    def s1_canon():
        frontier = bench.materialized_frontier(spark, n)
        return (
            udfs.canonicalize_split(frontier, "base_url", "raw_link", "url")
            .select("priority", "seq", "url")
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("domain", udfs.get_domain_col(F.col("url")))
            .withColumn("depth", F.lit(1))
        )

    def seen_rows():
        n_domains = max(n // 200, 10)
        u = F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0 + 0.0000005
        domain_id = F.floor(F.exp(u * F.log(F.lit(float(n_domains))))).cast("long")
        src = spark.range(n).filter(F.pmod(F.col("id"), F.lit(10)) >= 8)
        return src.select(
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

    def s2_unseen():
        canon = s1_canon()
        rows = seen_rows()
        exact = ExactSeenSet(rows)
        bloom = BloomSeenSet.empty(
            spark,
            num_partitions=max(spark.sparkContext.defaultParallelism, 8),
            expected_items_per_partition=max(
                n // 4 // max(spark.sparkContext.defaultParallelism, 8), 1000
            ),
        ).add(rows)
        return bloom.filter_unseen_prefilter(canon, exact, seen_join="broadcast")

    def s3_planned():
        state = spark.createDataFrame([], politeness.DOMAIN_STATE_SCHEMA)
        planned, _ = politeness.plan_schedule(
            s2_unseen(), state, delay=5.0, variance=0.5, seed=42
        )
        return planned

    def s4_salted():
        return politeness.salted_repartition(
            s3_planned(), hot_threshold=5000, salt_rows_per_bucket=2000
        )

    def store():
        return spark.range(n // 4).select(
            F.concat(
                F.lit("http://d"),
                F.pmod(F.xxhash64("id"), F.lit(max(n // 200, 10))).cast("string"),
                F.lit(".com/page"),
                F.col("id").cast("string"),
                F.lit(".html"),
            ).alias("url"),
            F.concat(
                F.lit('<html><body><p class="caption">caption </p>'),
                F.lit('<a href="/l1.html">a</a><a href="l2.html#x">b</a>'),
                F.lit("</body></html>"),
            ).alias("serve_html"),
        )

    def s5_joined():
        return s4_salted().join(store().hint("shuffle_hash"), "url", "left")

    def s6_full():
        fetched = s5_joined()
        extracted = fetched.filter(F.col("serve_html").isNotNull()).select(
            "url",
            "seq",
            F.posexplode(udfs.find_links_col(F.col("serve_html"))).alias("pos", "raw"),
        )
        return udfs.canonicalize_split(extracted, "url", "raw", "link")

    return {
        "s0_frontier": s0_frontier,
        "s1_canon": s1_canon,
        "s2_unseen": s2_unseen,
        "s3_planned": s3_planned,
        "s4_salted": s4_salted,
        "s5_joined": s5_joined,
        "s6_full": s6_full,
    }


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(os.environ.get("SPARK_GRAFT_BENCH_N", 8_000_000))
    from webscraping_spark.session import get_spark

    spark = get_spark(app_name=f"dissect_local{cpus}", cores=cpus)
    builders = stages(spark, n)

    # warm Python workers + codegen with a small full pipeline
    builders["s6_full"]()  # build (plan only)
    small = stages(spark, max(n // 8, 10_000))
    small["s6_full"]().write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name, build in builders.items():
        runs = []
        for _ in range(2):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = min(runs)
        out[f"{name}_runs"] = runs
    print(json.dumps({"cores": cpus, "n": n, "stages": out}))
    spark.stop()


if __name__ == "__main__":
    main()
