"""Spark-native matched-load calibration (BENCH/BASELINE.md evidence).

Runs ONLY the pipeline's first map stage — scan the materialized frontier,
tiered canonicalize, xxhash, domain extract — with ZERO shuffles and a noop
sink. Embarrassingly parallel by construction: there is no exchange, no
join, no window, no driver-serial phase between the scan and the sink, so
any deviation from perfect N->4N scaling on this job is the HOST (memory
bandwidth / LLC contention / steal), not the engine's plan. bench_scaling.py
runs it at both parallelism levels and reports it as the matched-load
hardware ceiling next to the pure-CPU spin ceiling.

Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_N. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(os.environ.get("SPARK_GRAFT_BENCH_N", 64_000_000))

    import bench
    from webscraping_spark.functions import udfs
    from webscraping_spark.session import get_spark

    spark = get_spark(app_name=f"matched_load_{cpus}", cores=cpus)

    def build(rows):
        frontier = bench.materialized_frontier(spark, rows)
        return (
            udfs.canonicalize_split(frontier, "base_url", "raw_link", "url")
            .select("priority", "seq", "url")
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("domain", udfs.get_domain_col(F.col("url")))
        )

    # warmup at quarter size (JIT + Arrow workers), then 2 measured runs
    build(max(n // 4, 10_000)).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(2):
        t0 = time.time()
        build(n).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "metric": "matched_load_map_stage_sec",
                "value": min(runs),
                "runs": runs,
                "rows": n,
                "cores": cpus,
                "rows_per_sec": round(n / min(runs), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
