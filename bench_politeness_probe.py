"""Politeness-window scaling probe (round-5 VERDICT #4).

The r4 isolated profile read the politeness stage at eff_rel 0.617 in one
run and 0.845 in the repeat — high variance, suspected straggler: the
bench frontier's domains are log-uniform, so the hottest domain holds
~1/ln(D) ≈ 8% of all rows, and a window partition is unsplittable — at 16
cores the stage cannot finish faster than one task sorting+scanning that
domain. plan_schedule's two-phase bucketed scan (hot_group_rows) was built
for exactly this but is disabled in bench + crawl loop because its
pre-agg/persist overhead looked larger than the win at driver-bounded
batch sizes.

Variants, isolated (read materialized unseen input -> plan_schedule ->
noop), at two pinned levels:

  cur    - hot_group_rows=None (the r4-profiled configuration)
  hot1m  - hot_group_rows=1_000_000 (only the ~8 hottest domains split)
  hot250k- hot_group_rows=250_000

Prints one JSON line per level; run via run script at local[16] then
local[4].
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def unseen_path(n: int) -> str:
    return os.path.join(SHM, f"iso_unseen_{n}.parquet")


def build_unseen(spark, n: int) -> None:
    from bench_unseen_probe import build_canon, canon_path, seen_rows
    from webscraping_spark.operators.seen import ExactSeenSet

    path = unseen_path(n)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    build_canon(spark, n)
    canon = spark.read.parquet(canon_path(n))
    exact = ExactSeenSet(seen_rows(spark, n))
    seen = exact.df.select(F.col("url_hash").alias("_s")).hint("broadcast")
    out = canon.join(seen, F.col("url_hash") == F.col("_s"), "left_anti").drop(
        "url_hash", "depth"
    )
    out.write.mode("overwrite").parquet(path)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(os.environ.get("SPARK_GRAFT_BENCH_N", 64_000_000))
    from webscraping_spark.operators import politeness
    from webscraping_spark.session import get_spark

    spark = get_spark(app_name=f"politeness_probe_local{cpus}", cores=cpus)
    build_unseen(spark, n)

    def variant(hot):
        state = spark.createDataFrame([], politeness.DOMAIN_STATE_SCHEMA)
        planned, _ = politeness.plan_schedule(
            spark.read.parquet(unseen_path(n)),
            state,
            delay=5.0,
            variance=0.5,
            seed=42,
            hot_group_rows=hot,
        )
        return planned

    out: dict[str, dict] = {}
    for name, hot in (("cur", None), ("hot1m", 1_000_000), ("hot250k", 250_000)):
        variant(hot).limit(200_000).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(2):
            t = time.time()
            variant(hot).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t, 3))
            spark.catalog.clearCache()  # the hot path persists its input
        out[name] = {"sec": min(runs), "runs": runs}

    print(json.dumps({"cores": cpus, "n": n, "variants": out}))
    spark.stop()


if __name__ == "__main__":
    main()
