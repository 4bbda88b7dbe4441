"""Isolated per-stage scaling probe (round-4: stage-granular bound on the
4->16 scaling gate, VERDICT r3 Next #1).

bench_dissect.py times cumulative pipeline PREFIXES; this script times each
stage ISOLATED — the stage's input is materialized to tmpfs parquet once
(shared across parallelism levels via a _SUCCESS marker), then the measured
job is read(input) -> stage -> noop. Alongside wall time it records the
run's total EXECUTOR CPU TIME delta from the live UI REST API: on this
single-box sandbox memory stalls are charged to CPU time, so the 4->16
inflation of per-stage CPU time (same rows, same plan) measures the
DRAM-contention share directly, giving each stage its own hardware ceiling:

    eff_raw(stage)     = t_4 / (4 * t_16)
    ceiling(stage)     = cpu_4 / cpu_16   (perfect scheduling under the
                                           measured stall inflation)
    eff_relative       = eff_raw / ceiling

Run pinned, once per level (bench_stage_scaling.py orchestrates):
  taskset -c 0-3  spark-submit --master local[4]  ... bench_stages_iso.py
  taskset -c 0-15 spark-submit --master local[16] ... bench_stages_iso.py

Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_N (default 64M). Prints one JSON
line: {"cores": C, "n": N, "stages": {name: {"sec": best, "runs": [..],
"cpu_sec": ..., "run_sec": ...}}, "fused": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def _ui_totals(spark) -> tuple[float, float]:
    """(executorCpuTime sec, executorRunTime sec) summed over all completed
    stages of this app, via the UI REST API."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as resp:
            stages = json.loads(resp.read())
    except Exception:
        return (0.0, 0.0)
    cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
    run = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
    return (cpu, run)


def _mat(df, path: str):
    """Materialize df at path once (cross-level shared); return a reader."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.write.mode("overwrite").parquet(path)


def build_inputs(spark, n: int) -> dict[str, str]:
    """Materialize each stage's INPUT table to tmpfs (once per n, any
    level). Returns {input_name: path}. The stage closures then read these
    back, so a measured run contains only the stage's own work."""
    import bench
    from webscraping_spark.functions import udfs
    from webscraping_spark.operators import politeness
    from webscraping_spark.operators.seen import BloomSeenSet, ExactSeenSet

    paths = {
        "frontier": os.path.join(SHM, f"bench_frontier_{n}_f256.parquet"),
        "canon": os.path.join(SHM, f"iso_canon_{n}.parquet"),
        "unseen": os.path.join(SHM, f"iso_unseen_{n}.parquet"),
        "planned": os.path.join(SHM, f"iso_planned_{n}.parquet"),
        "store": os.path.join(SHM, f"iso_store_{n}.parquet"),
        "fetched": os.path.join(SHM, f"iso_fetched_{n}.parquet"),
    }
    bench.materialized_frontier(spark, n)  # writes paths["frontier"]

    def canon_df():
        frontier = spark.read.parquet(paths["frontier"])
        return (
            udfs.canonicalize_split(
                frontier, "base_url", "raw_link", "url", compact=True
            )
            .select("priority", "seq", "url")
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("domain", udfs.get_domain_col(F.col("url")))
            .withColumn("depth", F.lit(1))
        )

    _mat(canon_df(), paths["canon"])

    def seen_rows():
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

    def unseen_df():
        canon = spark.read.parquet(paths["canon"])
        exact = ExactSeenSet(seen_rows())
        bloom = BloomSeenSet.empty(
            spark,
            num_partitions=max(spark.sparkContext.defaultParallelism, 8),
            expected_items_per_partition=max(
                n // 4 // max(spark.sparkContext.defaultParallelism, 8), 1000
            ),
        )
        return bloom.filter_unseen_prefilter(
            canon, exact, seen_join="broadcast"
        ).drop("url_hash", "depth")

    _mat(unseen_df(), paths["unseen"])

    def planned_df():
        state = spark.createDataFrame([], politeness.DOMAIN_STATE_SCHEMA)
        planned, _ = politeness.plan_schedule(
            spark.read.parquet(paths["unseen"]),
            state,
            delay=5.0,
            variance=0.5,
            seed=42,
            hot_group_rows=None,
        )
        return planned

    _mat(planned_df(), paths["planned"])

    def store_df():
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

    _mat(store_df(), paths["store"])

    def fetched_df():
        planned = spark.read.parquet(paths["planned"])
        store = spark.read.parquet(paths["store"])
        return (
            planned.join(store.hint("shuffle_hash"), "url", "left")
            .filter(F.col("serve_html").isNotNull())
            .select("url", "seq", "scheduled_offset", "serve_html")
        )

    _mat(fetched_df(), paths["fetched"])
    return paths


def stage_builders(spark, n: int, paths: dict[str, str]):
    """Isolated stages: read materialized input -> the stage -> (noop)."""
    from webscraping_spark.functions import udfs
    from webscraping_spark.operators import politeness
    from webscraping_spark.operators.seen import BloomSeenSet, ExactSeenSet

    def st_scan_baseline():
        # the matched load floor: scan the frontier, project, hash — no
        # Python, no shuffle; any sub-linear scaling here is the host
        frontier = spark.read.parquet(paths["frontier"])
        return frontier.select(
            "priority", "seq",
            F.xxhash64("base_url", "raw_link").alias("h"),
        )

    def st_canon():
        frontier = spark.read.parquet(paths["frontier"])
        return (
            udfs.canonicalize_split(
                frontier, "base_url", "raw_link", "url", compact=True
            )
            .select("priority", "seq", "url")
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("domain", udfs.get_domain_col(F.col("url")))
            .withColumn("depth", F.lit(1))
        )

    def st_unseen():
        canon = spark.read.parquet(paths["canon"])
        n_domains = max(n // 200, 10)
        u = F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0 + 0.0000005
        domain_id = F.floor(F.exp(u * F.log(F.lit(float(n_domains))))).cast("long")
        seen = (
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
        exact = ExactSeenSet(seen)
        bloom = BloomSeenSet.empty(
            spark,
            num_partitions=max(spark.sparkContext.defaultParallelism, 8),
            expected_items_per_partition=max(
                n // 4 // max(spark.sparkContext.defaultParallelism, 8), 1000
            ),
        )
        return bloom.filter_unseen_prefilter(
            canon, exact, seen_join="broadcast"
        ).drop("url_hash", "depth")

    def st_politeness():
        state = spark.createDataFrame([], politeness.DOMAIN_STATE_SCHEMA)
        planned, _ = politeness.plan_schedule(
            spark.read.parquet(paths["unseen"]),
            state,
            delay=5.0,
            variance=0.5,
            seed=42,
            hot_group_rows=None,
        )
        return planned

    def st_fetch_join():
        planned = spark.read.parquet(paths["planned"])
        store = spark.read.parquet(paths["store"])
        return planned.join(store.hint("shuffle_hash"), "url", "left")

    def st_extract():
        fetched = spark.read.parquet(paths["fetched"])
        extracted = fetched.select(
            "url",
            "seq",
            "scheduled_offset",
            F.posexplode(udfs.find_links_col(F.col("serve_html"))).alias(
                "pos", "raw"
            ),
        )
        return udfs.canonicalize_split(extracted, "url", "raw", "link", compact=True)

    return {
        "scan_baseline": st_scan_baseline,
        "canonicalize": st_canon,
        "unseen_anti_join": st_unseen,
        "politeness_window": st_politeness,
        "fetch_join": st_fetch_join,
        "extract_links": st_extract,
    }


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(os.environ.get("SPARK_GRAFT_BENCH_N", 64_000_000))
    from webscraping_spark.session import get_spark

    # UI on: the REST API is the per-run executor CPU-time source
    spark = get_spark(
        app_name=f"stages_iso_local{cpus}",
        cores=cpus,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    t0 = time.time()
    paths = build_inputs(spark, n)
    mat_sec = round(time.time() - t0, 3)

    builders = stage_builders(spark, n, paths)
    # warmup: run every stage once at 1/8 size inputs? inputs are fixed-n
    # tables, so warm instead with one small full pass of each builder
    # against a row-limited read — enough to JIT codegen + spawn workers.
    for name, build in builders.items():
        build().limit(200_000).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name, build in builders.items():
        runs, cpus_used, runt = [], [], []
        for _ in range(2):
            c0, r0 = _ui_totals(spark)
            t = time.time()
            build().write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t, 3))
            c1, r1 = _ui_totals(spark)
            cpus_used.append(round(c1 - c0, 3))
            runt.append(round(r1 - r0, 3))
        best = min(range(2), key=lambda i: runs[i])
        out[name] = {
            "sec": runs[best],
            "runs": runs,
            "cpu_sec": cpus_used[best],
            "cpu_runs": cpus_used,
            "run_sec": runt[best],
        }

    # fresh fused pair at the same pinned level (raw-gate rerun for free)
    import bench

    fused: dict[str, float] = {}
    _, fused_sec = bench.run_frontier_pipeline(spark, n, fused)
    print(
        json.dumps(
            {
                "cores": cpus,
                "n": n,
                "materialize_sec": mat_sec,
                "stages": out,
                "fused": fused,
                "fused_sec": fused_sec,
                "urls_per_sec": round(n / fused_sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
