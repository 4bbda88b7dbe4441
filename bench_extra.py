"""Round-6 component dissection of the fused bench pipeline (guide §1.4):
each sub-plan is a PREFIX (or ablation) of bench._build_pipeline, timed with
the noop sink, best of 2, so the cost of every operator in the superstep can
be read off by differencing. Does NOT touch bench.py (frozen).

Usage: SPARK_GRAFT_CPUS=32 python bench_extra.py [n]
Prints one JSON line {"n": N, "cores": C, "components": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def components(spark, n: int):
    import bench
    from webscraping_spark.functions import udfs
    from webscraping_spark.operators import politeness
    from webscraping_spark.operators.seen import BloomSeenSet, ExactSeenSet

    def frontier():
        return bench.materialized_frontier(spark, n)

    def c0_scan():
        return frontier()

    def _canon_jvm_only(df, base_col, link_col, out_col):
        """The JVM half of canonicalize_split compact mode, with the pandas
        kernel hop replaced by a copy of the link (ablation: measures the
        Arrow round-trip's cost by diff with c2)."""
        base = F.col(base_col)
        link = F.col(link_col)
        # reuse the real predicates by calling canonicalize_split on a
        # dummy and stealing nothing -- instead, inline the public pieces
        tier0 = udfs.clean_link_predicate(link)
        decoded = F.replace(F.substring_index(link, "#", 1), F.lit("&amp;"), F.lit("&"))
        return df.withColumn(out_col, F.when(tier0, link).otherwise(F.concat(base, decoded)))

    def c1_canon_jvm():
        return _canon_jvm_only(frontier(), "base_url", "raw_link", "url")

    def c2_canon_full():
        return udfs.canonicalize_split(frontier(), "base_url", "raw_link", "url", compact=True)

    def c3_hash_domain():
        return (
            c2_canon_full()
            .select("priority", "seq", "url")
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("domain", udfs.get_domain_col(F.col("url")))
            .withColumn("depth", F.lit(1))
        )

    def c3a_hash_only():
        return (
            c2_canon_full()
            .select("priority", "seq", "url")
            .withColumn("url_hash", F.xxhash64("url"))
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

    def c4_unseen():
        exact = ExactSeenSet(seen_rows())
        bloom = BloomSeenSet.empty(
            spark,
            num_partitions=max(spark.sparkContext.defaultParallelism, 8),
            expected_items_per_partition=max(
                n // 4 // max(spark.sparkContext.defaultParallelism, 8), 1000
            ),
        )
        return bloom.filter_unseen_prefilter(
            c3_hash_domain(), exact, seen_join="broadcast"
        ).drop("url_hash", "depth")

    def c5_planned():
        state = spark.createDataFrame([], politeness.DOMAIN_STATE_SCHEMA)
        planned, _ = politeness.plan_schedule(
            c4_unseen(), state, delay=5.0, variance=0.5, seed=42, hot_group_rows=None
        )
        return planned

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

    def c6_fetch_join():
        return c5_planned().join(store().hint("shuffle_hash"), "url", "left")

    def c7_extract():
        fetched = c6_fetch_join()
        return fetched.filter(F.col("serve_html").isNotNull()).select(
            "url",
            "seq",
            "scheduled_offset",
            F.posexplode(udfs.find_links_col(F.col("serve_html"))).alias("pos", "raw"),
        )

    def c8_full():
        return udfs.canonicalize_split(c7_extract(), "url", "raw", "link", compact=True)

    return {
        "c0_scan": c0_scan,
        "c1_canon_jvm": c1_canon_jvm,
        "c2_canon_full": c2_canon_full,
        "c3a_hash_only": c3a_hash_only,
        "c3_hash_domain": c3_hash_domain,
        "c4_unseen": c4_unseen,
        "c5_planned": c5_planned,
        "c6_fetch_join": c6_fetch_join,
        "c7_extract": c7_extract,
        "c8_full": c8_full,
    }


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    from webscraping_spark.session import get_spark

    spark = get_spark(app_name=f"dissect_r6_local{cpus}", cores=cpus)
    builders = components(spark, n)

    # warm: full pipeline at n/4 (codegen + python workers)
    small = components(spark, max(n // 4, 10_000))
    small["c8_full"]().write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    only = os.environ.get("DISSECT_ONLY")
    out: dict[str, float] = {}
    for name, build in builders.items():
        if only and name not in only.split(","):
            continue
        runs = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"dissect:{name}")
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = min(runs)
        out[f"{name}_runs"] = runs
        spark.sparkContext.setJobDescription(None)
        # mirror bench.py's inter-measurement hygiene: hand the heap back
        # so later components don't measure earlier components' residue
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
    print(json.dumps({"cores": cpus, "n": n, "components": out}))
    spark.stop()


if __name__ == "__main__":
    main()
