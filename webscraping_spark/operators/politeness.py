"""Per-domain politeness scheduling — planned fetch times instead of the
reference's busy-wait.

Reference semantics (Download.throttle, download.py:455-473): before each
fetch, sleep until ``now >= next_allowed[(proxy, extra, domain)]``, then set
``next_allowed = now + delay * (1 + variance * (rand() - 0.5))`` — i.e.
fetches of one domain are serialized at least ``delay*(1 - variance/2)``
apart with mean spacing ``delay``. The map is process-global
(download.py:454), so politeness holds across all threads.

Engine re-expression (no wall-clock sleeping, no global state):
  - Each batch is **planned**: within a domain, fetches are ordered by the
    pull order and assigned ``scheduled_offset`` = carry-in + running sum of
    jittered delays (Window.partitionBy(domain) lag-cumsum). The fetch
    stage then treats the offset as the earliest execution time.
  - Jitter is seeded — ``u = pmod(xxhash64(url, seed), 1M)/1M`` — giving the
    reference's mean/spread contract (doctests never pin the RNG) while
    staying reproducible across runs and cluster sizes.
  - Cross-batch state is the ``domain_state`` table
    (domain, proxy, next_allowed_offset), merged per superstep — the
    distributed analog of ``Download._domains``.
  - **Hot-domain skew**: the per-domain window is the skew point (AQE
    cannot split a window partition). The planner computes per-domain
    counts first; domains above ``hot_threshold`` still plan politeness on
    the unsalted key (correctness), but the subsequent fetch-stage
    repartition uses ``(domain, salt = pmod(url_hash, S_domain))`` so no
    single task owns a mega-domain (plan-on-unsalted, execute-on-salted —
    SURVEY.md §4 item 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DOMAIN_STATE_SCHEMA = "domain string, proxy string, next_allowed_offset double"


def jitter_col(delay: float, variance: float, seed: int) -> "F.Column":
    """Seeded per-URL jittered delay: delay * (1 + variance*(u - 0.5))."""
    u = F.pmod(F.xxhash64(F.col("url"), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    return F.lit(delay) * (F.lit(1.0) + F.lit(variance) * (u - F.lit(0.5)))


def plan_schedule(
    batch: DataFrame,
    domain_state: DataFrame,
    delay: float = 5.0,
    variance: float = 0.5,
    seed: int = 42,
    proxy_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Assign ``scheduled_offset`` (seconds from superstep start) to each
    row of the batch and roll ``domain_state`` forward.

    Returns (planned_batch, new_domain_state).

    Within a domain, row i's offset = carry_in + sum(jitter of rows < i):
    the first fetch of a domain in a batch may start immediately (offset =
    carry_in, 0 for unseen domains), and successive fetches are spaced by
    the jittered delay — exactly the reference's next-allowed arithmetic
    with the sleep replaced by a plan.
    """
    proxy = F.col(proxy_col) if proxy_col else F.lit("")
    b = batch.withColumn("_proxy", proxy).withColumn(
        "_jitter", jitter_col(delay, variance, seed)
    )
    # Distributed grouped prefix-sum. A naive
    # Window.partitionBy(domain).orderBy(...) cumsum is semantically what we
    # want, but Spark's window implementation buffers rows and a
    # repartitionByRange two-phase scan pays a sampling pass (one full
    # upstream re-evaluation) plus cross-partition offset plumbing. Hash
    # partitioning on (domain, proxy) needs ONE shuffle pass, keeps each
    # politeness group whole, and the in-partition grouped running sum is a
    # vectorized numpy scan. A mega-domain makes its partition larger, but
    # the scan is O(rows) numpy — measured cheaper than the range variant's
    # extra upstream pass at every skew level we generate; execution-side
    # straggler relief stays where it belongs, in salted_repartition after
    # planning.
    n_parts = batch.sparkSession.sparkContext.defaultParallelism
    order = [F.col("domain"), F.col("_proxy"), F.col("priority").desc(), F.col("seq").asc()]
    arranged = b.repartition(n_parts, "domain", "_proxy").sortWithinPartitions(*order)

    from pyspark.sql import types as T

    # StructType.add mutates in place — never call it on a live DF's schema
    schema = T.StructType(
        list(arranged.schema.fields) + [T.StructField("_prior_delay", T.DoubleType())]
    )
    out_cols = [f.name for f in schema.fields]

    def local_scan(batches):
        import numpy as np

        running: dict[tuple, float] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            prior = np.zeros(len(pdf))
            jit = pdf["_jitter"].to_numpy()
            keys = list(zip(pdf["domain"].to_numpy(), pdf["_proxy"].to_numpy()))
            # rows arrive sorted by (domain, proxy, order); group-contiguous
            start = 0
            for i in range(1, len(pdf) + 1):
                if i == len(pdf) or keys[i] != keys[start]:
                    base = running.get(keys[start], 0.0)
                    seg = jit[start:i]
                    cums = np.concatenate(([0.0], np.cumsum(seg[:-1]))) + base
                    prior[start:i] = cums
                    running[keys[start]] = base + float(seg.sum())
                    start = i
            out = pdf.copy()
            out["_prior_delay"] = prior
            yield out[out_cols]

    b = arranged.mapInPandas(local_scan, schema)
    state = domain_state.withColumnRenamed("proxy", "_proxy")
    planned = (
        b.join(F.broadcast(state), ["domain", "_proxy"], "left")
        .withColumn(
            "scheduled_offset",
            F.coalesce(F.col("next_allowed_offset"), F.lit(0.0)) + F.col("_prior_delay"),
        )
        .drop("next_allowed_offset")
    )
    new_state = (
        planned.groupBy("domain", "_proxy")
        .agg(
            F.max(F.col("scheduled_offset") + F.col("_jitter")).alias(
                "next_allowed_offset"
            )
        )
        .withColumnRenamed("_proxy", "proxy")
    )
    carried = domain_state.join(
        new_state.select("domain", F.col("proxy").alias("proxy")),
        ["domain", "proxy"],
        "left_anti",
    )
    return (
        planned.drop("_proxy", "_jitter", "_prior_delay"),
        new_state.unionByName(carried),
    )


def domain_counts(batch: DataFrame) -> DataFrame:
    """Per-domain row counts — the skew signal for salting decisions."""
    return batch.groupBy("domain").agg(F.count("*").alias("n_urls"))


def salted_repartition(
    batch: DataFrame,
    hot_threshold: int = 10_000,
    salt_rows_per_bucket: int = 2_000,
    num_partitions: int | None = None,
    salt_buckets: int | None = 32,
) -> DataFrame:
    """Repartition a planned batch for the fetch stage, salting hot domains.

    Politeness is already encoded in ``scheduled_offset`` (plan-on-unsalted),
    so splitting a domain across tasks cannot violate spacing; salting only
    fixes the straggler.

    Two modes:
      - ``salt_buckets=S`` (default): count-free — every row gets
        ``salt = pmod(url_hash, S)``; a hot domain spreads over up to S
        tasks and small domains are unharmed (their S sub-buckets hash to
        partitions together or apart, either is fine for fetch execution).
        Single pass, no extra aggregation job.
      - ``salt_buckets=None``: adaptive — measure per-domain counts and
        size salts per hot domain (an extra aggregation pass over the
        batch; worth it only when S must be tuned per domain).
    """
    n = num_partitions or batch.sparkSession.sparkContext.defaultParallelism
    if salt_buckets is not None:
        salted = batch.withColumn(
            "salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int")
        )
        return salted.repartition(n, "domain", "salt")
    counts = domain_counts(batch)
    hot = counts.filter(F.col("n_urls") > hot_threshold).withColumn(
        "n_salts",
        F.ceil(F.col("n_urls") / F.lit(salt_rows_per_bucket)).cast("int"),
    )
    salted = (
        batch.join(F.broadcast(hot.select("domain", "n_salts")), "domain", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_salts").isNotNull(),
                F.pmod(F.col("url_hash"), F.col("n_salts")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n_salts")
    )
    return salted.repartition(n, "domain", "salt")


def batch_wallclock(planned: DataFrame) -> DataFrame:
    """Politeness metrics per batch: the planned wall-clock is the max
    (scheduled_offset) over the batch; politeness wait vs compute is the
    headline efficiency metric in BENCH."""
    return planned.agg(
        F.max("scheduled_offset").alias("planned_makespan_sec"),
        F.avg("scheduled_offset").alias("mean_start_offset_sec"),
        F.count("*").alias("n_fetches"),
        F.countDistinct("domain").alias("n_domains"),
    )
