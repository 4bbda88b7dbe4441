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
    w = (
        Window.partitionBy("domain", "_proxy")
        .orderBy(F.col("priority").desc(), F.col("seq").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = b.withColumn("_prior_delay", F.coalesce(F.sum("_jitter").over(w), F.lit(0.0)))
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
) -> DataFrame:
    """Repartition a planned batch for the fetch stage, salting hot domains.

    Politeness is already encoded in ``scheduled_offset`` (plan-on-unsalted),
    so splitting a domain across tasks cannot violate spacing; salting only
    fixes the straggler. ``salt = pmod(url_hash, S)`` with S sized from the
    domain's row count.
    """
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
    n = num_partitions or batch.sparkSession.sparkContext.defaultParallelism
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
