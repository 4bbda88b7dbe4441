"""Recrawl scheduling from observed change history (the Cho &
Garcia-Molina revisit policy family): estimate each URL's change
frequency from consecutive fetch observations and rank stale,
fast-changing pages first for the next crawl cycle.

Reference tie-in: the reference recrawls via cache expiry alone
(pdict.py:51,202-205 — a fixed TTL per PersistentDict). A fixed TTL
refetches a never-changing page as often as a news front page; at a
10^10-URL corpus the refetch budget IS the crawl budget, so the engine
upgrades the policy: per-URL empirical change rate x staleness, the
classic uniform-vs-proportional revisit tradeoff.

Shape: one ``lag`` window + one aggregation, both keyed on the URL —
Catalyst reuses a single hash partitioning for the two (exactly one
Exchange end-to-end), and both are map-side combinable downstream of it.
The history table never leaves the executors.

Determinism: rates live in integer micro-units (``div`` floor division,
never ``/``) and the priority is an integer product — reduction-order-
free, bit-identical across partitionings and engines, the same device as
graph.py's integer PageRank. ``now_ts`` is an explicit argument: an
implicit clock would make the ranking unreproducible across runs (and
``Date.now`` is banned engine-wide for exactly that reason).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def recrawl_priorities(
    history: DataFrame,
    now_ts: int,
    url_col: str = "url_hash",
    ts_col: str = "crawl_ts",
    content_col: str = "content_hash",
) -> DataFrame:
    """Per-URL change statistics and recrawl priority from a fetch
    history of ``(url, fetch timestamp, content fingerprint)`` rows.

    Emits one row per URL:

    - ``n_visits`` — observations in the history.
    - ``n_changes`` — consecutive-observation fingerprint changes
      (ordered by ``(ts, content)``; the content tie-break keeps ``lag``
      deterministic if a history ever carries duplicate timestamps).
    - ``change_rate_micro`` — changes per revisit interval in integer
      micro-units: ``n_changes * 1e6 div (n_visits - 1)``, 0 for a
      single-visit URL (no interval observed — no evidence it changes).
    - ``staleness`` — ``now_ts`` minus the last observation.
    - ``priority`` — ``change_rate_micro * staleness``: a page twice as
      stale or twice as volatile is twice as urgent; never-changing
      pages rank 0 regardless of age (proportional policy; callers
      wanting guaranteed eventual refresh can add a uniform floor to
      the column before ranking).
    """
    url, ts, content = F.col(url_col), F.col(ts_col), F.col(content_col)
    w = Window.partitionBy(url).orderBy(ts, content)
    prev = F.lag(content).over(w)
    # the URL column keeps its name end-to-end: an alias between the
    # window and the aggregation hides the partitioning equivalence from
    # EnsureRequirements and buys a second full shuffle
    obs = history.select(
        url,
        ts.alias("__ts"),
        (prev.isNotNull() & (prev != content)).cast("long").alias("changed"),
    )
    agg = obs.groupBy(url_col).agg(
        F.count("*").alias("n_visits"),
        F.sum("changed").alias("n_changes"),
        F.max("__ts").alias("last_ts"),
    )
    rate = F.when(
        F.col("n_visits") > 1,
        F.expr(f"(n_changes * {MICRO}) div (n_visits - 1)"),
    ).otherwise(F.lit(0).cast("long"))
    return agg.select(
        F.col(url_col),
        F.col("n_visits").cast("long").alias("n_visits"),
        F.col("n_changes").cast("long").alias("n_changes"),
        rate.alias("change_rate_micro"),
        (F.lit(now_ts).cast("long") - F.col("last_ts").cast("long")).alias(
            "staleness"
        ),
        (
            rate * (F.lit(now_ts).cast("long") - F.col("last_ts").cast("long"))
        ).alias("priority"),
    )


def schedule_recrawls(
    priorities: DataFrame, k: int, url_col: str = "url_hash"
) -> DataFrame:
    """The next crawl cycle's batch: top-k by ``(priority DESC, url)`` —
    ``orderBy().limit()`` compiles to TakeOrderedAndProject (per-partition
    heaps + a k-row driver merge), never a full sort of the corpus."""
    return priorities.orderBy(
        F.col("priority").desc(), F.col(url_col)
    ).limit(k)


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Diff two crawl snapshots by URL: ``(url, change)`` where change is
    'added' (in new only), 'removed' (in old only), 'changed' (both, hash
    differs) or 'same' — the observation feed for the change-rate
    estimator above (each 'changed'/'same' row is one (url, fetched,
    changed?) history event) and the crawl-ops dashboard's churn signal.

    One full-outer join on the URL — both snapshots are typically stored
    bucketed by url_hash (the visited-table convention, plans/crawl.py),
    in which case this is a zero-exchange sort-merge over co-located
    buckets. No Python, no window."""
    o = old.select(F.col(url_col).alias("url"), F.col(hash_col).alias("_oh"))
    n = new.select(F.col(url_col).alias("url"), F.col(hash_col).alias("_nh"))
    j = o.join(n, "url", "full_outer")
    return j.select(
        "url",
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("change"),
    )


def domain_churn(diff: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-domain churn from a ``crawl_diff`` output: ``(domain, n_added,
    n_removed, n_changed, n_same, churn_pct)`` — the aggregate that
    decides which hosts earn a faster revisit cadence before any per-URL
    history exists (a domain with 40% churn between two crawls needs
    denser sampling than a static archive). churn_pct is integer percent
    of non-removed URLs that are added or changed (floor division —
    engine-reproducible). One map-side-combinable groupBy on domain."""
    from webscraping_spark.functions.udfs import get_domain_col

    agg = diff.groupBy(get_domain_col(F.col(url_col)).alias("domain")).agg(
        F.sum((F.col("change") == "added").cast("long")).alias("n_added"),
        F.sum((F.col("change") == "removed").cast("long")).alias("n_removed"),
        F.sum((F.col("change") == "changed").cast("long")).alias("n_changed"),
        F.sum((F.col("change") == "same").cast("long")).alias("n_same"),
    )
    live = F.col("n_added") + F.col("n_changed") + F.col("n_same")
    return agg.select(
        "domain",
        "n_added",
        "n_removed",
        "n_changed",
        "n_same",
        F.when(
            live > 0,
            F.expr(
                "CAST(100 * (n_added + n_changed) AS BIGINT) div "
                "CAST(n_added + n_changed + n_same AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("churn_pct"),
    )
