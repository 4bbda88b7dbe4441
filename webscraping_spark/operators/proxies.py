"""Proxy performance tracking — ``ProxyPerformance`` (download.py:51-68)
re-expressed over a fetch-event log.

Reference semantics: per proxy, a success RESETS the error count; an error
INCREMENTS it; after ``max_proxy_errors`` consecutive errors the proxy is
removed from the rotation (download.py:240-247). The reference mutates a
process-global defaultdict per event; the engine computes the same
consecutive-error state declaratively over an ordered event log:

    consecutive errors at event i  =  number of errors since the last
    success  =  count(errors) in (last_success_seq, i]

which is a per-proxy window — one hash shuffle on proxy, vectorized inside.
At 100 TB the log is partitioned by proxy (tiny key space: proxies number
in the thousands), so the window never buffers more than one proxy's
events per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FETCH_LOG_SCHEMA = "proxy string, seq long, ok boolean"


def consecutive_errors(fetch_log: DataFrame) -> DataFrame:
    """Per event: the proxy's consecutive-error count AFTER the event
    (reference ``ProxyPerformance.error`` return value; successes reset to
    0 — download.py:57-68). Input: (proxy, seq, ok)."""
    w = Window.partitionBy("proxy").orderBy("seq")
    # running count of successes so far splits the event stream into
    # "since last success" groups; rank within the group = the counter
    success_run = F.sum(F.when(F.col("ok"), 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = fetch_log.withColumn("_grp", success_run)
    # running ERROR count within the group (the group also contains the
    # success row that opened it — a row_number would count it)
    w2 = Window.partitionBy("proxy", "_grp").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, 0
    )
    err_run = F.sum(F.when(F.col("ok"), 0).otherwise(1)).over(w2)
    return grouped.withColumn(
        "consec_errors",
        F.when(F.col("ok"), F.lit(0)).otherwise(err_run).cast("int"),
    ).drop("_grp")


def bad_proxies(fetch_log: DataFrame, max_proxy_errors: int = 5) -> DataFrame:
    """Proxies whose consecutive-error count ever exceeded the budget —
    the removal set (download.py:243-247: ``error(...) > max_proxy_errors``
    => remove from the list)."""
    return (
        consecutive_errors(fetch_log)
        .filter(F.col("consec_errors") > max_proxy_errors)
        .select("proxy")
        .distinct()
    )


def drop_bad_proxies(
    proxies: DataFrame, fetch_log: DataFrame, max_proxy_errors: int = 5
) -> DataFrame:
    """The surviving rotation: proxies anti-joined against the removal set."""
    return proxies.join(
        F.broadcast(bad_proxies(fetch_log, max_proxy_errors)), "proxy", "left_anti"
    )
