"""HTTP conditional revalidation: Cache-Control / ETag / Last-Modified
freshness policy and 304-merge — the real-protocol extension of the
reference's wall-clock cache TTL (pdict.py:51,202-205 ``expires``:
serve-from-cache while ``now - t < expires``; download.py:210-213 the
empty-cache redownload).

A production recrawler does not binary serve-or-refetch: stale entries
with a validator are REVALIDATED with a conditional request, and a 304
answer refreshes the entry for the cost of headers instead of a body.
At 10^10 URLs that difference is most of the recrawl bandwidth. The
policy here is the RFC 9111 subset that matters for a crawler:

- ``Cache-Control: no-store``  -> never serve or revalidate; full fetch
- ``Cache-Control: no-cache``  -> always revalidate (even while fresh)
- ``Cache-Control: max-age=N`` -> overrides the crawler's default TTL
- fresh (age < TTL)            -> serve from cache, no request at all
- stale with ETag              -> revalidate with If-None-Match
- stale with Last-Modified     -> revalidate with If-Modified-Since
  (ETag wins when both exist, per RFC 9110 §13.1.2 precedence)
- stale with neither           -> full refetch

Everything is pure-codegen column arithmetic (token-safe header parsing
in the Java/RE2 shared regex subset) — zero shuffle, zero Python; the
policy fuses into the cache-table scan. ``merge_revalidated`` is one
equi-join on url: 304 keeps the cached body and bumps fetched_at, 200
replaces body and validators, errors keep the cached row but surface the
status (the reference's acceptable-error shape, download.py:447-448).

Timestamps are integer microseconds on the engine's politeness timeline
(the q_cache_ttl_filter convention) — never wall-clock epoch math, so
plans are deterministic and engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACTION_SERVE = "serve"
ACTION_REVALIDATE = "revalidate"
ACTION_REFETCH = "refetch"


def _cc_token(cache_control: Column, token: str) -> Column:
    """Case-insensitive comma-separated token match (not substring:
    'no-cache' must not fire on 'x-no-cache-hint')."""
    return F.coalesce(
        cache_control.rlike("(?i)(^|[ \\t,])%s([ \\t,;=]|$)" % token), F.lit(False)
    )


def max_age_us_col(cache_control: Column) -> Column:
    """max-age seconds -> microseconds, NULL when absent/unparsable."""
    secs = F.regexp_extract(
        F.coalesce(cache_control, F.lit("")), "(?i)(^|[ \\t,])max-age=(\\d+)", 2
    )
    return F.when(secs != "", secs.cast("long") * 1_000_000)


def cache_policy(
    cached: DataFrame, now_us: int, default_ttl_us: int
) -> DataFrame:
    """Per-entry freshness decision over (url, fetched_at_us, etag,
    last_modified, cache_control): adds ``action`` plus the conditional
    request headers (``if_none_match`` / ``if_modified_since``, NULL
    unless action == 'revalidate').

    One codegen projection; feed the 'revalidate'/'refetch' partitions to
    the fetch adapter and serve the rest straight from cache."""
    age = F.lit(int(now_us)) - F.col("fetched_at_us")
    cc = F.col("cache_control")
    no_store = _cc_token(cc, "no-store")
    no_cache = _cc_token(cc, "no-cache")
    ttl = F.coalesce(max_age_us_col(cc), F.lit(int(default_ttl_us)))
    fresh = age < ttl
    has_etag = F.col("etag").isNotNull() & (F.col("etag") != "")
    has_lm = F.col("last_modified").isNotNull() & (F.col("last_modified") != "")
    action = (
        F.when(no_store, F.lit(ACTION_REFETCH))
        .when(no_cache & (has_etag | has_lm), F.lit(ACTION_REVALIDATE))
        .when(no_cache, F.lit(ACTION_REFETCH))
        .when(fresh, F.lit(ACTION_SERVE))
        .when(has_etag | has_lm, F.lit(ACTION_REVALIDATE))
        .otherwise(F.lit(ACTION_REFETCH))
    )
    revalidating = action == ACTION_REVALIDATE
    return cached.withColumns(
        {
            "action": action,
            # ETag precedence (RFC 9110 §13.1.2): send ONE validator
            "if_none_match": F.when(revalidating & has_etag, F.col("etag")),
            "if_modified_since": F.when(
                revalidating & ~has_etag & has_lm, F.col("last_modified")
            ),
        }
    )


def merge_revalidated(
    cached: DataFrame, responses: DataFrame, now_us: int
) -> DataFrame:
    """Fold conditional-fetch responses back into the cache table.

    cached:    (url, body, fetched_at_us, etag, last_modified, ...)
    responses: (url, status_code, new_body, new_etag, new_last_modified)

    304 -> cached body kept, fetched_at bumped (the entry is fresh again,
           validators refreshed if the response carried them);
    200 -> body and validators replaced, fetched_at bumped;
    4xx/5xx or no response row -> cached row unchanged, last_status
           surfaces the error for the retry/acceptable-error routing
           (download.py:447-448).

    One left equi-join on url (broadcastable: the response batch is the
    bounded fetch batch, not the corpus)."""
    r = responses.select(
        F.col("url").alias("_r_url"),
        F.col("status_code").alias("_r_status"),
        F.col("new_body").alias("_r_body"),
        F.col("new_etag").alias("_r_etag"),
        F.col("new_last_modified").alias("_r_lm"),
    )
    joined = cached.join(r, cached["url"] == F.col("_r_url"), "left")
    got_304 = F.col("_r_status") == 304
    got_200 = F.col("_r_status") == 200
    refreshed = got_304 | got_200
    return (
        joined.withColumns(
            {
                "body": F.when(got_200, F.col("_r_body")).otherwise(F.col("body")),
                "fetched_at_us": F.when(
                    refreshed, F.lit(int(now_us))
                ).otherwise(F.col("fetched_at_us")),
                "etag": F.when(
                    refreshed, F.coalesce(F.col("_r_etag"), F.col("etag"))
                ).otherwise(F.col("etag")),
                "last_modified": F.when(
                    refreshed, F.coalesce(F.col("_r_lm"), F.col("last_modified"))
                ).otherwise(F.col("last_modified")),
                "last_status": F.col("_r_status"),
            }
        )
        .drop("_r_url", "_r_status", "_r_body", "_r_etag", "_r_lm")
    )


# ---------------------------------------------------------------------------
# Retry-After (RFC 9110 §10.2.3): the server-driven politeness signal on
# 429/503 responses — delta-seconds or an IMF-fixdate. Both forms parse
# TZ-invariantly (the date form is differenced against a NOW given in the
# same format through the same parser, so session-timezone offsets cancel)
# and feed the planner's domain-delay seam.
# ---------------------------------------------------------------------------

# Spark's proleptic parser rejects 'EEE' as a PARSE pattern; the weekday
# is redundant in an IMF-fixdate, so it is stripped pre-parse (DuckDB
# twin does the same strip, keeping the chains identical)
_HTTP_DATE_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"


def _http_ts(s: Column) -> Column:
    return F.try_to_timestamp(
        F.regexp_replace(F.trim(s), r"^[A-Za-z]{3},\s*", ""), F.lit(_HTTP_DATE_FMT)
    )


def retry_after_seconds_col(header: Column, now_http_date: Column) -> Column:
    """Seconds to hold off, from a Retry-After header value: delta-
    seconds pass through (bounded to 9 digits — ANSI-safe), an
    IMF-fixdate differences against ``now_http_date`` (same format),
    past dates clamp to 0, unparseable values -> NULL (no signal)."""
    h = F.trim(header)
    delta = F.when(h.rlike(r"^\d{1,9}$"), h.cast("long"))
    ts = _http_ts(h)
    now = _http_ts(now_http_date)
    date_secs = F.when(
        ts.isNotNull() & now.isNotNull(), ts.cast("long") - now.cast("long")
    )
    out = F.coalesce(delta, date_secs)
    return F.when(out.isNotNull(), F.greatest(out, F.lit(0).cast("long")))


def retry_after_overrides(
    responses: DataFrame,
    now_http_date: str,
    domain_col: str = "domain",
    header_col: str = "retry_after",
) -> DataFrame:
    """Per-domain hold-off from a batch of responses: ``(domain,
    crawl_delay)`` — the MAX parsed Retry-After per domain, in the
    plan_schedule(domain_delays=...) shape (config delay stays the
    floor there; adaptive_delays composes via greatest upstream).
    Rows with no parseable signal drop out. One map-side-combinable
    groupBy over only the (tiny) signal-bearing rows."""
    secs = retry_after_seconds_col(F.col(header_col), F.lit(now_http_date))
    return (
        responses.select(F.col(domain_col).alias("domain"), secs.alias("_s"))
        .filter(F.col("_s").isNotNull())
        .groupBy("domain")
        .agg((F.max("_s").cast("double")).alias("crawl_delay"))
    )
