"""CDX-style capture index with SURT keys — the Wayback Machine /
Common Crawl lookup layout: every capture as one
``(surt, timestamp, digest, url, ...)`` row, globally ordered by
``(surt, timestamp)`` so a URL lookup is a binary search over sorted,
range-partitioned files instead of a corpus scan.

Reference tie-in: the reference answers "have I fetched this URL, and
what did it say?" with a sqlite point lookup (pdict.py:119-137
``__contains__``/``__getitem__``). At archive scale the equivalent is a
sorted capture index over the fetched-page table; SURT (Sort-friendly
URI Reordering Transform) is the public convention that makes
same-site captures sort adjacently — ``http://www.example.com/p`` ->
``com,example,www)/p`` — so a domain's whole history is one contiguous
range (one partition-pruned scan, not a shuffle).

SURT variant implemented (documented subset of the IA spec): lowercase,
scheme dropped, host labels reversed and comma-joined, ``)``
separator, path+query kept verbatim (no www-stripping, no query-param
re-sorting — those are CANONICALIZATION choices; this engine
canonicalizes with the reference-parity kernel *before* indexing, so
the index key stays a pure reversible reordering). Everything is JVM
expressions in the Java-regex/RE2 shared subset, so a SQL oracle can
re-derive the key character for character.

Scale shape: the index build is one ``repartitionByRange`` (sampled
range boundaries — no single-task global sort) + per-partition sort;
file N holds a contiguous SURT range, which is exactly the layout
CDX-server sharding expects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#:]*)"
_PORTPATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#:]*([^#]*)"


def surt_col(url: Column) -> Column:
    """The SURT key of a URL column — codegen only.

    ``https://WWW.Example.COM:8080/Path?b=2`` ->
    ``com,example,www:8080)/path?b=2`` (the port rides with the host,
    IA convention; a URL with no path gets the bare ``)/``)."""
    u = F.lower(url)
    host = F.regexp_extract(u, _HOST_RE, 1)
    # port (if any) plus path+query — everything after the authority's
    # host labels, fragment already out of scope for index keys
    after = F.regexp_extract(u, _PORTPATH_RE, 1)
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    path = F.when(after == "", F.lit("/")).otherwise(
        F.when(after.startswith(":") | after.startswith("/"), after)
        .otherwise(F.concat(F.lit("/"), after))
    )
    # ':8080/p' keeps the port before the ')': 'com,example:8080)/p'
    port = F.when(path.startswith(":"), F.substring_index(path, "/", 1)).otherwise(
        F.lit("")
    )
    rest = F.when(
        path.startswith(":"),
        F.substr(path, F.length(port) + 1, F.length(path)),
    ).otherwise(path)
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(rev, port, F.lit(")"), rest)


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "crawl_ts",
    payload_col: str | None = "html",
    num_files: int | None = None,
) -> DataFrame:
    """Build the sorted capture index: one row per capture with
    ``(surt, ts, digest, url)``, globally ordered by ``(surt, ts)`` via
    range repartitioning (sampled boundaries, parallel sorts — never a
    single-task global sort). ``digest`` is the md5 of the payload (the
    CDX content-digest column; NULL payload -> NULL digest). Write the
    result with ``maxRecordsPerFile``/partitioned paths and each output
    file holds one contiguous SURT range — the CDX-server shard layout."""
    out = captures.select(
        surt_col(F.col(url_col)).alias("surt"),
        F.col(ts_col).alias("ts"),
        (F.md5(F.col(payload_col)) if payload_col else F.lit(None)).alias(
            "digest"
        ),
        F.col(url_col).alias("url"),
    )
    n = num_files or out.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, "surt", "ts").sortWithinPartitions(
        "surt", "ts"
    )
