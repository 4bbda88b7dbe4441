"""Pluggable fetch-adapter contract: the one seam between this engine and a
live network crawler.

The engine's fetch stage is a page-store join by sandbox necessity (no
network), but everything downstream — cache classification, retry/redirect
accounting, politeness, extraction — consumes only the adapter's OUTPUT
shape. Any callable with this signature slots in:

    FetchAdapter = Callable[[DataFrame], DataFrame]
      input:  a batch of claimed URLs        (url string)
      output: one row per input url, schema  FETCH_SCHEMA
              url              echo of the input url
              final_url        post-redirect URL (== url when no redirect)
              status_code      HTTP status (NULL = transport error)
              payload          raw response body bytes (pre-decode)
              content_encoding Content-Encoding header (gzip/deflate/NULL)

Two implementations ship:

  * store_adapter(pages)  — the sandbox path: a broadcast-free left join
    against a page-store table (what CrawlJob's fetch stage does today,
    reference download.py:379-451 resolved relationally).
  * batch_adapter(fn)     — the live path: an Arrow-batched mapInPandas
    over the URL batch; ``fn`` receives a list of URLs and returns their
    fetch results (this is where urllib/requests/httpx goes on a real
    cluster — each Arrow batch is one worker's politeness-window of
    fetches). No per-row Python crosses the Spark boundary; the batch
    function is the per-partition fetch loop.

``as_downloader(adapter)`` bridges either one onto CrawlJob's ``downloader``
hook (threaded_get's ``dl``, download.py:789/819): payload bytes are
transfer-decoded + charset-sniffed to html exactly like the engine's store
ingestion (functions/decode.decode_html_bytes), non-2xx/missing payloads
become NULL html. The downloader-hook e2e test runs through this bridge, so
the engine is demonstrably one ``batch_adapter(real_fetch)`` away from a
live crawler.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_SCHEMA = (
    "url string, final_url string, status_code int, "
    "payload binary, content_encoding string"
)

# one fetch-result row: (url, final_url, status_code, payload, content_encoding)
FetchBatchFn = Callable[[Sequence[str]], Iterable[tuple]]


def store_adapter(pages: DataFrame) -> Callable[[DataFrame], DataFrame]:
    """Adapter over a page-store table: resolve each URL batch by left join
    (the sandbox stand-in for the network). Pages carry decoded ``html``;
    the contract ships bytes, so the payload is the utf-8 encoding and
    content_encoding is NULL — the identity transfer-decode."""
    resolved = pages.select(
        "url",
        F.coalesce(F.col("final_url"), F.col("url")).alias("final_url"),
        F.col("status_code").cast("int").alias("status_code"),
        F.encode(F.col("html"), "utf-8").alias("payload"),
        F.lit(None).cast("string").alias("content_encoding"),
    )

    def fetch(urls: DataFrame) -> DataFrame:
        return urls.select("url").join(resolved, "url", "left")

    return fetch


def batch_adapter(
    fn: FetchBatchFn, max_batch: int | None = None
) -> Callable[[DataFrame], DataFrame]:
    """Adapter over a per-batch fetch function (the LIVE path): each Arrow
    batch of claimed URLs is handed to ``fn`` as a list; ``fn`` returns the
    fetch-result tuples. On a real cluster ``fn`` is the place for
    urllib/requests with its own connection pool — one call per Arrow batch
    per worker, never per row. ``max_batch`` caps rows per call (politeness
    windows); None leaves Spark's Arrow batch size in charge."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        cols = ["url", "final_url", "status_code", "payload", "content_encoding"]
        for pdf in batches:
            urls = pdf["url"].tolist()
            step = max_batch or len(urls) or 1
            for lo in range(0, len(urls), step):
                rows = list(fn(urls[lo : lo + step]))
                out = pd.DataFrame(rows, columns=cols)
                out["status_code"] = out["status_code"].astype("Int32")
                yield out

    def fetch(urls: DataFrame) -> DataFrame:
        return urls.select("url").mapInPandas(run, FETCH_SCHEMA)

    return fetch


def as_downloader(
    adapter: Callable[[DataFrame], DataFrame]
) -> Callable[[DataFrame], DataFrame]:
    """Bridge a FetchAdapter onto CrawlJob's ``downloader`` hook signature
    (urls -> (url, html)): transfer-decode + charset-sniff the payload the
    same way store ingestion does, NULL html for non-2xx/errored rows
    (the reference dl contract serves content or nothing)."""
    from webscraping_spark.functions.decode import decode_and_sniff_udf

    def dl(urls: DataFrame) -> DataFrame:
        fetched = adapter(urls)
        ok = (
            F.col("status_code").isNotNull()
            & (F.col("status_code") >= 200)
            & (F.col("status_code") < 300)
            & F.col("payload").isNotNull()
        )
        return fetched.select(
            "url",
            F.when(
                ok, decode_and_sniff_udf(F.col("payload"), F.col("content_encoding"))
            ).alias("html"),
        )

    return dl
