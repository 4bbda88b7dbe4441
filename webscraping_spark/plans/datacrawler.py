"""Best-first data crawl — the reference ``DataCrawler.find``
(download.py:1053-1126) as a Spark plan.

Semantics replicated:
  - link_score (download.py:1062-1078): contact=0, about=+10, help=+20,
    generic=+100, +len(link); LOWER is better. Engine stores
    priority = -score and pulls priority DESC.
  - outstanding is insertion-sorted, pop(0) takes the lowest score
    (download.py:1104, 1118-1125): ties resolve by insertion (discovery)
    order — our (priority desc, seq asc) pull order matches exactly.
  - same-netloc gate (download.py:1116: urlparse(link).netloc == domain),
    stricter than CrawlerCallback's registrable-domain check.
  - caps: stop when |scraped| >= max_urls or |results| >= max_results
    (download.py:1102-1103); results deduped order-preserving
    (download.py:1109-1113).
  - the CrawlerCallback found/valid chain still gates link discovery
    (find() delegates to CrawlerCallback.crawl, download.py:1115).

Batch size is 1 by construction — best-first order is inherently
sequential (each visit re-ranks the frontier). The extraction itself is a
vectorized UDF over the visited page's html.
"""

from __future__ import annotations

import urllib.parse
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscraping_spark.plans.crawl import CrawlConfig, CrawlJob
from webscraping_spark.operators.frontier import ORDER_BEST


def link_score(link: str) -> int:
    """Reference link_score (download.py:1062-1078)."""
    link = link.lower()
    if "contact" in link:
        total = 0
    elif "about" in link:
        total = 10
    elif "help" in link:
        total = 20
    else:
        total = 100
    return total + len(link)


def find_data(
    spark: SparkSession,
    pages: DataFrame,
    extract_fn: Callable[[str], list[str]],
    website: str,
    max_depth: int | None = 1,
    max_urls: int | None = None,
    max_results: int | None = None,
) -> tuple[list[str], list[str]]:
    """Crawl best-first from ``website``; extract results per visited page.

    Returns (results, visit_order). ``extract_fn`` runs driver-side per
    visited page html (batch=1 best-first crawl — the per-page extraction
    joins the visit loop; for corpus-scale extraction use the
    ``extract_*_udf`` column functions over the pages table instead).
    """
    netloc = urllib.parse.urlparse(website).netloc
    cfg = CrawlConfig(
        mode=ORDER_BEST, batch_size=1, max_depth=max_depth, frontier_dedup=True
    )
    job = CrawlJob(spark, pages, cfg)
    # restrict link discovery to the same netloc (download.py:1116)
    job.netloc_filter = netloc

    # per-visit page lookup: a 1-row filtered collect against the store
    # (parquet pushdown applies), NOT an O(corpus) whole-store collect —
    # best-first is batch=1 sequential by contract, so one tiny job per
    # visit is the floor anyway
    store = job.store.select("url", "serve_html")

    def _html_for(url: str) -> str | None:
        rows = store.filter(F.col("url") == url).limit(1).collect()
        return rows[0]["serve_html"] if rows else None

    results: list[str] = []
    visit_order: list[str] = []
    job.run([website], max_supersteps=0)  # seed only
    while True:
        if max_urls is not None and len(visit_order) >= max_urls:
            break
        if max_results is not None and len(results) >= max_results:
            break
        before = job._visit_idx
        job.run([], max_supersteps=1)
        if job._visit_idx == before:
            break
        url = job.last_batch_visits[-1]
        visit_order.append(url)
        html = _html_for(url)
        if html:
            for item in extract_fn(html):
                if item not in results:
                    results.append(item)
                    if max_results is not None and len(results) >= max_results:
                        break
    return results, visit_order
