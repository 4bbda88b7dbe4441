"""Sequential semantic oracle — a tiny, line-traceable Python 3 model of
the reference's single-threaded crawl semantics, used to generate golden
visit orders / seen sets / politeness budgets for the Spark engine.

This is NOT engine code: it exists because the reference is Python 2 and
cannot execute in this sandbox (SURVEY.md §5). Every behavior is cited:

  - queue discipline:  deque pop (DFS, default) / popleft (BFS)  — download.py:811
  - seeds start in the queue but NOT in ``found``                — download.py:843-848
  - found[url] -> depth, defaultdict(int) (seeds read as 0)      — download.py:969, 1036
  - per-page link walk: normalize -> if new: mark found ->
    if valid: append, break at max_links                          — download.py:1033-1047
  - valid(): media-ext, http-prefix, same-domain, allowed/banned
    regex, robots, crawl_existing                                 — download.py:1010-1026
  - fetch/cache: cache hit skips fetch; meta-refresh redirect
    recursion; 301 followed transparently (urllib behavior);
    retries; counters                                             — download.py:173-284
  - throttle timeline: next_allowed[domain] = t + jittered delay  — download.py:455-473

The oracle "fetches" from a dict page store (the same fixture pages the
engine reads as a DataFrame), so oracle and engine see identical content.
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass, field

from webscraping_spark.functions.urlnorm import (
    MEDIA_EXTENSIONS,
    canonicalize_url,
    get_domain,
    get_extension,
    same_domain,
)

_LINKS_RE = re.compile("<a[^>]+href=[\"'](.*?)[\"']", re.IGNORECASE)
_META_REDIRECT_RE = re.compile(
    "<meta[^>]*?url=(.*?)[\"']", re.IGNORECASE | re.DOTALL
)


def get_meta_redirect(url: str, html: str) -> str | None:
    """Meta-refresh target (reference get_redirect, download.py:619-624)."""
    match = _META_REDIRECT_RE.search(html)
    if match:
        return canonicalize_url(url, match.group(1).strip())
    return None


@dataclass
class OracleConfig:
    depth_first: bool = False  # reference default True; BFS is our headline mode
    max_depth: int | None = 1
    max_links: int = 100
    allowed_urls: str = ""
    banned_urls: str = "^$"
    robots: dict[str, list[tuple[str, str, str]]] | None = None  # domain -> [(agent, rule, prefix)]
    user_agent: str = "wswp"
    crawl_existing: bool = True
    num_redirects: int = 1
    num_retries: int = 0
    delay: float = 5.0
    variance: float = 0.5


@dataclass
class OracleResult:
    visit_order: list[str] = field(default_factory=list)
    found: dict[str, int] = field(default_factory=dict)  # url -> depth
    queued: list[str] = field(default_factory=list)  # order links entered queue
    fetch_times: list[tuple[str, str, float]] = field(default_factory=list)  # (url, domain, t)
    num_downloads: int = 0
    num_errors: int = 0
    num_caches: int = 0


def _robots_allows(cfg: OracleConfig, link: str) -> bool:
    if not cfg.robots:
        return True
    rules = cfg.robots.get(get_domain(link))
    if not rules:
        return True
    from urllib.parse import urlsplit

    path = urlsplit(link).path or "/"
    # agent-specific rules beat '*', then file order; first match decides
    for want_exact in (True, False):
        for agent, rule, prefix in rules:
            if (agent == cfg.user_agent) != want_exact:
                continue
            if prefix == "" or path.startswith(prefix):
                return rule == "allow"
        if any(a == cfg.user_agent for a, _, _ in rules):
            return True  # exact section exists but nothing matched
    return True


def find_data_oracle(
    pages: dict[str, dict],
    extract_fn,
    website: str,
    max_depth: int | None = 1,
    max_urls: int | None = None,
    max_results: int | None = None,
):
    """Sequential model of DataCrawler.find (download.py:1080-1126):
    best-first (insertion-sorted link_score, pop lowest), same-netloc gate,
    scraped/result caps, order-preserving result dedup. Returns
    (results, visit_order)."""
    from urllib.parse import urlparse

    from webscraping_spark.plans.datacrawler import link_score

    netloc = urlparse(website).netloc
    inner = SequentialOracle(pages, OracleConfig(max_depth=max_depth))
    res = OracleResult()
    cache: dict[str, str] = {}
    clock = [0.0]
    next_allowed: dict[str, float] = {}
    scraped: set[str] = set()
    outstanding: list[tuple[int, str]] = [(0, website)]
    results: list[str] = []
    visit_order: list[str] = []
    while outstanding and (max_urls is None or len(scraped) < max_urls) and (
        max_results is None or len(results) < max_results
    ):
        _, url = outstanding.pop(0)
        scraped.add(url)
        visit_order.append(url)
        html = inner._fetch(url, res, cache, clock, next_allowed, 1) or ""
        if html:
            for item in extract_fn(html):
                if item not in results:
                    results.append(item)
                    if len(results) == max_results:
                        break
            for link in inner._crawl_links(url, html, res, cache):
                if urlparse(link).netloc == netloc and link not in scraped:
                    score = link_score(link)
                    for i, (other_score, _) in enumerate(outstanding):
                        if score < other_score:
                            outstanding.insert(i, (score, link))
                            break
                    else:
                        outstanding.append((score, link))
    return results, visit_order


class SequentialOracle:
    """threaded_get(num_threads=1) + CrawlerCallback over a dict store."""

    def __init__(self, pages: dict[str, dict], cfg: OracleConfig | None = None):
        self.pages = pages
        self.cfg = cfg or OracleConfig()

    # -- Download.get model -------------------------------------------------

    def _fetch(self, url: str, res: OracleResult, cache: dict, clock: list, next_allowed: dict, redirects_left: int) -> str | None:
        cfg = self.cfg
        if url in cache:
            res.num_caches += 1
            return cache[url]
        # throttle timeline (download.py:455-473): wait until domain slot
        domain = get_domain(url)
        t = max(clock[0], next_allowed.get(domain, 0.0))
        res.fetch_times.append((url, domain, t))
        next_allowed[domain] = t + cfg.delay  # oracle uses mean delay (jitter unpinned by doctests)
        clock[0] = t
        page = self.pages.get(url)
        if page is None:
            # missing page: the whole retry budget burns (download.py:227-251:
            # while num_retries >= 0 and html is None)
            res.num_errors += cfg.num_retries + 1
            cache[url] = ""
            return None
        if page["status_code"] >= 400:
            succeed_after = int(page.get("meta", {}).get("succeed_after", "0"))
            if 0 < succeed_after <= cfg.num_retries:
                # flaky page: attempt succeed_after+1 succeeds
                res.num_errors += succeed_after
            else:
                res.num_errors += cfg.num_retries + 1
                cache[url] = ""
                return None
        res.num_downloads += 1
        html = page["html"]
        # 301: urllib follows transparently; content is the target's
        if page["status_code"] in (301, 302) and page["final_url"] != url:
            target = self.pages.get(page["final_url"])
            html = target["html"] if target else ""
        # meta-refresh redirect (download.py:254-268)
        if redirects_left > 0:
            redirect_url = get_meta_redirect(url, html)
            if redirect_url:
                html = self._fetch(redirect_url, res, cache, clock, next_allowed, redirects_left - 1) or ""
        cache[url] = html
        return html

    # -- CrawlerCallback.crawl model -----------------------------------------

    def _crawl_links(self, url: str, html: str, res: OracleResult, cache: dict) -> list[str]:
        cfg = self.cfg
        allowed = re.compile(cfg.allowed_urls)
        banned = re.compile(cfg.banned_urls)
        domain = get_domain(url)
        depth = res.found.get(url, 0)  # defaultdict(int): seeds -> 0
        outstanding: list[str] = []
        if depth != cfg.max_depth:
            for raw in _LINKS_RE.findall(html):
                link = canonicalize_url(url, raw)
                if link in res.found:
                    continue
                res.found[link] = depth + 1
                if (
                    get_extension(link) not in MEDIA_EXTENSIONS
                    and link.lower().startswith("http")
                    and same_domain(domain, link)
                    and allowed.match(link)
                    and not banned.match(link)
                    and _robots_allows(cfg, link)
                    and (cfg.crawl_existing or link not in cache)
                ):
                    outstanding.append(link)
                    if len(outstanding) == cfg.max_links:
                        break
        return outstanding

    # -- threaded_get(num_threads=1) loop -------------------------------------

    def run(self, seeds: list[str]) -> OracleResult:
        cfg = self.cfg
        res = OracleResult()
        cache: dict[str, str] = {}
        clock = [0.0]
        next_allowed: dict[str, float] = {}
        queue = deque(seeds)
        while queue:
            url = queue.pop() if cfg.depth_first else queue.popleft()
            res.visit_order.append(url)
            html = self._fetch(url, res, cache, clock, next_allowed, cfg.num_redirects) or ""
            for link in self._crawl_links(url, html, res, cache):
                queue.append(link)
                res.queued.append(link)
        return res
