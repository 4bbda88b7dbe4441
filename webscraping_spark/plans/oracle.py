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
    # required-content regex (download.py:373-376): failing html counts as
    # a failed attempt (deterministic content burns the budget)
    pattern: str = ""
    # status codes returned as default after ONE error (download.py:447-448)
    acceptable_errors: tuple = ()
    delay: float = 5.0
    variance: float = 0.5
    # cache TTL in politeness-timeline seconds (pdict.py:202-205 is_fresh:
    # a cached entry older than `expires` at read time is re-fetched)
    expires: float | None = None


@dataclass
class OracleResult:
    visit_order: list[str] = field(default_factory=list)
    found: dict[str, int] = field(default_factory=dict)  # url -> depth
    queued: list[str] = field(default_factory=list)  # order links entered queue
    fetch_times: list[tuple[str, str, float]] = field(default_factory=list)  # (url, domain, t)
    num_downloads: int = 0
    num_errors: int = 0
    num_caches: int = 0
    last_base: str | None = None  # link-resolution base of the last visit


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
        self._cache_status: dict[str, str] = {}  # meta['status'] twin

    def _invalid_response(self, html: str | None) -> bool:
        """invalid_response (download.py:373-376)."""
        return html is None or bool(
            self.cfg.pattern
            and not re.search(self.cfg.pattern, html, re.DOTALL | re.IGNORECASE)
        )

    # -- Download.get model -------------------------------------------------

    def _fetch_frame(
        self, url: str, res: OracleResult, cache: dict, clock: list,
        next_allowed: dict, redirects_left: int, cache_time: dict,
    ) -> tuple[str | None, int, int, str | None]:
        """One Download.get frame. Returns (html, downloads, errors, base).

        Counter semantics replicate the reference precisely: every nested
        ``get()`` RESETS ``self.num_downloads/num_errors`` at entry
        (download.py:188), so after a meta-refresh recursion the counters a
        visit reports are the INNERMOST frame's — a redirect hop's fetch of
        the outer page leaves no trace, and a redirect into an
        already-cached page reports (0, 0), which ``threaded_get`` counts
        as a cache hit (download.py:839-840).

        ``base`` is the URL relative links in the returned html resolve
        against: the reference rewrites relative hrefs bottom-up through
        ``urljoin(frame_url, ...)`` (download.py:264-268), so the innermost
        frame that followed a redirect wins — the page whose meta tag led
        to the final content. None means "no redirect followed" (caller
        uses the page URL).
        """
        cfg = self.cfg
        budget = cfg.num_retries
        if url in cache:
            html_cached: str | None = cache[url]
            if self._invalid_response(html_cached):
                html_cached = None
            # TTL freshness (pdict.py:202-205): now - fetched_at < expires
            expired = cfg.expires is not None and (
                clock[0] - cache_time.get(url, 0.0) >= cfg.expires
            )
            if not expired:
                if not html_cached and budget > 0:
                    # empty/invalid entry with retries left: re-download
                    # ("Redownloading", download.py:216-218) with one attempt
                    # consumed — unless the recorded status was 404
                    if self._cache_status.get(url, "").startswith("404"):
                        return "", 0, 0, None
                    budget -= 1
                else:
                    return html_cached or "", 0, 0, None
            # fall through and re-fetch (refreshes the entry)
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
            cache[url] = ""
            cache_time[url] = t
            self._cache_status[url] = ""
            return None, 0, budget + 1, None
        downloads, errors = 1, 0
        status = page["status_code"]
        self._cache_status[url] = str(status) if status != 200 else ""
        if status >= 400:
            if cfg.acceptable_errors and status in cfg.acceptable_errors:
                # acceptable: ONE failed attempt, default returned, no retry
                cache[url] = ""
                cache_time[url] = t
                return "", 0, 1, None
            succeed_after = int(page.get("meta", {}).get("succeed_after", "0"))
            if 0 < succeed_after <= budget:
                # flaky page: attempt succeed_after+1 succeeds
                errors = succeed_after
            else:
                cache[url] = ""
                cache_time[url] = t
                return None, 0, budget + 1, None
        html = page["html"]
        base: str | None = None
        # 301: urllib follows transparently; content is the target's —
        # the pattern gate therefore sees the post-redirect content
        if page["status_code"] in (301, 302) and page["final_url"] != url:
            target = self.pages.get(page["final_url"])
            html = target["html"] if target else ""
        if cfg.pattern and not re.search(cfg.pattern, html or "", re.DOTALL | re.IGNORECASE):
            # pattern gate (download.py:425-428): every attempt downloads
            # the same non-matching content — the budget burns
            cache[url] = ""
            cache_time[url] = t
            return None, 0, budget + 1, None
        # meta-refresh redirect (download.py:254-268): full nested get —
        # which RESETS the counters (the reference's observable behavior)
        if redirects_left > 0:
            redirect_url = get_meta_redirect(url, html)
            if redirect_url:
                inner_html, downloads, errors, inner_base = self._fetch_frame(
                    redirect_url, res, cache, clock, next_allowed,
                    redirects_left - 1, cache_time,
                )
                html = inner_html or ""
                base = inner_base if inner_base is not None else url
        cache[url] = html
        cache_time[url] = t
        return html, downloads, errors, base

    def _fetch(self, url: str, res: OracleResult, cache: dict, clock: list, next_allowed: dict, redirects_left: int, cache_time: dict | None = None) -> str | None:
        """Visit-level fetch: frame counters fold into the State counters
        the way threaded_get records them (download.py:838-841)."""
        if cache_time is None:
            cache_time = {}
        html, downloads, errors, base = self._fetch_frame(
            url, res, cache, clock, next_allowed, redirects_left, cache_time
        )
        res.num_downloads += downloads
        res.num_errors += errors
        if downloads == 0 and errors == 0:
            res.num_caches += 1
        res.last_base = base
        return html

    # -- CrawlerCallback.crawl model -----------------------------------------

    def _crawl_links(self, url: str, html: str, res: OracleResult, cache: dict, base: str | None = None) -> list[str]:
        cfg = self.cfg
        allowed = re.compile(cfg.allowed_urls)
        banned = re.compile(cfg.banned_urls)
        domain = get_domain(url)
        depth = res.found.get(url, 0)  # defaultdict(int): seeds -> 0
        outstanding: list[str] = []
        if depth != cfg.max_depth:
            for raw in _LINKS_RE.findall(html):
                # relative links resolve against the redirect-rewrite base
                # (download.py:264-268); absolute ones ignore it
                link = canonicalize_url(base or url, raw)
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
        cache_time: dict[str, float] = {}
        self._cache_status = {}
        clock = [0.0]
        next_allowed: dict[str, float] = {}
        queue = deque(seeds)
        while queue:
            url = queue.pop() if cfg.depth_first else queue.popleft()
            res.visit_order.append(url)
            html = self._fetch(url, res, cache, clock, next_allowed, cfg.num_redirects, cache_time) or ""
            for link in self._crawl_links(url, html, res, cache, res.last_base):
                queue.append(link)
                res.queued.append(link)
        return res
