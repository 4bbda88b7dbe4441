"""The BSP crawl loop — ``threaded_get`` (download.py:775-869) re-expressed
as driver-orchestrated Spark supersteps.

One superstep = one reference "drain a batch from the deque":

  pull ordered batch ──► resolve against page store (the fetch stage:
  left join on url; 301/meta-refresh content pre-resolved) ──► politeness
  plan (window lag-cumsum per domain, seeded jitter) ──► link extraction
  (JVM regex posexplode, canonicalize pandas UDF) ──► validity gate
  (media/http/domain/regex/robots — download.py:1010-1026) ──► seen filter
  (anti-join, optional Bloom pre-filter) ──► claim resolution + per-page
  link cap (fixpoint, exact sequential parity) ──► found-mark + frontier
  push ──► metrics + snapshot commit.

Ordering correctness (SURVEY.md §7.3.1): BFS visit order equals the
sequential crawler's because FIFO pop order == discovery (seq) order, and
claims resolve by (page_seq, pos) — the sequential processing order. Any
batch size yields the identical visit sequence. DFS requires batch_size=1
for exact parity (LIFO interleaves discovery and processing); larger DFS
batches are a documented approximation.

Scale notes: every stage is a DataFrame op — the only Python is the
canonicalize/domain pandas UDFs and the claim fixpoint's driver loop
(bounded, usually 1 iteration). Frontier and seen state are checkpointed
per superstep through the snapshot catalog, which is what `resume` reads
back. Hot domains are salted at the fetch-stage repartition
(operators/politeness.salted_repartition); politeness itself is planned on
the unsalted key.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webscraping_spark.functions import udfs
from webscraping_spark.operators import politeness
from webscraping_spark.operators.frontier import (
    ORDER_BEST,
    ORDER_BFS,
    ORDER_DFS,
    Frontier,
)
from webscraping_spark.operators.robots import robots_gate
from webscraping_spark.operators.seen import BloomSeenSet, ExactSeenSet
from webscraping_spark.sources.snapshots import SnapshotCatalog


@dataclass
class CrawlConfig:
    mode: str = ORDER_BFS
    batch_size: int = 1000  # Queue DEFAULT_LIMIT (pdict.py:28)
    max_depth: int | None = 1  # CrawlerCallback default (download.py:952)
    max_links: int = 100  # per-page cap (download.py:952)
    max_urls: int | None = None  # crawl-level stop (download.py:1102)
    allowed_urls: str = ""  # regex, re.match anchored (download.py:976)
    banned_urls: str = "^$"
    user_agent: str = "wswp"
    crawl_existing: bool = True
    num_retries: int = 0  # in-visit retry budget (download.py:227-251)
    delay: float = 5.0  # politeness (download.py:130)
    variance: float = 0.5
    seed: int = 42
    use_bloom_prefilter: bool = False
    # False = threaded_get deque semantics (queue never dedups; `found`
    # does — a link back to a seed re-queues it, download.py:834/1041).
    # True = DataCrawler semantics (visited gate, download.py:1117).
    frontier_dedup: bool = False
    # state-checkpoint cadence in supersteps (lineage-truncation; the
    # snapshot-catalog commit cadence is separate and per-step)
    checkpoint_interval: int = 4
    bloom_partitions: int = 32
    salt_hot_threshold: int = 10_000


@dataclass
class CrawlMetrics:
    """State parity (download.py:873-945)."""

    num_downloads: int = 0
    num_errors: int = 0
    num_caches: int = 0
    queue_size: int = 0
    supersteps: int = 0
    planned_makespan_sec: float = 0.0
    start_time: float = field(default_factory=time.time)

    def as_dict(self) -> dict:
        return {
            "num_downloads": self.num_downloads,
            "num_errors": self.num_errors,
            "num_caches": self.num_caches,
            "queue_size": self.queue_size,
            "supersteps": self.supersteps,
            "planned_makespan_sec": self.planned_makespan_sec,
            "duration_secs": int(time.time() - self.start_time),
        }


class CrawlJob:
    """Distributed crawl over a page-store DataFrame (no network in this
    sandbox — the fetch stage resolves content by joining the store, which
    exercises the identical dataflow a live fetch UDF would feed)."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        config: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.robots = robots
        self.catalog = SnapshotCatalog(checkpoint_dir) if checkpoint_dir else None
        self.store = self._resolve_store(pages)
        self.metrics = CrawlMetrics()
        self.visit_log: list[tuple[str, int]] = []  # (url, global visit index)
        self._domain_state = spark.createDataFrame([], politeness.DOMAIN_STATE_SCHEMA)

    # ------------------------------------------------------------------ store

    def _resolve_store(self, pages: DataFrame) -> DataFrame:
        """Pre-resolve redirect content so the fetch join is a single probe.

        301/302: urllib follows transparently (content = target's), the
        engine bakes that in. Meta-refresh (download.py:254-268,
        619-624): one redirect level resolved, matching num_redirects=1.
        """
        p = pages.select(
            "url",
            "final_url",
            "status_code",
            "html",
            "fmt",
            "bytes",
            "caption",
            "w",
            "h",
            "phash",
            F.coalesce(
                F.element_at(F.col("meta"), F.lit("succeed_after")).cast("int"), F.lit(0)
            ).alias("succeed_after"),
        )
        target = p.select(
            F.col("url").alias("_t_url"), F.col("html").alias("_t_html")
        )
        # http 30x: serve target content
        resolved = (
            p.join(
                target,
                (F.col("status_code").isin(301, 302))
                & (F.col("final_url") == F.col("_t_url"))
                & (F.col("final_url") != F.col("url")),
                "left",
            )
            .withColumn("html1", F.coalesce(F.col("_t_html"), F.col("html")))
            .drop("_t_url", "_t_html")
        )
        # meta-refresh: extract target url, resolve one level
        meta_target = F.regexp_extract(
            F.col("html1"), "(?is)<meta[^>]*?url=(.*?)[\"']", 1
        )
        resolved = resolved.withColumn(
            "_meta_target",
            F.when(meta_target != "", udfs.canonicalize_url_udf(F.col("url"), meta_target)),
        )
        t2 = p.select(
            F.col("url").alias("_m_url"), F.col("html").alias("_m_html")
        )
        resolved = (
            resolved.join(t2, F.col("_meta_target") == F.col("_m_url"), "left")
            .withColumn(
                "serve_html",
                F.coalesce(F.col("_m_html"), F.col("html1")),
            )
            .withColumn(
                "serve_final_url", F.coalesce(F.col("_meta_target"), F.col("final_url"))
            )
            .drop("_m_url", "_m_html", "html1", "_meta_target")
        )
        return resolved.localCheckpoint(eager=False)

    # ------------------------------------------------------------------- run

    def seed_candidates(self, seeds: list[str]) -> DataFrame:
        rows = [(u, i) for i, u in enumerate(seeds)]
        df = self.spark.createDataFrame(rows, "url string, discovery_order long")
        return (
            df.withColumn("url_hash", F.xxhash64("url"))
            .withColumn("domain", udfs.get_domain_udf(F.col("url")))
            .withColumn("depth", F.lit(0))
            .withColumn("priority", F.lit(0))
        )

    def run(self, seeds: list[str], max_supersteps: int = 1000, reset_state: bool = False) -> CrawlMetrics:
        """Crawl from ``seeds``. State (frontier, seen set, fetch cache)
        persists across calls — the streaming variant feeds seed batches
        through repeated run() calls, mirroring the async crawler's
        incremental seeding (async.py:100-106)."""
        cfg = self.cfg
        if reset_state or not hasattr(self, "_frontier"):
            self._frontier = Frontier.empty(self.spark)
            self._found = ExactSeenSet.empty(self.spark)
            self._bloom = (
                BloomSeenSet.empty(self.spark, cfg.bloom_partitions)
                if cfg.use_bloom_prefilter
                else None
            )
            self._visited_urls: set[str] = set()
            self._visit_idx = 0
        frontier = self._frontier.push(self.seed_candidates(seeds))
        found = self._found
        bloom = self._bloom
        visit_idx = self._visit_idx
        batch_size = 1 if cfg.mode == ORDER_DFS else cfg.batch_size
        # queue size is maintained arithmetically (Queue.size parity,
        # pdict.py:437-450): one count at entry, then +pushed -pulled
        queue_size = frontier.queued_count()

        for step in range(max_supersteps):
            if cfg.max_urls is not None and visit_idx >= cfg.max_urls:
                break
            limit = batch_size
            if cfg.max_urls is not None:
                limit = min(limit, cfg.max_urls - visit_idx)
            batch, frontier = frontier.pull(limit=limit, mode=cfg.mode)
            # pin the claimed batch by materializing it driver-side: it is
            # at most batch_size rows (the visit log needs them anyway),
            # and re-creating the DataFrame from the collected rows is both
            # the pin and the collect in a single job
            all_rows = batch.collect()
            if not all_rows:
                break
            batch = self.spark.createDataFrame(all_rows, batch.schema)
            rows = sorted(
                (
                    {"url": r["url"], "seq": r["seq"], "depth": r["depth"], "priority": r["priority"]}
                    for r in all_rows
                ),
                key=self._visit_sort_key(),
            )
            for r in rows:
                self.visit_log.append((r["url"], visit_idx))
                visit_idx += 1

            # ---- fetch stage: resolve batch against the page store --------
            # cache-hit classification is driver-side: the engine already
            # holds the visit log (pull batches are collected for ordering),
            # so "seen this url before" is a Python set probe — no `fetched`
            # DataFrame state, no extra anti-join job. Cache hits only occur
            # on re-visits (e.g. a re-queued seed), which are rare and small.
            miss_rows = [r for r in all_rows if r["url"] not in self._visited_urls]
            self._visited_urls.update(r["url"] for r in all_rows)
            resolved = batch.join(self.store, "url", "left")
            # in-visit retry model (download.py:227-251): the retry loop is
            # deterministic against the page store, so attempt accounting is
            # a closed-form expression — a flaky page (succeed_after=k)
            # succeeds iff the budget allows attempt k+1, contributing k
            # failed attempts; a permanent error burns the whole budget.
            flaky_success = (F.col("succeed_after") > 0) & (
                F.col("succeed_after") <= cfg.num_retries
            )
            serve_ok = F.col("serve_html").isNotNull() & (
                (F.col("status_code") < 400) | flaky_success
            )
            attempt_errors = (
                F.when(F.col("serve_html").isNull(), F.lit(cfg.num_retries + 1))
                .when(F.col("status_code") < 400, F.lit(0))
                .when(flaky_success, F.col("succeed_after"))
                .otherwise(F.lit(cfg.num_retries + 1))
            )
            resolved = resolved.withColumn("serve_ok", serve_ok).withColumn(
                "_attempt_errors", attempt_errors
            )
            if len(miss_rows) == len(all_rows):
                cache_misses = resolved
            else:
                miss_df = self.spark.createDataFrame(miss_rows, batch.schema)
                cache_misses = (
                    miss_df.join(self.store, "url", "left")
                    .withColumn("serve_ok", serve_ok)
                    .withColumn("_attempt_errors", attempt_errors)
                )

            # ---- politeness plan (misses only — cache hits don't fetch) ---
            planned, self._domain_state = politeness.plan_schedule(
                cache_misses,
                self._domain_state,
                delay=cfg.delay,
                variance=cfg.variance,
                seed=cfg.seed,
            )
            # single fused metrics pass: miss count, ok count, makespan
            agg = planned.agg(
                F.count("*").alias("n_miss"),
                F.sum(F.when(F.col("serve_ok"), 1).otherwise(0)).alias("ok"),
                F.sum("_attempt_errors").alias("errors"),
                F.max("scheduled_offset").alias("makespan"),
            ).first()
            n_miss = agg["n_miss"] or 0
            n_ok = agg["ok"] or 0
            n_err = agg["errors"] or 0
            n_cache = len(rows) - n_miss
            self.metrics.planned_makespan_sec += agg["makespan"] or 0.0

            # ---- link extraction + claim + push ---------------------------
            extracted = self._extract_links(resolved)
            # _claim_and_cap pins its result internally; `claimed` is a
            # cheap projection over that pinned frame
            claimed = self._claim_and_cap(extracted, found, bloom)

            found = found.add(
                claimed.select(F.col("link_hash").alias("url_hash"), "depth"),
                assume_new=True,  # claims were anti-joined against `found`
            )
            if bloom is not None:
                bloom = bloom.add(claimed.select(F.col("link_hash").alias("url_hash")))

            queued = claimed.filter(F.col("is_valid")).select(
                F.col("link").alias("url"),
                F.col("link_hash").alias("url_hash"),
                F.col("link_domain").alias("domain"),
                "depth",
                self._priority_col().alias("priority"),
                F.col("discovery_order"),
            )
            pre_push_seq = frontier.next_seq
            frontier = frontier.push(queued, dedup=cfg.frontier_dedup)
            queue_size += (frontier.next_seq - pre_push_seq) - len(rows)

            # lineage control: iterative DataFrames re-execute their whole
            # history otherwise. Checkpoint state every few supersteps —
            # often enough to bound recompute depth, seldom enough that the
            # block-manager write cost (which serializes at high core
            # counts) stays off the per-step path.
            if step % cfg.checkpoint_interval == cfg.checkpoint_interval - 1:
                frontier = Frontier(
                    frontier.df.localCheckpoint(),
                    frontier.next_seq,
                    frontier.pull_counter,
                )
                found = ExactSeenSet(found.df.localCheckpoint())
                if bloom is not None:
                    bloom = BloomSeenSet(
                        bloom.state.localCheckpoint(), bloom.P, bloom.m, bloom.k
                    )

            # ---- metrics + snapshot ---------------------------------------
            self.metrics.num_downloads += n_ok
            self.metrics.num_errors += n_err
            self.metrics.num_caches += n_cache
            self.metrics.queue_size = queue_size
            self.metrics.supersteps = step + 1
            if self.catalog:
                self.catalog.table("frontier").commit(
                    frontier.df,
                    superstep=step,
                    lineage={"seeds": len(seeds), "visit_idx": visit_idx,
                             "next_seq": frontier.next_seq,
                             "pull_counter": frontier.pull_counter},
                    metrics=self.metrics.as_dict(),
                )
                self.catalog.table("seen").commit(found.df, superstep=step)
                self.catalog.table("domain_state").commit(self._domain_state, superstep=step)
                self.catalog.save_state(
                    self.metrics.as_dict()
                    | {"visit_log": self.visit_log, "superstep": step}
                )
            if self.metrics.queue_size == 0:
                break
        self._frontier, self._found, self._bloom = frontier, found, bloom
        self._visit_idx = visit_idx
        self.final_frontier = frontier
        self.final_found = found
        return self.metrics

    def restore(self, checkpoint_dir: str) -> None:
        """Restore crawl state from a snapshot catalog (resumability: the
        north_rule's 'resumable from an Iceberg-snapshot checkpoint').

        Reads the latest frontier/seen snapshots plus the lineage fields
        (next_seq, pull_counter, visit_idx) the commit recorded; a crawl
        killed after superstep k and restored here continues identically.
        """
        catalog = SnapshotCatalog(checkpoint_dir)
        manifest = catalog.table("frontier").read_manifest()
        if manifest is None:
            raise FileNotFoundError(f"no frontier snapshot under {checkpoint_dir}")
        self._frontier = Frontier(
            catalog.table("frontier").load(self.spark),
            next_seq=manifest["lineage"]["next_seq"],
            pull_counter=manifest["lineage"]["pull_counter"],
        )
        seen_df = catalog.table("seen").load(self.spark)
        self._found = (
            ExactSeenSet(seen_df) if seen_df is not None else ExactSeenSet.empty(self.spark)
        )
        ds = catalog.table("domain_state").load(self.spark)
        if ds is not None:
            self._domain_state = ds
        self._bloom = None
        self._visited_urls = set()
        self._visit_idx = manifest["lineage"]["visit_idx"]
        state = catalog.load_state()
        if state:
            self.metrics.num_downloads = state.get("num_downloads", 0)
            self.metrics.num_errors = state.get("num_errors", 0)
            self.metrics.num_caches = state.get("num_caches", 0)

    # ---------------------------------------------------------------- stages

    def _visit_order(self):
        if self.cfg.mode == ORDER_DFS:
            return [F.col("depth").desc(), F.col("seq").desc()]
        if self.cfg.mode == ORDER_BEST:
            return [F.col("priority").desc(), F.col("seq").asc()]
        return [F.col("depth").asc(), F.col("seq").asc()]

    def _visit_sort_key(self):
        """Python-side twin of _visit_order for the collected batch."""
        if self.cfg.mode == ORDER_DFS:
            return lambda r: (-r["depth"], -r["seq"])
        if self.cfg.mode == ORDER_BEST:
            return lambda r: (-r["priority"], r["seq"])
        return lambda r: (r["depth"], r["seq"])

    def _priority_col(self):
        if self.cfg.mode == ORDER_BEST:
            # -link_score (download.py:1062-1078)
            link = F.lower(F.col("link"))
            score = (
                F.when(link.contains("contact"), 0)
                .when(link.contains("about"), 10)
                .when(link.contains("help"), 20)
                .otherwise(100)
                + F.length(link)
            )
            return (-score).cast("int")
        return F.lit(0)

    def _extract_links(self, resolved: DataFrame) -> DataFrame:
        """Per-page ordered links with validity flags (all vectorized)."""
        cfg = self.cfg
        pages = resolved.filter(F.col("serve_ok"))
        if cfg.max_depth is not None:
            pages = pages.filter(F.col("depth") != cfg.max_depth)
        links = pages.select(
            F.col("url").alias("page_url"),
            F.col("seq").alias("page_seq"),
            F.col("depth").alias("page_depth"),
            F.col("domain").alias("page_domain"),
            F.posexplode(udfs.find_links_col(F.col("serve_html"))).alias("pos", "raw"),
        )
        links = links.withColumn(
            "link", udfs.canonicalize_url_udf(F.col("page_url"), F.col("raw"))
        ).withColumn("link_domain", udfs.get_domain_udf(F.col("link")))
        valid = (
            ~udfs.is_media_link_col(F.col("link"))
            & udfs.is_http_col(F.col("link"))
            & (
                F.col("page_domain").contains(F.col("link_domain"))
                | F.col("link_domain").contains(F.col("page_domain"))
            )
        )
        if getattr(self, "netloc_filter", None):
            # DataCrawler's strict same-netloc gate (download.py:1116)
            valid = valid & (
                F.regexp_extract(F.col("link"), "^[a-zA-Z]+://([^/]+)", 1)
                == F.lit(self.netloc_filter)
            )
        if cfg.allowed_urls:
            valid = valid & F.col("link").rlike("^(?:%s)" % cfg.allowed_urls)
        if cfg.banned_urls and cfg.banned_urls != "^$":
            valid = valid & ~F.col("link").rlike("^(?:%s)" % cfg.banned_urls)
        links = links.withColumn("is_valid_pre", valid).withColumn(
            "link_hash", F.xxhash64("link")
        ).withColumn("depth", F.col("page_depth") + 1)
        if self.robots is not None:
            allowed_links = robots_gate(
                links.select("link", F.col("link_domain").alias("domain")).distinct(),
                self.robots,
                self.cfg.user_agent,
                url_col="link",
            ).select(F.col("link").alias("_rb_link"))
            links = links.join(
                F.broadcast(allowed_links),
                links["link"] == F.col("_rb_link"),
                "left",
            ).withColumn(
                "is_valid_pre", F.col("is_valid_pre") & F.col("_rb_link").isNotNull()
            ).drop("_rb_link")
        return links

    def _claim_and_cap(
        self, links: DataFrame, found: ExactSeenSet, bloom: BloomSeenSet | None
    ) -> DataFrame:
        """Resolve first-discovery claims + per-page max_links cap with
        exact sequential parity (fixpoint; see module docstring)."""
        cfg = self.cfg
        # drop links already found globally (they don't mark, count, or queue)
        if bloom is not None:
            fresh = bloom.filter_unseen_prefilter(links, found, on="link_hash")
        else:
            fresh = found.filter_unseen(links, on="link_hash")
        fresh = fresh.withColumn("_occ", F.struct("page_seq", "pos"))
        occurrences = fresh

        for _ in range(8):  # fixpoint: usually terminates in 1 iteration
            wins = occurrences.groupBy("link_hash").agg(F.min("_occ").alias("_win"))
            claimed = occurrences.join(wins, "link_hash").filter(
                F.col("_occ") == F.col("_win")
            )
            w = Window.partitionBy("page_seq").orderBy("pos")
            ranked = claimed.withColumn(
                "_rn",
                F.sum(F.when(F.col("is_valid_pre"), 1).otherwise(0)).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            cuts = (
                ranked.filter(F.col("is_valid_pre") & (F.col("_rn") == cfg.max_links))
                .groupBy("page_seq")
                .agg(F.min("pos").alias("_cut_pos"))
            )
            # pin the iteration result once: the overflow test and the kept
            # rows both read it, and the next iteration (if any) subtracts
            # from it — one materialization instead of three evaluations
            with_cut = ranked.join(cuts, "page_seq", "left").localCheckpoint()
            overflow = with_cut.filter(
                F.col("_cut_pos").isNotNull() & (F.col("pos") > F.col("_cut_pos"))
            )
            if overflow.isEmpty():
                final = with_cut
                break
            # remove post-cut occurrences and re-resolve claims
            occurrences = occurrences.join(
                overflow.select("link_hash", "_occ"), ["link_hash", "_occ"], "left_anti"
            )
        else:
            final = with_cut

        kept = final.filter(
            F.col("_cut_pos").isNull() | (F.col("pos") <= F.col("_cut_pos"))
        )
        return kept.select(
            "link",
            "link_hash",
            "link_domain",
            "depth",
            F.col("is_valid_pre").alias("is_valid"),
            F.col("_occ").alias("discovery_order"),
        )


def resume_metrics(checkpoint_dir: str) -> dict | None:
    """Read back the last committed crawl state (resumability check)."""
    return SnapshotCatalog(checkpoint_dir).load_state()
