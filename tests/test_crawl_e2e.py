"""End-to-end crawl parity: the Spark BSP engine must emit the identical
visit ordering and final URL-seen membership as the sequential oracle
(threaded_get semantics) on every fixture graph — the north_rule gate."""

import pytest

from webscraping_spark.plans.crawl import CrawlConfig, CrawlJob
from webscraping_spark.plans.oracle import OracleConfig, SequentialOracle
from webscraping_spark.sources import synth


def run_both(spark, pages, seeds, *, mode="bfs", max_depth=1, max_links=100,
             batch_size=1000, robots_df=None, robots_dict=None, max_urls=None):
    oracle = SequentialOracle(
        {p["url"]: p for p in pages},
        OracleConfig(
            depth_first=(mode == "dfs"),
            max_depth=max_depth,
            max_links=max_links,
            robots=robots_dict,
        ),
    )
    expected = oracle.run(list(seeds))
    if max_urls is not None:
        expected.visit_order = expected.visit_order[:max_urls]

    job = CrawlJob(
        spark,
        synth.pages_df(spark, pages),
        CrawlConfig(
            mode=mode,
            max_depth=max_depth,
            max_links=max_links,
            batch_size=batch_size,
            max_urls=max_urls,
        ),
        robots=robots_df,
    )
    job.run(list(seeds))
    return expected, job


class TestBfsParity:
    def test_chain(self, spark):
        pages = synth.site_chain(5)
        exp, job = run_both(spark, pages, [pages[0]["url"]], max_depth=None)
        assert [u for u, _ in job.visit_log] == exp.visit_order

    def test_tree_bfs_order(self, spark):
        pages = synth.site_tree(branching=3, depth=2)
        exp, job = run_both(spark, pages, [pages[0]["url"]], max_depth=None)
        assert [u for u, _ in job.visit_log] == exp.visit_order

    def test_diamond_revisits_seed(self, spark):
        pages = synth.site_diamond()
        exp, job = run_both(spark, pages, [pages[0]["url"]], max_depth=None)
        got = [u for u, _ in job.visit_log]
        assert got == exp.visit_order
        # seed visited twice: D -> A re-queues A (seeds not in `found`)
        assert got.count(pages[0]["url"]) == 2
        # D visited once (dedup via found)
        assert got.count("http://diamond.com/d") == 1

    def test_dirty_links_normalization_and_gates(self, spark):
        pages = synth.site_dirty_links()
        exp, job = run_both(spark, pages, [pages[0]["url"]], max_depth=1)
        assert [u for u, _ in job.visit_log] == exp.visit_order
        # media/mailto/external links were gated; dupes collapsed
        visited = {u for u, _ in job.visit_log}
        assert "http://other-site.net/x" not in visited
        assert not any(u.endswith(".jpg") for u in visited)

    def test_link_cap_truncation(self, spark):
        pages = synth.site_link_cap(n_links=30)
        exp, job = run_both(spark, pages, [pages[0]["url"]], max_links=10, max_depth=None)
        got = [u for u, _ in job.visit_log]
        assert got == exp.visit_order
        assert len(got) == 11  # seed + first 10 links only

    def test_redirects_and_errors(self, spark):
        pages = synth.site_redirect_error()
        exp, job = run_both(spark, pages, [pages[0]["url"]], max_depth=None)
        assert [u for u, _ in job.visit_log] == exp.visit_order
        assert job.metrics.num_errors == exp.num_errors
        assert job.metrics.num_errors == 2  # 404 + 500

    def test_max_depth_gate(self, spark):
        pages = synth.site_chain(6)
        exp, job = run_both(spark, pages, [pages[0]["url"]], max_depth=2)
        got = [u for u, _ in job.visit_log]
        assert got == exp.visit_order
        assert len(got) == 3  # depth 0,1,2 pages visited; depth-2 page not expanded

    def test_small_batch_size_same_order(self, spark):
        """BFS visit order is batch-size invariant (FIFO == seq order)."""
        pages = synth.site_tree(branching=2, depth=3)
        exp, job = run_both(
            spark, pages, [pages[0]["url"]], max_depth=None, batch_size=3
        )
        assert [u for u, _ in job.visit_log] == exp.visit_order


class TestDfsParity:
    def test_tree_dfs_order(self, spark):
        pages = synth.site_tree(branching=2, depth=2)
        exp, job = run_both(spark, pages, [pages[0]["url"]], mode="dfs", max_depth=None)
        assert [u for u, _ in job.visit_log] == exp.visit_order

    def test_dfs_differs_from_bfs(self, spark):
        pages = synth.site_tree(branching=2, depth=2)
        bfs_exp, _ = run_both(spark, pages, [pages[0]["url"]], max_depth=None)
        dfs_exp, dfs_job = run_both(spark, pages, [pages[0]["url"]], mode="dfs", max_depth=None)
        assert bfs_exp.visit_order != dfs_exp.visit_order
        assert [u for u, _ in dfs_job.visit_log] == dfs_exp.visit_order


class TestClaimKeyUniqueness:
    def test_requeued_seed_batch_one(self, spark):
        """With frontier_dedup=False two unclaimed rows can share url_hash
        (seed B still queued while A's link-back re-queues B). Claiming one
        must not mark both (round-1 ADVICE: claim joined on url_hash alone,
        silently dropping the second visit)."""
        a, b = "http://two.com/a", "http://two.com/b"
        pages = [synth.make_page(a, [b]), synth.make_page(b, [])]
        exp, job = run_both(spark, pages, [a, b], batch_size=1, max_depth=None)
        got = [u for u, _ in job.visit_log]
        assert exp.visit_order == [a, b, b]
        assert got == exp.visit_order
        assert job.metrics.num_caches == exp.num_caches == 1


class TestSeenSetParity:
    def test_found_membership_matches(self, spark):
        pages = synth.site_tree(branching=3, depth=2)
        exp, job = run_both(spark, pages, [pages[0]["url"]], max_depth=1)
        # engine's found set is reachable via visit log + frontier; compare
        # final seen membership: oracle.found keys
        from pyspark.sql import functions as F

        engine_found = {
            r["url"]
            for r in job_frontier_urls(job)
        }
        # frontier contains seeds + queued links; oracle.found has ALL
        # discovered links (valid or not). Compare the queued subset:
        oracle_queued = set(exp.queued) | set([pages[0]["url"]])
        assert engine_found == oracle_queued

    def test_robots_gate_drops_subtree(self, spark):
        pages = synth.site_dirty_links()
        domain = "dirty.com"
        robots_rows = [(domain, "*", "disallow", "/dir/q.html", 0), (domain, "*", "allow", "", 1)]
        robots_df = spark.createDataFrame(
            robots_rows, "domain string, agent string, rule string, path_prefix string, order int"
        )
        robots_dict = {domain: [("*", "disallow", "/dir/q.html"), ("*", "allow", "")]}
        exp, job = run_both(
            spark, pages, [pages[0]["url"]],
            robots_df=robots_df, robots_dict=robots_dict,
        )
        got = [u for u, _ in job.visit_log]
        assert got == exp.visit_order
        assert not any("q.html" in u for u in got)


def job_frontier_urls(job):
    # the final frontier DF isn't retained on the job; reconstruct from the
    # visit log + queued rows is overkill — expose via last pushed frontier
    return job.final_frontier.df.select("url").collect()


class TestRetrySemantics:
    """In-visit retry budget (download.py:227-251): flaky pages succeed
    within budget (their links discovered), permanent errors burn the whole
    budget; attempt-level error counters match the sequential model."""

    def run_retry(self, spark, num_retries):
        pages = synth.site_flaky()
        oracle = SequentialOracle(
            {p["url"]: p for p in pages},
            OracleConfig(max_depth=None, num_retries=num_retries),
        )
        exp = oracle.run([pages[0]["url"]])
        job = CrawlJob(
            spark,
            synth.pages_df(spark, pages),
            CrawlConfig(max_depth=None, num_retries=num_retries),
        )
        job.run([pages[0]["url"]])
        return exp, job

    def test_budget_covers_flaky(self, spark):
        exp, job = self.run_retry(spark, num_retries=2)
        got = [u for u, _ in job.visit_log]
        assert got == exp.visit_order
        assert any(u.endswith("/child") for u in got)  # link found on retry success
        assert job.metrics.num_downloads == exp.num_downloads == 3
        # flaky contributes 2 failed attempts; dead burns 3
        assert job.metrics.num_errors == exp.num_errors == 5

    def test_budget_too_small(self, spark):
        exp, job = self.run_retry(spark, num_retries=1)
        got = [u for u, _ in job.visit_log]
        assert got == exp.visit_order
        assert not any(u.endswith("/child") for u in got)  # never succeeded
        assert job.metrics.num_downloads == exp.num_downloads == 1  # seed only
        assert job.metrics.num_errors == exp.num_errors == 4  # flaky 2 + dead 2
