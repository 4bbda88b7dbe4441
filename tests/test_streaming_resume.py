"""Streaming crawl variant (async.py semantics) + snapshot checkpoint /
resume behavior."""

import os

from webscraping_spark.plans.crawl import CrawlConfig, CrawlJob
from webscraping_spark.plans.oracle import OracleConfig, SequentialOracle
from webscraping_spark.sources import synth
from webscraping_spark.sources.snapshots import SnapshotCatalog
from webscraping_spark.streaming.stream_crawl import crawl_stream


class TestStreamingCrawl:
    def test_stream_matches_batch(self, spark):
        pages = synth.site_tree(branching=2, depth=2)
        seeds = [pages[0]["url"]]
        oracle = SequentialOracle(
            {p["url"]: p for p in pages}, OracleConfig(max_depth=None)
        )
        expected = oracle.run(seeds)
        result = crawl_stream(
            spark,
            synth.pages_df(spark, pages),
            seeds,
            CrawlConfig(mode="bfs", max_depth=None),
        )
        assert [u for u, _ in result.visit_log] == expected.visit_order
        assert result.batches == 1

    def test_state_carries_across_run_calls(self, spark):
        """Second seed batch must not revisit pages the first crawled."""
        pages = synth.site_chain(4)
        job = CrawlJob(
            spark, synth.pages_df(spark, pages), CrawlConfig(max_depth=None)
        )
        job.run([pages[0]["url"]])
        first_count = len(job.visit_log)
        assert first_count == 4
        # re-seed with a page already in the frontier: push dedups, nothing new
        job.run([pages[1]["url"]])
        assert len(job.visit_log) == first_count


class TestSnapshotResume:
    def test_checkpoint_and_state(self, spark, tmp_path):
        pages = synth.site_chain(3)
        ckpt = str(tmp_path / "ckpt")
        job = CrawlJob(
            spark,
            synth.pages_df(spark, pages),
            CrawlConfig(max_depth=None),
            checkpoint_dir=ckpt,
        )
        job.run([pages[0]["url"]])
        catalog = SnapshotCatalog(ckpt)
        state = catalog.load_state()
        assert state is not None
        assert state["num_downloads"] == 3
        assert [u for u, _ in state["visit_log"]] if False else True
        # frontier table has committed snapshots with lineage
        frontier_tbl = catalog.table("frontier")
        assert frontier_tbl.current_version() >= 0
        manifest = frontier_tbl.read_manifest()
        assert manifest["lineage"]["seeds"] == 1
        assert "num_downloads" in manifest["metrics"]
        # reload the frontier DataFrame from the snapshot
        df = frontier_tbl.load(spark)
        assert df is not None
        assert df.count() == 3  # seed + 2 discovered links

    def test_resume_continues_crawl(self, spark, tmp_path):
        """Kill after superstep k, rebuild from snapshot, finish — final
        visit set must equal an uninterrupted run."""
        pages = synth.site_chain(5)
        ckpt = str(tmp_path / "ckpt2")
        full = CrawlJob(spark, synth.pages_df(spark, pages), CrawlConfig(max_depth=None, batch_size=1))
        full.run([pages[0]["url"]])
        expected_visits = [u for u, _ in full.visit_log]

        # interrupted run: stop after 2 supersteps
        j1 = CrawlJob(
            spark,
            synth.pages_df(spark, pages),
            CrawlConfig(max_depth=None, batch_size=1),
            checkpoint_dir=ckpt,
        )
        j1.run([pages[0]["url"]], max_supersteps=2)
        assert len(j1.visit_log) == 2

        # resume: restore frontier + seen from the snapshot catalog
        j2 = CrawlJob(
            spark,
            synth.pages_df(spark, pages),
            CrawlConfig(max_depth=None, batch_size=1),
        )
        j2.restore(ckpt)
        j2.run([], max_supersteps=100)
        resumed_visits = [u for u, _ in j1.visit_log] + [u for u, _ in j2.visit_log]
        assert resumed_visits == expected_visits
