"""Fetch-adapter contract (operators/fetch.py): the one seam between the
sandbox store join and a live network crawler. The downloader-hook e2e path
must work through the adapter interface (round-3 verdict Next #8)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from webscraping_spark.operators.fetch import (
    FETCH_SCHEMA,
    as_downloader,
    batch_adapter,
    store_adapter,
)
from webscraping_spark.plans.crawl import CrawlConfig, CrawlJob
from webscraping_spark.sources import synth


class TestStoreAdapter:
    def test_resolves_batch_against_store(self, spark):
        pages = synth.site_chain(3, domain="sa.com")
        adapter = store_adapter(synth.pages_df(spark, pages))
        urls = spark.createDataFrame(
            [("http://sa.com/p0",), ("http://sa.com/missing",)], "url string"
        )
        got = {r["url"]: r for r in adapter(urls).collect()}
        assert set(got) == {"http://sa.com/p0", "http://sa.com/missing"}
        hit = got["http://sa.com/p0"]
        assert hit["status_code"] == 200
        assert hit["final_url"] == "http://sa.com/p0"
        assert b"p1" in bytes(hit["payload"])
        miss = got["http://sa.com/missing"]
        assert miss["status_code"] is None and miss["payload"] is None

    def test_output_schema_is_the_contract(self, spark):
        adapter = store_adapter(synth.pages_df(spark, synth.site_chain(2)))
        urls = spark.createDataFrame([("http://chain.com/p0",)], "url string")
        assert adapter(urls).schema == spark.createDataFrame([], FETCH_SCHEMA).schema


def _make_fake_fetch():
    """Deterministic 'live' fetcher: gzip-encoded chain p0 -> p1 -> p2 ->
    p3 (leaf) plus a 404. Built as a CLOSURE so cloudpickle ships it by
    value — a module-level function would pickle by reference to the tests
    module, which Spark workers can't import."""

    def fake_fetch(urls):
        import gzip as _gzip

        for u in urls:
            if u.endswith("p404"):
                yield (u, u, 404, b"not found", None)
                continue
            nid = int(u.rsplit("p", 1)[1])
            html = (
                '<a href="http://live.com/p%d">n</a>' % (nid + 1)
                if nid < 3
                else "<html>leaf</html>"
            )
            yield (u, u, 200, _gzip.compress(html.encode()), "gzip")

    return fake_fetch


class TestBatchAdapter:
    def test_arrow_batched_fetch_decodes(self, spark):
        adapter = batch_adapter(_make_fake_fetch())
        urls = spark.createDataFrame(
            [("http://live.com/p0",), ("http://live.com/p404",)], "url string"
        )
        got = {r["url"]: r for r in adapter(urls).collect()}
        assert got["http://live.com/p0"]["status_code"] == 200
        assert got["http://live.com/p404"]["status_code"] == 404
        assert (
            gzip.decompress(bytes(got["http://live.com/p0"]["payload"]))
            == b'<a href="http://live.com/p1">n</a>'
        )

    def test_e2e_crawl_through_adapter_bridge(self, spark):
        """The downloader-hook e2e through as_downloader(batch_adapter(...)):
        the engine is one real fetch function away from a live crawler.
        gzip payloads exercise the transfer-decode bridge; the 404 row
        yields NULL html (no content served, like the reference dl)."""
        dl = as_downloader(batch_adapter(_make_fake_fetch()))
        job = CrawlJob(spark, None, CrawlConfig(max_depth=None), downloader=dl)
        job.run(["http://live.com/p0"])
        assert job.visit_urls() == [f"http://live.com/p{i}" for i in range(4)]
        # dl semantics (download.py:838-841): every dl visit counts cache
        assert job.metrics.num_caches == 4
        assert job.metrics.num_downloads == 0

    def test_non_2xx_serves_null_html(self, spark):
        dl = as_downloader(batch_adapter(_make_fake_fetch()))
        urls = spark.createDataFrame([("http://live.com/p404",)], "url string")
        rows = dl(urls).collect()
        assert rows[0]["html"] is None

    def test_store_and_batch_adapters_interchange(self, spark):
        """Same crawl through both adapter implementations => same visits:
        the seam really is pluggable."""
        pages = [
            synth.make_page(
                f"http://swap.com/p{i}",
                [f"http://swap.com/p{i+1}"] if i < 3 else [],
            )
            for i in range(4)
        ]
        html_by_url = {p["url"]: p["html"] for p in pages}

        def fake(urls):
            for u in urls:
                h = html_by_url.get(u)
                if h is None:
                    yield (u, u, None, None, None)
                else:
                    yield (u, u, 200, h.encode(), None)

        visits = []
        for adapter in (
            store_adapter(synth.pages_df(spark, pages)),
            batch_adapter(fake),
        ):
            job = CrawlJob(
                spark,
                None,
                CrawlConfig(max_depth=None),
                downloader=as_downloader(adapter),
            )
            job.run(["http://swap.com/p0"])
            visits.append(job.visit_urls())
        assert visits[0] == visits[1] == [f"http://swap.com/p{i}" for i in range(4)]
