"""CDX capture index + SURT keys (operators/cdx.py): character-exact
parity with an independent Python re-derivation across URL shapes,
same-site adjacency under the global order, digest semantics, and the
range-partition/no-global-sort plan shape."""

import re

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators.cdx import cdx_index, surt_col


def py_surt(url: str) -> str:
    u = url.lower()
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#:]*)", u)
    host = m.group(1) if m else ""
    m2 = re.match(r"^[a-z][a-z0-9+.-]*://[^/?#:]*([^#]*)", u)
    after = m2.group(1) if m2 else ""
    rev = ",".join(reversed(host.split(".")))
    if after == "":
        path = "/"
    elif after.startswith((":", "/")):
        path = after
    else:
        path = "/" + after
    if path.startswith(":"):
        port = path.split("/", 1)[0]
        rest = path[len(port):] or "/"
    else:
        port, rest = "", path
    return rev + port + ")" + rest


URLS = [
    "http://example.com/path/page.html",
    "https://WWW.Example.COM/Path?b=2&a=1",
    "http://a.b.example.co.uk/deep/1/2/3?q=x",
    "http://example.com",
    "http://example.com/",
    "http://example.com:8080/p",
    "http://example.com:8080",
    "http://sub.example.com/p?only=query",
]


class TestSurt:
    def test_python_parity(self, spark):
        df = spark.createDataFrame([(u,) for u in URLS], "url string")
        got = {
            r["url"]: r["surt"]
            for r in df.select("url", surt_col(F.col("url")).alias("surt")).collect()
        }
        for u in URLS:
            assert got[u] == py_surt(u), (u, got[u], py_surt(u))

    def test_canonical_examples(self, spark):
        df = spark.createDataFrame([(u,) for u in URLS], "url string")
        got = {r["url"]: r["surt"] for r in df.select("url", surt_col(F.col("url")).alias("surt")).collect()}
        assert got["http://example.com/path/page.html"] == "com,example)/path/page.html"
        assert got["https://WWW.Example.COM/Path?b=2&a=1"] == "com,example,www)/path?b=2&a=1"
        assert got["http://example.com"] == "com,example)/"
        assert got["http://example.com:8080/p"] == "com,example:8080)/p"
        assert got["http://example.com:8080"] == "com,example:8080)/"

    def test_same_site_adjacency(self, spark):
        # the point of SURT: one site's captures sort contiguously even
        # when interleaved with other hosts alphabetically "between" them
        urls = [
            "http://aaa.example.com/x",
            "http://zzz.other.org/y",
            "http://bbb.example.com/z",
            "http://example.com/w",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        surts = sorted(
            r["surt"] for r in df.select(surt_col(F.col("url")).alias("surt")).collect()
        )
        ex = [s for s in surts if s.startswith("com,example")]
        assert surts.index(ex[0]) + len(ex) - 1 == surts.index(ex[-1])


class TestCdxIndex:
    def test_index_rows_and_digest(self, spark):
        rows = [(u, i, f"<html>{i}</html>") for i, u in enumerate(URLS)]
        df = spark.createDataFrame(rows, "url string, crawl_ts long, html string")
        idx = cdx_index(df, num_files=2).collect()
        assert len(idx) == len(URLS)
        import hashlib

        by_url = {r["url"]: r for r in idx}
        for u, i, h in rows:
            assert by_url[u]["surt"] == py_surt(u)
            assert by_url[u]["ts"] == i
            assert by_url[u]["digest"] == hashlib.md5(h.encode()).hexdigest()

    def test_globally_ordered_no_single_task_sort(self, spark):
        rows = [(f"http://d{i % 7}.com/p{i}", i, "x") for i in range(200)]
        df = spark.createDataFrame(rows, "url string, crawl_ts long, html string")
        idx = cdx_index(df, num_files=4)
        # partition-major traversal yields the global (surt, ts) order
        collected = [
            (r["surt"], r["ts"]) for r in idx.toLocalIterator()
        ]
        assert collected == sorted(collected)
        plan = idx._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan.lower()
        # the sort is per-partition: the logical Sort prints `, false`
        # (sortWithinPartitions), never a global single-task sort
        logical = idx._jdf.queryExecution().optimizedPlan().toString()
        sort_line = [l for l in logical.splitlines() if "Sort [surt" in l][0]
        assert ", false" in sort_line, sort_line
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan


class TestDiscoverNewUrls:
    """robots Sitemap: -> sitemap expansion -> seen anti-join pipeline."""

    def test_end_to_end(self, spark):
        from webscraping_spark.operators.sitemap import discover_new_urls

        robots = spark.createDataFrame(
            [
                (
                    "http://s.com/robots.txt",
                    "User-agent: *\nDisallow: /admin\n"
                    "Sitemap: http://s.com/sm.xml\n"
                    "sitemap:http://s.com/sm2.xml\n",
                ),
                ("http://empty.com/robots.txt", "User-agent: *\n"),
            ],
            "url string, html string",
        )
        store = spark.createDataFrame(
            [
                (
                    "http://s.com/sm.xml",
                    "<urlset><url><loc>http://s.com/a</loc>"
                    "<lastmod>2024-01-01</lastmod></url>"
                    "<url><loc>http://s.com/b</loc></url></urlset>",
                ),
                # sm2.xml was never fetched: no store row, no entries
            ],
            "url string, html string",
        )
        seen = spark.createDataFrame([("http://s.com/b",)], "url string")
        got = {
            r["loc"]: (r["domain"], r["sitemap_url"], r["lastmod"])
            for r in discover_new_urls(robots, store, seen).collect()
        }
        assert got == {
            "http://s.com/a": ("s.com", "http://s.com/sm.xml", "2024-01-01")
        }

    def test_no_seen_filter(self, spark):
        from webscraping_spark.operators.sitemap import discover_new_urls

        robots = spark.createDataFrame(
            [("http://s.com/robots.txt", "Sitemap: http://s.com/sm.xml")],
            "url string, html string",
        )
        store = spark.createDataFrame(
            [("http://s.com/sm.xml", "<urlset><url><loc>http://s.com/a</loc></url></urlset>")],
            "url string, html string",
        )
        assert discover_new_urls(robots, store).count() == 1
