"""Sitemap surface: robots.txt Sitemap directive parity with
urllib.robotparser.site_maps(), and the codegen <loc> expansion of
sitemap/sitemap-index XML payloads (operators/sitemap.py)."""

import re
import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators import sitemap as sm
from webscraping_spark.operators.robots import parse_sitemaps, sitemap_table


def rp_site_maps(text: str):
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(text.splitlines())
    return rp.site_maps()


FIXTURES = [
    # before any user-agent (state 0 — robotparser records it anyway)
    "Sitemap: http://a.com/s.xml\nUser-agent: *\nDisallow: /x",
    # between entries and inside an entry
    (
        "User-agent: a\nDisallow: /a\nSitemap: http://a.com/1.xml\n"
        "\nUser-agent: b\nSitemap: http://a.com/2.xml\nDisallow: /b"
    ),
    # case-insensitive key, comment stripping, duplicates kept
    (
        "SiteMap: http://a.com/s.xml # primary\n"
        "SITEMAP: http://a.com/s.xml\nUser-agent: *\nDisallow:"
    ),
    # empty value records as '' (robotparser appends line[1] verbatim)
    "Sitemap:\nUser-agent: *\nDisallow: /x",
    # none at all
    "User-agent: *\nDisallow: /x",
    # value keeps its own colons (split once)
    "Sitemap: https://a.com:8080/s.xml?x=1\nUser-agent: *\nDisallow: /",
]


class TestParseSitemaps:
    @pytest.mark.parametrize("text", FIXTURES)
    def test_robotparser_parity(self, text):
        expected = rp_site_maps(text)
        got = parse_sitemaps(text)
        assert got == (expected if expected is not None else [])

    def test_sitemap_line_does_not_break_entry_state(self):
        # robotparser: sitemap lines leave the state machine untouched, so
        # a Disallow after an interleaved Sitemap still binds to the agent
        text = "User-agent: a\nSitemap: http://x/s.xml\nDisallow: /blocked"
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(text.splitlines())
        assert not rp.can_fetch("a", "http://d.com/blocked/p")
        from webscraping_spark.operators.robots import parse_robots_txt

        rows = parse_robots_txt("d.com", text)
        assert ("d.com", "a", "disallow", "/blocked", 0, 0) in rows

    def test_table(self, spark):
        texts = {"a.com": FIXTURES[1], "b.com": FIXTURES[4]}
        rows = sorted(
            tuple(r) for r in sitemap_table(spark, texts).collect()
        )
        assert rows == [
            ("a.com", "http://a.com/1.xml", 0),
            ("a.com", "http://a.com/2.xml", 1),
        ]


def py_locs(xml: str) -> list[str]:
    """Independent re-derivation: findall + 5-entity unescape (amp last)."""
    out = []
    for v in re.findall(r"<loc>\s*([^<\s](?:[^<]*[^<\s])?)\s*</loc>", xml):
        for ent, ch in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&apos;", "'"), ("&amp;", "&"),
        ):
            v = v.replace(ent, ch)
        out.append(v)
    return out


URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    " <url><loc>http://e.com/a?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod></url>\n"
    " <url><loc>\n   http://e.com/b\n </loc></url>\n"
    " <url><loc>http://e.com/&amp;lt;odd&amp;gt;</loc></url>\n"
    "</urlset>"
)
INDEX = (
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>http://e.com/s1.xml</loc></sitemap>"
    "<sitemap><loc>http://e.com/s2.xml</loc></sitemap>"
    "</sitemapindex>"
)


class TestExpandSitemaps:
    def test_urlset_parity_and_order(self, spark):
        df = spark.createDataFrame(
            [("http://e.com/sitemap.xml", URLSET)], "url string, html string"
        )
        rows = sm.expand_sitemaps(df).orderBy("pos").collect()
        assert [r["link"] for r in rows] == py_locs(URLSET)
        assert [r["pos"] for r in rows] == [0, 1, 2]
        assert all(not r["is_index"] for r in rows)
        # entity decode happened exactly once (&amp;lt; -> &lt;, stays text)
        assert rows[0]["link"] == "http://e.com/a?x=1&y=2"
        assert rows[2]["link"] == "http://e.com/&lt;odd&gt;"

    def test_index_flag_routes_to_refetch(self, spark):
        df = spark.createDataFrame(
            [("http://e.com/sitemap.xml", INDEX), ("http://e.com/s1.xml", URLSET)],
            "url string, html string",
        )
        rows = sm.expand_sitemaps(df).collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r["url"], []).append(r)
        assert all(r["is_index"] for r in by_src["http://e.com/sitemap.xml"])
        assert not any(r["is_index"] for r in by_src["http://e.com/s1.xml"])
        assert [r["link"] for r in sorted(by_src["http://e.com/sitemap.xml"], key=lambda r: r["pos"])] == py_locs(INDEX)

    def test_locless_and_empty_loc_payloads_vanish(self, spark):
        df = spark.createDataFrame(
            [("u1", "<urlset></urlset>"), ("u2", "<urlset><url><loc>  </loc></url></urlset>")],
            "url string, html string",
        )
        assert sm.expand_sitemaps(df).count() == 0

    def test_pure_codegen(self, spark):
        df = spark.createDataFrame([("u", URLSET)], "url string, html string")
        plan = sm.expand_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan


class TestSitemapSeededCrawl:
    def test_robots_to_sitemap_to_crawl(self, spark):
        """The full discovery pipeline: robots.txt advertises a sitemap,
        the fetched XML expands into ordered page seeds, and the crawl
        visits exactly those pages in sitemap order (publisher priority
        preserved by the frontier's seed ordering)."""
        from webscraping_spark.plans.crawl import CrawlConfig, CrawlJob
        from webscraping_spark.sources import synth

        robots_txt = "User-agent: *\nDisallow:\n\nSitemap: http://s.com/sitemap.xml"
        maps = sitemap_table(spark, {"s.com": robots_txt}).collect()
        assert [m["sitemap"] for m in maps] == ["http://s.com/sitemap.xml"]

        a, b = "http://s.com/a", "http://s.com/b"
        sm_page = synth.make_page(maps[0]["sitemap"], [])
        sm_page["html"] = (
            f"<urlset><url><loc>{b}</loc></url>"
            f"<url><loc>{a}</loc></url></urlset>"
        )
        pages = [sm_page, synth.make_page(a, []), synth.make_page(b, [])]

        seeds_df = sm.expand_sitemaps(
            synth.pages_df(spark, [sm_page])
        ).orderBy("pos")
        seeds = [r["link"] for r in seeds_df.collect()]
        assert seeds == [b, a]  # sitemap file order, not URL order

        job = CrawlJob(
            spark, synth.pages_df(spark, pages), CrawlConfig(max_depth=None)
        )
        job.run(seeds)
        assert job.visit_urls() == [b, a]


class TestSitemapEntries:
    XML = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> http://a.com/p1 </loc><lastmod>2024-01-02</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>http://a.com/p2?x=1&amp;y=2</loc></url>"
        "<url><priority>0.1</priority></url>"
        "<url><loc>http://a.com/p3</loc><lastmod>2024-02-03T04:05:06Z</lastmod></url>"
        "</urlset>"
    )

    def test_entries(self, spark):
        from webscraping_spark.operators.sitemap import sitemap_entries

        df = spark.createDataFrame([("http://a.com/s.xml", self.XML)], "url string, html string")
        rows = sitemap_entries(df).orderBy("pos").collect()
        assert [(r["pos"], r["loc"], r["lastmod"], r["changefreq"], r["priority"]) for r in rows] == [
            (0, "http://a.com/p1", "2024-01-02", "daily", "0.8"),
            (1, "http://a.com/p2?x=1&y=2", None, None, None),
            # pos 2 (loc-less entry) dropped
            (3, "http://a.com/p3", "2024-02-03T04:05:06Z", None, None),
        ]

    def test_plan_zero_exchange(self, spark):
        from webscraping_spark.operators.sitemap import sitemap_entries

        df = spark.createDataFrame([("u", self.XML)], "url string, html string")
        plan = sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan
