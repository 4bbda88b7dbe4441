"""Page-level crawl directives (operators/directives.py): meta robots
noindex/nofollow, per-anchor rel=nofollow, rel=canonical — plus the
opt-in crawl-plan gate (CrawlConfig.honor_page_directives).

Semantics under test are the documented robots-meta conventions:
comma/space token lists, case-insensitivity, ``none`` ≡ noindex +
nofollow, free attribute order, and the follow/index split (noindex
flags the page out of the corpus; nofollow gates frontier pushes but
does not un-fetch the page).
"""

import pyspark.sql.functions as F
import pytest

from webscraping_spark.operators import directives as dv


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


class TestExtraction:
    def test_meta_robots_tokens_and_order(self, spark):
        rows = [
            ("http://s.com/1", '<meta name="robots" content="noindex, nofollow">'),
            ("http://s.com/2", '<meta content="NONE" name="robots">'),  # swapped attrs
            ("http://s.com/3", '<meta name="robots" content="NOINDEX">'),
            ("http://s.com/4", '<meta name="robots" content="nofollow">'),
            ("http://s.com/5", '<meta name="robots" content="all">'),
            ("http://s.com/6", "no meta at all"),
            # token, not substring: "nonofollowish" must not match
            ("http://s.com/7", '<meta name="robots" content="nonofollowish">'),
        ]
        got = {
            r["url"]: (r["noindex"], r["nofollow"])
            for r in dv.extract_directives(_pages(spark, rows)).collect()
        }
        assert got["http://s.com/1"] == (True, True)
        assert got["http://s.com/2"] == (True, True)  # none = both, any order
        assert got["http://s.com/3"] == (True, False)
        assert got["http://s.com/4"] == (False, True)
        assert got["http://s.com/5"] == (False, False)
        assert got["http://s.com/6"] == (False, False)
        assert got["http://s.com/7"] == (False, False)

    def test_canonical_extraction_and_resolution(self, spark):
        rows = [
            ("http://s.com/a/", '<link rel="canonical" href="../b.html">'),
            ("http://s.com/b", '<link href="http://s.com/B" rel="canonical">'),
            ("http://s.com/c", "<p>none</p>"),
        ]
        got = {
            r["url"]: (r["canonical_raw"], r["canonical"])
            for r in dv.extract_directives(_pages(spark, rows)).collect()
        }
        # relative canonical resolves through the frontier's canonicalizer
        assert got["http://s.com/a/"] == ("../b.html", "http://s.com/b.html")
        assert got["http://s.com/b"] == ("http://s.com/B", "http://s.com/B")
        assert got["http://s.com/c"] == (None, None)

    def test_followable_links_positions(self, spark):
        """Gated links consume their position: the survivor keeps pos 2."""
        rows = [
            (
                "http://s.com/p",
                '<a href="a.html">a</a>'
                '<a rel="nofollow" href="b.html">b</a>'
                '<a href="c.html" rel="ugc NOFOLLOW">c</a>'
                '<a href="d.html">d</a>',
            ),
            (
                "http://s.com/q",
                '<meta name="robots" content="nofollow">'
                '<a href="x.html">x</a><a href="y.html">y</a>',
            ),
        ]
        got = sorted(
            (r["url"], r["pos"], r["raw"])
            for r in dv.followable_links(_pages(spark, rows)).collect()
        )
        assert got == [
            ("http://s.com/p", 0, "a.html"),
            ("http://s.com/p", 3, "d.html"),
        ]  # page q contributes nothing: page-level nofollow

    def test_canonical_clusters(self, spark):
        rows = [
            ("http://s.com/v1", '<link rel="canonical" href="http://s.com/main">'),
            ("http://s.com/v2", '<link rel="canonical" href="http://s.com/main">'),
            ("http://s.com/main", "<p>the canonical page itself</p>"),
            ("http://s.com/solo", "<p>no directive</p>"),
        ]
        got = {
            r["url"]: (r["canonical_target"], r["is_rep"])
            for r in dv.canonical_clusters(_pages(spark, rows)).collect()
        }
        # the canonical page itself is in the group (target = own url)
        # and, being the minimum, wins representative status — exactly
        # the behavior a dedup wants when the target page was crawled
        assert got["http://s.com/main"] == ("http://s.com/main", True)
        assert got["http://s.com/solo"] == ("http://s.com/solo", True)
        assert got["http://s.com/v1"] == ("http://s.com/main", False)
        assert got["http://s.com/v2"] == ("http://s.com/main", False)

    def test_canonical_clusters_absent_target(self, spark):
        """When the declared target was NOT crawled, the min-url variant
        still yields a deterministic representative."""
        rows = [
            ("http://s.com/v1", '<link rel="canonical" href="http://zzz.com/m">'),
            ("http://s.com/v2", '<link rel="canonical" href="http://zzz.com/m">'),
        ]
        got = {
            r["url"]: (r["canonical_target"], r["is_rep"])
            for r in dv.canonical_clusters(_pages(spark, rows)).collect()
        }
        assert got["http://s.com/v1"] == ("http://zzz.com/m", True)
        assert got["http://s.com/v2"] == ("http://zzz.com/m", False)

    def test_plan_shape_zero_shuffle(self, spark):
        """extract_directives and followable_links fuse into the scan —
        no Exchange anywhere in their plans."""
        rows = [("http://s.com/p", '<a href="a.html">a</a>')]
        for op in (dv.extract_directives, dv.followable_links):
            plan = op(_pages(spark, rows))._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan


class TestCrawlGate:
    def _site(self):
        from webscraping_spark.sources import synth

        # seed links to n1 (plain), n2 (rel=nofollow anchor); n1 is a
        # page-level-nofollow page linking to n3; n2 links to n4
        seed = synth.make_page(
            "http://dir.com/seed",
            ["http://dir.com/n1"],
            extra_html='<a rel="nofollow" href="http://dir.com/n2">skip</a>',
        )
        n1 = synth.make_page(
            "http://dir.com/n1",
            ["http://dir.com/n3"],
            extra_html='<meta name="robots" content="nofollow">',
        )
        n2 = synth.make_page("http://dir.com/n2", ["http://dir.com/n4"])
        rest = [
            synth.make_page("http://dir.com/n3", []),
            synth.make_page("http://dir.com/n4", []),
        ]
        return [seed, n1, n2] + rest

    def test_gate_off_follows_everything(self, spark):
        from webscraping_spark.plans.crawl import CrawlConfig, CrawlJob
        from webscraping_spark.sources import synth

        pages = self._site()
        job = CrawlJob(
            spark,
            synth.pages_df(spark, pages),
            CrawlConfig(max_depth=None, honor_page_directives=False),
        )
        job.run(["http://dir.com/seed"])
        assert job.visit_urls() == [
            "http://dir.com/seed",
            "http://dir.com/n1",
            "http://dir.com/n2",
            "http://dir.com/n3",
            "http://dir.com/n4",
        ]

    def test_gate_on_prunes_nofollow_edges(self, spark):
        from webscraping_spark.plans.crawl import CrawlConfig, CrawlJob
        from webscraping_spark.sources import synth

        pages = self._site()
        job = CrawlJob(
            spark,
            synth.pages_df(spark, pages),
            CrawlConfig(max_depth=None, honor_page_directives=True),
        )
        job.run(["http://dir.com/seed"])
        # n2 pruned by the anchor rel=nofollow; n1 is still FETCHED (its
        # page nofollow gates its outlinks, not itself) but n3 is not;
        # n4 unreachable once n2 is pruned
        assert job.visit_urls() == ["http://dir.com/seed", "http://dir.com/n1"]


def test_base_href_col_forms(spark):
    from webscraping_spark.operators.directives import base_href_col

    rows = [
        ("dq", '<head><base href="http://b.com/x"><base href="http://second">'),
        ("sq", "<head><base href='/rel/'></head>"),
        ("uq", "<head><base href=/bare target=_blank></head>"),
        ("none", "<head><base target=_blank></head>"),
        ("absent", "<head></head>"),
    ]
    df = spark.createDataFrame(rows, "k string, html string")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", base_href_col(F.col("html")).alias("b")).collect()
    }
    assert got == {
        "dq": "http://b.com/x",  # first <base> wins per spec
        "sq": "/rel/",
        "uq": "/bare",
        "none": None,
        "absent": None,
    }
