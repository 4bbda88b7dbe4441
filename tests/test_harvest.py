"""Image-caption pair harvesting (operators/harvest.py).

Fixtures are hand-planted HTML shapes; expectations are hand-derived, so
a regex regression cannot hide behind a shared re-derivation. The plan
shape test pins the zero-shuffle/zero-Python contract.
"""

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators.harvest import (
    clean_text_col,
    harvest_image_pairs,
    srcset_best_col,
)


def _harvest(spark, pages):
    df = spark.createDataFrame(pages, "url string, html string")
    rows = harvest_image_pairs(df).orderBy("page_url", "pos").collect()
    return [r.asDict() for r in rows]


class TestAttributes:
    def test_quote_styles_and_case(self, spark):
        rows = _harvest(
            spark,
            [
                ("u1", '<img src="http://a/i.png" alt="a cat">'),
                ("u2", "<img src='http://b/i.jpg' title='tip'>"),
                ("u3", '<IMG SRC=http://c/i.gif ALT="">'),
            ],
        )
        by_url = {r["page_url"]: r for r in rows}
        assert by_url["u1"]["src"] == "http://a/i.png"
        assert by_url["u1"]["alt"] == "a cat"
        assert by_url["u1"]["caption"] == "a cat"
        # no alt attribute at all -> NULL alt, caption falls to title
        assert by_url["u2"]["src"] == "http://b/i.jpg"
        assert by_url["u2"]["alt"] is None
        assert by_url["u2"]["caption"] == "tip"
        # unquoted src + uppercase tag/attrs; alt="" stays '' (decorative
        # marker), distinct from missing
        assert by_url["u3"]["src"] == "http://c/i.gif"
        assert by_url["u3"]["alt"] == ""
        assert by_url["u3"]["caption"] is None

    def test_data_attr_does_not_shadow(self, spark):
        (r,) = _harvest(
            spark, [("u", '<img data-src="http://lazy/i.png" src="http://a/i.png">')]
        )
        assert r["src"] == "http://a/i.png"
        # data-alt must not read as alt
        (r2,) = _harvest(spark, [("u", '<img src="x.png" data-alt="no">')])
        assert r2["alt"] is None

    def test_missing_src_and_data_uri_not_fetchable(self, spark):
        rows = _harvest(
            spark,
            [
                ("u1", '<img alt="no src">'),
                ("u2", '<img src="data:image/png;base64,AA" alt="inline">'),
                ("u3", '<img src="" alt="empty">'),
                ("u4", '<img src="/rel/i.png" alt="rel">'),
            ],
        )
        fetch = {r["page_url"]: r["fetchable"] for r in rows}
        assert fetch == {"u1": False, "u2": False, "u3": False, "u4": True}
        assert rows[0]["src"] is None


class TestFigcaption:
    def test_association_by_containment(self, spark):
        html = (
            '<p>noise</p><figure><img src="http://a/1.png">'
            "<figcaption>First <b>bold</b> cap</figcaption></figure>"
            '<img src="http://a/2.png" alt="loose">'
            '<figure><img src="http://a/3.png">'
            "<figcaption>Third&nbsp;&amp; last</figcaption></figure>"
        )
        rows = _harvest(spark, [("u", html)])
        assert [r["pos"] for r in rows] == [0, 1, 2]
        assert rows[0]["figcaption"] == "First bold cap"
        assert rows[0]["caption"] == "First bold cap"
        assert rows[1]["figcaption"] is None
        assert rows[1]["caption"] == "loose"
        assert rows[2]["figcaption"] == "Third & last"

    def test_alt_beats_figcaption(self, spark):
        html = (
            '<figure><img src="i.png" alt="alt wins">'
            "<figcaption>fig text</figcaption></figure>"
        )
        (r,) = _harvest(spark, [("u", html)])
        assert r["figcaption"] == "fig text"
        assert r["caption"] == "alt wins"

    def test_multiline_figure(self, spark):
        html = '<figure>\n <img src="i.png">\n <figcaption>\n two\n lines \n</figcaption>\n</figure>'
        (r,) = _harvest(spark, [("u", html)])
        assert r["figcaption"] == "two lines"


class TestSrcset:
    @pytest.mark.parametrize(
        "srcset,expect",
        [
            ("a-320.jpg 320w, a-640.jpg 640w", "a-640.jpg"),
            ("a-640.jpg 640w, a-320.jpg 320w", "a-640.jpg"),  # max, not last
            ("a.jpg, a-2x.jpg 2x", "a-2x.jpg"),  # bare counts as 1
            ("only.jpg", "only.jpg"),
        ],
    )
    def test_best_candidate(self, spark, srcset, expect):
        df = spark.createDataFrame([(srcset,)], "s string")
        (r,) = df.select(srcset_best_col(F.col("s")).alias("b")).collect()
        assert r["b"] == expect

    def test_srcset_through_harvest(self, spark):
        (r,) = _harvest(
            spark,
            [("u", '<img src="s.jpg" srcset="s-9.jpg 900w, s-3.jpg 300w" alt="x">')],
        )
        assert r["srcset_best"] == "s-9.jpg"
        assert r["src"] == "s.jpg"


class TestCleanText:
    def test_double_escaped_entity_stays_text(self, spark):
        df = spark.createDataFrame([("&amp;lt;tag&amp;gt; &quot;q&quot;",)], "t string")
        (r,) = df.select(clean_text_col(F.col("t")).alias("c")).collect()
        assert r["c"] == '&lt;tag&gt; "q"'


class TestShape:
    def test_no_img_pages_and_null_html(self, spark):
        rows = _harvest(spark, [("u1", "<p>no images</p>"), ("u2", None)])
        assert rows == []

    def test_zero_shuffle_zero_python_plan(self, spark):
        df = spark.createDataFrame([("u", "<img src='x'>")], "url string, html string")
        plan = harvest_image_pairs(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_feeds_canonicalize(self, spark):
        # composition contract: relative srcs resolve against page_url
        # through the same tier as extracted anchors
        from webscraping_spark.functions.udfs import canonicalize_split

        pairs = harvest_image_pairs(
            spark.createDataFrame(
                [("http://site.com/a/page.html", '<img src="../img/i.png" alt="x">')],
                "url string, html string",
            )
        ).where("fetchable")
        resolved = canonicalize_split(
            pairs.select(F.col("src").alias("link"), F.col("page_url").alias("base")),
            base_col="base",
            link_col="link",
            out_col="img_url",
        )
        (r,) = resolved.select("img_url").collect()
        assert r["img_url"] == "http://site.com/img/i.png"


class TestAnchorTexts:
    def _anchors(self, spark, pages):
        from webscraping_spark.operators.harvest import harvest_anchor_texts

        df = spark.createDataFrame(pages, "url string, html string")
        rows = harvest_anchor_texts(df).orderBy("page_url", "pos").collect()
        return [r.asDict() for r in rows]

    def test_basic_text_and_order(self, spark):
        rows = self._anchors(
            spark,
            [("u1", '<p><a href="/a">First <b>bold</b> link</a> and '
                    "<a href='/b'>second &amp; last</a></p>")],
        )
        assert [(r["pos"], r["href"], r["anchor_text"]) for r in rows] == [
            (0, "/a", "First bold link"),
            (1, "/b", "second & last"),
        ]

    def test_nofollow_token_grammar(self, spark):
        rows = self._anchors(
            spark,
            [
                ("u1", '<a href="/x" rel="nofollow">x</a>'),
                ("u2", '<a href="/y" rel="external NOFOLLOW,ugc">y</a>'),
                ("u3", '<a href="/z" rel="nofollower">z</a>'),
                ("u4", '<A HREF=/w>w</A>'),
            ],
        )
        by = {r["page_url"]: r for r in rows}
        assert by["u1"]["nofollow"] and by["u2"]["nofollow"]
        assert not by["u3"]["nofollow"]  # substring is not a token
        assert not by["u4"]["nofollow"] and by["u4"]["rel"] is None
        assert by["u4"]["href"] == "/w"  # uppercase unquoted

    def test_unclosed_and_image_anchor(self, spark):
        rows = self._anchors(
            spark,
            [("u1", '<a href="/open">dangling <a href="/img"><img src="i.png"></a>')],
        )
        # the unterminated first anchor truncates at the first </a>:
        # one element, href=/open (first open tag), text from the span
        assert len(rows) == 1
        assert rows[0]["href"] == "/open"

    def test_empty_text_is_null(self, spark):
        rows = self._anchors(spark, [("u1", '<a href="/i"><img src="x.png"></a>')])
        assert rows[0]["anchor_text"] is None

    def test_plan_zero_exchange_zero_python(self, spark):
        from webscraping_spark.operators.harvest import harvest_anchor_texts

        df = spark.createDataFrame([("u", "<a href='/a'>t</a>")], "url string, html string")
        plan = harvest_anchor_texts(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestAnchorField:
    def test_aggregation_and_order(self, spark):
        from webscraping_spark.operators.harvest import anchor_field

        pages = [
            ("http://a.com/x", '<a href="/t">from ax</a><a href="http://b.com/t">cross</a>'),
            ("http://a.com/y", '<a href="/t">from ay</a><a href="/t" rel="nofollow">hidden</a>'),
            ("http://b.com/z", '<a href="/t">from bz</a><a href="/img"><img src="i.png"></a>'),
        ]
        df = spark.createDataFrame(pages, "url string, html string")
        rows = {r["target"]: r for r in anchor_field(df).collect()}
        t = rows["http://a.com/t"]
        # deterministic (page_url, pos) order; nofollow dropped
        assert t["anchor_field"] == "from ax from ay" and t["n_anchors"] == 2
        assert rows["http://b.com/t"]["anchor_field"] == "cross from bz"
        assert "http://b.com/img" not in rows  # NULL-text anchors gated

    def test_cap_and_partitioning_invariance(self, spark):
        from webscraping_spark.operators.harvest import anchor_field

        pages = [
            (f"http://s{i:02d}.com/p", f'<a href="http://hub.com/">text {i:02d}</a>')
            for i in range(30)
        ]
        df = spark.createDataFrame(pages, "url string, html string")
        (r1,) = anchor_field(df, max_texts=5).collect()
        (r2,) = anchor_field(df.repartition(7), max_texts=5).collect()
        assert r1["n_anchors"] == 30
        assert r1["anchor_field"] == "text 00 text 01 text 02 text 03 text 04"
        assert r1["anchor_field"] == r2["anchor_field"]
