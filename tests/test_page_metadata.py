"""Page-head metadata extraction (harvest.page_metadata / og_image_pairs)."""

from pyspark.sql import functions as F

from webscraping_spark.operators.harvest import og_image_pairs, page_metadata


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_title_and_meta_both_attribute_orders_and_quotes(spark):
    html = (
        "<html><head><TITLE> Hello &amp; <b>world</b>  </TITLE>"
        '<meta name="description" content="first desc">'
        "<meta content='og desc' property='og:description'>"
        "<meta property=og:type content=article>"
        '<meta property="og:image" content="/img/x.png">'
        "</head><body></body></html>"
    )
    r = page_metadata(_pages(spark, [("u", html)])).collect()[0]
    assert r["title"] == "Hello & world"
    assert r["description"] == "first desc"
    assert r["og_description"] == "og desc"  # content-before-property order
    assert r["og_type"] == "article"  # unquoted values
    assert r["og_image"] == "/img/x.png"
    assert r["og_title"] is None and r["keywords"] is None


def test_first_meta_per_key_wins(spark):
    html = (
        '<meta property="og:title" content="winner">'
        '<meta property="og:title" content="loser">'
    )
    r = page_metadata(_pages(spark, [("u", html)])).collect()[0]
    assert r["og_title"] == "winner"


def test_empty_content_is_null_and_skipped(spark):
    html = (
        '<meta name="description" content="">'
        '<meta name="description" content="real">'
    )
    r = page_metadata(_pages(spark, [("u", html)])).collect()[0]
    # empty content carries no value; the next tag with content wins
    assert r["description"] == "real"


def test_og_image_pairs_caption_fallback_chain(spark):
    rows = [
        ("a", '<title>tt</title><meta property="og:image" content="i1">'
              '<meta property="og:title" content="cap1">'),
        ("b", '<title>tt2</title><meta property="og:image" content="i2">'
              '<meta property="og:description" content="cap2">'),
        ("c", "<title>tt3</title><meta property='og:image' content='i3'>"),
        ("d", "<title>no image</title>"),
    ]
    got = {
        r["page_url"]: (r["image_url"], r["caption"])
        for r in og_image_pairs(_pages(spark, rows)).collect()
    }
    assert got == {"a": ("i1", "cap1"), "b": ("i2", "cap2"), "c": ("i3", "tt3")}


def test_data_prefixed_attr_does_not_match(spark):
    html = '<meta data-name="description" content="nope">'
    r = page_metadata(_pages(spark, [("u", html)])).collect()[0]
    assert r["description"] is None


class TestHeadLinks:
    """Head-link extraction: hreflang edges and pagination chains."""

    HTML = (
        '<html><head>'
        '<link rel="alternate" hreflang="en" href="/en/p">'
        "<link rel='alternate' hreflang='DE' href='/de/p'>"
        '<link rel="Alternate" href="/feed.xml" type="application/rss+xml">'
        '<link rel="next" href="/p2"><link rel="next" href="/p2-dup">'
        '<link rel="prev" href="/p0">'
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="canonical">'
        "</head></html>"
    )

    def _pages(self, spark):
        return spark.createDataFrame([("u", self.HTML)], "url string, html string")

    def test_hreflang_edges(self, spark):
        from webscraping_spark.operators.harvest import hreflang_edges

        got = sorted(
            (r["hreflang"], r["href"])
            for r in hreflang_edges(self._pages(spark)).collect()
        )
        # the hreflang-less alternate (the feed link) is NOT a language
        # edge; hreflang lowercased
        assert got == [("de", "/de/p"), ("en", "/en/p")]

    def test_pagination_first_wins(self, spark):
        from webscraping_spark.operators.harvest import pagination_links

        got = {
            r["rel"]: r["href"]
            for r in pagination_links(self._pages(spark)).collect()
        }
        assert got == {"next": "/p2", "prev": "/p0"}

    def test_href_less_link_dropped(self, spark):
        from webscraping_spark.operators.harvest import head_links

        rels = [r["rel"] for r in head_links(self._pages(spark)).collect()]
        assert "canonical" not in rels and "stylesheet" in rels


def test_declared_language_precedence(spark):
    from webscraping_spark.operators.harvest import declared_language_col

    rows = [
        ("attr", '<html lang="en-US"><head></head></html>'),
        ("meta", '<html><meta http-equiv="Content-Language" content="FR"></html>'),
        ("both", '<html lang=de><meta http-equiv="content-language" content="fr"></html>'),
        ("none", "<html><head></head></html>"),
        ("empty", '<html lang=""><meta http-equiv="content-language" content="pt"></html>'),
    ]
    df = spark.createDataFrame(rows, "k string, html string")
    got = {
        r["k"]: r["l"]
        for r in df.select(
            "k", declared_language_col(F.col("html")).alias("l")
        ).collect()
    }
    assert got == {
        "attr": "en-us",
        "meta": "fr",
        "both": "de",  # WHATWG precedence: the lang attribute wins
        "none": None,
        "empty": "pt",  # empty lang attr carries no declaration
    }
