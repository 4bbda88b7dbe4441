"""RSS/Atom feed ingestion (operators/feeds.py)."""

from pyspark.sql import functions as F

from webscraping_spark.operators.feeds import feed_entries, is_feed_col


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel>'
    "<title>chan</title><link>http://s.com</link>"
    "<item><title>A &amp; B</title><link> http://s.com/a </link>"
    "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
    "<item><title>no link item</title></item>"
    "<item><link>http://s.com/b</link></item>"
    "</channel></rss>"
)

ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom">'
    "<title>feed</title>"
    '<entry><title>E1</title><link rel="self" href="http://a.com/self"/>'
    '<link href="http://a.com/e1"/><published>2024-01-02T00:00:00Z</published></entry>'
    "<entry><title>E2</title><link rel='alternate' href='http://a.com/e2'/>"
    "<updated>2024-01-03T00:00:00Z</updated></entry>"
    "<entry><title>no link</title></entry>"
    "</feed>"
)


def test_rss_items(spark):
    got = feed_entries(_pages(spark, [("u", RSS)])).collect()
    rows = {r["pos"]: r for r in got}
    assert [r["feed_type"] for r in got] == ["rss", "rss"]
    assert rows[0]["link"] == "http://s.com/a"  # whitespace trimmed
    assert rows[0]["title"] == "A & B"  # entity decoded
    assert rows[0]["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert rows[2]["link"] == "http://s.com/b" and rows[2]["title"] is None
    assert 1 not in rows  # link-less item dropped


def test_atom_entries_rel_alternate_rule(spark):
    got = {r["pos"]: r for r in feed_entries(_pages(spark, [("u", ATOM)])).collect()}
    # rel="self" link skipped; rel-less link is the alternate default
    assert got[0]["link"] == "http://a.com/e1"
    assert got[0]["published"] == "2024-01-02T00:00:00Z"
    # explicit rel='alternate' accepted; published falls back to updated
    assert got[1]["link"] == "http://a.com/e2"
    assert got[1]["published"] == "2024-01-03T00:00:00Z"
    assert got[1]["feed_type"] == "atom"
    assert 2 not in got


def test_is_feed_sniff(spark):
    df = _pages(
        spark,
        [("r", RSS), ("a", ATOM), ("h", "<html><body>nope</body></html>")],
    )
    got = {
        r["url"]: r["f"]
        for r in df.select("url", is_feed_col(F.col("html")).alias("f")).collect()
    }
    assert got == {"r": True, "a": True, "h": False}


def test_mixed_page_yields_both_kinds(spark):
    mixed = RSS + ATOM
    got = feed_entries(_pages(spark, [("u", mixed)])).collect()
    kinds = sorted(r["feed_type"] for r in got)
    assert kinds == ["atom", "atom", "rss", "rss"]
