"""Parity between JVM fast-path expressions and the exact Python kernel:
get_domain_col == get_domain_udf == get_domain; canonicalize_split ==
canonicalize_url_udf == canonicalize_url. The JVM forms are the 100-TB hot
path; the Python forms are the doctested oracle."""

from pyspark.sql import functions as F

from webscraping_spark.functions import udfs
from webscraping_spark.functions.urlnorm import canonicalize_url, get_domain

URLS = [
    "http://www.google.com.au/tos.html",
    "http://code.google.com/x",
    "https://sub.a.b.example.co.uk/deep/path?q=1",
    "http://192.168.1.1/admin",
    "http://single",
    "http://EX.COM/Upper",
    "http://www.shop3.com.au/x",
    "http://d123.com/page",
    "http://a.biz.info/x",
    # EVERY label is a public suffix ('pa' = Panama ccTLD): the JVM form
    # must fall back to the whole host, not crash on the empty
    # non-suffix-label array (ANSI element_at round-1 regression)
    "http://pa.com/err",
    "http://co.com.au/x",
]

LINK_CASES = [
    ("http://example.com", "../abc.html"),
    ("http://example.com", "abc.html#link"),
    ("http://example.com", "abc.html?a=1&amp;b=2"),
    ("http://example.com/a/b.html", "c.html"),
    ("http://example.com", "http://other.com/x"),
    ("http://example.com", "http://other.com/x#frag"),
    ("http://example.com", "http://other.com/%7Euser"),
    ("http://example.com", "/..//top.html"),
    ("http://example.com/d/", "page.html?x=1&y=2"),
    ("http://example.com", "http://clean.com/totally/clean.html?a=1"),
]


def test_get_domain_col_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = df.select(
        "url",
        udfs.get_domain_col(F.col("url")).alias("jvm"),
        udfs.get_domain_udf(F.col("url")).alias("py"),
    ).collect()
    for r in rows:
        expected = get_domain(r["url"])
        assert r["jvm"] == expected, f"JVM domain mismatch for {r['url']}"
        assert r["py"] == expected, f"UDF domain mismatch for {r['url']}"


def test_canonicalize_split_parity(spark):
    df = spark.createDataFrame(LINK_CASES, "base string, link string")
    out = udfs.canonicalize_split(df, "base", "link", "canon").collect()
    for r in out:
        assert r["canon"] == canonicalize_url(r["base"], r["link"]), (
            f"mismatch for ({r['base']}, {r['link']})"
        )
    assert len(out) == len(LINK_CASES)


def test_clean_link_predicate_is_conservative(spark):
    """Every link the predicate marks clean must be a normalize fixpoint."""
    df = spark.createDataFrame(LINK_CASES, "base string, link string")
    clean_rows = df.filter(udfs.clean_link_predicate(F.col("link"))).collect()
    for r in clean_rows:
        assert canonicalize_url(r["base"], r["link"]) == r["link"]


def test_canonicalize_tiered_parity_random(spark):
    """Randomized parity sweep over link shapes that straddle the JVM
    fast-path tier boundaries (tier routing must never change the value)."""
    import itertools

    bases = [
        "http://d5.com/dir/index.html",
        "http://d5.com/dir/",
        "http://d5.com",
        "http://d5.com/a/b/c.html",
        "http://d5.com/p?q=1",
    ]
    links = [
        "page7.html",
        "page7.html?x=1&y=2",
        "q.html?a=1&amp;b=2",
        "../up.html",
        "./here.html",
        "sub/dir/deep.html",
        "?a=1",
        "#frag-only",
        "",
        "/rooted.html",
        "//proto-relative.com/x",
        "mailto:a@b.com",
        "http://abs.com/x",
        "http://abs.com/x#f",
        "%7Euser/p.html",
        "page.html;params",
        "..",
        ".",
        "page.html#x?y",
        "x=../q.html",
    ]
    cases = list(itertools.product(bases, links))
    df = spark.createDataFrame(cases, "base string, link string")
    out = udfs.canonicalize_split(df, "base", "link", "canon").collect()
    assert len(out) == len(cases)
    for r in out:
        expected = canonicalize_url(r["base"], r["link"])
        assert r["canon"] == expected, f"({r['base']!r}, {r['link']!r}): {r['canon']!r} != {expected!r}"


def test_extension_and_media_gate(spark):
    from webscraping_spark.functions.urlnorm import get_extension

    urls = [
        "http://x.com/a.JPG",
        "http://x.com/a.html?q=1",
        "hello_world.JPG",
        "http://x.com/noext",
        "http://www.google-analytics.com/__utm.gif?utmwv=1.3&utmn=420639071",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", udfs.get_extension_col(F.col("url")).alias("ext")).collect()
    for r in rows:
        assert r["ext"] == get_extension(r["url"]), r["url"]
