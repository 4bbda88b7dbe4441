"""DOM skeleton fingerprints (content.dom_signature / template_clusters)
and crawl snapshot diffing (recrawl.crawl_diff / domain_churn)."""

import hashlib

from pyspark.sql import functions as F

from webscraping_spark.operators.content import dom_signature, template_clusters
from webscraping_spark.operators.recrawl import crawl_diff, domain_churn


def test_dom_signature_matches_hand_md5(spark):
    html = '<HTML><body class="x"><P>hi</p><a href="/">l</a></body></html>'
    df = spark.createDataFrame([("u", html)], "url string, html string")
    r = dom_signature(df).collect()[0]
    # opening tags only, lowercased, in document order; closers ignored
    assert r["n_tags"] == 4
    assert r["dom_sig"] == hashlib.md5(b"html,body,p,a").hexdigest()


def test_same_template_different_text_same_sig(spark):
    a = "<html><body><h1>Cats</h1><p>one</p></body></html>"
    b = "<html><body><h1>Dogs</h1><p>two entirely different</p></body></html>"
    c = "<html><body><p>no heading</p></body></html>"
    df = spark.createDataFrame(
        [("ua", a), ("ub", b), ("uc", c)], "url string, html string"
    )
    sigs = {r["url"]: r["dom_sig"] for r in dom_signature(df).collect()}
    assert sigs["ua"] == sigs["ub"] != sigs["uc"]


def test_template_clusters_threshold_and_representative(spark):
    tpl = "<html><body><h1>t</h1><p>%s</p></body></html>"
    rows = [(f"http://s.com/p{i}", tpl % i) for i in range(3)] + [
        ("http://s.com/odd", "<html><div>solo</div></html>"),
        ("http://other.com/x", tpl % "x"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {
        (r["domain"], r["dom_sig"]): (r["n_pages"], r["sample_url"])
        for r in template_clusters(df).collect()
    }
    assert len(got) == 1  # solo page and single-page other.com fall under min_pages
    (n, rep), = got.values()
    assert (n, rep) == (3, "http://s.com/p0")


def test_crawl_diff_all_four_states(spark):
    old = spark.createDataFrame(
        [("http://a.com/1", "h1"), ("http://a.com/2", "h2"), ("http://a.com/3", "h3")],
        "url string, content_hash string",
    )
    new = spark.createDataFrame(
        [("http://a.com/1", "h1"), ("http://a.com/2", "H2X"), ("http://a.com/4", "h4")],
        "url string, content_hash string",
    )
    got = {r["url"]: r["change"] for r in crawl_diff(old, new).collect()}
    assert got == {
        "http://a.com/1": "same",
        "http://a.com/2": "changed",
        "http://a.com/3": "removed",
        "http://a.com/4": "added",
    }


def test_domain_churn_integer_pct(spark):
    old = spark.createDataFrame(
        [(f"http://d.com/{i}", f"h{i}") for i in range(4)]
        + [("http://static.com/x", "s")],
        "url string, content_hash string",
    )
    new = spark.createDataFrame(
        [("http://d.com/0", "h0"), ("http://d.com/1", "CHANGED"),
         ("http://d.com/9", "new"), ("http://static.com/x", "s")],
        "url string, content_hash string",
    )
    got = {r["domain"]: r for r in domain_churn(crawl_diff(old, new)).collect()}
    d = got["d.com"]
    # live = 1 same + 1 changed + 1 added = 3; churn = 100*2 div 3 = 66
    assert (d["n_added"], d["n_removed"], d["n_changed"], d["n_same"]) == (1, 2, 1, 1)
    assert d["churn_pct"] == 66
    assert got["static.com"]["churn_pct"] == 0


def test_domain_churn_all_removed_domain(spark):
    old = spark.createDataFrame([("http://gone.com/a", "h")], "url string, content_hash string")
    new = old.filter(F.lit(False))
    got = domain_churn(crawl_diff(old, new)).collect()[0]
    assert (got["n_removed"], got["churn_pct"]) == (1, 0)
