"""Per-domain crawl budget (operators/frontier.domain_budget_gate):
remaining-slot arithmetic, deterministic fill order, overrides, and
partitioning invariance.
"""

from pyspark.sql import functions as F

from webscraping_spark.operators.frontier import domain_budget_gate


def _cands(spark, rows):
    return spark.createDataFrame(rows, "url string, seq long")


def _kept(df):
    return sorted(r["url"] for r in df.filter(F.col("keep")).collect())


def test_budget_fills_in_seq_order(spark):
    rows = [(f"http://a.com/{i}", i) for i in range(5)] + [
        (f"http://b.com/{i}", 10 + i) for i in range(2)
    ]
    out = domain_budget_gate(_cands(spark, rows), max_pages=3)
    assert _kept(out) == [
        "http://a.com/0",
        "http://a.com/1",
        "http://a.com/2",
        "http://b.com/0",
        "http://b.com/1",
    ]


def test_visited_counts_consume_budget(spark):
    rows = [(f"http://a.com/{i}", i) for i in range(4)]
    visited = spark.createDataFrame(
        [("a.com", 2)], "domain string, n_visited long"
    )
    out = domain_budget_gate(_cands(spark, rows), visited, max_pages=3)
    assert _kept(out) == ["http://a.com/0"]  # 3 - 2 = one slot left
    # overdrawn domain: visited beyond budget clamps to zero, never negative
    over = spark.createDataFrame([("a.com", 9)], "domain string, n_visited long")
    assert _kept(domain_budget_gate(_cands(spark, rows), over, max_pages=3)) == []


def test_domain_overrides_beat_default(spark):
    rows = [(f"http://a.com/{i}", i) for i in range(4)] + [
        (f"http://b.com/{i}", i) for i in range(4)
    ]
    ov = spark.createDataFrame([("a.com", 1)], "domain string, max_pages long")
    out = domain_budget_gate(_cands(spark, rows), max_pages=2, domain_overrides=ov)
    kept = _kept(out)
    assert kept == ["http://a.com/0", "http://b.com/0", "http://b.com/1"]


def test_registered_domain_keying(spark):
    # get_domain collapses subdomains to the registered domain: one budget
    # pool for the whole site, the politeness convention
    rows = [("http://x.a.com/1", 1), ("http://y.a.com/2", 2), ("http://a.com/3", 3)]
    out = domain_budget_gate(_cands(spark, rows), max_pages=2)
    assert _kept(out) == ["http://x.a.com/1", "http://y.a.com/2"]


def test_partitioning_invariance(spark):
    rows = [(f"http://d{i % 7}.com/p{i}", (i * 13) % 50) for i in range(100)]
    df = _cands(spark, rows)
    a = _kept(domain_budget_gate(df, max_pages=5))
    b = _kept(domain_budget_gate(df.repartition(11, "url"), max_pages=5))
    assert a == b and len(a) == 35
