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


class TestDomainBudgetPrune:
    """Salted two-phase scale path: identical survivor set to the gate."""

    def _equal_sets(self, spark, rows, visited=None, **kw):
        from webscraping_spark.operators.frontier import (
            domain_budget_gate,
            domain_budget_prune,
        )

        df = _cands(spark, rows)
        kept_gate = sorted(
            (r["url"], r["budget_rank"])
            for r in domain_budget_gate(df, visited, **kw)
            .filter(F.col("keep"))
            .collect()
        )
        kept_prune = sorted(
            (r["url"], r["budget_rank"])
            for r in domain_budget_prune(df, visited, **kw).collect()
        )
        assert kept_gate == kept_prune
        return kept_gate

    def test_matches_gate_on_skewed_input(self, spark):
        # one hot domain with 300 candidates, several cold ones
        rows = [(f"http://hot.com/p{i:04d}", (i * 17) % 997) for i in range(300)]
        rows += [(f"http://d{i % 5}.org/p{i}", i) for i in range(50)]
        kept = self._equal_sets(spark, rows, max_pages=7)
        assert len(kept) == 7 + 5 * 7  # hot capped at 7; 5 cold domains x 7

    def test_matches_gate_with_visited_and_overrides(self, spark):
        rows = [(f"http://a.com/{i:03d}", i) for i in range(40)] + [
            (f"http://b.com/{i:03d}", i) for i in range(40)
        ]
        visited = spark.createDataFrame(
            [("a.com", 3)], "domain string, n_visited long"
        )
        ov = spark.createDataFrame([("b.com", 2)], "domain string, max_pages long")
        self._equal_sets(
            spark, rows, visited, max_pages=10, domain_overrides=ov
        )

    def test_salt_bucket_count_does_not_change_result(self, spark):
        from webscraping_spark.operators.frontier import domain_budget_prune

        rows = [(f"http://s.com/p{i:04d}", (i * 31) % 211) for i in range(200)]
        df = _cands(spark, rows)
        a = sorted(r["url"] for r in domain_budget_prune(df, max_pages=9, salt_buckets=4).collect())
        b = sorted(r["url"] for r in domain_budget_prune(df, max_pages=9, salt_buckets=64).collect())
        assert a == b and len(a) == 9
