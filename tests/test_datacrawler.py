"""Best-first DataCrawler.find parity (download.py:1080-1126): visit order
(link_score ranking), result extraction order, caps — engine vs oracle."""

from webscraping_spark.functions.extract import extract_emails
from webscraping_spark.plans.datacrawler import find_data, link_score
from webscraping_spark.plans.oracle import find_data_oracle
from webscraping_spark.operators.sinks import unique_rows
from webscraping_spark.sources import synth


class TestLinkScore:
    def test_ladder(self):  # download.py:1062-1078
        assert link_score("http://x.com/contact.php") == len("http://x.com/contact.php")
        assert link_score("http://x.com/about.php") == 10 + len("http://x.com/about.php")
        assert link_score("http://x.com/help.php") == 20 + len("http://x.com/help.php")
        assert link_score("http://x.com/other.php") == 100 + len("http://x.com/other.php")


class TestFindDataParity:
    def run_both(self, spark, **caps):
        pages = synth.site_scored()
        website = pages[0]["url"]
        store = {p["url"]: p for p in pages}
        exp_results, exp_order = find_data_oracle(
            store, extract_emails, website, max_depth=None, **caps
        )
        got_results, got_order = find_data(
            spark,
            synth.pages_df(spark, pages),
            extract_emails,
            website,
            max_depth=None,
            **caps,
        )
        return (exp_results, exp_order), (got_results, got_order)

    def test_best_first_order_and_results(self, spark):
        (exp_r, exp_o), (got_r, got_o) = self.run_both(spark)
        assert got_o == exp_o
        assert got_r == exp_r
        # contact ranks above about ranks above generic (link_score ladder)
        idx = {u.rsplit("/", 1)[1]: i for i, u in enumerate(got_o)}
        assert idx["contact-us.php"] < idx["about-team.php"] < idx["products.php"]

    def test_max_urls_and_results_caps(self, spark):
        (exp_r, exp_o), (got_r, got_o) = self.run_both(spark, max_urls=2, max_results=1)
        assert got_o == exp_o
        assert got_r == exp_r and len(got_r) <= 1


class TestUniqueSink:
    def test_unique_rows_first_occurrence(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 5), ("b", 3, 1)], "k string, seq long, v long"
        )
        got = {
            (r["k"], r["seq"]) for r in unique_rows(df, ["k"], order_col="seq").collect()
        }
        assert got == {("a", 1), ("b", 3)}
