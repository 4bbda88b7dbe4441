"""URL quality gate (operators/urlfilter.py): per-signal trip tests, a
Python re-derivation parity check, and the zero-shuffle/zero-Python plan
shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators import urlfilter

URLS = [
    (0, "http://www.site.com/a/b/page.html"),  # clean
    (1, "http://www.xxxcasino-hub.com/x"),  # badwords (xxx + casino)
    (2, "http://192.168.3.7/p"),  # IP host
    (3, "http://www.s.com/" + "7" * 600),  # long + digit-heavy
    (4, "http://www.s.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9"),  # 9 params
    (5, "http://cheap-deals-best-buy-now-free.com/"),  # hyphen spam
    (6, "http://d.com" + "/seg" * 13),  # path depth 13
    (7, "HTTP://WWW.UPPER.COM/OK?X=1"),  # case folding
]


def _py_signals(url, words=urlfilter.DEFAULT_BADWORDS):
    u = url.lower()
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]*)", u)
    host = m.group(1) if m else ""
    m = re.match(r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = m.group(1) if m else ""
    m = re.search(r"\?([^#]*)", u)
    query = m.group(1) if m else ""
    digits = sum(c.isdigit() for c in u)
    return (
        len(u),
        round(digits / max(len(u), 1), 6),
        0 if query == "" else query.count("&") + 1,
        path.count("/"),
        len(re.findall("(" + "|".join(words) + ")", u)),
        1 if re.match(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$", host) else 0,
        host.count("-"),
    )


@pytest.fixture(scope="module")
def gated(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    return {
        r["id"]: r.asDict()
        for r in urlfilter.url_quality_gate(df).collect()
    }


SIGNAL_COLS = [
    "url_len",
    "digit_frac",
    "n_params",
    "path_depth",
    "badword_hits",
    "is_ip_host",
    "host_hyphens",
]


class TestSignals:
    def test_python_parity(self, gated):
        for i, url in URLS:
            got = tuple(gated[i][c] for c in SIGNAL_COLS)
            assert got == _py_signals(url), (i, url, got)

    def test_each_rule_trips_exactly_one_class(self, gated):
        assert gated[0]["keep"] == 1 and gated[7]["keep"] == 1
        assert gated[1]["badword_hits"] == 2 and gated[1]["keep"] == 0
        assert gated[2]["is_ip_host"] == 1 and gated[2]["keep"] == 0
        assert gated[3]["url_len"] > 512 and gated[3]["digit_frac"] > 0.5
        assert gated[3]["keep"] == 0
        assert gated[4]["n_params"] == 9 and gated[4]["keep"] == 0
        assert gated[5]["host_hyphens"] == 5 and gated[5]["keep"] == 0
        assert gated[6]["path_depth"] == 13 and gated[6]["keep"] == 0

    def test_thresholds_are_kwargs(self, spark):
        df = spark.createDataFrame(URLS, "id long, url string")
        loose = urlfilter.url_quality_gate(
            df, max_params=20, max_path_depth=20, max_host_hyphens=10
        )
        kept = {r["id"] for r in loose.filter("keep = 1").collect()}
        assert {4, 5, 6} <= kept


class TestPlanShape:
    def test_pure_projection(self, spark):
        df = spark.createDataFrame(URLS, "id long, url string")
        plan = (
            urlfilter.url_quality_gate(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestTrapDetection:
    def _urls(self, spark):
        rows = []
        # calendar trap: 60 urls, one digit-collapsed template
        rows += [(f"http://trap.com/cal/2024/{m:02d}/{d:02d}",) for m in range(1, 7) for d in range(1, 11)]
        # session-id trap: 30 urls, one query-value-collapsed template
        rows += [(f"http://shop.com/item?sid=s{i}x{i}&page=1",) for i in range(30)]
        # healthy: 25 urls, distinct word paths (no digits)
        rows += [(f"http://wiki.com/topic/{'abcdefghij'[i % 10]}{'klmnopqrst'[i // 10]}",) for i in range(25)]
        # small: 5 urls, same template but under min_urls
        rows += [(f"http://tiny.com/p/{i}",) for i in range(5)]
        return spark.createDataFrame(rows, "url string")

    def test_template_collapse(self, spark):
        from pyspark.sql import functions as F

        from webscraping_spark.operators.urlfilter import url_template_col

        df = spark.createDataFrame(
            [("http://a.com/cal/2024/05/03?sid=ab12&x=9&flag",)], "url string"
        )
        (r,) = df.select(url_template_col(F.col("url")).alias("t")).collect()
        assert r["t"] == "http://a.com/cal/N/N/N?sid=&x=&flag"

    def test_verdicts(self, spark):
        from webscraping_spark.operators.urlfilter import trap_signals

        v = {r["domain"]: r for r in trap_signals(self._urls(spark)).collect()}
        assert v["trap.com"]["is_trap"] and v["trap.com"]["n_templates"] == 1
        assert v["trap.com"]["n_urls"] == 60 and v["trap.com"]["top_n"] == 60
        assert v["shop.com"]["is_trap"]
        assert v["shop.com"]["top_template"] == "http://shop.com/item?sid=&page="
        assert not v["wiki.com"]["is_trap"]  # 25 distinct templates
        assert v["wiki.com"]["n_templates"] == 25 and v["wiki.com"]["top_n"] == 1
        assert not v["tiny.com"]["is_trap"]  # majority but under min_urls

    def test_gate_marks_only_trap_template_urls(self, spark):
        from webscraping_spark.operators.urlfilter import gate_trap_urls

        df = self._urls(spark)
        got = {r["url"]: r["trapped"] for r in gate_trap_urls(df).collect()}
        assert got["http://trap.com/cal/2024/01/01"] is True
        assert got["http://shop.com/item?sid=s0x0&page=1"] is True
        assert got["http://wiki.com/topic/ak"] is False
        assert got["http://tiny.com/p/0"] is False
        assert sum(got.values()) == 90  # exactly the two trap groups

    def test_single_shuffle_on_url_table(self, spark):
        # the URL table is exchanged once (domain,template groupBy); the
        # window runs over the already-aggregated template table
        from webscraping_spark.operators.urlfilter import trap_signals

        plan = trap_signals(self._urls(spark))._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 3  # agg + window re-key + AQE reads
        assert "Python" not in plan


class TestTrackingParams:
    CASES = [
        ("http://a.com/p?utm_source=x&id=3&utm_medium=y", "http://a.com/p?id=3"),
        ("http://a.com/p?gclid=abc", "http://a.com/p"),
        ("http://a.com/p?fbclid", "http://a.com/p"),
        ("http://a.com/p?gclid2=keep&a=b", "http://a.com/p?gclid2=keep&a=b"),
        ("http://a.com/p?a=1&UTM_CAMPAIGN=Z&b=2#frag", "http://a.com/p?a=1&b=2#frag"),
        ("http://a.com/p#only", "http://a.com/p#only"),
        ("http://a.com/p", "http://a.com/p"),
        ("http://a.com/p?x=utm_source", "http://a.com/p?x=utm_source"),
    ]

    def test_strip(self, spark):
        from pyspark.sql import functions as F

        from webscraping_spark.operators.urlfilter import strip_tracking_params_col

        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "url string")
        got = [r["out"] for r in df.select(strip_tracking_params_col(F.col("url")).alias("out")).collect()]
        assert got == [e for _, e in self.CASES]

    def test_plan_zero_exchange(self, spark):
        from webscraping_spark.operators.urlfilter import strip_tracking_params

        df = spark.createDataFrame([("http://a.com/?utm_x=1",)], "url string")
        plan = strip_tracking_params(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestHostAliasFolding:
    def _fold(self, spark, urls):
        from webscraping_spark.operators.urlfilter import fold_host_aliases_col

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [
            r["f"]
            for r in df.select(fold_host_aliases_col(F.col("url")).alias("f")).collect()
        ]

    def test_folds(self, spark):
        got = self._fold(
            spark,
            [
                "http://WWW.Site.com:80/P?q=1",
                "https://www.a.org:443/x",
                "https://a.org:8443/x",  # non-default port kept
                "http://wwwx.com/",  # 'www' must be a full label
                "ftp://WWW.f.com/",  # non-http(s): lowercase only
                "relative/path",  # no host: untouched
            ],
        )
        assert got == [
            "http://site.com/P?q=1",
            "https://a.org/x",
            "https://a.org:8443/x",
            "http://wwwx.com/",
            "ftp://f.com/",
            "relative/path",
        ]

    def test_idempotent(self, spark):
        once = self._fold(spark, ["http://WWW.Site.com:80/P?Q"])
        twice = self._fold(spark, once)
        assert once == twice


class TestRobotsFreshness:
    def test_states(self, spark):
        from webscraping_spark.operators.urlfilter import robots_freshness_col

        rows = [(1, 100), (2, None), (3, 86_500)]
        df = spark.createDataFrame(rows, "k int, fetched_at long")
        got = {
            r["k"]: r["s"]
            for r in df.select(
                "k",
                robots_freshness_col(
                    F.col("fetched_at"), F.lit(100_000).cast("long")
                ).alias("s"),
            ).collect()
        }
        # ages: 99900 (stale), missing, 13500 (fresh)
        assert got == {1: "stale", 2: "missing", 3: "fresh"}
