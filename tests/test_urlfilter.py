"""URL quality gate (operators/urlfilter.py): per-signal trip tests, a
Python re-derivation parity check, and the zero-shuffle/zero-Python plan
shape."""

from __future__ import annotations

import re

import pytest

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
