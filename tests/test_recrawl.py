"""Recrawl scheduling (operators/recrawl.py): exact parity with an
independent Python re-derivation, partitioning invariance (integer
arithmetic), single-visit/never-changing semantics, the top-k plan
shape, and the one-Exchange window+agg fusion."""

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators.recrawl import (
    MICRO,
    recrawl_priorities,
    schedule_recrawls,
)

NOW = 10_000


def history_rows():
    rows = []
    # url 1: changes every visit (rate 1.0) — hot page
    for i, c in enumerate(["a", "b", "c", "d"]):
        rows.append((1, 1000 + i * 100, c))
    # url 2: never changes — rate 0, priority 0 however stale
    for i in range(5):
        rows.append((2, 500 + i * 50, "same"))
    # url 3: changes 1 of 3 intervals -> rate 333333 micro (floor)
    for i, c in enumerate(["x", "x", "y", "y"]):
        rows.append((3, 2000 + i * 10, c))
    # url 4: single visit -> no interval, rate 0
    rows.append((4, 9000, "only"))
    return rows


def py_derive(rows, now=NOW):
    by_url = {}
    for u, ts, c in rows:
        by_url.setdefault(u, []).append((ts, c))
    out = {}
    for u, obs in by_url.items():
        obs.sort()
        changes = sum(
            1 for (_, a), (_, b) in zip(obs, obs[1:]) if a != b
        )
        n = len(obs)
        rate = (changes * MICRO) // (n - 1) if n > 1 else 0
        stale = now - obs[-1][0]
        out[u] = (n, changes, rate, stale, rate * stale)
    return out


@pytest.fixture(scope="module")
def hist(spark):
    return spark.createDataFrame(
        history_rows(), "url_hash long, crawl_ts long, content_hash string"
    )


class TestRecrawlPriorities:
    def test_python_parity(self, spark, hist):
        got = {
            r["url_hash"]: (
                r["n_visits"], r["n_changes"], r["change_rate_micro"],
                r["staleness"], r["priority"],
            )
            for r in recrawl_priorities(hist, NOW).collect()
        }
        assert got == py_derive(history_rows())

    def test_semantics(self, hist):
        got = {r["url_hash"]: r for r in recrawl_priorities(hist, NOW).collect()}
        assert got[1]["change_rate_micro"] == MICRO          # every interval
        assert got[2]["priority"] == 0                        # never changes
        assert got[3]["change_rate_micro"] == MICRO // 3      # floor div
        assert got[4]["change_rate_micro"] == 0               # single visit
        assert got[4]["n_visits"] == 1

    def test_partitioning_invariance_exact(self, spark, hist):
        a = sorted(map(tuple, recrawl_priorities(hist, NOW).collect()))
        b = sorted(
            map(
                tuple,
                recrawl_priorities(hist.repartition(13), NOW).collect(),
            )
        )
        assert a == b  # EXACT — integer arithmetic end to end

    def test_single_exchange(self, hist):
        plan = (
            recrawl_priorities(hist, NOW)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # window and agg share the url partitioning: exactly one shuffle
        assert plan.count("Exchange") == 1
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan

    def test_schedule_topk_plan_and_order(self, spark, hist):
        pri = recrawl_priorities(hist, NOW)
        top = schedule_recrawls(pri, 2)
        rows = top.collect()
        exp = sorted(
            py_derive(history_rows()).items(),
            key=lambda kv: (-kv[1][4], kv[0]),
        )[:2]
        assert [r["url_hash"] for r in rows] == [u for u, _ in exp]
        plan = top._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
