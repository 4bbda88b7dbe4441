"""Distributed PageRank (operators/graph.py) vs an exact integer
re-derivation — the fixed-point contract makes equality exact, not
approximate."""

from __future__ import annotations

import pytest

from webscraping_spark.operators import graph

# small web: 0 is a hub everyone links to; 4 is dangling; 5 links only out
EDGES = [
    (1, 0), (2, 0), (3, 0), (5, 0),
    (0, 1), (1, 2), (2, 3), (3, 4), (5, 2),
]


def _py_pagerank(edges, n_iters, damping_pct=85, scale=graph.SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    base = (100 - damping_pct) * scale // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        dangling = sum(r[v] for v in nodes if v not in out)
        share = damping_pct * dangling // (100 * n)
        nxt = {v: base + share for v in nodes}
        for s, d in edges:
            nxt[d] += damping_pct * r[s] // (100 * out[s])
        r = nxt
    return r


@pytest.fixture()
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


class TestPageRank:
    def test_exact_integer_parity(self, spark, edges_df):
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.pagerank(edges_df, n_iters=5).collect()
        }
        assert got == _py_pagerank(EDGES, n_iters=5)

    def test_partitioning_invariant_exactly(self, spark, edges_df):
        a = sorted(map(tuple, graph.pagerank(edges_df, n_iters=4).collect()))
        b = sorted(
            map(tuple, graph.pagerank(edges_df.repartition(7), n_iters=4).collect())
        )
        assert a == b  # integer fixed point: EXACT, not allclose

    def test_hub_ranks_highest_and_mass_conserved(self, spark, edges_df):
        rows = graph.pagerank(edges_df, n_iters=10).collect()
        ranks = {r["node"]: r["rank_micro"] for r in rows}
        assert max(ranks, key=ranks.get) == 0  # the hub
        # floor-quantization only ever LOSES mass, ~1e-12/edge/iter
        assert 0.97 * graph.SCALE <= sum(ranks.values()) <= graph.SCALE

    def test_guards(self, spark):
        empty = spark.createDataFrame([], "src long, dst long")
        with pytest.raises(ValueError):
            graph.pagerank(empty)
        some = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            graph.pagerank(some, damping_pct=100)


def _py_hits(edges, n_iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    h = {v: 1 for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(n_iters):
        a = {v: 0 for v in nodes}
        for s, d in edges:
            a[d] += h[s]
        h = {v: 0 for v in nodes}
        for s, d in edges:
            h[s] += a[d]
    return a, h


class TestHITS:
    def test_exact_integer_parity(self, spark, edges_df):
        got = {
            r["node"]: (r["auth_raw"], r["hub_raw"])
            for r in graph.hits(edges_df, n_iters=3).collect()
        }
        a, h = _py_hits(EDGES, 3)
        assert got == {v: (a[v], h[v]) for v in a}

    def test_partitioning_invariant_exactly(self, spark, edges_df):
        base = sorted(map(tuple, graph.hits(edges_df, n_iters=3).collect()))
        shuf = sorted(
            map(tuple, graph.hits(edges_df.repartition(7, "dst"), n_iters=3).collect())
        )
        assert base == shuf

    def test_hub_and_authority_separation(self, spark, edges_df):
        rows = {r["node"]: r for r in graph.hits(edges_df, n_iters=3).collect()}
        # node 0 is everyone's target: top authority; node 5 only links
        # out (to the best authorities): hub strictly beats its authority
        assert rows[0]["auth_raw"] == max(r["auth_raw"] for r in rows.values())
        assert rows[5]["hub_raw"] > rows[5]["auth_raw"] == 0
        # normalized columns sum to 1
        assert sum(r["auth"] for r in rows.values()) == pytest.approx(1.0)
        assert sum(r["hub"] for r in rows.values()) == pytest.approx(1.0)

    def test_overflow_guard(self, spark):
        # star graph: hub 0 -> 5000 leaves; 40 rounds would blow int64
        e = spark.range(5000).selectExpr("CAST(0 AS LONG) src", "id + 1 dst")
        with pytest.raises(ValueError, match="overflow"):
            graph.hits(e, n_iters=40)

    def test_empty_guard(self, spark):
        empty = spark.createDataFrame([], "src long, dst long")
        with pytest.raises(ValueError, match="empty"):
            graph.hits(empty)
