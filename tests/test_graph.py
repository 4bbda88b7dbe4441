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


def _py_hits(edges, n_iters, scale=graph.SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    h = {v: scale // len(nodes) for v in nodes}
    a = {}
    for _ in range(n_iters):
        a = {v: 0 for v in nodes}
        for s, d in edges:
            a[d] += h[s]
        ta = sum(a.values())
        a = {v: x * scale // ta for v, x in a.items()}
        h = {v: 0 for v in nodes}
        for s, d in edges:
            h[s] += a[d]
        th = sum(h.values())
        h = {v: x * scale // th for v, x in h.items()}
    return a, h


class TestHITS:
    def test_exact_integer_parity(self, spark, edges_df):
        got = {
            r["node"]: (r["auth_micro"], r["hub_micro"])
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
        assert rows[0]["auth_micro"] == max(r["auth_micro"] for r in rows.values())
        assert rows[5]["hub_micro"] > rows[5]["auth_micro"] == 0
        # normalized columns sum to ~1 (flooring loses < n micro-units)
        assert sum(r["auth"] for r in rows.values()) == pytest.approx(1.0, abs=1e-9)
        assert sum(r["hub"] for r in rows.values()) == pytest.approx(1.0, abs=1e-9)

    def test_hub_heavy_graph_does_not_overflow(self, spark):
        # star graph: 5000 leaves all pointing at one authority, plus the
        # hub fan-out — the shape that overflows int64 under an
        # unnormalized HITS after a few rounds
        e = spark.range(5000).selectExpr("id + 1 AS src", "CAST(0 AS LONG) dst")
        e = e.unionByName(
            spark.range(5000).selectExpr("CAST(0 AS LONG) src", "id + 1 AS dst")
        )
        got = {
            r["node"]: (r["auth_micro"], r["hub_micro"])
            for r in graph.hits(e, n_iters=6).collect()
        }
        edges = [(i + 1, 0) for i in range(5000)] + [(0, i + 1) for i in range(5000)]
        a, h = _py_hits(edges, 6)
        assert got == {v: (a[v], h[v]) for v in a}
        # node 0 out-authorities every individual leaf by the star ratio
        assert got[0][0] > 1000 * max(got[i + 1][0] for i in range(5000))

    def test_empty_guard(self, spark):
        empty = spark.createDataFrame([], "src long, dst long")
        with pytest.raises(ValueError, match="empty"):
            graph.hits(empty)


class TestLinkGraphStats:
    def test_counts_and_internal_pct(self, spark):
        links = spark.createDataFrame(
            [
                ("http://a.com/1", "http://a.com/2"),
                ("http://a.com/1", "http://sub.a.com/3"),  # registered: internal
                ("http://a.com/2", "http://b.org/x"),
                ("http://a.com/2", "http://b.org/x"),  # duplicate edge counts
                ("http://b.org/x", "http://a.com/1"),
            ],
            "src_url string, dst_url string",
        )
        got = {
            r["domain"]: r for r in graph.link_graph_stats(links).collect()
        }
        a = got["a.com"]
        assert (a["n_pages"], a["n_outlinks"], a["n_internal"], a["n_external"]) == (
            2, 4, 2, 2,
        )
        assert a["n_unique_targets"] == 3 and a["internal_pct"] == 50
        b = got["b.org"]
        assert (b["n_outlinks"], b["n_internal"], b["internal_pct"]) == (1, 0, 0)
