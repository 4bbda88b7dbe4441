"""BM25 retrieval (operators/search.py) vs an independent Python
re-derivation, plus plan-shape and determinism checks."""

from __future__ import annotations

import math

import pytest

from webscraping_spark.operators import search

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug near the dog house"),
    (2, "a cat and a dog sat together on the mat"),
    (3, "spark shuffles the partitions of the table"),
    (4, "rare zyzzyva token appears here once"),
    (5, "cat cat cat cat cat"),  # tf saturation case
    (6, ""),  # empty doc
    (7, "   "),  # whitespace-only doc
]


def _half_up(x: float) -> int:
    # Spark/DuckDB round() is half-away-from-zero; Python round() is
    # banker's. All values here are positive.
    return math.floor(x + 0.5)


def _py_bm25(docs, query, k1=1.2, b=0.75):
    """Independent fixed-point BM25 mirroring the operator's arithmetic
    shape exactly (quantized idf per term, quantized per-posting
    contribution, integer per-doc sum)."""
    toks = {i: (t.strip().lower().split() if t.strip() else []) for i, t in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl = total / n
    terms = sorted(set(query.strip().lower().split()))
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s, hit = 0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            hit += 1
            idf_fixed = _half_up(
                math.log(1.0 + (float(n) - df[t] + 0.5) / (df[t] + 0.5)) * 1e6
            )
            tfw = (
                tf * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * (len(v) / avgdl)))
            )
            s += _half_up((idf_fixed / 1e6) * tfw * 1e6)
        if hit:
            out[i] = (hit, round(s / 1e6, 6))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(docs_df):
    return search.bm25_fit(docs_df)


class TestFit:
    def test_index_tables(self, index):
        assert index.n_docs == 8
        assert index.total_tokens == sum(
            len(t.split()) for _, t in DOCS if t.strip()
        )
        post = {
            (r["term"], r["doc_id"]): r["tf"] for r in index.postings.collect()
        }
        assert post[("cat", 5)] == 5
        assert post[("the", 1)] == 3
        dls = {r["doc_id"]: r["dl"] for r in index.doc_lens.collect()}
        assert dls[6] == 0 and dls[7] == 0 and dls[0] == 6
        dfs = {r["term"]: r["df"] for r in index.doc_freq.collect()}
        assert dfs["cat"] == 3 and dfs["zyzzyva"] == 1


class TestScores:
    def test_python_parity_exact(self, index):
        query = "cat dog zyzzyva"
        got = {
            r["doc_id"]: (r["n_terms_hit"], r["score"])
            for r in search.bm25_scores(index, query).collect()
        }
        assert got == _py_bm25(DOCS, query)

    def test_rare_term_beats_common(self, index):
        # idf: unique term should dominate a stopword-frequency term
        top = search.bm25_topk(index, "zyzzyva the", k=1).collect()
        assert top[0]["doc_id"] == 4

    def test_tf_saturation(self, index):
        # doc 5 has tf=5 for 'cat' but BM25 saturates toward (k1+1): it
        # must rank above a single-occurrence doc yet score FAR below the
        # linear 5x a raw-tf scorer would give
        scores = {
            r["doc_id"]: r["score"]
            for r in search.bm25_scores(index, "cat").collect()
        }
        assert scores[0] < scores[5] < 2.5 * scores[0]

    def test_partitioning_invariance_exact(self, docs_df):
        q = "cat dog sat table"
        a = search.bm25_scores(search.bm25_fit(docs_df.repartition(1)), q)
        c = search.bm25_scores(search.bm25_fit(docs_df.repartition(7)), q)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))

    def test_empty_query_and_no_hits(self, index, spark):
        assert search.bm25_scores(index, "   ").count() == 0
        assert search.bm25_scores(index, "qqqqq wwwww").count() == 0
        assert search.bm25_topk(index, "", k=5).columns == [
            "doc_id",
            "n_terms_hit",
            "score",
        ]


class TestPlanShape:
    def test_topk_is_take_ordered_no_python(self, index):
        plan = search.bm25_topk(index, "cat dog", k=3)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_idf_side_broadcasts(self, index):
        plan = search.bm25_scores(index, "cat dog")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
