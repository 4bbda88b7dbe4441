"""Bigram-LM perplexity (operators/lm.py) vs an independent Python
re-derivation, plus the CCNet-style ranking semantics."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from webscraping_spark.operators import lm

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat together",
    "the cat and the dog",
]
SCORE = TRAIN + [
    "zzz qqq www rrr",  # all-OOV gibberish
    "one",  # single token -> no bigrams
    "",  # empty
]


def _py_fit(corpus, alpha=1.0):
    uni, bi = Counter(), Counter()
    for text in corpus:
        toks = text.strip().lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    return uni, bi, len(uni), alpha


def _py_ppl(text, uni, bi, V, alpha):
    toks = text.strip().lower().split()
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return 0, None
    total = 0
    for p in pairs:
        logp = math.log((bi.get(p, 0) + alpha) / (uni.get(p[0], 0) + alpha * V))
        total += int(round(logp * 1e6))
    return len(pairs), round(math.exp(-(total / 1e6) / len(pairs)), 6)


@pytest.fixture(scope="module")
def fitted(spark):
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id long, text string"
    )
    return lm.fit_bigram_lm(tdf)


class TestFit:
    def test_counts_match_python(self, spark, fitted):
        uni, bi, V, _ = _py_fit(TRAIN)
        got_uni = {r["w1"]: r["c1"] for r in fitted.unigrams.collect()}
        got_bi = {(r["w1"], r["w2"]): r["c12"] for r in fitted.bigrams.collect()}
        assert got_uni == dict(uni)
        assert got_bi == dict(bi)
        assert fitted.vocab_size == V


class TestPerplexity:
    def test_matches_python_rederivation(self, spark, fitted):
        uni, bi, V, alpha = _py_fit(TRAIN)
        sdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(SCORE)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_bigrams"], r["ppl"])
            for r in lm.perplexity(sdf, fitted).collect()
        }
        for i, t in enumerate(SCORE):
            assert got[i] == _py_ppl(t, uni, bi, V, alpha), (i, t)

    def test_in_domain_beats_gibberish(self, spark, fitted):
        sdf = spark.createDataFrame(
            [(0, TRAIN[0]), (1, "zzz qqq www rrr ttt")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["ppl"] for r in lm.perplexity(sdf, fitted).collect()}
        assert got[0] < got[1]

    def test_short_docs_null_ppl(self, spark, fitted):
        sdf = spark.createDataFrame(
            [(0, ""), (1, "one")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in lm.perplexity(sdf, fitted).collect()}
        for i in (0, 1):
            assert rows[i]["n_bigrams"] == 0 and rows[i]["ppl"] is None

    def test_partitioning_invariant(self, spark, fitted):
        sdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(SCORE * 10)], "doc_id long, text string"
        )
        a = sorted(map(tuple, lm.perplexity(sdf, fitted).collect()))
        b = sorted(map(tuple, lm.perplexity(sdf.repartition(13), fitted).collect()))
        assert a == b


class TestCcnetBuckets:
    def _scored(self, spark, ppls):
        rows = [(i, float(p) if p is not None else None) for i, p in enumerate(ppls)]
        return spark.createDataFrame(rows, "doc_id long, ppl double")

    def test_rank_tertiles_exact(self, spark):
        from webscraping_spark.operators.lm import ccnet_buckets

        # 9 docs, ppl = reversed ids so rank order != id order
        scored = self._scored(spark, [90, 80, 70, 60, 50, 40, 30, 20, 10])
        got = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(scored).collect()}
        assert [got[i] for i in range(9)] == [
            "tail", "tail", "tail", "middle", "middle", "middle",
            "head", "head", "head",
        ]

    def test_nulls_and_small_n(self, spark):
        from webscraping_spark.operators.lm import ccnet_buckets

        got = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(
            self._scored(spark, [5.0, None, 7.0])  # n=2: k1=0, k2=1
        ).collect()}
        assert got[1] is None
        assert got[0] == "middle" and got[2] == "tail"

    def test_tie_break_on_id(self, spark):
        from webscraping_spark.operators.lm import ccnet_buckets

        got = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(
            self._scored(spark, [5.0, 5.0, 5.0])
        ).collect()}
        assert got == {0: "head", 1: "middle", 2: "tail"}

    def test_sampled_cutoffs_deterministic(self, spark):
        from webscraping_spark.operators.lm import ccnet_buckets

        scored = self._scored(spark, list(range(1, 301)))
        a = sorted(map(tuple, ccnet_buckets(scored, sample_mod=4).collect()))
        b = sorted(map(tuple, ccnet_buckets(scored.repartition(7), sample_mod=4).collect()))
        assert a == b
        # roughly tertile-sized buckets from the sampled cutoffs
        from collections import Counter

        c = Counter(x[2] for x in a)
        assert all(60 < c[k] < 140 for k in ("head", "middle", "tail"))
