"""DSIR importance weighting/resampling (operators/importance.py): the
hashed-gram contract vs an independent Python re-derivation, scoring and
resample determinism, and the zero-shuffle plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest

from webscraping_spark.operators import importance


def _py_bucket(gram: str, n_buckets: int, salt: str) -> int:
    h = hashlib.md5(f"{gram}:{salt}".encode()).hexdigest()
    return int(h[:8], 16) % n_buckets


def _py_grams(text: str) -> list[str]:
    toks = text.strip().lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_fit(target: list[str], raw: list[str], B: int, alpha=1.0, salt="dsir"):
    def counts(corpus):
        c = [0] * B
        for text in corpus:
            for g in _py_grams(text):
                c[_py_bucket(g, B, salt)] += 1
        return c, sum(c)

    tc, tt = counts(target)
    rc, rt = counts(raw)
    return [
        round(
            math.log((tc[b] + alpha) / (tt + alpha * B))
            - math.log((rc[b] + alpha) / (rt + alpha * B)),
            6,
        )
        for b in range(B)
    ]


def _py_logw(text: str, ratios: list[float]) -> float:
    acc = 0.0
    for g in _py_grams(text):
        acc += ratios[_py_bucket(g, len(ratios), "dsir")]
    return round(acc, 6)


def _py_gumbel(doc_id, salt="g42") -> float:
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()
    u = (int(h[:8], 16) + 1) / (2**32 + 1)
    return round(-math.log(-math.log(u)), 6)


TARGET = [
    "the model trains on clean web text every day",
    "clean web text makes the model train well",
    "training data quality drives the model",
]
RAW = [
    "the model trains on clean web text every day",
    "buy cheap watches online free shipping today",
    "casino bonus codes click here now",
    "training data quality drives the model forward",
    "weather tomorrow sunny with light winds",
    "",
]


class TestFeaturization:
    def test_buckets_match_python(self, spark):
        B = 64
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["b"]
            for r in docs.select(
                "doc_id", importance.ngram_bucket_col("text", B).alias("b")
            ).collect()
        }
        for i, t in enumerate(RAW):
            assert got[i] == [_py_bucket(g, B, "dsir") for g in _py_grams(t)], i

    def test_empty_doc_empty_grams(self, spark):
        docs = spark.createDataFrame([(0, ""), (1, "one")], "doc_id long, text string")
        rows = {
            r["doc_id"]: r["b"]
            for r in docs.select(
                "doc_id", importance.ngram_bucket_col("text", 16).alias("b")
            ).collect()
        }
        assert rows[0] == [] and len(rows[1]) == 1  # 1 unigram, 0 bigrams


class TestFitAndWeights:
    def test_fit_matches_python(self, spark):
        B = 64
        tdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TARGET)], "doc_id long, text string"
        )
        rdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
        )
        got = importance.fit_logratios(tdf, rdf, n_buckets=B)
        assert got == _py_fit(TARGET, RAW, B)

    def test_weights_match_python_and_rank_target_style_first(self, spark):
        B = 64
        ratios = _py_fit(TARGET, RAW, B)
        rdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["logw"]
            for r in importance.importance_weights(rdf, ratios).collect()
        }
        for i, t in enumerate(RAW):
            assert got[i] == pytest.approx(_py_logw(t, ratios), abs=1e-9), i
        # the doc shared with the target corpus outranks the spam docs
        assert got[0] > got[1] and got[0] > got[2]
        assert got[5] == 0.0  # empty doc

    def test_weights_plan_zero_shuffle_zero_python(self, spark):
        docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = (
            importance.importance_weights(docs, [0.0] * 64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "ArrowEval" not in plan and "BatchEval" not in plan

    def test_xxhash_path_runs(self, spark):
        docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        out = docs.select(
            importance.ngram_bucket_col("text", 32, hasher="xxhash64").alias("b")
        ).collect()[0]["b"]
        assert len(out) == 5 and all(0 <= b < 32 for b in out)


class TestResample:
    def test_topk_matches_python_rederivation(self, spark):
        B, k = 64, 3
        ratios = _py_fit(TARGET, RAW, B)
        rdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
        )
        got = sorted(
            r["doc_id"]
            for r in importance.importance_resample(rdf, ratios, k=k).collect()
        )
        scores = {
            i: round(_py_logw(t, ratios) + _py_gumbel(i), 6)
            for i, t in enumerate(RAW)
        }
        want = sorted(
            sorted(scores, key=lambda i: (-scores[i], i))[:k]
        )
        assert got == want

    def test_partitioning_invariant(self, spark):
        B, k = 32, 4
        ratios = _py_fit(TARGET, RAW, B)
        rdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(RAW * 5)], "doc_id long, text string"
        )
        one = sorted(
            r["doc_id"]
            for r in importance.importance_resample(rdf, ratios, k=k).collect()
        )
        many = sorted(
            r["doc_id"]
            for r in importance.importance_resample(
                rdf.repartition(7), ratios, k=k
            ).collect()
        )
        assert one == many

    def test_k_guard(self, spark):
        docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            importance.importance_resample(docs, [0.0], k=0)

    def test_topk_plan_is_take_ordered(self, spark):
        docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = (
            importance.importance_resample(docs, [0.0] * 16, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
