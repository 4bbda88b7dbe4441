"""Product-quantization ANN (operators/similarity.pq_fit / pq_encode /
pq_adc_topk / pq_topk): codebook determinism, numpy parity of the encode
and ADC math, recall of planted duplicates, the refine re-rank contract,
and the guards.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators.similarity import (
    cosine_topk,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    pq_topk,
)

DIM = 16


def _corpus(spark, n=120, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def test_fit_deterministic_across_partitionings(spark):
    df, _ = _corpus(spark)
    b1 = pq_fit(df, m=4, n_codes=8, n_iters=3)
    b2 = pq_fit(df.repartition(7, "vec_id"), m=4, n_codes=8, n_iters=3)
    assert b1.shape == (4, 8, DIM // 4)
    np.testing.assert_array_equal(b1, b2)


def test_fit_guards(spark):
    df, _ = _corpus(spark, n=4)
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(df, m=5, n_codes=2)
    with pytest.raises(ValueError, match="smaller than n_codes"):
        pq_fit(df, m=4, n_codes=8)
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty corpus"):
        pq_fit(empty, m=4, n_codes=2)


def test_encode_matches_numpy(spark):
    df, vecs = _corpus(spark)
    books = pq_fit(df, m=4, n_codes=8, n_iters=3)
    got = {r["vec_id"]: r["codes"] for r in pq_encode(df, books).collect()}
    dsub = DIM // 4
    for i in range(len(vecs)):
        for j in range(4):
            sub = vecs[i, j * dsub : (j + 1) * dsub]
            want = int(np.argmin(((books[j] - sub) ** 2).sum(axis=1)))
            assert got[i][j] == want


def test_adc_distance_matches_numpy(spark):
    df, vecs = _corpus(spark)
    books = pq_fit(df, m=4, n_codes=8, n_iters=3)
    q = vecs[3].tolist()
    enc = pq_encode(df, books)
    got = {r["vec_id"]: r["adc_dist"] for r in pq_adc_topk(enc, q, books, k=120).collect()}
    codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    dsub = DIM // 4
    for i, cs in codes.items():
        want = sum(
            ((books[j][cs[j]] - np.asarray(q)[j * dsub : (j + 1) * dsub]) ** 2).sum()
            for j in range(4)
        )
        assert got[i] == pytest.approx(want, rel=1e-9)


def test_planted_duplicates_recalled(spark):
    df, vecs = _corpus(spark)
    q = vecs[0].tolist()
    dupes = spark.createDataFrame(
        [(1000 + i, q) for i in range(6)], "vec_id long, embedding array<float>"
    )
    corpus = df.unionByName(dupes)
    books = pq_fit(corpus, m=4, n_codes=16, n_iters=4)
    got = {r["vec_id"] for r in pq_topk(corpus, q, books, k=7).collect()}
    # the 6 planted exact duplicates + vec 0 itself share the query's own
    # code word (ADC distance is the global minimum), so all 7 must be in
    # the top-7
    assert got == {0, 1000, 1001, 1002, 1003, 1004, 1005}


def test_refine_reranks_to_exact_cosine(spark):
    df, vecs = _corpus(spark)
    q = vecs[5].tolist()
    books = pq_fit(df, m=4, n_codes=8, n_iters=3)
    refined = pq_topk(df, q, books, k=5, refine=40).collect()
    # the refined output is exact cosine over the ADC shortlist: scores
    # must be descending and equal cosine_topk's on the same candidates
    scores = [r["cosine"] for r in refined]
    assert scores == sorted(scores, reverse=True)
    exact = cosine_topk(df, q, k=5).collect()
    # with refine=40 of 120 the shortlist almost surely holds the true
    # top-1 (the self vector at cosine 1.0)
    assert refined[0]["vec_id"] == exact[0]["vec_id"] == 5


def test_query_dim_guard(spark):
    df, _ = _corpus(spark)
    books = pq_fit(df, m=4, n_codes=8, n_iters=1)
    enc = pq_encode(df, books)
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_topk(enc, [0.0] * (DIM + 4), books, k=3)


def test_ivfpq_routes_and_recalls(spark):
    from webscraping_spark.operators.similarity import ivf_fit, ivfpq_topk

    df, vecs = _corpus(spark, n=200)
    q = vecs[0].tolist()
    dupes = spark.createDataFrame(
        [(2000 + i, q) for i in range(5)], "vec_id long, embedding array<float>"
    )
    corpus = df.unionByName(dupes)
    cents = ivf_fit(corpus, n_centroids=8, n_iters=4)
    books = pq_fit(corpus, m=4, n_codes=16, n_iters=3)
    got = {
        r["vec_id"]
        for r in ivfpq_topk(corpus, q, cents, books, k=6, nprobe=3, refine=30).collect()
    }
    # exact duplicates land in the query's own cell (its top probe) and
    # share its code word: all six cosine-1.0 vectors must be returned
    assert got == {0, 2000, 2001, 2002, 2003, 2004}


def test_ivfpq_without_refine_returns_adc_distances(spark):
    from webscraping_spark.operators.similarity import ivf_fit, ivfpq_topk

    df, vecs = _corpus(spark, n=150)
    cents = ivf_fit(df, n_centroids=4, n_iters=3)
    books = pq_fit(df, m=4, n_codes=8, n_iters=3)
    out = ivfpq_topk(df, vecs[1].tolist(), cents, books, k=5, nprobe=2).collect()
    assert [c for c in out[0].asDict()] == ["vec_id", "adc_dist"]
    dists = [r["adc_dist"] for r in out]
    assert dists == sorted(dists)


def test_ivf_residuals_numpy_parity(spark):
    from webscraping_spark.operators.similarity import ivf_fit, ivf_residuals

    df, vecs = _corpus(spark, n=80)
    cents = ivf_fit(df, n_centroids=4, n_iters=3)
    got = {r["vec_id"]: r for r in ivf_residuals(df, cents).collect()}
    for i in range(80):
        v = vecs[i]
        a = int(np.argmax((v / max(np.linalg.norm(v), 1e-12)) @ cents.T))
        assert got[i]["centroid"] == a
        np.testing.assert_allclose(got[i]["residual"], v - cents[a], rtol=1e-12)


def test_residual_ivfpq_recalls_planted_duplicates(spark):
    from webscraping_spark.operators.similarity import (
        ivf_fit,
        ivf_residuals,
        ivfpq_residual_topk,
    )

    df, vecs = _corpus(spark, n=200)
    q = vecs[0].tolist()
    dupes = spark.createDataFrame(
        [(3000 + i, q) for i in range(5)], "vec_id long, embedding array<float>"
    )
    corpus = df.unionByName(dupes)
    cents = ivf_fit(corpus, n_centroids=8, n_iters=4)
    res = ivf_residuals(corpus, cents).withColumnRenamed("residual", "embedding")
    books = pq_fit(res, m=4, n_codes=16, n_iters=3)
    got = {
        r["vec_id"]
        for r in ivfpq_residual_topk(
            corpus, q, cents, books, k=6, nprobe=3, refine=30
        ).collect()
    }
    assert got == {0, 3000, 3001, 3002, 3003, 3004}
