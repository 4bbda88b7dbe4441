"""Similarity search over embedding columns (ARRAY<FLOAT>).

Baseline: exact brute-force cosine top-k with pure JVM higher-order
functions (zip_with dot product — no Python in the scan). Scale path:
random-hyperplane LSH bucketing so each query probes a bucket, not the
corpus; recall is tested against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    The plan is a single scan + TakeOrderedAndProject: the dot product is a
    codegen'd fold over the array column against a literal array.
    """
    q = [float(x) for x in query_vec]
    qn = float(np.linalg.norm(q)) or 1.0
    qlit = F.array(*[F.lit(x) for x in q])
    v = _as_double(F.col(vec_col))
    cos = _dot(v, qlit) / (_norm(v) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign-pattern of n random hyperplane projections.

    The projection is a grouped-free mapInPandas numpy matmul — one Arrow
    batch in, one out; the hyperplanes are broadcast as a closure constant
    (seeded, so every executor derives the same matrix).
    """
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)

    out_schema = f"{id_col} long, bucket long"

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ planes) > 0
            bucket = np.zeros(len(pdf), dtype=np.int64)
            for j in range(planes.shape[1]):
                bucket |= signs[:, j].astype(np.int64) << j
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "bucket": bucket})

    return embeddings.select(id_col, vec_col).mapInPandas(project, out_schema)


def hyperplane_lsh_bucket_tables(
    embeddings: DataFrame,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket): one sign-pattern bucket per hash table.

    Multiple independent tables are the standard recall amplifier for
    hyperplane LSH — a near-dup pair missed by one table's split is caught
    by another (P[miss all T tables] = (1 - p^b)^T). All T projections run
    in ONE mapInPandas matmul over a (dim, n_planes*n_tables) matrix, so
    the cost of extra tables is a wider gemm, not extra scans.
    """
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes * n_tables)).astype(np.float64)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    out_schema = f"{id_col} long, table int, bucket long"

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = ((mat @ planes) > 0).astype(np.int64)
            n = len(pdf)
            ids = np.repeat(pdf[id_col].to_numpy(), n_tables)
            tables = np.tile(np.arange(n_tables, dtype=np.int32), n)
            # (n, T, b) -> bucket id per table
            buckets = (signs.reshape(n, n_tables, n_planes) * weights).sum(axis=2)
            yield pd.DataFrame(
                {id_col: ids, "table": tables, "bucket": buckets.reshape(-1)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(project, out_schema)


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (plus buckets within
    ``probe_hamming`` bit flips), exact-rank inside the probed set.

    At 100 TB the bucketed table is written partitioned by bucket so a
    query prunes to a handful of partitions (partition pruning on the
    bucket column) instead of scanning the corpus.
    """
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    signs = (q @ planes) > 0
    qbucket = 0
    for j in range(n_planes):
        qbucket |= int(signs[j]) << j
    probes = {qbucket}
    if probe_hamming >= 1:
        for j in range(n_planes):
            probes.add(qbucket ^ (1 << j))
    if probe_hamming >= 2:
        for j in range(n_planes):
            for j2 in range(j + 1, n_planes):
                probes.add(qbucket ^ (1 << j) ^ (1 << j2))
    buckets = hyperplane_lsh_buckets(embeddings, n_planes, seed, id_col, vec_col)
    candidates = embeddings.join(
        buckets.filter(F.col("bucket").isin(list(probes))).select(id_col),
        id_col,
        "left_semi",
    )
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)
