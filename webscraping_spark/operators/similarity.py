"""Similarity search over embedding columns (ARRAY<FLOAT>).

Baseline: exact brute-force cosine top-k with pure JVM higher-order
functions (zip_with dot product — no Python in the scan). Scale paths:
random-hyperplane LSH bucketing (data-oblivious), IVF probed cells
(data-adaptive coarse quantizer), and PQ/ADC (memory-bounded codes —
the scan never reads the float column); recall for each is tested
against the brute-force baseline.
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: spherical k-means coarse quantizer + probed
# centroid lists — the FAISS-IVF scale path, as DataFrame ops
# ---------------------------------------------------------------------------


def ivf_fit(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer, fitted distributively.

    Init: the ``n_centroids`` corpus vectors with the smallest
    ``xxhash64(id, seed)`` — a deterministic "random" sample (same
    centroids on every run, partitioning and cluster size; ``rand()``
    would refit a different quantizer per run). Each Lloyd iteration is
    ONE mapInPandas pass: a (batch x dim) @ (dim x c) gemm assigns every
    vector to its max-cosine centroid and emits PER-BATCH partial sums
    (centroid, count, sum-vector) — at most ``c`` skinny rows per batch,
    so the driver collect is bounded by partitions x c, never corpus
    size. Means are renormalized to the unit sphere (spherical k-means:
    cosine assignment needs unit centroids). Returns the (c x dim)
    float64 centroid matrix.
    """
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)).asc(), F.col(id_col).asc())
        .limit(n_centroids)
        .collect()
    )
    if not sample:
        raise ValueError("cannot fit IVF on an empty corpus")
    cents = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    out_schema = "centroid int, cnt long, vecsum array<double>"
    for _ in range(n_iters):
        planes = cents.T  # (dim, c)

        def partial(batches, planes=planes):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                assign = np.argmax((mat / norms) @ planes, axis=1)
                rows = []
                for c in np.unique(assign):
                    sel = mat[assign == c]
                    rows.append((int(c), len(sel), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(rows, columns=["centroid", "cnt", "vecsum"])

        partials = (
            embeddings.select(vec_col).mapInPandas(partial, out_schema).collect()
        )
        new = np.zeros_like(cents)
        counts = np.zeros(len(cents))
        for r in partials:
            new[r["centroid"]] += np.asarray(r["vecsum"], dtype=np.float64)
            counts[r["centroid"]] += r["cnt"]
        nonempty = counts > 0
        new[nonempty] /= counts[nonempty, None]
        new[~nonempty] = cents[~nonempty]  # empty cluster keeps its centroid
        norms = np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cents = new / norms
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid): each vector's max-cosine coarse cell — one gemm
    scan. At rest, write the corpus partitioned by ``centroid`` so a
    query's nprobe cells prune to nprobe partitions (the IVF inverted
    lists), instead of scanning the corpus."""
    planes = centroids.T
    out_schema = f"{id_col} long, centroid int"

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "centroid": np.argmax((mat / norms) @ planes, axis=1).astype(
                        np.int32
                    ),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(assign, out_schema)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank the query against the centroid table
    (driver-side — c rows), probe the ``nprobe`` nearest cells, exact
    cosine inside the probed candidate set only. Complements the LSH
    variant (``ann_topk``): IVF adapts its cells to the data distribution
    where hyperplane buckets are data-oblivious."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[: max(nprobe, 1)].tolist()
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    candidates = embeddings.join(
        assigned.filter(F.col("centroid").isin(probes)).select(id_col),
        id_col,
        "left_semi",
    )
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN: per-subspace k-means codebooks + ADC scan
# — the FAISS-PQ memory path. At 10^10 vectors a float corpus is ~2.5 PB;
# m 1-byte codes per vector (m=8: 8 bytes, 320x smaller than 64 floats)
# keep the scanned table small enough that the ADC pass is IO-trivial,
# and the scan itself is pure whole-stage codegen over a constant-folded
# lookup table — zero Python, zero shuffle, TakeOrderedAndProject top-k.
# ---------------------------------------------------------------------------


def pq_fit(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    n_iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace k-means codebooks (Jegou et al. 2011): the dim-d space
    splits into ``m`` contiguous subspaces of d/m dims; each gets its own
    ``n_codes``-centroid L2 k-means (classic PQ quantizes raw L2 geometry
    — unlike the spherical coarse quantizer in ``ivf_fit``). Returns the
    ``(m, n_codes, d//m)`` float64 codebook tensor.

    Deterministic init as in ``ivf_fit``: the ``n_codes`` corpus vectors
    with the smallest ``xxhash64(id, seed)``, sliced per subspace — same
    codebooks on every run and partitioning. Each Lloyd iteration is ONE
    mapInPandas pass over the corpus: m small gemms assign every vector's
    m sub-slices, and each Arrow batch emits at most ``m * n_codes``
    skinny partial rows (subspace, code, count, sum) — the driver collect
    is bounded by partitions x m x n_codes, never corpus size. Empty
    codes keep their previous centroid."""
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)).asc(), F.col(id_col).asc())
        .limit(n_codes)
        .collect()
    )
    if not sample:
        raise ValueError("cannot fit PQ on an empty corpus")
    mat0 = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    d = mat0.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    if len(mat0) < n_codes:
        raise ValueError(f"corpus smaller than n_codes={n_codes}")
    books = np.stack([mat0[:, j * dsub : (j + 1) * dsub] for j in range(m)])

    out_schema = "subspace int, code int, cnt long, vecsum array<double>"
    for _ in range(n_iters):
        books_b = books.copy()

        def partial(batches, books_b=books_b):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                rows = []
                for j in range(m):
                    sub = mat[:, j * dsub : (j + 1) * dsub]
                    # argmin ||x - c||^2 = argmax (x.c - ||c||^2/2)
                    score = sub @ books_b[j].T - 0.5 * (books_b[j] ** 2).sum(axis=1)
                    assign = np.argmax(score, axis=1)
                    for c in np.unique(assign):
                        sel = sub[assign == c]
                        rows.append((j, int(c), len(sel), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(
                    rows, columns=["subspace", "code", "cnt", "vecsum"]
                )

        partials = (
            embeddings.select(vec_col).mapInPandas(partial, out_schema).collect()
        )
        new = np.zeros_like(books)
        counts = np.zeros((m, n_codes))
        for r in partials:
            new[r["subspace"], r["code"]] += np.asarray(r["vecsum"], dtype=np.float64)
            counts[r["subspace"], r["code"]] += r["cnt"]
        nonempty = counts > 0
        new[nonempty] /= counts[nonempty][:, None]
        new[~nonempty] = books[~nonempty]
        books = new
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes ARRAY<INT>): each vector's per-subspace nearest-centroid
    codes — one gemm scan per Arrow batch. This is the encode-once-at-rest
    step: persist the result partitioned however the corpus is and the
    ADC scan below never touches the float column again."""
    mcount, n_codes, dsub = codebooks.shape
    out_schema = f"{id_col} long, codes array<int>"

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(mat), mcount), dtype=np.int32)
            for j in range(mcount):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                score = sub @ codebooks[j].T - 0.5 * (codebooks[j] ** 2).sum(axis=1)
                codes[:, j] = np.argmax(score, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(encode, out_schema)


def pq_adc_topk(
    codes: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric-distance top-k over the CODES table only: the query's
    (m x n_codes) squared-L2 lookup table is computed driver-side and
    embedded as a constant-folded literal array, the per-row distance is
    one ``aggregate`` over the m codes (pure whole-stage codegen — the
    float corpus is never read), and the ascending top-k compiles to
    TakeOrderedAndProject. Returns (id, adc_dist)."""
    mcount, n_codes, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != mcount * dsub:
        raise ValueError("query dim does not match codebooks")
    lut = np.stack(
        [
            ((codebooks[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
            for j in range(mcount)
        ]
    )
    lut_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in lut]
    )
    c = F.col(codes_col)
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(mcount - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.element_at(lut_lit, j + 1), F.element_at(c, j + 1) + 1),
    )
    return (
        codes.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ANN end to end: encode -> ADC top-k, optionally re-ranked. With
    ``refine`` > 0 the ADC pass shortlists ``refine`` candidates and the
    final k are EXACT-cosine re-ranked over just those rows (the standard
    two-stage: the cheap code scan does the winnowing, the float read is
    bounded by ``refine``). ADC ranks by L2 — for cosine semantics feed
    unit-normalized vectors or use the refine stage, whose output ranking
    is exact cosine regardless."""
    enc = pq_encode(embeddings, codebooks, id_col, vec_col)
    if refine <= 0:
        return pq_adc_topk(enc, query_vec, codebooks, k, id_col)
    short = pq_adc_topk(enc, query_vec, codebooks, max(refine, k), id_col)
    cands = embeddings.join(short.select(id_col), id_col, "left_semi")
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-IVFPQ composed from the two quantizers above: the coarse
    IVF quantizer routes the query to ``nprobe`` max-cosine cells
    (driver-side over c centroid rows), the PQ/ADC scan ranks ONLY the
    rows assigned to those cells, and ``refine`` > 0 exact-cosine
    re-ranks the shortlist. This is the 10^10-vector operating point:
    at rest the corpus is stored partitioned by ``centroid`` with only
    (id, centroid, codes) columns — the probe prunes to nprobe
    partitions AND the scan inside them reads m bytes per vector, so
    a query touches (nprobe / c) of the corpus at (m / 4d) of its
    width; floats are read only for the ``refine`` rows.

    For residual-PQ parity with FAISS, fit ``codebooks`` on residuals
    (vector minus its centroid) and encode likewise; this composition is
    agnostic — it routes, prunes and ranks whatever the codebooks encode."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[: max(nprobe, 1)].tolist()
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    in_cells = embeddings.join(
        assigned.filter(F.col("centroid").isin(probes)).select(id_col),
        id_col,
        "left_semi",
    )
    enc = pq_encode(in_cells, codebooks, id_col, vec_col)
    if refine <= 0:
        return pq_adc_topk(enc, query_vec, codebooks, k, id_col)
    short = pq_adc_topk(enc, query_vec, codebooks, max(refine, k), id_col)
    cands = in_cells.join(short.select(id_col), id_col, "left_semi")
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def ivf_residuals(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid, residual ARRAY<DOUBLE>): each vector's coarse cell
    and its residual against that cell's centroid — the quantity FAISS's
    IVFPQ actually product-quantizes (residuals are centered near zero,
    so the same code budget spends its precision on the part of the
    vector the coarse quantizer could not explain). One gemm + subtract
    per Arrow batch; feed the ``residual`` column to ``pq_fit`` /
    ``pq_encode`` (rename it to the vec col) for residual codebooks."""
    planes = centroids.T
    out_schema = f"{id_col} long, centroid int, residual array<double>"

    def res(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            assign = np.argmax((mat / norms) @ planes, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "centroid": assign.astype(np.int32),
                    "residual": list(mat - centroids[assign]),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(res, out_schema)


def ivfpq_residual_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-parity residual IVFPQ: rows are encoded as PQ codes of their
    residual (vector minus its cell centroid; fit ``codebooks`` with
    ``pq_fit`` over ``ivf_residuals``), so the query's ADC lookup table
    differs PER PROBED CELL — the query residual against cell c is
    ``q - centroid_c``. The scan is a union of ``nprobe`` codes-only ADC
    scans, each with its own constant-folded LUT and each prunable to its
    cell's partition at rest; ``refine`` > 0 exact-cosine re-ranks the
    merged shortlist. Driver-side work is nprobe LUTs over the (c x m x
    n_codes) codebook tensor — never corpus-sized."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[: max(nprobe, 1)].tolist()
    res = ivf_residuals(embeddings, centroids, id_col, vec_col)
    shortlists = []
    for c in probes:
        cell = res.filter(F.col("centroid") == int(c)).withColumnRenamed(
            "residual", "_rv"
        )
        enc = pq_encode(cell, codebooks, id_col, "_rv")
        q_res = (q - centroids[c]).tolist()
        shortlists.append(
            pq_adc_topk(enc, q_res, codebooks, max(refine, k), id_col)
        )
    merged = shortlists[0]
    for s in shortlists[1:]:
        merged = merged.unionByName(s)
    merged = merged.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(
        max(refine, k)
    )
    if refine <= 0:
        return merged.limit(k)
    cands = embeddings.join(merged.select(id_col), id_col, "left_semi")
    return cosine_topk(cands, query_vec, k, id_col, vec_col)
