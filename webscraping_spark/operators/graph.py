"""Link-graph analytics for frontier prioritization: distributed PageRank
and HITS (both integer-fixed-point, bit-exact across partitionings).

A crawler's best-first ordering wants a global link-importance signal;
PageRank over the (src, dst) link table is the canonical one (Page et al.
1999). Each iteration is one join (ranks x edges on src, skewed hubs
handled by AQE) + one map-side-combinable groupBy on dst + one scalar
aggregate for the dangling mass — O(iters) shuffles, no driver-side graph.

Determinism contract (the reason this is hash-oracle-able): ranks live in
64-bit integer MICRO-units (1e-12 of probability mass) and every update
is integer arithmetic — ``floor(85 * r / (100 * out_deg))`` per edge,
``floor(85 * D / (100 * N))`` dangling share, ``floor(15 * 1e12 / (100 *
N))`` teleport base. Integer sums are reduction-order-free, so the result
is bit-identical across partitionings, engines and cluster sizes; a
float PageRank drifts in the last ulp per run. The quantization loses at
most 1e-12 mass per edge per iteration — measure-zero against PageRank's
own iteration error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1e12 micro-units of probability mass


def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank_micro, rank) after ``n_iters`` synchronous iterations.

    ``damping_pct`` is the damping factor in integer percent (85 = the
    canonical 0.85) — integer so the fixed-point contract holds. Nodes
    are everything appearing as src or dst; dangling nodes (no out-edges)
    redistribute their mass uniformly. Each iteration's rank table is
    persisted: it is node-table-sized (skinny), and without it Catalyst
    re-optimizes a join chain that deepens per iteration.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge set")
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    base = (100 - damping_pct) * SCALE // (100 * n)

    # cast("long") matters: at large n the init literal fits int32, and
    # ANSI then overflows `damping * rank_micro` in 32-bit constant folding
    ranks = nodes.withColumn(
        "rank_micro", F.lit(SCALE // n).cast("long")
    ).persist()
    for _ in range(n_iters):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank_micro", "out_deg")
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank_micro"), F.lit(0)).alias("d"))
            .first()["d"]
        )
        dangling_share = damping_pct * int(dangling) // (100 * n)
        contribs = (
            with_deg.filter(F.col("out_deg").isNotNull())
            .join(e, with_deg["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                # `div` is Spark's INTEGRAL division — `/` would detour
                # through double and can mis-floor exact quotients; the
                # oracle's `//` must see the same integer arithmetic
                F.expr(
                    f"(CAST({damping_pct} AS BIGINT) * rank_micro)"
                    " div (CAST(100 AS BIGINT) * out_deg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        new_ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.coalesce(F.col("in_mass"), F.lit(0))
                + F.lit(base)
                + F.lit(dangling_share)
            ).alias("rank_micro"),
        ).persist()
        ranks.unpersist()
        ranks = new_ranks
    return ranks.select(
        "node",
        "rank_micro",
        (F.col("rank_micro").cast("double") / F.lit(float(SCALE))).alias("rank"),
    )


def hits(
    edges: DataFrame,
    n_iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous HITS (Kleinberg 1999): ``(node, auth_raw, hub_raw,
    auth, hub)`` after ``n_iters`` full auth+hub rounds — the
    hubs-and-authorities complement to PageRank for frontier
    prioritization (a directory page is a great *hub* to crawl even when
    its own authority is low; PageRank cannot tell the two apart).

    Determinism contract: hubs init to integer 1; each round is
    ``auth = sum of in-neighbor hubs`` then ``hub = sum of out-neighbor
    auths`` in pure int64 — integer sums are reduction-order-free, so the
    raw scores are bit-identical across partitionings and engines, and
    the driver oracle unrolls the same recurrence in SQL. Normalization
    happens ONCE at the end (HITS rankings are scale-invariant, so
    in-loop normalization is a numerical convenience, not semantics):
    ``auth = auth_raw / sum(auth_raw)`` in IEEE double.

    Because the loop never rescales, raw scores grow like
    (max_in_degree x max_out_degree)^iters; the operator computes that
    bound up front (two degree aggregates) and raises rather than
    silently overflowing int64 — at web scale run fewer iterations or
    PageRank (which renormalizes by construction). Each iteration is two
    skinny join+groupBy rounds, the same O(iters)-shuffle shape as
    pagerank, with per-iteration persists so Catalyst does not re-optimize
    a deepening chain."""
    import math

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge set")
    degs = e.groupBy("src").agg(F.count("*").alias("d")).agg(
        F.max("d").alias("mo")
    ).first()
    degs_in = e.groupBy("dst").agg(F.count("*").alias("d")).agg(
        F.max("d").alias("mi")
    ).first()
    max_out, max_in = int(degs["mo"]), int(degs_in["mi"])
    if n_iters * (math.log2(max(max_in, 1)) + math.log2(max(max_out, 1))) > 62:
        raise ValueError(
            f"raw HITS scores would overflow int64 after {n_iters} rounds "
            f"(max in-degree {max_in}, out-degree {max_out}); lower n_iters "
            "or use pagerank()"
        )

    hubs = nodes.withColumn("hub_raw", F.lit(1).cast("long")).persist()
    auths = None
    for _ in range(n_iters):
        new_auths = (
            nodes.join(
                e.join(hubs, e["src"] == hubs["node"])
                .groupBy("dst")
                .agg(F.sum("hub_raw").alias("s"))
                .withColumnRenamed("dst", "node"),
                "node",
                "left",
            )
            .select("node", F.coalesce(F.col("s"), F.lit(0)).alias("auth_raw"))
            .persist()
        )
        if auths is not None:
            auths.unpersist()
        auths = new_auths
        new_hubs = (
            nodes.join(
                e.join(auths, e["dst"] == auths["node"])
                .groupBy("src")
                .agg(F.sum("auth_raw").alias("s"))
                .withColumnRenamed("src", "node"),
                "node",
                "left",
            )
            .select("node", F.coalesce(F.col("s"), F.lit(0)).alias("hub_raw"))
            .persist()
        )
        hubs.unpersist()
        hubs = new_hubs
    totals = auths.join(hubs, "node").agg(
        F.sum("auth_raw").alias("ta"), F.sum("hub_raw").alias("th")
    ).first()
    ta, th = max(int(totals["ta"]), 1), max(int(totals["th"]), 1)
    return (
        auths.join(hubs, "node")
        .select(
            "node",
            "auth_raw",
            "hub_raw",
            (F.col("auth_raw").cast("double") / F.lit(float(ta))).alias("auth"),
            (F.col("hub_raw").cast("double") / F.lit(float(th))).alias("hub"),
        )
    )
