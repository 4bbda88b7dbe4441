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
    """Synchronous HITS (Kleinberg 1999): ``(node, auth_micro, hub_micro,
    auth, hub)`` after ``n_iters`` full auth+hub rounds — the
    hubs-and-authorities complement to PageRank for frontier
    prioritization (a directory page is a great *hub* to crawl even when
    its own authority is low; PageRank cannot tell the two apart).

    Determinism contract (the same fixed-point device as ``pagerank``):
    scores live in integer micro-units summing to ``SCALE`` and every
    round re-normalizes EXACTLY — ``x * SCALE // total`` computed as a
    DECIMAL(38,0) multiply followed by a pmod-floor division, which is
    exact where a naive decimal divide would round half-up and a raw
    int64 multiply would overflow (x * SCALE reaches 1e30 on hub-heavy
    graphs; the within-round sums are also carried in DECIMAL because a
    10^7-out-degree hub pushes them past int64). Integer sums are
    reduction-order-free, so results are bit-identical across
    partitionings and engines at ANY degree distribution — the
    normalization is per-round precisely so raw scores cannot grow with
    (max degree)^iters and overflow, which an end-only normalization
    does on real web graphs.

    Shape: each round is two skinny join+groupBy sums plus two one-row
    totals — the same O(iters)-shuffle pattern as pagerank, with
    per-iteration persists so Catalyst does not re-optimize a deepening
    chain. The quantization loses at most n micro-units of mass per
    round to flooring (measure-zero against SCALE = 1e12 for n < 1e12;
    guarded)."""
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
    if n >= SCALE:
        raise ValueError("graph larger than SCALE micro-units")

    def _renorm(raw: DataFrame, col: str) -> DataFrame:
        """raw (node, col DECIMAL) -> (node, col LONG) with values
        x * SCALE // total, the exact floor (pmod device)."""
        total = raw.agg(F.sum(col).alias("t")).first()["t"]
        # literal via string cast: the total can exceed int64 on hub-heavy
        # graphs, which F.lit(int) cannot represent
        t = F.expr(f"CAST('{int(total)}' AS DECIMAL(38,0))")
        prod = F.col(col).cast("decimal(38,0)") * F.lit(SCALE).cast(
            "decimal(38,0)"
        )
        exact = (prod - F.pmod(prod, t)) / t
        return raw.select("node", exact.cast("long").alias(col))

    hubs = nodes.withColumn("hub_micro", F.lit(SCALE // n).cast("long")).persist()
    auths = None
    for _ in range(n_iters):
        raw_a = nodes.join(
            e.join(hubs, e["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("hub_micro").cast("decimal(38,0)")).alias("s"))
            .withColumnRenamed("dst", "node"),
            "node",
            "left",
        ).select(
            "node",
            F.coalesce(F.col("s"), F.lit(0).cast("decimal(38,0)")).alias(
                "auth_micro"
            ),
        )
        new_auths = _renorm(raw_a, "auth_micro").persist()
        if auths is not None:
            auths.unpersist()
        auths = new_auths
        raw_h = nodes.join(
            e.join(auths, e["dst"] == auths["node"])
            .groupBy("src")
            .agg(F.sum(F.col("auth_micro").cast("decimal(38,0)")).alias("s"))
            .withColumnRenamed("src", "node"),
            "node",
            "left",
        ).select(
            "node",
            F.coalesce(F.col("s"), F.lit(0).cast("decimal(38,0)")).alias(
                "hub_micro"
            ),
        )
        new_hubs = _renorm(raw_h, "hub_micro").persist()
        hubs.unpersist()
        hubs = new_hubs
    return auths.join(hubs, "node").select(
        "node",
        "auth_micro",
        "hub_micro",
        (F.col("auth_micro").cast("double") / F.lit(float(SCALE))).alias("auth"),
        (F.col("hub_micro").cast("double") / F.lit(float(SCALE))).alias("hub"),
    )


def link_graph_stats(
    links: DataFrame, src_col: str = "src_url", dst_col: str = "dst_url"
) -> DataFrame:
    """Per-source-domain link-graph shape from a (src_url, dst_url) edge
    table: ``(domain, n_pages, n_outlinks, n_internal, n_external,
    n_unique_targets, internal_pct)`` — the crawl-frontier health readout
    (a domain emitting 99% internal links is a silo to depth-limit; one
    emitting mostly external links is a directory/hub worth
    prioritizing, the HITS intuition as a cheap aggregate).

    ``internal`` means same registered domain on both ends (the
    get_domain contract shared with politeness/budget keying);
    ``internal_pct`` is integer percent (floor). ONE map-side-combinable
    groupBy on the source domain — the edge table is scanned once and
    never re-shuffled."""
    from webscraping_spark.functions.udfs import get_domain_col

    s, d = F.col(src_col), F.col(dst_col)
    keyed = links.select(
        get_domain_col(s).alias("domain"),
        s.alias("_s"),
        d.alias("_d"),
        (get_domain_col(s) == get_domain_col(d)).alias("_int"),
    )
    agg = keyed.groupBy("domain").agg(
        F.countDistinct("_s").cast("long").alias("n_pages"),
        F.count("*").cast("long").alias("n_outlinks"),
        F.sum(F.col("_int").cast("long")).cast("long").alias("n_internal"),
        F.sum((~F.col("_int")).cast("long")).cast("long").alias("n_external"),
        F.countDistinct("_d").cast("long").alias("n_unique_targets"),
    )
    return agg.select(
        "*",
        F.expr(
            "CAST(100 * n_internal AS BIGINT) div CAST(n_outlinks AS BIGINT)"
        ).alias("internal_pct"),
    )
