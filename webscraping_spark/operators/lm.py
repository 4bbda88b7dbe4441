"""Corpus language-model perplexity scoring (the CCNet quality signal,
Wenzek et al. 2020): fit an n-gram LM on an in-domain corpus, score every
candidate doc by perplexity under it — low perplexity = target-like text.

CCNet uses a 5-gram KenLM; the engine-level stand-in is an add-alpha
bigram LM, which keeps the whole pipeline inside DataFrame ops (counts,
joins, one aggregate) and is independently re-derivable by an oracle. The
column contract (fit tables in, per-doc ``ppl`` out) is what a KenLM UDF
would also satisfy.

Determinism contract: per-position log probabilities are quantized to
1e-6 (``round(logp * 1e6)`` as LONG) BEFORE the per-doc sum, so the sum
is an integer sum — exact and order-independent under any shuffle or
partitioning, and bit-identical across engines (a float sum's last ulp
would depend on reduction order). Perplexity is then
``exp(-sum / 1e6 / n)`` rounded to 6 decimals.

Plan shapes at 100 TB: fitting is two explode + map-side-combinable
groupBys (vocab-bounded outputs). Scoring explodes bigram positions, joins
the bigram and unigram count tables on their token keys (sort-merge; the
unigram side usually broadcasts under AQE), and re-aggregates per doc —
the same O(positions) shuffle family as substring dedup. For petabyte
vocabularies, key the join on ``xxhash64(w1, w2)`` longs instead of
strings; the string keys here keep the oracle exact.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BigramLM(NamedTuple):
    """Fitted LM handle: unigram/bigram count tables + smoothing params."""

    unigrams: DataFrame  # (w1, c1)
    bigrams: DataFrame  # (w1, w2, c12)
    vocab_size: int  # distinct train unigrams (smoothing denominator V)
    alpha: float


def _tokens(text_col: str) -> Column:
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )


def _bigram_pairs(text_col: str) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs (duplicates kept —
    every occurrence is scored/counted)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    heads = F.slice(toks, 1, F.greatest(n - 1, F.lit(0)))
    tails = F.slice(toks, 2, F.greatest(n - 1, F.lit(0)))
    return F.zip_with(
        heads, tails, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )


def fit_bigram_lm(
    docs: DataFrame,
    alpha: float = 1.0,
    text_col: str = "text",
) -> BigramLM:
    """Count unigrams and bigrams over the training corpus. Two explode +
    groupBy passes, both map-side combinable; outputs are vocab-bounded.
    ``vocab_size`` (one bounded scalar) is the add-alpha denominator V."""
    toks = docs.select(F.explode(_tokens(text_col)).alias("w1"))
    unigrams = toks.groupBy("w1").agg(F.count("*").alias("c1"))
    pairs = docs.select(F.explode(_bigram_pairs(text_col)).alias("p")).select(
        "p.w1", "p.w2"
    )
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    vocab_size = unigrams.count()
    return BigramLM(unigrams, bigrams, vocab_size, alpha)


def perplexity(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc perplexity under the fitted LM: (id, n_bigrams, ppl).

    P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V); unseen tokens
    and pairs take the smoothed floor through the left joins' null counts.
    Docs with fewer than two tokens have no bigrams: n_bigrams = 0 and
    ppl is NULL (no event to score — the CCNet convention is to filter
    such docs upstream).
    """
    pairs = docs.select(
        F.col(id_col), F.explode(_bigram_pairs(text_col)).alias("p")
    ).select(id_col, "p.w1", "p.w2")
    j = pairs.join(lm.bigrams, ["w1", "w2"], "left").join(
        lm.unigrams, ["w1"], "left"
    )
    logp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(lm.alpha))
        / (
            F.coalesce(F.col("c1"), F.lit(0))
            + F.lit(lm.alpha) * F.lit(float(lm.vocab_size))
        )
    )
    fixed = F.round(logp * F.lit(1e6), 0).cast("long")
    per_doc = j.groupBy(id_col).agg(
        F.sum(fixed).alias("_lp_fixed"), F.count("*").alias("_n")
    )
    scored = docs.select(id_col).join(per_doc, id_col, "left")
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("int")
    ppl = F.when(
        n > 0,
        F.round(
            F.exp(-(F.col("_lp_fixed").cast("double") / 1e6) / n.cast("double")),
            6,
        ),
    )
    return scored.select(
        F.col(id_col),
        n.alias("n_bigrams"),
        ppl.alias("ppl"),
    )


def ccnet_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    ppl_col: str = "ppl",
    sample_mod: int = 1,
    salt: str = "ccnet",
) -> DataFrame:
    """CCNet's signature head/middle/tail partition (Wenzek et al. 2020
    §4.3): the corpus splits into perplexity tertiles — 'head' is the
    cleanest third under the LM, 'tail' the noisiest; training recipes
    then sample buckets at different rates.

    Deterministic contract: the two cutoffs are the exact k-th order
    statistics (k = n//3 and 2n//3) of the (ppl, id) total order over
    the cutoff population; a row's bucket is head if its (ppl, id) key
    is <= the first cutoff, middle if <= the second, else tail — ties
    cannot exist (id is unique), so this equals rank tertiles exactly.
    NULL-ppl rows (under-2-token docs) get a NULL bucket.

    Scale shape: the ASSIGNMENT is one broadcast of two scalar cutoffs
    (zero corpus shuffle). The CUTOFF computation is n//3-deep top-k;
    at corpus scale set ``sample_mod`` > 1 to compute cutoffs on the
    deterministic md5-contract subsample (id-keyed, engine-reproducible
    — the same estimate-quantiles-on-a-sample move CCNet itself makes),
    which bounds the top-k working set to n/sample_mod."""
    from webscraping_spark.operators.sampling import _hash_bucket

    valid = scored.filter(F.col(ppl_col).isNotNull())
    pop = valid
    if sample_mod > 1:
        pop = valid.filter(_hash_bucket(F.col(id_col), salt) % sample_mod == 0)
    n = pop.count()
    k1, k2 = n // 3, (2 * n) // 3

    def kth(k: int):
        if k <= 0:
            return None
        return (
            pop.orderBy(ppl_col, id_col)
            .limit(k)
            .agg(
                F.max(
                    F.struct(F.col(ppl_col).alias("p"), F.col(id_col).alias("i"))
                ).alias("c")
            )
            .collect()[0]["c"]
        )

    c1, c2 = kth(k1), kth(k2)
    key = F.struct(F.col(ppl_col).alias("p"), F.col(id_col).alias("i"))

    def lit_cut(c):
        return F.struct(F.lit(c["p"]).alias("p"), F.lit(c["i"]).alias("i"))

    bucket = F.when(F.col(ppl_col).isNull(), F.lit(None).cast("string"))
    if c1 is not None:
        bucket = bucket.when(key <= lit_cut(c1), F.lit("head"))
    if c2 is not None:
        bucket = bucket.when(key <= lit_cut(c2), F.lit("middle"))
    bucket = bucket.otherwise(F.lit("tail"))
    return scored.withColumn("bucket", bucket)
