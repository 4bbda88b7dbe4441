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
