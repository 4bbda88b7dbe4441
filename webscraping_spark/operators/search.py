"""BM25 full-text retrieval over the corpus: inverted-index fit + top-k
query scoring, entirely as DataFrame ops.

Why it belongs in this engine: a training-data pipeline needs corpus
retrieval for quality probes, decontamination triage ("which training
docs match this eval question?") and boilerplate hunting. The reference
library stops at extraction (alg.py, xpath.py); retrieval is the
corpus-side dual of its per-page search helpers.

Design for 100 TB:

- ``bm25_fit`` builds the classic inverted structures as three bounded
  tables — postings ``(term, doc_id, tf)``, per-doc lengths
  ``(doc_id, dl)``, document frequencies ``(term, df)`` — via one
  explode + two map-side-combinable groupBys. Written partitioned (or
  bucketed) by ``term``, the postings table IS the inverted index: a
  query's scan partition-prunes to its |q| terms instead of the corpus.
- ``bm25_topk`` filters postings with a literal ``isin`` over the query
  terms (pushes to the scan), joins the |q|-row df table (broadcast) and
  the doc-length table (the one real shuffle, keyed on doc_id), and
  takes the top k with ``orderBy().limit()`` — TakeOrderedAndProject,
  per-partition heaps + driver merge, never a full sort.

Determinism contract (same device as operators/lm.py): the only libm
call, ``ln`` in the idf, is quantized to 1e-6 fixed point per DISTINCT
term — a handful of values — and every downstream per-posting product /
division is exactly-rounded IEEE arithmetic on identical inputs, so it
is bit-identical across engines when the oracle mirrors the expression
shape. Per-posting contributions are quantized to 1e-6 LONGs BEFORE the
per-doc sum, making the reduction an integer sum: exact and
order-independent under any shuffle or partitioning. Ties at the k
boundary are broken by doc_id, so the returned SET is total-order
deterministic.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webscraping_spark.operators.dedup import tokens_col


class BM25Index(NamedTuple):
    """Fitted index handle: the three inverted-index tables + scalars."""

    postings: DataFrame  # (term, doc_id, tf)
    doc_lens: DataFrame  # (doc_id, dl)
    doc_freq: DataFrame  # (term, df)
    n_docs: int
    total_tokens: int

    @property
    def avgdl(self) -> float:
        # one IEEE double division of two exact integers — identical on
        # every engine, no accumulated float state
        return self.total_tokens / self.n_docs


def _norm_tokens(text_col: str):
    """Lowercased whitespace tokens; empty text -> empty array (the
    corpus-wide convention shared with lm/dedup/textstats)."""
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )


def tokenize_query(query: str) -> list[str]:
    """Driver-side twin of ``_norm_tokens`` for the (tiny) query string:
    distinct terms, sorted for a stable literal plan."""
    return sorted(set(query.strip().lower().split()))


def bm25_fit(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> BM25Index:
    """Build the inverted index. One explode feeds two groupBys (both
    map-side combinable; outputs bounded by postings/vocab, not raw
    text), plus one projection for doc lengths. The two count() actions
    collect two scalars, never rows."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_norm_tokens(text_col)).alias("term")
    )
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    doc_lens = docs.select(
        F.col(id_col).alias("doc_id"), F.size(_norm_tokens(text_col)).alias("dl")
    )
    doc_freq = postings.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    total_tokens = docs.select(
        F.sum(F.size(_norm_tokens(text_col))).alias("s")
    ).collect()[0]["s"]
    return BM25Index(postings, doc_lens, doc_freq, n_docs, int(total_tokens or 0))


def bm25_scores(
    index: BM25Index,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-doc BM25 score for every doc matching >=1 query term:
    ``(doc_id, n_terms_hit, score)``.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   [the Lucene form —
    non-negative for every df, unlike the classic Robertson idf]
    tfw(t, d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    The idf is quantized to a 1e-6 LONG per term (the only libm call);
    each posting's contribution (idf_fixed / 1e6) * tfw is quantized to a
    1e-6 LONG before the per-doc integer sum. ``score`` is the exact
    fixed-point sum / 1e6 rounded to 6 decimals.
    """
    terms = tokenize_query(query)
    spark = index.postings.sparkSession
    if not terms or index.n_docs == 0:
        return spark.createDataFrame(
            [], "doc_id long, n_terms_hit int, score double"
        )
    n = float(index.n_docs)
    avgdl = index.avgdl
    # |q|-row dimension: (term, idf_fixed). Quantizing HERE means the
    # cross-engine ln agreement is needed on |q| values, not per posting.
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    term_idf = (
        index.doc_freq.filter(F.col("term").isin(terms))
        .select("term", F.round(idf * F.lit(1e6), 0).cast("long").alias("idf_fixed"))
    )
    hits = index.postings.filter(F.col("term").isin(terms))
    j = hits.join(F.broadcast(term_idf), "term").join(index.doc_lens, "doc_id")
    tfd = F.col("tf").cast("double")
    tfw = (
        tfd
        * (F.lit(k1) + F.lit(1.0))
        / (
            tfd
            + F.lit(k1)
            * (
                F.lit(1.0)
                - F.lit(b)
                + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl))
            )
        )
    )
    contrib = (F.col("idf_fixed").cast("double") / F.lit(1e6)) * tfw
    fixed = F.round(contrib * F.lit(1e6), 0).cast("long")
    per_doc = j.groupBy("doc_id").agg(
        F.sum(fixed).alias("_s"), F.count("*").alias("n_terms_hit")
    )
    return per_doc.select(
        "doc_id",
        F.col("n_terms_hit").cast("int").alias("n_terms_hit"),
        F.round(F.col("_s").cast("double") / F.lit(1e6), 6).alias("score"),
    )


def bm25_topk(
    index: BM25Index,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs for the query: ``(doc_id, n_terms_hit, score)``,
    score desc, doc_id asc on ties — a total order, so the k-set is
    deterministic. orderBy().limit() compiles to TakeOrderedAndProject
    (per-partition top-k heaps + driver merge), never a corpus sort."""
    scored = bm25_scores(index, query, k1=k1, b=b)
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
