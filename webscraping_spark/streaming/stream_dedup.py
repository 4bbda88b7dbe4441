"""Streaming dedup for the training-data pipeline: the batch family's
exact/near dedup applied to an unbounded document stream.

The batch engine dedups a corpus it can see end-to-end; an ingest pipeline
sees documents as they arrive and must drop repeats ONLINE with bounded
state. Spark-native mapping:

  - exact dedup     -> ``dropDuplicatesWithinWatermark`` on the content
                       hash: state holds one entry per distinct hash inside
                       the watermark horizon and is evicted past it —
                       bounded by ingest-rate x horizon, not corpus size.
  - near-dup        -> the same MinHash/SimHash signature projections as
                       the batch path (pure column expressions, so they run
                       unchanged on a streaming DataFrame); banding keys
                       feed the stateful dedup per band.

Nothing here forks the batch semantics: the content-hash and signature
columns are the batch operators' own expressions, so a doc admitted by the
stream and re-checked by a batch backfill computes the identical keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash_col(text_col: str = "text"):
    """The exact-dedup key, shared with dedup.exact_dedup (md5 of text)."""
    return F.md5(F.col(text_col))


def streaming_exact_dedup(
    stream: DataFrame,
    watermark_delay: str = "10 minutes",
    ts_col: str = "event_time",
    text_col: str = "text",
) -> DataFrame:
    """Admit the first arrival of each distinct text within the watermark
    horizon; drop later duplicates. State is one (hash) entry per distinct
    doc inside the horizon — evicted as the watermark advances, so a
    10-minute horizon at 10^6 docs/min holds ~10^7 entries per partition
    group regardless of total corpus size. Exactly the semantics of the
    batch ``exact_dedup`` restricted to a sliding ingest window; repeats
    farther apart than the horizon are admitted twice by design (the batch
    backfill catches them — the standard lambda split).
    """
    return stream.withColumn("_h", content_hash_col(text_col)).withWatermark(
        ts_col, watermark_delay
    ).dropDuplicatesWithinWatermark(["_h"]).drop("_h")


def streaming_near_dup_candidates(
    stream: DataFrame,
    n_hashes: int = 64,
    n_bands: int = 16,
    watermark_delay: str = "10 minutes",
    ts_col: str = "event_time",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming MinHash-LSH admission: a doc is admitted iff NONE of its
    LSH band keys has been seen within the watermark horizon (a near-dup of
    an admitted doc shares >= 1 band with high probability and is dropped).
    One row per (doc, band) feeds the stateful per-band dedup; the doc
    survives iff all its bands survive — counted per doc id downstream.
    Returns (id, ts, band, band_key) admissions; group on the id and
    compare ``count == n_bands`` to admit. Signatures reuse the batch
    minhash projection — identical keys stream-side and batch-side.
    """
    from webscraping_spark.operators.dedup import minhash_signature_col

    sig = minhash_signature_col(text_col, n_hashes=n_hashes)
    rows_per_band = n_hashes // n_bands
    banded = stream.select(
        F.col(id_col),
        F.col(ts_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(sig, b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "band_key"),
    )
    return banded.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["band", "band_key"]
    )
