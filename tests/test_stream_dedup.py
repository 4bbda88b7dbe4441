"""Streaming dedup (streaming/stream_dedup.py): exact + MinHash-LSH
admission over an unbounded stream with watermark-bounded state."""

import json
import os

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators import dedup
from webscraping_spark.streaming import stream_dedup


def _stream_docs(spark, tmp_path, rows):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    with open(os.path.join(src, "docs.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return (
        spark.readStream.schema("doc_id long, event_time timestamp, text string")
        .json(src)
    )


def _run(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


ROWS = [
    {"doc_id": 0, "event_time": "2026-01-01 00:00:00", "text": "alpha beta gamma delta"},
    {"doc_id": 1, "event_time": "2026-01-01 00:00:10", "text": "alpha beta gamma delta"},  # exact dup
    {"doc_id": 2, "event_time": "2026-01-01 00:00:20", "text": "totally different words here"},
    {"doc_id": 3, "event_time": "2026-01-01 00:00:30", "text": "alpha beta gamma delta"},  # dup again
]


class TestStreamingExactDedup:
    def test_first_arrival_wins_within_watermark(self, spark, tmp_path):
        stream = _stream_docs(spark, tmp_path, ROWS)
        out = stream_dedup.streaming_exact_dedup(stream, "10 minutes")
        tbl = _run(out, tmp_path, "exact_dedup_stream")
        got = spark.sql(f"SELECT text FROM {tbl}").collect()
        texts = sorted(r["text"] for r in got)
        assert texts == sorted(
            {"alpha beta gamma delta", "totally different words here"}
        )


class TestStreamingNearDupCandidates:
    def test_duplicate_doc_shares_every_band(self, spark, tmp_path):
        stream = _stream_docs(spark, tmp_path, ROWS)
        out = stream_dedup.streaming_near_dup_candidates(
            stream, n_hashes=16, n_bands=4
        )
        tbl = _run(out, tmp_path, "near_dup_stream")
        per_doc = {
            r["doc_id"]: r["n"]
            for r in spark.sql(
                f"SELECT doc_id, count(*) AS n FROM {tbl} GROUP BY doc_id"
            ).collect()
        }
        # one full-band admission among the three identical docs, the
        # distinct doc admits all its bands; the other copies admit none
        full = [d for d, n in per_doc.items() if n == 4]
        assert 2 in full and len(full) == 2
        assert all(d in (0, 1, 3) for d in full if d != 2)
        assert sum(per_doc.values()) == 8  # no partial leakage

    def test_row_local_signature_matches_batch_aggregate(self, spark):
        docs = spark.createDataFrame(
            [(i, f"w{i} x{i} y{i} z{i} common tail words {i % 3}") for i in range(40)]
            + [(100, ""), (101, "one two")],
            "doc_id long, text string",
        )
        batch = dedup.minhash_signatures(docs, n_hashes=16).withColumnRenamed(
            "sig", "sig_batch"
        )
        row_local = docs.select(
            F.col("doc_id").alias("id"),
            dedup.minhash_signature_col("text", n_hashes=16).alias("sig_row"),
        )
        joined = batch.join(row_local, "id")
        bad = joined.filter(F.col("sig_batch") != F.col("sig_row")).count()
        assert bad == 0
        assert joined.count() == 42
