"""Deterministic per-epoch corpus shuffle (operators/sampling.epoch_shuffle)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators.sampling import epoch_shuffle


def _docs(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _perm(df):
    return [
        r["doc_id"]
        for r in df.orderBy(F.col("shard").asc(), F.col("pos").asc()).collect()
    ]


def test_matches_md5_rederivation(spark):
    out = epoch_shuffle(_docs(spark, 50), "doc_id", epoch=2, n_shards=4)
    got = {(r["doc_id"]): (r["shard"], r["pos"]) for r in out.collect()}
    items = []
    for i in range(50):
        key = hashlib.md5(f"{i}:shuffle:e2".encode()).hexdigest()
        items.append((int(key[:8], 16) % 4, key, i))
    want = {}
    for shard in range(4):
        members = sorted((k, i) for s, k, i in items if s == shard)
        for pos, (_, i) in enumerate(members, start=1):
            want[i] = (shard, pos)
    assert got == want


def test_epochs_permute_but_runs_repeat(spark):
    df = _docs(spark)
    e0 = _perm(epoch_shuffle(df, "doc_id", epoch=0))
    e1 = _perm(epoch_shuffle(df, "doc_id", epoch=1))
    again = _perm(epoch_shuffle(df.repartition(9), "doc_id", epoch=0))
    assert sorted(e0) == sorted(e1) == list(range(200))
    assert e0 != e1  # different epoch, different order
    assert e0 == again  # same epoch: identical under any partitioning


def test_positions_are_dense_per_shard(spark):
    out = epoch_shuffle(_docs(spark), "doc_id", n_shards=8)
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per.collect():
        assert (r["mn"], r["mx"]) == (1, r["n"])


def test_guard(spark):
    with pytest.raises(ValueError):
        epoch_shuffle(_docs(spark), "doc_id", n_shards=0)
