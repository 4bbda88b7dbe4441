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


class TestZorderKey:
    """Morton clustering keys (ordering.zorder_key)."""

    def _z(self, spark, pairs):
        from webscraping_spark.operators.ordering import zorder_key

        df = spark.createDataFrame(pairs, "a long, b long")
        return [
            r["z"]
            for r in df.select(zorder_key(F.col("a"), F.col("b")).alias("z"))
            .collect()
        ]

    @staticmethod
    def _py_morton(a, b):
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    def test_matches_bitwise_rederivation(self, spark):
        import random

        rng = random.Random(7)
        pairs = [(rng.randrange(2**31), rng.randrange(2**31)) for _ in range(64)]
        pairs += [(0, 0), (2**31 - 1, 2**31 - 1), (1, 0), (0, 1)]
        got = self._z(spark, pairs)
        want = [self._py_morton(a, b) for a, b in pairs]
        assert got == want
        assert all(0 <= z < 2**62 for z in got)  # never negative

    def test_locality_orders_quadrants(self, spark):
        # all points of the low-low quadrant sort before any of high-high
        lo = [(a, b) for a in (0, 1, 2) for b in (0, 1, 2)]
        hi = [(a, b) for a in (2**20, 2**20 + 1) for b in (2**20, 2**20 + 1)]
        zs_lo = self._z(spark, lo)
        zs_hi = self._z(spark, hi)
        assert max(zs_lo) < min(zs_hi)
