"""Frontier queue semantics — transcribed from the Queue doctest
(pdict.py:406-420) plus the deque ordering contract (download.py:811)."""

from pyspark.sql import functions as F

from webscraping_spark.operators import frontier as FR


def make_candidates(spark, rows):
    """rows: list of (url, priority[, depth])"""
    data = [
        (url, pri, (rest[0] if rest else 0))
        for url, pri, *rest in rows
    ]
    df = spark.createDataFrame(data, "url string, priority int, depth int")
    return (
        df.withColumn("url_hash", F.xxhash64("url"))
        .withColumn("domain", F.lit("example.com"))
        .select("url", "url_hash", "domain", "depth", "priority")
    )


class TestQueueDoctestParity:
    """pdict.py:406-420: push 3, re-push dupes (len stays 3), clear one,
    pull(limit=1) returns 'b' (the priority-2 item)."""

    def test_lifecycle(self, spark):
        fr = FR.Frontier.empty(spark)
        keys = [("a", 1), ("b", 2), ("c", 1)]
        fr = fr.push(make_candidates(spark, keys))
        assert fr.queued_count() == 3
        fr = fr.push(make_candidates(spark, keys))  # duplicates ignored
        assert fr.queued_count() == 3
        removed = make_candidates(spark, [("a", 1)])
        fr = fr.clear(removed)
        assert fr.queued_count() == 2
        batch, fr = fr.pull(limit=1, mode=FR.ORDER_PRIORITY)
        assert [r["url"] for r in batch.collect()] == ["b"]
        assert fr.queued_count() == 1
        fr = fr.clear()
        assert fr.queued_count() == 0

    def test_pull_marks_status(self, spark):
        fr = FR.Frontier.empty(spark).push(
            make_candidates(spark, [("a", 1), ("b", 2), ("c", 3)])
        )
        batch1, fr = fr.pull(limit=2)
        batch2, fr = fr.pull(limit=2)
        assert {r["url"] for r in batch1.collect()} == {"c", "b"}
        assert {r["url"] for r in batch2.collect()} == {"a"}
        # distinct pull counters (pdict.py:468: unique status per pull)
        s1 = {r["status"] for r in batch1.collect()}
        s2 = {r["status"] for r in batch2.collect()}
        assert s1 == {1} and s2 == {2}


class TestOrderingContract:
    def test_bfs_fifo(self, spark):
        fr = FR.Frontier.empty(spark)
        fr = fr.push(make_candidates(spark, [("seed", 0, 0)]))
        fr = fr.push(make_candidates(spark, [("x", 0, 1), ("y", 0, 1)]))
        batch, fr = fr.pull(limit=10, mode=FR.ORDER_BFS)
        urls = [r["url"] for r in batch.orderBy("depth", "seq").collect()]
        assert urls == ["seed", "x", "y"]

    def test_dfs_lifo(self, spark):
        fr = FR.Frontier.empty(spark)
        fr = fr.push(make_candidates(spark, [("seed", 0, 0)]))
        fr = fr.push(make_candidates(spark, [("x", 0, 1), ("y", 0, 1)]))
        batch, _ = fr.pull(limit=1, mode=FR.ORDER_DFS)
        # LIFO: deepest, most recently discovered first (download.py:811 pop())
        assert [r["url"] for r in batch.collect()] == ["y"]

    def test_seq_contiguous_across_pushes(self, spark):
        fr = FR.Frontier.empty(spark)
        fr = fr.push(make_candidates(spark, [("a", 0), ("b", 0)]))
        fr = fr.push(make_candidates(spark, [("b", 0), ("c", 0), ("d", 0)]))
        rows = {r["url"]: r["seq"] for r in fr.df.collect()}
        assert sorted(rows.values()) == [0, 1, 2, 3]
        assert rows["a"] < rows["b"] < rows["c"] < rows["d"]

    def test_within_batch_dedup_keeps_first(self, spark):
        fr = FR.Frontier.empty(spark)
        cands = make_candidates(spark, [("a", 1, 0), ("a", 9, 1)])
        fr = fr.push(cands)
        row = fr.df.first()
        assert fr.df.count() == 1
        assert row["priority"] == 1 and row["depth"] == 0  # first occurrence won
