"""KV parity layer: the reference pdict doctest contracts (pdict.py:57-82,
119-129, 271-292) transcribed against both engine backends, plus the
table backend's distributed paths (delta commits, semi-join contains,
merge)."""

import datetime
import time

import pytest

from webscraping_spark.sources.kv import DbmDict, PersistentDictTable


@pytest.fixture
def cache(spark, tmp_path):
    return PersistentDictTable(spark, str(tmp_path / "kv"), flush_every=100)


class TestPersistentDictTable:
    def test_doctest_contract(self, cache):
        """pdict.py:57-82 transcribed."""
        url = "http://google.com/abc"
        html = "<html>abc</html>"
        assert url not in cache
        assert len(cache) == 0
        cache[url] = html
        assert url in cache
        assert len(cache) == 1
        assert cache[url] == html
        assert cache.get(url)["value"] == html
        assert cache.meta(url) == {}
        cache.meta(url, "meta")
        assert cache.meta(url) == "meta"
        del cache[url]
        assert url not in cache

    def test_contract_survives_flush_and_reopen(self, spark, tmp_path):
        root = str(tmp_path / "kv2")
        cache = PersistentDictTable(spark, root, flush_every=100)
        cache["a"] = {"html": "<p>1</p>"}
        cache["b"] = 2
        cache.meta("a", {"status": 200})
        cache.flush()
        reopened = PersistentDictTable(spark, root)
        assert reopened["a"] == {"html": "<p>1</p>"}
        assert reopened["b"] == 2
        assert reopened.meta("a") == {"status": 200}
        assert sorted(reopened) == ["a", "b"]
        # upsert wins over the older committed row
        reopened["a"] = "new"
        reopened.flush()
        third = PersistentDictTable(spark, root)
        assert third["a"] == "new"
        assert len(third) == 2

    def test_delete_tombstones_across_commits(self, spark, tmp_path):
        root = str(tmp_path / "kv3")
        cache = PersistentDictTable(spark, root)
        cache["x"] = 1
        cache.flush()
        del cache["x"]
        cache.flush()
        assert "x" not in PersistentDictTable(spark, root)

    def test_expires_contract(self, cache):
        """pdict.py:119-129: 0-second expiry — contains() empty unless
        ignore_expires; getitem raises 'stale'."""
        cache.expires = datetime.timedelta(seconds=0)
        cache["a"] = 1
        time.sleep(0.01)
        assert cache.contains(["a", "b"]) == []
        assert cache.contains(["a", "b"], ignore_expires=True) == ["a"]
        with pytest.raises(KeyError, match="stale"):
            cache["a"]
        cache.expires = None
        assert cache["a"] == 1

    def test_contains_dataframe_semi_join(self, spark, cache):
        for k in ("k1", "k2", "k3"):
            cache[k] = k
        probe = spark.createDataFrame([("k2",), ("k4",)], "key string")
        assert cache.contains(probe) == ["k2"]

    def test_merge_keep_target_and_override(self, spark, tmp_path):
        a = PersistentDictTable(spark, str(tmp_path / "a"))
        b = PersistentDictTable(spark, str(tmp_path / "b"))
        a["k"] = "target"
        a["only_a"] = 1
        b["k"] = "source"
        b["only_b"] = 2
        a.merge(b)  # keep-target (pdict.py:249-255 default)
        assert a["k"] == "target" and a["only_b"] == 2 and a["only_a"] == 1
        a.merge(b, override=True)
        assert a["k"] == "source"

    def test_clear(self, cache):
        cache["a"] = 1
        cache.flush()
        cache.clear()
        assert "a" not in cache
        assert len(cache) == 0
        cache["b"] = 2
        cache.flush()
        assert "a" not in cache and cache["b"] == 2


class TestDbmDict:
    def test_doctest_contract(self, tmp_path):
        """pdict.py:271-292 transcribed."""
        cache = DbmDict(str(tmp_path / "dbm.db"))
        url = "http://google.com/abc"
        html = "<html>abc</html>"
        assert url not in cache
        cache[url] = html
        assert url in cache
        assert cache[url] == html
        assert cache.meta(url) == {}
        cache.meta(url, "meta")
        assert cache.meta(url) == "meta"
        urls = list(cache)
        assert url in urls
        del cache[url]
        assert url not in cache

    def test_get_default_merge_clear(self, tmp_path):
        a = DbmDict(str(tmp_path / "a.db"))
        b = DbmDict(str(tmp_path / "b.db"))
        assert a.get("missing", "dflt") == "dflt"
        a["k"] = "target"
        b["k"] = "source"
        b["extra"] = [1, 2]
        a.merge(b)
        assert a["k"] == "target" and a["extra"] == [1, 2]
        a.merge(b, override=True)
        assert a["k"] == "source"
        a.clear()
        assert len(a) == 0

    def test_reopen_persistence(self, tmp_path):
        path = str(tmp_path / "p.db")
        DbmDict(path)["k"] = {"nested": True}
        assert DbmDict(path)["k"] == {"nested": True}
