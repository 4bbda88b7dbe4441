"""Iceberg-style snapshot layer over parquet — atomic manifest commits with
per-partition lineage and metrics.

No Iceberg jars exist in this container (SURVEY.md §7.0), so the engine
ships a thin, format-compatible-in-spirit table layer: each commit writes
parquet files under ``data/<table>/snap-<N>/`` and then atomically renames
a manifest JSON into place — the same tmp-file + rename crash-consistency
trick the reference uses for its state file (State.save,
download.py:931-945). The manifest records lineage (superstep, parent
snapshot, input description), per-file row counts, and arbitrary metrics,
which is what makes the crawl resumable from any superstep
(``CrawlJob.resume``). When real Iceberg jars are on the classpath the
same interface maps onto ``MERGE INTO``/snapshot reads; the engine only
ever appends whole snapshots, so the swap is mechanical.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _parquet_rows(path: str) -> int | None:
    """Row count from the parquet footer (local metadata read; None if
    unreadable — the manifest stays writable even for exotic files)."""
    try:
        import pyarrow.parquet as pq

        return int(pq.ParquetFile(path).metadata.num_rows)
    except Exception:
        return None


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.root = root
        self.name = name
        self.table_dir = os.path.join(root, "data", name)
        self.meta_dir = os.path.join(root, "meta", name)
        os.makedirs(self.table_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- manifest helpers ----------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"manifest-{version:06d}.json")

    def current_version(self) -> int:
        versions = [
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(self.meta_dir)
            if f.startswith("manifest-") and f.endswith(".json")
        ]
        return max(versions, default=-1)

    def read_manifest(self, version: int | None = None) -> dict | None:
        v = self.current_version() if version is None else version
        if v < 0:
            return None
        with open(self._manifest_path(v)) as fh:
            return json.load(fh)

    # -- commit / load ---------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        superstep: int,
        lineage: dict[str, Any] | None = None,
        metrics: dict[str, Any] | None = None,
        mode: str = "full",
        partition_by: str | None = None,
    ) -> int:
        """Write ``df`` as the next snapshot; atomic manifest rename.

        ``mode='full'`` snapshots the complete table state. ``mode='delta'``
        commits only this superstep's APPENDED rows — the per-superstep
        write cost is then O(batch), not O(state) (the Iceberg-append
        analog); ``load`` unions the delta chain back to the latest full
        snapshot. Callers compact (a full commit) on their checkpoint
        cadence so the chain the next read pays stays bounded.

        ``partition_by`` hive-partitions the snapshot on that column
        (the Iceberg bucket-partitioning analog): readers that filter on
        it get partition pruning, which is what makes per-superstep state
        probes O(touched buckets) instead of O(state) at 10^10-URL scale.
        """
        if mode not in ("full", "delta"):
            raise ValueError(f"unknown commit mode: {mode}")
        version = self.current_version() + 1
        snap_dir = os.path.join(self.table_dir, f"snap-{version:06d}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(snap_dir)
        files = [
            {
                "path": os.path.join(d, f),
                "bytes": os.path.getsize(os.path.join(d, f)),
                # Iceberg manifests carry record_count per data file; the
                # parquet footer has it already (no extra Spark job —
                # a local metadata read per file)
                "rows": _parquet_rows(os.path.join(d, f)),
            }
            for d, _, fs in os.walk(snap_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
        manifest = {
            "table": self.name,
            "version": version,
            "superstep": superstep,
            "parent_version": version - 1,
            "mode": mode,
            "partition_by": partition_by,
            "committed_at": time.time(),
            "location": snap_dir,
            "files": files,
            "lineage": lineage or {},
            "metrics": metrics or {},
        }
        tmp = self._manifest_path(version) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._manifest_path(version))  # atomic commit point
        return version

    def chain_manifests(self, version: int | None = None) -> list[dict]:
        """Manifests for a read at ``version``: the newest full snapshot
        at-or-before it plus every delta after, oldest first."""
        v = self.current_version() if version is None else version
        chain: list[dict] = []
        while v >= 0:
            manifest = self.read_manifest(v)
            chain.append(manifest)
            if manifest.get("mode", "full") == "full":
                break
            v -= 1
        return list(reversed(chain))

    def chain_locations(self, version: int | None = None) -> list[str]:
        """Data locations for a read at ``version``, oldest first."""
        return [m["location"] for m in self.chain_manifests(version)]

    def expire_snapshots(
        self, keep_last: int = 1, older_than: float | None = None
    ) -> list[int]:
        """Iceberg ``expire_snapshots`` parity for the manifest layer:
        delete snapshot versions (manifest + data dir) no retained read
        can need, bounding checkpoint disk over a long crawl.

        Retention: the last ``keep_last`` versions always survive;
        ``older_than`` (a ``committed_at`` epoch) additionally retains
        every newer version. Because a read at version v chains deltas
        back to the newest FULL snapshot at-or-before v, expiry keeps
        everything from the oldest retained version's full-snapshot
        anchor upward — a delta is never orphaned from its base. Time
        travel below the anchor becomes unavailable (that is the point);
        ``load``/resume at any retained version is unchanged. Returns
        the removed version numbers, oldest first."""
        cur = self.current_version()
        if cur < 0:
            return []
        oldest_retained = max(0, cur - keep_last + 1)
        if older_than is not None:
            v = oldest_retained
            while v > 0:
                m = self.read_manifest(v - 1)
                if m is None or m.get("committed_at", 0) < older_than:
                    break
                v -= 1
            oldest_retained = min(oldest_retained, v)
        anchor = oldest_retained
        while anchor > 0:
            m = self.read_manifest(anchor)
            if m is None or m.get("mode", "full") == "full":
                break
            anchor -= 1
        removed: list[int] = []
        for v in range(0, anchor):
            mp = self._manifest_path(v)
            if not os.path.exists(mp):
                continue  # already expired earlier
            m = self.read_manifest(v)
            shutil.rmtree(m.get("location", ""), ignore_errors=True)
            os.remove(mp)
            removed.append(v)
        return removed

    def load(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        chain = self.chain_manifests(version)
        if not chain:
            return None
        parts = []
        for m in chain:
            df = spark.read.parquet(m["location"])
            if m.get("partition_by"):
                # drop the hive-partition column: load() returns the
                # logical table, bucketing is a physical layout detail
                df = df.drop(m["partition_by"])
            parts.append(df)
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out


def merge_tables(
    target: DataFrame, source: DataFrame, key: str = "url_hash", override: bool = False
) -> DataFrame:
    """``PersistentDict.merge`` (pdict.py:249-255): copy rows from
    ``source`` whose key is absent from ``target``; ``override=True``
    prefers source rows for matched keys instead. The Iceberg analog is
    ``MERGE INTO ... WHEN NOT MATCHED THEN INSERT`` (resp. ``WHEN MATCHED
    THEN UPDATE``); as plain DataFrames it is an anti-join + union — one
    shuffle on the key, no driver involvement."""
    if override:
        kept_target = target.join(source.select(key), key, "left_anti")
        return kept_target.unionByName(source)
    new_rows = source.join(target.select(key), key, "left_anti")
    return target.unionByName(new_rows)


class SnapshotCatalog:
    """A directory of SnapshotTables + a crawl-level state manifest."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.root, name)

    def save_state(self, state: dict) -> None:
        """Atomic crawl-state JSON (State.save parity, download.py:924-945)."""
        path = os.path.join(self.root, "status.json")
        tmp = f"{path}.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(state, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)

    def load_state(self) -> dict | None:
        path = os.path.join(self.root, "status.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)
