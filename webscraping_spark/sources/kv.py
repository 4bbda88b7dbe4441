"""Key-value store parity layer — the reference's ``pdict`` module
(PersistentDict, pdict.py:42-259; DbmDict, pdict.py:262-399) re-expressed
for a Spark engine.

Two backends, mirroring the reference's two:

``PersistentDictTable``
    The distributed analog of ``PersistentDict`` (sqlite): a dict-like
    facade over a :class:`~webscraping_spark.sources.snapshots.SnapshotTable`
    holding ``(key string, value binary, meta binary, updated double)``.
    Point writes buffer on the driver and flush as ONE delta-snapshot
    commit (O(batch), the Iceberg-append analog — never a Spark job per
    ``__setitem__``); point reads consult the buffer then run a key-pushdown
    filtered collect; bulk ops (``contains`` over a DataFrame, ``merge``)
    are joins. Freshness follows the reference exactly: ``expires`` is a
    ``timedelta``, a stale row fails ``in``/raises on ``[]`` but still
    counts for ``len`` and ``contains(..., ignore_expires=True)``
    (pdict.py:112-137, 161-172, 202-205).

``DbmDict``
    The reference's documented alternate backend (pdict.py:262-399) —
    driver-local stdlib ``dbm`` with lazy writes, zlib-compressed pickles,
    and ``__meta__``-prefixed meta keys. Scoped, as in the reference, to
    small local state (robots caches, run settings); corpus-scale state
    belongs in the snapshot-table backend.

Both serialize values as ``zlib.compress(pickle.dumps(v), compress_level)``
— the reference's wire format (pdict.py:190-199, 349-359) — so a user can
carry dumps across.
"""

from __future__ import annotations

import datetime
import os
import pickle
import time
import zlib
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscraping_spark.sources.snapshots import SnapshotTable, merge_tables

KV_SCHEMA = "key string, value binary, meta binary, updated double"


def _serialize(value: Any, compress_level: int) -> bytes:
    return zlib.compress(
        pickle.dumps(value, protocol=pickle.HIGHEST_PROTOCOL), compress_level
    )


def _deserialize(value: bytes | None) -> Any:
    if value:
        return pickle.loads(zlib.decompress(bytes(value)))


def resolve_upsert_log(
    df: DataFrame,
    key: str = "key",
    updated: str = "updated",
    payload_cols: tuple[str, ...] = ("value", "meta"),
    drop_tombstones: bool = True,
) -> DataFrame:
    """Collapse an append-only upsert log to its current state: last write
    per key wins (the sqlite ``INSERT OR REPLACE`` in pdict.py:181-188,
    replayed as one shuffle-free-of-driver aggregation). NULL in the first
    payload column marks a delete tombstone."""
    last = F.max_by(F.struct(*payload_cols), F.col(updated))
    out = (
        df.groupBy(key)
        .agg(last.alias("_last"), F.max(updated).alias(updated))
        .select(
            key,
            *[F.col(f"_last.{c}").alias(c) for c in payload_cols],
            updated,
        )
    )
    if drop_tombstones:
        out = out.filter(F.col(payload_cols[0]).isNotNull())
    return out


class PersistentDictTable:
    """Dict-like snapshot-table KV store (PersistentDict parity).

    >>> import tempfile
    >>> # doctest contract transcribed from pdict.py:57-82 (Python 3):
    >>> # cache[url] = html; url in cache; cache.get(url)['value'] == html;
    >>> # cache.meta(url) == {}; cache.meta(url, 'meta'); del cache[url]
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        table: str = "kv",
        compress_level: int = 6,
        expires: datetime.timedelta | None = None,
        flush_every: int = 10_000,
    ):
        self.spark = spark
        self.compress_level = compress_level
        self.expires = expires
        self.flush_every = flush_every
        self.table = SnapshotTable(root, table)
        # driver-side write-behind buffer: key -> (value_bytes|None del-marker,
        # meta_bytes|None keep-existing, updated)
        self._buffer: dict[str, tuple[bytes | None, bytes | None, float]] = {}
        self._cleared = False

    def __copy__(self) -> "PersistentDictTable":
        return PersistentDictTable(
            self.spark,
            self.table.root,
            self.table.name,
            compress_level=self.compress_level,
            expires=self.expires,
            flush_every=self.flush_every,
        )

    # -- committed-state access ------------------------------------------------

    def _committed(self) -> DataFrame:
        df = self.table.load(self.spark)
        if df is None or self._cleared:
            return self.spark.createDataFrame([], KV_SCHEMA)
        # the delta chain is an upsert log: last write per key wins
        return resolve_upsert_log(df)

    def flush(self) -> None:
        """Commit the buffered writes as one delta snapshot (tombstones are
        NULL-value rows); a ``clear()`` forces a full (empty-base) commit."""
        if not self._buffer and not self._cleared:
            return
        rows = [
            (k, v, m, t) for k, (v, m, t) in self._buffer.items()
        ]
        df = self.spark.createDataFrame(rows, KV_SCHEMA)
        mode = "delta" if (self.table.current_version() >= 0 and not self._cleared) else "full"
        if self._cleared:
            self.table.commit(df, superstep=-1, mode="full")
            self._cleared = False
        else:
            self.table.commit(df, superstep=-1, mode=mode)
        self._buffer.clear()

    def df(self) -> DataFrame:
        """Current logical state (committed ⊕ buffer) as a DataFrame."""
        self.flush()
        return self._committed()

    # -- freshness -------------------------------------------------------------

    def is_fresh(self, t: float) -> bool:
        """pdict.py:202-205 with epoch-seconds timestamps."""
        return (
            self.expires is None
            or time.time() - t < self.expires.total_seconds()
        )

    # -- dict protocol ---------------------------------------------------------

    def _lookup(self, key: str):
        """(value_bytes, meta_bytes, updated) or None — buffer first."""
        if key in self._buffer:
            v, m, t = self._buffer[key]
            if v is None:
                return None
            if m is None:  # meta-only update pending over a committed value
                committed = self._lookup_committed(key)
                m = committed[1] if committed else _serialize({}, self.compress_level)
            return (v, m, t)
        if self._cleared:
            return None
        return self._lookup_committed(key)

    def _lookup_committed(self, key: str):
        df = self.table.load(self.spark)
        if df is None:
            return None
        rows = (
            df.filter(F.col("key") == key)
            .orderBy(F.col("updated").desc())
            .limit(1)
            .collect()
        )
        if not rows or rows[0]["value"] is None:
            return None
        r = rows[0]
        return (bytes(r["value"]), bytes(r["meta"]) if r["meta"] else None, r["updated"])

    def __contains__(self, key: str) -> bool:
        row = self._lookup(key)
        return bool(row) and self.is_fresh(row[2])

    def contains(self, keys, ignore_expires: bool = False) -> list[str]:
        """Bulk membership (pdict.py:119-137). ``keys`` may be a list (order
        of the underlying scan, like the reference's IN query) or a
        DataFrame with a ``key`` column — the latter is a distributed
        semi-join, the 10^10-scale path."""
        if isinstance(keys, DataFrame):
            state = self.df()
            if not ignore_expires and self.expires is not None:
                state = state.filter(
                    F.lit(time.time()) - F.col("updated")
                    < F.lit(self.expires.total_seconds())
                )
            return [
                r["key"]
                for r in state.join(keys.select("key"), "key", "left_semi").collect()
            ]
        out = []
        for k in keys:
            row = self._lookup(k)
            if row and (ignore_expires or self.is_fresh(row[2])):
                out.append(k)
        return out

    def __iter__(self) -> Iterator[str]:
        seen = set(self._buffer)
        for k, (v, _, _) in self._buffer.items():
            if v is not None:
                yield k
        if not self._cleared:
            for r in self._committed().select("key").collect():
                if r["key"] not in seen:
                    yield r["key"]

    def __len__(self) -> int:
        return sum(1 for _ in self)

    def __bool__(self) -> bool:
        return True

    def __getitem__(self, key: str) -> Any:
        row = self._lookup(key)
        if row:
            if self.is_fresh(row[2]):
                return _deserialize(row[0])
            raise KeyError(f"Key `{key}' is stale")
        raise KeyError(f"Key `{key}' does not exist")

    def __setitem__(self, key: str, value: Any) -> None:
        self._buffer[key] = (
            _serialize(value, self.compress_level),
            _serialize({}, self.compress_level),
            time.time(),
        )
        if len(self._buffer) >= self.flush_every:
            self.flush()

    def __delitem__(self, key: str) -> None:
        self._buffer[key] = (None, None, time.time())  # tombstone

    def get(self, key: str, default: Any = None) -> Any:
        """pdict.py:208-222: dict(value=, meta=, updated=) or default."""
        if key:
            row = self._lookup(key)
            if row and self.is_fresh(row[2]):
                return {
                    "value": _deserialize(row[0]),
                    "meta": _deserialize(row[1]) if row[1] else {},
                    "updated": row[2],
                }
        return default

    def meta(self, key: str, value: Any = None) -> Any:
        """Get/set per-key metadata (pdict.py:225-240)."""
        if value is None:
            row = self._lookup(key)
            if row is None:
                raise KeyError(f"Key `{key}' does not exist")
            return _deserialize(row[1]) if row[1] else {}
        row = self._lookup(key)
        if row is not None:
            self._buffer[key] = (
                row[0],
                _serialize(value, self.compress_level),
                time.time(),
            )

    def clear(self) -> None:
        self._buffer.clear()
        self._cleared = True

    def merge(self, other: "PersistentDictTable | DbmDict", override: bool = False) -> None:
        """pdict.py:249-255 — distributed when both sides are tables (one
        anti-join + delta commit, no per-key loop)."""
        if isinstance(other, PersistentDictTable):
            self.flush()
            merged = merge_tables(
                self._committed(), other.df(), key="key", override=override
            )
            self.table.commit(merged, superstep=-1, mode="full")
            self._cleared = False
            return
        for key in other:
            if override or key not in self:
                self[key] = other[key]


class DbmDict:
    """Driver-local dbm KV store — DbmDict parity (pdict.py:262-399).

    Python 3 ``dbm`` (gdbm/ndbm/dumb, whichever the stdlib picks), lazy
    writes, zlib+pickle values, ``__meta__``-prefix meta keys. Keys are
    str in, str out (dbm stores bytes; the reference predates that split).
    """

    META_PREFIX = "__meta__"

    def __init__(self, filename: str = "dbm.db", compress_level: int = 6):
        import dbm

        self.filename, self.compress_level = filename, compress_level
        self.db = dbm.open(filename, "c")

    def __copy__(self) -> "DbmDict":
        return DbmDict(filename=self.filename, compress_level=self.compress_level)

    def __contains__(self, key: str) -> bool:
        return key.encode("utf-8") in self.db

    def __iter__(self) -> Iterator[str]:
        for k in self.db.keys():
            yield k.decode("utf-8")

    def __len__(self) -> int:
        return len(self.db)

    def __getitem__(self, key: str) -> Any:
        return _deserialize(self.db[key.encode("utf-8")])

    def __delitem__(self, key: str) -> None:
        del self.db[key.encode("utf-8")]

    def __setitem__(self, key: str, value: Any) -> None:
        self.db[key.encode("utf-8")] = _serialize(value, self.compress_level)

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def meta(self, key: str, value: Any = None) -> Any:
        """pdict.py:372-384: meta rides as a prefixed sibling key."""
        key = self.META_PREFIX + key
        if value is None:
            return self.get(key, {})
        self[key] = value

    def clear(self) -> None:
        for key in list(self):
            del self[key]

    def merge(self, other, override: bool = False) -> None:
        for key in other:
            if override or key not in self:
                self[key] = other[key]

    def sync(self) -> None:
        if hasattr(self.db, "sync"):
            self.db.sync()
