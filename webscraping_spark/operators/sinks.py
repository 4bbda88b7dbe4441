"""Sinks — the reference's tabular outputs re-expressed as DataFrame writers.

``UnicodeWriter`` (common.py:535-649) is an append-only CSV writer with
optional row dedup over all columns or a ``unique_by`` subset (its HashDict
dedup, common.py:580-589/621-630). The engine form is a dedup + single
ordered write; uniqueness keeps the FIRST occurrence in ``order_col``
order, matching the writer's arrival-order semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def unique_rows(
    df: DataFrame,
    unique_by: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """First-occurrence row dedup (UnicodeWriter unique/unique_by parity).

    With no ``order_col`` the keeper among duplicates is unspecified (the
    reference's is arrival order, which a distributed write doesn't have) —
    pass the discovery/seq column whenever order matters.
    """
    keys = unique_by or df.columns
    if order_col is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def write_unique_csv(
    df: DataFrame,
    path: str,
    unique_by: list[str] | None = None,
    order_col: str | None = None,
    header: bool = True,
    mode: str = "overwrite",
    utf8_bom: bool = False,
    auto_repair: bool = False,
) -> None:
    """Dedup + CSV write (UnicodeWriter end-to-end, common.py:535-649).

    ``mode='append'`` with dedup replays the writer's constructor behavior
    of pre-seeding the seen set from the existing file (common.py:580-582):
    new rows whose key already exists on disk are dropped, keeping the
    on-disk first occurrence. ``auto_repair`` removes malformed rows from
    the existing output before appending (``_remove_invalid_rows``,
    common.py:590-606). ``utf8_bom`` stamps the Excel-compat UTF-8 BOM on
    each part file (common.py:575-579) — per part file because each part is
    the unit a consumer opens.
    """
    spark = df.sparkSession
    out = unique_rows(df, unique_by, order_col)
    if mode == "append":
        if auto_repair:
            repair_csv(spark, path, df.schema, header=header)
        existing = _read_existing_csv(spark, path, df.schema, header)
        if existing is not None:
            keys = unique_by or df.columns
            out = out.join(
                F.broadcast(existing.select(*keys).distinct()), keys, "left_anti"
            )
    out.write.mode(mode).option("header", str(header).lower()).csv(path)
    if utf8_bom:
        _prepend_bom(path)
        # part lengths changed under Spark's FileStatus cache
        spark.catalog.refreshByPath(path)


def _read_existing_csv(spark, path: str, schema, header: bool):
    """Existing CSV output at ``path``, or None when absent.

    Headerless outputs are BOM-stripped first: Spark's CSV reader only
    skips a UTF-8 BOM together with the header line, so on a
    ``utf8_bom=True, header=False`` output the BOM bytes would otherwise
    become part of the first record's first field (breaking both the
    dedup key and typed-column parses). The strip is physical and safe:
    ``_prepend_bom`` re-stamps every part after the append when
    ``utf8_bom`` is set."""
    import os

    if not os.path.isdir(path) and not os.path.isfile(path):
        return None
    if not header:
        _strip_bom(path)
        spark.catalog.refreshByPath(path)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .csv(path)
    )


def repair_csv(spark, path: str, schema, header: bool = True) -> None:
    """Drop malformed rows from an existing CSV output in place
    (UnicodeWriter ``auto_repair`` / ``_remove_invalid_rows``,
    common.py:590-606): rows that do not parse against the schema (e.g. a
    raw newline split a record) are removed and the output rewritten
    atomically via a tmp dir + rename, mirroring the reference's tmp-file
    swap."""
    import os
    import shutil

    if not os.path.isdir(path) and not os.path.isfile(path):
        return
    if not header:
        # see _read_existing_csv: a BOM on a headerless part would turn
        # the first row malformed and DROPMALFORMED would delete it
        _strip_bom(path)
        spark.catalog.refreshByPath(path)
    good = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    tmp = path.rstrip("/") + ".repair.tmp"
    good.write.mode("overwrite").option("header", str(header).lower()).csv(tmp)
    target = path.rstrip("/")
    # crash-safe swap: rename the old output ASIDE before renaming the
    # repaired one in, so there is no window with no data at `target`
    # (a crash between the renames leaves `.old` recoverable by hand)
    old = target + ".repair.old"
    if os.path.isdir(old) or os.path.isfile(old):
        shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)
    had_target = os.path.isdir(target) or os.path.isfile(target)
    if had_target:
        os.rename(target, old)
    os.rename(tmp, target)
    if had_target:
        shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)
    spark.catalog.refreshByPath(target)
    spark.catalog.refreshByPath(tmp)


def _strip_bom(path: str) -> None:
    """Remove a leading UTF-8 BOM from every part file under ``path``
    (inverse of ``_prepend_bom``; see _read_existing_csv for why)."""
    import glob
    import os

    BOM = b"\xef\xbb\xbf"
    parts = (
        sorted(glob.glob(os.path.join(path, "part-*")))
        if os.path.isdir(path)
        else [path]
    )
    for part in parts:
        with open(part, "rb") as fh:
            data = fh.read()
        if data.startswith(BOM):
            with open(part, "wb") as fh:
                fh.write(data[len(BOM):])
            crc = os.path.join(
                os.path.dirname(part), "." + os.path.basename(part) + ".crc"
            )
            if os.path.exists(crc):
                os.remove(crc)


def _prepend_bom(path: str) -> None:
    """Prepend the UTF-8 BOM to every part file under ``path`` lacking one."""
    import glob
    import os

    BOM = b"\xef\xbb\xbf"
    parts = (
        sorted(glob.glob(os.path.join(path, "part-*")))
        if os.path.isdir(path)
        else [path]
    )
    for part in parts:
        with open(part, "rb") as fh:
            data = fh.read()
        if not data.startswith(BOM):
            with open(part, "wb") as fh:
                fh.write(BOM + data)
            # the Hadoop local-FS checksum sidecar no longer matches
            crc = os.path.join(os.path.dirname(part), "." + os.path.basename(part) + ".crc")
            if os.path.exists(crc):
                os.remove(crc)


def read_list(spark, path: str) -> DataFrame:
    """Text-file line list (reference common.read_list, common.py:524-532):
    one string column ``value`` per line."""
    return spark.read.text(path)
