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
) -> None:
    """Dedup + CSV write (UnicodeWriter end-to-end)."""
    unique_rows(df, unique_by, order_col).write.mode(mode).option(
        "header", str(header).lower()
    ).csv(path)


def read_list(spark, path: str) -> DataFrame:
    """Text-file line list (reference common.read_list, common.py:524-532):
    one string column ``value`` per line."""
    return spark.read.text(path)
