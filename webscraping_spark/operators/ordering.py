"""Deterministic global sequence assignment — distributed, no single-task
window.

``seq`` (the monotonic discovery index) is what makes the engine's crawl
order deterministic under parallelism (SURVEY.md §7.3 item 1). A naive
``row_number() OVER (ORDER BY ...)`` funnels every row through one task; at
10^10-URL scale that is the whole job. Instead:

  1. range-repartition + sort within partitions on the order key
     (total order across partition ids),
  2. one cheap count-per-partition job -> cumulative offsets (tiny,
     collected to the driver, broadcast),
  3. mapInPandas stamps ``offset[pid] + local running index``.

Cost: one extra count job over the batch; every stage is fully parallel.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assign_global_seq(
    df: DataFrame,
    order_cols: list[Column],
    start: int = 0,
    seq_col: str = "seq",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add ``seq_col`` = start, start+1, ... in the total order given by
    ``order_cols`` (which must be deterministic and total — pass a unique
    tiebreaker). Returns (stamped_df, row_count) — the count is a free
    byproduct of the offset job."""
    spark = df.sparkSession
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    arranged = arranged.localCheckpoint(eager=False)
    counts = {
        r["_pid"]: r["n"]
        for r in arranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = arranged.drop("_pid").schema.add(seq_col, "long")

    def stamp(batches):
        consumed = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = b_offsets.value[pid] + consumed
            consumed += len(pdf)
            out = pdf.drop(columns=["_pid"])
            out[seq_col] = base + np.arange(len(pdf), dtype=np.int64)
            yield out

    return arranged.mapInPandas(stamp, out_schema), acc - start


def _spread_bits(x):
    """Interleave-ready bit spread: the 31 low bits of ``x`` move to the
    even bit positions of a 62-bit value (classic Morton magic masks,
    fully expressible in both Spark and ANSI-ish SQL bitwise ops — the
    result stays under 2^62, so BIGINT never goes negative)."""
    def band(c, m):
        # Column.__and__/__or__ are BOOLEAN operators in PySpark; the
        # bitwise forms are methods
        return c.bitwiseAND(F.lit(m).cast("long"))

    x = band(x, 0x7FFFFFFF)
    x = band(x.bitwiseOR(F.shiftleft(x, 16)), 0x0000FFFF0000FFFF)
    x = band(x.bitwiseOR(F.shiftleft(x, 8)), 0x00FF00FF00FF00FF)
    x = band(x.bitwiseOR(F.shiftleft(x, 4)), 0x0F0F0F0F0F0F0F0F)
    x = band(x.bitwiseOR(F.shiftleft(x, 2)), 0x3333333333333333)
    x = band(x.bitwiseOR(F.shiftleft(x, 1)), 0x5555555555555555)
    return x


def zorder_key(col_a, col_b):
    """62-bit Morton (Z-order) key interleaving the low 31 bits of two
    non-negative integer columns — the multi-dimensional clustering key
    behind Delta/Iceberg's OPTIMIZE ZORDER: sort or repartitionByRange on
    it and rows close in BOTH dimensions land in the same files, so a
    scan filtered on either dimension (or both) prunes most of them.
    Crawl-shaped use: ``zorder_key(pmod(xxhash64(domain), 2^31),
    fetched_at_bucket)`` clusters the visited table so per-domain probes
    AND time-range compactions each touch few files.

    Pure codegen bitwise expression (six mask-shift rounds per side);
    callers clamp/bucket their dimensions into [0, 2^31) first — a hash
    or a time bucket already is."""
    return _spread_bits(col_a).bitwiseOR(F.shiftleft(_spread_bits(col_b), 1))
