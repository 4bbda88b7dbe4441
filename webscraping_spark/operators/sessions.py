"""Gap-based sessionization — the canonical stateful grouping over an
event stream, in its batch form: a new session starts when the gap to the
key's previous event exceeds ``gap_s``.

Crawl tie-in: run over the visit log keyed on domain it yields *crawl
bursts* (how long the scheduler hammered one host before politeness or
the frontier moved on — the politeness auditor's unit of analysis); run
over user events it is the classic web-analytics session. The reference
has no analytics layer at all; its closest notion is the per-domain
throttle window (download.py:455-473), which this op measures from the
other side.

Determinism contract: all gap arithmetic is integer microseconds taken
STRAIGHT from the stored int64 — ``wall_micros`` dispatches on the
column's actual Spark type so the value never routes through the session
timezone under EITHER parquet typing:

- TIMESTAMP (LTZ, parquet isAdjustedToUTC=true): ``unix_micros(ts)`` —
  instant arithmetic, raw stored micros, session-TZ-invariant. A
  ``CAST(.. AS TIMESTAMP_NTZ)`` here would RE-RENDER the instant through
  ``spark.sql.session.timeZone`` and shift every value by the session
  offset (the round-4 driver hash failure: offsets cancel in gaps, so
  row counts matched, but not in ``start_us``/window floors).
- TIMESTAMP_NTZ (parquet isAdjustedToUTC=false): ``timestampdiff`` from
  the NTZ epoch — raw stored micros (``unix_micros`` would be the wrong
  leg HERE: Spark first coerces NTZ→LTZ through the session TZ).

Both legs equal DuckDB's ``epoch_us(ts)``, which likewise returns the
raw int64 for both typings, so the oracle holds under any combination
of parquet typing and session timezone. The per-key event order is
(ts, id), a total order, so session numbering is reproducible under any
partitioning. Streaming twin: the
same semantics are Structured Streaming's ``session_window`` /
``applyInPandasWithState``; the batch form is what a backfill over an
at-rest log runs, and what a SQL oracle can re-derive.

Shape: ONE window shuffle keyed on the session key (lag + running sum in
the same window frame — Catalyst evaluates both in a single Window node),
then session_stats is one map-side-combinable groupBy on the (key,
session_seq) pair that inherits the window's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def _ntz_micros(ts_col: str):
    """NTZ leg: raw stored micros for a TIMESTAMP_NTZ (or string) column."""
    return F.expr(
        "timestampdiff(MICROSECOND, CAST('1970-01-01 00:00:00' AS "
        f"TIMESTAMP_NTZ), CAST({ts_col} AS TIMESTAMP_NTZ))"
    )


def wall_micros(df: DataFrame, ts_col: str):
    """Raw stored int64 microseconds of ``ts_col``, independent of the
    session timezone AND of how the parquet writer typed the column
    (instant / isAdjustedToUTC=true → TIMESTAMP_LTZ → ``unix_micros``;
    naive / isAdjustedToUTC=false → TIMESTAMP_NTZ → NTZ-epoch
    ``timestampdiff``). Matches DuckDB ``epoch_us(ts)`` bit-for-bit on
    both typings — the shared device for every timestamp-consuming
    operator (sessions, windows, politeness audit, recrawl).

    ``ts_col`` must be a TOP-LEVEL simple column name: the typing
    dispatch reads ``df.schema[ts_col]`` and the NTZ leg interpolates the
    name into SQL, so nested fields or expressions are rejected up front
    with a clear error (ADVICE r5)."""
    try:
        dt = df.schema[ts_col].dataType
    except KeyError as exc:
        raise ValueError(
            f"wall_micros requires a top-level column name; {ts_col!r} is "
            f"not a column of the frame (nested fields/expressions are not "
            f"supported — project them to a column first)"
        ) from exc
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(ts_col))
    return _ntz_micros(ts_col)


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Input plus ``(session_seq, session_id)``: ``session_seq`` numbers a
    key's sessions from 1 in time order; ``session_id`` is the printable
    ``{key}-{seq}`` form. An event opens a new session when it is the
    key's first or arrives more than ``gap_s`` seconds (exclusive) after
    the previous event."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    us = wall_micros(events, ts_col)
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | (us - prev > F.lit(int(gap_s) * 1_000_000)), 1
    ).otherwise(0)
    seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_seq", seq.cast("long")).withColumn(
        "session_id",
        F.concat(F.col(key_col).cast("string"), F.lit("-"), F.col("session_seq")),
    )


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session aggregates over a ``sessionize`` output: ``(key,
    session_seq, session_id, n_events, start_us, end_us, duration_s)``.
    Duration is integer micros differenced then floor-divided to whole
    seconds — engine-reproducible."""
    us = wall_micros(sessions, ts_col)
    return (
        sessions.groupBy(key_col, "session_seq", "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
        )
        .withColumn(
            "duration_s",
            F.expr("(end_us - start_us) div CAST(1000000 AS BIGINT)"),
        )
    )


def windowed_counts(
    events: DataFrame,
    window_s: int = 600,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window event aggregates: ``(window_start_us, event_type,
    n_events, sum_value_micro)`` — the batch twin of Structured
    Streaming's ``F.window`` aggregation (the engine's stream side runs
    the same shape with a watermark; this form backfills an at-rest log
    and is SQL-oracle-able). Window assignment is integer floor division
    of wall-clock micros (timezone-free, same contract as sessionize);
    ``value_col`` sums in 1e-6 fixed point BEFORE aggregation so the
    result is reduction-order-free (the lm.py device). ONE
    map-side-combinable groupBy."""
    span = F.lit(int(window_s) * 1_000_000).cast("long")
    us = wall_micros(events, ts_col)
    start = (us - (us % span) + F.when(us % span < 0, -span).otherwise(0)).cast(
        "long"
    )
    micro_val = F.expr(f"CAST(round({value_col} * 1000000) AS BIGINT)")
    return (
        events.select(
            start.alias("window_start_us"),
            F.col(type_col).alias("event_type"),
            micro_val.alias("_v"),
        )
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("_v").alias("sum_value_micro"),
        )
    )
