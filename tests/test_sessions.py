"""Gap-based sessionization (operators/sessions.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from webscraping_spark.operators.sessions import session_stats, sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )


def _t(s):
    return datetime.fromisoformat(s)


def test_gap_splits_sessions_exclusively(spark):
    rows = [
        (0, 1, _t("2024-01-01 00:00:00")),
        (1, 1, _t("2024-01-01 00:10:00")),  # 600s gap == gap_s: SAME session
        (2, 1, _t("2024-01-01 00:20:00.000001")),  # 1us over: NEW session
        (3, 2, _t("2024-01-01 00:00:00")),  # other key: its own numbering
    ]
    got = {
        r["event_id"]: (r["session_seq"], r["session_id"])
        for r in sessionize(_events(spark, rows), gap_s=600).collect()
    }
    assert got[0] == (1, "1-1")
    assert got[1] == (1, "1-1")  # boundary is exclusive (> gap, not >=)
    assert got[2] == (2, "1-2")
    assert got[3] == (1, "2-1")


def test_ts_tie_breaks_on_id(spark):
    t = _t("2024-01-01 00:00:00")
    rows = [(5, 1, t), (4, 1, t)]
    got = sessionize(_events(spark, rows), gap_s=1).collect()
    assert {r["session_seq"] for r in got} == {1}  # same instant: one session


def test_session_stats_integer_duration(spark):
    rows = [
        (0, 1, _t("2024-01-01 00:00:00")),
        (1, 1, _t("2024-01-01 00:00:59.900000")),
        (2, 1, _t("2024-01-01 09:00:00")),
    ]
    s = sessionize(_events(spark, rows), gap_s=600)
    got = {
        r["session_id"]: (r["n_events"], r["duration_s"])
        for r in session_stats(s).collect()
    }
    assert got["1-1"] == (2, 59)  # 59.9s floors to 59 whole seconds
    assert got["1-2"] == (1, 0)


def test_partitioning_invariance(spark):
    rows = [
        (i, i % 7, _t("2024-01-01 00:00:00").replace(minute=(i * 13) % 60))
        for i in range(200)
    ]
    df = _events(spark, rows)
    a = sorted(map(tuple, sessionize(df, gap_s=300).collect()))
    b = sorted(map(tuple, sessionize(df.repartition(9, "ts"), gap_s=300).collect()))
    assert a == b


def test_windowed_counts_exact(spark):
    from webscraping_spark.operators.sessions import windowed_counts

    rows = [
        (0, 1, _t("2024-01-01 00:00:01")),
        (1, 1, _t("2024-01-01 00:09:59.999999")),
        (2, 1, _t("2024-01-01 00:10:00")),  # exactly on the boundary: next window
    ]
    ev = _events(spark, rows).select(
        "event_id", "ts", F.lit("click").alias("event_type"),
        (F.col("event_id") * 1.25 + 0.000001).alias("value"),
    )
    got = {
        r["window_start_us"]: (r["n_events"], r["sum_value_micro"])
        for r in windowed_counts(ev, window_s=600).collect()
    }
    e = 1704067200_000000  # 2024-01-01 00:00:00 wall epoch micros
    assert got[e] == (2, 1 + 1250001)  # 0.000001 and 1.250001 in micros
    assert got[e + 600_000_000] == (1, 2500001)
