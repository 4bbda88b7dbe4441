"""HTTP conditional revalidation (operators/revalidate.py): RFC 9111
freshness subset + 304 merge. Extends the reference's wall-clock TTL
(pdict.py:202-205) with validator-aware recrawling."""

import pyspark.sql.functions as F
import pytest

from webscraping_spark.operators import revalidate as rv

NOW = 100_000_000  # 100 s on the politeness timeline
TTL = 50_000_000  # 50 s default


def _cached(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, body string, fetched_at_us long, etag string, "
        "last_modified string, cache_control string",
    )


class TestPolicy:
    def _plan(self, spark, rows):
        return {
            r["url"]: r
            for r in rv.cache_policy(_cached(spark, rows), NOW, TTL).collect()
        }

    def test_decision_table(self, spark):
        rows = [
            # fresh (age 10s < 50s): serve, no headers
            ("u/fresh", "b", NOW - 10_000_000, '"e1"', None, None),
            # stale with etag: revalidate via If-None-Match
            ("u/etag", "b", NOW - 60_000_000, '"e2"', None, None),
            # stale with only Last-Modified: If-Modified-Since
            ("u/lm", "b", NOW - 60_000_000, None, "Mon, 01 Jan 2024", None),
            # stale, no validator: full refetch
            ("u/bare", "b", NOW - 60_000_000, None, None, None),
        ]
        got = self._plan(spark, rows)
        assert got["u/fresh"]["action"] == "serve"
        assert got["u/fresh"]["if_none_match"] is None
        assert got["u/etag"]["action"] == "revalidate"
        assert got["u/etag"]["if_none_match"] == '"e2"'
        assert got["u/lm"]["action"] == "revalidate"
        assert got["u/lm"]["if_modified_since"] == "Mon, 01 Jan 2024"
        assert got["u/bare"]["action"] == "refetch"

    def test_etag_precedence_over_last_modified(self, spark):
        rows = [("u/both", "b", NOW - 60_000_000, '"e"', "Mon, 01 Jan 2024", None)]
        got = self._plan(spark, rows)["u/both"]
        assert got["if_none_match"] == '"e"'
        assert got["if_modified_since"] is None  # ONE validator is sent

    def test_cache_control_overrides(self, spark):
        rows = [
            # no-store: refetch even though fresh by age
            ("u/nostore", "b", NOW - 1_000_000, '"e"', None, "no-store, private"),
            # no-cache: revalidate even though fresh by age
            ("u/nocache", "b", NOW - 1_000_000, '"e"', None, "public, no-cache"),
            # no-cache without validators degrades to refetch
            ("u/nocache2", "b", NOW - 1_000_000, None, None, "no-cache"),
            # max-age=60 keeps a 55s-old entry fresh past the 50s default
            ("u/longer", "b", NOW - 55_000_000, None, None, "max-age=60"),
            # max-age=5 expires a 10s-old entry the default would serve
            ("u/shorter", "b", NOW - 10_000_000, '"e"', None, "max-age=5"),
            # token safety: a header that merely CONTAINS the words
            ("u/decoy", "b", NOW - 10_000_000, None, None, "x-no-cache-hint"),
        ]
        got = self._plan(spark, rows)
        assert got["u/nostore"]["action"] == "refetch"
        assert got["u/nocache"]["action"] == "revalidate"
        assert got["u/nocache2"]["action"] == "refetch"
        assert got["u/longer"]["action"] == "serve"
        assert got["u/shorter"]["action"] == "revalidate"
        assert got["u/decoy"]["action"] == "serve"

    def test_plan_shape_zero_shuffle(self, spark):
        rows = [("u", "b", 0, None, None, None)]
        plan = (
            rv.cache_policy(_cached(spark, rows), NOW, TTL)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan


class TestMerge:
    def test_304_200_error_and_absent(self, spark):
        cached = _cached(
            spark,
            [
                ("u/304", "old-a", 1, '"oa"', None, None),
                ("u/200", "old-b", 2, '"ob"', None, None),
                ("u/500", "old-c", 3, '"oc"', None, None),
                ("u/none", "old-d", 4, '"od"', None, None),
            ],
        )
        responses = spark.createDataFrame(
            [
                ("u/304", 304, None, '"na"', None),
                ("u/200", 200, "new-b", '"nb"', "Tue, 02 Jan 2024"),
                ("u/500", 500, None, None, None),
            ],
            "url string, status_code int, new_body string, new_etag string, "
            "new_last_modified string",
        )
        got = {
            r["url"]: r
            for r in rv.merge_revalidated(cached, responses, NOW).collect()
        }
        # 304: body kept, fetched_at bumped, validator refreshed
        assert got["u/304"]["body"] == "old-a"
        assert got["u/304"]["fetched_at_us"] == NOW
        assert got["u/304"]["etag"] == '"na"'
        assert got["u/304"]["last_status"] == 304
        # 200: body + validators replaced
        assert got["u/200"]["body"] == "new-b"
        assert got["u/200"]["etag"] == '"nb"'
        assert got["u/200"]["last_modified"] == "Tue, 02 Jan 2024"
        assert got["u/200"]["fetched_at_us"] == NOW
        # 500: row unchanged, status surfaced for retry routing
        assert got["u/500"]["body"] == "old-c"
        assert got["u/500"]["fetched_at_us"] == 3
        assert got["u/500"]["etag"] == '"oc"'
        assert got["u/500"]["last_status"] == 500
        # no response row: untouched, NULL status
        assert got["u/none"]["body"] == "old-d"
        assert got["u/none"]["fetched_at_us"] == 4
        assert got["u/none"]["last_status"] is None

    def test_304_without_new_validator_keeps_old(self, spark):
        cached = _cached(spark, [("u", "old", 1, '"keep"', "Mon", None)])
        responses = spark.createDataFrame(
            [("u", 304, None, None, None)],
            "url string, status_code int, new_body string, new_etag string, "
            "new_last_modified string",
        )
        got = rv.merge_revalidated(cached, responses, NOW).collect()[0]
        assert got["etag"] == '"keep"' and got["last_modified"] == "Mon"


class TestRetryAfter:
    NOW = "Mon, 01 Jan 2024 00:00:00 GMT"

    def _secs(self, spark, vals):
        from pyspark.sql import functions as F

        from webscraping_spark.operators.revalidate import retry_after_seconds_col

        df = spark.createDataFrame([(v,) for v in vals], "h string")
        return [
            r["s"]
            for r in df.select(
                retry_after_seconds_col(F.col("h"), F.lit(self.NOW)).alias("s")
            ).collect()
        ]

    def test_forms(self, spark):
        got = self._secs(
            spark,
            [
                "120",                                  # delta-seconds
                " 7 ",                                  # trimmed
                "Mon, 01 Jan 2024 00:02:30 GMT",        # future date: 150s
                "Sun, 31 Dec 2023 23:59:00 GMT",        # past date: clamp 0
                "soon",                                 # unparseable
                "99999999999999999999",                 # over 9 digits: no signal
            ],
        )
        assert got == [120, 7, 150, 0, None, None]

    def test_overrides_max_per_domain(self, spark):
        from webscraping_spark.operators.revalidate import retry_after_overrides

        df = spark.createDataFrame(
            [
                ("a.com", "30"),
                ("a.com", "Mon, 01 Jan 2024 00:01:00 GMT"),  # 60
                ("a.com", None),
                ("b.com", "nope"),
            ],
            "domain string, retry_after string",
        )
        rows = {r["domain"]: r["crawl_delay"] for r in retry_after_overrides(df, self.NOW).collect()}
        assert rows == {"a.com": 60.0}

    def test_plugs_into_plan_schedule(self, spark):
        from webscraping_spark.operators import politeness as P
        from webscraping_spark.operators.revalidate import retry_after_overrides

        sig = spark.createDataFrame(
            [("s.com", "45")], "domain string, retry_after string"
        )
        overrides = retry_after_overrides(sig, self.NOW)
        batch = spark.createDataFrame(
            [(f"http://s.com/{i}", "s.com", 0, i) for i in range(2)],
            "url string, domain string, priority int, seq long",
        ).withColumn("url_hash", __import__("pyspark.sql.functions", fromlist=["xxhash64"]).xxhash64("url")).withColumn("depth", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(0))
        state = spark.createDataFrame([], P.DOMAIN_STATE_SCHEMA)
        planned, _ = P.plan_schedule(batch, state, 5.0, 0.0, domain_delays=overrides)
        offs = sorted(r["scheduled_offset"] for r in planned.collect())
        assert abs((offs[1] - offs[0]) - 45.0) < 1e-6
