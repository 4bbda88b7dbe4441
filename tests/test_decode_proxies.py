"""Charset-sniff decode stage (common.py:100-116, download.py:419-423) and
proxy-performance tracking (download.py:51-68, 240-247)."""

import zlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from webscraping_spark.functions import decode


class TestCharsetKernel:
    def test_sniff_unquoted_meta(self):
        raw = b'<html><head><meta charset=iso-8859-1></head><body>caf\xe9</body></html>'
        assert decode.sniff_charset(raw) == "iso-8859-1"
        assert "café" in decode.html_to_unicode(raw)

    def test_sniff_content_type_form(self):
        raw = b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">\x93quoted\x94'
        assert decode.sniff_charset(raw) == "windows-1252"
        out = decode.html_to_unicode(raw)
        assert "“quoted”" in out

    def test_quoted_charset_attr_not_sniffed(self):
        # reference quirk preserved: <meta charset="..."> (quoted) does NOT
        # match common.py:112's regex — falls back to the default encoding
        raw = b'<meta charset="iso-8859-1">caf\xe9'
        assert decode.sniff_charset(raw) == "utf-8"

    def test_default_utf8_with_ignore(self):
        raw = "über".encode("utf-8") + b"\xff"  # trailing junk ignored
        assert decode.html_to_unicode(raw) == "über"

    def test_bogus_charset_falls_back(self):
        raw = b"<meta charset=no-such-enc>abc"
        out = decode.html_to_unicode(raw)
        assert out == "<meta charset=no-such-enc>abc"  # default-decoded, no crash

    def test_transfer_decoding(self):
        body = b"<html>hello</html>"
        gz = zlib.compress(body)
        gzip_wrapped = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        gz_full = gzip_wrapped.compress(body) + gzip_wrapped.flush()
        raw_deflate = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
        raw_full = raw_deflate.compress(body) + raw_deflate.flush()
        assert decode.decode_transfer(gz_full, "gzip") == body
        assert decode.decode_transfer(gz, "deflate") == body  # zlib-wrapped
        assert decode.decode_transfer(raw_full, "deflate") == body  # raw
        assert decode.decode_transfer(body, None) == body

    def test_decode_html_bytes_column(self, spark):
        rows = [
            ("a", None, b'<meta charset=iso-8859-1><a href="x">caf\xe9</a>', None),
            ("b", "<p>already decoded</p>", None, None),
            ("c", None, zlib.compress("<p>zipped ü</p>".encode("utf-8")), "deflate"),
        ]
        df = spark.createDataFrame(
            rows, "pid string, html string, html_bytes binary, content_encoding string"
        )
        got = {r["pid"]: r["html"] for r in decode.decode_html_bytes(df).collect()}
        assert "café" in got["a"]
        assert got["b"] == "<p>already decoded</p>"
        assert got["c"] == "<p>zipped ü</p>"


class TestDecodeCrawlWiring:
    def test_crawl_over_byte_pages(self, spark):
        """End-to-end: a non-UTF-8 page delivered as raw bytes must crawl
        identically to its decoded-string twin."""
        from webscraping_spark.plans.crawl import CrawlConfig, CrawlJob
        from webscraping_spark.plans.oracle import OracleConfig, SequentialOracle
        from webscraping_spark.sources import synth

        pages = synth.site_chain(3, domain="bytes.com")
        # deliver page 0's html as latin-1 bytes with a sniffable meta tag
        p0 = pages[0]
        tagged = '<meta charset=iso-8859-1>café ' + p0["html"]
        byte_rows = []
        for i, p in enumerate(pages):
            row = dict(p)
            if i == 0:
                row["html"] = None
                row["html_bytes"] = bytearray(tagged.encode("iso-8859-1"))
            else:
                row["html_bytes"] = None
            row["content_encoding"] = None
            byte_rows.append(row)
        import pyspark.sql.types as T

        schema = T.StructType(
            list(synth.PAGES_SCHEMA.fields)
            + [T.StructField("html_bytes", T.BinaryType()),
               T.StructField("content_encoding", T.StringType())]
        )
        df = spark.createDataFrame(
            [tuple(r[f.name] for f in schema.fields) for r in byte_rows], schema
        )
        oracle_pages = {p["url"]: dict(p) for p in pages}
        oracle_pages[p0["url"]]["html"] = tagged  # decoded twin
        exp = SequentialOracle(oracle_pages, OracleConfig(max_depth=None)).run(
            [p0["url"]]
        )
        job = CrawlJob(spark, df, CrawlConfig(max_depth=None))
        job.run([p0["url"]])
        assert job.visit_urls() == exp.visit_order
        assert len(exp.visit_order) == 3


def reference_proxy_model(events, max_proxy_errors):
    """Literal transcription of ProxyPerformance (download.py:51-68) +
    the removal rule (download.py:240-247)."""
    errors = defaultdict(int)
    counts = []
    removed = set()
    for proxy, ok in events:
        if ok:
            errors[proxy] = 0
        else:
            errors[proxy] += 1
        counts.append(errors[proxy])
        if errors[proxy] > max_proxy_errors:
            removed.add(proxy)
    return counts, removed


class TestProxyPerformance:
    def make_log(self, spark, events):
        rows = [(p, i, ok) for i, (p, ok) in enumerate(events)]
        return spark.createDataFrame(rows, "proxy string, seq long, ok boolean")

    def test_consecutive_error_counts_match_reference_model(self, spark):
        from webscraping_spark.operators import proxies

        import random

        rng = random.Random(42)
        events = [
            (f"p{rng.randrange(4)}", rng.random() < 0.45) for _ in range(200)
        ]
        expected_counts, _ = reference_proxy_model(events, 3)
        got = {
            r["seq"]: r["consec_errors"]
            for r in proxies.consecutive_errors(self.make_log(spark, events)).collect()
        }
        assert [got[i] for i in range(len(events))] == expected_counts

    def test_drop_bad_proxies(self, spark):
        from webscraping_spark.operators import proxies

        events = (
            [("good", True)] * 5
            + [("bad", False)] * 6  # 6 consecutive errors > budget 5
            + [("flaky", False)] * 5  # exactly 5: stays (rule is strict >)
            + [("flaky", True)]
        )
        _, removed = reference_proxy_model(events, 5)
        assert removed == {"bad"}
        log = self.make_log(spark, events)
        rotation = spark.createDataFrame(
            [("good",), ("bad",), ("flaky",)], "proxy string"
        )
        kept = {
            r["proxy"]
            for r in proxies.drop_bad_proxies(rotation, log, max_proxy_errors=5).collect()
        }
        assert kept == {"good", "flaky"}
