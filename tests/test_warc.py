"""WARC sink/source (sources/warc.py): byte-level record format,
deterministic re-write, round-trip through real files (.warc and
.warc.gz), concatenated-gzip-member ingest (the Common Crawl layout),
non-response record skipping, and the distributed plumbing."""

import gzip

import pytest

from webscraping_spark.sources import warc


class TestRecordFormat:
    def test_record_layout_and_determinism(self):
        r1 = warc.format_response_record(
            "http://e.com/a", b"<html>hi</html>", "2024-01-01T00:00:00Z"
        )
        r2 = warc.format_response_record(
            "http://e.com/a", b"<html>hi</html>", "2024-01-01T00:00:00Z"
        )
        assert r1 == r2  # pure function of the row
        assert r1.startswith(b"WARC/1.0\r\n")
        assert b"WARC-Type: response\r\n" in r1
        assert b"WARC-Target-URI: http://e.com/a" in r1
        assert r1.endswith(b"\r\n\r\n")
        head, _, http = r1.partition(b"\r\n\r\n")
        # declared Content-Length covers the full HTTP block
        length = int(
            [l for l in head.split(b"\r\n") if l.startswith(b"Content-Length")][0]
            .split(b":")[1]
        )
        assert length == len(http) - 4  # minus the record trailer

    def test_parse_skips_non_response_records(self):
        info = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n"
            b"robot\r\n\r\n"
        )
        resp = warc.format_response_record(
            "http://e.com/b", b"payload-bytes", "2024-01-01T00:00:00Z",
            status=404, content_type="text/plain",
        )
        rows = warc.parse_warc(info + resp)
        assert rows == [
            ("http://e.com/b", "2024-01-01T00:00:00Z", 404, "text/plain",
             b"payload-bytes")
        ]

    def test_concatenated_gzip_members(self):
        # Common Crawl compresses each record as its own gzip member
        a = warc.format_response_record("http://e.com/1", b"one", "2024-01-01T00:00:00Z")
        b_ = warc.format_response_record("http://e.com/2", b"two", "2024-01-01T00:00:00Z")
        data = gzip.compress(a) + gzip.compress(b_)
        rows = warc.parse_warc(data)
        assert [r[0] for r in rows] == ["http://e.com/1", "http://e.com/2"]
        assert [r[4] for r in rows] == [b"one", b"two"]


class TestRoundTrip:
    @pytest.mark.parametrize("compress", [False, True])
    def test_write_read_roundtrip(self, spark, tmp_path, compress):
        rows = [
            (f"http://w.com/p{i}", f"<html>page {i}</html>", 200 if i % 3 else 404)
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "url string, payload string, status int")
        out = str(tmp_path / ("gz" if compress else "plain"))
        manifest = warc.write_warc(
            df.repartition(4), out, status_col="status", compress=compress
        ).collect()
        assert sum(m["n_records"] for m in manifest) == 40
        assert len(manifest) == 4 and all(m["n_bytes"] > 0 for m in manifest)

        back = warc.read_warc(spark, out).collect()
        got = sorted((r["url"], bytes(r["payload"]).decode(), r["status"]) for r in back)
        assert got == sorted((u, p, s) for u, p, s in rows)
        assert all(r["warc_date"] == "2024-01-01T00:00:00Z" for r in back)
        assert all(r["content_type"] == "text/html" for r in back)

    def test_rewrite_is_byte_identical(self, spark, tmp_path):
        rows = [(f"http://w.com/{i}", f"body{i}") for i in range(8)]
        df = spark.createDataFrame(rows, "url string, payload string").repartition(1)
        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        warc.write_warc(df, d1, compress=False).collect()
        warc.write_warc(df, d2, compress=False).collect()
        f1 = open(d1 + "/part-00000.warc", "rb").read()
        f2 = open(d2 + "/part-00000.warc", "rb").read()
        assert f1 == f2  # no clocks, no rand — archives are reproducible

    def test_binary_payloads_survive(self, spark, tmp_path):
        from webscraping_spark.sources import images
        import numpy as np

        px = images.synth_pixels("deadbeef", 8, 8, 1)
        payload = images.encode_image(px, "png")
        df = spark.createDataFrame(
            [("http://w.com/img.png", bytearray(payload))],
            "url string, payload binary",
        )
        out = str(tmp_path / "bin")
        warc.write_warc(df, out).collect()
        back = warc.read_warc(spark, out).collect()
        assert bytes(back[0]["payload"]) == bytes(payload)
        assert np.array_equal(images.decode_image(bytes(back[0]["payload"]), "png"), px)


class TestWetWat:
    PAGES = [
        ("http://a.com/1",
         "<html><head><title> Page &amp; One </title><style>x{}</style></head>"
         "<body><p>Hello <b>world</b>&nbsp;text</p>"
         "<a href='/x'>x</a><a href=\"http://b.com/y\">y</a>"
         "<script>var a='<p>junk</p>';</script></body></html>"),
        ("http://a.com/2", "<html><body><p>plain</p></body></html>"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.PAGES, "url string, html string")

    def test_wet_records(self, spark):
        from webscraping_spark.sources.warc import wet_records

        rows = {r["url"]: r for r in wet_records(self._df(spark)).collect()}
        assert rows["http://a.com/1"]["text"] == "Page & One Hello world text x y"
        assert rows["http://a.com/2"]["text"] == "plain"
        assert rows["http://a.com/2"]["n_chars"] == 5

    def test_wat_records(self, spark):
        from webscraping_spark.sources.warc import wat_records

        rows = {r["url"]: r for r in wat_records(self._df(spark)).collect()}
        r1 = rows["http://a.com/1"]
        assert r1["title"] == "Page & One"
        assert r1["links"] == ["/x", "http://b.com/y"] and r1["n_links"] == 2
        r2 = rows["http://a.com/2"]
        assert r2["title"] is None and r2["n_links"] == 0

    def test_wet_wat_plan_zero_exchange_zero_python(self, spark):
        from webscraping_spark.sources.warc import wat_records, wet_records

        for out in (wet_records(self._df(spark)), wat_records(self._df(spark))):
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan and "Python" not in plan

    def test_wet_roundtrip(self, spark, tmp_path):
        from webscraping_spark.sources.warc import read_wet, write_wet

        out = str(tmp_path / "wet")
        man = write_wet(self._df(spark).repartition(2), out).collect()
        assert sum(r["n_records"] for r in man) == 2
        back = {r["url"]: r for r in read_wet(spark, out + "/*.gz").collect()}
        assert back["http://a.com/1"]["text"] == "Page & One Hello world text x y"
        assert back["http://a.com/2"]["text"] == "plain"
        assert back["http://a.com/1"]["warc_date"] == "2024-01-01T00:00:00Z"

    def test_wat_file_valid_json(self, spark, tmp_path):
        import gzip as _gz
        import glob
        import json

        from webscraping_spark.sources.warc import write_wat

        out = str(tmp_path / "wat")
        man = write_wat(self._df(spark), out).collect()
        assert sum(r["n_records"] for r in man) == 2
        metas = {}
        for p in glob.glob(out + "/*.gz"):
            data = _gz.decompress(open(p, "rb").read())
            for chunk in data.split(b"\r\n\r\n"):
                if chunk.strip().startswith(b"{"):
                    m = json.loads(chunk.strip())
                    metas[m["url"]] = m
        assert metas["http://a.com/1"]["title"] == "Page & One"
        assert metas["http://a.com/1"]["links"] == ["/x", "http://b.com/y"]
        # absent title is omitted by to_json (NULL field), links empty
        assert metas["http://a.com/2"]["n_links"] == 0

    def test_write_determinism(self, spark, tmp_path):
        from webscraping_spark.sources.warc import write_wet

        outs = []
        for sub in ("w1", "w2"):
            out = str(tmp_path / sub)
            write_wet(self._df(spark).coalesce(1), out, compress=False).collect()
            import glob

            (p,) = glob.glob(out + "/*.warc.wet")
            outs.append(open(p, "rb").read())
        assert outs[0] == outs[1] and len(outs[0]) > 0


class TestRevisitRecords:
    """WARC 1.1 identical-payload-digest revisit dedup
    (sources/warc.write_warc_deduped)."""

    def test_unchanged_pages_become_revisits(self, spark, tmp_path):
        from webscraping_spark.sources import warc

        prior_payloads = {"http://w.com/a": b"<html>same</html>",
                          "http://w.com/b": b"<html>old b</html>"}
        prior = spark.createDataFrame(
            [
                (u, warc.payload_sha1_b32(p), "<urn:uuid:orig-%d>" % i)
                for i, (u, p) in enumerate(sorted(prior_payloads.items()))
            ],
            "url string, payload_digest string, record_id string",
        )
        fetched = spark.createDataFrame(
            [
                ("http://w.com/a", bytearray(b"<html>same</html>")),  # unchanged
                ("http://w.com/b", bytearray(b"<html>NEW b</html>")),  # changed
                ("http://w.com/c", bytearray(b"<html>new page</html>")),  # new
            ],
            "url string, payload binary",
        ).repartition(1)
        out = str(tmp_path / "warc")
        m = warc.write_warc_deduped(fetched, prior, out, compress=False).collect()
        assert len(m) == 1 and m[0]["n_records"] == 3 and m[0]["n_revisits"] == 1
        data = open(m[0]["path"], "rb").read()
        assert data.count(b"WARC-Type: revisit") == 1
        assert data.count(b"WARC-Type: response") == 2
        # the revisit names the original capture and carries no payload
        i = data.index(b"WARC-Type: revisit")
        block = data[i : data.index(b"\r\n\r\n", i)]
        assert b"WARC-Refers-To: <urn:uuid:orig-0>" in block
        assert b"identical-payload-digest" in block
        assert b"Content-Length: 0" in block
        assert b"WARC-Payload-Digest: sha1:" in block
        # changed page b stays a full response (old digest != new payload)
        assert b"<html>NEW b</html>" in data and b"same</html>" not in data.split(
            b"WARC-Type: revisit"
        )[1]

    def test_digest_convention(self):
        import base64
        import hashlib

        from webscraping_spark.sources import warc

        p = b"payload bytes"
        want = "sha1:" + base64.b32encode(hashlib.sha1(p).digest()).decode()
        assert warc.payload_sha1_b32(p) == want
