"""Small-source / utility coverage: file list source (common.py:524-532),
deterministic user agents, and the list-sink round trip."""

import pytest
from pyspark.sql import functions as F

from webscraping_spark.functions.extract import _UA_TEMPLATES, agent_for
from webscraping_spark.operators.sinks import read_list, unique_rows


class TestReadList:
    def test_lines_round_trip(self, spark, tmp_path):
        p = tmp_path / "seeds.txt"
        p.write_text("http://a.com/\nhttp://b.com/x\n\nhttp://c.com/\n")
        got = [r["value"] for r in read_list(spark, str(p)).collect()]
        # reference read_list keeps blank lines (splitlines keeps empties
        # between content); set equality over the non-empty seeds is the
        # crawl-facing contract
        assert [v for v in got if v] == [
            "http://a.com/",
            "http://b.com/x",
            "http://c.com/",
        ]

    def test_as_frontier_seed_source(self, spark, tmp_path):
        p = tmp_path / "seeds.txt"
        p.write_text("http://a.com/\nhttp://a.com/\nhttp://b.com/\n")
        seeds = (
            read_list(spark, str(p))
            .filter(F.col("value") != "")
            .select(F.col("value").alias("url"))
        )
        assert unique_rows(seeds, ["url"]).count() == 2


class TestUnicodeWriterExtras:
    """UnicodeWriter BOM / append / auto_repair parity
    (common.py:564-606)."""

    SCHEMA = "k string, v int"

    def test_utf8_bom_on_every_part(self, spark, tmp_path):
        from webscraping_spark.operators.sinks import write_unique_csv

        out = str(tmp_path / "bom_out")
        df = spark.createDataFrame([("a", 1), ("b", 2)], self.SCHEMA).repartition(2)
        write_unique_csv(df, out, header=True, utf8_bom=True)
        import glob

        parts = sorted(glob.glob(out + "/part-*"))
        assert parts
        for p in parts:
            assert open(p, "rb").read()[:3] == b"\xef\xbb\xbf"
        back = spark.read.schema(self.SCHEMA).option("header", "true").csv(out)
        assert {(r["k"], r["v"]) for r in back.collect()} == {("a", 1), ("b", 2)}

    def test_append_dedups_against_existing_file(self, spark, tmp_path):
        """Constructor pre-seeds the seen set from the existing file
        (common.py:580-582): appended rows with an on-disk key are dropped,
        keeping the on-disk occurrence."""
        from webscraping_spark.operators.sinks import write_unique_csv

        out = str(tmp_path / "append_out")
        first = spark.createDataFrame([("a", 1), ("b", 2)], self.SCHEMA)
        write_unique_csv(first, out, unique_by=["k"], header=False)
        second = spark.createDataFrame([("b", 99), ("c", 3)], self.SCHEMA)
        write_unique_csv(second, out, unique_by=["k"], header=False, mode="append")
        back = spark.read.schema(self.SCHEMA).csv(out)
        got = {(r["k"], r["v"]) for r in back.collect()}
        # 'b' keeps the on-disk value 2, not the appended 99
        assert got == {("a", 1), ("b", 2), ("c", 3)}

    def test_auto_repair_drops_malformed_rows(self, spark, tmp_path):
        from webscraping_spark.operators.sinks import repair_csv, write_unique_csv

        out = tmp_path / "repair_out"
        out.mkdir()
        (out / "part-00000.csv").write_text("a,1\nbroken-row\nb,2\nc,notint\n")
        repair_csv(spark, str(out), self.SCHEMA, header=False)
        back = spark.read.schema(self.SCHEMA).csv(str(out))
        assert {(r["k"], r["v"]) for r in back.collect()} == {("a", 1), ("b", 2)}
        # and via the writer's append path
        more = spark.createDataFrame([("d", 4)], self.SCHEMA)
        (out / "late-bad.csv").write_text("oops\n")
        write_unique_csv(
            more, str(out), unique_by=["k"], header=False, mode="append",
            auto_repair=True,
        )
        back = spark.read.schema(self.SCHEMA).csv(str(out))
        assert {(r["k"], r["v"]) for r in back.collect()} == {
            ("a", 1), ("b", 2), ("d", 4),
        }


    def test_bom_headerless_append_dedup_roundtrip(self, spark, tmp_path):
        """ADVICE r3: with utf8_bom=True and header=False the BOM used to
        leak into the first field of each part's first record on append
        reads — that row's dedup key never matched and auto_repair's
        DROPMALFORMED deleted it. Reads now strip the BOM first; the write
        re-stamps it."""
        from webscraping_spark.operators.sinks import write_unique_csv

        out = str(tmp_path / "bom_append_out")
        first = spark.createDataFrame([("a", 1), ("b", 2)], self.SCHEMA)
        write_unique_csv(
            first, out, unique_by=["k"], header=False, utf8_bom=True
        )
        second = spark.createDataFrame([("a", 99), ("c", 3)], self.SCHEMA)
        write_unique_csv(
            second, out, unique_by=["k"], header=False, mode="append",
            utf8_bom=True, auto_repair=True,
        )
        import glob

        parts = sorted(glob.glob(out + "/part-*"))
        assert parts and all(
            open(p, "rb").read()[:3] == b"\xef\xbb\xbf" for p in parts
        )
        # read back through the engine's BOM-aware reader (a plain
        # headerless spark.read would re-manifest the BOM-in-first-field)
        from webscraping_spark.operators.sinks import _read_existing_csv

        back = _read_existing_csv(spark, out, self.SCHEMA, header=False)
        got = {(r["k"], r["v"]) for r in back.collect()}
        # 'a' keeps the on-disk value 1 (its key MATCHED despite the BOM)
        # and no row was repair-dropped
        assert got == {("a", 1), ("b", 2), ("c", 3)}


class TestUserAgents:
    def test_deterministic_and_from_pool(self):
        a1 = agent_for("http://x.com/page")
        assert a1 == agent_for("http://x.com/page")
        assert a1 in _UA_TEMPLATES

    def test_spreads_over_pool(self):
        got = {agent_for(f"http://host{i}.com/") for i in range(200)}
        assert len(got) > len(_UA_TEMPLATES) // 2
