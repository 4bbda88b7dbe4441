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


class TestUserAgents:
    def test_deterministic_and_from_pool(self):
        a1 = agent_for("http://x.com/page")
        assert a1 == agent_for("http://x.com/page")
        assert a1 in _UA_TEMPLATES

    def test_spreads_over_pool(self):
        got = {agent_for(f"http://host{i}.com/") for i in range(200)}
        assert len(got) > len(_UA_TEMPLATES) // 2
