"""Main-content extraction (operators/content.py): block segmentation,
link/stopword density classification, the near-good neighbor rule, and
the zero-shuffle/zero-Python plan shape."""

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators.content import (
    classify_blocks,
    extract_main_content,
)

# a paragraph that is unambiguously "good": >= 80 chars, prose-dense
GOOD = (
    "The crawl engine stores the fetched page in a partitioned table and "
    "the scheduler plans a visit for each of the pending domains."
)
GOOD2 = (
    "It is a fact that the corpus is built in the open and that the "
    "pipeline keeps a record of the origin of each of the documents."
)
SHORT = "A small note on the side."  # >= 20 chars, prose — near-good only


def page(body: str) -> str:
    return (
        "<html><head><title>t</title><style>p{color:red}</style></head>"
        "<body><header><h1>Site</h1></header><nav><a href='/a'>Home</a>"
        "<a href='/b'>About</a></nav>" + body +
        "<footer>Copyright &copy; nav</footer><script>var x=1;</script>"
        "</body></html>"
    )


def _rows(spark, html):
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    return {r["block_idx"]: r for r in classify_blocks(df).collect()}


def _main(spark, html):
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    return extract_main_content(df).collect()[0]


def test_boilerplate_containers_removed(spark):
    r = _main(spark, page(f"<p>{GOOD}</p>"))
    assert r["main_text"] == GOOD
    assert r["n_kept"] == 1
    # header/nav/footer/script/style/head text all gone
    assert "Home" not in r["main_text"]
    assert "Copyright" not in r["main_text"]
    assert "color:red" not in r["main_text"]
    assert "Site" not in r["main_text"]


def test_link_farm_block_dropped(spark):
    links = "".join(
        f"<a href='/l{i}'>the link to the page number {i} of all</a> "
        for i in range(8)
    )
    r = _main(spark, page(f"<p>{GOOD}</p><div>{links}</div>"))
    assert r["main_text"] == GOOD
    assert r["n_blocks"] == 2 and r["n_kept"] == 1


def test_near_good_kept_only_next_to_good(spark):
    # adjacent to a good paragraph -> kept (jusText near-good rule)
    r = _main(spark, page(f"<p>{GOOD}</p><p>{SHORT}</p>"))
    assert r["main_text"] == GOOD + "\n" + SHORT
    # isolated (no good neighbor) -> dropped
    r2 = _main(spark, page(f"<p>{SHORT}</p>"))
    assert r2["main_text"] == "" and r2["n_kept"] == 0 and r2["n_blocks"] == 1


def test_near_good_chain_does_not_propagate(spark):
    # near-good next to a *near-good* (not good) block stays dropped:
    # the context pass is single-step, not a fixpoint
    r = _main(spark, page(f"<p>{SHORT}</p><p>{SHORT}</p>"))
    assert r["main_text"] == "" and r["n_kept"] == 0


def test_stopword_gate_rejects_keyword_stuffing(spark):
    stuffed = " ".join(f"keyword{i} buy cheap best price deal" for i in range(6))
    assert len(stuffed) >= 80
    rows = _rows(spark, page(f"<p>{stuffed}</p>"))
    (b,) = rows.values()
    assert not b["good"] and b["stop_hits"] == 0
    # but prose of the same length passes
    rows2 = _rows(spark, page(f"<p>{GOOD}</p>"))
    assert next(iter(rows2.values()))["good"]


def test_block_signals_exact(spark):
    body = f"<p>{GOOD}</p><div><a href='/x'>tiny link</a> plus the text</div>"
    rows = _rows(spark, page(body))
    assert rows[0]["text"] == GOOD
    assert rows[0]["text_len"] == len(GOOD)
    assert rows[0]["link_chars"] == 0
    assert rows[0]["n_words"] == len(GOOD.split())
    assert rows[1]["text"] == "tiny link plus the text"
    assert rows[1]["link_chars"] == len("tiny link")


def test_entities_and_inline_tags(spark):
    body = "<p>Text &amp; <b>bold</b>&nbsp;words of the night that ran on past the edge of the town and kept going</p>"
    rows = _rows(spark, page(body))
    (b,) = rows.values()
    assert b["text"].startswith("Text & bold words")


def test_empty_segments_do_not_break_adjacency(spark):
    # </p><p> boundaries create empty split segments; compaction must
    # keep GOOD and SHORT adjacent for the near-good rule
    body = f"<div><p>{GOOD}</p></div><div><p>{SHORT}</p></div>"
    r = _main(spark, page(body))
    assert r["main_text"] == GOOD + "\n" + SHORT


def test_all_chrome_page_yields_empty(spark):
    r = _main(spark, page(""))
    assert r["main_text"] == "" and r["n_blocks"] == 0 and r["n_kept"] == 0
    assert r["content_chars"] == 0


def test_plan_zero_exchange_zero_python(spark):
    df = spark.createDataFrame([("u", page(f"<p>{GOOD}</p>"))], "url string, html string")
    for out in (extract_main_content(df), classify_blocks(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "ArrowEval" not in plan
