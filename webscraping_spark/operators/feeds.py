"""RSS 2.0 / Atom feed ingestion — the other standing discovery source
next to sitemaps: a feed lists a site's NEWEST urls with publish times,
which is exactly what the recrawl scheduler (operators/recrawl.py) wants
for fast-churn hosts, and what news-crawl pipelines poll instead of
re-walking the site. The reference has no feed support at all; its
discovery is link extraction only (download.py:1033).

Same construction discipline as operators/sitemap.py: JVM expressions in
the Java-regex/RE2 shared subset, one ``regexp_extract_all`` per payload,
the literal-replace entity unescape chain, a ``posexplode`` — zero
Python, zero shuffle, the expansion fuses into the scan that already
reads the fetched XML.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webscraping_spark.operators.sitemap import xml_unescape_col

RSS_ITEM_PATTERN = r"(?is)<item[\s>].*?</item>|<item/>"
ATOM_ENTRY_PATTERN = r"(?is)<entry[\s>].*?</entry>"


def is_feed_col(xml: Column) -> Column:
    """True when the payload looks like an RSS or Atom feed (root-element
    sniff, the counterpart of sitemap.is_sitemap_index_col)."""
    return xml.rlike(r"(?is)<(rss[\s>]|feed[\s>][^>]*Atom|feed\s*>)")


def _elem(b: Column, tag: str) -> Column:
    raw = F.regexp_extract(
        b, r"(?is)<" + tag + r"(?:\s[^>]*)?>\s*(.*?)\s*</" + tag + r">", 1
    )
    return F.nullif(xml_unescape_col(raw), F.lit(""))


def feed_entries(
    df: DataFrame, xml_col: str = "html", source_col: str = "url"
) -> DataFrame:
    """One row per feed item: ``(source_col, pos, feed_type, link, title,
    published)``.

    - RSS 2.0: ``<item>`` blocks; link = ``<link>`` element text,
      published = ``<pubDate>``.
    - Atom: ``<entry>`` blocks; link = the ``href`` attribute of the
      FIRST ``<link>`` whose ``rel`` is absent or ``alternate`` (the spec
      default), published = ``<published>`` falling back to
      ``<updated>``.

    Both forms parse from one pass (the two block patterns concatenate
    into a single ``regexp_extract_all``); a page holding both kinds of
    blocks yields both, each labeled. Entries without a link are dropped
    (not a fetchable discovery). Timestamps stay STRINGS — RFC 822 vs
    RFC 3339 parsing policy belongs to the consumer (the Retry-After
    parser in operators/revalidate.py shows the engine's date-parse
    device when needed)."""
    xml = F.col(xml_col)
    blocks = F.regexp_extract_all(
        xml, F.lit(RSS_ITEM_PATTERN + "|" + ATOM_ENTRY_PATTERN), F.lit(0)
    )
    out = df.select(F.col(source_col), F.posexplode(blocks).alias("pos", "b"))
    b = F.col("b")
    is_rss = b.rlike(r"(?is)^<item[\s>/]")
    atom_links = F.regexp_extract_all(
        b, F.lit(r"(?is)<link\b[^>]*>"), F.lit(0)
    )
    alt = F.try_element_at(
        F.filter(
            atom_links,
            lambda t: ~t.rlike(r"(?is)\srel\s*=") | t.rlike(
                r"""(?is)\srel\s*=\s*["']?alternate"""
            ),
        ),
        F.lit(1),
    )
    # regexp_extract yields '' (not NULL) on no-match: nullif each quote
    # branch BEFORE coalescing or the double-quote miss shadows the
    # single-quote hit
    atom_href = F.nullif(
        xml_unescape_col(
            F.coalesce(
                F.nullif(
                    F.regexp_extract(alt, r'(?i)\shref\s*=\s*"([^"]*)"', 1),
                    F.lit(""),
                ),
                F.nullif(
                    F.regexp_extract(alt, r"(?i)\shref\s*=\s*'([^']*)'", 1),
                    F.lit(""),
                ),
            )
        ),
        F.lit(""),
    )
    link = F.when(is_rss, _elem(b, "link")).otherwise(atom_href)
    published = F.when(is_rss, _elem(b, "pubDate")).otherwise(
        F.coalesce(_elem(b, "published"), _elem(b, "updated"))
    )
    return out.select(
        source_col,
        "pos",
        F.when(is_rss, F.lit("rss")).otherwise(F.lit("atom")).alias("feed_type"),
        link.alias("link"),
        _elem(b, "title").alias("title"),
        published.alias("published"),
    ).filter(F.col("link").isNotNull())
