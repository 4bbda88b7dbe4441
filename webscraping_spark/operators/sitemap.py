"""Sitemap ingestion: unroll sitemap.xml / sitemap-index XML payloads
into frontier seed URLs as one whole-stage-codegen projection + explode.

Reference tie-in: the reference seeds crawls from an explicit URL list
(download.py threaded_get's ``url``/``urls`` arguments) and its robots
handling (download.py:978) uses urllib.robotparser, whose ``site_maps()``
surface is mirrored by ``operators.robots.parse_sitemaps``. This module
is the missing middle of that pipeline at corpus scale: robots.txt
``Sitemap:`` directives (robots.sitemap_table) -> fetch the XML through
the normal fetch stage -> ``expand_sitemaps`` -> depth-0 frontier seeds.

Per sitemaps.org/protocol.html:

- a *urlset* document lists page URLs inside ``<url><loc>...</loc></url>``;
- a *sitemapindex* lists further sitemaps inside
  ``<sitemap><loc>...</loc></sitemap>`` (crawl those, don't visit them);
- ``<loc>`` values are XML entity-escaped (``&amp;`` etc.) and may carry
  surrounding whitespace.

Everything here is JVM expressions in the Java-regex/RE2 shared subset
(the engine's oracle convention): one ``regexp_extract_all`` over the
payload, a literal-replace entity unescape chain, and a ``posexplode``.
Zero Python, zero shuffle — at 100 TB the expansion fuses into the scan
that already reads the fetched XML, and the output inherits the input's
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# <loc> with optional surrounding whitespace inside the element; [^<]*
# keeps the match inside one element (no entity-encoded '<' can appear in
# a conformant value, and a malformed one just truncates that loc).
LOC_PATTERN = r"<loc>\s*([^<\s](?:[^<]*[^<\s])?)\s*</loc>"


def xml_unescape_col(s: Column) -> Column:
    """The five XML 1.0 predefined entities, literal replaces only.

    ``&amp;`` is decoded LAST so ``&amp;lt;`` yields ``&lt;`` (the
    double-escaped form stays text, matching xml.sax.saxutils.unescape) —
    decoding it first would re-scan and corrupt. Numeric character
    references are out of scope for URL payloads (the protocol's own
    examples escape only the five)."""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def sitemap_locs_col(xml: Column) -> Column:
    """All ``<loc>`` values of a sitemap payload, file order, entities
    decoded — ``array<string>`` (empty array for a loc-less payload,
    NULL for a NULL payload). Works identically for urlset and
    sitemapindex documents; route on ``is_sitemap_index_col``."""
    return F.transform(
        F.regexp_extract_all(xml, F.lit(LOC_PATTERN), F.lit(1)),
        xml_unescape_col,
    )


def is_sitemap_index_col(xml: Column) -> Column:
    """True when the payload is a sitemap INDEX (its locs are further
    sitemaps to expand, not pages to visit). Byte scan, no regex: the
    root element tag is unique to the document type."""
    return xml.contains("<sitemapindex")


# one <url>...</url> entry block (urlset documents); non-greedy so
# adjacent entries don't merge
URL_BLOCK_PATTERN = r"(?is)<url>.*?</url>"


def _elem_text(block: Column, tag: str) -> Column:
    """Trimmed, entity-decoded text of a child element; NULL if absent
    or blank."""
    raw = F.regexp_extract(
        block, r"(?is)<" + tag + r">\s*([^<\s](?:[^<]*[^<\s])?)\s*</" + tag + r">", 1
    )
    return F.nullif(xml_unescape_col(raw), F.lit(""))


def sitemap_entries(
    df: DataFrame, xml_col: str = "html", source_col: str = "url"
) -> DataFrame:
    """Full urlset entries: ``(source_col, pos, loc, lastmod, changefreq,
    priority)`` — the metadata ``expand_sitemaps`` discards but the
    recrawl scheduler (operators/recrawl.py) wants: ``lastmod`` seeds
    the change history, ``changefreq``/``priority`` are the publisher's
    own revisit hints (sitemaps.org/protocol.html; all three optional
    per the spec -> NULL). ``priority`` stays a STRING — the protocol
    says 0.0-1.0 but the wild disagrees, and parsing policy belongs to
    the consumer. Entries without a ``<loc>`` are dropped (not a valid
    entry). One projection + posexplode: zero shuffle, zero Python."""
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(URL_BLOCK_PATTERN), F.lit(0)
    )
    out = df.select(
        F.col(source_col),
        F.posexplode(blocks).alias("pos", "b"),
    )
    b = F.col("b")
    return out.select(
        source_col,
        "pos",
        _elem_text(b, "loc").alias("loc"),
        _elem_text(b, "lastmod").alias("lastmod"),
        _elem_text(b, "changefreq").alias("changefreq"),
        _elem_text(b, "priority").alias("priority"),
    ).filter(F.col("loc").isNotNull())


def expand_sitemaps(
    df: DataFrame,
    xml_col: str = "html",
    source_col: str = "url",
    out_col: str = "link",
) -> DataFrame:
    """Unroll each fetched sitemap payload into one row per ``<loc>``:

    ``(source_col, out_col, pos, is_index)`` where ``pos`` is the loc's
    file position (sitemaps are ordered; a frontier that seeds in pos
    order reproduces the publisher's intended priority) and ``is_index``
    flags rows whose URL is itself a sitemap to fetch-and-expand (the
    caller loops: indexes go back through fetch -> expand, pages go to
    the frontier at depth 0).

    One projection + posexplode: no shuffle, no Python; the relative-URL
    case does not arise (the protocol requires absolute URLs) so the
    output feeds ``canonicalize_split`` like any extracted link batch.
    """
    xml = F.col(xml_col)
    return (
        df.select(
            F.col(source_col),
            F.posexplode(sitemap_locs_col(xml)).alias("pos", out_col),
            is_sitemap_index_col(xml).alias("is_index"),
        )
        .select(source_col, out_col, "pos", "is_index")
    )


def robots_sitemap_urls_col(body: Column) -> Column:
    """``array<string>`` of Sitemap: directive URLs in a raw robots.txt
    body, file order — the columnar twin of robots.parse_sitemaps /
    sitemap_table (those build a driver-side table from a dict; this one
    stays in the scan for a robots-payload DataFrame at corpus scale).
    Case-insensitive per REP; the value is the rest of the line."""
    return F.regexp_extract_all(
        body, F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), F.lit(1)
    )


def discover_new_urls(
    robots_pages: DataFrame,
    xml_store: DataFrame,
    seen_urls: DataFrame | None = None,
    robots_url_col: str = "url",
    robots_body_col: str = "html",
    store_url_col: str = "url",
    store_xml_col: str = "html",
) -> DataFrame:
    """The sitemap discovery pipeline as ONE composition: robots.txt
    bodies -> ``Sitemap:`` URLs -> join against the fetched-XML store ->
    ``sitemap_entries`` expansion -> anti-join against the seen set ->
    ``(domain, sitemap_url, loc, lastmod, changefreq, priority)``
    frontier candidates. This is how a real crawl bootstraps a host:
    robots gives the sitemap, the sitemap gives the URLs and the
    publisher's own lastmod/changefreq revisit hints (feed them to
    operators/recrawl.py), and only unseen locs reach the frontier.

    Shapes: the Sitemap-URL extraction fuses into the robots scan; the
    store join is url-keyed (bucketed stores co-locate); the expansion is
    the zero-shuffle posexplode; the seen filter is the same left-anti
    join as the frontier's unseen gate. Canonicalize the locs downstream
    exactly like any extracted link batch."""
    from webscraping_spark.functions.udfs import get_domain_col

    sms = robots_pages.select(
        get_domain_col(F.col(robots_url_col)).alias("domain"),
        F.explode(robots_sitemap_urls_col(F.col(robots_body_col))).alias(
            "sitemap_url"
        ),
    )
    fetched = sms.join(
        xml_store.select(
            F.col(store_url_col).alias("sitemap_url"),
            F.col(store_xml_col).alias("_xml"),
        ),
        "sitemap_url",
    )
    entries = sitemap_entries(fetched, xml_col="_xml", source_col="sitemap_url")
    out = fetched.select("domain", "sitemap_url").distinct().join(
        entries, "sitemap_url"
    )
    if seen_urls is not None:
        out = out.join(
            seen_urls.select(F.col("url").alias("loc")), "loc", "left_anti"
        )
    return out.select(
        "domain", "sitemap_url", "loc", "lastmod", "changefreq", "priority"
    )
