"""Page-level crawl directives: meta robots noindex/nofollow, per-anchor
``rel=nofollow``, and ``<link rel=canonical>`` — the in-page complement
to robots.txt that production crawlers honor (documented Google/Bing
semantics: robots.txt gates FETCHING, meta robots gates indexing and
link following, canonical declares the preferred duplicate).

Reference anchor: the reference extracts links with a bare ``<a href>``
findall (download.py:1033-1034) and has no page-directive layer. At
corpus scale, skipping nofollow edges and folding canonical duplicates
is a first-class curation concern, so the engine adds it as pure-codegen
projections in the Java/RE2 shared regex subset — zero shuffle, zero
Python, fusing into any stage that already scans the HTML. Only
``canonical_clusters`` shuffles (one hash partitioning on the canonical
target — the grouping is the point of the operator).

Semantics notes (kept deliberately boring and documented):
- Directive tokens are matched per the robots-meta spec: comma/space
  separated, case-insensitive; ``none`` ≡ ``noindex, nofollow``.
- Attribute order is free in HTML, so every extraction tries both
  (name-before-content and content-before-name) and coalesces.
- ``noindex`` does NOT stop crawling (the page was already fetched and
  its links may be followed); it flags the page out of the *index/
  corpus*. ``nofollow`` (page-level or per-anchor) gates frontier
  pushes. This is the standard split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from webscraping_spark.functions import udfs

# content attribute of <meta name="robots" ...>, either attribute order
_META_A = "(?i)<meta\\b[^>]*name=[\"']robots[\"'][^>]*content=[\"']([^\"']*)[\"']"
_META_B = "(?i)<meta\\b[^>]*content=[\"']([^\"']*)[\"'][^>]*name=[\"']robots[\"']"
# href of <link rel="canonical" ...>, either attribute order
_CANON_A = "(?i)<link\\b[^>]*rel=[\"']canonical[\"'][^>]*href=[\"']([^\"']*)[\"']"
_CANON_B = "(?i)<link\\b[^>]*href=[\"']([^\"']*)[\"'][^>]*rel=[\"']canonical[\"']"
# whole <a ...href...> tag span (same anchor set as udfs.find_links_col:
# href required), extended to the tag end so rel= after href is visible
_A_TAG = "(?i)<a[^>]+href=[\"'][^\"']*[\"'][^>]*"
_A_HREF = "(?i)href=[\"']([^\"']*)[\"']"
_A_NOFOLLOW = "(?i)rel=[\"'][^\"']*nofollow[^\"']*[\"']"


def _meta_robots_content(html: Column) -> Column:
    a = F.regexp_extract(html, _META_A, 1)
    b = F.regexp_extract(html, _META_B, 1)
    return F.when(a != "", a).otherwise(b)


def _has_token(content: Column, token: str) -> Column:
    """Spec token match: comma/space separated, case-insensitive;
    ``none`` implies both noindex and nofollow."""
    pat = "(?i)(^|[ \\t,])(%s|none)([ \\t,]|$)" % token
    return content.rlike(pat)


def noindex_col(html: Column) -> Column:
    return _has_token(_meta_robots_content(html), "noindex")


def nofollow_page_col(html: Column) -> Column:
    return _has_token(_meta_robots_content(html), "nofollow")


def canonical_href_col(html: Column) -> Column:
    """Raw canonical href, NULL when absent."""
    a = F.regexp_extract(html, _CANON_A, 1)
    b = F.regexp_extract(html, _CANON_B, 1)
    raw = F.when(a != "", a).otherwise(b)
    return F.when(raw != "", raw)


def base_href_col(html: Column) -> Column:
    """href of the page's FIRST ``<base>`` tag (the HTML spec honors only
    the first), NULL when absent or href-less — all three attribute quote
    styles via harvest's shared extractor. Consumed by
    ``CrawlConfig.honor_base_href``: the crawl resolves the (possibly
    relative) value against serve_base with the same canonicalize kernel
    links use, then relative links resolve against the result."""
    from webscraping_spark.operators.harvest import _attr_col

    tag = F.regexp_extract(html, r"(?is)<base\b[^>]*>", 0)
    return F.nullif(
        F.coalesce(_attr_col(tag, "href"), F.lit("")), F.lit("")
    )


def anchor_tags_col(html: Column) -> Column:
    """ARRAY<STRING> of whole ``<a ... href=...>`` tag spans in document
    order — the same anchor set (href required) and order as
    ``udfs.find_links_col``, but with the rel attribute visible."""
    return F.regexp_extract_all(html, F.lit(_A_TAG), F.lit(0))


def extract_directives(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, noindex, nofollow, canonical_raw, canonical) — one codegen
    projection; ``canonical`` is the raw href absolutized + normalized
    against the page URL through the engine's tiered canonicalizer (the
    same kernel the frontier uses, so canonical targets and crawled URLs
    live in one key space)."""
    out = pages.select(
        F.col(url_col).alias("url"),
        noindex_col(F.col(html_col)).alias("noindex"),
        nofollow_page_col(F.col(html_col)).alias("nofollow"),
        canonical_href_col(F.col(html_col)).alias("canonical_raw"),
    )
    out = udfs.canonicalize_split(out, "url", "canonical_raw", "canonical", compact=True)
    return out.withColumn(
        "canonical", F.when(F.col("canonical_raw").isNotNull(), F.col("canonical"))
    )


def followable_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, pos, raw) anchor hrefs in document order, EXCLUDING edges a
    crawler must not follow: per-anchor ``rel=nofollow`` and every link
    of a page whose meta robots says nofollow/none.

    ``pos`` is the position in the FULL anchor list (identical numbering
    to the ungated extraction), so per-page link caps and ordered-dedup
    semantics are unchanged by the gate — a gated link consumes its
    position, exactly as a media-extension-gated link does downstream.
    """
    tags = pages.select(
        F.col(url_col).alias("url"),
        nofollow_page_col(F.col(html_col)).alias("_page_nofollow"),
        F.posexplode(anchor_tags_col(F.col(html_col))).alias("pos", "_tag"),
    )
    return (
        tags.filter(
            ~F.col("_page_nofollow") & ~F.col("_tag").rlike(_A_NOFOLLOW)
        )
        .select("url", "pos", F.regexp_extract(F.col("_tag"), _A_HREF, 1).alias("raw"))
    )


def canonical_clusters(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Canonical-URL dedup: (url, canonical_target, is_rep). Pages
    declaring a canonical fold onto it; pages without one stand alone
    (target = own URL). The representative of each target group is its
    minimum URL — deterministic without requiring the target page itself
    to be in the batch. One hash partitioning on the target (map-side
    combinable min), no second shuffle: the window reuses the exchange."""
    d = extract_directives(pages, html_col=html_col, url_col=url_col)
    d = d.withColumn("canonical_target", F.coalesce(F.col("canonical"), F.col("url")))
    w = Window.partitionBy("canonical_target")
    return d.select(
        "url",
        "canonical_target",
        (F.col("url") == F.min("url").over(w)).alias("is_rep"),
    )
