"""Image-caption pair harvesting from crawled HTML.

Reference tie-in: the reference extracts links from fetched pages with
regexes (download.py:1033-1034 ``get_links``; xpath.py:515-555) and saves
media bytes one file at a time via ``Download.save_as``
(download.py:596-616) — it carries images as opaque URLs/bytes and has no
notion of pairing an image with the text that describes it. At corpus
scale that pairing IS the product: LAION-5B and DataComp were built
exactly this way — parse Common Crawl HTML, emit (img src, alt text)
candidate pairs, then curate (``multimodal.image_caption_filter``). This
module is the extraction stage the engine was missing between ``fetch``
and the pair-curation pipeline: fetched HTML -> one row per ``<img>``
occurrence with every caption signal the page offers.

Caption signals, in the priority order the curation literature uses:

- ``alt``         — the LAION caption source. Missing attribute -> NULL;
                    ``alt=""`` (the a11y "decorative image" marker) ->
                    empty string, so curation can distinguish "author
                    said nothing" from "author said this is decoration".
- ``figcaption``  — inner text of the ``<figcaption>`` of the *enclosing*
                    ``<figure>`` block, tags stripped, entities decoded,
                    whitespace collapsed. The association is containment:
                    the img tag's exact text is searched in the page's
                    figure blocks (a per-row array probe — no join).
- ``title``       — the tooltip attribute, last resort.
- ``caption``     — convenience coalesce of the above (first non-blank).

Also extracted: ``srcset_best`` — the candidate with the numerically
largest width/density descriptor (``640w`` / ``2x``; bare candidates
count as 1), the pair-table build's "fetch the largest rendition" rule.
Descriptors of different units compare by raw number — a documented
deterministic contract (true resolution needs viewport context no batch
job has).

``fetchable`` gates the rows a frontier should fetch: non-empty ``src``
that is not a ``data:`` URI and not a bare fragment. Relative ``src``
values are emitted verbatim — the output feeds the same
``canonicalize_split(base=page_url)`` tier as any extracted link batch
(functions/udfs.py), exactly like anchors do in the crawl plan.

Everything is JVM expressions in the Java-regex/RE2 shared subset (the
engine's oracle convention): ``regexp_extract_all`` for img tags and
figure blocks, per-tag attribute extraction inside ``transform``
lambdas, figcaption association via a higher-order ``filter`` over the
page's figure-block array. Zero Python, zero shuffle — at 100 TB the
harvest fuses into the scan that already reads the fetched page, and a
billion-page corpus harvests with no exchange at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webscraping_spark.operators.sitemap import xml_unescape_col

# (?i): real pages mix <img>/<IMG>. [^>]*: attributes cannot contain a
# raw '>' outside quotes in practice; a quoted '>' truncates that tag —
# the same documented regex-subset semantics as the reference's own
# regex link extractor (download.py:1033).
IMG_TAG_PATTERN = r"(?i)<img\b[^>]*>"
# (?s) so a figure spanning lines matches; non-greedy so adjacent
# figures don't merge into one block.
FIGURE_PATTERN = r"(?is)<figure\b.*?</figure>"
FIGCAPTION_PATTERN = r"(?is)<figcaption\b[^>]*>(.*?)</figcaption>"


def _attr_col(tag: Column, name: str) -> Column:
    """Value of attribute ``name`` in an element tag string.

    Missing attribute -> NULL; present-but-empty -> ''. Handles the
    three HTML attribute forms: double-quoted, single-quoted, unquoted
    (HTML5). The mandatory whitespace before the name keeps
    ``data-alt=`` from matching ``alt=`` (word boundaries alone would
    not: '-' to 'a' is a boundary)."""
    dq = F.regexp_extract(tag, r'(?i)\s' + name + r'\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(tag, r"(?i)\s" + name + r"\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract(tag, r"(?i)\s" + name + r"\s*=\s*([^\s\"'>]+)", 1)
    present = tag.rlike(r"(?i)\s" + name + r"\s*=")
    val = F.coalesce(
        F.nullif(dq, F.lit("")), F.nullif(sq, F.lit("")), F.nullif(uq, F.lit(""))
    )
    return F.when(present, F.coalesce(val, F.lit(""))).otherwise(F.lit(None))


def clean_text_col(t: Column) -> Column:
    """Element inner text -> caption text: tags stripped, ``&nbsp;`` and
    the five XML entities decoded (amp last — sitemap.xml_unescape_col's
    device, so double-escaped entities stay text), whitespace collapsed.
    Blank -> NULL."""
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    t = xml_unescape_col(F.replace(t, F.lit("&nbsp;"), F.lit(" ")))
    return F.nullif(F.trim(F.regexp_replace(t, r"\s+", " ")), F.lit(""))


def srcset_best_col(srcset: Column) -> Column:
    """URL of the srcset candidate with the largest descriptor.

    Candidates split on ','; each is ``url [number(w|x)]``; missing
    descriptor counts as 1. Max by (descriptor, url) struct comparison —
    deterministic under ties. NULL/blank srcset -> NULL."""

    def cand(c: Column) -> Column:
        c = F.trim(c)
        url = F.try_element_at(F.split(c, r"\s+"), F.lit(1))
        d = F.regexp_extract(c, r"(\d+)\s*[wx]\s*$", 1)
        return F.struct(
            F.when(d == "", F.lit(1)).otherwise(d.cast("int")).alias("d"),
            url.alias("u"),
        )

    best = F.array_max(F.transform(F.split(srcset, ","), cand))
    return F.nullif(best["u"], F.lit(""))


def image_pairs_col(html: Column) -> Column:
    """``array<struct<src,srcset_best,alt,title,figcaption>>`` — one
    element per ``<img>`` occurrence, page order. The figcaption is
    found by probing the page's figure-block array for the block
    containing this exact img tag text — a per-row higher-order
    ``filter``, no join, no shuffle."""
    figs = F.regexp_extract_all(html, F.lit(FIGURE_PATTERN), F.lit(0))

    def per_tag(tag: Column) -> Column:
        # try_: the filtered array is empty for an img outside any figure
        # (ANSI element_at throws on empty arrays)
        fig = F.try_element_at(F.filter(figs, lambda b: b.contains(tag)), F.lit(1))
        figcap = clean_text_col(F.regexp_extract(fig, FIGCAPTION_PATTERN, 1))
        return F.struct(
            _attr_col(tag, "src").alias("src"),
            srcset_best_col(_attr_col(tag, "srcset")).alias("srcset_best"),
            _attr_col(tag, "alt").alias("alt"),
            _attr_col(tag, "title").alias("title"),
            figcap.alias("figcaption"),
        )

    return F.transform(
        F.regexp_extract_all(html, F.lit(IMG_TAG_PATTERN), F.lit(0)), per_tag
    )


# whole <a>...</a> ELEMENT (open tag through first close): anchor-text
# extraction needs the inner text, unlike directives._A_TAG (attrs only)
# and udfs.find_links_col (hrefs only). An unterminated <a> never matches
# (no close tag) and a nested <a> truncates at the first </a> — the same
# documented regex-subset semantics as the reference's own extractors.
ANCHOR_ELEMENT_PATTERN = r"(?is)<a\b[^>]*>.*?</a>"
# spec token match within a rel value: comma/space separated, any case
_REL_NOFOLLOW_TOKEN = r"(?i)(^|[ \t,])nofollow([ \t,]|$)"


def anchor_texts_col(html: Column) -> Column:
    """``array<struct<href,rel,text>>`` — one element per closed ``<a>``
    element, page order: href/rel via the shared three-quote-form
    attribute extractor, inner text tag-stripped + entity-decoded +
    whitespace-collapsed (blank -> NULL, e.g. an image-only anchor)."""

    def per(a: Column) -> Column:
        tag = F.regexp_extract(a, r"(?is)^(<a\b[^>]*>)", 1)
        inner = F.regexp_extract(a, r"(?is)^<a\b[^>]*>(.*)</a>$", 1)
        return F.struct(
            _attr_col(tag, "href").alias("href"),
            _attr_col(tag, "rel").alias("rel"),
            clean_text_col(inner).alias("text"),
        )

    return F.transform(
        F.regexp_extract_all(html, F.lit(ANCHOR_ELEMENT_PATTERN), F.lit(0)), per
    )


def harvest_anchor_texts(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Fetched pages -> the anchor-text table: ``(page_url, pos, href,
    anchor_text, rel, nofollow)``, one row per closed anchor element in
    page order. The signal every production ranker builds from the link
    graph (anchor text describes the TARGET page better than the target
    itself — the classic search-engine observation) and the companion
    the engine's PageRank (operators/graph.py) and BM25
    (operators/search.py) consume: canonicalize ``href`` against
    ``page_url`` with the same ``canonicalize_split`` tier as any link
    batch, group by target, and the collected texts are the target's
    anchor field. ``nofollow`` applies the robots-meta token grammar to
    the rel value (directives.py semantics) so graph builds can drop
    non-endorsement edges. One projection + posexplode: zero shuffle,
    zero Python."""
    out = df.select(
        F.col(url_col).alias("page_url"),
        F.posexplode(anchor_texts_col(F.col(html_col))).alias("pos", "a"),
    )
    a = F.col("a")
    return out.select(
        "page_url",
        "pos",
        a["href"].alias("href"),
        a["text"].alias("anchor_text"),
        a["rel"].alias("rel"),
        F.coalesce(a["rel"].rlike(_REL_NOFOLLOW_TOKEN), F.lit(False)).alias(
            "nofollow"
        ),
    )


def anchor_field(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_texts: int = 100,
    drop_nofollow: bool = True,
) -> DataFrame:
    """Inbound anchor-text field per TARGET url: ``(target, n_anchors,
    anchor_field)`` — the classic ranking signal (anchor text describes
    the target better than the target itself) in the shape
    operators/search.py's BM25 indexes as a document field and
    operators/graph.py's PageRank can personalize on.

    Pipeline: ``harvest_anchor_texts`` -> nofollow/NULL-text gate ->
    ``canonicalize_split(base=page_url)`` (targets land in the same key
    space as crawled URLs) -> a salted PRE-TRUNCATION -> ONE target-keyed
    aggregation collecting texts in deterministic (page_url, pos) order,
    sliced to ``max_texts`` per target.

    Why the pre-truncation: a bare collect_list buffers EVERY inbound
    anchor of a hub target (a homepage collects millions) before the
    slice — the agg buffer, not the slice, is what blows up. Ranking
    within ``(target, pmod(xxhash64(page_url, pos), S))`` first keeps at
    most ``max_texts`` per salt bucket (any row in the true global top
    is also in its bucket's top, so the final sorted slice is
    bit-identical — the domain_budget_prune argument), and window sorts
    spill where agg buffers OOM; the final collect_list then holds at
    most ``S x max_texts`` structs per target."""
    from pyspark.sql import Window

    from webscraping_spark.functions.udfs import canonicalize_split

    a = harvest_anchor_texts(df, html_col=html_col, url_col=url_col)
    a = a.filter(F.col("anchor_text").isNotNull() & (F.col("href") != ""))
    if drop_nofollow:
        a = a.filter(~F.col("nofollow"))
    a = canonicalize_split(a, "page_url", "href", "target")
    # n_anchors counts ALL inbound anchors (cheap map-side count) even
    # though only max_texts texts survive into the field
    counts = a.groupBy("target").agg(F.count("*").cast("long").alias("n_anchors"))
    salt = F.pmod(F.xxhash64(F.col("page_url"), F.col("pos")), F.lit(32))
    w1 = Window.partitionBy("target", "_salt").orderBy(
        F.col("page_url").asc(), F.col("pos").asc()
    )
    a = (
        a.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= int(max_texts))
        .drop("_salt", "_rn")
    )
    agg = a.groupBy("target").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("page_url", "pos", "anchor_text"))
            ),
            1,
            max_texts,
        ).alias("_texts"),
    )
    return agg.join(counts, "target").select(
        "target",
        "n_anchors",
        F.array_join(
            F.transform(F.col("_texts"), lambda s: s["anchor_text"]), " "
        ).alias("anchor_field"),
    )


def harvest_image_pairs(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Fetched pages -> image-caption pair candidates.

    Output: ``(page_url, pos, src, srcset_best, alt, title, figcaption,
    caption, fetchable)`` — ``pos`` is the img's page order, ``caption``
    the first non-blank of (alt, figcaption, title), ``fetchable`` the
    frontier gate (non-empty non-data: non-fragment src). Pages with no
    ``<img>`` produce no rows. One projection + posexplode: zero
    shuffle, zero Python; output inherits input partitioning and feeds
    ``canonicalize_split`` (relative srcs) then
    ``multimodal.image_caption_filter`` downstream."""
    out = df.select(
        F.col(url_col).alias("page_url"),
        F.posexplode(image_pairs_col(F.col(html_col))).alias("pos", "p"),
    )
    p = F.col("p")
    src = p["src"]
    caption = F.coalesce(
        F.nullif(F.trim(p["alt"]), F.lit("")),
        p["figcaption"],
        F.nullif(F.trim(p["title"]), F.lit("")),
    )
    fetchable = F.coalesce(
        (src != "") & ~src.startswith("data:") & ~src.startswith("#"),
        F.lit(False),
    )
    return out.select(
        "page_url",
        "pos",
        src.alias("src"),
        p["srcset_best"].alias("srcset_best"),
        p["alt"].alias("alt"),
        p["title"].alias("title"),
        p["figcaption"].alias("figcaption"),
        caption.alias("caption"),
        fetchable.alias("fetchable"),
    )


META_KEYS = (
    "description",
    "keywords",
    "og:title",
    "og:description",
    "og:image",
    "og:type",
    "twitter:card",
)


def page_metadata(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Input plus the page's metadata head: ``title`` (first <title>
    inner text, entity-decoded, whitespace-collapsed) and one column per
    key in ``META_KEYS`` (``og:`` colons become ``_`` in column names) —
    the <meta name=...> / <meta property=...> values that OpenGraph-aware
    pipelines read; for an image-caption corpus, ``og_image`` +
    ``og_title`` IS the publisher-provided pair LAION-style harvests use
    before falling back to <img alt>.

    Contract: the FIRST matching meta tag per key wins (document order,
    the browser/crawler convention); ``name`` and ``property`` attributes
    are interchangeable and case-insensitive; both attribute orders and
    all three HTML attribute quote styles parse (the ``_attr_col``
    device); empty content is NULL. One regexp_extract_all projection
    over the head tags plus array higher-order lookups — zero shuffle,
    zero Python, fuses into the page scan."""
    html = F.col(html_col)
    title = clean_text_col(
        F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    )
    metas = F.regexp_extract_all(html, F.lit(r"(?is)<meta\b[^>]*>"), F.lit(0))
    entries = F.transform(
        metas,
        lambda t: F.struct(
            F.lower(
                F.coalesce(
                    F.nullif(_attr_col(t, "name"), F.lit("")),
                    F.nullif(_attr_col(t, "property"), F.lit("")),
                )
            ).alias("k"),
            _attr_col(t, "content").alias("v"),
        ),
    )

    def first_value(key: str):
        # try_element_at: an empty hit list is the normal no-such-meta
        # case, not an error (ANSI element_at throws on it)
        hit = F.try_element_at(
            F.filter(
                entries,
                # present-but-empty content ('' from _attr_col) carries no
                # value: the next tag with real content wins
                lambda e: e["k"].eqNullSafe(F.lit(key))
                & e["v"].isNotNull()
                & (e["v"] != ""),
            ),
            F.lit(1),
        )
        return F.nullif(clean_text_col(hit["v"]), F.lit(""))

    cols = [F.nullif(title, F.lit("")).alias("title")]
    for key in META_KEYS:
        cols.append(first_value(key).alias(key.replace(":", "_")))
    return pages.select("*", *cols)


def og_image_pairs(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Publisher-declared image-caption pairs from OpenGraph metadata:
    ``(page_url, image_url, caption)`` for pages carrying ``og:image``,
    with the caption ``og:title`` falling back to ``og:description`` then
    the <title>. This is the highest-precision caption source a crawl
    has (the publisher wrote it for exactly this purpose) and complements
    ``harvest_image_pairs``'s <img alt> path; image_url is returned as
    written — canonicalize against ``page_url`` downstream exactly like
    anchor targets."""
    meta = page_metadata(pages, html_col, url_col)
    return meta.filter(F.col("og_image").isNotNull()).select(
        F.col(url_col).alias("page_url"),
        F.col("og_image").alias("image_url"),
        F.coalesce(
            F.col("og_title"), F.col("og_description"), F.col("title")
        ).alias("caption"),
    )


def head_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per ``<link ...>`` head element: ``(page_url, pos, rel,
    href, hreflang)`` — rel lowercased, empty attrs NULL, href-less tags
    dropped. The raw feed for the two consumers below; same zero-shuffle
    regexp device as ``page_metadata``."""
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(r"(?is)<link\b[^>]*>"), F.lit(0)
    )
    out = pages.select(
        F.col(url_col).alias("page_url"), F.posexplode(tags).alias("pos", "t")
    )
    t = F.col("t")
    return out.select(
        "page_url",
        "pos",
        F.lower(F.nullif(_attr_col(t, "rel"), F.lit(""))).alias("rel"),
        F.nullif(_attr_col(t, "href"), F.lit("")).alias("href"),
        F.lower(F.nullif(_attr_col(t, "hreflang"), F.lit(""))).alias("hreflang"),
    ).filter(F.col("href").isNotNull())


def hreflang_edges(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Language-variant edges from ``rel="alternate" hreflang=...`` head
    links: ``(page_url, hreflang, href)`` — the publisher's own
    declaration that two URLs are THE SAME document in different
    languages. Near-dup dedup must respect these clusters (translations
    are not duplicates to drop blindly; a multilingual corpus keeps one
    per language, a monolingual one keeps its language's member): feed
    the (page_url, href) pairs to ``dedup.connected_components`` and the
    components are the publisher-declared translation sets."""
    links = head_links(pages, html_col, url_col)
    return links.filter(
        (F.col("rel") == "alternate") & F.col("hreflang").isNotNull()
    ).select("page_url", "hreflang", "href")


def pagination_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """``(page_url, rel, href)`` for ``rel="next"`` / ``rel="prev"`` head
    links — the publisher-declared pagination chain. The frontier wants
    these fetched at the PARENT's depth (a 400-page listing is one
    logical document, not a 400-deep descent that trips the depth
    cutoff), and the trap detector wants them excluded from template
    counting (a declared chain is not an infinite URL space). First
    next/prev each per page (document order) — browsers ignore later
    duplicates."""
    links = head_links(pages, html_col, url_col)
    w_ok = links.filter(F.col("rel").isin("next", "prev"))
    from pyspark.sql import Window

    w = Window.partitionBy("page_url", "rel").orderBy(F.col("pos").asc())
    return (
        w_ok.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("page_url", "rel", "href")
    )


def declared_language_col(html: Column) -> Column:
    """The page's self-declared language, lowercased: the first <html>
    tag's ``lang`` attribute, falling back to the first
    ``http-equiv="content-language"`` meta (WHATWG precedence). NULL when
    neither declares. Pairs with textstats.langid as corpus QA: CCNet
    compares declared vs detected language and a mismatch is a strong
    mislabeled-or-boilerplate signal."""
    html_tag = F.regexp_extract(html, r"(?is)<html\b[^>]*>", 0)
    lang_attr = F.nullif(_attr_col(html_tag, "lang"), F.lit(""))
    metas = F.regexp_extract_all(html, F.lit(r"(?is)<meta\b[^>]*>"), F.lit(0))
    cl = F.try_element_at(
        F.filter(
            metas,
            lambda t: F.lower(F.coalesce(_attr_col(t, "http-equiv"), F.lit("")))
            == "content-language",
        ),
        F.lit(1),
    )
    meta_lang = F.nullif(F.coalesce(_attr_col(cl, "content"), F.lit("")), F.lit(""))
    return F.lower(F.coalesce(lang_attr, meta_lang))
