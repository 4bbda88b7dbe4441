"""Main-content extraction (boilerplate removal) from fetched HTML.

Reference tie-in: the reference's closest devices are ``remove_tags``
(common.py:220-238 — strips ALL markup indiscriminately) and
``alg.get_excerpt`` (alg.py:7-25 — keeps only the single largest text
block). Neither separates article text from navigation chrome, which is
the step every web-corpus pipeline runs between fetch and quality
filtering: CCNet, C4 and RefinedWeb all extract main content before any
quality gate, because Gopher/C4 signals measured over nav/footer
boilerplate misclassify good pages. This module is that stage, in the
jusText / Boilerpipe family (Pomikalek 2011; Kohlschuetter et al. WSDM
2010): segment the page into blocks, score each block's text by length,
link density and stopword density, keep good blocks plus short blocks
adjacent to good ones.

The classification contract (all integer arithmetic — no float
thresholds — so any engine re-derives it bit-exactly):

- block segmentation: non-content subtrees are removed first
  (``script``/``style``/``noscript``/comments/``head`` plus the HTML5
  boilerplate containers ``nav``/``header``/``footer``/``aside``/
  ``form``), then the page splits on block-level tag boundaries
  (``BLOCK_TAG_PATTERN``); segments whose cleaned text is empty vanish
  (consecutive tags produce empty segments, which would otherwise sit
  between every pair of real paragraphs and break adjacency).
- per block: ``text`` = inline tags stripped, the five XML entities +
  ``&nbsp;`` decoded (amp last — sitemap.xml_unescape_col's device),
  whitespace collapsed; ``link_chars`` = summed cleaned length of
  ``<a>`` inner texts; ``n_words`` = whitespace tokens; ``stop_hits`` =
  lowercase tokens in ``CONTENT_STOPWORDS``.
- good:  len(text) >= min_len  AND  link_chars*100 <= len(text)*max_link_pct
         AND stop_hits*100 >= n_words*min_stop_pct
- near:  len(text) >= near_len AND  link_chars*100 <= len(text)*max_link_pct
- keep:  good OR (near AND (good[prev] OR good[next]))   (one context
  pass over compacted non-empty blocks — jusText's near-good rule with
  a fixed two-state core instead of its iterated fixpoint: a documented
  simplification, deterministic and order-only-dependent).

Everything is JVM expressions in the Java-regex/RE2 shared subset (the
engine's oracle convention; per-tag removal patterns instead of a
backreferenced ``</\\1>`` because RE2 has no backreferences). Zero
Python, zero shuffle — at 100 TB the extraction fuses into the scan
that already reads the fetched page, exactly like the quality gates it
feeds; same-tag nesting (a ``<nav>`` inside a ``<nav>``) truncates at
the first close tag, the same documented regex-subset semantics as the
reference's own regex extractors (download.py:1033).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webscraping_spark.operators.sitemap import xml_unescape_col

# removed wholesale before block segmentation; order is irrelevant
# (patterns are disjoint by tag name). Non-greedy + (?s): a subtree
# spanning lines matches, adjacent subtrees don't merge.
NONCONTENT_PATTERNS = (
    r"(?is)<script\b.*?</script>",
    r"(?is)<style\b.*?</style>",
    r"(?is)<noscript\b.*?</noscript>",
    r"(?s)<!--.*?-->",
    r"(?is)<head\b.*?</head>",
    r"(?is)<nav\b.*?</nav>",
    r"(?is)<header\b.*?</header>",
    r"(?is)<footer\b.*?</footer>",
    r"(?is)<aside\b.*?</aside>",
    r"(?is)<form\b.*?</form>",
)

# block-level boundaries: both open and close tags split (hence `/?`);
# inline markup (<a>, <b>, <span>, ...) stays inside its block.
BLOCK_TAG_PATTERN = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th"
    r"|section|article|main|blockquote|pre|figure|figcaption|br|hr)\b[^>]*>"
)

ANCHOR_PATTERN = r"(?is)<a\b[^>]*>(.*?)</a>"

# tiny deterministic function-word list (the jusText device: function
# words mark natural prose; link lists and nav chrome have almost none).
# Frozen as part of the classification contract, like the engine's other
# parity constants.
CONTENT_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "was",
    "it", "that", "for", "on", "with", "as",
)


def _clean_text(s: Column) -> Column:
    """Markup fragment -> visible text: tags stripped, entities decoded,
    whitespace collapsed, trimmed. Blank -> '' (not NULL: blocks are
    filtered on '' and main_text must concatenate cleanly)."""
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    s = xml_unescape_col(F.replace(s, F.lit("&nbsp;"), F.lit(" ")))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def _link_chars(block: Column) -> Column:
    """Summed cleaned-text length of the block's ``<a>`` inner texts."""
    return F.aggregate(
        F.transform(
            F.regexp_extract_all(block, F.lit(ANCHOR_PATTERN), F.lit(1)),
            lambda a: F.length(_clean_text(a)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _stop_hits(text: Column) -> Column:
    toks = F.split(F.lower(text), r"\s+")
    return F.size(
        F.filter(toks, lambda x: x.isin(*[F.lit(w) for w in CONTENT_STOPWORDS]))
    )


def content_blocks_col(
    html: Column,
    *,
    min_len: int = 80,
    near_len: int = 20,
    max_link_pct: int = 30,
    min_stop_pct: int = 8,
) -> Column:
    """``array<struct<text,text_len,link_chars,n_words,stop_hits,good,
    near,keep>>`` — one element per non-empty block, page order. Pure
    per-row array expressions; neighbors are resolved with
    ``try_element_at`` over the compacted array (out-of-range -> NULL ->
    false via coalesce)."""
    cleaned = html
    for pat in NONCONTENT_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, " ")

    raw_blocks = F.split(cleaned, BLOCK_TAG_PATTERN)
    stats = F.filter(
        F.transform(
            raw_blocks,
            lambda b: F.struct(
                _clean_text(b).alias("text"),
                _link_chars(b).alias("link_chars"),
            ),
        ),
        lambda s: s["text"] != "",
    )

    def classify(s: Column) -> Column:
        text, lc = s["text"], s["link_chars"]
        tl = F.length(text)
        n_words = F.size(F.split(text, r"\s+"))
        stops = _stop_hits(text)
        link_ok = lc * 100 <= tl * F.lit(max_link_pct)
        good = (
            (tl >= F.lit(min_len))
            & link_ok
            & (stops * 100 >= n_words * F.lit(min_stop_pct))
        )
        near = (tl >= F.lit(near_len)) & link_ok
        return F.struct(
            text.alias("text"),
            tl.alias("text_len"),
            lc.alias("link_chars"),
            n_words.alias("n_words"),
            stops.alias("stop_hits"),
            good.alias("good"),
            near.alias("near"),
        )

    flagged = F.transform(stats, classify)

    def with_keep(s: Column, i: Column) -> Column:
        # i is 0-based; try_element_at is 1-based, so neighbors of the
        # element at 1-based position i+1 sit at i and i+2. try_element_at
        # tolerates out-of-range but still REJECTS literal index 0, so the
        # first block's prev probe needs an explicit guard.
        prev_good = F.when(
            i > 0, F.coalesce(F.try_element_at(flagged, i)["good"], F.lit(False))
        ).otherwise(F.lit(False))
        next_good = F.coalesce(
            F.try_element_at(flagged, i + F.lit(2))["good"], F.lit(False)
        )
        keep = s["good"] | (s["near"] & (prev_good | next_good))
        return F.struct(
            s["text"].alias("text"),
            s["text_len"].alias("text_len"),
            s["link_chars"].alias("link_chars"),
            s["n_words"].alias("n_words"),
            s["stop_hits"].alias("stop_hits"),
            s["good"].alias("good"),
            s["near"].alias("near"),
            keep.alias("keep"),
        )

    return F.transform(flagged, with_keep)


def classify_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
    **thresholds: int,
) -> DataFrame:
    """Exploded per-block view: ``(id_col, block_idx, text, text_len,
    link_chars, n_words, stop_hits, good, near, keep)`` — the audit /
    oracle surface. One projection + posexplode, zero shuffle; pages
    with no text blocks emit no rows."""
    b = F.col("b")
    return df.select(
        F.col(id_col),
        F.posexplode(content_blocks_col(F.col(html_col), **thresholds)).alias(
            "block_idx", "b"
        ),
    ).select(
        id_col,
        "block_idx",
        b["text"].alias("text"),
        b["text_len"].alias("text_len"),
        b["link_chars"].alias("link_chars"),
        b["n_words"].alias("n_words"),
        b["stop_hits"].alias("stop_hits"),
        b["good"].alias("good"),
        b["near"].alias("near"),
        b["keep"].alias("keep"),
    )


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
    **thresholds: int,
) -> DataFrame:
    """Per-page main content: ``(id_col, main_text, n_blocks, n_kept,
    content_chars)`` where ``main_text`` joins kept blocks with
    newlines ('' when nothing survives — an all-chrome page). One
    codegen projection, zero shuffle, zero Python; feeds the quality
    gates (textstats.gopher_filter / c4_clean) in the same scan stage."""
    blocks = content_blocks_col(F.col(html_col), **thresholds)
    kept = F.filter(blocks, lambda s: s["keep"])
    main_text = F.array_join(F.transform(kept, lambda s: s["text"]), "\n")
    return df.select(
        F.col(id_col),
        main_text.alias("main_text"),
        F.size(blocks).alias("n_blocks"),
        F.size(kept).alias("n_kept"),
        F.length(main_text).alias("content_chars"),
    )


def dom_signature(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Input plus ``(n_tags, dom_sig)``: the page's DOM *skeleton*
    fingerprint — md5 of the comma-joined lowercase sequence of opening
    tag names. Two pages rendered from the same server-side template
    share a skeleton even when every text node differs, so this is the
    structural complement to urlfilter's URL templates (template traps
    that vary the path but serve one layout) and the cluster key for
    per-site boilerplate analysis (one main_content tuning per template,
    not per page).

    md5 (not xxhash64) by the engine's oracle convention — bit-identical
    in DuckDB. One regexp_extract_all + array ops projection: zero
    shuffle, zero Python, fuses into whatever stage already scans the
    HTML."""
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit("<([a-zA-Z][a-zA-Z0-9]*)"), F.lit(1)
    )
    low = F.transform(tags, F.lower)
    return pages.select(
        "*",
        F.size(tags).cast("int").alias("n_tags"),
        F.md5(F.array_join(low, ",")).alias("dom_sig"),
    )


def template_clusters(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_pages: int = 2,
) -> DataFrame:
    """Per-domain DOM-template clusters: ``(domain, dom_sig, n_pages,
    sample_url)`` for skeletons shared by >= ``min_pages`` pages —
    sample_url is the MIN url (deterministic representative). One
    map-side-combinable groupBy on (domain, dom_sig); the HTML never
    rides the exchange (the signature replaced it in the projection)."""
    from webscraping_spark.functions.udfs import get_domain_col

    sig = dom_signature(pages, html_col, url_col)
    return (
        sig.groupBy(
            get_domain_col(F.col(url_col)).alias("domain"), F.col("dom_sig")
        )
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.min(url_col).alias("sample_url"),
        )
        .filter(F.col("n_pages") >= int(min_pages))
    )
