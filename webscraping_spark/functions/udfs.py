"""Spark bindings for the normalization kernel.

Two tiers, chosen per the 100-TB rule "stay JVM-side":

1. **Column-expression builders** (`*_col`) — pure pyspark.sql.functions
   compositions that run inside whole-stage codegen. Used whenever Spark
   built-ins can express the reference semantics exactly (fragment strip,
   extension extraction, media-extension gate, link regex findall, lenient
   numeric casts...).
2. **Arrow-batched pandas UDFs** — only where no builtin exists
   (urljoin-based canonicalization, entity unescape, registrable-domain
   suffix trim, xpath caption extraction). Never row-at-a-time `F.udf`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webscraping_spark.functions import htmlpath
from webscraping_spark.functions.extract import extract_emails, extract_phones
from webscraping_spark.functions.textkernel import normalize as _normalize_text
from webscraping_spark.functions.urlnorm import (
    MEDIA_EXTENSIONS,
    canonicalize_url_series,
    get_domain_series,
    unescape_series,
)

# --------------------------------------------------------------------------
# Tier 1: JVM-side column expressions (whole-stage codegen, zero Python)
# --------------------------------------------------------------------------


def strip_fragment_col(url: Column) -> Column:
    """Drop the #fragment (first half of CrawlerCallback.normalize,
    download.py:998) — JVM-side prefilter before the canonicalize UDF."""
    return F.regexp_replace(url, "#.*$", "")


def get_extension_col(url: Column) -> Column:
    """Lowercased path extension (common.py:397-405) as an expression.

    ``parse_url(url, 'PATH')`` handles absolute URLs; schemeless inputs fall
    back to stripping query/fragment manually.
    """
    path = F.when(
        url.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), F.parse_url(url, F.lit("PATH"))
    ).otherwise(F.regexp_replace(url, "[?#].*$", ""))
    base = F.element_at(F.split(path, "/"), -1)
    return F.when(
        base.contains("."), F.lower(F.regexp_replace(F.regexp_extract(base, r"\.([^.]*)$", 0), r"\.", ""))
    ).otherwise(F.lit(""))


def is_media_link_col(url: Column) -> Column:
    """Media-extension gate (download.py:1016; common.py:45)."""
    return get_extension_col(url).isin(list(MEDIA_EXTENSIONS))


def is_http_col(url: Column) -> Column:
    """'proper HTTP link' check (download.py:1018)."""
    return F.lower(url).startswith("http")


def find_links_col(html: Column) -> Column:
    """``<a href>`` findall (download.py:1033-1034) as a JVM regex —
    returns ARRAY<STRING> of raw hrefs in document order."""
    return F.regexp_extract_all(html, F.lit("(?i)<a[^>]+href=[\"'](.*?)[\"']"), F.lit(1))


def to_float_col(s: Column) -> Column:
    """Lenient numeric parse keeping [0-9.-] chars (common.py:72-97)."""
    cleaned = F.regexp_replace(s, "[^0-9.-]", "")
    return F.coalesce(cleaned.cast("double"), F.lit(0.0))


def to_int_col(s: Column) -> Column:
    return to_float_col(s).cast("long")


def to_ascii_col(s: Column) -> Column:
    return F.regexp_replace(s, "[^\\x00-\\x7F]", "")


def get_domain_col(url: Column) -> Column:
    """Registrable domain (common.py:408-429) as a pure JVM expression —
    the hot-path twin of ``get_domain_udf`` (which stays as the parity
    oracle; tests assert equality).

    Logic: IP literals pass through; otherwise lowercase host, split on
    '.', and keep labels from the LAST non-suffix label onward (the
    reference's forward walk that resets `domain` at each non-suffix
    label is equivalent).
    """
    from webscraping_spark.functions.urlnorm import _DOMAIN_SUFFIXES

    ip = F.regexp_extract(url, r"^.*://(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})", 1)
    host = F.lower(
        F.element_at(F.split(F.regexp_replace(url, "^.*://", ""), "/"), 1)
    )
    labels = F.split(host, "\\.")
    # suffix-set membership as ONE compiled regex alternation: an
    # F.array(...280 literals...) inside the lambda re-allocates the array
    # per row per label (GC-bound, anti-scales with cores — measured 4x
    # slowdown at local[32]); the regex costs no allocation and scales.
    suffix_pattern = "^(%s)$" % "|".join(sorted(_DOMAIN_SUFFIXES))
    idxs = F.sequence(F.lit(1), F.size(labels))
    non_suffix = F.filter(
        idxs, lambda i: ~F.element_at(labels, i).rlike(suffix_pattern)
    )
    # try_element_at: an all-suffix host (e.g. pa.com — 'pa' is a ccTLD)
    # leaves non_suffix EMPTY, and ANSI element_at(-1) throws on empty
    # arrays; NULL falls back to start=1 = keep the whole host, which is
    # what the kernel's forward walk returns for that case
    start = F.coalesce(F.try_element_at(non_suffix, F.lit(-1)), F.lit(1))
    domain = F.array_join(
        F.slice(labels, start, F.size(labels) - start + 1), "."
    )
    return F.when(ip != "", ip).otherwise(domain)


def clean_link_predicate(link: Column) -> Column:
    """True when ``link`` is provably a fixpoint of
    CrawlerCallback.normalize: absolute http(s), no fragment, no percent
    escape, no HTML entity, no '/..' segment, ASCII-only. For such links
    canonicalize_url(base, link) == link for any base."""
    return (
        link.rlike("^https?://")
        & ~link.rlike(r"[%#]|&#?\w+;|/\.\.")
        & ~link.rlike("[^\\x00-\\x7F]")
    )


def canonicalize_split(df, base_col: str, link_col: str, out_col: str):
    """DataFrame-level tiered canonicalization.

    Spark's ExtractPythonUDFs rule evaluates a pandas UDF for every row
    even under a when() branch, so the fast paths must be physical splits:

      tier 0  clean absolute links: provable normalize fixpoints — project
              as-is (pure JVM).
      tier 1  simple relative links against a clean base: after JVM-side
              fragment strip and ``&amp;`` decode, a link that has no
              percent escape, no other entity, no dot-segments, no
              scheme/authority, and doesn't start with '/' resolves as
              base-directory + link — exactly what urljoin does for that
              shape (pure JVM regex).
      tier 2  everything else: the exact pandas-UDF kernel.

    Real frontiers are dominated by tiers 0-1 (absolute hrefs and sibling
    relative hrefs), so the Python kernel only sees the genuinely dirty
    tail. Parity with ``canonicalize_url`` is asserted by tests on every
    tier boundary.
    """
    base = F.col(base_col)
    link = F.col(link_col)

    tier0 = clean_link_predicate(link)

    # JVM-decodable form of the link: fragment strip + &amp; -> &
    decoded = F.regexp_replace(F.regexp_replace(link, "#.*$", ""), "&amp;", "&")
    base_has_dir = base.rlike("^https?://[^/?#]+/[^?#]*$")  # path, no query/frag
    simple_rel = (
        ~decoded.rlike(r"[%#]|&#?\w+;|[^\x00-\x7F]")  # nothing left to decode
        & ~decoded.rlike(r"(^|/)\.\.?(/|$)")  # no ./.. segments
        & ~decoded.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:")  # no scheme (mailto:, http:)
        & ~decoded.startswith("/")  # not root-relative
        & ~decoded.startswith("?")  # query-only links replace base query, not path
        & (decoded != "")
    )
    tier1 = ~tier0 & base_has_dir & simple_rel

    t0_df = df.filter(tier0).withColumn(out_col, link)
    t1_df = df.filter(tier1).withColumn(
        out_col, F.concat(F.regexp_replace(base, "[^/]*$", ""), decoded)
    )
    t2_df = df.filter(~tier0 & ~tier1).withColumn(
        out_col, canonicalize_url_udf(base, link)
    )
    return t0_df.unionByName(t1_df).unionByName(t2_df)


def url_hash_col(url: Column) -> Column:
    """64-bit canonical-URL hash — the seen-set / partition key.

    JVM-side xxhash64 (whole-stage codegen); plays the role of the
    reference's HashDict key hash (adt.py:71-74) with far better mixing.
    """
    return F.xxhash64(url)


def clean_content_col(html: Column, max_size: int | None, force_html: bool, force_ascii: bool) -> Column:
    """_clean_content (download.py:322-342) as a when() ladder."""
    out = html
    if max_size is not None:
        out = F.when(F.length(out) > max_size, F.lit("")).otherwise(out)
    if force_html:
        out = F.when(out.rlike("html|head|body"), out).otherwise(F.lit(""))
    if force_ascii:
        out = to_ascii_col(out)
    return out


def invalid_response_col(html: Column, pattern: str | None) -> Column:
    """invalid_response (download.py:373-376) as a predicate column."""
    invalid = html.isNull()
    if pattern:
        invalid = invalid | ~html.rlike("(?is)" + pattern)
    return invalid


# --------------------------------------------------------------------------
# Tier 2: Arrow-batched pandas UDFs (the only Python in the hot path)
# --------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def canonicalize_url_udf(base: pd.Series, link: pd.Series) -> pd.Series:
    """CrawlerCallback.normalize (download.py:987-1004): urljoin has no
    Spark builtin, so this is the one mandatory Python hop per link."""
    return canonicalize_url_series(base, link)


@F.pandas_udf(T.StringType())
def get_domain_udf(url: pd.Series) -> pd.Series:
    """Registrable domain (common.py:408-429) — politeness/partition key."""
    return get_domain_series(url)


@F.pandas_udf(T.StringType())
def unescape_udf(text: pd.Series) -> pd.Series:
    return unescape_series(text)


@F.pandas_udf(T.StringType())
def normalize_text_udf(text: pd.Series) -> pd.Series:
    """remove_tags + unescape + whitespace collapse (common.py:317-334) —
    the caption-normalization kernel."""
    return pd.Series(
        [_normalize_text(t) if isinstance(t, str) else "" for t in text.to_numpy()],
        index=text.index,
        dtype="object",
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_emails_udf(html: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_emails(h) if isinstance(h, str) else [] for h in html.to_numpy()],
        index=html.index,
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_phones_udf(html: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_phones(h) if isinstance(h, str) else [] for h in html.to_numpy()],
        index=html.index,
    )


def make_xpath_udf(xpath: str):
    """Factory: pandas UDF extracting the first match of ``xpath`` from an
    HTML column (caption extraction path)."""

    @F.pandas_udf(T.StringType())
    def xpath_get(html: pd.Series) -> pd.Series:
        return pd.Series(
            [htmlpath.get(h, xpath) if isinstance(h, str) else "" for h in html.to_numpy()],
            index=html.index,
            dtype="object",
        )

    return xpath_get


@F.pandas_udf(T.ArrayType(T.StringType()))
def get_links_rich_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """Rich link extraction: a/@href + iframe/@src + JS location.href
    (xpath.py:515-555)."""
    out = []
    for h, u in zip(html.to_numpy(), url.to_numpy()):
        out.append(htmlpath.get_links(h, u) if isinstance(h, str) else [])
    return pd.Series(out, index=html.index)
