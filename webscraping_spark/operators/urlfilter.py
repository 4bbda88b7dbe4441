"""URL-level quality gating for the frontier (the RefinedWeb §3.1 /
UT1-blocklist idea): score every candidate URL on cheap lexical signals
and drop spam/adult/machine-generated link shapes BEFORE fetch — at a
10^10-URL frontier the cheapest byte is the one never downloaded.

Reference tie-in: the reference's link gate (download.py:1010-1031)
filters on scheme + media extension + same-domain only; this is the
corpus-curation extension of that gate, in the same position in the
crawl plan (between link extraction and the frontier push).

Everything is one whole-stage-codegen projection — zero shuffle, zero
Python — so at scale the gate fuses into the link-extraction stage that
already holds the URL. All patterns live in the Java-regex/RE2 shared
syntax subset (the pii_redaction convention) so an oracle can run the
identical pattern strings, and the one float (digit fraction) is a
single exactly-rounded IEEE division rounded to 6 decimals — engine-
reproducible with no libm calls anywhere.

Signals (each a column, so downstream policies can re-weight instead of
re-parse):

- ``url_len`` — total length; machine-generated/tracking URLs run long.
- ``digit_frac`` — digit share of the URL; session-id/hash-shaped URLs.
- ``n_params`` — query-parameter count; deep tracking query strings.
- ``path_depth`` — '/'-segments in the path; calendar/faceted traps.
- ``badword_hits`` — substring hits from a small adult/gambling list
  (the UT1-style blocklist seam: swap in the full list via ``words``).
- ``is_ip_host`` — dotted-quad host (rarely curated content).
- ``host_hyphens`` — hyphen count in the host; spam domains chain them.

``keep`` ANDs the default thresholds; every threshold is a kwarg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deliberately small demo list — the production seam is the full UT1
# blocklist loaded into the same tuple. Substring matching (not word
# boundaries) is the RefinedWeb convention for URLs.
DEFAULT_BADWORDS = ("porn", "xxx", "casino", "viagra", "gambling", "escort")

_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def _count_char(s: Column, ch: str) -> Column:
    # literal replace (not regex) — mirrors SQL replace() exactly
    return F.length(s) - F.length(F.replace(s, F.lit(ch), F.lit("")))


def url_quality_signal_cols(
    url: Column, words: tuple[str, ...] = DEFAULT_BADWORDS
) -> dict[str, Column]:
    """The seven signals as named Column expressions over one URL column
    — composable into any existing projection or validity chain."""
    u = F.lower(url)
    host = F.regexp_extract(u, _HOST_RE, 1)
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    digits = F.length(u) - F.length(F.regexp_replace(u, "[0-9]", ""))
    bad = "(" + "|".join(words) + ")"
    return {
        "url_len": F.length(u).cast("int"),
        "digit_frac": F.round(
            digits.cast("double") / F.greatest(F.length(u), F.lit(1)).cast("double"),
            6,
        ),
        "n_params": F.when(query == "", F.lit(0))
        .otherwise(_count_char(query, "&") + 1)
        .cast("int"),
        "path_depth": _count_char(path, "/").cast("int"),
        "badword_hits": F.size(
            F.regexp_extract_all(u, F.lit(bad), F.lit(1))
        ).cast("int"),
        "is_ip_host": F.when(
            host.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("int"),
        "host_hyphens": _count_char(host, "-").cast("int"),
    }


def url_quality_keep_col(
    url: Column,
    words: tuple[str, ...] = DEFAULT_BADWORDS,
    max_len: int = 512,
    max_digit_frac: float = 0.5,
    max_params: int = 8,
    max_path_depth: int = 12,
    max_host_hyphens: int = 4,
) -> Column:
    """The ANDed keep decision as one boolean Column — what the crawl
    plan folds into its link-validity chain (no extra projection, no
    shuffle; the whole decision rides the link-extraction stage)."""
    s = url_quality_signal_cols(url, words=words)
    return (
        (s["url_len"] <= max_len)
        & (s["digit_frac"] <= max_digit_frac)
        & (s["n_params"] <= max_params)
        & (s["path_depth"] <= max_path_depth)
        & (s["badword_hits"] == 0)
        & (s["is_ip_host"] == 0)
        & (s["host_hyphens"] <= max_host_hyphens)
    )


def url_quality_signals(
    df: DataFrame,
    url_col: str = "url",
    words: tuple[str, ...] = DEFAULT_BADWORDS,
) -> DataFrame:
    """Append the seven signal columns. Pure projection: no shuffle, no
    Python, fuses into whatever stage already scans ``url_col``."""
    sigs = url_quality_signal_cols(F.col(url_col), words=words)
    return df.select("*", *(c.alias(n) for n, c in sigs.items()))


def url_quality_gate(
    df: DataFrame,
    url_col: str = "url",
    words: tuple[str, ...] = DEFAULT_BADWORDS,
    max_len: int = 512,
    max_digit_frac: float = 0.5,
    max_params: int = 8,
    max_path_depth: int = 12,
    max_host_hyphens: int = 4,
) -> DataFrame:
    """Signals plus the ANDed ``keep`` flag (1/0 INT — the oracle-stable
    convention). Thresholds follow RefinedWeb's spirit, not its exact
    values (those are corpus-tuned); every one is a kwarg."""
    sig = url_quality_signals(df, url_col=url_col, words=words)
    # reference the projected signal columns (evaluated once) rather than
    # re-expanding the expressions via url_quality_keep_col
    keep = (
        (F.col("url_len") <= max_len)
        & (F.col("digit_frac") <= max_digit_frac)
        & (F.col("n_params") <= max_params)
        & (F.col("path_depth") <= max_path_depth)
        & (F.col("badword_hits") == 0)
        & (F.col("is_ip_host") == 0)
        & (F.col("host_hyphens") <= max_host_hyphens)
    )
    return sig.select(
        "*", F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("keep")
    )


# ---------------------------------------------------------------------------
# Crawl-trap detection: infinite URL spaces (calendars, session ids,
# faceted navigation) that explode a frontier without adding content.
# The per-URL quality gate above cannot see them — a single calendar URL
# looks fine; the TRAP is the population. Detection is per-domain
# template collapse (the Heritrix "path-ish" / IRLbot device): collapse
# digit runs and query-parameter VALUES out of the URL, then measure how
# much of the domain's frontier share one template holds.
# ---------------------------------------------------------------------------

# query values drop first (key survives: '?id=123&x=a' -> '?id=&x='),
# then digit runs collapse to N. Spark replacement syntax is $1, DuckDB's
# is \1 — same semantics, documented pair.
_QVAL_PATTERN = r"([?&][^=&#]*=)[^&#]*"
_DIGITS_PATTERN = r"\d+"


def url_template_col(url: Column) -> Column:
    """Trap template of a URL: query values stripped, digit runs -> 'N'.

    DuckDB twin: ``regexp_replace(regexp_replace(url, qval, '\\1', 'g'),
    '\\d+', 'N', 'g')``."""
    return F.regexp_replace(
        F.regexp_replace(url, _QVAL_PATTERN, r"$1"), _DIGITS_PATTERN, "N"
    )


def trap_signals(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 20,
    majority_pct: int = 50,
) -> DataFrame:
    """Per-domain trap verdicts: ``(domain, n_urls, n_templates,
    top_template, top_n, is_trap)`` — a domain is a trap candidate when
    it holds >= ``min_urls`` frontier URLs and one template owns >=
    ``majority_pct``% of them (integer arithmetic, oracle-stable).

    Shuffle shape at 10^10 URLs: one map-side-combinable groupBy on
    (domain, template) — boilerplate-hot templates combine before the
    exchange — then a domain-keyed window over the (small) template
    table to pick the deterministic winner (count desc, template asc).
    The URL table itself is never re-shuffled."""
    from webscraping_spark.functions.udfs import get_domain_col

    u = F.col(url_col)
    t = df.select(
        get_domain_col(u).alias("domain"),
        url_template_col(u).alias("template"),
    )
    per_tpl = t.groupBy("domain", "template").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("domain")
    wo = Window.partitionBy("domain").orderBy(
        F.col("n").desc(), F.col("template").asc()
    )
    ranked = per_tpl.select(
        "domain",
        "template",
        "n",
        F.sum("n").over(w).alias("n_urls"),
        F.count("*").over(w).alias("n_templates"),
        F.row_number().over(wo).alias("rn"),
    )
    top = ranked.filter(F.col("rn") == 1)
    return top.select(
        "domain",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_templates").cast("int").alias("n_templates"),
        F.col("template").alias("top_template"),
        F.col("n").cast("long").alias("top_n"),
        (
            (F.col("n_urls") >= F.lit(min_urls))
            & (F.col("n") * 100 >= F.col("n_urls") * F.lit(majority_pct))
        ).alias("is_trap"),
    )


def gate_trap_urls(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 20,
    majority_pct: int = 50,
) -> DataFrame:
    """Input plus ``trapped`` — True for URLs whose (domain, template)
    is the winning template of a trap domain (the rows a frontier push
    should hold back or depth-penalize; non-top templates of the same
    domain survive, so the real site underneath stays crawlable). One
    broadcast-able join against the tiny verdict table."""
    from webscraping_spark.functions.udfs import get_domain_col

    verdicts = trap_signals(
        df, url_col=url_col, min_urls=min_urls, majority_pct=majority_pct
    ).filter(F.col("is_trap"))
    u = F.col(url_col)
    keyed = df.withColumn("_domain", get_domain_col(u)).withColumn(
        "_template", url_template_col(u)
    )
    joined = keyed.join(
        F.broadcast(
            verdicts.select(
                F.col("domain").alias("_domain"),
                F.col("top_template").alias("_template"),
                F.lit(True).alias("_hit"),
            )
        ),
        ["_domain", "_template"],
        "left",
    )
    return joined.select(
        *df.columns, F.coalesce(F.col("_hit"), F.lit(False)).alias("trapped")
    )


# ---------------------------------------------------------------------------
# Tracking-parameter removal: utm_* & friends make one page infinitely
# many URLs (every social share mints a new query string), polluting the
# seen-set and double-fetching content. Production crawlers strip the
# well-known tracker keys during canonicalization; the engine applies
# this AFTER the reference-parity canonicalize kernel (which must stay
# bit-exact to download.py:987-1004) as an opt-in frontier hygiene step.
# ---------------------------------------------------------------------------

# frozen key set (prefix utm_*, plus the big click-id params); a key
# matches as a whole name only — 'gclid2' survives. The (=|$) tail
# covers bare flags ('?fbclid').
TRACKING_KEY_PATTERN = (
    r"(?i)^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|yclid|mc_eid|igshid)(=|$)"
)


def strip_tracking_params_col(url: Column) -> Column:
    """URL with tracking query parameters removed: the query splits on
    '&', tokens whose key matches TRACKING_KEY_PATTERN drop, the rest
    rejoin in order; an emptied query drops its '?'. Path, fragment and
    non-tracking parameter order are untouched. Pure codegen (split /
    filter / array_join) in the shared regex subset."""
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    frag = F.regexp_extract(url, r"(#.*)$", 1)
    kept = F.filter(
        F.split(query, "&"), lambda t: ~t.rlike(TRACKING_KEY_PATTERN)
    )
    q2 = F.array_join(kept, "&")
    return F.concat(
        base,
        F.when((query != "") & (q2 != ""), F.concat(F.lit("?"), q2)).otherwise(
            F.lit("")
        ),
        frag,
    )


def strip_tracking_params(
    df: DataFrame, url_col: str = "url", out_col: str | None = None
) -> DataFrame:
    """Apply the tracker strip to a URL column (in place by default)."""
    return df.withColumn(out_col or url_col, strip_tracking_params_col(F.col(url_col)))


def fold_host_aliases_col(url: Column) -> Column:
    """Opt-in host-alias normalization BEYOND the reference-parity
    canonicalize kernel (which, like download.py:987-1004, keeps hosts
    verbatim): lowercase the host, drop a leading ``www.`` label and an
    explicit default port (``:80`` for http, ``:443`` for https), leaving
    scheme, path and query untouched. ``http://WWW.Site.com:80/P?q`` and
    ``http://site.com/P?q`` are one dedup key / one budget pool on every
    real crawler (Heritrix canonicalization rules); non-http(s) URLs and
    URLs with non-default ports pass through with only the host
    lowercased. Pure codegen — one regexp per piece."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    h = F.lower(host)
    h = F.regexp_replace(h, r"^www\.", "")
    h = F.when(scheme == "http", F.regexp_replace(h, ":80$", "")).when(
        scheme == "https", F.regexp_replace(h, ":443$", "")
    ).otherwise(h)
    return F.when(
        host != "", F.concat(scheme, F.lit("://"), h, rest)
    ).otherwise(url)


def robots_freshness_col(
    fetched_at_s: Column, now_s: Column, max_age_s: int = 86_400
) -> Column:
    """RFC 9309 §2.4 robots.txt cache state: 'fresh' while the cached
    copy is younger than ``max_age_s`` (the spec's 24h default), 'stale'
    after — callers refetch stale copies but MAY keep using them when the
    refetch 5xxes (the spec's explicit allowance; pair with
    retry_routing's error classes). Integer-seconds arithmetic, NULL
    fetched_at = never fetched = 'missing'."""
    age = now_s - fetched_at_s
    return (
        F.when(fetched_at_s.isNull(), F.lit("missing"))
        .when(age < F.lit(int(max_age_s)), F.lit("fresh"))
        .otherwise(F.lit("stale"))
    )
