"""Text analysis operators for the training-data pipeline: token counting,
quality scoring, language ID, document fingerprinting.

Everything here is JVM column expressions except the rolling-hash
fingerprint (a numpy Arrow kernel) — these run inside whole-stage codegen
over 100-TB document scans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stopword profiles for the n-gram/stopword language heuristic (tiny,
# deterministic — not a model; real deployments plug fasttext into the
# same column contract)
_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du"),
    "es": ("el", "la", "de", "y", "los", "un", "una", "que"),
    "de": ("der", "die", "und", "das", "ein", "zu", "mit", "von"),
}


def token_count_col(text_col: str = "text") -> Column:
    """Whitespace token count."""
    t = F.trim(F.col(text_col))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, "\\s+")))


def bpe_ish_token_count_col(text_col: str = "text") -> Column:
    """Sub-word-ish count: word pieces after splitting on non-alphanumerics
    plus digit runs (a cheap BPE proxy for budget estimates)."""
    pieces = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+|(?<=[a-z])(?=[0-9])")
    return F.size(F.filter(pieces, lambda p: p != ""))


def quality_score_cols(text_col: str = "text") -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_col(text_col)
    punct = F.length(F.regexp_replace(t, "[^.!?,;:]", ""))
    upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    stop_hits = _stopword_hits(t, _STOPWORDS["en"])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6),
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        "upper_ratio": F.round(upper / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6),
    }


def _stopword_hits(t: Column, words: tuple[str, ...]) -> Column:
    toks = F.split(F.lower(F.trim(t)), "\\s+")
    return F.size(F.filter(toks, lambda x: x.isin(*[F.lit(w) for w in words])))


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    cols = quality_score_cols(text_col)
    return docs.select(F.col(id_col), *[c.alias(name) for name, c in cols.items()])


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style repetition filters as pure JVM column expressions:

      - dup_line_frac: 1 - distinct/total over newline-split lines (boiler-
        plate pages repeat nav/footer lines)
      - dup_token_frac: 1 - distinct/total over whitespace tokens
      - top_bigram_frac: occurrences of the most frequent word bigram over
        total bigrams (the classic 'repeated phrase' machine-text signal)

    All higher-order array functions (transform/filter/array_max) inside
    whole-stage codegen — no shuffle, no Python; the top-bigram mode is
    O(distinct x total) per row in the JVM, bounded by document length.
    At 100 TB this is a pure map over the scan like the other quality
    signals, so it fuses into the same stage.
    """
    t = F.trim(F.col(text_col))
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(t), "\\s+")
    )
    n_toks = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n_toks - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_toks - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    n_bg = F.size(bigrams)
    top_bg = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda x: F.size(F.filter(bigrams, lambda y: y == x)),
        )
    )
    def dup_frac(arr, n):
        # empty input has no duplicates (the greatest() guard alone would
        # read 1 - 0/1 = 1.0 and flag empty docs as fully repeated)
        return F.when(n == 0, F.lit(0.0)).otherwise(
            F.round(1.0 - F.size(F.array_distinct(arr)) / n, 6)
        )

    return docs.select(
        F.col(id_col),
        dup_frac(lines, n_lines).alias("dup_line_frac"),
        dup_frac(toks, n_toks).alias("dup_token_frac"),
        F.round(
            F.coalesce(top_bg, F.lit(0)) / F.greatest(n_bg, F.lit(1)).cast("double"), 6
        ).alias("top_bigram_frac"),
    )


def langid(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language guess: argmax over per-language hit rates.

    Returns (id, lang_guess, lang_score). The array_max over
    struct(score, lang) keeps it in codegen; ties resolve to the
    lexicographically-GREATEST language (struct comparison falls through to
    the lang field), deterministically.
    """
    t = F.col(text_col)
    scores = [
        (lang, _stopword_hits(t, words)) for lang, words in sorted(_STOPWORDS.items())
    ]
    score_struct = F.array(
        *[F.struct(s.cast("long").alias("score"), F.lit(lang).alias("lang")) for lang, s in scores]
    )
    best = F.array_max(score_struct)
    return docs.select(
        F.col(id_col),
        best["lang"].alias("lang_guess"),
        best["score"].alias("lang_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 8) -> DataFrame:
    """64-bit document fingerprint: min of rolling hashes over normalized
    byte windows (winnowing-style). Arrow numpy kernel — the per-row loop
    is a vectorized polynomial rolling hash, not per-character Python."""

    def roll(batches):
        B = np.uint64(1099511628211)
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            texts = pdf[text_col].to_numpy()
            for i, s in enumerate(texts):
                data = np.frombuffer(
                    " ".join(str(s).lower().split()).encode("utf-8"), dtype=np.uint8
                ).astype(np.uint64)
                if len(data) < window:
                    out[i] = np.int64(np.uint64(data.sum() + np.uint64(len(data))).astype(np.int64))
                    continue
                # rolling polynomial hash via cumulative powers (vectorized)
                powers = np.ones(window, dtype=np.uint64)
                for j in range(1, window):
                    powers[j] = powers[j - 1] * B
                strides = np.lib.stride_tricks.sliding_window_view(data, window)
                hashes = (strides * powers[::-1]).sum(axis=1)
                out[i] = np.int64(hashes.min().astype(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "fingerprint": out})

    return docs.select(id_col, text_col).mapInPandas(roll, f"{id_col} long, fingerprint long")


# ---------------------------------------------------------------------------
# PII redaction (the pipeline-side counterpart of the reference's email /
# phone EXTRACTION, alg.py:7-82: a training corpus wants them removed, a
# scraper wants them collected — same patterns, inverse operator)
# ---------------------------------------------------------------------------

# Patterns are written in the syntax subset shared by Java regex (Spark)
# and RE2 (DuckDB) — character classes, bounded repetition, optional
# groups, \b — so the DuckDB oracle can run the IDENTICAL pattern strings.
# Replacement order is part of the contract (each pattern runs over the
# previous pattern's output); counts are taken per-pattern on the ORIGINAL
# text. The email/phone shapes mirror the reference's extraction regexes
# (alg.py:29, alg.py:75) modulo the obfuscated-email variant, which is an
# extraction-only concern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]{1,64}@[A-Za-z0-9\-]+(\.[A-Za-z0-9\-]+)*\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"(\+\d{1,2}\s)?\(?\d{3}\)?[\s.\-]\d{3}[\s.\-]\d{4}", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mask emails / phone numbers / SSN-shaped ids / IPv4 addresses:
    (id, redacted_text, n_email, n_phone, n_ssn, n_ip, n_pii).

    Pure chained ``regexp_replace`` + ``regexp_extract_all`` column
    expressions — the whole operator is one codegen projection over the
    scan, no shuffle, no Python, so it fuses into whatever quality /
    repetition / langid stage already reads the text at 100 TB. Counts are
    per-pattern over the original text; the rewrite applies the patterns
    in PII_PATTERNS order over the running result.
    """
    text = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for name, pat, _ in PII_PATTERNS
    }
    redacted = text
    for _, pat, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, token)
    n_pii = None
    for name in counts:
        n_pii = counts[name] if n_pii is None else n_pii + counts[name]
    return docs.select(
        F.col(id_col),
        redacted.alias("redacted_text"),
        *[counts[name].cast("long").alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
        n_pii.cast("long").alias("n_pii"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, appendix A1.1) — the canonical
# composite document filter, as one codegen projection
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(
    docs: DataFrame,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc Gopher rule signals + the composite ``keep`` flag:
    (id, n_tokens, mean_word_len, symbol_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, n_stop_hits, keep).

    Every rule is a higher-order array / regex expression over the tokens
    and lines — one whole-stage-codegen projection, zero shuffle, zero
    Python, so at 100 TB the whole Gopher gate fuses into the scan stage
    that already reads the text (combine with :func:`repetition_signals`
    for the paper's repetition rules). Ratios are rounded to 6 places so
    the DuckDB oracle's identical double arithmetic compares exactly.
    """
    t = F.trim(F.col(text_col))
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )
    n = F.size(toks)
    nd = F.greatest(n, F.lit(1)).cast("double")
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) / nd, 6
    )
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ell = (F.length(t) - F.length(F.regexp_replace(t, "\\.\\.\\.", ""))) / 3
    symbol_ratio = F.round((n_hash + n_ell) / nd, 6)
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.round(
        F.size(
            F.filter(
                lines,
                lambda x: x.startswith("•") | x.startswith("-") | x.startswith("*"),
            )
        )
        / nl,
        6,
    )
    ellipsis = F.round(
        F.size(F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))) / nl,
        6,
    )
    alpha = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / nd, 6
    )
    low = F.transform(toks, lambda x: F.lower(x))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(low, w),
        )
    )
    keep = (
        (n >= min_tokens)
        & (n <= max_tokens)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet <= max_bullet_line_frac)
        & (ellipsis <= max_ellipsis_line_frac)
        & (alpha >= min_alpha_word_frac)
        & (stop_hits >= min_stop_hits)
    )
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet.alias("bullet_line_frac"),
        ellipsis.alias("ellipsis_line_frac"),
        alpha.alias("alpha_word_frac"),
        stop_hits.alias("n_stop_hits"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020, §2.2) — the other canonical
# corpus filter: per-LINE retention rules plus page-level drop rules, as one
# codegen projection
# ---------------------------------------------------------------------------

# a few entries from the public LDNOOBW list the paper cites; callers pass
# the full list in production
C4_BADWORDS = ("porn", "xxx", "viagra", "casino", "nude")

_TERMINAL = (".", "!", "?", '"', "”")


def c4_clean(
    docs: DataFrame,
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = C4_BADWORDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) as per-doc signals:
    (id, clean_text, n_lines, n_lines_kept, n_sentences, has_lorem,
    has_brace, n_badwords, keep).

    Line level (lines are ``\\n``-separated, trimmed): retain a line iff it
    ends in terminal punctuation (``. ! ? "`` — the paper's rule 1), has at
    least ``min_words_per_line`` whitespace words (rule 2b), and does not
    contain the word "javascript" (rule 4). ``clean_text`` re-joins the
    retained lines. Page level: drop the page when the retained text has
    fewer than ``min_sentences`` sentence-final marks (rule 2a; counted as
    ``[.!?]`` occurrences in ``clean_text``), when the ORIGINAL page
    contains "lorem ipsum" (rule 5) or a curly bracket (rule 6), or when
    any page word is on the badword list (rule 3; words = maximal
    ``[a-z0-9]+`` runs of the lowercased page). The paper's rule 7
    (three-sentence-span dedup) is corpus-level, not per-doc — use
    :func:`webscraping_spark.operators.dedup.remove_duplicate_spans`.

    Every rule is a higher-order array / regex expression — one
    whole-stage-codegen projection, zero shuffle, zero Python, so the
    cleaner fuses into the scan stage that already reads the text (stack
    with :func:`gopher_filter` / :func:`repetition_signals` for a combined
    quality pass at one scan's cost).
    """
    t = F.col(text_col)
    tl = F.transform(F.split(t, "\n"), lambda x: F.trim(x))

    def _line_kept(x):
        ends_ok = x.endswith(_TERMINAL[0])
        for mark in _TERMINAL[1:]:
            ends_ok = ends_ok | x.endswith(mark)
        return (
            (x != "")
            & (F.size(F.split(x, "\\s+")) >= min_words_per_line)
            & ends_ok
            & ~F.lower(x).contains("javascript")
        )

    nonempty = F.filter(tl, lambda x: x != "")
    kept = F.filter(tl, _line_kept)
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit("[.!?]"))
    words = F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != "")
    n_bad = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in badwords]),
            lambda w: F.array_contains(words, w),
        )
    )
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{") | t.contains("}")
    keep = (
        (n_sent >= min_sentences) & ~has_lorem & ~has_brace & (n_bad == 0)
    )
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(nonempty).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        n_sent.cast("int").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        n_bad.cast("int").alias("n_badwords"),
        keep.alias("keep"),
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """PMI-style collocation mining over the corpus — the phrase-discovery
    pass tokenizer/vocabulary work runs before merging multiword units:
    ``(w1, w2, n_pair, n_w1, n_w2, pmi_ratio)`` for consecutive
    (whitespace-token, lowercased) pairs seen >= ``min_count`` times.

    ``pmi_ratio`` is the POINTWISE-MUTUAL-INFORMATION RATIO in integer
    millionths — ``n_pair * N * 1e6 div (n_w1 * n_w2)`` with N the corpus
    token count, computed in DECIMAL(38,0) so a 10^13-token corpus cannot
    overflow the multiply — which ranks identically to PMI (log is
    monotone) while staying bit-exact across engines; an actual float log
    would differ in the last ulp between libm implementations and break
    the hash oracle.

    Shape: one posexplode-free pair construction per doc (zip of the
    token array with itself shifted — pure codegen), then TWO map-side-
    combinable groupBys (pairs, unigrams) and one broadcast-able join of
    the (tiny, min_count-filtered) pair table against unigram counts.
    The corpus text never rides an exchange — only counted keys do."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    base = docs.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col), toks.alias("_t"))
    pairs = base.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select(F.col("p.w1"), F.col("p.w2"))
    uni = base.select(F.explode("_t").alias("w")).groupBy("w").agg(
        F.count("*").alias("n_w")
    )
    n_total = uni.agg(F.sum("n_w")).first()[0] or 1
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_count))
    )
    j = (
        pair_counts.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))),
            "w2",
        )
    )
    return j.select(
        "w1",
        "w2",
        "n_pair",
        "n_w1",
        "n_w2",
        F.expr(
            f"CAST((CAST(n_pair AS DECIMAL(38,0)) * {int(n_total)} * 1000000)"
            " div (CAST(n_w1 AS DECIMAL(38,0)) * n_w2) AS BIGINT)"
        ).alias("pmi_ratio"),
    )
