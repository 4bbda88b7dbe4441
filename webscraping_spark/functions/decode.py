"""Bytes → text decode stage: charset sniffing + transfer decoding.

Reference semantics transcribed exactly:

- ``html_to_unicode`` (common.py:109-116): regex-sniff
  ``<meta[^<>]*charset=\\s*([a-z\\d\\-]+)`` (IGNORECASE) and decode with the
  sniffed charset, else the default; decode errors are ignored
  (common.py:100-106 ``obj.decode(encoding, 'ignore')``). Note the
  reference quirk, preserved: a QUOTED ``<meta charset="utf-8">`` does not
  match (the quote breaks the group), only unquoted variants and
  ``content="text/html; charset=utf-8"`` forms sniff.
- gzip/deflate transfer decoding (download.py:397-398, 419-423): gzip via
  the 16+MAX_WBITS window, deflate raw-or-zlib (urllib servers disagree;
  the reference's opener handles both).

Spark bindings are Arrow-batched pandas UDFs over BINARY columns — the
only place Python touches the bytes, one batch at a time.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_ENCODING = "utf-8"  # settings.default_encoding (settings.py)

# bytes twin of the reference's text regex (common.py:112) — the sniff must
# run BEFORE any decode, so it operates on the raw payload
_CHARSET_RE = re.compile(rb"<meta[^<>]*charset=\s*([a-z\d\-]+)", re.IGNORECASE)


def sniff_charset(raw: bytes, default: str = DEFAULT_ENCODING) -> str:
    """Charset from a ``<meta ... charset=...>`` tag, else ``default``."""
    if not raw:
        return default
    m = _CHARSET_RE.search(raw)
    if m:
        return m.group(1).decode("ascii", "ignore").strip().lower()
    return default


def html_to_unicode(raw: bytes | str | None, default: str = DEFAULT_ENCODING) -> str:
    """Decode raw html bytes honoring the sniffed charset
    (common.py:109-116); unknown charsets and decode errors degrade the way
    the reference's ``decode(..., 'ignore')`` does."""
    if raw is None:
        return ""
    if isinstance(raw, str):
        return raw
    charset = sniff_charset(raw, default)
    try:
        return raw.decode(charset, "ignore")
    except LookupError:  # bogus charset name in the page
        return raw.decode(default, "ignore")


def decode_transfer(raw: bytes | None, content_encoding: str | None) -> bytes:
    """gzip/deflate transfer decoding (download.py:419-423)."""
    if raw is None:
        return b""
    enc = (content_encoding or "").lower()
    if "gzip" in enc:
        return zlib.decompress(raw, 16 + zlib.MAX_WBITS)
    if "deflate" in enc:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return zlib.decompress(raw, -zlib.MAX_WBITS)
    return raw


@F.pandas_udf(T.StringType())
def html_to_unicode_udf(raw: pd.Series) -> pd.Series:
    return pd.Series(
        [html_to_unicode(b) for b in raw],
        index=raw.index,
        dtype="object",
    )


@F.pandas_udf(T.StringType())
def decode_and_sniff_udf(raw: pd.Series, content_encoding: pd.Series) -> pd.Series:
    """Transfer-decode then charset-decode in one Arrow pass."""
    out = []
    for b, enc in zip(raw, content_encoding):
        out.append(html_to_unicode(decode_transfer(b, enc)))
    return pd.Series(out, index=raw.index, dtype="object")


def decode_html_bytes(pages: DataFrame) -> DataFrame:
    """Fill a NULL ``html`` column from a raw ``html_bytes`` BINARY column
    (the live-fetch shape: payload arrives as bytes + optional
    ``content_encoding``). Pages that already carry decoded html pass
    through untouched; the decode runs only where needed."""
    if "html_bytes" not in pages.columns:
        return pages
    enc = (
        F.col("content_encoding")
        if "content_encoding" in pages.columns
        else F.lit(None).cast("string")
    )
    decoded = F.when(
        F.col("html").isNull() & F.col("html_bytes").isNotNull(),
        decode_and_sniff_udf(F.col("html_bytes"), enc),
    ).otherwise(F.col("html"))
    return pages.withColumn("html", decoded).drop("html_bytes")
