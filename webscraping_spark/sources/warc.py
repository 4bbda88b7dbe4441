"""WARC 1.0 archive sink + source (ISO 28500, the Common Crawl / Heritrix
interchange format): write fetched pages as standard ``.warc`` /
``.warc.gz`` files, read WARC archives back into the fetched-pages table
shape — the bridge between this engine and the public crawl ecosystem
(a Common Crawl dump is exactly a directory of ``.warc.gz`` files).

Reference tie-in: the reference persists fetched pages into a sqlite
PersistentDict (pdict.py:42-259) — private, single-process. At corpus
scale the archival store must be an append-only interchange format other
tools can read; WARC response records carry the same (url, status,
headers, payload) tuple the reference caches.

Spark shape:

- **Sink**: one ``.warc[.gz]`` file per partition, written executor-side
  inside a single ``mapInPandas`` pass (Spark has no raw-bytes
  concatenation sink; the Arrow batch iterator IS the partition stream,
  so records stream to disk without materializing the partition). The
  returned manifest (one row per file: path, records, bytes) is the
  sink's output — and doubles as the completeness check.
- **Source**: ``binaryFile`` scan (one task per archive, the same
  parallelism-by-file model Common Crawl jobs use) -> ``mapInPandas``
  record parser. Request/metadata/warcinfo records are skipped; response
  records yield (url, date, status, content_type, payload).

Determinism: WARC-Date and WARC-Record-ID are pure functions of the row
(explicit ``date`` argument; record id = UUID from the md5 of
url+date+payload-length), so re-writing the same table produces
byte-identical archives — no clocks, no rand.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"
RECORD_SCHEMA = (
    "url string, warc_date string, status int, content_type string, "
    "payload binary"
)


def _record_id(url: str, date: str, length: int) -> bytes:
    h = hashlib.md5(f"{url}|{date}|{length}".encode()).hexdigest()
    uuid = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
    return f"<urn:uuid:{uuid}>".encode()


def format_response_record(
    url: str,
    payload: bytes,
    date: str,
    status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """One WARC response record wrapping a minimal HTTP/1.1 response
    block, trailed by the mandatory blank line pair (ISO 28500 §4)."""
    http = (
        f"HTTP/1.1 {status} {'OK' if status == 200 else 'X'}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload
    headers = [
        WARC_VERSION,
        b"WARC-Type: response",
        b"WARC-Record-ID: " + _record_id(url, date, len(payload)),
        f"WARC-Date: {date}".encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: application/http; msgtype=response",
        f"Content-Length: {len(http)}".encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF


def write_warc(
    fetched: DataFrame,
    out_dir: str,
    date: str = "2024-01-01T00:00:00Z",
    url_col: str = "url",
    payload_col: str = "payload",
    status_col: str | None = None,
    compress: bool = True,
    prefix: str = "part",
) -> DataFrame:
    """Write one ``{prefix}-{partition:05d}.warc[.gz]`` file per partition
    of ``fetched`` under ``out_dir``; returns the manifest DataFrame
    (path, n_records, n_bytes — collect it to force the write; it is the
    job's only driver-side data). Payloads may be BINARY or STRING
    (utf-8-encoded). Partitioning is the caller's lever: upstream
    ``repartition(k)`` chooses the archive count exactly like the CSV
    sink's fan-out."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [F.col(url_col).alias("u"), F.col(payload_col).alias("p")]
    cols.append(
        (F.col(status_col) if status_col else F.lit(200)).cast("int").alias("s")
    )
    src = fetched.select(*cols)
    ext = ".warc.gz" if compress else ".warc"

    def writer(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}{ext}")
        n = 0
        raw = 0
        f = open(path, "wb")
        gz = gzip.GzipFile(fileobj=f, mode="wb", mtime=0) if compress else f
        try:
            for pdf in batches:
                for u, p, s in zip(pdf["u"], pdf["p"], pdf["s"]):
                    payload = (
                        p.encode() if isinstance(p, str) else bytes(p or b"")
                    )
                    rec = format_response_record(
                        u, payload, date, status=int(s)
                    )
                    gz.write(rec)
                    n += 1
                    raw += len(rec)
        finally:
            if compress:
                gz.close()
            f.close()
        if n == 0:
            os.remove(path)  # no empty archives
            yield pd.DataFrame(
                {"path": [], "n_records": [], "n_bytes": []}
            ).astype({"path": "object", "n_records": "int64", "n_bytes": "int64"})
            return
        yield pd.DataFrame(
            {"path": [path], "n_records": [n], "n_bytes": [raw]}
        )

    return src.mapInPandas(writer, MANIFEST_SCHEMA)


def _iter_decompressed(data: bytes) -> bytes:
    """Whole buffer, transparently handling plain WARC, whole-file gzip,
    and Common Crawl's concatenated per-record gzip members."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        out.write(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return out.getvalue()


def parse_warc(data: bytes) -> list[tuple[str, str, int, str, bytes]]:
    """RECORD_SCHEMA tuples from one archive's bytes. Only ``response``
    records are yielded (request/metadata/warcinfo/resource skipped);
    the HTTP status line and Content-Type come from the embedded HTTP
    block; the payload is the HTTP body."""
    data = _iter_decompressed(data)
    out = []
    pos = 0
    while True:
        start = data.find(WARC_VERSION, pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        date = headers.get("warc-date", "")
        status, ctype, payload = 0, "", block
        http_end = block.find(_CRLF + _CRLF)
        if block.startswith(b"HTTP/") and http_end >= 0:
            http_lines = block[:http_end].split(_CRLF)
            parts = http_lines[0].decode("utf-8", "replace").split(" ")
            status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
            for line in http_lines[1:]:
                k, _, v = line.decode("utf-8", "replace").partition(":")
                if k.strip().lower() == "content-type":
                    ctype = v.strip()
            payload = block[http_end + 4 :]
        out.append((url, date, status, ctype, payload))
    return out


def read_warc(spark, path: str) -> DataFrame:
    """Distributed WARC ingest: a ``binaryFile`` scan (one task per
    archive — Common Crawl's own parallelism model, since gzip members
    don't split) feeding the record parser in Arrow batches."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc(bytes(content)))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_date", "status", "content_type", "payload"],
            ).astype({"status": "int32"}) if rows else pd.DataFrame(
                {
                    "url": pd.Series([], dtype="object"),
                    "warc_date": pd.Series([], dtype="object"),
                    "status": pd.Series([], dtype="int32"),
                    "content_type": pd.Series([], dtype="object"),
                    "payload": pd.Series([], dtype="object"),
                }
            )

    return files.select("content").mapInPandas(parse, RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# WET / WAT derivation (Common Crawl's companion formats: a WET file holds
# one "conversion" record of extracted plain text per capture; a WAT file
# holds one "metadata" record of JSON page metadata). The derivations are
# pure codegen projections over the fetched-pages table; only the file
# sinks touch Python (the same mapInPandas streaming-writer shape as
# write_warc). Text extraction follows the WET convention — WHOLE-page
# text with scripts/styles dropped — not boilerplate removal; the
# jusText-style main-content stage is operators/content.py and feeds
# curation, while WET feeds interchange.
# ---------------------------------------------------------------------------

_WET_STRIP = (
    r"(?is)<script\b.*?</script>",
    r"(?is)<style\b.*?</style>",
    r"(?is)<noscript\b.*?</noscript>",
    r"(?s)<!--.*?-->",
)
_TITLE_PATTERN = r"(?is)<title\b[^>]*>(.*?)</title>"


def wet_text_col(html):
    """Whole-page visible text (the WET conversion payload): scripts/
    styles/comments dropped, tags stripped, the five XML entities +
    &nbsp; decoded (amp last), whitespace collapsed. '' for an
    empty/markup-only page."""
    from webscraping_spark.operators.sitemap import xml_unescape_col

    s = html
    for pat in _WET_STRIP:
        s = F.regexp_replace(s, pat, " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    s = xml_unescape_col(F.replace(s, F.lit("&nbsp;"), F.lit(" ")))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def wet_records(
    fetched: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, text, n_chars) — one WET conversion row per capture. One
    codegen projection: zero shuffle, zero Python; fuses into the scan
    that already reads the page."""
    text = wet_text_col(F.col(html_col))
    return fetched.select(
        F.col(url_col).alias("url"),
        text.alias("text"),
        F.length(text).alias("n_chars"),
    )


def wat_records(
    fetched: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, title, links, n_links) — one WAT metadata row per capture:
    cleaned <title> text (NULL when absent/blank) and the raw href list
    in document order (the same anchor set as the crawl plan's link
    extractor, udfs.find_links_col). Codegen only; ``write_wat``
    serializes these to JSON metadata records."""
    from webscraping_spark.functions.udfs import find_links_col
    from webscraping_spark.operators.harvest import clean_text_col

    html = F.col(html_col)
    links = find_links_col(html)
    return fetched.select(
        F.col(url_col).alias("url"),
        clean_text_col(F.regexp_extract(html, _TITLE_PATTERN, 1)).alias("title"),
        links.alias("links"),
        F.size(links).alias("n_links"),
    )


def format_conversion_record(url: str, text: bytes, date: str) -> bytes:
    """One WARC conversion record (the WET payload is bare UTF-8 text,
    no HTTP block — ISO 28500 §6.8 / the Common Crawl WET layout)."""
    headers = [
        WARC_VERSION,
        b"WARC-Type: conversion",
        b"WARC-Record-ID: " + _record_id(url, date, len(text)),
        f"WARC-Date: {date}".encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: text/plain",
        f"Content-Length: {len(text)}".encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + text + _CRLF + _CRLF


def format_metadata_record(url: str, meta_json: bytes, date: str) -> bytes:
    """One WARC metadata record with a JSON payload (the WAT layout)."""
    headers = [
        WARC_VERSION,
        b"WARC-Type: metadata",
        b"WARC-Record-ID: " + _record_id(url, date, len(meta_json)),
        f"WARC-Date: {date}".encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: application/json",
        f"Content-Length: {len(meta_json)}".encode(),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + meta_json + _CRLF + _CRLF


def _stream_records(src, out_dir, ext, fmt_one, compress, prefix):
    os.makedirs(out_dir, exist_ok=True)

    def writer(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}{ext}")
        n = 0
        raw = 0
        f = open(path, "wb")
        gz = gzip.GzipFile(fileobj=f, mode="wb", mtime=0) if compress else f
        try:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    rec = fmt_one(row)
                    gz.write(rec)
                    n += 1
                    raw += len(rec)
        finally:
            if compress:
                gz.close()
            f.close()
        if n == 0:
            os.remove(path)
            yield pd.DataFrame(
                {"path": [], "n_records": [], "n_bytes": []}
            ).astype({"path": "object", "n_records": "int64", "n_bytes": "int64"})
            return
        yield pd.DataFrame({"path": [path], "n_records": [n], "n_bytes": [raw]})

    return src.mapInPandas(writer, MANIFEST_SCHEMA)


def write_wet(
    fetched: DataFrame,
    out_dir: str,
    date: str = "2024-01-01T00:00:00Z",
    html_col: str = "html",
    url_col: str = "url",
    compress: bool = True,
    prefix: str = "wet",
) -> DataFrame:
    """Write ``{prefix}-{partition:05d}.warc.wet[.gz]`` conversion files
    (text extraction runs JVM-side; Python only streams bytes to disk).
    Returns the manifest DataFrame — collect it to force the write."""
    src = wet_records(fetched, html_col=html_col, url_col=url_col).select(
        "url", "text"
    )
    ext = ".warc.wet.gz" if compress else ".warc.wet"
    return _stream_records(
        src, out_dir, ext,
        lambda r: format_conversion_record(r.url, r.text.encode("utf-8"), date),
        compress, prefix,
    )


def write_wat(
    fetched: DataFrame,
    out_dir: str,
    date: str = "2024-01-01T00:00:00Z",
    html_col: str = "html",
    url_col: str = "url",
    compress: bool = True,
    prefix: str = "wat",
) -> DataFrame:
    """Write ``{prefix}-{partition:05d}.warc.wat[.gz]`` metadata files;
    the JSON payload is built JVM-side (to_json over the wat_records
    struct — deterministic field order)."""
    recs = wat_records(fetched, html_col=html_col, url_col=url_col)
    src = recs.select(
        "url",
        F.to_json(F.struct("url", "title", "links", "n_links")).alias("meta"),
    )
    ext = ".warc.wat.gz" if compress else ".warc.wat"
    return _stream_records(
        src, out_dir, ext,
        lambda r: format_metadata_record(r.url, r.meta.encode("utf-8"), date),
        compress, prefix,
    )


def read_wet(spark, path: str) -> DataFrame:
    """WET conversion files -> (url, warc_date, text)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                data = _iter_decompressed(bytes(content))
                pos = 0
                while True:
                    start = data.find(WARC_VERSION, pos)
                    if start < 0:
                        break
                    hdr_end = data.find(_CRLF + _CRLF, start)
                    if hdr_end < 0:
                        break
                    headers = {}
                    for line in data[start:hdr_end].split(_CRLF)[1:]:
                        k, _, v = line.decode("utf-8", "replace").partition(":")
                        headers[k.strip().lower()] = v.strip()
                    length = int(headers.get("content-length", "0"))
                    block = data[hdr_end + 4 : hdr_end + 4 + length]
                    pos = hdr_end + 4 + length
                    if headers.get("warc-type") != "conversion":
                        continue
                    rows.append(
                        (
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            block.decode("utf-8", "replace"),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_date", "text"]
            ) if rows else pd.DataFrame(
                {
                    "url": pd.Series([], dtype="object"),
                    "warc_date": pd.Series([], dtype="object"),
                    "text": pd.Series([], dtype="object"),
                }
            )

    return files.select("content").mapInPandas(
        parse, "url string, warc_date string, text string"
    )


def payload_sha1_b32(payload: bytes) -> str:
    """``sha1:<base32>`` payload digest — the WARC-Payload-Digest
    convention Common Crawl uses (RFC 4648 base32 of the raw sha-1)."""
    import base64

    return "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode()


def format_revisit_record(
    url: str, date: str, refers_to: str, payload_digest: str
) -> bytes:
    """One WARC revisit record under the identical-payload-digest profile
    (WARC 1.1 §6.7.2) — the record Common Crawl emits instead of storing
    an unchanged page twice: no payload block, WARC-Refers-To names the
    original capture's record id, WARC-Payload-Digest repeats the shared
    digest."""
    headers = [
        WARC_VERSION,
        b"WARC-Type: revisit",
        b"WARC-Record-ID: " + _record_id(url, date, 0),
        f"WARC-Date: {date}".encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
        b"identical-payload-digest",
        b"WARC-Refers-To: " + refers_to.encode(),
        b"WARC-Payload-Digest: " + payload_digest.encode(),
        b"Content-Length: 0",
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + _CRLF + _CRLF


def write_warc_deduped(
    fetched: DataFrame,
    prior: DataFrame,
    out_dir: str,
    date: str = "2024-01-02T00:00:00Z",
    url_col: str = "url",
    payload_col: str = "payload",
    compress: bool = True,
    prefix: str = "part",
) -> DataFrame:
    """``write_warc`` with archival dedup against a PRIOR crawl: a row
    whose payload sha-1 matches ``prior``'s digest for the same URL is
    written as a zero-payload revisit record referring to the original
    capture; changed or new pages get full response records. ``prior`` is
    ``(url, payload_digest, record_id)`` — derivable from the previous
    crawl's manifest or its parsed archives. At Common Crawl scale most
    of a monthly crawl is unchanged, so this is where the archive's size
    budget is won. Returns the same (path, n_records, n_bytes) manifest,
    plus n_revisits."""
    os.makedirs(out_dir, exist_ok=True)
    src = fetched.select(
        F.col(url_col).alias("u"), F.col(payload_col).alias("p")
    ).join(
        prior.select(
            F.col("url").alias("u"),
            F.col("payload_digest").alias("_pd"),
            F.col("record_id").alias("_rid"),
        ),
        "u",
        "left",
    )
    ext = ".warc.gz" if compress else ".warc"

    def writer(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}{ext}")
        n = rev = 0
        raw = 0
        f = open(path, "wb")
        gz = gzip.GzipFile(fileobj=f, mode="wb", mtime=0) if compress else f
        try:
            for pdf in batches:
                for u, p, pd_, rid in zip(
                    pdf["u"], pdf["p"], pdf["_pd"], pdf["_rid"]
                ):
                    payload = p.encode() if isinstance(p, str) else bytes(p or b"")
                    digest = payload_sha1_b32(payload)
                    if pd_ is not None and rid is not None and digest == pd_:
                        rec = format_revisit_record(u, date, rid, digest)
                        rev += 1
                    else:
                        rec = format_response_record(u, payload, date)
                    gz.write(rec)
                    n += 1
                    raw += len(rec)
        finally:
            if compress:
                gz.close()
            f.close()
        if n == 0:
            os.remove(path)
            yield pd.DataFrame(
                {"path": [], "n_records": [], "n_bytes": [], "n_revisits": []}
            ).astype(
                {
                    "path": "object",
                    "n_records": "int64",
                    "n_bytes": "int64",
                    "n_revisits": "int64",
                }
            )
            return
        yield pd.DataFrame(
            {"path": [path], "n_records": [n], "n_bytes": [raw], "n_revisits": [rev]}
        )

    return src.mapInPandas(
        writer, MANIFEST_SCHEMA + ", n_revisits long"
    )
