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
