"""WARC ingestion source — the actual Common-Crawl container format
(public spec: ISO 28500 / WARC 1.0). Closes the ingest gap between "a
pages parquet appears" and the north rule's Common-Crawl reality: crawls
arrive as .warc / .warc.gz member files, each a sequence of records
(`WARC/1.0\\r\\n` header block, CRLF-separated named fields, blank line,
Content-Length payload, blank line ×2).

Distributed shape (the standard one for WARC on Spark): gzip WARCs are
NOT splittable, so the parallel unit is the FILE — Common Crawl ships
~1 GB member files in the tens of thousands per crawl, far more files
than executors, so file-granular parallelism saturates a 1000-executor
cluster without any splitting cleverness. The scan is
`spark.read.format("binaryFile")` (one row per file, content as bytes) →
`mapInPandas` parsing each file's records with a pure-python parser and
emitting the engine's pages shape (url, warc_ts, html, text='', lang='')
— downstream extraction/language-id fill text/lang exactly as for the
synthetic table. Record-level contracts: only `WARC-Type: response`
records yield pages; HTTP headers are stripped from the payload (body
starts after the first CRLFCRLF); malformed records fail loudly with the
file path and byte offset (a silent skip at crawl scale is data loss).

`warc_write_gz` builds deterministic fixture WARCs from pages rows (the
testing twin — also proves the parser against a second, independent
serialization path).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from erased_cells_spark.sources.pages import PAGES_SCHEMA


class WarcFormatError(ValueError):
    """Malformed WARC record (bad version line, missing mandatory header,
    truncated payload) — carries file path + byte offset."""


def _parse_records(data: bytes, origin: str = "<bytes>"):
    """Yield (headers: dict, payload: bytes) per record. Pure python —
    runs inside the executor-side mapInPandas batches."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos: pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise WarcFormatError(f"{origin}@{pos}: unterminated record header")
        head = data[pos: head_end].decode("utf-8", errors="strict")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise WarcFormatError(
                f"{origin}@{pos}: expected WARC version line, got {lines[0][:40]!r}"
            )
        headers = {}
        for line in lines[1:]:
            if ":" not in line:
                raise WarcFormatError(f"{origin}@{pos}: malformed header line {line[:60]!r}")
            k, v = line.split(":", 1)
            headers[k.strip()] = v.strip()
        if "Content-Length" not in headers:
            raise WarcFormatError(f"{origin}@{pos}: record missing Content-Length")
        clen = int(headers["Content-Length"])
        body_start = head_end + 4
        if body_start + clen > n:
            raise WarcFormatError(
                f"{origin}@{pos}: truncated payload (want {clen} bytes, "
                f"have {n - body_start})"
            )
        yield headers, data[body_start: body_start + clen]
        pos = body_start + clen


def _http_body(payload: bytes) -> bytes:
    """Response records carry an HTTP message; the page bytes start after
    the first blank line. A payload without HTTP headers passes through."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def _parse_ts(v: str) -> datetime:
    # WARC-Date is ISO-8601 Zulu, e.g. 2025-03-04T05:06:07Z
    return datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)


def pages_from_file_bytes(path: str, content: bytes) -> list[dict]:
    """All response-record pages of one (possibly gzipped) WARC file."""
    if content[:2] == b"\x1f\x8b":
        content = gzip.decompress(content)
    out = []
    for headers, payload in _parse_records(content, origin=path):
        if headers.get("WARC-Type") != "response":
            continue
        url = headers.get("WARC-Target-URI")
        date = headers.get("WARC-Date")
        if url is None or date is None:
            raise WarcFormatError(
                f"{path}: response record missing WARC-Target-URI/WARC-Date"
            )
        out.append(
            {
                "url": url,
                "warc_ts": _parse_ts(date).replace(tzinfo=None),
                "html": _http_body(payload),
                "text": "",
                "lang": "",
            }
        )
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """`spark.read.format('binaryFile')` over .warc/.warc.gz files →
    pages-shaped DataFrame (url, warc_ts, html, text='', lang=''). One
    task per file (gzip members are unsplittable; crawl file counts dwarf
    executor counts, so this is the right parallel grain); the parser is
    pure python per Arrow batch, no driver involvement."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.extend(pages_from_file_bytes(r.path, bytes(r.content)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_SCHEMA.fields]
            )

    return files.mapInPandas(run, PAGES_SCHEMA)


def warc_write_gz(pages_rows: list[dict], out_path: str) -> None:
    """Serialize pages rows as a gzipped WARC/1.0 file of response records
    (an independent writer used to fixture the parser — and the shape a
    re-crawl exporter would emit)."""
    buf = io.BytesIO()
    for r in pages_rows:
        html = bytes(r["html"])
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        ts = r["warc_ts"]
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        buf.write(head + b"\r\n" + http + b"\r\n\r\n")
    with gzip.open(out_path, "wb") as f:
        f.write(buf.getvalue())
