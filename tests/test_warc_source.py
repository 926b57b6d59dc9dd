"""WARC ingestion source (r6): .warc.gz files → the engine's pages shape
via a binaryFile scan + per-file pure-python parsing. Contracts: a crawl
round-trips through the independent writer byte-identically (url order,
timestamps, html bytes); HTTP headers are stripped; non-response records
are skipped; malformed records fail loudly with file + offset; the parsed
pages flow straight into the flagship extraction pipeline."""

import gzip

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.pages import generate_pages
from erased_cells_spark.sources.warc import (
    WarcFormatError,
    _parse_records,
    pages_from_file_bytes,
    read_warc,
    warc_write_gz,
)


@pytest.fixture(scope="module")
def page_rows(spark):
    return (
        generate_pages(spark, 200, seed=11)
        .select("url", "warc_ts", "html", "text", "lang")
        .collect()
    )


def write_crawl(tmp_path, page_rows, n_files=4):
    rows = [r.asDict() for r in page_rows]
    per = len(rows) // n_files
    for i in range(n_files):
        warc_write_gz(rows[i * per: (i + 1) * per], str(tmp_path / f"crawl-{i:02d}.warc.gz"))
    return str(tmp_path)


class TestWarcRead:
    def test_round_trip_byte_identical(self, spark, page_rows, tmp_path):
        path = write_crawl(tmp_path, page_rows)
        got = read_warc(spark, path)
        assert got.count() == (len(page_rows) // 4) * 4
        want = {r.url: (r.warc_ts, bytes(r.html)) for r in page_rows}
        for r in got.collect():
            ts, html = want[r.url]
            assert r.warc_ts == ts
            assert bytes(r.html) == html  # byte-identical through HTTP framing

    def test_parsed_pages_feed_the_flagship_pipeline(self, spark, page_rows, tmp_path):
        """The ingest contract that matters: extraction over WARC-parsed
        pages is byte-identical to the synthetic table's text."""
        from erased_cells_spark.functions.text import extract_text

        path = write_crawl(tmp_path, page_rows)
        pages = read_warc(spark, path)
        extracted = pages.withColumn("extracted", extract_text(F.col("html")))
        want = {r.url: r.text for r in page_rows}
        for r in extracted.select("url", "extracted").collect():
            assert r.extracted == want[r.url]

    def test_non_response_records_skipped(self, tmp_path):
        body = b"software: test"
        rec = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
            + str(len(body)).encode()
            + b"\r\n\r\n"
            + body
            + b"\r\n\r\n"
        )
        http = b"HTTP/1.1 200 OK\r\n\r\n<html>x</html>"
        rec2 = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://a/\r\nWARC-Date: 2025-01-02T03:04:05Z\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http + b"\r\n\r\n"
        )
        pages = pages_from_file_bytes("<t>", rec + rec2)
        assert len(pages) == 1
        assert pages[0]["url"] == "http://a/"
        assert bytes(pages[0]["html"]) == b"<html>x</html>"  # HTTP headers stripped

    def test_malformed_records_fail_loudly(self):
        with pytest.raises(WarcFormatError, match="version line"):
            list(_parse_records(b"NOTWARC/1.0\r\nX: y\r\n\r\nbody"))
        with pytest.raises(WarcFormatError, match="Content-Length"):
            list(_parse_records(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"))
        ok = b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
        with pytest.raises(WarcFormatError, match="truncated"):
            list(_parse_records(ok))
        with pytest.raises(WarcFormatError, match="response record missing"):
            pages_from_file_bytes(
                "<t>",
                b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 1\r\n\r\nx\r\n\r\n",
            )

    def test_plain_and_gz_both_accepted(self, tmp_path, page_rows):
        rows = [r.asDict() for r in page_rows[:3]]
        gz = tmp_path / "a.warc.gz"
        warc_write_gz(rows, str(gz))
        raw = gzip.decompress(gz.read_bytes())
        assert len(pages_from_file_bytes("<gz>", gz.read_bytes())) == 3
        assert len(pages_from_file_bytes("<raw>", raw)) == 3
