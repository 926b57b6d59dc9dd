"""End-to-end CDC composition (r6): WARC crawl segments → pages snapshot
table (run_ingest) → incremental curation (run_curation --src-table).
Each crawl drop lands as one appended-partition delta; the downstream
curation re-run scans ZERO old-batch partitions and the keep list grows
only with the new segment's docs. Also: same-batch re-ingest resumes."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.pages import generate_pages
from erased_cells_spark.sources.snapshot import SnapshotTable
from erased_cells_spark.sources.warc import warc_write_gz
from jobs.run_curation import run_incremental
from jobs.run_ingest import ingest_warc_batch


@pytest.fixture(scope="module")
def crawl_dirs(spark, tmp_path_factory):
    """Two crawl segments of synthetic pages serialized as real WARCs."""
    rows = [
        r.asDict()
        for r in generate_pages(spark, 400, seed=23)
        .select("url", "warc_ts", "html", "text", "lang")
        .collect()
    ]
    root = tmp_path_factory.mktemp("crawl")
    seg0, seg1 = root / "seg0", root / "seg1"
    seg0.mkdir(), seg1.mkdir()
    warc_write_gz(rows[:250], str(seg0 / "a.warc.gz"))
    warc_write_gz(rows[250:], str(seg1 / "b.warc.gz"))
    return str(seg0), str(seg1), rows


class TestIngestToCuration:
    def test_crawl_to_keep_list_incrementally(self, spark, crawl_dirs, tmp_path):
        seg0, seg1, rows = crawl_dirs
        pages_tbl = str(tmp_path / "pages")
        keep_tbl = str(tmp_path / "keep")

        r0 = ingest_warc_batch(spark, seg0, pages_tbl, batch="b0", buckets=4)
        assert r0["rows"] == 250 and not r0["skipped"]
        # derived keys present; text byte-identical to the synthetic source
        tbl = SnapshotTable(pages_tbl)
        got = {r.url: r.text for r in tbl.read(spark).select("url", "text").collect()}
        want = {r["url"]: r["text"] for r in rows[:250]}
        assert got == want

        ev_source = sorted(
            r.source for r in tbl.read(spark).select("source").distinct().collect()
        )[0]
        c0 = run_incremental(spark, pages_tbl, keep_tbl, eval_source=ev_source, buckets=4)
        assert c0["mode"] == "full"

        # second crawl drop: one appended delta end to end
        r1 = ingest_warc_batch(spark, seg1, pages_tbl, batch="b1", buckets=4)
        assert r1["rows"] == 150 and r1["snapshot"] > r0["snapshot"]
        c1 = run_incremental(spark, pages_tbl, keep_tbl, eval_source=ev_source, buckets=4)
        assert c1["mode"] == "incremental"
        assert c1["changes_scan"]["scanned_from"] == 0  # zero old-batch rescan

        # re-ingesting the SAME batch resumes: every partition skips
        r2 = ingest_warc_batch(spark, seg0, pages_tbl, batch="b0", buckets=4)
        assert len(r2["skipped"]) == 4
        c2 = run_incremental(spark, pages_tbl, keep_tbl, eval_source=ev_source, buckets=4)
        assert c2["mode"] == "noop"
