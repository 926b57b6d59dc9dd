"""Streaming flagship: the pages stream → extract/geocode/PIP → snapshot
path must produce EXACTLY the batch pipeline's containment pairs, commit one
lineage partition per micro-batch, and not double-commit on restart."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.pipeline import geocoded_pages
from erased_cells_spark.operators.pip import pip_join
from erased_cells_spark.sources.pages import generate_pages
from erased_cells_spark.sources.snapshot import SnapshotTable
from erased_cells_spark.spatial.geom import make_polygon_fixtures
from erased_cells_spark.streaming.pages import stream_pages_to_snapshot

N_PAGES = 1500


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages_stream") / "pages")
    # 3 files → 3 micro-batches at maxFilesPerTrigger=1
    generate_pages(spark, N_PAGES, 42).repartition(3).write.parquet(path)
    return path


class TestStreamingPages:
    def test_stream_equals_batch_flagship(self, spark, pages_dir, tmp_path):
        polys = make_polygon_fixtures(64, seed=42)
        tbl = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "ckpt")
        q = stream_pages_to_snapshot(spark, pages_dir, tbl, polys, checkpoint=ckpt)
        q.awaitTermination(300)

        table = SnapshotTable(tbl)
        m = table.metrics()
        assert m["n_partitions"] == 3  # one lineage commit per micro-batch
        got_df = table.read(spark)
        got = {(r.url, r.poly_id) for r in got_df.collect()}

        # batch twin on the same input
        pages = spark.read.parquet(pages_dir)
        pts = geocoded_pages(pages, use_extracted_text=False).select("url", "lon", "lat")
        want = {(r.url, r.poly_id) for r in pip_join(pts, polys).collect()}
        assert got == want and len(want) > 0

        # extraction rode along byte-identically (north-rule invariant)
        bad = (
            got_df.join(pages.select("url", "text"), "url")
            .filter(F.col("extracted") != F.col("text"))
            .count()
        )
        assert bad == 0

    def test_restart_does_not_double_commit(self, spark, pages_dir, tmp_path):
        polys = make_polygon_fixtures(16, seed=7)
        tbl = str(tmp_path / "tbl2")
        ckpt = str(tmp_path / "ckpt2")
        q = stream_pages_to_snapshot(spark, pages_dir, tbl, polys, checkpoint=ckpt)
        q.awaitTermination(300)
        rows_first = SnapshotTable(tbl).metrics()["total_rows"]
        # restart with the same checkpoint: no new files → no new commits
        q2 = stream_pages_to_snapshot(
            spark, pages_dir, tbl, polys, checkpoint=ckpt, query_name="pages_to_snapshot2"
        )
        q2.awaitTermination(120)
        assert SnapshotTable(tbl).metrics()["total_rows"] == rows_first
