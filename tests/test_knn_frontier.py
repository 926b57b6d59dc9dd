"""kNN join-frontier checkpointing: kill-after-round-1 then resume must
produce exactly the uncheckpointed (and brute-force) result."""

import os

import numpy as np
import pytest

from erased_cells_spark.operators.knn import knn_join, knn_np
from erased_cells_spark.pipeline import geocoded_pages
from erased_cells_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pts(spark):
    pages = generate_pages(spark, 3000, 42)
    return geocoded_pages(pages, use_extracted_text=False).select("url", "lon", "lat").cache()


def queries():
    rng = np.random.default_rng(123)
    return [
        {"q_id": i, "lon": float(rng.uniform(-170, 170)), "lat": float(rng.uniform(-80, 80))}
        for i in range(12)
    ]


class TestKnnFrontier:
    def test_kill_and_resume_identical(self, spark, pts, tmp_path):
        qs = queries()
        ckpt = str(tmp_path / "frontier")

        # phase 1: "crash" after one committed round (max_rounds=1)
        partial = knn_join(pts, qs, k=5, res=7, max_rounds=1, checkpoint_dir=ckpt)
        partial.count()  # drive the round + commit
        assert os.path.exists(os.path.join(ckpt, "CURRENT"))
        with open(os.path.join(ckpt, "CURRENT")) as f:
            assert int(f.read()) == 1

        # phase 2: resume from the committed frontier
        resumed = knn_join(pts, qs, k=5, res=7, checkpoint_dir=ckpt)
        got = {(r.q_id, r.rank): r.nn_id for r in resumed.collect()}

        local = pts.toPandas()
        want = knn_np(local.lon.to_numpy(), local.lat.to_numpy(), local.url.tolist(), qs, k=5)
        assert len(got) == len(want)
        for qid, nn, _, rank in want:
            assert got[(qid, rank)] == nn

    def test_no_checkpoint_still_exact(self, spark, pts):
        qs = queries()
        got = {(r.q_id, r.rank): r.nn_id for r in knn_join(pts, qs, k=5, res=7).collect()}
        local = pts.toPandas()
        want = knn_np(local.lon.to_numpy(), local.lat.to_numpy(), local.url.tolist(), qs, k=5)
        for qid, nn, _, rank in want:
            assert got[(qid, rank)] == nn
