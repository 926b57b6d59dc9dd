"""Spatially-clustered layout: row-group cell spans must shrink by orders of
magnitude vs the unclustered layout (footer-stats prunability), with the
data itself unchanged."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.cells_expr import cell_key_expr
from erased_cells_spark.sources.layout import (
    rowgroup_cell_spans,
    write_spatially_clustered,
)

RES = 12


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(37)
    pdf = pd.DataFrame(
        {
            "pid": range(20_000),
            "lon": rng.uniform(-180, 180, 20_000),
            "lat": rng.uniform(-85, 85, 20_000),
        }
    )
    return spark.createDataFrame(pdf)


class TestClusteredLayout:
    def test_spans_shrink_and_data_survives(self, spark, points, tmp_path):
        plain = str(tmp_path / "plain")
        clustered = str(tmp_path / "clustered")
        points.withColumn("cell", cell_key_expr(F.col("lon"), F.col("lat"), RES)).write.parquet(
            plain
        )
        write_spatially_clustered(points, clustered, res=RES, n_partitions=8)

        full_range = (1 << RES) * (1 << RES)
        plain_spans = rowgroup_cell_spans(plain)
        clus_spans = rowgroup_cell_spans(clustered)
        med = lambda s: sorted(s)[len(s) // 2]  # noqa: E731
        # random layout: every row group spans ~the FULL key range (no
        # pruning possible); clustered: each row group's span is near the
        # ideal full_range / n_partitions band (range partitioner bounds
        # are sampled, hence the 2x slack)
        assert med(plain_spans) > full_range // 2
        assert med(clus_spans) <= 2 * full_range // 8, (med(clus_spans), full_range)
        # prunability scales with partition count: 4x the partitions ⇒
        # proportionally narrower bands
        finer = str(tmp_path / "finer")
        write_spatially_clustered(points, finer, res=RES, n_partitions=32)
        assert med(rowgroup_cell_spans(finer)) <= 2 * full_range // 32

        # pure layout change: same rows, and a cell-range box scan agrees
        a = spark.read.parquet(plain)
        b = spark.read.parquet(clustered)
        assert b.count() == 20_000
        lo, hi = 5_000_000, 5_400_000
        fa = {r.pid for r in a.filter(F.col("cell").between(lo, hi)).collect()}
        fb = {r.pid for r in b.filter(F.col("cell").between(lo, hi)).collect()}
        assert fa == fb and fa
