"""Tile-level Spark tests: the §5.1 kernel assertions re-run THROUGH
DataFrames + pandas UDFs (one tile per row), plus the golden NDVI e2e
(reference: src/gdal/rasterband.rs:137-191).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.cells import CellType
from erased_cells_spark.sources.tiff import read_tiff
from erased_cells_spark.tiles import (
    TILE_SCHEMA,
    tile_binop,
    tile_convert,
    tile_neg,
    tile_row,
    tile_scalar_op,
    tile_stats,
    tile_to_masked_buffer,
)
from pyspark.sql.types import LongType, StructField, StructType

GOLD = "/root/reference/testkit/data"
TILE_WITH_ID = StructType([StructField("tile_id", LongType(), False), *TILE_SCHEMA.fields])


def make_df(spark, arrays, masks=None):
    rows = []
    for i, arr in enumerate(arrays):
        m = None if masks is None else masks[i]
        rows.append({"tile_id": i, **tile_row(arr, m)})
    return spark.createDataFrame(rows, TILE_WITH_ID)


class TestTileStats:
    def test_masked_minmax_counts(self, spark):
        # masked_minmax fixture through Spark: u8 0..9, mask false at {0,8}
        arr = np.arange(9, dtype=np.uint8)
        mask = np.ones(9, bool)
        mask[[0, 8]] = False
        df = make_df(spark, [arr], [mask])
        got = df.select(
            tile_stats(F.col("cell_type"), F.col("data"), F.col("mask")).alias("s")
        ).select("s.*").first()
        assert got.min_value == 1.0 and got.max_value == 7.0
        assert got.data_count == 7 and got.nodata_count == 2

    def test_all_masked_inverted_extremes(self, spark):
        arr = np.array([5, 6], dtype=np.uint8)
        df = make_df(spark, [arr], [np.zeros(2, bool)])
        got = df.select(
            tile_stats("cell_type", "data", "mask").alias("s")
        ).select("s.*").first()
        assert got.min_value == 255.0 and got.max_value == 0.0


class TestTileAlgebra:
    def test_quick_example_through_spark(self, spark):
        # examples/quick.rs: u8 [1,2,3] / u16 [2,4,6] * 0.5 == f64 [.25]*3
        schema = StructType(
            [StructField("tile_id", LongType(), False)]
            + [StructField(f"l_{f.name}", f.dataType, True) for f in TILE_SCHEMA.fields]
            + [StructField(f"r_{f.name}", f.dataType, True) for f in TILE_SCHEMA.fields]
        )
        df = spark.createDataFrame(
            [
                {
                    "tile_id": 0,
                    **{f"l_{k}": v for k, v in tile_row(np.array([1, 2, 3], np.uint8)).items()},
                    **{f"r_{k}": v for k, v in tile_row(np.array([2, 4, 6], np.uint16)).items()},
                }
            ],
            schema,
        )
        step = df.select(
            tile_binop(
                "div",
                "l_cell_type", "l_data", "l_mask",
                "r_cell_type", "r_data", "r_mask",
            ).alias("t")
        )
        out = step.select(
            tile_scalar_op("mul", "t.cell_type", "t.data", "t.mask", 0.5).alias("t2")
        ).first()["t2"]
        mb = tile_to_masked_buffer(out.cell_type, out.data, out.mask)
        assert out.cell_type == "Float64"
        assert list(mb.buffer.data) == [0.25, 0.25, 0.25]
        assert mb.mask.all(True)

    def test_mask_and_propagation(self, spark):
        l = tile_row(np.full(4, 2, np.uint8), np.array([1, 0, 1, 0], bool))
        r = tile_row(np.full(4, 2, np.uint8), np.array([1, 1, 0, 0], bool))
        df = spark.createDataFrame(
            [{**{f"l_{k}": v for k, v in l.items()}, **{f"r_{k}": v for k, v in r.items()}}]
        )
        out = df.select(
            tile_binop("add", "l_cell_type", "l_data", "l_mask", "r_cell_type", "r_data", "r_mask").alias("t")
        ).first()["t"]
        mb = tile_to_masked_buffer(out.cell_type, out.data, out.mask)
        assert list(mb.mask.data) == [True, False, False, False]
        assert list(mb.buffer.data) == [4.0] * 4  # garbage lanes computed anyway

    def test_neg_widening_through_spark(self, spark):
        df = make_df(spark, [np.arange(3, dtype=np.uint8)])
        out = df.select(tile_neg("cell_type", "data", "mask").alias("t")).first()["t"]
        assert out.cell_type == "Int16"
        mb = tile_to_masked_buffer(out.cell_type, out.data, out.mask)
        assert list(mb.buffer.data) == [0, -1, -2]

    def test_convert_widening_only(self, spark):
        df = make_df(spark, [np.arange(3, dtype=np.uint8)])
        out = df.select(
            tile_convert("cell_type", "data", "Float32").alias("d")
        ).first()["d"]
        assert list(np.frombuffer(out, np.float32)) == [0.0, 1.0, 2.0]
        # narrowing fails the task (NarrowingError raised inside the UDF)
        df2 = make_df(spark, [np.arange(3, dtype=np.float64)])
        with pytest.raises(Exception, match="(?i)narrow|convert"):
            df2.select(tile_convert("cell_type", "data", "Float32").alias("d")).collect()


class TestGoldenNDVI:
    """The reference's own e2e test, run as a Spark plan over tiles."""

    @staticmethod
    def _band_df(spark, name, prefix, tile_rows=64):
        band = read_tiff(f"{GOLD}/L8-Elkton-VA-{name}.tiff")
        arr = band.array
        rows = []
        # split into horizontal tile strips → multiple rows, exercises batching
        for ti, r0 in enumerate(range(0, arr.shape[0], tile_rows)):
            sub = arr[r0 : r0 + tile_rows]
            mask = sub != band.nodata if band.nodata is not None else None
            d = tile_row(sub, mask)
            rows.append({"tile_id": ti, **{f"{prefix}_{k}": v for k, v in d.items()}})
        return spark.createDataFrame(rows)

    def test_ndvi_golden(self, spark):
        red = self._band_df(spark, "B4", "red")
        nir = self._band_df(spark, "B5", "nir")
        df = nir.join(red, "tile_id")
        num = tile_binop("sub", "nir_cell_type", "nir_data", "nir_mask",
                         "red_cell_type", "red_data", "red_mask").alias("num")
        den = tile_binop("add", "nir_cell_type", "nir_data", "nir_mask",
                         "red_cell_type", "red_data", "red_mask").alias("den")
        step = df.select("tile_id", num, den)
        ndvi = step.select(
            "tile_id",
            tile_binop("div", "num.cell_type", "num.data", "num.mask",
                       "den.cell_type", "den.data", "den.mask").alias("ndvi"),
        )
        stats = ndvi.select(
            tile_stats("ndvi.cell_type", "ndvi.data", "ndvi.mask").alias("s")
        ).select("s.*")
        agg = stats.agg(
            F.min("min_value").alias("mn"), F.max("max_value").alias("mx")
        ).first()
        assert agg.mn == pytest.approx(-0.12488999119929595, abs=1e-8)
        assert agg.mx == pytest.approx(0.6699834571985877, abs=1e-8)

    def test_masked_ndvi_nodata_invariance(self, spark):
        # B5-nd has exactly 4 nodata cells; the count must survive the math
        red = self._band_df(spark, "B4", "red")
        nir = self._band_df(spark, "B5-nd", "nir")
        in_nodata = nir.select(
            tile_stats("nir_cell_type", "nir_data", "nir_mask").alias("s")
        ).agg(F.sum("s.nodata_count").alias("n")).first().n
        assert in_nodata == 4

        df = nir.join(red, "tile_id")
        num = tile_binop("sub", "nir_cell_type", "nir_data", "nir_mask",
                         "red_cell_type", "red_data", "red_mask").alias("num")
        den = tile_binop("add", "nir_cell_type", "nir_data", "nir_mask",
                         "red_cell_type", "red_data", "red_mask").alias("den")
        step = df.select("tile_id", num, den)
        ndvi = step.select(
            tile_binop("div", "num.cell_type", "num.data", "num.mask",
                       "den.cell_type", "den.data", "den.mask").alias("ndvi")
        )
        out = ndvi.select(
            tile_stats("ndvi.cell_type", "ndvi.data", "ndvi.mask").alias("s")
        ).agg(
            F.sum("s.nodata_count").alias("n"),
            F.min("s.min_value").alias("mn"),
            F.max("s.max_value").alias("mx"),
        ).first()
        assert out.n == 4
        assert out.mn == pytest.approx(-0.12488999119929595, abs=1e-8)
        assert out.mx == pytest.approx(0.6699834571985877, abs=1e-8)
