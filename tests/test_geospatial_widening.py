"""Geospatial widening unit contracts (r7): geohash encoding (canonical
public test vectors + numpy/Spark/DuckDB three-way bit-identity) and Horn
terrain (slope/aspect/hillshade vs a dense-numpy reference kernel).
The cross-engine twins are `doc_geohash_rollup` / `raster_hillshade`
(test_oracle_twins)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.geohash import geohash_expr, geohash_np, sql_geohash
from erased_cells_spark.operators.raster import horn_terrain


class TestGeohash:
    # Canonical public vectors (geohash.org convention, lon/lat order here)
    KNOWN = [
        (10.40744, 57.64911, "u4pruydqqvj"),   # Jutland — the classic example
        (-5.6, 42.6, "ezs42"),                 # the original spec example
        (0.0, 0.0, "s0000000"),
        (-180.0, -90.0, "000000"),
        (179.9999999, 89.9999999, "zzzzzz"),
    ]

    def test_known_vectors_numpy(self):
        for lon, lat, want in self.KNOWN:
            got = geohash_np(np.array([lon]), np.array([lat]), len(want))[0]
            assert got == want, (lon, lat, got, want)

    def test_duckdb_matches_numpy(self):
        rng = np.random.default_rng(17)
        lon = rng.uniform(-180, 180, 300)
        lat = rng.uniform(-90, 90, 300)
        con = duckdb.connect()
        con.register("pts", pd.DataFrame({"lon": lon, "lat": lat}))
        for p in (1, 5, 7, 12):
            want = geohash_np(lon, lat, p)
            got = con.sql(
                f"SELECT {sql_geohash('lon', 'lat', p)} AS gh FROM pts"
            ).df()["gh"].to_numpy()
            assert (want == got).all(), p

    def test_spark_matches_numpy(self, spark):
        rng = np.random.default_rng(23)
        lon = rng.uniform(-180, 180, 300)
        lat = rng.uniform(-90, 90, 300)
        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
        got = np.array(
            [r.gh for r in df.select(geohash_expr(F.col("lon"), F.col("lat"), 7).alias("gh")).collect()]
        )
        assert (geohash_np(lon, lat, 7) == got).all()

    def test_prefix_is_coarsening(self):
        """Truncating k chars == encoding at lower precision (the rollup
        contract doc_geohash_rollup relies on)."""
        rng = np.random.default_rng(5)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-90, 90, 500)
        g7 = geohash_np(lon, lat, 7)
        g4 = geohash_np(lon, lat, 4)
        assert all(a[:4] == b for a, b in zip(g7, g4))

    def test_no_python_udf_in_plan(self, spark):
        df = spark.range(10).select(
            geohash_expr((F.col("id") - 5.0) * 30.0, (F.col("id") - 5.0) * 15.0, 6).alias("gh")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestHexGrid:
    SIZE = 5.0

    def _pts(self, n=2000, seed=9):
        rng = np.random.default_rng(seed)
        return rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)

    def test_nearest_center_property(self):
        """Cube rounding assigns every point to the hex whose center is
        nearest — checked brute-force against the 6-neighbor ring."""
        from erased_cells_spark.functions.hexgrid import hex_center_np, hex_qr_np

        lon, lat = self._pts()
        q, r = hex_qr_np(lon, lat, self.SIZE)
        cx, cy = hex_center_np(q, r, self.SIZE)
        d0 = (lon - cx) ** 2 + (lat - cy) ** 2
        for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
            ox, oy = hex_center_np(q + dq, r + dr, self.SIZE)
            d = (lon - ox) ** 2 + (lat - oy) ** 2
            assert (d >= d0 - 1e-9).all(), (dq, dr)

    def test_duckdb_matches_numpy(self):
        from erased_cells_spark.functions.hexgrid import (
            hex_center_np,
            hex_id_np,
            hex_qr_np,
            sql_hex_center,
            sql_hex_id,
        )

        lon, lat = self._pts()
        con = duckdb.connect()
        con.register("pts", pd.DataFrame({"lon": lon, "lat": lat}))
        got = con.sql(
            f"SELECT {sql_hex_id('lon', 'lat', self.SIZE)} AS h FROM pts"
        ).df()["h"].to_numpy()
        want = hex_id_np(lon, lat, self.SIZE)
        assert (got == want).all()
        sx, sy = sql_hex_center("h", self.SIZE)
        con.register("hx", pd.DataFrame({"h": want}))
        gc = con.sql(f"SELECT {sx} AS x, {sy} AS y FROM hx").df()
        q, r = hex_qr_np(lon, lat, self.SIZE)
        nx, ny = hex_center_np(q, r, self.SIZE)
        assert np.array_equal(gc["x"].to_numpy(), nx)
        assert np.array_equal(gc["y"].to_numpy(), ny)

    def test_spark_matches_numpy_and_is_jvm_only(self, spark):
        from erased_cells_spark.functions.hexgrid import hex_id_expr, hex_id_np

        lon, lat = self._pts(500, seed=31)
        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
        out = df.select(hex_id_expr(F.col("lon"), F.col("lat"), self.SIZE).alias("h"))
        got = np.array([row.h for row in out.collect()])
        assert (got == hex_id_np(lon, lat, self.SIZE)).all()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_pack_round_trips(self):
        from erased_cells_spark.functions.hexgrid import _MOD, _OFF, hex_id_np, hex_qr_np

        lon, lat = self._pts(300, seed=4)
        q, r = hex_qr_np(lon, lat, self.SIZE)
        h = hex_id_np(lon, lat, self.SIZE)
        assert (h >= 0).all()
        assert np.array_equal(h // _MOD - _OFF, q)
        assert np.array_equal(h % _MOD - _OFF, r)


def _horn_reference(grid: np.ndarray):
    """Dense numpy Horn reference: returns dicts keyed by (iy, ix) for
    full-window cells (all 9 lit)."""
    ny, nx = grid.shape
    lit = grid > 0
    out = {}
    for iy in range(ny):
        for ix in range(nx):
            if not lit[iy, ix]:
                continue
            window_ok = True
            z = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    wy, wx = iy + dy, (ix + dx) % nx
                    if not (0 <= wy < ny) or not lit[wy, wx]:
                        window_ok = False
                    else:
                        z[(dx, dy)] = int(grid[wy, wx])
            if not window_ok:
                continue
            gx = (z[(1, -1)] + 2 * z[(1, 0)] + z[(1, 1)]) - (
                z[(-1, -1)] + 2 * z[(-1, 0)] + z[(-1, 1)]
            )
            gy = (z[(-1, 1)] + 2 * z[(0, 1)] + z[(1, 1)]) - (
                z[(-1, -1)] + 2 * z[(0, -1)] + z[(1, -1)]
            )
            slope = math.atan(math.sqrt(gx * gx + gy * gy) / 8.0)
            aspect = math.atan2(float(gy), float(-gx))
            zen = math.radians(45.0)
            az = math.radians(360.0 - 315.0 + 90.0)
            hs = max(
                0.0,
                255.0
                * (
                    math.cos(zen) * math.cos(slope)
                    + math.sin(zen) * math.sin(slope) * math.cos(az - aspect)
                ),
            )
            out[(iy, ix)] = (gx, gy, slope, aspect, hs)
    return out


class TestHornTerrain:
    RES = 4  # 16×16

    @pytest.fixture()
    def grid(self):
        rng = np.random.default_rng(11)
        n = 1 << self.RES
        g = rng.integers(0, 9, size=(n, n))
        g[rng.random((n, n)) < 0.25] = 0  # holes → partial windows excluded
        g[5:9, 5:9] = 7  # one guaranteed-dense plateau (flat ⇒ gx=gy=0 path)
        return g

    def test_matches_dense_numpy_reference(self, spark, grid):
        n = 1 << self.RES
        cells = [
            (int(iy * n + ix), int(grid[iy, ix]))
            for iy in range(n)
            for ix in range(n)
            if grid[iy, ix] > 0
        ]
        df = spark.createDataFrame(cells, "cell long, n long")
        got = {
            r.cell: (r.gx, r.gy, r.slope, r.aspect, r.hillshade)
            for r in horn_terrain(df, res=self.RES).collect()
        }
        want = _horn_reference(grid)
        assert set(got) == {iy * n + ix for iy, ix in want}
        for (iy, ix), (gx, gy, slope, aspect, hs) in want.items():
            ggx, ggy, gslope, gaspect, ghs = got[iy * n + ix]
            assert (ggx, ggy) == (gx, gy), (iy, ix)  # exact integer sums
            assert abs(gslope - slope) < 1e-12
            assert abs(gaspect - aspect) < 1e-12
            assert abs(ghs - hs) < 1e-9

    def test_flat_plateau_is_unlit_shade_max(self, spark, grid):
        """Interior of the constant plateau: gx=gy=0 ⇒ slope 0 ⇒ hillshade
        = 255·cos(zenith) exactly; aspect defined as atan2(0, 0) = 0 on
        both engines."""
        n = 1 << self.RES
        cells = [
            (int(iy * n + ix), int(grid[iy, ix]))
            for iy in range(n)
            for ix in range(n)
            if grid[iy, ix] > 0
        ]
        df = spark.createDataFrame(cells, "cell long, n long")
        center = 7 * n + 7  # interior of the 5:9×5:9 plateau... window all 7s
        row = [r for r in horn_terrain(df, res=self.RES).collect() if r.cell == center]
        if row:  # plateau interior only has full flat window if 3×3 ⊂ plateau
            r = row[0]
            if r.gx == 0 and r.gy == 0:
                assert r.slope == 0.0 and r.aspect == 0.0
                assert abs(r.hillshade - 255.0 * math.cos(math.radians(45.0))) < 1e-9

    def test_no_python_udf_and_single_shuffle(self, spark, grid):
        n = 1 << self.RES
        cells = [(int(i), 1) for i in range(n * n)]
        df = spark.createDataFrame(cells, "cell long, n long")
        plan = horn_terrain(df, res=self.RES)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
