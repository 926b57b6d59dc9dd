"""Large-polygon-set PIP (pip_join_df, VERDICT r3 item 4): the polygon side
is a DataFrame — covers exploded polygon-side, rings joined as edge rows
(never shipped in a UDF closure), winding verify as a pure-JVM expression.
Checked against the brute-force numpy winding oracle on the F2 fixture mix
(slivers, overlaps, pole-adjacent) and for plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.pip import pip_join, pip_join_df, pip_join_np
from erased_cells_spark.spatial.geom import make_polygon_fixtures

N_PTS = 4000


@pytest.fixture(scope="module")
def pts_pd():
    rng = np.random.default_rng(5)
    return pd.DataFrame(
        {
            "pid": np.arange(N_PTS),
            "lon": rng.uniform(-179.9, 179.9, N_PTS),
            "lat": rng.uniform(-84.9, 84.9, N_PTS),
        }
    )


@pytest.fixture(scope="module")
def pts(spark, pts_pd):
    return spark.createDataFrame(pts_pd).cache()


@pytest.fixture(scope="module")
def polys():
    return make_polygon_fixtures(64, seed=7)


@pytest.fixture(scope="module")
def polys_df(spark, polys):
    rows = [(int(p["poly_id"]), [[float(x), float(y)] for x, y in p["ring"]]) for p in polys]
    return spark.createDataFrame(rows, "poly_id INT, ring ARRAY<ARRAY<DOUBLE>>")


class TestPipJoinDf:
    def test_matches_bruteforce(self, spark, pts, pts_pd, polys, polys_df):
        got = {
            (int(r.pid), int(r.poly_id))
            for r in pip_join_df(pts, polys_df, id_col="pid").collect()
        }
        want = {
            (int(pts_pd.pid.iloc[i]), pid)
            for i, pid in pip_join_np(pts_pd.lon.to_numpy(), pts_pd.lat.to_numpy(), polys)
        }
        assert got == want

    def test_matches_closure_based_pip_join(self, spark, pts, polys, polys_df):
        """Same result as the broadcast/closure pip_join — the two variants
        are one operator at two scales."""
        a = {
            (int(r.pid), int(r.poly_id))
            for r in pip_join_df(pts, polys_df, id_col="pid").collect()
        }
        b = {(int(r.pid), int(r.poly_id)) for r in pip_join(pts, polys).collect()}
        assert a == b

    def test_plan_no_cartesian_no_python_on_point_path(self, spark, pts, polys_df):
        out = pip_join_df(pts, polys_df, id_col="pid")
        p = out._jdf.queryExecution().sparkPlan().toString()
        assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
        assert "BatchEvalPython" not in p  # no row-at-a-time Python anywhere
        # the ONLY Python is the Arrow-batched cover UDF on the polygon side
        assert p.count("ArrowEvalPython") == 1

    def test_multi_ring_polygon_with_hole(self, spark):
        """A polygon with a HOLE = two rows sharing a poly_id: CCW outer ring
        + CW inner ring. The JVM winding sum over all the polygon's edges
        must report points in the hole as outside (wn = +1 − 1 = 0) and the
        deduped cover must not double-count points covered by both rings."""
        outer = [[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0], [0.0, 0.0]]
        hole = [[5.0, 5.0], [5.0, 15.0], [15.0, 15.0], [15.0, 5.0], [5.0, 5.0]]  # CW
        polys = spark.createDataFrame(
            [(1, outer), (1, hole)], "poly_id INT, ring ARRAY<ARRAY<DOUBLE>>"
        )
        pts = spark.createDataFrame(
            [
                (0, 2.0, 2.0),     # in outer, outside hole  -> inside
                (1, 10.0, 10.0),   # in hole                 -> outside
                (2, 25.0, 10.0),   # outside outer           -> outside
                (3, 16.0, 10.0),   # between hole and outer  -> inside
                (4, 5.5, 14.5),    # just inside hole corner -> outside
            ],
            "pid LONG, lon DOUBLE, lat DOUBLE",
        )
        got = {r.pid for r in pip_join_df(pts, polys, id_col="pid").collect()}
        assert got == {0, 3}

    def test_polygon_stats_analytic(self, spark):
        """Shoelace area/centroid against closed forms: a diamond has area
        2wh and centroid at its center; a square with a CW hole subtracts
        the hole's area and its centroid shifts away from the hole."""
        from erased_cells_spark.operators.pip import polygon_stats_df

        cx, cy, w, h = 10.0, -5.0, 2.0, 1.5
        diamond = [[cx + w, cy], [cx, cy + h], [cx - w, cy], [cx, cy - h], [cx + w, cy]]
        outer = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]  # CCW
        hole = [[6.0, 4.0], [6.0, 6.0], [8.0, 6.0], [8.0, 4.0], [6.0, 4.0]]  # CW
        degenerate = [[1.0, 1.0], [2.0, 2.0], [3.0, 3.0], [1.0, 1.0]]  # zero area
        polys = spark.createDataFrame(
            [(1, diamond), (2, outer), (2, hole), (3, degenerate)],
            "poly_id INT, ring ARRAY<ARRAY<DOUBLE>>",
        )
        got = {r.poly_id: r for r in polygon_stats_df(polys).collect()}
        assert got[1].area == pytest.approx(2 * w * h)
        assert got[1].cx == pytest.approx(cx) and got[1].cy == pytest.approx(cy)
        assert got[2].area == pytest.approx(100.0 - 4.0)  # hole subtracts
        # centroid shifts away from the hole (hole sits at x≈7, y≈5)
        assert got[2].cx == pytest.approx((5.0 * 100 - 7.0 * 4) / 96.0)
        assert got[2].cy == pytest.approx((5.0 * 100 - 5.0 * 4) / 96.0)
        assert got[3].area == 0.0 and got[3].cx is None and got[3].cy is None

    def test_open_ring_fails_loudly(self, spark, pts):
        bad = spark.createDataFrame(
            [(0, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])], "poly_id INT, ring ARRAY<ARRAY<DOUBLE>>"
        )
        with pytest.raises(Exception, match="CLOSED"):
            pip_join_df(pts, bad, id_col="pid").collect()
