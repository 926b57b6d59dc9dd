"""Property + unit tests for the engine-own cell index and geometry kernels
(SURVEY.md §7.4: containment monotonicity, ring symmetry, PIP conventions).
No Spark — these pin the kernels the spatial operators batch over.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from erased_cells_spark.spatial import (
    MAX_RES,
    cell_bounds,
    cell_res,
    cell_xy,
    children,
    cover_bbox,
    encode_cell,
    parent,
    points_in_ring,
    polygon_bbox,
    regular_polygon,
    ring,
)
from erased_cells_spark.spatial.geom import make_polygon_fixtures

lons = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
lats = st.floats(min_value=-89.999999, max_value=89.999999, allow_nan=False)
ress = st.integers(min_value=1, max_value=MAX_RES)


class TestCellId:
    @given(lons, lats, ress)
    @settings(max_examples=300, deadline=None)
    def test_bounds_contain_point(self, lon, lat, res):
        c = encode_cell(lon, lat, res)
        assert int(cell_res(c)) == res
        lo_x, lo_y, hi_x, hi_y = cell_bounds(c)
        # binning is float-deterministic; points within ~1 ulp of a cell edge
        # may land in the neighbor, so containment holds to 1e-9 tolerance
        assert lo_x - 1e-9 <= lon < hi_x + 1e-9
        assert lo_y - 1e-9 <= lat < hi_y + 1e-9

    @given(lons, lats, st.integers(min_value=2, max_value=MAX_RES))
    @settings(max_examples=300, deadline=None)
    def test_parent_containment_monotone(self, lon, lat, res):
        c = encode_cell(lon, lat, res)
        for pr in range(res - 1, max(res - 4, -1), -1):
            p = parent(c, pr)
            assert int(p) == int(encode_cell(lon, lat, pr))
        # children of parent include the cell
        p = parent(c, res - 1)
        assert int(c) in set(children(p).ravel().tolist())

    @given(lons, lats, st.integers(min_value=3, max_value=20), st.integers(min_value=1, max_value=3))
    @settings(max_examples=200, deadline=None)
    def test_ring_symmetry(self, lon, lat, res, k):
        c = int(encode_cell(lon, lat, res))
        r = ring(c, k)
        assert c in set(r.tolist())  # contains center
        assert len(r) <= (2 * k + 1) ** 2
        # symmetry: center is in the ring of each member at the same k
        for other in r[:5]:
            assert c in set(ring(int(other), k).tolist())

    def test_encode_vectorized_matches_scalar(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-90, 90, 1000)
        vec = encode_cell(lon, lat, 12)
        for i in range(0, 1000, 97):
            assert int(vec[i]) == int(encode_cell(lon[i], lat[i], 12))

    def test_xy_round_trip(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-90, 90, 500)
        for res in (1, 7, 15, 29):
            c = encode_cell(lon, lat, res)
            ix, iy = cell_xy(c)
            n = 1 << res
            assert (ix >= 0).all() and (ix < n).all()
            assert (iy >= 0).all() and (iy < n).all()

    def test_cover_bbox_superset(self):
        cells = cover_bbox(-10.0, -10.0, 10.0, 10.0, 5)
        rng = np.random.default_rng(11)
        lon = rng.uniform(-10, 10, 200)
        lat = rng.uniform(-10, 10, 200)
        pts = set(encode_cell(lon, lat, 5).tolist())
        assert pts <= set(cells.tolist())

    def test_cover_bbox_limit(self):
        with pytest.raises(ValueError):
            cover_bbox(-180, -90, 180, 90, 20, limit=100)

    def test_lon_wrap_lat_clamp(self):
        a = encode_cell(-180.0, 0.0, 8)
        b = encode_cell(180.0, 0.0, 8)  # wraps to -180
        assert int(a) == int(b)
        top = encode_cell(0.0, 90.0, 8)
        _, iy = cell_xy(top)
        assert int(iy) == (1 << 8) - 1


class TestPIP:
    def test_square_basic(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
        lon = np.array([5.0, 15.0, -1.0, 9.999])
        lat = np.array([5.0, 5.0, 5.0, 9.999])
        assert list(points_in_ring(lon, lat, sq)) == [True, False, False, True]

    def test_edge_convention_deterministic(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
        # lower edge in, upper edge out (half-open rule)
        assert points_in_ring(np.array([5.0]), np.array([0.0]), sq)[0]
        assert not points_in_ring(np.array([5.0]), np.array([10.0]), sq)[0]
        # left edge in, right edge out
        assert points_in_ring(np.array([0.0]), np.array([5.0]), sq)[0]
        assert not points_in_ring(np.array([10.0]), np.array([5.0]), sq)[0]

    def test_concave(self):
        # U-shape: inside the notch is outside the polygon
        u = np.array(
            [[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10], [0, 10], [0, 0]],
            float,
        )
        assert not points_in_ring(np.array([5.0]), np.array([6.0]), u)[0]
        assert points_in_ring(np.array([1.5]), np.array([6.0]), u)[0]
        assert points_in_ring(np.array([5.0]), np.array([1.5]), u)[0]

    @given(st.integers(min_value=3, max_value=12), st.integers(min_value=0, max_value=50))
    @settings(max_examples=100, deadline=None)
    def test_regular_polygon_center_inside(self, k, seed):
        ring_ = regular_polygon(2.0, 3.0, 5.0, k, jitter=0.2, seed=seed)
        assert points_in_ring(np.array([2.0]), np.array([3.0]), ring_)[0]
        # far point outside
        assert not points_in_ring(np.array([50.0]), np.array([50.0]), ring_)[0]

    def test_fixture_set_shape(self):
        polys = make_polygon_fixtures(64, seed=42)
        assert len(polys) == 64
        for p in polys:
            x0, y0, x1, y1 = polygon_bbox(p["ring"])
            assert -180 <= x0 <= x1 <= 180
            assert -90 <= y0 <= y1 <= 90
