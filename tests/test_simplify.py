"""Douglas–Peucker ring simplification contracts (r7): tolerance bound,
closure/orientation/triangle guarantees, vertex-subset property, the
distributed wrapper ≡ the numpy kernel, and the named use case — a dense
coastline pre-simplified for pip_join_df with containment flips confined
to the tolerance band."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.pip import pip_join_df, simplify_polygons_df
from erased_cells_spark.spatial.geom import points_in_ring, simplify_ring


def _coastline(n=4000, seed=7):
    """A noisy closed curve: base circle + high-frequency wiggle — the
    10^4-vertex-coastline shape the PIP docstring warns about."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    radius = 30.0 + 2.0 * np.sin(9 * t) + rng.normal(0, 0.15, n)
    ring = np.stack([radius * np.cos(t), radius * np.sin(t)], axis=1)
    return np.vstack([ring, ring[:1]])


def _max_deviation(orig: np.ndarray, simp: np.ndarray) -> float:
    """Max distance from any original vertex to the simplified chain
    (vectorized: points × segments)."""
    seg = simp[1:] - simp[:-1]                      # (M, 2)
    rel = orig[:-1, None, :] - simp[None, :-1, :]   # (N, M, 2)
    L2 = (seg**2).sum(-1)
    t = np.clip((rel * seg).sum(-1) / np.where(L2 == 0, 1, L2), 0, 1)
    d2 = ((rel - t[..., None] * seg) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).max()))


def _signed_area(r: np.ndarray) -> float:
    return 0.5 * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))


class TestSimplifyRing:
    def test_tolerance_bound_and_subset(self):
        ring = _coastline()
        for tol in (0.1, 0.5, 2.0):
            simp = simplify_ring(ring, tol)
            assert len(simp) < len(ring)
            assert (simp[0] == simp[-1]).all()
            # kept vertices are a subset of the originals (none invented)
            orig_set = {tuple(v) for v in ring[:-1]}
            assert all(tuple(v) in orig_set for v in simp[:-1])
            assert _max_deviation(ring, simp) <= tol + 1e-9
            # orientation preserved
            assert np.sign(_signed_area(simp)) == np.sign(_signed_area(ring))

    def test_monotone_compression(self):
        ring = _coastline()
        sizes = [len(simplify_ring(ring, t)) for t in (0.05, 0.2, 1.0, 5.0)]
        assert sizes == sorted(sizes, reverse=True)
        assert sizes[-1] >= 4  # never collapses below a closed triangle

    def test_degenerate_tolerance_keeps_triangle(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
        simp = simplify_ring(sq, 1e9)
        assert len(simp) >= 4 and (simp[0] == simp[-1]).all()

    def test_square_is_fixed_point(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
        dense = []
        for a, b in zip(sq[:-1], sq[1:]):
            for t in np.linspace(0, 1, 50, endpoint=False):
                dense.append(a + t * (b - a))
        dense = np.asarray(dense + [dense[0]])
        simp = simplify_ring(dense, 1e-9)
        assert len(simp) == 5  # collinear interiors all dropped
        assert {tuple(v) for v in simp[:-1]} == {tuple(v) for v in sq[:-1]}

    def test_validates_tolerance(self):
        with pytest.raises(ValueError, match="tolerance"):
            simplify_ring(_coastline(200), -1.0)


class TestSimplifyDistributed:
    def test_wrapper_matches_kernel_and_preserves_columns(self, spark):
        rings = [
            _coastline(500, seed=s) + np.array([40.0 * s, 0.0]) for s in range(4)
        ]
        rows = [
            (s, [[float(x), float(y)] for x, y in rings[s]], f"zone-{s}")
            for s in range(4)
        ]
        df = spark.createDataFrame(
            rows, "poly_id long, ring array<array<double>>, name string"
        )
        out = simplify_polygons_df(df, 0.5).collect()
        assert {r.name for r in out} == {f"zone-{s}" for s in range(4)}
        for r in out:
            want = simplify_ring(rings[r.poly_id], 0.5)
            assert np.array_equal(np.asarray(r.ring), want)
        plan = simplify_polygons_df(df, 0.5)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # partition-preserving

    def test_pip_on_simplified_coastline_flips_only_near_boundary(self, spark):
        ring = _coastline(3000)
        tol = 0.5
        simp = simplify_ring(ring, tol)
        rng = np.random.default_rng(3)
        lon = rng.uniform(-40, 40, 600)
        lat = rng.uniform(-40, 40, 600)
        pts = spark.createDataFrame(
            [(int(i), float(lon[i]), float(lat[i])) for i in range(600)],
            "pt_id long, lon double, lat double",
        )
        polys = spark.createDataFrame(
            [(0, [[float(x), float(y)] for x, y in simp])],
            "poly_id long, ring array<array<double>>",
        )
        got = {r.pt_id for r in pip_join_df(pts, polys, id_col="pt_id").collect()}
        want = set(np.nonzero(points_in_ring(lon, lat, ring))[0])
        flipped = got ^ want
        # every flip sits within `tol` of the ORIGINAL boundary
        for i in flipped:
            d = np.sqrt(((ring[:-1] - [lon[i], lat[i]]) ** 2).sum(-1)).min()
            assert d <= tol + 0.35, (i, d)  # vertex spacing slack
        # and the simplification kept the interior intact (most points agree)
        assert len(flipped) < 0.02 * 600