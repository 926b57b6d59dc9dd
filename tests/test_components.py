"""Connected components vs union-find twin: random graphs (chains, stars,
disjoint cliques, isolated pairs), convergence, and plan hygiene."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.components import (
    connected_components,
    connected_components_np,
)


def run(spark, edges, threshold=100_000):
    df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    out = connected_components(df, "id_a", "id_b", driver_threshold=threshold)
    return {r.node: r.component for r in out.collect()}


class TestConnectedComponents:
    def test_random_graph_matches_union_find(self, spark):
        rng = np.random.default_rng(41)
        edges = [
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 120, 150), rng.integers(0, 120, 150))
            if a != b
        ]
        got = run(spark, edges)
        want = connected_components_np(edges)
        assert got == want
        # the DISTRIBUTED pointer-jumping path must agree (threshold=0
        # forces it; the default takes the small-graph driver path)
        assert run(spark, edges, threshold=0) == want

    def test_long_chain_needs_multiple_rounds(self, spark):
        # a 40-node chain: label 0 must propagate the whole way (diameter
        # stress for the iterative min-label loop, converges via doubling);
        # threshold=0 forces the distributed path — the driver fast path
        # would trivialize this test
        edges = [(i, i + 1) for i in range(40)]
        got = run(spark, edges, threshold=0)
        assert set(got.values()) == {0}
        assert len(got) == 41

    def test_disjoint_cliques_and_pairs(self, spark):
        edges = []
        for base in (0, 100, 200):
            edges += [(base + i, base + j) for i in range(4) for j in range(i + 1, 4)]
        edges += [(1000, 2000)]
        got = run(spark, edges)
        want = connected_components_np(edges)
        assert got == want
        assert got[2000] == 1000 and got[103] == 100
        assert run(spark, edges, threshold=0) == want  # distributed path too

    def test_focal_mean_hand_built_grid(self, spark):
        """Focal 3×3 mean on a hand-built sparse 8×8 grid (res 3): interior
        neighborhoods, x-WRAP across the antimeridian, lat-edge clamp, and
        the sparse convention (absent cells contribute nothing)."""
        from erased_cells_spark.operators.raster import focal_mean

        n = 8
        def key(ix, iy):
            return iy * n + ix

        lit = {key(1, 1): 10, key(2, 1): 20, key(1, 2): 30,  # L-cluster
               key(0, 5): 4, key(7, 5): 8,                   # wrap pair (x=0 / x=7)
               key(4, 0): 6}                                  # lat edge
        cells = spark.createDataFrame(list(lit.items()), "cell LONG, n LONG")
        got = {r.cell: (r.focal_mean, r.n_neighbors) for r in focal_mean(cells, res=3).collect()}
        assert set(got) == set(lit)  # lit cells only
        assert got[key(1, 1)] == (20.0, 3)          # itself + (2,1) + (1,2)
        assert got[key(2, 1)] == (20.0, 3)          # itself + (1,1) + (1,2)
        assert got[key(1, 2)] == (20.0, 3)
        assert got[key(0, 5)] == (6.0, 2)           # wraps to reach (7,5)
        assert got[key(7, 5)] == (6.0, 2)
        assert got[key(4, 0)] == (6.0, 1)           # clamped row, isolated

    def test_polygonize_hand_built_grid(self, spark):
        """Raster→vector on a hand-built 8×8 grid (res 3): an L-shaped
        region, a 2-cell bar, a singleton, and a DIAGONAL pair that must NOT
        merge under 4-connectivity."""
        from erased_cells_spark.operators.raster import polygonize_regions

        n = 8  # res 3
        def key(ix, iy):
            return iy * n + ix

        lit = {
            # L-shape: (1,1),(1,2),(2,2)  → one region of 3 cells
            key(1, 1): 5, key(1, 2): 4, key(2, 2): 3,
            # horizontal bar: (5,0),(6,0) → one region of 2
            key(5, 0): 2, key(6, 0): 2,
            # singleton: (7,7)
            key(7, 7): 9,
            # diagonal pair (4,4) / (5,5): NOT 4-connected → two singletons
            key(4, 4): 1, key(5, 5): 1,
        }
        cells = spark.createDataFrame(
            [(k, v) for k, v in lit.items()], "cell LONG, n LONG"
        )
        got = {
            r.region_id: (r.n_cells, r.n_docs)
            for r in polygonize_regions(cells, res=3).collect()
        }
        assert got == {
            key(1, 1): (3, 12),
            key(5, 0): (2, 4),
            key(7, 7): (1, 9),
            key(4, 4): (1, 1),
            key(5, 5): (1, 1),
        }

    def test_polygonize_no_antimeridian_wrap(self, spark):
        """Cells at ix = n-1 and ix = 0 on the same row are NOT adjacent
        (documented no-wrap convention, matching the SQL oracle)."""
        from erased_cells_spark.operators.raster import polygonize_regions

        n = 8
        cells = spark.createDataFrame([(7, 1), (8, 1)], "cell LONG, n LONG")
        # cell 7 = (ix 7, iy 0); cell 8 = (ix 0, iy 1): neither wrap-adjacent
        # nor down-adjacent (7 + 8 = 15 ≠ 8)
        got = polygonize_regions(cells, res=3).collect()
        assert len(got) == 2

    def test_exhausted_rounds_fail_loudly(self, spark):
        """Running out of rounds before the fixpoint must RAISE — a silently
        under-merged labeling is the one wrong answer dedup can't detect."""
        df = spark.createDataFrame([(1, 2), (2, 3)], "id_a LONG, id_b LONG")
        with pytest.raises(RuntimeError, match="no fixpoint"):
            connected_components(df, "id_a", "id_b", max_iter=1, driver_threshold=0)
