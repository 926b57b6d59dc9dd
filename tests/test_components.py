"""Connected components vs union-find twin: random graphs (chains, stars,
disjoint cliques, isolated pairs), convergence, and plan hygiene."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.components import (
    connected_components,
    connected_components_np,
)


def run(spark, edges):
    df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    out = connected_components(df, "id_a", "id_b")
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

    def test_long_chain_needs_multiple_rounds(self, spark):
        # a 40-node chain: label 0 must propagate the whole way (diameter
        # stress for the iterative min-label loop, converges via doubling)
        edges = [(i, i + 1) for i in range(40)]
        got = run(spark, edges)
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

    def test_exhausted_rounds_fail_loudly(self, spark):
        """Running out of rounds before the fixpoint must RAISE — a silently
        under-merged labeling is the one wrong answer dedup can't detect."""
        df = spark.createDataFrame([(1, 2), (2, 3)], "id_a LONG, id_b LONG")
        with pytest.raises(RuntimeError, match="no fixpoint"):
            connected_components(df, "id_a", "id_b", max_iter=1)
