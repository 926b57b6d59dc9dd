"""Distributed skyline (operators/skyline.py): brute-force dominance
equivalence on random matrices, partitioning invariance (the phase-1
soundness claim), duplicate frontier points, degenerate shapes, and the
numpy kernel directly. Cross-engine identity is proven by the
doc_skyline_frontier twin."""

import numpy as np
import pytest

from erased_cells_spark.operators.skyline import _pareto_block, skyline


def brute(mat):
    keep = []
    for i in range(len(mat)):
        dominated = any(
            all(mat[j][k] <= mat[i][k] for k in range(len(mat[i])))
            and any(mat[j][k] < mat[i][k] for k in range(len(mat[i])))
            for j in range(len(mat))
            if j != i
        )
        if not dominated:
            keep.append(i)
    return keep


def test_kernel_matches_brute():
    rng = np.random.default_rng(41)
    for d in (1, 2, 3, 4):
        for _ in range(5):
            mat = rng.integers(0, 12, size=(80, d)).astype(np.int64)
            got = sorted(np.flatnonzero(_pareto_block(mat)).tolist())
            assert got == brute(mat.tolist())


def run(spark, rows, parts):
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)], "id LONG, c1 LONG, c2 LONG"
    ).repartition(parts)
    return sorted(r["id"] for r in skyline(df, ["c1", "c2"]).collect())


def test_matches_brute_and_partition_invariant(spark):
    rng = np.random.default_rng(43)
    rows = [tuple(int(x) for x in rng.integers(0, 30, 2)) for _ in range(300)]
    expect = brute(rows)
    assert run(spark, rows, 1) == expect
    assert run(spark, rows, 7) == expect
    assert run(spark, rows, 64) == expect  # many near-empty partitions


def test_duplicate_frontier_points_all_survive(spark):
    rows = [(0, 0), (0, 0), (1, 5), (5, 1)]
    got = run(spark, rows, 3)
    assert got == [0, 1]  # the duplicates; (1,5)/(5,1) dominated by (0,0)


def test_anti_chain_everything_survives(spark):
    rows = [(i, 10 - i) for i in range(11)]
    assert run(spark, rows, 4) == list(range(11))


def test_validation(spark):
    df = spark.createDataFrame([(0, 1, 2)], "id LONG, c1 LONG, c2 LONG")
    with pytest.raises(ValueError):
        skyline(df, [])
