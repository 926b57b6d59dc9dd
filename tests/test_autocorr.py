"""Spatial autocorrelation (operators/autocorr.py) semantics on hand-built
grids: known quadrants, the checkerboard (perfect negative autocorrelation)
and block (positive) patterns, lon wrap adjacency, and isolated cells.
Cross-engine value identity lives in test_oracle_twins (geo_moran_hotspots)."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.autocorr import local_moran_cells

RES = 3  # 8x8 grid


def _run(spark, rows):
    df = spark.createDataFrame(rows, "ix long, iy long, n_docs long")
    out = local_moran_cells(df, res=RES)
    return {(r["ix"], r["iy"]): r.asDict() for r in out.collect()}


def test_checkerboard_is_negatively_autocorrelated(spark):
    # full 8x8 checkerboard of 1s and 9s: every neighbor of a high cell is
    # low -> global I must be strongly negative, every cell HL or LH
    rows = [(x, y, 9 if (x + y) % 2 == 0 else 1) for x in range(8) for y in range(8)]
    cells = _run(spark, rows)
    assert len(cells) == 64
    one = next(iter(cells.values()))
    assert one["moran_i_r"] < -0.9
    assert {c["quadrant"] for c in cells.values()} <= {"HL", "LH"}


def test_block_pattern_is_positively_autocorrelated(spark):
    # left half dense, right half sparse: interiors are HH/LL, I > 0
    rows = [(x, y, 100 if x < 4 else 1) for x in range(8) for y in range(8)]
    cells = _run(spark, rows)
    assert next(iter(cells.values()))["moran_i_r"] > 0.5
    assert cells[(1, 3)]["quadrant"] == "HH"
    assert cells[(6, 3)]["quadrant"] == "LL"


def test_neighbor_sums_and_star(spark):
    # 3-cell strip: (0,0)=5, (1,0)=7, (2,0)=3 on an otherwise empty grid
    rows = [(0, 0, 5), (1, 0, 7), (2, 0, 3)]
    cells = _run(spark, rows)
    assert cells[(1, 0)]["n_nbrs"] == 2
    assert cells[(1, 0)]["nbr_docs"] == 8
    assert cells[(1, 0)]["star_docs"] == 15
    assert cells[(0, 0)]["n_nbrs"] == 1
    # exact scaled deviations: n=3, S=15 -> u = 3x-15 = (0, 6, -6)
    assert int(cells[(1, 0)]["local_num"]) == 6 * (0 + -6)
    assert int(cells[(0, 0)]["local_num"]) == 0


def test_lon_wrap_adjacency(spark):
    # ix 0 and ix 7 are neighbors through the antimeridian at res 3
    rows = [(0, 4, 10), (7, 4, 20)]
    cells = _run(spark, rows)
    assert cells[(0, 4)]["n_nbrs"] == 1
    assert cells[(0, 4)]["nbr_docs"] == 20
    assert cells[(7, 4)]["nbr_docs"] == 10


def test_isolated_cells(spark):
    rows = [(0, 0, 5), (4, 4, 9)]
    cells = _run(spark, rows)
    assert all(c["quadrant"] == "ISO" for c in cells.values())
    assert all(c["n_nbrs"] == 0 and c["nbr_docs"] == 0 for c in cells.values())
    # W = 0 -> global I undefined: comes back NULL (0/0), never a crash
    assert all(c["moran_i_r"] is None for c in cells.values())
