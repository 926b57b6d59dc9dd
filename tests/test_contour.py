"""Marching-squares case extraction (operators/raster.marching_cases):
hand-pinned case table on known grids. Cross-engine parity runs in
test_oracle_twins (raster_contour_cases)."""

from __future__ import annotations

from erased_cells_spark.operators.raster import marching_cases


def _cases(spark, cells, iso=1.0):
    df = spark.createDataFrame(cells, "ix BIGINT, iy BIGINT, value DOUBLE")
    return {
        (r.bx, r.by): (r.case_idx, r.n_segments)
        for r in marching_cases(df, iso).collect()
    }


def test_single_hot_cell_four_corner_blocks(spark):
    got = _cases(spark, [(5, 5, 2.0)])
    # cell (5,5) is c00 of (5,5)=1, c10 of (4,5)=2, c01 of (5,4)=8, c11 of (4,4)=4
    assert got == {
        (5, 5): (1, 1), (4, 5): (2, 1), (5, 4): (8, 1), (4, 4): (4, 1)
    }


def test_full_square_center_block_is_interior(spark):
    cells = [(x, y, 1.0) for x in (3, 4) for y in (3, 4)]
    got = _cases(spark, cells)
    assert got[(3, 3)] == (15, 0)  # fully inside: no contour through it
    # edge blocks each carry one segment
    assert got[(2, 3)] == (2 + 4, 1) and got[(4, 3)] == (1 + 8, 1)


def test_diagonal_pair_is_a_saddle(spark):
    got = _cases(spark, [(0, 0, 1.0), (1, 1, 1.0)])
    # block (0,0): c00 from (0,0) + c11 from (1,1) -> case 5, two segments
    assert got[(0, 0)] == (5, 2)
    got2 = _cases(spark, [(1, 0, 1.0), (0, 1, 1.0)])
    assert got2[(0, 0)] == (2 + 8, 2)  # the other saddle (case 10)


def test_below_iso_cells_set_no_bits(spark):
    got = _cases(spark, [(0, 0, 0.5), (2, 2, 3.0)], iso=1.0)
    assert all(b in {(2, 2), (1, 2), (2, 1), (1, 1)} for b in got)
