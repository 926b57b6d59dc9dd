"""Viewshed contracts (operators/raster.viewshed): hand-built terrain
with known visibility, grazing convention, round-half-up DDA on a steep
diagonal, radius bound, and observer tie-break. Cross-engine parity is
the raster_viewshed twin."""

import pytest

from erased_cells_spark.operators.raster import viewshed

RES = 4  # 16x16 grid
N = 1 << RES


def _cells(spark, rows):
    return spark.createDataFrame(
        [(y * N + x, z) for x, y, z in rows], "cell long, n long"
    )


def _vis(spark, rows, radius=6, eye=1):
    return {
        r.cell: (r.visible, r.n_blockers, r.steps)
        for r in viewshed(_cells(spark, rows), RES, radius=radius, eye=eye).collect()
    }


def test_wall_blocks_far_target_but_not_near(spark):
    # observer (0,0,z=30, the max) -> z_eye 31; wall (2,0,z=20);
    # sight line to (5,0,z=1) at k=2 of 5: 31 + (1-31)*2/5 = 19 < 20
    rows = [(0, 0, 30), (2, 0, 20), (1, 0, 1), (5, 0, 1)]
    got = _vis(spark, rows)
    assert got[0 * N + 1] == (True, 0, 1)    # before the wall
    assert got[0 * N + 2][0] is True         # the wall itself is visible
    assert got[0 * N + 5] == (False, 1, 5)   # behind the wall


def test_grazing_does_not_block(spark):
    # z_eye=31 down to target z=1 over 6 steps: line height at k=3 is 16;
    # a blocker exactly at 16 grazes (equality) -> NOT blocking (strict >)
    rows = [(0, 0, 30), (3, 0, 16), (6, 0, 1)]
    got = _vis(spark, rows)
    assert got[0 * N + 6][0] is True
    # one unit higher DOES block
    rows2 = [(0, 0, 30), (3, 0, 17), (6, 0, 1)]
    got2 = _vis(spark, rows2)
    assert got2[0 * N + 6][0] is False


def test_diagonal_and_offaxis_path(spark):
    # blocker exactly on the 45-degree diagonal path: line at k=3 of 6
    # from z_eye=61 to z=5 is 33; blocker 50 > 33 blocks
    rows = [(0, 0, 60), (3, 3, 50), (6, 6, 5)]
    got = _vis(spark, rows)
    assert got[6 * N + 6][0] is False
    # blocker OFF the path does not block
    rows2 = [(0, 0, 60), (3, 2, 50), (6, 6, 5)]
    got2 = _vis(spark, rows2)
    assert got2[6 * N + 6][0] is True


def test_radius_excludes_far_targets(spark):
    rows = [(0, 0, 9), (2, 0, 1), (9, 0, 1)]
    got = _vis(spark, rows, radius=3)
    assert 0 * N + 2 in got and 0 * N + 9 not in got


def test_observer_is_max_height_min_cell_and_excluded(spark):
    rows = [(1, 1, 7), (4, 4, 7), (2, 2, 3)]  # tie on height: (1,1) wins (lower cell)
    got = _vis(spark, rows)
    assert 1 * N + 1 not in got  # observer not a target
    assert set(got) == {4 * N + 4, 2 * N + 2}


def test_radius_validation(spark):
    with pytest.raises(ValueError):
        viewshed(_cells(spark, [(0, 0, 1)]), RES, radius=0)
