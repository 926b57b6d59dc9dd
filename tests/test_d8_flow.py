"""D8 flow direction (operators/raster.d8_flow): hand-grid routing,
diagonal-vs-orthogonal exact comparison, tie-break, pit/flat handling,
antimeridian wrap, pole clipping. Cross-engine identity is proven by the
raster_d8_flow twin."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.raster import d8_flow

RES = 4
N = 1 << RES


def cells_df(spark, triples):
    """triples: (ix, iy, z)"""
    return spark.createDataFrame(
        [(iy * N + ix, z) for ix, iy, z in triples], "cell LONG, n LONG"
    )


def by_cell(rows):
    return {r["cell"]: (r["dir_code"], r["to_cell"], r["drop"]) for r in rows}


def test_routes_to_steepest_lit_neighbor(spark):
    # center (5,5,z=10); E neighbor z=7 (drop 3, ortho), SE z=6 (drop 4, diag)
    # keys: 3^2*2=18 vs 4^2*1=16 -> E wins despite the smaller drop
    df = cells_df(spark, [(5, 5, 10), (6, 5, 7), (6, 6, 6)])
    got = by_cell(d8_flow(df, RES).collect())
    assert got[5 * N + 5] == (1, 5 * N + 6, 3)


def test_diagonal_wins_when_strictly_steeper(spark):
    # E drop 2 (key 8), SE drop 3 (key 9) -> SE
    df = cells_df(spark, [(5, 5, 10), (6, 5, 8), (6, 6, 7)])
    got = by_cell(d8_flow(df, RES).collect())
    assert got[5 * N + 5] == (2, 6 * N + 6, 3)


def test_tie_breaks_on_direction_code(spark):
    # equal orthogonal drops E and S -> E (code 1 < 4)
    df = cells_df(spark, [(5, 5, 10), (6, 5, 7), (5, 6, 7)])
    got = by_cell(d8_flow(df, RES).collect())
    assert got[5 * N + 5][0] == 1


def test_pit_and_flat_get_dir_zero(spark):
    # pit: all lit neighbors higher; flat: equal neighbor (not a descent)
    df = cells_df(spark, [(5, 5, 1), (6, 5, 9), (8, 8, 4), (9, 8, 4)])
    got = by_cell(d8_flow(df, RES).collect())
    assert got[5 * N + 5] == (0, None, None)
    assert got[8 * N + 8] == (0, None, None)
    assert got[8 * N + 9] == (0, None, None)


def test_antimeridian_wrap_and_pole_clip(spark):
    # x=N-1 routes E across the wrap to x=0; y=0 has no northern neighbors
    df = cells_df(spark, [(N - 1, 3, 9), (0, 3, 2), (4, 0, 5), (5, 0, 3)])
    got = by_cell(d8_flow(df, RES).collect())
    assert got[3 * N + (N - 1)] == (1, 3 * N + 0, 7)
    assert got[0 * N + 4] == (1, 0 * N + 5, 2)  # clip leaves in-row routing


def test_unlit_neighbors_cannot_receive_flow(spark):
    df = cells_df(spark, [(5, 5, 10)])  # isolated cell: nothing lit around
    got = by_cell(d8_flow(df, RES).collect())
    assert got[5 * N + 5] == (0, None, None)


def test_every_cell_appears_exactly_once(spark):
    import numpy as np

    rng = np.random.default_rng(4)
    triples = {(int(rng.integers(0, N)), int(rng.integers(0, N))): int(rng.integers(1, 50))
               for _ in range(80)}
    df = cells_df(spark, [(x, y, z) for (x, y), z in triples.items()])
    rows = d8_flow(df, RES).collect()
    assert len(rows) == len(triples)
    assert len({r["cell"] for r in rows}) == len(triples)
