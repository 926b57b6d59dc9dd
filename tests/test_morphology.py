"""Morphology contracts (operators/raster.cells_dilate / cells_erode /
region_perimeter): known shapes (square, line, single cell, square with
hole), duality sanity (erode(dilate(X)) ⊇ X for solid blobs), grouped
independence, and exact perimeter arithmetic. Cross-engine parity is
the raster_morphology twin."""

from pyspark.sql import functions as F

from erased_cells_spark.operators.raster import (
    cells_dilate,
    cells_erode,
    region_perimeter,
)

RES = 5
N = 1 << RES


def _cells(spark, coords, gid=0):
    return spark.createDataFrame(
        [(gid, y * N + x) for x, y in coords], "gid long, cell long"
    )


def _set(df):
    return {(r.cell % N, r.cell // N) for r in df.collect()}


def _square(x0, y0, side):
    return [(x, y) for x in range(x0, x0 + side) for y in range(y0, y0 + side)]


def test_square_metrics(spark):
    sq = _cells(spark, _square(5, 5, 4))
    [r] = region_perimeter(sq, RES, ["gid"]).collect()
    assert (r.area, r.perimeter) == (16, 16)
    assert _set(cells_erode(sq, RES, ["gid"])) == set(_square(6, 6, 2))
    assert len(_set(cells_dilate(sq, RES, ["gid"]))) == 16 + 4 * 4  # + edge ring


def test_line_and_single_cell(spark):
    line = _cells(spark, [(x, 10) for x in range(3, 9)])
    [r] = region_perimeter(line, RES, ["gid"]).collect()
    assert (r.area, r.perimeter) == (6, 14)  # 4*6 - 2*5
    assert cells_erode(line, RES, ["gid"]).count() == 0
    one = _cells(spark, [(20, 20)])
    [r1] = region_perimeter(one, RES, ["gid"]).collect()
    assert (r1.area, r1.perimeter) == (1, 4)
    assert r1.compactness_r == round(4 * 3.141592653589793 / 16, 6)


def test_hole_erodes_from_both_sides(spark):
    ring = [
        (x, y)
        for x, y in _square(2, 2, 6)
        if not (3 <= x <= 6 and 3 <= y <= 6) or (x in (2, 7) or y in (2, 7))
    ]
    # a 6x6 square minus its 4x4 interior = 1-cell-thick ring
    ring = [(x, y) for x, y in _square(2, 2, 6) if x in (2, 7) or y in (2, 7)]
    df = _cells(spark, ring)
    assert cells_erode(df, RES, ["gid"]).count() == 0  # thin ring vanishes
    [r] = region_perimeter(df, RES, ["gid"]).collect()
    assert r.area == 20
    # outer boundary 4*6=24 edges? exact: 4*20 - 2*adjacent(20 ring cells
    # have 20 adjacencies around the loop) = 80 - 40 = 40
    assert r.perimeter == 40


def test_groups_do_not_mix(spark):
    a = _cells(spark, _square(1, 1, 2), gid=0)
    b = _cells(spark, _square(2, 2, 2), gid=1)  # overlapping coords, other group
    both = a.unionAll(b)
    rows = {r.gid: (r.area, r.perimeter) for r in
            region_perimeter(both, RES, ["gid"]).collect()}
    assert rows == {0: (4, 8), 1: (4, 8)}
    dil = cells_dilate(both, RES, ["gid"])
    assert dil.filter(F.col("gid") == 0).count() == 4 + 8
