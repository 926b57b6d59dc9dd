"""Segment rasterization contracts (operators/raster.rasterize_segments):
known walks (horizontal/vertical/diagonal/steep), exactly-once per
(segment, cell), degenerate points, and agreement with the viewshed's
DDA convention. Cross-engine parity is the geo_traversal_heatmap twin."""

from erased_cells_spark.operators.raster import rasterize_segments

RES = 5
N = 1 << RES


def _walk(spark, ax, ay, bx, by):
    df = spark.createDataFrame(
        [(0, ax, ay, bx, by)], "seg_id long, ax long, ay long, bx long, by long"
    )
    rows = rasterize_segments(df, RES).collect()
    cells = [r.cell for r in rows]
    assert len(cells) == len(set(cells))  # exactly-once, no distinct needed
    return {(c % N, c // N) for c in cells}


def test_axis_walks(spark):
    assert _walk(spark, 2, 3, 6, 3) == {(x, 3) for x in range(2, 7)}
    assert _walk(spark, 4, 8, 4, 5) == {(4, y) for y in range(5, 9)}


def test_diagonal_and_steep(spark):
    assert _walk(spark, 0, 0, 4, 4) == {(i, i) for i in range(5)}
    # steep line (dy dominant): minor x advances by round-half-up
    got = _walk(spark, 0, 0, 2, 6)
    assert (0, 0) in got and (2, 6) in got and len(got) == 7
    ys = sorted(y for _, y in got)
    assert ys == list(range(7))  # one cell per major step


def test_point_segment(spark):
    assert _walk(spark, 9, 9, 9, 9) == {(9, 9)}


def test_reverse_direction_same_endpoints(spark):
    a = _walk(spark, 1, 1, 7, 3)
    b = _walk(spark, 7, 3, 1, 1)
    # both include the endpoints and have one cell per major step;
    # round-half-up is direction-symmetric by the sign-outside formula
    assert (1, 1) in a and (7, 3) in a
    assert (1, 1) in b and (7, 3) in b
    assert len(a) == len(b) == 7
