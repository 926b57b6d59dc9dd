"""Polygon rasterization contracts (operators/raster.rasterize_polygons):
analytically-known areas, hole parity, orientation invariance, and
point-in-polygon agreement per covered cell. Cross-engine parity is the
raster_polygon_fill twin."""

from erased_cells_spark.operators.raster import rasterize_polygons

RES = 5
N = 1 << RES


def _df(spark, verts):
    return spark.createDataFrame(
        verts, "poly_id long, ring_id long, seq long, x long, y long"
    )


def _cells(spark, verts, poly=0):
    return {
        r.cell
        for r in rasterize_polygons(_df(spark, verts), RES).collect()
        if r.poly_id == poly
    }


def test_axis_aligned_square_exact_area(spark):
    # square corners (2,2)-(10,10) in doubled coords = cells [1,5) x [1,5)
    verts = [(0, 0, 0, 2, 2), (0, 0, 1, 10, 2), (0, 0, 2, 10, 10), (0, 0, 3, 2, 10)]
    got = _cells(spark, verts)
    assert got == {iy * N + ix for ix in range(1, 5) for iy in range(1, 5)}


def test_diamond_matches_brute_parity(spark):
    # diamond radius 10 cells; some centers lie EXACTLY on the slanted
    # edges — the parity rule (strict crossing-right) decides them, and
    # the brute reference below applies the identical rule
    ring = [(32, 12), (52, 32), (32, 52), (12, 32)]
    verts = [(0, 0, i, x, y) for i, (x, y) in enumerate(ring)]
    got = _cells(spark, verts)
    want = {
        iy * N + ix
        for ix in range(N)
        for iy in range(N)
        if _brute_inside(ring, 2 * ix + 1, 2 * iy + 1)
    }
    assert got == want
    assert len(got) == 200  # the parity fill lands exactly on 2*r^2


def _brute_inside(ring, px, py):
    c = 0
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        if (y1 > py) != (y2 > py):
            t = (py - y1) * (x2 - x1)
            lhs = (px - x1) * (y2 - y1)
            if (t > lhs) if y2 > y1 else (t < lhs):
                c += 1
    return c % 2 == 1


def test_hole_parity(spark):
    verts = [
        (0, 0, 0, 4, 4), (0, 0, 1, 20, 4), (0, 0, 2, 20, 20), (0, 0, 3, 4, 20),
        (0, 1, 0, 8, 8), (0, 1, 1, 16, 8), (0, 1, 2, 16, 16), (0, 1, 3, 8, 16),
    ]
    got = _cells(spark, verts)
    assert len(got) == 64 - 16
    assert (5 * N + 5) not in got  # center (11,11) inside the hole
    assert (2 * N + 2) in got      # ring area


def test_orientation_invariance(spark):
    cw = [(0, 0, 0, 4, 4), (0, 0, 1, 4, 20), (0, 0, 2, 20, 20), (0, 0, 3, 20, 4)]
    ccw = [(0, 0, 0, 4, 4), (0, 0, 1, 20, 4), (0, 0, 2, 20, 20), (0, 0, 3, 4, 20)]
    assert _cells(spark, cw) == _cells(spark, ccw)


def test_sliver_triangle(spark):
    # thin triangle: only centers strictly inside by the parity rule
    verts = [(0, 0, 0, 0, 0), (0, 0, 1, 40, 0), (0, 0, 2, 0, 4)]
    got = _cells(spark, verts)

    def inside(px, py):  # brute crossing-number on the doubled coords
        ring = [(0, 0), (40, 0), (0, 4)]
        c = 0
        for i in range(3):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % 3]
            if (y1 > py) != (y2 > py):
                t = (py - y1) * (x2 - x1)
                lhs = (px - x1) * (y2 - y1)
                if (t > lhs) if y2 > y1 else (t < lhs):
                    c += 1
        return c % 2 == 1

    want = {
        iy * N + ix
        for ix in range(N)
        for iy in range(N)
        if inside(2 * ix + 1, 2 * iy + 1)
    }
    assert got == want and got  # non-empty
