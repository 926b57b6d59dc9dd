"""Convex hull contracts (operators/hull.py): canonical CCW order and
vertex set vs a brute-force reference on random clouds, strict-turn
collinear exclusion, partition invariance of the two-phase chain, and
degenerate inputs. Cross-engine set parity is the geo_convex_hull twin."""

import random

from erased_cells_spark.operators.hull import convex_hull, hull_area2, hull_py


def _brute_vertices(pts):
    """p is a hull vertex iff not in conv(others) — triangle/segment test."""
    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    verts = []
    for p in pts:
        others = [q for q in pts if q != p]
        inside = False
        for i, a in enumerate(others):
            for j in range(i + 1, len(others)):
                b = others[j]
                if cross(a, b, p) == 0 and (
                    (a[0] - p[0]) * (b[0] - p[0]) + (a[1] - p[1]) * (b[1] - p[1]) <= 0
                ):
                    inside = True
                    break
                for k in range(j + 1, len(others)):
                    c = others[k]
                    if cross(a, b, c) == 0:
                        continue
                    d1, d2, d3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
                    if (d1 >= 0 and d2 >= 0 and d3 >= 0) or (
                        d1 <= 0 and d2 <= 0 and d3 <= 0
                    ):
                        inside = True
                        break
                if inside:
                    break
            if inside:
                break
        if not inside:
            verts.append(p)
    return sorted(verts)


def _df(spark, pts):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows, "pid long, x long, y long")


def test_random_cloud_matches_brute_and_reference(spark):
    rng = random.Random(13)
    pts = list({(rng.randrange(0, 500), rng.randrange(0, 500)) for _ in range(80)})
    rows = sorted(
        convex_hull(_df(spark, pts)).collect(), key=lambda r: r.hull_pos
    )
    got_ring = [(r.x, r.y) for r in rows]
    ref = hull_py([(x, y, None) for x, y in pts])
    assert got_ring == [(p[0], p[1]) for p in ref]
    assert sorted(got_ring) == _brute_vertices(pts)
    assert hull_area2(ref) > 0  # CCW orientation: positive shoelace


def test_collinear_mid_edge_points_excluded(spark):
    pts = [(0, 0), (10, 0), (5, 0), (5, 5), (0, 10), (10, 10), (5, 10)]
    rows = convex_hull(_df(spark, pts)).collect()
    got = sorted((r.x, r.y) for r in rows)
    assert got == [(0, 0), (0, 10), (10, 0), (10, 10)]


def test_partition_invariance(spark):
    rng = random.Random(29)
    pts = list({(rng.randrange(0, 2000), rng.randrange(0, 2000)) for _ in range(300)})
    a = convex_hull(_df(spark, pts).repartition(1)).collect()
    b = convex_hull(_df(spark, pts).repartition(16)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_degenerate_inputs(spark):
    # single point, two points, all-collinear
    assert len(convex_hull(_df(spark, [(3, 4)])).collect()) == 1
    assert len(convex_hull(_df(spark, [(0, 0), (5, 5)])).collect()) == 2
    line = [(i, 2 * i) for i in range(10)]
    got = sorted((r.x, r.y) for r in convex_hull(_df(spark, line)).collect())
    assert got == [(0, 0), (9, 18)]  # endpoints only


def test_ids_carried_through(spark):
    pts = [(0, 0), (10, 0), (0, 10), (4, 4)]
    rows = convex_hull(_df(spark, pts)).collect()
    by_coord = {(r.x, r.y): r.pid for r in rows}
    assert by_coord == {(0, 0): 0, (10, 0): 1, (0, 10): 2}
