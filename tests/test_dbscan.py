"""Exact DBSCAN (operators/dbscan.py): python reference equivalence on
random blob fixtures (full labeling: role AND cluster id), hand cases
for core/border/noise and the deterministic shared-border rule,
isolated-core singletons, grid-size invariance via eps choices, and
validation. Cross-engine identity is proven by the geo_dbscan_clusters
twin."""

import numpy as np
import pytest

from erased_cells_spark.operators.dbscan import dbscan


def python_dbscan(points, eps, min_pts):
    """Reference with the module's exact conventions (min-id labels,
    min-cluster border assignment, self counted)."""
    ids = [p[0] for p in points]
    xy = {p[0]: (p[1], p[2]) for p in points}

    def nbrs(i):
        xi, yi = xy[i]
        return [
            j for j in ids
            if j != i and (xy[j][0] - xi) ** 2 + (xy[j][1] - yi) ** 2 <= eps * eps
        ]

    neigh = {i: nbrs(i) for i in ids}
    core = {i for i in ids if len(neigh[i]) + 1 >= min_pts}
    # components over core-core edges (min label via repeated relax)
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in neigh[i]:
                if j in core and label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    # propagate to true min via indirection
    def find(i):
        while label[i] != i:
            i = label[i]
        return i

    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", find(i))
        else:
            cands = [find(j) for j in neigh[i] if j in core]
            out[i] = ("border", min(cands)) if cands else ("noise", -1)
    return out


def run(spark, points, eps, min_pts):
    df = spark.createDataFrame(points, "id LONG, x LONG, y LONG")
    return {r["id"]: (r["role"], r["cluster"]) for r in dbscan(df, eps, min_pts).collect()}


def test_hand_case_roles_and_shared_border(spark):
    # two 3-point cores 100 apart; a border point equidistant-ish to both
    pts = [(0, 0, 0), (1, 5, 0), (2, 0, 5),
           (10, 100, 0), (11, 105, 0), (12, 100, 5),
           (20, 50, 0),            # noise: no core within eps
           (21, 14, 0),            # 1 core neighbor only -> border of 0
           (22, 91, 0)]            # 1 core neighbor only -> border of 10
    got = run(spark, pts, eps=10, min_pts=3)
    assert got == python_dbscan(pts, 10, 3)
    assert got[0] == ("core", 0) and got[10] == ("core", 10)
    assert got[20] == ("noise", -1)
    assert got[21] == ("border", 0) and got[22] == ("border", 10)


def test_matches_reference_on_random_blobs(spark):
    rng = np.random.default_rng(47)
    pts = []
    i = 0
    for cx, cy in [(0, 0), (300, 300), (600, 0)]:
        for _ in range(40):
            pts.append((i, int(cx + rng.integers(-30, 31)), int(cy + rng.integers(-30, 31))))
            i += 1
    for _ in range(25):  # scattered noise
        pts.append((i, int(rng.integers(-1000, 1000)), int(rng.integers(-1000, 1000))))
        i += 1
    for eps, mp in [(20, 4), (40, 6), (15, 3)]:
        assert run(spark, pts, eps, mp) == python_dbscan(pts, eps, mp), (eps, mp)


def test_isolated_core_is_singleton_cluster(spark):
    pts = [(5, 0, 0)]  # min_pts=1: alone but core (self counts)
    assert run(spark, pts, eps=3, min_pts=1) == {5: ("core", 5)}


def test_validation(spark):
    df = [(0, 0, 0)]
    with pytest.raises(ValueError):
        run(spark, df, eps=0, min_pts=1)
    with pytest.raises(ValueError):
        run(spark, df, eps=5, min_pts=0)
