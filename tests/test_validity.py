"""Polygon validity audit (geom.ring_self_intersections +
pip.polygon_validity_df): proper-crossing counts on known shapes, strict
touch exclusion, distributed == kernel. Cross-engine parity runs in
test_oracle_twins (polygon_validity_audit)."""

from __future__ import annotations

import numpy as np

from erased_cells_spark.operators.pip import polygon_validity_df
from erased_cells_spark.spatial.geom import ring_self_intersections


def _ring(*pts):
    v = list(pts) + [pts[0]]
    return np.asarray(v, np.float64)


def test_simple_shapes_have_zero():
    assert ring_self_intersections(_ring((0, 0), (1, 0), (1, 1), (0, 1))) == 0
    assert ring_self_intersections(_ring((0, 0), (2, 0), (1, 3))) == 0  # triangle


def test_bowtie_has_one():
    assert ring_self_intersections(_ring((0, 0), (2, 0), (0, 2), (2, 2))) == 1


def test_pentagram_has_five():
    ang = [np.pi / 2 + 2 * np.pi * (2 * k) / 5 for k in range(5)]  # skip-2 star
    pts = [(np.cos(a), np.sin(a)) for a in ang]
    assert ring_self_intersections(_ring(*pts)) == 5


def test_touches_are_not_crossings():
    # T-joint: an edge ENDPOINT on another edge's interior -> strict test
    # says simple (ill-definedness starts at proper crossings)
    assert ring_self_intersections(_ring((0, 0), (4, 0), (2, 0), (2, 3))) == 0
    # shared vertex between non-adjacent edges (figure-eight pinch)
    assert (
        ring_self_intersections(
            _ring((0, 0), (1, 1), (2, 0), (1, 1))
        )
        == 0
    )


def test_distributed_equals_kernel(spark):
    rows = [
        (0, [[0.0, 0.0], [2.0, 0.0], [0.0, 2.0], [2.0, 2.0], [0.0, 0.0]]),  # bowtie
        (1, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]),  # square
    ]
    df = spark.createDataFrame(rows, "poly_id BIGINT, ring ARRAY<ARRAY<DOUBLE>>")
    got = {r.poly_id: (r.n_crossings, r.is_simple) for r in polygon_validity_df(df).collect()}
    assert got == {0: (1, False), 1: (0, True)}
