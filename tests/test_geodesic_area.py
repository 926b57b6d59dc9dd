"""Geodesic (spherical-excess) polygon area: exact goldens for the numpy
kernel (octant lune, antimeridian wrap, latitude shrink) and distributed ==
kernel for geodesic_area_df. Cross-engine parity runs in test_oracle_twins
(zone_geodesic_areas)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from erased_cells_spark.operators.pip import geodesic_area_df
from erased_cells_spark.spatial.geom import (
    EARTH_R_KM,
    make_polygon_fixtures,
    spherical_area_km2,
)


def test_octant_is_exact():
    ring = np.array([[0.0, 0.0], [90.0, 0.0], [0.0, 90.0], [0.0, 0.0]])
    want = math.pi * EARTH_R_KM**2 / 2.0  # 1/8 of the sphere
    assert spherical_area_km2(ring) == pytest.approx(want, rel=1e-14)


def test_orientation_independent_and_wrap():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
    a = spherical_area_km2(sq)
    assert a == pytest.approx(spherical_area_km2(sq[::-1]), rel=1e-14)
    # antimeridian-crossing unit square measures the short way
    am = np.array(
        [[179.5, -0.5], [-179.5, -0.5], [-179.5, 0.5], [179.5, 0.5], [179.5, -0.5]]
    )
    assert spherical_area_km2(am) == pytest.approx(a, rel=1e-3)
    # ~ (111.195 km)^2 at the equator
    assert a == pytest.approx((math.pi / 180.0 * EARTH_R_KM) ** 2, rel=1e-3)


def test_latitude_shrink():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
    hi = sq + np.array([0.0, 60.0])
    ratio = spherical_area_km2(hi) / spherical_area_km2(sq)
    assert ratio == pytest.approx(math.cos(math.radians(60.5)), rel=1e-3)


def test_distributed_equals_kernel(spark):
    polys = make_polygon_fixtures(16, seed=7)
    rows = [
        (int(p["poly_id"]), [[float(x), float(y)] for x, y in p["ring"]])
        for p in polys
    ]
    df = spark.createDataFrame(rows, "poly_id BIGINT, ring ARRAY<ARRAY<DOUBLE>>")
    got = {r.poly_id: r.area_km2 for r in geodesic_area_df(df).collect()}
    for p in polys:
        want = spherical_area_km2(np.asarray(p["ring"], np.float64))
        assert got[int(p["poly_id"])] == pytest.approx(want, rel=1e-12)
