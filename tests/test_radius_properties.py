"""Property check of the radius join's candidate-completeness math (the
exactly-once proof in operators/radius.py), numpy-only so hypothesis can
hammer it: for ANY pair within R, the left point's emitted (band, bucket)
keys must contain the right point's key. This tests the derivation itself
(band width, phi_max bound, n_b collapse, wrap adjacency) independently of
Spark — the Spark-level equality tests live in test_radius_webmercator."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from erased_cells_spark.operators.knn import EARTH_R_KM, haversine_km_np
from erased_cells_spark.operators.radius import KM_PER_DEG


def _band(lat, h):
    return math.floor((lat + 90.0) / h)


def _n_buckets(band, radius_km, h):
    lo = band * h - 90.0
    hi = lo + h
    phi = max(abs(lo), abs(hi)) + h
    sin_half = math.sin(min(radius_km / (2.0 * EARTH_R_KM), math.pi / 2.0))
    if phi >= 90.0:
        return 1
    c = sin_half / math.cos(math.radians(phi))
    if c >= 1.0:
        return 1
    dlam = math.degrees(2.0 * math.asin(min(c, 1.0)))
    return max(1, math.floor(360.0 / dlam))


def _bucket0(lon, n_b):
    return math.floor((lon + 180.0) / 360.0 * n_b)


def _emitted_keys(lon, lat, radius_km):
    h = radius_km / KM_PER_DEG
    max_band = math.floor(180.0 / h)
    keys = set()
    b = _band(lat, h)
    for bp in (b - 1, b, b + 1):
        if not 0 <= bp <= max_band:
            continue
        n_b = _n_buckets(bp, radius_km, h)
        b0 = _bucket0(lon, n_b)
        for d in (-1, 0, 1):
            keys.add((bp, (b0 + d) % n_b))
    return keys


def _right_key(lon, lat, radius_km):
    h = radius_km / KM_PER_DEG
    b = _band(lat, h)
    n_b = _n_buckets(b, radius_km, h)
    return (b, _bucket0(lon, n_b) % n_b)


@settings(max_examples=2000, deadline=None)
@given(
    lon_a=st.floats(-180.0, 180.0),
    lat_a=st.floats(-90.0, 90.0),
    bearing=st.floats(0.0, 2.0 * math.pi),
    frac=st.floats(0.0, 1.0),
    radius_km=st.sampled_from([5.0, 50.0, 400.0, 800.0, 2000.0, 9000.0]),
)
def test_candidate_keys_cover_every_in_radius_pair(lon_a, lat_a, bearing, frac, radius_km):
    # destination point at distance frac*R along the bearing (exact
    # great-circle destination formula), so the pair is in-radius by
    # construction — including pairs pinned AT the radius and at the poles
    d = frac * radius_km / EARTH_R_KM
    p1 = math.radians(lat_a)
    l1 = math.radians(lon_a)
    p2 = math.asin(
        math.sin(p1) * math.cos(d) + math.cos(p1) * math.sin(d) * math.cos(bearing)
    )
    l2 = l1 + math.atan2(
        math.sin(bearing) * math.sin(d) * math.cos(p1),
        math.cos(d) - math.sin(p1) * math.sin(p2),
    )
    lat_b = math.degrees(p2)
    lon_b = (math.degrees(l2) + 540.0) % 360.0 - 180.0
    # guard: the constructed pair really is within R (numerical slop only)
    dist = float(haversine_km_np(np.array([lon_a]), np.array([lat_a]),
                                 np.array([lon_b]), np.array([lat_b]))[0])
    if dist > radius_km:  # destination-formula round-off at the boundary
        return
    assert _right_key(lon_b, lat_b, radius_km) in _emitted_keys(lon_a, lat_a, radius_km), (
        f"recall hole: a=({lon_a},{lat_a}) b=({lon_b},{lat_b}) R={radius_km} dist={dist}"
    )
