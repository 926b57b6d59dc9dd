"""Ripley's K contracts (operators/autocorr.ripley_k): pair counts match
the brute-force haversine truth per radius, the CSR ratio reads ~1 for
uniform-ish scatter and >>1 for a planted cluster, and radii validate.
Cross-engine value parity is the geo_ripley_k twin."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from erased_cells_spark.operators.autocorr import ripley_k
from erased_cells_spark.operators.radius import haversine_km_np


def _df(spark, pts):
    return spark.createDataFrame(pts, "id long, lon double, lat double")


def _brute_counts(pts, radii):
    lon = np.array([p[1] for p in pts])
    lat = np.array([p[2] for p in pts])
    counts = {r: 0 for r in radii}
    for i in range(len(pts)):
        d = haversine_km_np(lon[i], lat[i], lon[i + 1 :], lat[i + 1 :])
        for r in radii:
            counts[r] += int((d <= r).sum())
    return counts


def test_pair_counts_match_brute(spark):
    rng = np.random.RandomState(3)
    pts = [
        (i, float(rng.uniform(-179, 179)), float(rng.uniform(-80, 80)))
        for i in range(150)
    ]
    radii = [300.0, 900.0, 2500.0]
    rows = {r.r_km: r for r in ripley_k(_df(spark, pts), radii, id_col="id").collect()}
    brute = _brute_counts(pts, radii)
    assert {r: rows[r].n_pairs for r in radii} == brute
    assert all(rows[r].n_pts == 150 for r in radii)


def test_planted_cluster_reads_clustered(spark):
    rng = np.random.RandomState(5)
    # 60 points inside a ~100 km blob + 40 scattered globally
    blob = [
        (i, 10.0 + float(rng.uniform(-0.5, 0.5)), 20.0 + float(rng.uniform(-0.5, 0.5)))
        for i in range(60)
    ]
    scatter = [
        (100 + i, float(rng.uniform(-179, 179)), float(rng.uniform(-80, 80)))
        for i in range(40)
    ]
    rows = {
        r.r_km: r
        for r in ripley_k(_df(spark, blob + scatter), [200.0], id_col="id").collect()
    }
    assert rows[200.0].clustering_ratio_r > 10  # massively over CSR


def test_radii_validation(spark):
    with pytest.raises(ValueError):
        ripley_k(None, [])
    with pytest.raises(ValueError):
        ripley_k(None, [100.0, -5.0])
