"""Radius self-join (operators/radius.py) and Web-Mercator tiling
(functions/webmercator.py).

The radius join's exactly-once lat-band x lon-bucket candidate scheme is
checked against the brute-force all-pairs twin on adversarial point sets
(poles, antimeridian wrap, dense clusters, boundary-straddling bands) and
on the real geocoded doc points; the tiling formula is pinned to public
canonical vectors (OSM wiki Berlin tile, Bing's quadkey worked example) and
cross-checked Spark-expr vs numpy on random points.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.webmercator import (
    quadkey_expr,
    quadkey_np,
    quadkey_to_xyz,
    sql_quadkey,
    sql_tile_xy,
    tile_xy_exprs,
    tile_xy_np,
)
from erased_cells_spark.operators.radius import (
    KM_PER_DEG,
    radius_pairs,
    radius_pairs_np,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------ radius join --
def _spark_pairs(spark, ids, lon, lat, radius_km):
    df = spark.createDataFrame(
        list(zip(map(int, ids), map(float, lon), map(float, lat))),
        "id BIGINT, lon DOUBLE, lat DOUBLE",
    )
    rows = radius_pairs(df, radius_km).collect()
    return sorted((r.id_a, r.id_b, r.dist_km) for r in rows)


def _assert_matches_bruteforce(spark, ids, lon, lat, radius_km):
    got = _spark_pairs(spark, ids, lon, lat, radius_km)
    want = radius_pairs_np(ids, lon, lat, radius_km)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    np.testing.assert_allclose(
        [d for *_, d in got], [d for *_, d in want], rtol=1e-9, atol=1e-9
    )


def test_radius_pairs_uniform_random(spark):
    rng = np.random.default_rng(7)
    n = 300
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-90.0, 90.0, n)
    _assert_matches_bruteforce(spark, np.arange(n), lon, lat, 1200.0)


def test_radius_pairs_poles_and_antimeridian(spark):
    # clusters straddling the antimeridian and sitting AT the poles: the
    # lon-bucket wrap (pmod) and the n_b=1 polar collapse must both hold
    lon = np.array([179.9, -179.95, 179.2, -178.8, 0.0, 10.0, 20.0, 170.0, -170.0])
    lat = np.array([0.1, -0.1, 0.3, 0.2, 89.95, 89.9, 89.85, 89.99, 89.97])
    _assert_matches_bruteforce(spark, np.arange(len(lon)), lon, lat, 300.0)
    # south pole + exactly-on-boundary latitudes (band edges)
    h = 500.0 / KM_PER_DEG
    lat2 = np.array([-90.0, -90.0 + h, -90.0 + 2 * h, -89.99, 0.0, h - 90.0])
    lon2 = np.array([0.0, 120.0, -120.0, 45.0, 0.0, -60.0])
    _assert_matches_bruteforce(spark, np.arange(len(lon2)), lon2, lat2, 500.0)


def test_radius_pairs_dense_cluster_and_duplicates(spark):
    # identical coordinates (dist 0) and a dense disk — every unordered
    # pair appears exactly once (the exactly-once claim, not just recall)
    rng = np.random.default_rng(11)
    n = 60
    lon = np.concatenate([np.full(3, 5.0), 5.0 + rng.normal(0, 0.5, n - 3)])
    lat = np.concatenate([np.full(3, 45.0), 45.0 + rng.normal(0, 0.5, n - 3)])
    got = _spark_pairs(spark, np.arange(n), lon, lat, 200.0)
    keys = [(a, b) for a, b, _ in got]
    assert len(keys) == len(set(keys)), "pair emitted more than once"
    want = radius_pairs_np(np.arange(n), lon, lat, 200.0)
    assert keys == [(a, b) for a, b, _ in want]


def test_radius_pairs_small_radius(spark):
    # R small enough that lon buckets are thousands wide at the equator but
    # collapse to n_b=1 near the pole — recall must survive the transition
    rng = np.random.default_rng(3)
    n = 120
    lat = 89.0 + rng.uniform(0.0, 1.0, n)  # all within 1 deg of the pole
    lon = rng.uniform(-180.0, 180.0, n)
    _assert_matches_bruteforce(spark, np.arange(n), lon, lat, 25.0)


def test_radius_pairs_rejects_bad_radius(spark):
    df = None
    with pytest.raises(ValueError):
        radius_pairs(df, 0.0)


def test_radius_pairs_on_geocoded_docs(spark):
    # the twin's exact configuration on real testdata, vs the numpy twin
    from erased_cells_spark.queries import _doc_points

    p = _doc_points(spark, SF_DIR).select("doc_id", "lon", "lat").collect()
    ids = np.array([r.doc_id for r in p])
    lon = np.array([r.lon for r in p])
    lat = np.array([r.lat for r in p])
    got = _spark_pairs(spark, ids, lon, lat, 800.0)
    want = radius_pairs_np(ids, lon, lat, 800.0)
    assert len(got) > 50, "fixture should produce a meaningful pair count"
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]


# ----------------------------------------------------------- web mercator --
def test_tile_canonical_vectors():
    # OSM wiki "Slippy map tilenames" worked example: Berlin at zoom 17
    x, y = tile_xy_np([13.37771496], [52.51628011], 17)
    assert (int(x[0]), int(y[0])) == (70406, 42987)
    # corners / clamps
    x, y = tile_xy_np([-180.0, 179.999999, 0.0], [85.05112878, -85.05112878, 0.0], 1)
    assert x.tolist() == [0, 1, 1] and y.tolist() == [0, 1, 1]
    # Bing quadkey worked example: tile (3, 5) at level 3 -> "213"
    assert quadkey_to_xyz("213") == (3, 5, 3)


def test_quadkey_np_and_roundtrip():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180.0, 180.0, 200)
    lat = rng.uniform(-89.0, 89.0, 200)
    for z in (1, 4, 7):
        qk = quadkey_np(lon, lat, z)
        x, y = tile_xy_np(lon, lat, z)
        for i in range(len(qk)):
            assert quadkey_to_xyz(qk[i]) == (int(x[i]), int(y[i]), z)
        # prefix property: 1-char truncation == parent tile at z-1
        if z > 1:
            parents = quadkey_np(lon, lat, z - 1)
            assert all(q[: z - 1] == p for q, p in zip(qk, parents))


def test_quadkey_spark_matches_np_and_sql(spark):
    rng = np.random.default_rng(9)
    n = 400
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-86.0, 86.0, n)  # includes beyond-cutoff clamps
    df = spark.createDataFrame(
        list(zip(map(float, lon), map(float, lat))), "lon DOUBLE, lat DOUBLE"
    )
    z = 6
    got = (
        df.select(
            quadkey_expr(F.col("lon"), F.col("lat"), z).alias("qk"),
            tile_xy_exprs(F.col("lon"), F.col("lat"), z)[0].alias("x"),
            tile_xy_exprs(F.col("lon"), F.col("lat"), z)[1].alias("y"),
        )
        .collect()
    )
    want_qk = quadkey_np(lon, lat, z)
    wx, wy = tile_xy_np(lon, lat, z)
    assert [r.qk for r in got] == list(want_qk)
    assert [r.x for r in got] == wx.tolist()
    assert [r.y for r in got] == wy.tolist()

    import duckdb

    sx, sy = sql_tile_xy("lon", "lat", z)
    con = duckdb.connect()
    con.register(
        "pts_arrow",
        __import__("pyarrow").table({"lon": lon, "lat": lat}),
    )
    rows = con.sql(
        f"SELECT {sql_quadkey('lon', 'lat', z)} AS qk, {sx} AS x, {sy} AS y FROM pts_arrow"
    ).fetchall()
    con.close()
    assert [r[0] for r in rows] == list(want_qk)
    assert [r[1] for r in rows] == wx.tolist()
    assert [r[2] for r in rows] == wy.tolist()


def test_zoom_bounds():
    with pytest.raises(ValueError):
        tile_xy_np([0.0], [0.0], 0)
    with pytest.raises(ValueError):
        quadkey_np([0.0], [0.0], 24)
    with pytest.raises(ValueError):
        quadkey_to_xyz("0412")
