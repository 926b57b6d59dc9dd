"""Navigation-function contracts (functions/nav.py): known bearings
(cardinal directions, equator), cross-track sign convention, on-course
zero cross-track with along == distance, and the acos clamp. Cross-
engine parity is the doc_route_navigation twin."""

import math

from pyspark.sql import functions as F

from erased_cells_spark.functions.nav import (
    EARTH_R_KM,
    along_track_km,
    bearing_deg,
    cross_track_km,
)


def _one(spark, cols):
    return spark.range(1).select(*cols).collect()[0]


def test_cardinal_bearings(spark):
    r = _one(
        spark,
        [
            bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(0.0)).alias("e"),
            bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(10.0)).alias("n"),
            bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(-10.0), F.lit(0.0)).alias("w"),
            bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(-10.0)).alias("s"),
        ],
    )
    assert (r.e, r.n, r.w, r.s) == (90.0, 0.0, 270.0, 180.0)


def test_cross_track_sign_and_on_course(spark):
    # route due east along the equator; a point due north of the origin
    # path is LEFT of course -> negative cross-track
    d = 500.0
    r = _one(
        spark,
        [
            cross_track_km(F.lit(d), F.lit(0.0), F.lit(90.0)).alias("left"),
            cross_track_km(F.lit(d), F.lit(180.0), F.lit(90.0)).alias("right"),
            cross_track_km(F.lit(d), F.lit(90.0), F.lit(90.0)).alias("on"),
        ],
    )
    assert r.left < 0 < r.right
    assert abs(abs(r.left) - d) < 1e-6  # perpendicular: |xt| == distance
    assert r.on == 0.0


def test_along_track_on_course_equals_distance_and_clamp(spark):
    d = 1234.5
    r = _one(
        spark,
        [
            along_track_km(F.lit(d), F.lit(0.0)).alias("on"),
            # xt == d: the foot is the origin; ratio cos(d)/cos(d) == 1
            along_track_km(F.lit(d), F.lit(d)).alias("perp"),
        ],
    )
    assert abs(r.on - d) < 1e-9
    assert r.perp == 0.0


def test_small_angle_consistency(spark):
    # 1 degree along the equator ~ 111.19 km
    d = math.radians(1.0) * EARTH_R_KM
    r = _one(
        spark,
        [cross_track_km(F.lit(d), F.lit(45.0), F.lit(90.0)).alias("xt")],
    )
    # sin(45 deg) of the distance, small-angle
    assert abs(abs(r.xt) - d * math.sin(math.radians(45))) < 0.01


def test_destination_round_trip(spark):
    """haversine(origin, destination(origin, brg, d)) == d — the inverse
    problem recovers the direct problem's distance (sub-meter), across
    hemispheres and the antimeridian."""
    from erased_cells_spark.functions.nav import destination_point
    from erased_cells_spark.operators.knn import haversine_km_expr

    rows = [
        (0, -179.5, 10.0, 270.0, 800.0),   # west across the antimeridian
        (1, 179.5, -45.0, 90.0, 1200.0),   # east across it
        (2, 0.0, 0.0, 45.0, 5000.0),
        (3, 30.0, 80.0, 10.0, 900.0),      # near-polar
        (4, -60.0, -80.0, 200.0, 400.0),
    ]
    df = spark.createDataFrame(rows, "i long, lon double, lat double, brg double, d double")
    lon2, lat2 = destination_point(F.col("lon"), F.col("lat"), F.col("brg"), F.col("d"))
    out = df.select(
        "i", "d",
        haversine_km_expr(F.col("lon"), F.col("lat"), lon2, lat2).alias("back"),
        lon2.alias("lon2"),
    ).collect()
    for r in out:
        assert abs(r.back - r.d) < 1e-3, (r.i, r.back, r.d)
        assert -180.0 < r.lon2 <= 180.0
