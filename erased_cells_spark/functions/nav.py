"""Great-circle navigation functions — initial bearing, cross-track and
along-track distance against a reference route: the course-keeping math
under corridor filters ("within 50 km of the shipping lane"), route
adherence scoring, and the radius family's directional complement.

Standard spherical formulas (public navigation literature), built as
per-row JVM expression chains with the SQL twin generated from the SAME
shapes in this module (the functions/pii.py both-dialects-in-one-place
discipline — keeping them adjacent is what stops drift):

    bearing(A→P)    θ = atan2(sin Δλ cos φP, cos φA sin φP − sin φA cos φP cos Δλ)
    cross-track     xt = asin(sin(d_AP/R) · sin(θ_AP − θ_AB)) · R
    along-track     at = acos(cos(d_AP/R) / cos(xt/R)) · R

Float stance: each output is ONE fixed transcendental chain per row (no
folds, no ranking on raw floats) under round(,4)/(,6) — the same
envelope as every haversine surface here, proven cross-engine by the
doc_route_navigation twin."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_R_KM = 6371.0088


def bearing_deg(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Initial great-circle bearing from point 1 to point 2, degrees in
    [0, 360)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2) - F.radians(lon1)
    y = F.sin(dl) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    return F.pmod(F.degrees(F.atan2(y, x)) + 360.0, F.lit(360.0))


def sql_bearing_deg(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    return (
        f"(degrees(atan2(sin(radians({lon2}) - radians({lon1})) * cos(radians({lat2})),"
        f" cos(radians({lat1})) * sin(radians({lat2}))"
        f" - sin(radians({lat1})) * cos(radians({lat2}))"
        f" * cos(radians({lon2}) - radians({lon1})))) + 360.0) % 360.0"
    )


def cross_track_km(
    d13_km: Column, brg13_deg: Column, brg12_deg: Column
) -> Column:
    """Signed cross-track distance of point 3 from the great circle
    through 1→2, given the 1→3 distance and the two bearings from 1.
    Negative = left of course."""
    return (
        F.asin(
            F.sin(d13_km / EARTH_R_KM)
            * F.sin(F.radians(brg13_deg) - F.radians(brg12_deg))
        )
        * EARTH_R_KM
    )


def sql_cross_track_km(d13: str, brg13: str, brg12: str) -> str:
    return (
        f"asin(sin(({d13}) / {EARTH_R_KM!r})"
        f" * sin(radians({brg13}) - radians({brg12}))) * {EARTH_R_KM!r}"
    )


def along_track_km(d13_km: Column, xt_km: Column) -> Column:
    """Distance along the course from point 1 to the foot of the
    perpendicular from point 3 (unsigned). The acos argument is clamped
    to [-1, 1] IDENTICALLY in both dialects — cos(d)/cos(xt) can exceed
    1 by an ulp exactly when the point sits on the course, and an
    unclamped NaN would poison the row on both engines."""
    ratio = F.least(
        F.lit(1.0),
        F.greatest(F.lit(-1.0), F.cos(d13_km / EARTH_R_KM) / F.cos(xt_km / EARTH_R_KM)),
    )
    return F.acos(ratio) * EARTH_R_KM


def sql_along_track_km(d13: str, xt: str) -> str:
    return (
        f"acos(least(1.0, greatest(-1.0,"
        f" cos(({d13}) / {EARTH_R_KM!r}) / cos(({xt}) / {EARTH_R_KM!r}))))"
        f" * {EARTH_R_KM!r}"
    )


def destination_point(
    lon: Column, lat: Column, bearing_deg_col: Column, dist_km: Column
) -> tuple[Column, Column]:
    """The direct geodesic problem on the sphere: (lon2, lat2) reached
    from (lon, lat) traveling `dist_km` along `bearing_deg_col` — route
    planning's forward step and the generator for synthetic tracks with
    controlled geometry. Two fixed per-row chains; longitude normalized
    to (-180, 180]."""
    p1 = F.radians(lat)
    l1 = F.radians(lon)
    th = F.radians(bearing_deg_col)
    dr = dist_km / EARTH_R_KM
    p2 = F.asin(F.sin(p1) * F.cos(dr) + F.cos(p1) * F.sin(dr) * F.cos(th))
    l2 = l1 + F.atan2(
        F.sin(th) * F.sin(dr) * F.cos(p1),
        F.cos(dr) - F.sin(p1) * F.sin(p2),
    )
    # +900 (not the textbook +540): l2 can reach just past -2*pi, where
    # degrees+540 goes NEGATIVE and Spark's pmod (always positive) would
    # diverge from SQL's sign-preserving %; +900 == +540 (mod 360) and
    # keeps the operand positive for BOTH
    lon2 = F.pmod(F.degrees(l2) + 900.0, F.lit(360.0)) - 180.0
    return lon2, F.degrees(p2)


def sql_destination_point(lon: str, lat: str, brg: str, dist: str) -> tuple[str, str]:
    p2 = (
        f"asin(sin(radians({lat})) * cos(({dist}) / {EARTH_R_KM!r})"
        f" + cos(radians({lat})) * sin(({dist}) / {EARTH_R_KM!r})"
        f" * cos(radians({brg})))"
    )
    lon2 = (
        f"((degrees(radians({lon}) + atan2("
        f"sin(radians({brg})) * sin(({dist}) / {EARTH_R_KM!r}) * cos(radians({lat})),"
        f" cos(({dist}) / {EARTH_R_KM!r}) - sin(radians({lat})) * sin({p2})))"
        f" + 900.0) % 360.0) - 180.0"
    )
    return lon2, f"degrees({p2})"
