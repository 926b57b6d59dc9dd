"""Hexagonal grid binning (H3-style axial hexagons) as pure JVM
expressions (+ DuckDB twin fragments + numpy third opinion).

The public pointy-top axial-hex construction (the same geometry family H3
builds on — Red Blob Games' canonical formulation, public): a point
(x, y) = (lon, lat) on the engine's planar grid maps to fractional axial
coordinates for hex "circumradius" `size` (degrees):

    q = (sqrt(3)/3 · x − 1/3 · y) / size
    r = (2/3 · y) / size

then CUBE ROUNDING snaps to the containing hex: with cube coords
(cx, cy, cz) = (q, −q−r, r), round each and repair the axis with the
largest rounding error so rx + ry + rz == 0 holds. The result (rx, rz)
is the hex; its center back-projects to

    x = size · sqrt(3) · (rx + rz / 2),   y = size · 3/2 · rz

Cube rounding guarantees the assigned hex center is the nearest center in
the scaled cube metric — the property test checks it against numpy brute
force over the neighbor ring.

Determinism across engines: `round` is implemented as floor(v + 0.5)
(ties break UP on every engine — Spark HALF_UP only applies to decimals,
so we never rely on an engine's native double rounding), the two
irrational constants are embedded as identical Python-computed double
literals on all three paths, and every expression tree is written in the
same shape so IEEE evaluation is bit-identical. Everything after the two
floor()s is exact small-integer arithmetic.

Why hexagons at all, next to the square cell grid (operators/cells_expr)
and geohash (functions/geohash): hexes have uniform neighbor distance
(6 equidistant neighbors vs the square grid's 4+4 at two distances),
which makes ring queries and density smoothing isotropic — the standard
reason H3 exists. Packed id = (rq + 2^20) · 2^21 + (rz + 2^20) keeps the
pair in one positive long (shuffle currency), reversible by divmod.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

SQRT3_3 = math.sqrt(3.0) / 3.0   # 1/sqrt(3)
SQRT3 = math.sqrt(3.0)
_OFF = 1 << 20
_MOD = 1 << 21


def _round_half_up(v: Column) -> Column:
    return F.floor(v + F.lit(0.5))


def hex_qr_exprs(lon: Column, lat: Column, size: float) -> tuple[Column, Column]:
    """Axial (q, r) integer hex coordinates — generated JVM arithmetic."""
    fq = (F.lit(SQRT3_3) * lon - F.lit(1.0 / 3.0) * lat) / F.lit(float(size))
    fr = (F.lit(2.0 / 3.0) * lat) / F.lit(float(size))
    cy = -fq - fr
    rx = _round_half_up(fq)
    ry = _round_half_up(cy)
    rz = _round_half_up(fr)
    dx = F.abs(rx.cast("double") - fq)
    dy = F.abs(ry.cast("double") - cy)
    dz = F.abs(rz.cast("double") - fr)
    q = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx).cast("long")
    r = F.when(~((dx > dy) & (dx > dz)) & (dz > dy), -rx - ry).otherwise(rz).cast("long")
    return q, r


def hex_id_expr(lon: Column, lat: Column, size: float) -> Column:
    """(q, r) packed into one positive long."""
    q, r = hex_qr_exprs(lon, lat, size)
    return (q + F.lit(_OFF)) * F.lit(_MOD) + (r + F.lit(_OFF))


def hex_center_exprs(hex_id: Column, size: float) -> tuple[Column, Column]:
    """Back-project a packed hex id to its center (lon, lat)."""
    cx = float(size) * SQRT3   # fold in Python: ONE literal on every path,
    cy = float(size) * 1.5     # so no engine's own folding can reassociate
    q = (F.floor(hex_id / F.lit(_MOD)) - F.lit(_OFF)).cast("double")
    r = (hex_id % F.lit(_MOD) - F.lit(_OFF)).cast("double")
    return (F.lit(cx) * (q + r / F.lit(2.0)), F.lit(cy) * r)


def sql_hex_id(lon_expr: str, lat_expr: str, size: float) -> str:
    """The identical binning in DuckDB SQL (correlated-scalar form, like
    functions/geohash.sql_geohash)."""
    s = float(size)
    fq = f"(({SQRT3_3!r} * ({lon_expr}) - ({1.0 / 3.0!r}) * ({lat_expr})) / {s!r})"
    fr = f"((({2.0 / 3.0!r}) * ({lat_expr})) / {s!r})"
    return f"""(SELECT (CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END + {_OFF})
        * {_MOD}
        + (CASE WHEN NOT (dx > dy AND dx > dz) AND dz > dy THEN -rx - ry ELSE rz END + {_OFF})
  FROM (SELECT rx, ry, rz,
               abs(rx::DOUBLE - fq) AS dx, abs(ry::DOUBLE - cy) AS dy,
               abs(rz::DOUBLE - fr) AS dz
        FROM (SELECT fq, fr, cy,
                     CAST(floor(fq + 0.5) AS BIGINT) AS rx,
                     CAST(floor(cy + 0.5) AS BIGINT) AS ry,
                     CAST(floor(fr + 0.5) AS BIGINT) AS rz
              FROM (SELECT {fq} AS fq, {fr} AS fr, -{fq} - {fr} AS cy))))"""


def sql_hex_center(hexid_expr: str, size: float) -> tuple[str, str]:
    s = float(size)
    q = f"(CAST(floor(({hexid_expr}) / {_MOD}) AS BIGINT) - {_OFF})::DOUBLE"
    r = f"((({hexid_expr}) % {_MOD}) - {_OFF})::DOUBLE"
    cx = s * SQRT3
    cy = s * 1.5
    return (f"({cx!r} * ({q} + {r} / 2.0))", f"({cy!r} * {r})")


def hex_qr_np(lon, lat, size: float) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized numpy third opinion (same exact formula)."""
    x = np.asarray(lon, np.float64)
    y = np.asarray(lat, np.float64)
    fq = (SQRT3_3 * x - (1.0 / 3.0) * y) / float(size)
    fr = ((2.0 / 3.0) * y) / float(size)
    cy = -fq - fr
    rx = np.floor(fq + 0.5).astype(np.int64)
    ry = np.floor(cy + 0.5).astype(np.int64)
    rz = np.floor(fr + 0.5).astype(np.int64)
    dx = np.abs(rx - fq)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - fr)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_z, -rx - ry, rz)
    return q, r


def hex_id_np(lon, lat, size: float) -> np.ndarray:
    q, r = hex_qr_np(lon, lat, size)
    return (q + _OFF) * _MOD + (r + _OFF)


def hex_center_np(q, r, size: float) -> tuple[np.ndarray, np.ndarray]:
    q = np.asarray(q, np.float64)
    r = np.asarray(r, np.float64)
    cx = float(size) * SQRT3
    cy = float(size) * 1.5
    return cx * (q + r / 2.0), cy * r
