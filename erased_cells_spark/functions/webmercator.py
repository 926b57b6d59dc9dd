"""Web-Mercator slippy-map tiling: (lon, lat, zoom) -> XYZ tile indices and
Bing-style base-4 quadkey strings — the interchange "tile assignment" of the
web-mapping world (OSM/Google XYZ scheme, Bing quadkeys), next to the
engine's integer Morton cells (spatial/cellid.py) and base-32 geohash
(functions/geohash.py).

The quadkey has the same load-bearing property as a geohash prefix: 1-char
truncation IS the parent tile at zoom-1, so multi-zoom rollups are prefix
group-bys with zero re-encoding. All three surfaces (Spark Column / ANSI SQL
/ numpy) evaluate the SAME formula:

    x = clamp(floor((lon + 180) / 360 * 2^z),                 0, 2^z - 1)
    m = ln(tan(rad(lat')) + 1 / cos(rad(lat'))),  lat' = clamp(lat, +/-85.05112878)
    y = clamp(floor((1 - m / pi) / 2 * 2^z),                  0, 2^z - 1)
    quadkey[i] = bit_{z-1-i}(x) + 2 * bit_{z-1-i}(y)   (digits '0'..'3')

The y formula goes through tan/ln, so unlike the pure-arithmetic geohash the
cross-engine parity argument is probabilistic rather than bit-exact: JVM
Math and libm agree to <= 1 ulp, so an engine pair can only disagree when a
point's continuous tile coordinate sits within ~2^z * 1e-16 of an integer
boundary — for md5-geocoded points the probability is ~1e-11 per point at
z <= 8 (the hillshade twin made the same trade for its transcendental
surface). The canonical test vectors (OSM wiki Berlin tile, Bing's
quadkey example) pin the formula itself.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LAT = 85.05112878  # Web-Mercator latitude cutoff (Bing/OSM standard)


def _check_zoom(zoom: int) -> None:
    if not 1 <= zoom <= 23:
        raise ValueError(f"web-mercator zoom must be in [1, 23], got {zoom}")


def tile_xy_exprs(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """XYZ tile indices as generated JVM expressions (no Python)."""
    _check_zoom(zoom)
    n = 1 << zoom
    x = F.greatest(
        F.least(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))).cast("long"),
            F.lit(n - 1),
        ),
        F.lit(0),
    )
    latc = F.greatest(F.least(lat, F.lit(MAX_LAT)), F.lit(-MAX_LAT))
    rad = F.radians(latc)
    m = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    y = F.greatest(
        F.least(
            F.floor(
                (F.lit(1.0) - m / F.lit(math.pi)) / F.lit(2.0) * F.lit(float(n))
            ).cast("long"),
            F.lit(n - 1),
        ),
        F.lit(0),
    )
    return x, y


def quadkey_expr(lon: Column, lat: Column, zoom: int) -> Column:
    """Base-4 quadkey string column; prefix truncation = zoom coarsening."""
    x, y = tile_xy_exprs(lon, lat, zoom)
    chars = [
        F.substring(
            F.lit("0123"),
            (
                F.shiftright(x, zoom - 1 - i).bitwiseAND(F.lit(1))
                + F.shiftright(y, zoom - 1 - i).bitwiseAND(F.lit(1)) * F.lit(2)
            ).cast("int")
            + F.lit(1),
            F.lit(1),
        )
        for i in range(zoom)
    ]
    return F.concat(*chars)


def sql_tile_xy(lon_expr: str, lat_expr: str, zoom: int) -> tuple[str, str]:
    """The identical formula in DuckDB SQL for the correctness oracle."""
    _check_zoom(zoom)
    n = 1 << zoom
    x = (
        f"greatest(least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {n}.0) "
        f"AS BIGINT), {n - 1}), 0)"
    )
    latc = f"greatest(least(({lat_expr}), {MAX_LAT!r}), {-MAX_LAT!r})"
    m = f"ln(tan(radians({latc})) + 1.0 / cos(radians({latc})))"
    y = (
        f"greatest(least(CAST(floor((1.0 - ({m}) / pi()) / 2.0 * {n}.0) "
        f"AS BIGINT), {n - 1}), 0)"
    )
    return x, y


def sql_quadkey(lon_expr: str, lat_expr: str, zoom: int) -> str:
    x, y = sql_tile_xy(lon_expr, lat_expr, zoom)
    chars = " || ".join(
        f"substr('0123', CAST((((x >> {zoom - 1 - i}) & 1) + "
        f"((y >> {zoom - 1 - i}) & 1) * 2) AS INTEGER) + 1, 1)"
        for i in range(zoom)
    )
    return f"(SELECT {chars} FROM (SELECT {x} AS x, {y} AS y))"


def tile_xy_np(lon, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized numpy third opinion (same exact formula)."""
    _check_zoom(zoom)
    n = 1 << zoom
    lon = np.asarray(lon, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -MAX_LAT, MAX_LAT)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    rad = np.radians(lat)
    m = np.log(np.tan(rad) + 1.0 / np.cos(rad))
    y = np.clip(np.floor((1.0 - m / math.pi) / 2.0 * n).astype(np.int64), 0, n - 1)
    return x, y


def quadkey_np(lon, lat, zoom: int) -> np.ndarray:
    x, y = tile_xy_np(lon, lat, zoom)
    out = np.empty(len(x), dtype=object)
    for i in range(len(x)):
        digits = [
            str(((int(x[i]) >> (zoom - 1 - j)) & 1) + (((int(y[i]) >> (zoom - 1 - j)) & 1) << 1))
            for j in range(zoom)
        ]
        out[i] = "".join(digits)
    return out


def quadkey_to_xyz(quadkey: str) -> tuple[int, int, int]:
    """Decode a quadkey back to (x, y, zoom) — round-trip test surface."""
    x = y = 0
    for ch in quadkey:
        d = int(ch)
        if not 0 <= d <= 3:
            raise ValueError(f"invalid quadkey digit {ch!r} in {quadkey!r}")
        x = (x << 1) | (d & 1)
        y = (y << 1) | (d >> 1)
    return x, y, len(quadkey)
