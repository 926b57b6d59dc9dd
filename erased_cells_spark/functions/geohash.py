"""Geohash encoding as pure JVM expressions (+ DuckDB twin fragments).

The standard public geohash: successive bisection of lon ∈ [-180, 180] and
lat ∈ [-90, 90], bits interleaved MSB-first starting with longitude, packed
5-bits-per-character into the base-32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``. For precision ``c`` characters that
is ``B = 5c`` total bits: ``ceil(B/2)`` longitude bits and ``B // 2``
latitude bits — exactly

    ix = clamp(floor((lon + 180) / 360 * 2^nx), 0, 2^nx - 1)
    iy = clamp(floor((lat +  90) / 180 * 2^ny), 0, 2^ny - 1)
    g  = interleave_msb(ix, iy)          # lon bit first
    hash = base32(g), 5 bits per char

Everything is integer/bit arithmetic after the two floor()s, so the encode
is exact and engine-independent: the Spark side is one generated
whole-stage-codegen expression (shiftright/& on BIGINT — no Python, no
UDF), the DuckDB side the same formula in that dialect, and `geohash_np`
a vectorized numpy third opinion for unit tests. Precision ≤ 12 keeps
``g`` inside a signed 64-bit long (B = 60 bits).

This complements the engine's own cell grid (operators/cells_expr): cell
keys are the JOIN/shuffle currency (integer math end-to-end); geohash is
the INTERCHANGE encoding — prefix-truncatable, lexicographically
Z-ordered, what a web corpus carries in its metadata. Truncating the
string by k characters IS coarsening the cell by 5k bits, so a prefix
groupBy is a multi-resolution rollup with zero re-encoding.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_split(precision: int) -> tuple[int, int, int]:
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be in [1, 12], got {precision}")
    b = 5 * precision
    nx = (b + 1) // 2
    return b, nx, b - nx


def geohash_expr(lon: Column, lat: Column, precision: int = 7) -> Column:
    """Geohash string column — generated JVM bit arithmetic, no Python."""
    b, nx, ny = _bit_split(precision)
    ix = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nx))).cast("long"),
        F.lit((1 << nx) - 1),
    )
    ix = F.greatest(ix, F.lit(0))
    iy = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << ny))).cast("long"),
        F.lit((1 << ny) - 1),
    )
    iy = F.greatest(iy, F.lit(0))
    g = F.lit(0).cast("long")
    for i in range(nx):
        g = g + F.shiftright(ix, nx - 1 - i).bitwiseAND(F.lit(1)) * F.lit(1 << (b - 1 - 2 * i))
    for i in range(ny):
        g = g + F.shiftright(iy, ny - 1 - i).bitwiseAND(F.lit(1)) * F.lit(1 << (b - 2 - 2 * i))
    chars = [
        F.substring(
            F.lit(BASE32),
            F.shiftright(g, 5 * (precision - 1 - j)).bitwiseAND(F.lit(31)).cast("int")
            + F.lit(1),
            F.lit(1),
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def sql_geohash(lon_expr: str, lat_expr: str, precision: int = 7) -> str:
    """The identical formula in DuckDB SQL for the correctness oracle."""
    b, nx, ny = _bit_split(precision)
    ix = (
        f"greatest(least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * {1 << nx}) "
        f"AS BIGINT), {(1 << nx) - 1}), 0)"
    )
    iy = (
        f"greatest(least(CAST(floor((({lat_expr}) + 90.0) / 180.0 * {1 << ny}) "
        f"AS BIGINT), {(1 << ny) - 1}), 0)"
    )
    terms = [
        f"(((ix >> {nx - 1 - i}) & 1) * {1 << (b - 1 - 2 * i)})" for i in range(nx)
    ] + [f"(((iy >> {ny - 1 - i}) & 1) * {1 << (b - 2 - 2 * i)})" for i in range(ny)]
    g = " + ".join(terms)
    chars = " || ".join(
        f"substr('{BASE32}', CAST(((g >> {5 * (precision - 1 - j)}) & 31) AS INTEGER) + 1, 1)"
        for j in range(precision)
    )
    return (
        f"(SELECT {chars} FROM (SELECT {g} AS g FROM "
        f"(SELECT {ix} AS ix, {iy} AS iy)))"
    )


def geohash_np(lon: np.ndarray, lat: np.ndarray, precision: int = 7) -> np.ndarray:
    """Vectorized numpy third opinion for unit tests (same exact formula)."""
    b, nx, ny = _bit_split(precision)
    ix = np.clip(
        np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * (1 << nx)).astype(np.int64),
        0, (1 << nx) - 1,
    )
    iy = np.clip(
        np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * (1 << ny)).astype(np.int64),
        0, (1 << ny) - 1,
    )
    g = np.zeros_like(ix)
    for i in range(nx):
        g += ((ix >> (nx - 1 - i)) & 1) << (b - 1 - 2 * i)
    for i in range(ny):
        g += ((iy >> (ny - 1 - i)) & 1) << (b - 2 - 2 * i)
    lut = np.array(list(BASE32))
    out = np.empty(len(g), dtype=f"U{precision}")
    for k in range(len(g)):
        v = int(g[k])
        out[k] = "".join(
            lut[(v >> (5 * (precision - 1 - j))) & 31] for j in range(precision)
        )
    return out
