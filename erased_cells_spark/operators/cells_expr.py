"""Cell assignment as pure JVM Column expressions (no Python in the path).

The shuffle/join key for a point at resolution r is the row-major grid key
``iy * 2^r + ix`` over the equirectangular grid — identical binning math to
spatial.cellid's Morton ids (same floor/clip/wrap), but expressible entirely
with Spark builtins AND in ANSI/DuckDB SQL for the oracle. Morton packing is
only needed where hierarchy walks happen (driver-side covers, ring ops).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def ix_expr(lon: Column, res: int) -> Column:
    n = 1 << res
    return F.pmod(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))).cast("long"), F.lit(n))


def iy_expr(lat: Column, res: int) -> Column:
    n = 1 << res
    raw = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))


def cell_key_expr(lon: Column, lat: Column, res: int) -> Column:
    """Grid key at res: iy * 2^res + ix (lon wraps, lat clamps)."""
    n = 1 << res
    return (iy_expr(lat, res) * F.lit(n) + ix_expr(lon, res)).alias(f"cell_r{res}")


def _spread_expr(v: Column) -> Column:
    """JVM twin of spatial.cellid._spread: move bit i of the low 32 bits to
    bit 2i — five shift/or/mask steps, pure Column arithmetic inside
    whole-stage codegen."""
    v = v.bitwiseAND(F.lit(0xFFFFFFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x3333333333333333))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x5555555555555555))
    return v


def morton_key_expr(lon: Column, lat: Column, res: int) -> Column:
    """Morton (Z-order) cell id at `res`, BIT-IDENTICAL to
    spatial.cellid.encode_cell (code = interleave(ix, iy), id = code<<5 |
    res) but built from Spark builtins so the layout writer clusters on it
    JVM-side. Unlike the row-major key — whose sorted order walks full
    grid ROWS, so a range partition is a long thin lon band — consecutive
    Morton ids stay spatially adjacent in BOTH axes, so range-partitioned
    row groups cover compact squares and a box query prunes in lon AND
    lat. Driver-side covers (cellid.cover_bbox) emit these exact ids."""
    code = _spread_expr(ix_expr(lon, res)).bitwiseOR(
        F.shiftleft(_spread_expr(iy_expr(lat, res)), 1)
    )
    return F.shiftleft(code, 5).bitwiseOR(F.lit(res)).alias(f"zcell_r{res}")


def parent_key_expr(cell_key: Column, res: int, parent_res: int) -> Column:
    """Hierarchy walk on grid keys: ix,iy each shift right — plain arithmetic."""
    n, pn = 1 << res, 1 << parent_res
    shift = res - parent_res
    iy = F.shiftright(cell_key.cast("long"), res)  # cell // n
    ix = cell_key.cast("long") - iy * F.lit(n)
    return (F.shiftright(iy, shift) * F.lit(pn) + F.shiftright(ix, shift))


# ---- SQL twins (DuckDB oracle) ---------------------------------------------
def sql_ix(lon_expr: str, res: int) -> str:
    n = 1 << res
    return f"(((floor(({lon_expr} + 180.0) / 360.0 * {float(n)})::BIGINT % {n}) + {n}) % {n})"


def sql_iy(lat_expr: str, res: int) -> str:
    n = 1 << res
    return f"least(greatest(floor(({lat_expr} + 90.0) / 180.0 * {float(n)})::BIGINT, 0), {n - 1})"


def sql_cell_key(lon_expr: str, lat_expr: str, res: int) -> str:
    n = 1 << res
    return f"({sql_iy(lat_expr, res)} * {n} + {sql_ix(lon_expr, res)})"


# ---- numpy twin (brute-force oracles) ----------------------------------------
def cell_key_np(lon, lat, res: int) -> np.ndarray:
    n = np.int64(1) << np.int64(res)
    ix = np.mod(np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * np.float64(n)).astype(np.int64), n)
    iy = np.clip(np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * np.float64(n)).astype(np.int64), 0, n - 1)
    return iy * n + ix
