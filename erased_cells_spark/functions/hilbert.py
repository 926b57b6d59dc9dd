"""Hilbert curve index — the third clustering curve next to row-major and
Morton (sources/layout.py).

Morton interleaving is cheap but takes long diagonal jumps at quadrant
seams (key distance 1 can be grid distance O(2^res)); the Hilbert curve
is the space-filling curve with UNIT grid steps everywhere (consecutive
keys are always 4-neighbors — asserted for every cell at several
resolutions in tests), which is why Hilbert-clustered row groups have
tighter bounding boxes and box queries touch fewer of them. The classic
tradeoff: Hilbert costs a per-level state machine instead of Morton's
single bit-interleave.

ENGINE-PORTABLE FORMULATION. The textbook xy2d loop is rewritten with
PURE COMPARISONS AND ARITHMETIC — no bitwise ops, no XOR — so the exact
same recurrence runs as generated Spark expressions and as a DuckDB
recursive CTE:

    at each level (side s, halving from 2^(res-1)), with 0 <= x,y < 2s:
      rx = (x >= s), ry = (y >= s)
      quadrant q = 0 if !rx,!ry | 1 if !rx,ry | 2 if rx,ry | 3 if rx,!ry
      d += s*s*q
      lowx = x - rx*s, lowy = y - ry*s          (drop the top bit)
      if !ry:  reflect if rx (low -> s-1-low), then SWAP x/y
      recurse into (s/2)

The invariant x,y < 2s replaces every bit mask with a subtraction, and
the quadrant CASE replaces (3*rx)^ry. Correctness is pinned by the two
defining properties (bijectivity onto [0, 4^res) and unit-step
adjacency), not by matching any particular reference implementation.

Scale shape: two Spark forms of the same ints — a nested-CASE codegen
expression for res <= 6 (the unshared tree grows ~6x per level), and an
Arrow-vectorized pandas UDF (hilbert_np per batch) for deep resolutions
like the res-12 layout writer, where the write is IO-bound anyway and
reads prune on plain footer stats."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def hilbert_py(res: int, x: int, y: int) -> int:
    """Reference implementation of the recurrence above (exact mirror of
    the Spark/SQL forms)."""
    d = 0
    s = 1 << (res - 1)
    while s > 0:
        rx = 1 if x >= s else 0
        ry = 1 if y >= s else 0
        q = (2 if rx else 1) if ry else (3 if rx else 0)
        d += s * s * q
        x -= rx * s
        y -= ry * s
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_np(res: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized reference (driver-side covers in layout.py)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (res - 1)
    while s > 0:
        rx = (x >= s).astype(np.int64)
        ry = (y >= s).astype(np.int64)
        q = np.where(ry == 1, np.where(rx == 1, 2, 1), np.where(rx == 1, 3, 0))
        d += s * s * q
        x -= rx * s
        y -= ry * s
        swap = ry == 0
        refl = swap & (rx == 1)
        x = np.where(refl, s - 1 - x, x)
        y = np.where(refl, s - 1 - y, y)
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s //= 2
    return d


def hilbert_index_expr(ix: Column, iy: Column, res: int) -> Column:
    """The same recurrence as nested JVM expressions over integer grid
    coordinates 0 <= ix, iy < 2^res. Pure comparisons/arithmetic —
    whole-stage-codegen resident, no UDF. The unshared CASE tree grows
    ~6x per level (x and y re-enter the next level several times and
    Catalyst's CollapseProject would re-inline any intermediate
    columns), so this form is capped at res 6 (~50k nodes); deeper
    resolutions — e.g. the res-12 layout writer — use
    hilbert_index_udf, the Arrow-vectorized twin of the same ints."""
    if not 1 <= res <= 6:
        raise ValueError(
            "res must be in [1, 6] for the expression form "
            "(tree grows ~6^res; use hilbert_index_udf beyond)"
        )
    x = ix.cast("long")
    y = iy.cast("long")
    d: Column = F.lit(0).cast("long")
    s = 1 << (res - 1)
    while s > 0:
        rx = F.when(x >= s, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y >= s, F.lit(1)).otherwise(F.lit(0))
        q = F.when(y >= s, F.when(x >= s, F.lit(2)).otherwise(F.lit(1))).otherwise(
            F.when(x >= s, F.lit(3)).otherwise(F.lit(0))
        )
        d = d + F.lit(s * s).cast("long") * q
        lowx = x - rx * s
        lowy = y - ry * s
        refl_x = F.when((y < s) & (x >= s), F.lit(s - 1) - lowx).otherwise(lowx)
        refl_y = F.when((y < s) & (x >= s), F.lit(s - 1) - lowy).otherwise(lowy)
        x, y = (
            F.when(y < s, refl_y).otherwise(lowx),
            F.when(y < s, refl_x).otherwise(lowy),
        )
        s //= 2
    return d


def sql_hilbert_cte(cells_cte: str, res: int, key_col: str = "cell") -> str:
    """DuckDB recursive-CTE twin of hilbert_index_expr over a CTE exposing
    (key_col, ix, iy): emits a CTE `hkeys(key, hd)` mapping each input row
    to its Hilbert index. The recursion carries (lvl, x, y, d) and applies
    the identical comparison-only step per level."""
    n_levels = res
    return f"""
hstep(lvl, key, x, y, d) AS (
  SELECT {n_levels}, {key_col}, ix, iy, 0::BIGINT FROM {cells_cte}
  UNION ALL
  SELECT lvl - 1, key,
         CASE WHEN y < (1::BIGINT << (lvl-1))
              THEN CASE WHEN x >= (1::BIGINT << (lvl-1))
                        THEN (1::BIGINT << (lvl-1)) - 1 - (y - CASE WHEN y >= (1::BIGINT << (lvl-1)) THEN (1::BIGINT << (lvl-1)) ELSE 0 END)
                        ELSE y END
              ELSE x - CASE WHEN x >= (1::BIGINT << (lvl-1)) THEN (1::BIGINT << (lvl-1)) ELSE 0 END END,
         CASE WHEN y < (1::BIGINT << (lvl-1))
              THEN CASE WHEN x >= (1::BIGINT << (lvl-1))
                        THEN (1::BIGINT << (lvl-1)) - 1 - (x - (1::BIGINT << (lvl-1)))
                        ELSE x END
              ELSE y - (1::BIGINT << (lvl-1)) END,
         d + (1::BIGINT << (lvl-1)) * (1::BIGINT << (lvl-1))
           * (CASE WHEN y >= (1::BIGINT << (lvl-1))
                   THEN CASE WHEN x >= (1::BIGINT << (lvl-1)) THEN 2 ELSE 1 END
                   ELSE CASE WHEN x >= (1::BIGINT << (lvl-1)) THEN 3 ELSE 0 END END)
  FROM hstep WHERE lvl > 0
),
hkeys AS (SELECT key, d AS hd FROM hstep WHERE lvl = 0)"""


def hilbert_index_udf(ix: Column, iy: Column, res: int) -> Column:
    """Arrow-vectorized Hilbert index for resolutions past the
    expression form's cap — numpy hilbert_np per batch, exact same
    int64s (asserted equal to hilbert_py/the expr form in tests). Used
    by the layout writer (one extra Arrow pass in a WRITE path that is
    already IO-bound; reads still prune on plain footer stats)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _h(x, y):
        return pd.Series(
            hilbert_np(res, x.to_numpy(np.int64), y.to_numpy(np.int64))
        )

    # real annotation objects: the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf rejects
    _h.__annotations__ = {"x": pd.Series, "y": pd.Series, "return": pd.Series}
    return pandas_udf(_h, "long")(ix, iy)
