"""Adaptive quadtree spatial binning — variable-resolution cells sized so
no bin exceeds a point-count cap (until max_res stops subdivision).

WHY (the 100 TB skew story): fixed-resolution grids are exactly what makes
cell-skew at web scale — a res that balances Tokyo leaves the Pacific as
billions of empty cells, a res that keeps the cell count sane puts 10^9
docs in one Tokyo cell and that cell becomes the straggler partition of
every spatial shuffle. The quadtree picks the resolution PER REGION: dense
areas subdivide until they fit under `cap`, sparse areas stay coarse. The
leaf table is the data-driven partitioning a planner feeds to
`repartitionByRange` / bucketed writers — the adaptive complement to
plans/skew.py's salting (salting splits one hot key after the fact; the
quadtree prevents hot keys by construction).

DEFINITION. For grid cells at resolutions base_res..max_res (the
equirectangular ix/iy grid of operators/cells_expr — lon wraps, lat
clamps), with c(cell) = number of input points inside the cell:

    leaf(cell at res r)  ⇔  (r == base_res  OR  c(parent(cell)) > cap)
                        AND (c(cell) <= cap  OR  r == max_res)

EXACTLY-ONCE COVER PROOF. Fix a max_res cell P and its ancestor path
c_base >= c_{base+1} >= ... >= c_max (counts are nested, so they are
non-increasing in r; in particular "every ancestor overfull" reduces to
"the immediate parent is overfull"). Let r* = min{r : c_r <= cap}
(infinity if none). If r* == base the rule fires at base only (for any
r > base the parent is at res >= r* so c_parent <= cap fails the first
conjunct). If base < r* <= max it fires exactly at r* (below r*: own
count > cap and r < max fails the second conjunct; above r*: parent <=
cap fails the first). If r* is infinite it fires exactly at max_res.
Every occupied point path therefore crosses EXACTLY ONE leaf — the leaves
tile the occupied space with no gaps and no overlaps.

HIERARCHY CONSISTENCY (why rollups equal direct binning): multiplying by
2^r is exact in binary floating point, so fl((v)*2^r) and fl(v*2^max)
differ only in exponent and floor(x*2^r) == floor(x*2^max) >> (max-r)
bit-exactly; wrap (pmod at 2^max then shift) and the lat clamp commute
with the shift the same way — this is the same argument behind
cells_expr.parent_key_expr.

SCALE SHAPE: ONE corpus-wide shuffle (groupBy the max_res cell, map-side
combined), then per-level rollups over the COUNTS table (bounded by
min(n_points, 4^max_res) rows — metadata scale) and one self-join of that
table to its parent level. Assignment joins the fact table to the leaves
on the exploded ancestor path (bounded explode: max_res-base_res+1 rows
per point), broadcast when the leaf table is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from erased_cells_spark.operators.cells_expr import ix_expr, iy_expr


def quadtree_leaves(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    base_res: int = 3,
    max_res: int = 8,
    cap: int = 256,
) -> DataFrame:
    """(res, ix, iy, n_docs) for every quadtree LEAF cell (see module
    docstring for the leaf rule and the exactly-once cover proof)."""
    if not 0 <= base_res <= max_res:
        raise ValueError(f"need 0 <= base_res <= max_res, got {base_res}..{max_res}")
    if cap < 1:
        raise ValueError("cap must be >= 1")

    base = (
        points.groupBy(
            ix_expr(F.col(lon_col), max_res).alias("ix"),
            iy_expr(F.col(lat_col), max_res).alias("iy"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # per-level counts: roll the (small) max_res count table up, never the
    # raw points — one corpus shuffle total.
    levels = None
    for r in range(base_res, max_res + 1):
        shift = max_res - r
        lv = (
            base.groupBy(
                F.lit(r).alias("res"),
                F.shiftright("ix", shift).alias("ix"),
                F.shiftright("iy", shift).alias("iy"),
            )
            .agg(F.sum("n").alias("n"))
        )
        levels = lv if levels is None else levels.unionByName(lv)

    child = levels.alias("c")
    parent = levels.select(
        (F.col("res") + 1).alias("p_res"),
        F.col("ix").alias("p_ix"),
        F.col("iy").alias("p_iy"),
        F.col("n").alias("p_n"),
    ).alias("p")
    joined = child.join(
        parent,
        (F.col("c.res") == F.col("p.p_res"))
        & (F.shiftright(F.col("c.ix"), 1) == F.col("p.p_ix"))
        & (F.shiftright(F.col("c.iy"), 1) == F.col("p.p_iy")),
        "left",
    )
    return (
        joined.filter(
            ((F.col("c.res") == base_res) | (F.col("p.p_n") > cap))
            & ((F.col("c.n") <= cap) | (F.col("c.res") == max_res))
        )
        .select(
            F.col("c.res").alias("res"),
            F.col("c.ix").alias("ix"),
            F.col("c.iy").alias("iy"),
            F.col("c.n").alias("n_docs"),
        )
    )


def quadtree_assign(
    points: DataFrame,
    leaves: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    base_res: int = 3,
    max_res: int = 8,
) -> DataFrame:
    """Input rows + (res, ix, iy) of the ONE leaf that owns each point.

    Plan: the point side explodes its ancestor path (max_res-base_res+1
    structs — bounded, column-math only) and equi-joins the leaf table;
    by the cover proof each point matches exactly once, so no dedup
    aggregate is needed. Broadcast the leaf side when it is small (the
    common case — leaf count <= n_points/cap * 4 + 4^base_res)."""
    path = F.array(
        *[
            F.struct(
                F.lit(r).alias("res"),
                ix_expr(F.col(lon_col), r).alias("ix"),
                iy_expr(F.col(lat_col), r).alias("iy"),
            )
            for r in range(base_res, max_res + 1)
        ]
    )
    exploded = points.withColumn("__qt", F.explode(path)).select(
        "*", F.col("__qt.res").alias("res"), F.col("__qt.ix").alias("ix"),
        F.col("__qt.iy").alias("iy"),
    ).drop("__qt")
    return exploded.join(F.broadcast(leaves.select("res", "ix", "iy")), ["res", "ix", "iy"])


def sql_quadtree_leaves(
    pts_sql: str,
    lon_expr: str = "lon",
    lat_expr: str = "lat",
    base_res: int = 3,
    max_res: int = 8,
    cap: int = 256,
) -> str:
    """DuckDB oracle twin of quadtree_leaves: identical floor/wrap/clamp
    binning (cells_expr.sql_ix/sql_iy at max_res), identical rollup
    shifts, identical leaf rule — exact integers end to end."""
    from erased_cells_spark.operators.cells_expr import sql_ix, sql_iy

    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS res, ix >> {max_res - r} AS ix, iy >> {max_res - r} AS iy, "
        f"sum(n)::BIGINT AS n FROM base GROUP BY 1, 2, 3"
        for r in range(base_res, max_res + 1)
    )
    return f"""
WITH pts AS ({pts_sql}),
base AS (
  SELECT {sql_ix(lon_expr, max_res)} AS ix, {sql_iy(lat_expr, max_res)} AS iy,
         count(*) AS n
  FROM pts GROUP BY 1, 2
),
lv AS ({unions})
SELECT c.res, c.ix, c.iy, c.n AS n_docs
FROM lv c LEFT JOIN lv p
  ON p.res = c.res - 1 AND p.ix = c.ix >> 1 AND p.iy = c.iy >> 1
WHERE (c.res = {base_res} OR p.n > {cap})
  AND (c.n <= {cap} OR c.res = {max_res})
"""
