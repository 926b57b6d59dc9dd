"""Rectangle (bbox) overlap join: all pairs of axis-aligned rectangles
that intersect — the 2-D interval join underneath map-tile conflict
detection, viewport queries, bbox pre-filters for expensive geometry,
and ad-placement collision checks.

Exactness: coordinates are INTEGERS and the closed-interval overlap
test is pure comparisons —

    a.x0 <= b.x1 AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1

— touching edges/corners COUNT as overlap (intersection width or height
0, area 0); callers wanting strict interiors filter inter_area > 0. The
intersection extents (inter_w, inter_h, inter_area) are exact int64.

Scale shape (the 100 TB plan): the naive join is O(n^2). Each rect is
exploded onto the grid cells it overlaps, candidates come from a
(cx, cy) equi-join, and each surviving pair is emitted EXACTLY ONCE
with no distinct-shuffle: a pair is kept only in the lexicographically
first cell of the two cell-ranges' intersection —

    cx == max(a_cx0, b_cx0) AND cy == max(a_cy0, b_cy0)

— which exists precisely when the cell ranges overlap, and they always
do for intersecting rects (the same exactly-once argument as
operators/crossings.py, which transplanted it from the radius join; the
bbox case is the ORIGINAL form, since rects ARE their bounding boxes).
Cost: one bounded explode (~(span/grid + 1)^2 cells per rect), one
shuffle on (cx, cy), a comparison-only residual. Skew: a degenerate
cell degrades toward the quadratic truth — pick `grid` near the typical
rect span (explode factor ~4) and let AQE split hot cells; candidates
carry only ids + 8 ints."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_cells(rects: DataFrame, prefix: str, grid: int) -> DataFrame:
    """Explode a rect table (rect_id, x0, y0, x1, y1; x0<=x1, y0<=y1)
    onto the grid cells it overlaps, keeping the minimum cell per axis
    for the exactly-once rule."""
    p = prefix
    s = rects.select(
        F.col("rect_id").alias(f"{p}_id"),
        *[F.col(c).alias(f"{p}_{c}") for c in ("x0", "y0", "x1", "y1")],
    )
    for axis in ("x", "y"):
        s = s.withColumn(
            f"{p}_c{axis}0", F.floor(F.col(f"{p}_{axis}0") / grid).cast("long")
        ).withColumn(
            f"{p}_c{axis}1", F.floor(F.col(f"{p}_{axis}1") / grid).cast("long")
        )
    return s.withColumn(
        "cx", F.explode(F.sequence(F.col(f"{p}_cx0"), F.col(f"{p}_cx1")))
    ).withColumn(
        "cy", F.explode(F.sequence(F.col(f"{p}_cy0"), F.col(f"{p}_cy1")))
    )


def _overlap_cond():
    return (
        (F.col("a_x0") <= F.col("b_x1"))
        & (F.col("b_x0") <= F.col("a_x1"))
        & (F.col("a_y0") <= F.col("b_y1"))
        & (F.col("b_y0") <= F.col("a_y1"))
    )


def _emit(cand: DataFrame) -> DataFrame:
    first_cell = (
        (F.col("cx") == F.greatest(F.col("a_cx0"), F.col("b_cx0")))
        & (F.col("cy") == F.greatest(F.col("a_cy0"), F.col("b_cy0")))
    )
    iw = F.least(F.col("a_x1"), F.col("b_x1")) - F.greatest(F.col("a_x0"), F.col("b_x0"))
    ih = F.least(F.col("a_y1"), F.col("b_y1")) - F.greatest(F.col("a_y0"), F.col("b_y0"))
    return (
        cand.filter(first_cell)
        .filter(_overlap_cond())
        .select(
            "a_id",
            "b_id",
            iw.alias("inter_w"),
            ih.alias("inter_h"),
            (iw * ih).alias("inter_area"),
        )
    )


def bbox_overlap_pairs(rects: DataFrame, grid: int = 1024) -> DataFrame:
    """Self-join: all unordered pairs (a_id < b_id) of intersecting
    rectangles with exact intersection extents. Input schema:
    (rect_id, x0, y0, x1, y1) integers, x0<=x1 and y0<=y1."""
    if grid <= 0:
        raise ValueError("grid must be positive")
    a = _with_cells(rects, "a", grid)
    b = _with_cells(rects, "b", grid)
    cand = a.join(b, ["cx", "cy"]).filter(F.col("a_id") < F.col("b_id"))
    return _emit(cand)


def bbox_overlap_join(left: DataFrame, right: DataFrame, grid: int = 1024) -> DataFrame:
    """Two-table variant: every (left.rect_id, right.rect_id) pair whose
    rectangles intersect. Same exactly-once plan, no id ordering."""
    if grid <= 0:
        raise ValueError("grid must be positive")
    a = _with_cells(left, "a", grid)
    b = _with_cells(right, "b", grid)
    return _emit(a.join(b, ["cx", "cy"]))
