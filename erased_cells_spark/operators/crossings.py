"""Segment-crossing join: find all pairs of line segments that properly
cross — the trajectory-intersection primitive (which user paths crossed,
road-network conflation, cadastral edge conflict detection).

Exactness: coordinates are INTEGERS and the crossing test is the classic
strict-sign orientation predicate in pure BIGINT arithmetic —

    cross(AB, AC) * cross(AB, AD) < 0  AND
    cross(CD, CA) * cross(CD, CB) < 0

— so proper crossings are detected with zero floating point anywhere
(same discipline as geom.ring_self_intersections). Touching endpoints,
collinear overlap, and T-contacts are EXCLUDED by the strict < (they
make one cross product 0). Overflow safety: with |coord| <= B each
cross product is <= 8*B^2 and the sign product <= 64*B^4, which stays
inside int64 for B <= 16384 (`_COORD_BOUND`, proof at its definition);
crossing is translation-invariant, so larger frames are handled by
translating/rescaling into the bound first.

Scale shape (the 100 TB plan): the naive join is O(n^2). Here each
segment is exploded onto the grid cells its bounding box overlaps
(cell size `grid`), candidates come from a cell equi-join, and each
surviving pair is emitted EXACTLY ONCE with no distinct-shuffle: a
candidate pair is kept only in the lexicographically-first cell of the
two bounding boxes' cell-range intersection, which is computable from
the pair's own columns —

    first_cx = max(min_cx_a, min_cx_b), first_cy = max(min_cy_a, min_cy_b)

(cell ranges are axis-aligned integer intervals, so their intersection
is an interval whose minimum is the max of the minima; both segments
appear in that cell by construction, and a pair of overlapping bboxes
shares it uniquely). This is the radius-join dedup argument
(operators/radius.py) transplanted to 2-D bbox ranges. Cost: one
explode (bounded by bbox_span/grid per axis), one shuffle on (cx, cy),
and a residual integer predicate — no NLJ, no distinct.

Skew: a degenerate cell (everything in one place) degrades to the
quadratic truth; pick `grid` near the typical segment span so the
explode factor stays ~4 and cells stay balanced. The per-cell join is
AQE-skew-splittable since candidates carry only ids + 8 ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Strict-sign predicate multiplies two cross products. With per-axis
# coordinate magnitude <= B, a cross product's magnitude is < 8*B^2 and
# the product of two is < 64*B^4. 64*B^4 < 2^63 requires B <= 2^14.25;
# B = 16384 = 2^14 gives 64*2^56 = 2^62 < 2^63. Callers needing larger
# frames rescale/translate first (crossing is translation-invariant).
_COORD_BOUND = 16384


def _cross(ox, oy, ax, ay, bx, by):
    """BIGINT cross product (a-o) x (b-o)."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def proper_crossing_cond(a, b):
    """Strict proper-crossing condition between segment a=(ax,ay,bx,by)
    and b=(cx,cy,dx,dy) column prefixes: both orientation products
    strictly negative. Touches/collinear overlaps excluded by design."""
    c1 = _cross(F.col(f"{a}_ax"), F.col(f"{a}_ay"), F.col(f"{a}_bx"), F.col(f"{a}_by"),
                F.col(f"{b}_ax"), F.col(f"{b}_ay"))
    c2 = _cross(F.col(f"{a}_ax"), F.col(f"{a}_ay"), F.col(f"{a}_bx"), F.col(f"{a}_by"),
                F.col(f"{b}_bx"), F.col(f"{b}_by"))
    c3 = _cross(F.col(f"{b}_ax"), F.col(f"{b}_ay"), F.col(f"{b}_bx"), F.col(f"{b}_by"),
                F.col(f"{a}_ax"), F.col(f"{a}_ay"))
    c4 = _cross(F.col(f"{b}_ax"), F.col(f"{b}_ay"), F.col(f"{b}_bx"), F.col(f"{b}_by"),
                F.col(f"{a}_bx"), F.col(f"{a}_by"))
    return (c1 * c2 < 0) & (c3 * c4 < 0)


def _with_cells(segs: DataFrame, prefix: str, grid: int) -> DataFrame:
    """Explode a segment table onto the grid cells its bbox overlaps,
    carrying the bbox's minimum cell per axis for the exactly-once rule.
    Floor division via F.floor(x / grid) is exact for these magnitudes
    (|coord| <= 2^14, grid a positive int: the double quotient is exact
    or rounds within the same integer interval since |x| < 2^40)."""
    p = prefix
    s = segs.select(
        F.col("seg_id").alias(f"{p}_id"),
        F.col("ax").alias(f"{p}_ax"), F.col("ay").alias(f"{p}_ay"),
        F.col("bx").alias(f"{p}_bx"), F.col("by").alias(f"{p}_by"),
    )
    lo = lambda u, v: F.floor(F.least(u, v) / grid).cast("long")  # noqa: E731
    hi = lambda u, v: F.floor(F.greatest(u, v) / grid).cast("long")  # noqa: E731
    s = s.withColumn(f"{p}_cx0", lo(F.col(f"{p}_ax"), F.col(f"{p}_bx")))
    s = s.withColumn(f"{p}_cx1", hi(F.col(f"{p}_ax"), F.col(f"{p}_bx")))
    s = s.withColumn(f"{p}_cy0", lo(F.col(f"{p}_ay"), F.col(f"{p}_by")))
    s = s.withColumn(f"{p}_cy1", hi(F.col(f"{p}_ay"), F.col(f"{p}_by")))
    return s.withColumn(
        "cx", F.explode(F.sequence(F.col(f"{p}_cx0"), F.col(f"{p}_cx1")))
    ).withColumn(
        "cy", F.explode(F.sequence(F.col(f"{p}_cy0"), F.col(f"{p}_cy1")))
    )


def segment_crossing_pairs(segs: DataFrame, grid: int = 1024) -> DataFrame:
    """Self-join: all unordered pairs (a_id < b_id) of properly-crossing
    segments. Input schema: (seg_id, ax, ay, bx, by) integer columns with
    |coords| <= 16384 (see _COORD_BOUND). Output: (a_id, b_id).

    Plan: bbox-cell explode -> (cx, cy) equi-join with a_id < b_id ->
    exactly-once first-shared-cell filter -> strict integer predicate.
    Each qualifying pair is produced exactly once (proof in module
    docstring), so there is no distinct and no second shuffle.
    """
    if grid <= 0:
        raise ValueError("grid must be positive")
    a = _with_cells(segs, "a", grid)
    b = _with_cells(segs, "b", grid)
    cand = a.join(b, ["cx", "cy"]).filter(F.col("a_id") < F.col("b_id"))
    first_cell = (
        (F.col("cx") == F.greatest(F.col("a_cx0"), F.col("b_cx0")))
        & (F.col("cy") == F.greatest(F.col("a_cy0"), F.col("b_cy0")))
    )
    return (
        cand.filter(first_cell)
        .filter(proper_crossing_cond("a", "b"))
        .select("a_id", "b_id")
    )


def segment_crossing_join(left: DataFrame, right: DataFrame, grid: int = 1024) -> DataFrame:
    """Two-table variant: pairs (left.seg_id, right.seg_id) that properly
    cross. Same exactly-once plan; no id ordering constraint."""
    if grid <= 0:
        raise ValueError("grid must be positive")
    a = _with_cells(left, "a", grid)
    b = _with_cells(right, "b", grid)
    cand = a.join(b, ["cx", "cy"])
    first_cell = (
        (F.col("cx") == F.greatest(F.col("a_cx0"), F.col("b_cx0")))
        & (F.col("cy") == F.greatest(F.col("a_cy0"), F.col("b_cy0")))
    )
    return (
        cand.filter(first_cell)
        .filter(proper_crossing_cond("a", "b"))
        .select("a_id", "b_id")
    )
