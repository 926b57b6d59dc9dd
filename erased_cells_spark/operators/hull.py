"""Distributed convex hull — the boundary-of-everything primitive
(coverage footprints, service-area outlines, outlier fences for
geo-scatter, input to rotating-calipers diameter/width).

Exactness: integer coordinates and the classic strict-turn monotone
chain (Andrew's algorithm) with int64 cross products — no floats, no
epsilon. STRICT turns (pop on cross <= 0) mean collinear mid-edge
points are NOT vertices: the result is the minimal vertex set, and
"vertex" has a clean engine-independent characterization the DuckDB
oracle checks from first principles (p is a hull vertex iff p does not
lie in the convex hull of the other points — Caratheodory: in no
triangle, on no segment, of other points). Input must be duplicate-free
in (x, y); dedupe with a min-id groupBy first (the twin does).

Overflow: cross products are differences of coordinate products; with
|coord| <= B they stay within 4*B^2 — safe in int64 for B <= 2^30
(far beyond the repo's 16384-bounded frames).

Scale shape (100 TB): the hull is a CONTRACTIVE aggregation —
  phase 1: each partition reduces to its LOCAL hull (mapInPandas,
           numpy chain per Arrow batch; any point interior to a batch
           hull is interior to the global hull, so dropping it is safe
           regardless of how rows are batched or partitioned);
  phase 2: the surviving candidates (O(partitions * per-batch hull
           size); real-world hulls are tiny — O(log n) expected
           vertices for uniform-ish clouds) coalesce to ONE partition
           for the final chain, which also emits the canonical order.
No driver collect, no shuffle beyond the single-partition coalesce of
an already-reduced candidate set. Output: (hull_pos, id, x, y) in
counter-clockwise order starting at the lexicographically smallest
vertex — a deterministic canonical form."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hull_py(points: list[tuple]) -> list[tuple]:
    """Monotone chain on (x, y, *payload) tuples, strict turns. Returns
    the hull counter-clockwise from the lexicographically smallest
    vertex. Duplicate-free input required. Pure python/ints — shared by
    both distributed phases and usable as a test reference."""
    pts = sorted(points)
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[tuple] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple] = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    # lower runs min->max along the bottom, upper max->min along the top;
    # dropping each chain's last point avoids repeating the endpoints.
    # sorted() started at the lexicographic min, so this IS canonical CCW.
    return lower[:-1] + upper[:-1]


def hull_area2(hull: list[tuple]) -> int:
    """Twice the hull area (shoelace over the CCW ring) — exact int."""
    n = len(hull)
    if n < 3:
        return 0
    s = 0
    for i in range(n):
        x0, y0 = hull[i][0], hull[i][1]
        x1, y1 = hull[(i + 1) % n][0], hull[(i + 1) % n][1]
        s += x0 * y1 - x1 * y0
    return s


def convex_hull(pts: DataFrame, id_col: str = "pid", x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Distributed hull of a duplicate-free integer point table.
    Returns (hull_pos, <id_col>, <x_col>, <y_col>) — CCW from the
    lexicographically smallest vertex, hull_pos 0-based."""
    src = pts.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.col(id_col).alias("pid"),
    )
    schema_mid = "x long, y long, pid long"

    def local_hull(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            tuples = list(zip(pdf["x"].tolist(), pdf["y"].tolist(), pdf["pid"].tolist()))
            h = hull_py(tuples)
            yield pd.DataFrame(h, columns=["x", "y", "pid"])

    candidates = src.mapInPandas(local_hull, schema_mid).coalesce(1)

    schema_out = "hull_pos long, pid long, x long, y long"

    def final_hull(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        allpts: list[tuple] = []
        for pdf in batches:
            allpts.extend(zip(pdf["x"].tolist(), pdf["y"].tolist(), pdf["pid"].tolist()))
        if not allpts:
            return
        h = hull_py(allpts)
        yield pd.DataFrame(
            [(i, p[2], p[0], p[1]) for i, p in enumerate(h)],
            columns=["hull_pos", "pid", "x", "y"],
        )

    out = candidates.mapInPandas(final_hull, schema_out)
    return out.select(
        "hull_pos",
        F.col("pid").alias(id_col),
        F.col("x").alias(x_col),
        F.col("y").alias(y_col),
    )
