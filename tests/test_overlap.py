"""BBox overlap join contracts (operators/overlap.py): brute-force output
identity (incl. touch cases on cell boundaries), exactly-once emission
with no distinct in the plan, and the two-table variant. Cross-engine
value parity is the geo_bbox_overlaps twin."""

import random

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.overlap import bbox_overlap_join, bbox_overlap_pairs


def _brute(rects):
    out = {}
    for i, a in enumerate(rects):
        for b in rects[i + 1 :]:
            if a[1] <= b[3] and b[1] <= a[3] and a[2] <= b[4] and b[2] <= a[4]:
                iw = min(a[3], b[3]) - max(a[1], b[1])
                ih = min(a[4], b[4]) - max(a[2], b[2])
                out[(a[0], b[0])] = (iw, ih, iw * ih)
    return out


def _rand_rects(rng, n, span):
    rects = []
    for i in range(n):
        x0, y0 = rng.randrange(0, 4000), rng.randrange(0, 4000)
        rects.append((i, x0, y0, x0 + rng.randrange(0, span), y0 + rng.randrange(0, span)))
    return rects


def test_matches_brute_force_random(spark):
    rng = random.Random(7)
    rects = _rand_rects(rng, 250, 600)
    df = spark.createDataFrame(rects, "rect_id long, x0 long, y0 long, x1 long, y1 long")
    got = {
        (r.a_id, r.b_id): (r.inter_w, r.inter_h, r.inter_area)
        for r in bbox_overlap_pairs(df, grid=512).collect()
    }
    assert got == _brute(rects)


def test_touching_edges_and_grid_boundaries(spark):
    rects = [
        (0, 0, 0, 512, 512),      # ends exactly on a cell boundary
        (1, 512, 0, 900, 512),    # touches rect 0 along x=512 (inter_w 0)
        (2, 100, 100, 200, 200),  # inside rect 0
        (3, 2000, 2000, 2100, 2100),  # far away
    ]
    df = spark.createDataFrame(rects, "rect_id long, x0 long, y0 long, x1 long, y1 long")
    got = {
        (r.a_id, r.b_id): (r.inter_w, r.inter_h, r.inter_area)
        for r in bbox_overlap_pairs(df, grid=512).collect()
    }
    assert got == _brute(rects)
    assert got[(0, 1)] == (0, 512, 0)  # touch: zero-width, counts


def test_exactly_once_no_distinct(spark):
    # big rects spanning many cells: the pair appears in many candidate
    # cells but must be emitted once, and the plan has no dedup aggregate
    rects = [(0, 0, 0, 3000, 3000), (1, 100, 100, 2900, 2900)]
    df = spark.createDataFrame(rects, "rect_id long, x0 long, y0 long, x1 long, y1 long")
    out = bbox_overlap_pairs(df, grid=512)
    rows = out.collect()
    assert len(rows) == 1 and (rows[0].a_id, rows[0].b_id) == (0, 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "Distinct" not in plan


def test_two_table_join(spark):
    left = spark.createDataFrame(
        [(10, 0, 0, 100, 100)], "rect_id long, x0 long, y0 long, x1 long, y1 long"
    )
    right = spark.createDataFrame(
        [(20, 50, 50, 150, 150), (21, 500, 500, 600, 600)],
        "rect_id long, x0 long, y0 long, x1 long, y1 long",
    )
    rows = bbox_overlap_join(left, right, grid=64).collect()
    assert [(r.a_id, r.b_id, r.inter_area) for r in rows] == [(10, 20, 2500)]


def test_grid_validation(spark):
    with pytest.raises(ValueError):
        bbox_overlap_pairs(None, grid=0)
