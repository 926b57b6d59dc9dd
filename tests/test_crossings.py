"""Segment-crossing join (operators/crossings.py): exactness vs a numpy
brute force, grid invariance, touch/collinear exclusion, two-table
variant, and the exactly-once guarantee (no duplicate pairs even when a
pair shares many cells)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.crossings import (
    segment_crossing_join,
    segment_crossing_pairs,
)


def brute_pairs(segs):
    """O(n^2) python-int reference: strict proper crossing."""
    out = set()
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            (ia, ax, ay, bx, by) = segs[i]
            (ib, cx, cy, dx, dy) = segs[j]
            c1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            c2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
            c3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
            c4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
            if c1 * c2 < 0 and c3 * c4 < 0:
                out.add((min(ia, ib), max(ia, ib)))
    return sorted(out)


def make_segs(n, rng, box=4000, span=300):
    segs = []
    for i in range(n):
        ax, ay = int(rng.integers(0, box)), int(rng.integers(0, box))
        bx = ax + int(rng.integers(-span, span + 1))
        by = ay + int(rng.integers(-span, span + 1))
        segs.append((i, ax, ay, bx, by))
    return segs


SCHEMA = "seg_id LONG, ax LONG, ay LONG, bx LONG, by LONG"


@pytest.mark.parametrize("grid", [64, 512, 4096])
def test_matches_brute_force_across_grids(spark, grid):
    rng = np.random.default_rng(7)
    segs = make_segs(300, rng)
    expect = brute_pairs(segs)
    assert len(expect) > 5  # non-vacuous fixture
    df = spark.createDataFrame(segs, SCHEMA)
    got = sorted(
        (r["a_id"], r["b_id"]) for r in segment_crossing_pairs(df, grid=grid).collect()
    )
    assert got == expect


def test_exactly_once_no_duplicates(spark):
    # Long segments crossing a fine grid share MANY cells: pairs must
    # still be emitted once (first-shared-cell rule, not distinct).
    segs = [
        (0, 0, 0, 4000, 4000),
        (1, 0, 4000, 4000, 0),
        (2, 0, 2000, 4000, 2100),
    ]
    df = spark.createDataFrame(segs, SCHEMA)
    rows = [(r["a_id"], r["b_id"]) for r in segment_crossing_pairs(df, grid=64).collect()]
    assert sorted(rows) == [(0, 1), (0, 2), (1, 2)]
    assert len(rows) == len(set(rows))


def test_touch_and_collinear_excluded(spark):
    segs = [
        (0, 0, 0, 100, 0),     # base
        (1, 50, 0, 50, 100),   # T-touch at (50,0): one cross product is 0
        (2, 100, 0, 200, 0),   # shared endpoint, collinear continuation
        (3, 20, 0, 80, 0),     # collinear overlap
        (4, 10, -50, 30, 60),  # proper crossing with base only
    ]
    df = spark.createDataFrame(segs, SCHEMA)
    got = sorted(
        (r["a_id"], r["b_id"]) for r in segment_crossing_pairs(df, grid=32).collect()
    )
    assert got == [(0, 4)]


def test_two_table_join(spark):
    rng = np.random.default_rng(11)
    left = make_segs(120, rng)
    right = [(i, *s[1:]) for i, s in enumerate(make_segs(140, rng))]
    # brute: cross products between the two sets
    expect = set()
    for (ia, ax, ay, bx, by) in left:
        for (ib, cx, cy, dx, dy) in right:
            c1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            c2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
            c3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
            c4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
            if c1 * c2 < 0 and c3 * c4 < 0:
                expect.add((ia, ib))
    ldf = spark.createDataFrame(left, SCHEMA)
    rdf = spark.createDataFrame(right, SCHEMA)
    got = {
        (r["a_id"], r["b_id"])
        for r in segment_crossing_join(ldf, rdf, grid=256).collect()
    }
    assert got == expect and len(expect) > 0


def test_negative_coordinates(spark):
    rng = np.random.default_rng(13)
    segs = [(i, ax - 2000, ay - 2000, bx - 2000, by - 2000)
            for (i, ax, ay, bx, by) in make_segs(200, rng)]
    df = spark.createDataFrame(segs, SCHEMA)
    got = sorted(
        (r["a_id"], r["b_id"]) for r in segment_crossing_pairs(df, grid=128).collect()
    )
    assert got == brute_pairs(segs)


def test_grid_validation(spark):
    df = spark.createDataFrame([(0, 0, 0, 1, 1)], SCHEMA)
    with pytest.raises(ValueError):
        segment_crossing_pairs(df, grid=0)
