"""Hausdorff contracts (operators/trajectory.hausdorff_join):
python-reference equivalence on random tracks, the directed asymmetry
(a tight track inside a sprawling one), identical tracks = 0, and the
bbox pre-filter composition. Cross-engine parity is the
user_hausdorff_pairs twin."""

import random

from pyspark.sql import functions as F

from erased_cells_spark.operators.trajectory import hausdorff_join


def _ref_directed(A, B):
    return max(min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in B) for ax, ay in A)


def _run(spark, tracks: dict):
    pts = spark.createDataFrame(
        [(tid, x, y) for tid, ps in tracks.items() for x, y in ps],
        "tid long, x long, y long",
    )
    ids = sorted(tracks)
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]],
        "a_id long, b_id long",
    )
    return {
        (r.a_id, r.b_id): (r.h2_ab, r.h2_ba, r.h2)
        for r in hausdorff_join(pts, pairs).collect()
    }


def test_matches_reference_random(spark):
    rng = random.Random(41)
    tracks = {
        t: [(rng.randrange(0, 500), rng.randrange(0, 500)) for _ in range(30)]
        for t in range(5)
    }
    got = _run(spark, tracks)
    for (a, b), (ab, ba, h) in got.items():
        assert ab == _ref_directed(tracks[a], tracks[b])
        assert ba == _ref_directed(tracks[b], tracks[a])
        assert h == max(ab, ba)


def test_directed_asymmetry_and_identity(spark):
    inner = [(10, 10), (11, 10), (10, 11)]
    outer = inner + [(100, 100)]
    got = _run(spark, {0: inner, 1: outer, 2: list(inner)})
    ab, ba, h = got[(0, 1)]
    assert ab == 0            # inner is contained in outer's point set
    assert ba > 0 and h == ba  # outer's far point dominates
    assert got[(0, 2)] == (0, 0, 0)  # identical tracks


def test_bbox_prefilter_composition(spark):
    from erased_cells_spark.operators.overlap import bbox_overlap_pairs

    tracks = {
        0: [(0, 0), (50, 50)],
        1: [(40, 40), (90, 90)],     # bbox overlaps track 0
        2: [(1000, 1000), (1100, 1100)],  # far away: pre-filtered out
    }
    pts = spark.createDataFrame(
        [(t, x, y) for t, ps in tracks.items() for x, y in ps],
        "tid long, x long, y long",
    )
    boxes = pts.groupBy(F.col("tid").alias("rect_id")).agg(
        F.min("x").alias("x0"), F.min("y").alias("y0"),
        F.max("x").alias("x1"), F.max("y").alias("y1"),
    )
    cand = bbox_overlap_pairs(boxes, grid=64).select("a_id", "b_id")
    got = _run_pairs(spark, pts, cand)
    assert set(got) == {(0, 1)}


def _run_pairs(spark, pts, pairs):
    return {
        (r.a_id, r.b_id): (r.h2_ab, r.h2_ba, r.h2)
        for r in hausdorff_join(pts, pairs).collect()
    }
