"""Adaptive quadtree binning (operators/quadtree.py) contracts:
exactly-once point cover, the cap invariant, subdivision necessity
(no leaf exists whose parent was under cap), and partitioning
invariance. The cross-engine value check lives in test_oracle_twins
(geo_quadtree_bins)."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.quadtree import quadtree_assign, quadtree_leaves

BASE, MAX, CAP = 2, 6, 50


@pytest.fixture(scope="module")
def pts(spark):
    # skewed deterministic cloud: a dense clump near (10,10) + uniform tail
    n = 4000
    df = spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") % 4 < 3,  # 75% clumped -> forces deep subdivision
            10.0 + (F.conv(F.substring(F.md5(F.concat(F.lit("x"), F.col("id"))), 1, 8), 16, 10).cast("long") % 2000) / 1000.0,
        ).otherwise(
            -180.0 + (F.conv(F.substring(F.md5(F.concat(F.lit("u"), F.col("id"))), 1, 8), 16, 10).cast("long") % 360000) / 1000.0
        ).alias("lon"),
        F.when(
            F.col("id") % 4 < 3,
            10.0 + (F.conv(F.substring(F.md5(F.concat(F.lit("y"), F.col("id"))), 1, 8), 16, 10).cast("long") % 2000) / 1000.0,
        ).otherwise(
            -90.0 + (F.conv(F.substring(F.md5(F.concat(F.lit("v"), F.col("id"))), 1, 8), 16, 10).cast("long") % 180000) / 1000.0
        ).alias("lat"),
    )
    return df.cache()


@pytest.fixture(scope="module")
def leaves(pts):
    return quadtree_leaves(pts, base_res=BASE, max_res=MAX, cap=CAP).cache()


def test_leaves_cover_every_point_exactly_once(pts, leaves):
    n = pts.count()
    assigned = quadtree_assign(pts, leaves, base_res=BASE, max_res=MAX)
    assert assigned.count() == n  # exactly-once join, no dedup needed
    assert assigned.select("id").distinct().count() == n


def test_leaf_counts_match_assignment(pts, leaves):
    assigned = quadtree_assign(pts, leaves, base_res=BASE, max_res=MAX)
    got = {
        (r["res"], r["ix"], r["iy"]): r["n"]
        for r in assigned.groupBy("res", "ix", "iy").agg(F.count("*").alias("n")).collect()
    }
    want = {(r["res"], r["ix"], r["iy"]): r["n_docs"] for r in leaves.collect()}
    assert got == want


def test_cap_invariant(leaves):
    # every leaf above base_res fits under cap unless it hit the res floor
    bad = leaves.filter((F.col("n_docs") > CAP) & (F.col("res") < MAX)).collect()
    assert bad == []
    # the skewed clump actually forced subdivision AND hit the floor
    assert leaves.filter(F.col("res") == MAX).count() > 0
    assert leaves.filter(F.col("res") < MAX).count() > 0


def test_subdivision_only_when_parent_overfull(leaves):
    # a leaf deeper than base implies its parent cell was overfull:
    # sibling-group totals (parent counts restricted to leaf rows lower-
    # bound the true parent count) can't contradict the rule, but the
    # direct check is that no TWO leaves share a parent whose combined
    # count is <= cap while all four siblings are leaves... simplest
    # sound check: recompute parent counts from leaf counts and assert
    # every represented parent of a deep leaf exceeds cap when all its
    # children are leaves (nested counts make leaf sums == parent count
    # exactly when the cover is complete, which the cover test proves).
    deep = leaves.filter(F.col("res") > BASE)
    parents = (
        deep.groupBy(
            (F.col("res") - 1).alias("p_res"),
            F.shiftright("ix", 1).alias("p_ix"),
            F.shiftright("iy", 1).alias("p_iy"),
        )
        .agg(F.sum("n_docs").alias("n_kids"), F.count("*").alias("k"))
    )
    # parents with ALL FOUR children present as leaves carry the full
    # parent count — those must be overfull or subdivision was wrong
    bad = parents.filter((F.col("k") == 4) & (F.col("n_kids") <= CAP)).collect()
    assert bad == []


def test_partitioning_invariance(pts, leaves):
    re = quadtree_leaves(pts.repartition(7), base_res=BASE, max_res=MAX, cap=CAP)
    a = sorted(map(tuple, leaves.collect()))
    b = sorted(map(tuple, re.collect()))
    assert a == b
