"""KMV bottom-k sketch contracts (functions/kmv.py): merge algebra,
small-set exactness, and estimator sanity — the properties that make the
sketch table safe to persist and compose incrementally at corpus scale.
The cross-engine value proof is the doc_kmv_overlap twin."""

import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from erased_cells_spark.functions.kmv import (
    kmv_estimate,
    kmv_pair_overlap,
    kmv_sketch,
)

K = 16


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, v string")


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_sketch_is_bottom_k_of_distinct_hashes(spark):
    rows = [("g", f"v{i}") for i in range(100)] + [("g", "v0")] * 5  # dups collapse
    sk = kmv_sketch(_df(spark, rows), "v", ["grp"], k=K).collect()
    got = sorted((r.hv, r.rank) for r in sk)
    want_hashes = sorted(_py_hash60(f"v{i}") for i in range(100))[:K]
    assert [h for h, _ in got] == want_hashes
    assert [r for _, r in got] == list(range(1, K + 1))


def test_merge_of_shard_sketches_equals_sketch_of_union(spark):
    """union two sketch tables, re-dedup, re-rank, refilter -> identical to
    sketching the concatenated input (the incremental-maintenance contract)."""
    rows_a = [("g", f"a{i}") for i in range(60)]
    rows_b = [("g", f"b{i}") for i in range(60)] + rows_a[:20]  # overlap
    sk_a = kmv_sketch(_df(spark, rows_a), "v", ["grp"], k=K)
    sk_b = kmv_sketch(_df(spark, rows_b), "v", ["grp"], k=K)
    merged = (
        sk_a.select("grp", "hv")
        .union(sk_b.select("grp", "hv"))
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("grp").orderBy("hv")),
        )
        .filter(F.col("rank") <= K)
    )
    full = kmv_sketch(_df(spark, rows_a + rows_b), "v", ["grp"], k=K)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_estimate_exact_below_k(spark):
    rows = [("g", f"v{i}") for i in range(K - 3)]
    est = kmv_estimate(kmv_sketch(_df(spark, rows), "v", ["grp"], k=K), ["grp"], k=K)
    assert est.collect()[0].kmv_estimate_r == float(K - 3)


def test_estimate_within_envelope(spark):
    n = 2000
    rows = [("g", f"item-{i}") for i in range(n)]
    est = kmv_estimate(
        kmv_sketch(_df(spark, rows), "v", ["grp"], k=64), ["grp"], k=64
    ).collect()[0].kmv_estimate_r
    assert abs(est - n) / n < 0.5  # ~1/sqrt(62) sigma; 4-sigma bound


def test_pair_overlap_sketch_counts_and_identity(spark):
    """identical groups -> jaccard estimate exactly 1.0 and the union
    estimate equals each side's estimate; disjoint small groups -> exact."""
    rows = [("a", f"v{i}") for i in range(200)] + [("b", f"v{i}") for i in range(200)]
    sk = kmv_sketch(_df(spark, rows), "v", ["grp"], k=32)
    ov = kmv_pair_overlap(sk, "grp", k=32).collect()[0]
    assert ov.est_jaccard_r == 1.0
    assert ov.sketch_overlap == 32
    assert ov.est_union_r == ov.est_intersect_r

    small = [("a", f"x{i}") for i in range(5)] + [("b", f"y{i}") for i in range(7)]
    sk2 = kmv_sketch(_df(spark, small), "v", ["grp"], k=32)
    ov2 = kmv_pair_overlap(sk2, "grp", k=32).collect()[0]
    assert ov2.est_union_r == 12.0
    assert ov2.est_jaccard_r == 0.0
    assert ov2.est_intersect_r == 0.0


def test_k_validation():
    with pytest.raises(ValueError):
        kmv_sketch(None, "v", ["grp"], k=1)
