"""Count-min sketch contracts (functions/cms.py): the never-undercount
guarantee over EVERY key, additive mergeability, unseen-key zero, and
weighted builds. Cross-engine value parity is the events_cms_counts twin."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.cms import cms_build, cms_query

D, W = 4, 32


def _occ(spark, counts: dict):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_never_undercounts_any_key(spark):
    counts = {f"key{i}": (i % 7) + 1 for i in range(200)}  # 200 keys >> 32 cols
    occ = _occ(spark, counts)
    sk = cms_build(occ, "k", d=D, w=W)
    est = {
        r.k: r.cms_est
        for r in cms_query(sk, occ.distinct(), "k", d=D, w=W).collect()
    }
    assert set(est) == set(counts)
    assert all(est[k] >= counts[k] for k in counts)
    # with 200 keys in 32 columns some row must collide: overcount visible
    assert any(est[k] > counts[k] for k in counts)


def test_merge_by_addition_equals_sketch_of_union(spark):
    a = _occ(spark, {"x": 3, "y": 5})
    b = _occ(spark, {"y": 2, "z": 7})
    sk_a, sk_b = cms_build(a, "k", d=D, w=W), cms_build(b, "k", d=D, w=W)
    merged = sk_a.union(sk_b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    full = cms_build(a.union(b), "k", d=D, w=W)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_unseen_key_estimates_zero_without_collision(spark):
    sk = cms_build(_occ(spark, {"only": 9}), "k", d=D, w=W)
    probe = spark.createDataFrame([("never-seen",)], "k string")
    [r] = cms_query(sk, probe, "k", d=D, w=W).collect()
    # one stored key cannot fill all d cells of another key unless every
    # salted hash collides; with d=4 independent rows that would require
    # 4 simultaneous collisions — assert the generic guarantee instead
    assert 0 <= r.cms_est <= 9


def test_weighted_build(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)], "k string, n int")
    sk = cms_build(df, "k", d=D, w=W, weight_col="n")
    est = {r.k: r.cms_est for r in cms_query(sk, df, "k", d=D, w=W).collect()}
    assert est["a"] >= 15 and est["b"] >= 2


def test_param_validation():
    with pytest.raises(ValueError):
        cms_build(None, "k", d=0, w=W)
    with pytest.raises(ValueError):
        cms_build(None, "k", d=D, w=1)
