"""Deterministic HLL (functions/cardinality.py): accuracy envelope,
mergeability (union-of-sketches == sketch-of-union, exact), partitioning
determinism, precision scaling, and validation. Cross-engine register
identity is proven by the doc_hll_cardinality twin."""

import math

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.cardinality import (
    hll_count_distinct,
    hll_estimate,
    hll_registers,
)


def ids(spark, lo, hi, group="g"):
    return spark.range(lo, hi).select(
        F.lit(group).alias("g"), F.concat(F.lit("id-"), F.col("id")).alias("k")
    )


def test_accuracy_envelope(spark):
    # relative error ~1.04/sqrt(m); assert within 4 sigma at several n
    for n, p in [(500, 6), (5000, 8), (20000, 10)]:
        df = ids(spark, 0, n)
        est = hll_count_distinct(df, "k", ["g"], p=p).collect()[0]["hll_estimate_r"]
        sigma = 1.04 / math.sqrt(1 << p)
        assert abs(est - n) / n <= 4 * sigma, (n, p, est)


def test_mergeable_by_max(spark):
    a = ids(spark, 0, 3000)
    b = ids(spark, 2000, 6000)  # overlapping ranges
    union_regs = (
        hll_registers(a, "k", ["g"])
        .unionByName(hll_registers(b, "k", ["g"]))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    direct = hll_registers(a.unionByName(b), "k", ["g"])
    # register tables identical -> estimates identical (exact ints)
    assert sorted(map(tuple, union_regs.collect())) == sorted(map(tuple, direct.collect()))
    e1 = hll_estimate(union_regs, ["g"]).collect()[0]["hll_estimate_r"]
    e2 = hll_estimate(direct, ["g"]).collect()[0]["hll_estimate_r"]
    assert e1 == e2


def test_deterministic_across_partitionings(spark):
    df = ids(spark, 0, 4000)
    e1 = hll_count_distinct(df, "k", ["g"]).collect()[0]["hll_estimate_r"]
    e2 = hll_count_distinct(df.repartition(17), "k", ["g"]).collect()[0][
        "hll_estimate_r"
    ]
    assert e1 == e2


def test_duplicates_do_not_move_estimate(spark):
    df = ids(spark, 0, 1000)
    dup = df.unionByName(df).unionByName(df)
    e1 = hll_count_distinct(df, "k", ["g"]).collect()[0]["hll_estimate_r"]
    e2 = hll_count_distinct(dup, "k", ["g"]).collect()[0]["hll_estimate_r"]
    assert e1 == e2


def test_groups_are_independent(spark):
    df = ids(spark, 0, 1000, "a").unionByName(ids(spark, 0, 3000, "b"))
    out = {r["g"]: r["hll_estimate_r"] for r in hll_count_distinct(df, "k", ["g"]).collect()}
    assert out["b"] > out["a"] > 0


def test_p_validation(spark):
    df = ids(spark, 0, 10)
    with pytest.raises(ValueError):
        hll_registers(df, "k", ["g"], p=3)
    with pytest.raises(ValueError):
        hll_registers(df, "k", ["g"], p=17)
