"""SCD Type 2 contracts (operators/scd.py): change compression, interval
chaining, NULL-attribute transitions, multi-attribute runs, and the
as-of point lookup. Cross-engine parity is the events_scd2_dim twin."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from erased_cells_spark.operators.scd import scd2_as_of, scd2_build

SCHEMA = "k string, i long, v string"


def _build(spark, rows, attrs=("v",)):
    df = spark.createDataFrame(rows, SCHEMA)
    return scd2_build(df, ["k"], ["i"], list(attrs), ts_col="i")


def test_change_compression_and_chaining(spark):
    rows = [("u", 1, "a"), ("u", 2, "a"), ("u", 3, "b"), ("u", 4, "b"), ("u", 5, "a")]
    out = sorted(
        ((r.version, r.v, r.valid_from, r.valid_to, r.is_current)
         for r in _build(spark, rows).collect())
    )
    assert out == [
        (1, "a", 1, 3, False),
        (2, "b", 3, 5, False),
        (3, "a", 5, None, True),  # returning to a prior value mints a NEW run
    ]


def test_null_attribute_transitions(spark):
    rows = [("u", 1, None), ("u", 2, None), ("u", 3, "x"), ("u", 4, None)]
    out = sorted(
        ((r.version, r.v, r.valid_from) for r in _build(spark, rows).collect())
    )
    # NULL==NULL compresses; NULL<->value is a boundary both directions
    assert out == [(1, None, 1), (2, "x", 3), (3, None, 4)]


def test_multi_attribute_any_change_is_boundary(spark):
    df = spark.createDataFrame(
        [("u", 1, "a", 10), ("u", 2, "a", 10), ("u", 3, "a", 20), ("u", 4, "b", 20)],
        "k string, i long, v string, w long",
    )
    out = scd2_build(df, ["k"], ["i"], ["v", "w"], ts_col="i").collect()
    assert sorted((r.version, r.v, r.w) for r in out) == [
        (1, "a", 10), (2, "a", 20), (3, "b", 20)
    ]


def test_keys_are_independent(spark):
    rows = [("u", 1, "a"), ("z", 1, "a"), ("z", 2, "b")]
    out = _build(spark, rows).collect()
    assert {(r.k, r.version) for r in out} == {("u", 1), ("z", 1), ("z", 2)}
    assert all(r.is_current for r in out if (r.k, r.version) in {("u", 1), ("z", 2)})


def test_as_of_lookup(spark):
    rows = [("u", 1, "a"), ("u", 5, "b"), ("u", 9, "c")]
    dim = _build(spark, rows)
    for ts, want in [(1, "a"), (4, "a"), (5, "b"), (8, "b"), (9, "c"), (99, "c")]:
        got = scd2_as_of(dim, ts).collect()
        assert [r.v for r in got] == [want], ts
    assert scd2_as_of(dim, 0).collect() == []  # before first observation


def test_validation(spark):
    with pytest.raises(ValueError):
        scd2_build(None, [], ["i"], ["v"])
