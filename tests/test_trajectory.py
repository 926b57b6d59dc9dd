"""Trajectory resampling (operators/trajectory.resample_tracks):
hand-built tracks pin the half-open ownership rule (exactly-once epochs,
on-grid fixes, segment-end exclusion), interpolation values, gap capping,
single-fix users, and validation. Cross-engine identity is proven by the
user_track_resample twin."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.trajectory import resample_tracks

SCHEMA = "user_id LONG, fix_id LONG, t_us LONG, lon DOUBLE, lat DOUBLE"
E = 100  # tiny epoch unit keeps the hand arithmetic readable


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = resample_tracks(df, every_us=E, **kw).collect()
    return sorted((r["user_id"], r["epoch"], r["lon"], r["lat"]) for r in out)


def test_linear_interpolation_values(spark):
    # one segment [50, 250): epochs 1 (t=100, frac=0.25) and 2 (t=200, 0.75)
    rows = [(1, 0, 50, 0.0, 10.0), (1, 1, 250, 8.0, 30.0)]
    assert run(spark, rows) == [
        (1, 1, 2.0, 15.0),
        (1, 2, 6.0, 25.0),
    ]


def test_on_grid_fix_owned_by_its_own_segment(spark):
    # fix exactly at t=200: epoch 2 comes from segment [200, 300) at frac 0
    rows = [(1, 0, 100, 0.0, 0.0), (1, 1, 200, 4.0, 4.0), (1, 2, 300, 8.0, 8.0)]
    got = run(spark, rows)
    assert (1, 2, 4.0, 4.0) in got
    # ...and appears exactly once (half-open ownership, no distinct)
    assert len([g for g in got if g[1] == 2]) == 1
    # epochs: t=100 (frac 0 in seg [100,200)), 200, 300? 300 is segment END
    # with no following segment -> not emitted
    assert [g[1] for g in got] == [1, 2]


def test_exactly_once_across_many_segments(spark):
    rows = [(1, i, 100 * i + 50, float(i), float(i)) for i in range(10)]
    got = run(spark, rows)
    epochs = [g[1] for g in got]
    assert epochs == sorted(set(epochs))  # no duplicates
    assert len(epochs) == 9  # one per interior grid instant


def test_gap_cap_drops_outage_segments(spark):
    rows = [(1, 0, 0, 0.0, 0.0), (1, 1, 10_000, 1.0, 1.0), (1, 2, 10_050, 2.0, 2.0)]
    full = run(spark, rows)
    capped = run(spark, rows, max_gap_epochs=5)
    # the 100-epoch outage segment drops; the short trailing segment
    # [10000, 10050) keeps its on-grid epoch 100 at frac 0
    assert len(full) > 50 and capped == [(1, 100, 1.0, 1.0)]


def test_single_fix_and_duplicate_ts_users(spark):
    rows = [(1, 0, 123, 0.0, 0.0),  # one fix: no segment
            (2, 0, 100, 0.0, 0.0), (2, 1, 100, 5.0, 5.0)]  # zero-length segment
    assert run(spark, rows) == []


def test_validation(spark):
    df = spark.createDataFrame([(1, 0, 0, 0.0, 0.0)], SCHEMA)
    with pytest.raises(ValueError):
        resample_tracks(df, every_us=0)
