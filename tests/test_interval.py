"""Interval join vs brute-force containment twin; plan must be an equi-join
on the bucket (never a theta/nested-loop join)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.interval import (
    interval_join,
    interval_join_np,
    time_window_fixtures,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    rng = np.random.default_rng(31)
    base = np.datetime64("2024-01-01T00:00:00")
    pts = [base + np.timedelta64(int(s), "s") for s in rng.integers(0, 30 * 24 * 3600, 800)]
    # planted edge cases: points exactly AT window bounds (inclusive on both)
    w0 = time_window_fixtures()[0]
    pts += [np.datetime64(w0[1].replace(" ", "T")), np.datetime64(w0[2].replace(" ", "T"))]
    pdf = pd.DataFrame({"pid": range(len(pts)), "ts": pd.to_datetime(pts)})
    pdf_spark = spark.createDataFrame(pdf)
    win = spark.createDataFrame(
        [(w, lo, hi) for w, lo, hi in time_window_fixtures()],
        "w_id INT, t_lo STRING, t_hi STRING",
    ).select("w_id", F.col("t_lo").cast("timestamp"), F.col("t_hi").cast("timestamp"))
    return pdf_spark, win, pts


class TestIntervalJoin:
    def test_matches_bruteforce_including_bounds(self, spark, fixtures):
        pdf_spark, win, pts = fixtures
        out = interval_join(pdf_spark, win, ts_col="ts")
        got = sorted((r.pid, r.w_id) for r in out.collect())
        windows = [
            (w, np.datetime64(lo.replace(" ", "T")), np.datetime64(hi.replace(" ", "T")))
            for w, lo, hi in time_window_fixtures()
        ]
        want = interval_join_np(pts, windows)
        assert got == want and len(want) > 100
        # the planted boundary points are in window 0 (inclusive bounds)
        n = len(pts)
        assert (n - 2, 0) in got and (n - 1, 0) in got

    def test_bucket_width_does_not_change_result(self, spark, fixtures):
        pdf_spark, win, _ = fixtures
        a = sorted(
            (r.pid, r.w_id)
            for r in interval_join(pdf_spark, win, bucket_width_s=3600).collect()
        )
        b = sorted(
            (r.pid, r.w_id)
            for r in interval_join(pdf_spark, win, bucket_width_s=48 * 3600).collect()
        )
        assert a == b

    def test_inverted_interval_matches_nothing_cheaply(self, spark, fixtures):
        """lo > hi must match nothing — and must be dropped BEFORE the bucket
        explode (Spark's sequence(lo, hi) silently DESCENDS when lo > hi, so
        an unguarded inverted interval would explode a huge bucket list)."""
        pdf_spark, _, _ = fixtures
        win = spark.createDataFrame(
            [(0, "2024-01-20 00:00:00", "2024-01-10 00:00:00")],
            "w_id INT, t_lo STRING, t_hi STRING",
        ).select("w_id", F.col("t_lo").cast("timestamp"), F.col("t_hi").cast("timestamp"))
        assert interval_join(pdf_spark, win).count() == 0

    def test_plan_is_bucket_equijoin_not_theta(self, spark, fixtures):
        pdf_spark, win, _ = fixtures
        out = interval_join(pdf_spark, win)
        p = out._jdf.queryExecution().sparkPlan().toString()
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "Python" not in p
