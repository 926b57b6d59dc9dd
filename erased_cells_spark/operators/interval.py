"""Interval (point-in-window) join: events × time windows — the temporal
twin of the spatial PIP join, and the second range-join shape the builder
brief names (join training events to experiment/holdout windows, ads to
flights, logs to incidents).

Scale path: NOT an inequality theta-join (which Spark plans as a
nested-loop / cartesian). Each interval explodes into the fixed-width time
BUCKETS it covers; each point maps to exactly one bucket; the join is an
equi-join on the bucket followed by the exact containment filter. Shuffle
volume: every point once, every interval once per covered bucket — never
|points| × |intervals|. Pick bucket_width near the typical interval width
so the per-interval explosion stays O(1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    lo_col: str = "t_lo",
    hi_col: str = "t_hi",
    bucket_width_s: int = 3600 * 6,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (lo <= ts <= hi), via bucket equi-join + exact filter."""
    sec = F.col(ts_col).cast("timestamp").cast("long")
    p = points.withColumn("_b", F.floor(sec / bucket_width_s))
    # guard malformed intervals: Spark's sequence(lo, hi) DESCENDS when
    # lo > hi (no error), so an inverted interval would explode into a huge
    # bucket list that the containment filter then throws away — drop empty
    # intervals up front instead (they can match nothing)
    intervals = intervals.filter(F.col(lo_col) <= F.col(hi_col))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("timestamp").cast("long") / bucket_width_s),
                F.floor(F.col(hi_col).cast("timestamp").cast("long") / bucket_width_s),
            )
        ),
    )
    return (
        p.join(iv, "_b")
        .filter((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) <= F.col(hi_col)))
        .drop("_b")
    )


def interval_join_np(point_ts: list, windows: list[tuple]) -> list[tuple[int, int]]:
    """Brute-force twin: [(point_index, window_id)] for every containment."""
    out = []
    for i, ts in enumerate(point_ts):
        for w_id, lo, hi in windows:
            if lo <= ts <= hi:
                out.append((i, w_id))
    return sorted(out)


def time_window_fixtures(n: int = 16, seed: int = 29) -> list[tuple[int, str, str]]:
    """Deterministic (w_id, lo, hi) windows over Jan 2024 (the events table's
    span at every SF), widths 2h–36h — shared verbatim by the Spark query
    fixture and the DuckDB VALUES oracle."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00")
    out = []
    for w in range(n):
        lo_s = int(rng.integers(0, 29 * 24 * 3600))
        width = int(rng.integers(2 * 3600, 36 * 3600))
        lo = base + np.timedelta64(lo_s, "s")
        hi = base + np.timedelta64(lo_s + width, "s")
        out.append((w, str(lo).replace("T", " "), str(hi).replace("T", " ")))
    return out
