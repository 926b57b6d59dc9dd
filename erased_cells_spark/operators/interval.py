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


def interval_overlap_pairs(
    intervals: DataFrame,
    key_cols: list[str],
    id_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Interval-overlap SELF-join: all pairs of intervals sharing the key
    that overlap IN TIME, with the exact overlap length — the
    co-presence primitive (which users were in the same place at the
    same time, and for how long), contact tracing, and duration-weighted
    co-occurrence generally.

    Input: one row per interval (key_cols..., id_col, start, end) with
    integer start <= end (e.g. anchored epoch microseconds — use
    timestampdiff against a fixed anchor, never unix_micros on NTZ).
    Output: (key_cols..., id_a, id_b, overlap) with id_a < id_b and
    STRICT overlap > 0 (touching endpoints excluded — co-presence of
    measure zero is not presence).

    Scale shape — the 1-D instance of the bbox-overlap plan
    (operators/overlap.py): explode each interval onto the `bucket`-size
    time buckets it spans, equi-join on (key, bucket), and emit each
    pair EXACTLY ONCE in the first shared bucket

        b == max(a_b0, b_b0)

    (overlapping intervals always share the max-of-minima bucket) — one
    bounded explode (span/bucket + 1 rows), one shuffle on (key,
    bucket), a comparison residual, NO distinct. Pick `bucket` near the
    typical interval length (explode factor ~2); a pathological hot
    (key, bucket) degrades toward the quadratic truth — the usual
    AQE-skew / salting remedy surface."""
    if bucket <= 0:
        raise ValueError("bucket must be positive")

    def side(p: str) -> DataFrame:
        return intervals.select(
            *key_cols,
            F.col(id_col).alias(f"{p}_id"),
            F.col(start_col).cast("long").alias(f"{p}_s"),
            F.col(end_col).cast("long").alias(f"{p}_e"),
        ).withColumn(
            f"{p}_b0", F.expr(f"{p}_s div {bucket}")
        ).withColumn(
            "b", F.explode(F.sequence(F.col(f"{p}_b0"), F.expr(f"{p}_e div {bucket}")))
        )

    a, b = side("a"), side("b")
    cand = a.join(b, [*key_cols, "b"]).filter(F.col("a_id") < F.col("b_id"))
    first_bucket = F.col("b") == F.greatest(F.col("a_b0"), F.col("b_b0"))
    overlap = F.least(F.col("a_e"), F.col("b_e")) - F.greatest(
        F.col("a_s"), F.col("b_s")
    )
    return (
        cand.filter(first_bucket)
        .filter(overlap > 0)
        .select(
            *key_cols,
            "a_id",
            "b_id",
            overlap.alias("overlap"),
            # the overlap window itself: contact-graph builders key on when
            # the co-presence STARTED (temporal_reachability edges)
            F.greatest(F.col("a_s"), F.col("b_s")).alias("o_start"),
            F.least(F.col("a_e"), F.col("b_e")).alias("o_end"),
        )
    )
