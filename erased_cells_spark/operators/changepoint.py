"""CUSUM change-point scores as ONE window pass — no recursion, no UDF.

The textbook one-sided upper CUSUM is the recurrence
    s_n = max(0, s_{n-1} + (x_n - drift)),   alarm when s_n >= h
which looks sequential (and is, in every streaming implementation). It
has an exact closed form over prefix sums: with P_n = sum_{i<=n}(x_i -
drift) and P_0 = 0,

    s_n = P_n - min(P_0, P_1, ..., P_n)

(the running max-reset is "distance above the lowest prefix so far").
Proof sketch: both sides satisfy the same recurrence — subtracting the
running min resets the excursion exactly when the prefix makes a new
low, which is exactly when the recurrence clamps at 0.

That closed form is two window aggregates over the SAME ordered frame
(running sum + running min), so Spark computes per-series CUSUM in one
shuffle with zero iteration, and the arithmetic is pure int64 when the
input is quantized (cents) — bit-identical on any engine, which the
events_cusum_alarms twin proves against DuckDB.

Scale shape (100 TB): one shuffle on the series key; each series sorts
within its partition (the standard per-key-ordered window cost). Skewed
mega-series are the known hazard of ANY ordered-window op — the same
remedy surface as sessionization (range-partition within series by time
chunk, then stitch chunk boundaries with a second tiny pass)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_scores(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: str,
    drift: int,
    h: int,
) -> DataFrame:
    """Append (cusum, alarm) per row: the one-sided upper CUSUM of
    value_col - drift within each series, ordered by order_cols (must be
    a total order per series — include a unique id as the tie-break).
    `value_col`, `drift`, `h` must be integers for exact cross-engine
    reproducibility."""
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.col(value_col).cast("long") - F.lit(drift).cast("long")
    p = F.sum(y).over(w)
    floor = F.least(F.lit(0).cast("long"), F.min(p).over(w))
    return df.withColumn("cusum", p - floor).withColumn(
        "alarm", F.col("cusum") >= F.lit(h).cast("long")
    )


def mann_kendall_sen(
    df: DataFrame,
    series_cols: list[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Kendall trend test statistic + Theil-Sen slope per series —
    the nonparametric monotone-trend pair (is the series rising, and how
    fast) robust to outliers, i.e. the right trend estimator for bursty
    count series where least squares melts. Input: ONE row per
    (series, time) with integer time and integer value (pre-binned).
    Output per series with >= 2 bins:

        n_bins, n_pairs,
        s_stat     = sum over i<j of sign(v_j - v_i)    (exact int)
        sen_slope  = LOWER MEDIAN of pairwise slopes (v_j-v_i)/(t_j-t_i)

    Exactness: S is pure integer; each pairwise slope is ONE IEEE divide
    of exact ints (deterministic); the median is SELECTED, not averaged
    — row_number ordered by the slope value picks element (m+1) div 2,
    so ties collapse to the same value and no arithmetic touches the
    result. Series with a single bin are dropped (no pairs — stated).

    Scale shape: the pair self-join is O(bins^2) PER SERIES — bins are a
    bounded time axis (days/weeks), not data; the join + two windows
    share the series-key shuffle. This is the per-cell "emerging
    hotspot" computation when series_cols is a spatial cell."""
    a = df.select(
        *series_cols,
        F.col(time_col).cast("long").alias("t_a"),
        F.col(value_col).cast("long").alias("v_a"),
    )
    b = df.select(
        *series_cols,
        F.col(time_col).cast("long").alias("t_b"),
        F.col(value_col).cast("long").alias("v_b"),
    )
    pairs = a.join(b, series_cols).filter(F.col("t_a") < F.col("t_b"))
    dv = F.col("v_b") - F.col("v_a")
    slope = dv.cast("double") / (F.col("t_b") - F.col("t_a")).cast("double")
    scored = pairs.select(*series_cols, dv.alias("dv"), slope.alias("slope"))
    w = Window.partitionBy(*series_cols).orderBy("slope")
    ranked = scored.withColumn("rn", F.row_number().over(w)).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy(*series_cols))
    )
    sen = ranked.filter(F.col("rn") == F.expr("(m + 1) div 2")).select(
        *series_cols, F.col("slope").alias("sen_slope"), F.col("m").alias("n_pairs")
    )
    s = scored.groupBy(*series_cols).agg(
        F.sum(F.signum(F.col("dv").cast("double")).cast("long")).alias("s_stat")
    )
    bins = df.groupBy(*series_cols).agg(F.count(F.lit(1)).alias("n_bins"))
    return (
        bins.join(s, series_cols)
        .join(sen, series_cols)
        .select(*series_cols, "n_bins", "n_pairs", "s_stat", "sen_slope")
    )
