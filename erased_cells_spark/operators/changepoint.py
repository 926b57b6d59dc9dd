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
