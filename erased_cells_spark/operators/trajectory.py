"""Trajectory resampling: interpolate each user's track onto a fixed
epoch grid — the movement-data normalization step (map-matching, dwell
models, and trajectory ML all want fixed-rate tracks, not raw
irregular fixes).

Semantics: fixes order totally by (t, fix ordinal); consecutive fixes
span half-open segments [t0, t1). Epoch k (time k*every_us) is owned by
the unique segment containing it, and the emitted position is the
linear interpolation at frac = (k*every_us - t0) / (t1 - t0). A fix
exactly ON the grid emits with frac 0 from its own segment; the
segment's END epoch belongs to the NEXT segment (exactly-once by
half-openness, no distinct needed). Users with one fix emit nothing.

Exactness: epoch ownership is pure integer arithmetic (ceil-division
via -((-t0) div E)); the interpolation is a fixed expression tree of
IEEE ops on identical int64-derived doubles, so any engine reproduces
it bit-for-bit (rounded to 6 in the twin per the repo float rule).

Scale shape: one lag window per user (the shuffle every trajectory op
here shares), one bounded JVM sequence-explode per segment (segment
span / every), zero Python, no joins. Long-gap segments explode many
epochs — cap with max_gap_epochs to drop interpolation across data
holes (emitted as nothing, the standard 'don't invent positions across
an outage' rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_tracks(
    fixes: DataFrame,
    every_us: int,
    user_col: str = "user_id",
    t_col: str = "t_us",
    ord_col: str = "fix_id",
    max_gap_epochs: int | None = None,
) -> DataFrame:
    """fixes: (user, t_us int64, ordinal, lon double, lat double) ->
    (user, epoch, lon, lat) at epoch*every_us instants."""
    if every_us <= 0:
        raise ValueError("every_us must be positive")
    w = Window.partitionBy(user_col).orderBy(t_col, ord_col)
    seg = fixes.select(
        user_col,
        F.col(t_col).alias("t1"),
        F.col("lon").alias("lon1"),
        F.col("lat").alias("lat1"),
        F.lag(t_col).over(w).alias("t0"),
        F.lag("lon").over(w).alias("lon0"),
        F.lag("lat").over(w).alias("lat0"),
    ).filter(F.col("t0").isNotNull() & (F.col("t1") > F.col("t0")))
    e = F.lit(every_us)
    # ceil(t / E) in exact integer arithmetic under TRUNCATING div (what
    # both Spark's `div` and DuckDB's `//` actually do — the textbook
    # -((-t) div E) identity needs FLOOR division and silently yields
    # floor here, which would EXTRAPOLATE epochs before a segment's start;
    # pinned by test_linear_interpolation_values):
    #   ceil(t/E) = t div E + (1 if t % E > 0 else 0)   [E > 0]
    ceil_div = "({t} div {E}) + (CASE WHEN {t} % {E} > 0 THEN 1 ELSE 0 END)"
    seg = seg.withColumn(
        "k_min", F.expr(ceil_div.format(t="t0", E=every_us))
    ).withColumn("k_max", F.expr(ceil_div.format(t="t1", E=every_us)) - 1)
    if max_gap_epochs is not None:
        seg = seg.filter(F.col("k_max") - F.col("k_min") < max_gap_epochs)
    out = (
        seg.filter(F.col("k_max") >= F.col("k_min"))
        .withColumn("epoch", F.explode(F.sequence(F.col("k_min"), F.col("k_max"))))
        .withColumn(
            "frac",
            (F.col("epoch") * e - F.col("t0")).cast("double")
            / (F.col("t1") - F.col("t0")).cast("double"),
        )
    )
    return out.select(
        user_col,
        "epoch",
        (F.col("lon0") + (F.col("lon1") - F.col("lon0")) * F.col("frac")).alias("lon"),
        (F.col("lat0") + (F.col("lat1") - F.col("lat0")) * F.col("frac")).alias("lat"),
    )
