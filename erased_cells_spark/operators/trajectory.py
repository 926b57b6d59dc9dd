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


def hausdorff_join(
    points: DataFrame,
    pairs: DataFrame,
    track_col: str = "tid",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Symmetric discrete Hausdorff distance between candidate track
    pairs — the trajectory-similarity measure ("how far apart do these
    two tracks ever get, at their closest approach") behind route
    clustering, commute-pattern matching, and track dedup.

        h(A, B) = max over a in A of min over b in B of d(a, b)
        H(A, B) = max(h(A, B), h(B, A))

    Exactness: distances stay SQUARED int64 (integer coordinates, no
    sqrt, no floats), so every min/max fold is exact on any engine;
    callers wanting metric units take one sqrt at the end under the
    float rule.

    `pairs` supplies the candidate (a_id, b_id) track pairs: all-pairs
    for the exact answer, or a pre-filter for thresholded similarity —
    the natural composition is bbox_overlap_pairs (operators/overlap.py)
    over per-track bounding boxes, which can only MISS pairs whose
    Hausdorff exceeds the bbox gap (document the threshold). Plan per
    pair: two equi-joins on the pair key fanning out to |A|*|B| distance
    rows, then min-per-source-point and max-per-pair aggregations — the
    exact O(|A|*|B|) cost is confined to candidate pairs, which is the
    point of the pre-filter.

    Returns (a_id, b_id, h2_ab, h2_ba, h2) — directed squared distances
    and their max."""
    pts = points.select(
        F.col(track_col).alias("tid"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
    )

    def directed(src: str, dst: str, out: str) -> DataFrame:
        a = pairs.join(
            pts.select(
                F.col("tid").alias(src), F.col("px").alias("ax"), F.col("py").alias("ay")
            ),
            src,
        )
        b = pts.select(
            F.col("tid").alias(dst), F.col("px").alias("bx"), F.col("py").alias("by")
        )
        dx = F.col("ax") - F.col("bx")
        dy = F.col("ay") - F.col("by")
        d2 = dx * dx + dy * dy  # integer multiplies (** would go double)
        per_pt = (
            a.join(b, dst)
            .groupBy("a_id", "b_id", "ax", "ay")
            .agg(F.min(d2).alias("near"))
        )
        return per_pt.groupBy("a_id", "b_id").agg(F.max("near").alias(out))

    ab = directed("a_id", "b_id", "h2_ab")
    ba = directed("b_id", "a_id", "h2_ba")
    return (
        ab.join(ba, ["a_id", "b_id"])
        .select(
            "a_id",
            "b_id",
            "h2_ab",
            "h2_ba",
            F.greatest("h2_ab", "h2_ba").alias("h2"),
        )
    )
