"""Streaming spatial-temporal proximity join: pairs of point-events within
``radius_km`` great-circle km of each other AND within ``gap`` event time —
the streaming face of the radius join (operators/radius.py), as a
watermarked STREAM-STREAM self-join.

The same exactly-once candidate scheme as the batch join carries over
unchanged: the left leg explodes <=9 (band, bucket) keys per event, the
right leg carries its single key, so every qualifying unordered pair meets
exactly once (id_a < id_b keeps one of the two mirror matches) and the
join's equality conjuncts are two ints — Spark keys its stream state on
them. Both legs carry watermarks and the join condition carries the
symmetric event-time band, so join state is BOUNDED: an event older than
watermark - gap can never match anything new and is evicted (the
purchases_join_views_stream contract, made spatial).

Batch twin (proximity_pairs_batch: radius_pairs + the time-band filter) is
the oracle — tests pin stream == batch under availableNow with pairs
straddling micro-batch boundaries.

100 TB: state per key is the events of one (band, bucket) cell within the
watermark horizon — geography x time bounded, the same hot-cell profile as
the batch join (salting remedy applies); nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erased_cells_spark.operators.knn import haversine_km_expr
from erased_cells_spark.operators.radius import (
    KM_PER_DEG,
    _band_expr,
    _bucket0_expr,
    _n_buckets_expr,
)


def _left_leg(df: DataFrame, radius_km: float, h: float, max_band: int) -> DataFrame:
    out = (
        df.select(
            F.col("id").alias("id_a"),
            F.col("ts").alias("ts_a"),
            F.col("lon").alias("lon_a"),
            F.col("lat").alias("lat_a"),
            _band_expr(F.col("lat"), h).alias("band0"),
        )
        .withColumn(
            "jband",
            F.explode(F.array(F.col("band0") - 1, F.col("band0"), F.col("band0") + 1)),
        )
        .filter((F.col("jband") >= 0) & (F.col("jband") <= F.lit(max_band)))
        .withColumn("jnb", _n_buckets_expr(F.col("jband"), radius_km, h))
    )
    b0 = _bucket0_expr(F.col("lon_a"), F.col("jnb"))
    return out.withColumn(
        "jbucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.pmod(b0 - 1, F.col("jnb")),
                    F.pmod(b0, F.col("jnb")),
                    F.pmod(b0 + 1, F.col("jnb")),
                )
            )
        ),
    ).drop("jnb", "band0")


def _right_leg(df: DataFrame, radius_km: float, h: float) -> DataFrame:
    out = df.select(
        F.col("id").alias("id_b"),
        F.col("ts").alias("ts_b"),
        F.col("lon").alias("lon_b"),
        F.col("lat").alias("lat_b"),
        _band_expr(F.col("lat"), h).alias("jband"),
    )
    nb = _n_buckets_expr(F.col("jband"), radius_km, h)
    return out.withColumn("jbucket", F.pmod(_bucket0_expr(F.col("lon_b"), nb), nb))


def proximity_pairs_stream(
    stream: DataFrame,
    radius_km: float,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    id_col: str = "event_id",
) -> DataFrame:
    """Stream of (id_a, id_b, dist_km): unordered event pairs within
    ``radius_km`` AND within ``gap`` of each other. Input stream columns:
    (``id_col``, ts, lon, lat)."""
    if radius_km <= 0.0:
        raise ValueError(f"radius_km must be positive, got {radius_km}")
    h = radius_km / KM_PER_DEG
    import math

    max_band = int(math.floor(180.0 / h))
    base = stream.select(
        F.col(id_col).alias("id"), "ts", "lon", "lat"
    ).withWatermark("ts", watermark)
    l = _left_leg(base, radius_km, h, max_band)  # noqa: E741
    r = _right_leg(base, radius_km, h)
    cond = (
        (l["jband"] == r["jband"])
        & (l["jbucket"] == r["jbucket"])
        & (l["id_a"] < r["id_b"])
        & (r["ts_b"] >= l["ts_a"] - F.expr(f"INTERVAL {gap}"))
        & (r["ts_b"] <= l["ts_a"] + F.expr(f"INTERVAL {gap}"))
    )
    dist = haversine_km_expr(
        F.col("lon_a"), F.col("lat_a"), F.col("lon_b"), F.col("lat_b")
    )
    return (
        l.join(r, cond, "inner")
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= F.lit(radius_km))
        .select("id_a", "id_b", "dist_km")
    )


def proximity_pairs_batch(
    events: DataFrame,
    radius_km: float,
    gap_minutes: float,
    id_col: str = "event_id",
) -> DataFrame:
    """Batch twin: radius_pairs + the symmetric time band (the oracle the
    stream must equal)."""
    from erased_cells_spark.operators.radius import radius_pairs

    pts = events.select(F.col(id_col).alias("id"), "ts", "lon", "lat")
    pairs = radius_pairs(pts, radius_km, id_col="id")
    ta = pts.select(F.col("id").alias("id_a"), F.col("ts").alias("ts_a"))
    tb = pts.select(F.col("id").alias("id_b"), F.col("ts").alias("ts_b"))
    gap_s = gap_minutes * 60.0
    dt = F.abs(
        F.col("ts_a").cast("double") - F.col("ts_b").cast("double")
    )
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(dt <= F.lit(gap_s))
        .select("id_a", "id_b", "dist_km")
    )
