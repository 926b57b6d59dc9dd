"""Streaming geofencing: assign each point-event a zone from a
broadcast-small fence set, track the per-user zone in O(1) state, and emit
ENTER/EXIT transition rows — the streaming face of the PIP family
(operators/pip.py), built as a custom stateful operator
(applyInPandasWithState) exactly like the gap sessionizer.

Contract:
- fences are broadcast-small (city/zone sets, the geofence use case) and
  arrive in the make_polygon_fixtures dict format (poly_id, ring: closed
  numpy ring). Overlaps resolve deterministically to the SMALLEST poly_id;
  outside every fence is zone -1.
- per user, event times are strictly increasing (the fixture/upstream
  dedupe guarantee); an event at-or-before the user's last processed event
  time is LATE and dropped (watermark bounds how long that state lives).
- transitions: when consecutive events flip zone z0 -> z1, emit
  (user, ts, z0, 'exit') if z0 != -1 and (user, ts, z1, 'enter') if
  z1 != -1, both stamped with the NEW event's time. The first event a user
  ever produces enters from -1.

The batch twin (geofence_transitions_batch: one vectorized-pandas zone
assign + one lag window) is the oracle — tests pin stream == batch under
availableNow. Winding math is the shared numpy points_in_ring kernel; per
micro-batch it is one vectorized pass per fence, not per-row Python.

100 TB: state is (int, long) per user; the zone assign is O(events x
fences) inside Arrow batches with no shuffle beyond the groupBy(user) the
stateful operator needs anyway. Large fence SETS (beyond broadcast) belong
to the batch pip_join_df path, not a geofence stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from erased_cells_spark.spatial.geom import points_in_ring

GEOFENCE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts_s", StringType()),
        StructField("zone_id", IntegerType()),
        StructField("transition", StringType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("last_zone", IntegerType()), StructField("last_ms", LongType())]
)


def _rings_of(polygons) -> list[tuple[int, np.ndarray]]:
    return sorted(
        ((int(p["poly_id"]), np.asarray(p["ring"], np.float64)) for p in polygons),
        key=lambda t: t[0],
    )


def zone_assign_np(lon, lat, polygons) -> np.ndarray:
    """Smallest containing poly_id per point, -1 outside all fences."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    out = np.full(len(lon), -1, dtype=np.int32)
    for pid, ring in _rings_of(polygons):  # ascending: first hit = min id
        sel = out == -1
        if not sel.any():
            break
        out[np.flatnonzero(sel)[points_in_ring(lon[sel], lat[sel], ring)]] = pid
    return out


def _fmt_ms(ms: int) -> str:
    return pd.Timestamp(ms, unit="ms").strftime("%Y-%m-%d %H:%M:%S")


def _transitions(last_zone: int, ms: np.ndarray, zones: np.ndarray, user_id: int):
    out = []
    for t, z in zip(ms.tolist(), zones.tolist()):
        if z != last_zone:
            s = _fmt_ms(t)
            if last_zone != -1:
                out.append(
                    {"user_id": user_id, "ts_s": s, "zone_id": last_zone, "transition": "exit"}
                )
            if z != -1:
                out.append(
                    {"user_id": user_id, "ts_s": s, "zone_id": z, "transition": "enter"}
                )
        last_zone = z
    return out, last_zone


def geofence_transitions_stream(
    stream: DataFrame, polygons, watermark: str = "2 hours"
) -> DataFrame:
    """Stateful ENTER/EXIT detection over a stream of (user_id, ts, lon,
    lat). State per user: (last_zone, last_event_ms) — O(1) regardless of
    stream length."""
    rings = _rings_of(polygons)

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # NoTimeout — defensive only
            return
        user_id = int(key[0])
        pdf = pd.concat(list(pdfs)).sort_values("ts")
        ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        zones = zone_assign_np(
            pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
            [{"poly_id": pid, "ring": r} for pid, r in rings],
        )
        last_zone, last_ms = state.get if state.exists else (-1, -(2**62))
        fresh = ms > last_ms  # at-or-before last processed = late, dropped
        out, last_zone = _transitions(last_zone, ms[fresh], zones[fresh], user_id)
        if fresh.any():
            last_ms = int(ms[fresh].max())
        state.update((int(last_zone), int(last_ms)))
        yield pd.DataFrame(out, columns=["user_id", "ts_s", "zone_id", "transition"])

    return (
        stream.withWatermark("ts", watermark)
        .select("user_id", "ts", "lon", "lat")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=GEOFENCE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def geofence_transitions_batch(df: DataFrame, polygons) -> DataFrame:
    """Batch twin: vectorized zone assign (one Arrow pass, fences closed
    over) + one lag window per user — the oracle the stream must equal."""
    rings = _rings_of(polygons)

    @pandas_udf(IntegerType())
    def zone_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        z = zone_assign_np(
            lon.to_numpy(), lat.to_numpy(),
            [{"poly_id": pid, "ring": r} for pid, r in rings],
        )
        return pd.Series(z)

    w = Window.partitionBy("user_id").orderBy("ts")
    zoned = df.select(
        "user_id", "ts", zone_udf(F.col("lon"), F.col("lat")).alias("zone")
    ).withColumn("prev", F.lag("zone", 1, -1).over(w))
    changed = zoned.filter(F.col("zone") != F.col("prev"))
    ts_s = F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s")
    exits = changed.filter(F.col("prev") != -1).select(
        "user_id", ts_s, F.col("prev").alias("zone_id"), F.lit("exit").alias("transition")
    )
    enters = changed.filter(F.col("zone") != -1).select(
        "user_id", ts_s, F.col("zone").alias("zone_id"), F.lit("enter").alias("transition")
    )
    return exits.unionByName(enters)
