"""Streaming geofence (streaming/geofence.py): ENTER/EXIT transitions from
a stateful stream must equal the batch twin's lag-window output; zone
assignment resolves overlaps to the smallest poly_id; late rows drop."""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest

from erased_cells_spark.streaming.geofence import (
    geofence_transitions_batch,
    geofence_transitions_stream,
    zone_assign_np,
)

# two adjacent boxes and one overlapping box (overlap -> min poly_id wins)
def _box(pid, x0, y0, x1, y1):
    ring = np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )
    return {"poly_id": pid, "ring": ring}


FENCES = [_box(0, 0.0, 0.0, 10.0, 10.0), _box(1, 10.0, 0.0, 20.0, 10.0), _box(2, 8.0, 0.0, 12.0, 10.0)]


def test_zone_assign_min_id_on_overlap():
    lon = np.array([5.0, 9.0, 11.0, 15.0, 50.0])
    lat = np.array([5.0, 5.0, 5.0, 5.0, 5.0])
    # 9 is in boxes 0 and 2 -> 0; 11 in boxes 1 and 2 -> 1; 50 outside -> -1
    assert zone_assign_np(lon, lat, FENCES).tolist() == [0, 0, 1, 1, -1]


def _tracks():
    # user 1: outside -> box0 -> box1 -> outside; user 2: born inside box1,
    # wiggles within it (no transition), exits; user 3: never inside
    base = pd.Timestamp("2024-01-01 00:00:00")

    def at(minutes):
        return (base + pd.Timedelta(minutes=minutes)).to_pydatetime()

    rows = []
    for i, (lon, lat) in enumerate([(-5, 5), (5, 5), (15, 5), (40, 5)]):
        rows.append((1, at(10 * i), float(lon), float(lat)))
    for i, (lon, lat) in enumerate([(15, 5), (16, 6), (17, 4), (-40, 5)]):
        rows.append((2, at(10 * i), float(lon), float(lat)))
    for i in range(3):
        rows.append((3, at(10 * i), 60.0, -30.0))
    return rows


def _norm(df):
    return sorted((r.user_id, r.ts_s, r.zone_id, r.transition) for r in df.collect())


def test_stream_equals_batch(spark, tmp_path):
    rows = _tracks()
    schema = "user_id BIGINT, ts TIMESTAMP, lon DOUBLE, lat DOUBLE"
    df = spark.createDataFrame(rows, schema)
    # three TIME-SLICED files = three micro-batches (maxFilesPerTrigger=1),
    # so each user's transitions straddle batch boundaries — the state
    # hand-off under test. Slices are written a beat apart so the file
    # source's mtime ordering is deterministic.
    import time

    src = str(tmp_path / "src")
    by_time = sorted(rows, key=lambda r: r[1])
    slices = [by_time[:4], by_time[4:8], by_time[8:]]
    for i, part in enumerate(slices):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    shutil.rmtree("/tmp/ckpt_geofence", ignore_errors=True)
    q = (
        geofence_transitions_stream(stream, FENCES)
        .writeStream.format("memory")
        .queryName("geofence_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", "/tmp/ckpt_geofence")
        .start()
    )
    q.awaitTermination(180)
    got = _norm(spark.table("geofence_mem"))
    want = _norm(geofence_transitions_batch(df, FENCES))
    assert got == want
    # sanity on the expected story
    u1 = [(z, tr) for (u, _, z, tr) in want if u == 1]
    assert u1 == [(0, "enter"), (0, "exit"), (1, "enter"), (1, "exit")]
    u2 = [(z, tr) for (u, _, z, tr) in want if u == 2]
    assert u2 == [(1, "enter"), (1, "exit")]
    assert not [x for x in want if x[0] == 3]


def test_late_rows_drop_but_batch_boundary_rows_keep(spark, tmp_path):
    # a row at-or-before the user's last processed event time is late:
    # feed batch 1 = [t0, t2], batch 2 = [t1 (late), t3] -> t1 ignored
    base = pd.Timestamp("2024-01-01 00:00:00")

    def at(minutes):
        return (base + pd.Timedelta(minutes=minutes)).to_pydatetime()

    schema = "user_id BIGINT, ts TIMESTAMP, lon DOUBLE, lat DOUBLE"
    b1 = [(9, at(0), -5.0, 5.0), (9, at(20), 5.0, 5.0)]
    b2 = [
        (9, at(10), 15.0, 5.0),  # late: inside box1
        (9, at(30), -5.0, 5.0),
    ]
    import time

    src = str(tmp_path / "src2")
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    time.sleep(1.1)  # deterministic file-source mtime ordering
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    shutil.rmtree("/tmp/ckpt_geofence2", ignore_errors=True)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        geofence_transitions_stream(stream, FENCES)
        .writeStream.format("memory")
        .queryName("geofence_mem2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", "/tmp/ckpt_geofence2")
        .start()
    )
    q.awaitTermination(180)
    got = [(z, tr) for (_, _, z, tr) in _norm(spark.table("geofence_mem2"))]
    # box1 enter from the late row must NOT appear
    assert got == sorted([(0, "enter"), (0, "exit")])
