"""Streaming spatial-temporal proximity join (streaming/proximity.py):
stream == batch twin under availableNow, with qualifying pairs straddling
micro-batch boundaries (the stream-stream state hand-off under test), and
the time band excluding co-located but hours-apart events."""

from __future__ import annotations

import shutil
import time

import pandas as pd
import pytest


def _at(minutes):
    return (
        pd.Timestamp("2024-03-01 00:00:00") + pd.Timedelta(minutes=minutes)
    ).to_pydatetime()


SCHEMA = "event_id BIGINT, ts TIMESTAMP, lon DOUBLE, lat DOUBLE"


def _rows():
    rows = []
    # cluster A: three events within ~60 km and 15 min -> 3 pairs
    rows += [
        (1, _at(0), 10.0, 45.0),
        (2, _at(5), 10.3, 45.2),
        (3, _at(15), 10.6, 45.1),
    ]
    # same place, 3 hours later: beyond the 30-min gap -> no pair with A
    rows += [(4, _at(180), 10.1, 45.05)]
    # within 10 min of cluster A but ~1000 km away -> no pair
    rows += [(5, _at(7), 22.0, 50.0)]
    # antimeridian pair within gap -> 1 pair
    rows += [(6, _at(40), 179.8, -10.0), (7, _at(55), -179.9, -10.1)]
    return rows


def _norm(rows):
    return sorted((r.id_a, r.id_b, round(r.dist_km, 6)) for r in rows)


def test_stream_equals_batch(spark, tmp_path):
    from erased_cells_spark.streaming.proximity import (
        proximity_pairs_batch,
        proximity_pairs_stream,
    )

    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    want = _norm(proximity_pairs_batch(df, 150.0, 30.0).collect())
    # the fixture's story, pinned
    assert [(a, b) for a, b, _ in want] == [(1, 2), (1, 3), (2, 3), (6, 7)]

    # three time-sliced files -> pairs (1,3), (2,3), (6,7) straddle batches
    src = str(tmp_path / "prox")
    by_time = sorted(rows, key=lambda r: r[1])
    slices = [by_time[:3], by_time[3:5], by_time[5:]]
    for i, part in enumerate(slices):
        spark.createDataFrame(part, SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        time.sleep(1.1)  # deterministic file-source mtime ordering

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    shutil.rmtree("/tmp/ckpt_proximity", ignore_errors=True)
    q = (
        proximity_pairs_stream(stream, 150.0, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("prox_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", "/tmp/ckpt_proximity")
        .start()
    )
    q.awaitTermination(180)
    got = _norm(spark.table("prox_mem").collect())
    assert got == want


def test_rejects_bad_radius(spark):
    from erased_cells_spark.streaming.proximity import proximity_pairs_stream

    with pytest.raises(ValueError):
        proximity_pairs_stream(None, 0.0)
