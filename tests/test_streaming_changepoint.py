"""Streaming CUSUM (streaming/changepoint.py): alarm rows from the
stateful stream must equal the batch closed-form twin under micro-batch
slicing that straddles alarm onsets; late rows drop; state survives
batch boundaries exactly (prefix sum/min carried as ints)."""

from __future__ import annotations

import shutil
import time

import pandas as pd

from erased_cells_spark.streaming.changepoint import (
    cusum_alarms_batch,
    cusum_alarms_stream,
)

SCHEMA = "series STRING, ts TIMESTAMP, value BIGINT"
DRIFT, H = 10, 25


def _at(minutes):
    return (pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(minutes=minutes)).to_pydatetime()


def _rows():
    # series A: drifts up, alarms, dips below, re-alarms; B: never alarms
    a_vals = [12, 30, 35, 5, 0, 40, 45, 11]
    rows = [("A", _at(10 * i), v) for i, v in enumerate(a_vals)]
    rows += [("B", _at(10 * i), 9) for i in range(8)]
    return rows


def _norm(df):
    return sorted((r.series, r.ts_s, r.value, r.cusum) for r in df.collect())


def test_stream_equals_batch_across_boundaries(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / "src")
    by_time = sorted(rows, key=lambda r: r[1])
    slices = [by_time[:5], by_time[5:10], by_time[10:]]
    for i, part in enumerate(slices):
        spark.createDataFrame(part, SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        time.sleep(1.1)  # deterministic file-source mtime ordering
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    shutil.rmtree("/tmp/ckpt_cusum", ignore_errors=True)
    q = (
        cusum_alarms_stream(stream, DRIFT, H)
        .writeStream.format("memory")
        .queryName("cusum_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", "/tmp/ckpt_cusum")
        .start()
    )
    q.awaitTermination(180)
    got = _norm(spark.table("cusum_mem"))
    want = _norm(cusum_alarms_batch(df, DRIFT, H))
    assert got == want
    assert got, "fixture must actually alarm"
    assert not [x for x in got if x[0] == "B"]


def test_late_rows_drop(spark, tmp_path):
    b1 = [("A", _at(0), 30), ("A", _at(20), 30)]
    b2 = [("A", _at(10), 1000), ("A", _at(30), 30)]  # late monster ignored
    src = str(tmp_path / "src2")
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    shutil.rmtree("/tmp/ckpt_cusum2", ignore_errors=True)
    q = (
        cusum_alarms_stream(stream, DRIFT, H)
        .writeStream.format("memory")
        .queryName("cusum_mem2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", "/tmp/ckpt_cusum2")
        .start()
    )
    q.awaitTermination(180)
    got = _norm(spark.table("cusum_mem2"))
    # on-time rows only: cusum after (30,30,30) at drift 10 = 20,40,60
    want = _norm(
        cusum_alarms_batch(
            spark.createDataFrame([b1[0], b1[1], b2[1]], SCHEMA), DRIFT, H
        )
    )
    assert got == want
    assert all(r[2] != 1000 for r in got)
