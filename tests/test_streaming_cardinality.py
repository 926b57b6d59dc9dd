"""Streaming windowed HLL (streaming/cardinality.py): the stream's
emitted registers AND estimates must equal the batch sketch exactly —
registers are deterministic and merge by max, so micro-batch slicing is
invisible. Also: accuracy vs true distincts, duplicate invariance, and
watermark-closed exactly-once emission."""

import shutil
import time

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.cardinality import hll_estimate, hll_registers
from erased_cells_spark.streaming.cardinality import hll_distinct_stream


def fixture(spark):
    """Two 1-hour windows: w10 has 3000 distinct keys (seen twice each),
    w11 has 800; sentinel far ahead closes both."""
    rows = []
    for rep in range(2):
        for i in range(3000):
            rows.append((f"2024-03-01 10:{(i * 7) % 60:02d}:{(i + rep) % 60:02d}", f"u{i}"))
    for i in range(800):
        rows.append((f"2024-03-01 11:{(i * 11) % 60:02d}:{i % 60:02d}", f"v{i}"))
    data = spark.createDataFrame(rows, "ts_s STRING, k STRING").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k"
    )
    sentinel = spark.createDataFrame(
        [("2024-03-01 20:00:00", "sentinel")], "ts_s STRING, k STRING"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "k")
    return data, sentinel


def run_stream(spark, data, sentinel, tmp_path, p=6):
    src = str(tmp_path / "src")
    data.repartition(5).write.parquet(src)
    time.sleep(1.1)  # sentinel strictly later (oldest-first file source)
    sentinel.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("ts TIMESTAMP, k STRING").option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    shutil.rmtree("/tmp/ckpt_hll", ignore_errors=True)
    q = (
        hll_distinct_stream(stream, p=p)
        .writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", "/tmp/ckpt_hll")
        .start()
    )
    q.awaitTermination(180)
    return spark.table("hll_out").collect()


def test_stream_equals_batch_sketch_exactly(spark, tmp_path):
    data, sentinel = fixture(spark)
    out = run_stream(spark, data, sentinel, tmp_path)
    assert {r["window_start_s"] for r in out} == {
        "2024-03-01 10:00:00",
        "2024-03-01 11:00:00",
    }
    assert len(out) == 2  # exactly-once emission per window
    # batch twin over the same rows, grouped by the same window start
    win = F.window("ts", "1 hour").getField("start")
    grouped = data.select(
        F.date_format(win, "yyyy-MM-dd HH:mm:ss").alias("w"), "k"
    )
    regs = hll_registers(grouped, "k", ["w"])
    batch_regs = {
        (r["w"], r["bucket"]): r["rho"] for r in regs.collect()
    }
    batch_est = {r["w"]: r["hll_estimate_r"] for r in hll_estimate(regs, ["w"]).collect()}
    for r in out:
        w = r["window_start_s"]
        got = dict(zip(r["buckets"], r["rhos"]))
        want = {b: rho for (ww, b), rho in batch_regs.items() if ww == w}
        assert got == want, w  # registers bit-identical
        assert r["hll_estimate_r"] == batch_est[w], w
        # duplicates never moved the sketch: w10 keys were inserted twice
        true_n = 3000 if w.endswith("10:00:00") else 800
        assert abs(r["hll_estimate_r"] - true_n) / true_n < 0.55  # 4-sigma @ m=64
