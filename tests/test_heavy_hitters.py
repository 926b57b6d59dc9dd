"""Streaming Misra-Gries heavy hitters vs the exact batch twin: the three
summary guarantees (undercount-only, error within the emitted budget, no
false negatives above the budget), O(m) state, pure-python merge
properties under arbitrary merge orders, and watermark-closed emission."""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.streaming.heavyhitters import (
    heavy_hitters_batch,
    heavy_hitters_stream,
    mg_merge,
)


def zipf_fixture(spark):
    """Two 1-hour windows of zipf-ish tokens; the sentinel (a far-ahead
    window that pushes the watermark past both) is returned SEPARATELY so
    tests can stage it with a later file mtime — the file source processes
    oldest-first, and a sentinel arriving early would mark the real data
    late and drop it."""
    rng = np.random.default_rng(5)
    rows = []
    for base in ("2024-03-01 10", "2024-03-01 11"):
        toks = rng.zipf(1.35, size=6000) % 400  # skewed, vocab ~400
        for z in toks:
            sec = int(rng.integers(0, 3600))
            rows.append((f"{base}:{sec//60:02d}:{sec%60:02d}", f"tok{int(z)}"))
    def to_df(rs):
        return spark.createDataFrame(rs, "ts_s STRING, token STRING").select(
            F.col("ts_s").cast("timestamp").alias("ts"), "token"
        )
    return to_df(rows), to_df([("2024-03-01 20:00:00", "sentinel")])


def test_mg_merge_properties():
    rng = np.random.default_rng(9)
    stream = [f"t{int(x) % 50}" for x in rng.zipf(1.3, size=5000)]
    for m in (4, 8, 16):
        # arbitrary chunking (merge order) never breaks the guarantees
        for n_chunks in (1, 7, 23):
            counter, dec = {}, 0
            for chunk in np.array_split(np.array(stream), n_chunks):
                vals, cnts = np.unique(chunk, return_counts=True)
                counter, d = mg_merge(counter, dict(zip(vals.tolist(), cnts.tolist())), m)
                dec += d
            assert len(counter) <= m
            exact = {}
            for t in stream:
                exact[t] = exact.get(t, 0) + 1
            n = len(stream)
            assert dec <= n // (m + 1)
            for t, est in counter.items():
                assert est <= exact[t] <= est + dec, (t, est, exact[t], dec)
            for t, c in exact.items():
                if c > dec:
                    assert t in counter, (t, c, dec, m)


def test_mg_merge_validation():
    with pytest.raises(ValueError):
        mg_merge({}, {"a": 1}, 0)


class TestHeavyHittersStream:
    def _run(self, spark, data_df, sentinel_df, tmp_path, m):
        import time

        src = str(tmp_path / "src")
        data_df.repartition(6).write.parquet(src)
        # the watermark delay (2h) covers the fixture's full arrival
        # disorder (random order within a 2h span), so no data row is ever
        # late; the sentinel lands in a strictly-later file (oldest-first
        # source) and closes both windows at the end
        time.sleep(1.1)
        sentinel_df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("ts TIMESTAMP, token STRING").option(
            "maxFilesPerTrigger", 2
        ).parquet(src)
        shutil.rmtree("/tmp/ckpt_hh", ignore_errors=True)
        q = (
            heavy_hitters_stream(stream, m=m, window="1 hour", watermark="2 hours")
            .writeStream.format("memory")
            .queryName("hh_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", "/tmp/ckpt_hh")
            .start()
        )
        q.awaitTermination(180)
        return spark.table("hh_out").collect()

    def test_guarantees_vs_exact_batch(self, spark, tmp_path):
        m = 8
        df, sentinel = zipf_fixture(spark)
        rows = self._run(spark, df, sentinel, tmp_path, m)
        closed = {r["window_start_s"] for r in rows}
        assert closed == {"2024-03-01 10:00:00", "2024-03-01 11:00:00"}
        exact = {
            (r["window_start_s"], r["token"]): (r["n"], r["total"])
            for r in heavy_hitters_batch(df).collect()
        }
        by_win: dict = {}
        for r in rows:
            by_win.setdefault(r["window_start_s"], []).append(r)
        for w, out in by_win.items():
            assert len(out) <= m  # O(m) summary
            dec = out[0]["err_bound"]
            total = out[0]["window_total"]
            true_total = next(v[1] for (ws, _), v in exact.items() if ws == w)
            assert total == true_total  # totals are tracked exactly
            assert dec <= total // (m + 1)
            for r in out:
                t_true = exact[(w, r["token"])][0]
                assert r["est_count"] <= t_true <= r["est_count"] + dec
            got_tokens = {r["token"] for r in out}
            for (ws, tok), (n, _) in exact.items():
                if ws == w and n > dec:
                    assert tok in got_tokens, (w, tok, n, dec)

    def test_heavy_token_always_surfaces(self, spark, tmp_path):
        # one token is >50% of a window: it MUST be in any m>=1 summary
        rows = [("2024-03-01 10:00:05", "whale")] * 400 + [
            (f"2024-03-01 10:{i%60:02d}:{(i*7)%60:02d}", f"minnow{i}") for i in range(300)
        ]
        df = spark.createDataFrame(rows, "ts_s STRING, token STRING").select(
            F.col("ts_s").cast("timestamp").alias("ts"), "token"
        )
        sentinel = spark.createDataFrame(
            [("2024-03-01 20:00:00", "sentinel")], "ts_s STRING, token STRING"
        ).select(F.col("ts_s").cast("timestamp").alias("ts"), "token")
        out = self._run(spark, df, sentinel, tmp_path, m=4)
        w10 = [r for r in out if r["window_start_s"] == "2024-03-01 10:00:00"]
        whale = [r for r in w10 if r["token"] == "whale"]
        assert whale and whale[0]["est_count"] >= 400 - w10[0]["err_bound"]
