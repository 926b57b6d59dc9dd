"""Streaming vs batch equivalence: windowed aggregation output must equal the
(DuckDB-oracle-verified) batch twin; stateful sessionization must reproduce
the batch sessionizer's sessions."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.queries import SPARK_QUERIES
from erased_cells_spark.streaming.events import (
    events_stream,
    sessionize_stream,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def run_stream_to_memory(spark, sdf, name, timeout=120):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/ckpt_{name}")
        .start()
    )
    q.awaitTermination(timeout)
    return spark.table(name)


class TestStreaming:
    def test_windowed_counts_match_batch(self, spark, tmp_path):
        import shutil

        shutil.rmtree("/tmp/ckpt_win", ignore_errors=True)
        stream = events_stream(spark, SF_DIR, max_files=None)
        # complete mode needed for aggregation finality with availableNow+append
        # → use update-free approach: availableNow processes everything, then
        # append emits only watermark-closed windows; with a bounded input we
        # use complete mode into memory instead.
        q = (
            windowed_counts(stream)
            .writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", "/tmp/ckpt_win")
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.hour_s, r.event_type): (r.n, r.sum_value)
            for r in spark.table("win_counts").collect()
        }
        want = {
            (r.hour_s, r.event_type): (r.n, r.sum_value)
            for r in SPARK_QUERIES["events_hourly"](spark, SF_DIR).collect()
        }
        assert got == want and len(want) > 0

    def test_stream_to_snapshot_commits_batches(self, spark, tmp_path):
        import shutil

        from erased_cells_spark.sources.snapshot import SnapshotTable
        from erased_cells_spark.streaming.events import stream_to_snapshot

        shutil.rmtree("/tmp/ckpt_snap_test", ignore_errors=True)
        stream = events_stream(spark, SF_DIR, max_files=None)
        q = stream_to_snapshot(
            stream, str(tmp_path / "tbl"), "snap_test", checkpoint="/tmp/ckpt_snap_test"
        )
        q.awaitTermination(180)
        table = SnapshotTable(str(tmp_path / "tbl"))
        m = table.metrics()
        n_batch = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        assert m["total_rows"] == n_batch
        assert all(k.startswith("batch-") for k in m["partitions"])
        # restart with same checkpoint: no new data → no double-commit
        q2 = stream_to_snapshot(
            events_stream(spark, SF_DIR, max_files=None),
            str(tmp_path / "tbl"), "snap_test2", checkpoint="/tmp/ckpt_snap_test",
        )
        q2.awaitTermination(120)
        assert SnapshotTable(str(tmp_path / "tbl")).metrics()["total_rows"] == n_batch

    def test_sessionize_stream_matches_batch(self, spark):
        import shutil

        shutil.rmtree("/tmp/ckpt_sess", ignore_errors=True)
        stream = events_stream(spark, SF_DIR, max_files=None)
        out = run_stream_to_memory(spark, sessionize_stream(stream), "sess")
        # availableNow + ProcessingTimeTimeout: open sessions at end-of-input
        # stay in state; compare only CLOSED sessions against the batch twin.
        got = {
            (r.user_id, r.session_start_s): r.n_events for r in out.collect()
        }
        batch = SPARK_QUERIES["events_sessionize"](spark, SF_DIR).collect()
        want = {(r.user_id, r.start_s): r.n_events for r in batch}
        # every emitted streaming session must exactly match a batch session
        assert len(got) > 0
        for k, n in got.items():
            assert want.get(k) == n, k
        # and most sessions should have closed (only per-user trailing ones open)
        n_users = len({u for u, _ in want})
        assert len(got) >= len(want) - n_users
