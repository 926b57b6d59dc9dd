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

    def test_late_event_beyond_watermark_is_dropped(self, spark, tmp_path):
        """Multi-trigger watermark semantics: an event arriving in a later
        micro-batch with event time older than the current watermark must NOT
        appear in the appended window output (it would raise hour-00's count
        from 2 to 3 if counted)."""
        import os
        import shutil

        import pandas as pd

        src = str(tmp_path / "late_src")
        os.makedirs(src)

        def add_file(name, rows, mtime):
            pdf = pd.DataFrame(
                {
                    "ts": pd.to_datetime([r[0] for r in rows]),
                    "event_type": [r[1] for r in rows],
                    "value": [r[2] for r in rows],
                }
            )
            tmp = str(tmp_path / f"stage_{name}")
            spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
            dst = os.path.join(src, name)
            shutil.move(os.path.join(tmp, part), dst)
            os.utime(dst, (mtime, mtime))  # file order = trigger order

        # batch 0: hour-00 has 2 events; 03:30 drives the watermark to 01:30
        add_file("f1.parquet", [
            ("2025-06-01 00:10:00", "a", 1.0),
            ("2025-06-01 00:40:00", "a", 1.0),
            ("2025-06-01 03:30:00", "a", 1.0),
        ], mtime=1_000_000)
        # batch 1 (watermark 01:30 > hour-00 end): hour-00 closes and is
        # EMITTED with its 2 on-time rows; watermark advances to 02:30
        add_file("f2.parquet", [
            ("2025-06-01 04:30:00", "a", 1.0),
        ], mtime=2_000_000)
        # batch 2: 00:45 arrives AFTER its window was emitted — append-mode
        # watermark semantics require the row to be dropped on the floor
        add_file("f3.parquet", [
            ("2025-06-01 00:45:00", "a", 1.0),
            ("2025-06-01 05:30:00", "a", 1.0),
        ], mtime=3_000_000)

        schema = "ts TIMESTAMP, event_type STRING, value DOUBLE"
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        shutil.rmtree("/tmp/ckpt_late", ignore_errors=True)
        q = (
            windowed_counts(stream)
            .writeStream.format("memory")
            .queryName("late_counts")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", "/tmp/ckpt_late")
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.hour_s, r.event_type): r.n for r in spark.table("late_counts").collect()
        }
        # hour 00 closed with the 2 ON-TIME events; the late 00:45 row is
        # absent (it would read 3 had the watermark not dropped it)
        assert got[("2025-06-01 00", "a")] == 2
        # hours 03/04/05 are still above the final watermark → withheld
        assert set(got) == {("2025-06-01 00", "a")}

    def test_stream_stream_join_matches_batch(self, spark):
        """Watermarked stream-stream purchase⋈view attribution join equals
        the identical join on the static table (availableNow drain)."""
        import shutil

        from erased_cells_spark.streaming.events import purchases_join_views_stream

        shutil.rmtree("/tmp/ckpt_ssj", ignore_errors=True)
        stream = events_stream(spark, SF_DIR, max_files=None)
        out = run_stream_to_memory(
            spark, purchases_join_views_stream(stream), "ssj", timeout=180
        )
        got = {(r.user_id, r.p_id, r.v_id) for r in out.collect()}
        e = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        p = e.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
        )
        v = e.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("v_id"),
            F.col("ts").alias("v_ts"),
        )
        want = {
            (r.user_id, r.p_id, r.v_id)
            for r in p.join(
                v,
                (F.col("user_id") == F.col("v_user"))
                & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour"))
                & (F.col("v_ts") <= F.col("p_ts")),
            ).collect()
        }
        assert got == want and len(want) > 0

    def test_streaming_dedup_drops_cross_batch_replays(self, spark, tmp_path):
        """At-least-once ingest: the same event_id replayed in a LATER
        micro-batch (within the watermark window) must be emitted exactly
        once — the streaming twin of batch dropDuplicates."""
        import os
        import shutil

        import pandas as pd

        from erased_cells_spark.streaming.events import dedupe_stream

        src = str(tmp_path / "dup_src")
        os.makedirs(src)

        def add_file(name, rows, mtime):
            pdf = pd.DataFrame(
                {
                    "event_id": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows]),
                    "v": [r[2] for r in rows],
                }
            )
            tmp = str(tmp_path / f"stage_{name}")
            spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
            dst = os.path.join(src, name)
            shutil.move(os.path.join(tmp, part), dst)
            os.utime(dst, (mtime, mtime))

        add_file("f1.parquet", [
            (1, "2025-06-01 00:00:00", "a"),
            (2, "2025-06-01 00:05:00", "b"),
            (2, "2025-06-01 00:05:00", "b"),  # in-batch duplicate
        ], mtime=1_000_000)
        add_file("f2.parquet", [
            (1, "2025-06-01 00:00:00", "a"),  # cross-batch replay
            (3, "2025-06-01 00:10:00", "c"),
        ], mtime=2_000_000)

        schema = "event_id LONG, ts TIMESTAMP, v STRING"
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        shutil.rmtree("/tmp/ckpt_dedup_stream", ignore_errors=True)
        out = run_stream_to_memory(spark, dedupe_stream(stream), "dedup_stream")
        got = sorted((r.event_id, r.v) for r in out.collect())
        assert got == [(1, "a"), (2, "b"), (3, "c")]

    def test_sessionize_replay_event_time_semantics(self, spark, tmp_path):
        """Replay/backfill semantics (r2 verdict item): with EVENT-time
        timeouts, (a) a session spanning two micro-batches with a small
        EVENT gap is NOT split, regardless of wall-clock between triggers,
        and (b) a user whose events stopped is closed by the WATERMARK
        advancing (via other users' events), not by wall-clock waiting."""
        import os
        import shutil

        import pandas as pd

        src = str(tmp_path / "sess_src")
        os.makedirs(src)

        def add_file(name, rows, mtime):
            pdf = pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows]),
                }
            )
            tmp = str(tmp_path / f"stage_{name}")
            spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
            dst = os.path.join(src, name)
            shutil.move(os.path.join(tmp, part), dst)
            os.utime(dst, (mtime, mtime))  # file order = trigger order

        # batch 0: u100 starts a session; u200's event sets the watermark pace
        add_file("f1.parquet", [
            (100, "2025-06-01 00:00:00"),
            (100, "2025-06-01 00:10:00"),
            (200, "2025-06-01 00:20:00"),
        ], mtime=1_000_000)
        # batch 1: u100 continues with a 10-min EVENT gap (same session —
        # must NOT split at the trigger boundary); u200 jumps to 01:30,
        # pushing the watermark to 01:20 ≫ u100's last+gap (00:50)
        add_file("f2.parquet", [
            (100, "2025-06-01 00:20:00"),
            (200, "2025-06-01 01:30:00"),
        ], mtime=2_000_000)
        # batch 2: the watermark (01:20) now closes u100's session via
        # EVENT-time timeout; u200's in-data gap closes its first two
        add_file("f3.parquet", [
            (200, "2025-06-01 02:30:00"),
        ], mtime=3_000_000)

        schema = "user_id LONG, ts TIMESTAMP"
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        shutil.rmtree("/tmp/ckpt_sess_replay", ignore_errors=True)
        out = run_stream_to_memory(
            spark, sessionize_stream(stream), "sess_replay", timeout=180
        )
        got = {
            (r.user_id, r.session_start_s): r.n_events for r in out.collect()
        }
        # u100: ONE session of 3 events (00:00, 00:10, 00:20) closed by the
        # watermark — not two sessions split at the trigger boundary
        assert got[(100, "2025-06-01 00:00:00")] == 3
        assert not any(u == 100 and s != "2025-06-01 00:00:00" for u, s in got)
        # u200: gap-closed singleton sessions at 00:20 and 01:30; 02:30 open
        assert got[(200, "2025-06-01 00:20:00")] == 1
        assert got[(200, "2025-06-01 01:30:00")] == 1
        assert (200, "2025-06-01 02:30:00") not in got

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

    def test_stream_stream_left_join_matches_batch(self, spark, tmp_path):
        """LEFT OUTER stream-stream attribution: organic purchases (no view
        in the window) emit with NULL v_id once the watermark proves no
        match can arrive — total output equals the batch LEFT join. A
        far-future sentinel file (later mtime -> processed last) drives
        the final watermark past every real event so no row stays
        withheld in state."""
        import shutil
        import time as _time

        from erased_cells_spark.streaming.events import (
            purchases_left_join_views_stream,
        )

        e = spark.read.parquet(f"{SF_DIR}/events.parquet")
        src = str(tmp_path / "ev_src")
        # ONE data file: the fixture spans a month, so slicing it across
        # micro-batches would make most rows late vs the 2h watermark and
        # the comparison would (correctly) diverge — arrival order is the
        # contract under test only for the sentinel tail
        e.coalesce(1).write.parquet(src)
        # two sentinel files in successively-later batches: the first
        # raises the watermark past every real event, the second forces
        # one MORE micro-batch in which the join state evicts and the
        # final unmatched-left null rows emit (outer emission runs a
        # batch BEHIND the watermark raise). Each sentinel carries BOTH
        # event types: the join's global watermark is the MIN of the
        # purchase-side and view-side watermarks, so a view-only sentinel
        # would leave the purchase side pinned at the real data's tail
        # and the last purchases would never evict (found the hard way).
        for i, ts_s in enumerate(["2099-01-01 00:00:00", "2099-01-02 00:00:00"]):
            _time.sleep(1.1)
            spark.createDataFrame(
                [(999990 + 2 * i, ts_s, 1, "view", 0.0, "{}"),
                 (999991 + 2 * i, ts_s, 1, "purchase", 0.0, "{}")],
                "event_id LONG, ts_s STRING, user_id LONG, event_type STRING, value DOUBLE, props STRING",
            ).select(
                "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value", "props",
            ).coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
        ).option("maxFilesPerTrigger", 1).parquet(src)  # 1: the two
        # sentinels must land in SEPARATE micro-batches for the
        # raise-then-evict sequence to happen
        shutil.rmtree("/tmp/ckpt_ssj_left", ignore_errors=True)
        out = run_stream_to_memory(
            spark, purchases_left_join_views_stream(stream), "ssj_left", timeout=180
        )
        got = {
            (r.user_id, r.p_id, r.v_id)
            for r in out.collect()
            if r.p_id < 999990  # sentinel purchases are harness plumbing
        }
        ee = e.withColumn("ts", F.col("ts").cast("timestamp"))
        p = ee.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
        )
        v = ee.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("v_id"),
            F.col("ts").alias("v_ts"),
        )
        want = {
            (r.user_id, r.p_id, r.v_id)
            for r in p.join(
                v,
                (F.col("user_id") == F.col("v_user"))
                & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour"))
                & (F.col("v_ts") <= F.col("p_ts")),
                "leftOuter",
            ).select("user_id", "p_id", "v_id").collect()
        }
        assert got == want
        organic = [x for x in got if x[2] is None]
        assert len(organic) > 0  # the rows the inner join silently drops
