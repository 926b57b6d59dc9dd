"""Streaming MinHash near-dup guard vs its batch twin: planted near-dups
drop, originals and at-least-once replays keep, restart does not re-emit,
short docs produce no verdicts. Files are fed in event-time order (explicit
mtimes) so the stream's arrival-order claims equal the batch twin's global
(ts, id)-order claims."""

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.streaming.dedup import guarded_keep_stream, keep_list_batch

VOCAB = [f"w{i:03d}" for i in range(300)]


def make_docs():
    """(url, ts_s, text) rows: 20 distinct bases, 5 near-dups (1 word
    changed), 2 exact replays of kept bases, 1 too-short doc."""
    rng = np.random.default_rng(11)
    rows = []
    base_texts = {}
    for i in range(20):
        words = list(rng.choice(VOCAB, 30, replace=False))
        base_texts[i] = " ".join(words)
        rows.append((f"base-{i:02d}", f"2024-03-01 10:{i:02d}:00", base_texts[i]))
    dups = []
    for j, i in enumerate([2, 5, 8, 11, 14]):
        words = base_texts[i].split(" ")
        words[15] = "CHANGED"
        dups.append((f"dup-{i:02d}", f"2024-03-01 11:{j:02d}:00", " ".join(words)))
    replays = [rows[3], rows[7]]  # exact at-least-once duplicates of bases
    short = [("short-1", "2024-03-01 11:30:00", "too short")]
    return rows, dups + replays + short


def write_batches(spark, path, batches):
    """One parquet file per batch, mtimes strictly increasing so the file
    stream processes them in event order."""
    for i, batch in enumerate(batches):
        sub = os.path.join(path, f"b{i}")
        spark.createDataFrame(batch, "url STRING, ts_s STRING, text STRING").select(
            "url", F.col("ts_s").cast("timestamp").alias("ts"), "text"
        ).coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                os.rename(os.path.join(sub, f), os.path.join(path, f"{i:02d}.parquet"))
        t = time.time() - 100 + i * 5
        os.utime(os.path.join(path, f"{i:02d}.parquet"), (t, t))
    import shutil

    for i in range(len(batches)):
        shutil.rmtree(os.path.join(path, f"b{i}"), ignore_errors=True)


class TestStreamingNearDupGuard:
    @pytest.fixture(scope="class")
    def run(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("neardup")
        src = str(root / "src")
        os.makedirs(src)
        first, second = make_docs()
        write_batches(spark, src, [first, second])
        out = str(root / "out")
        ckpt = str(root / "ckpt")
        q = guarded_keep_stream(spark, src, out, ckpt, watermark="2 hours")
        q.awaitTermination(300)
        return src, out, ckpt, first, second

    def test_stream_equals_batch_twin(self, spark, run):
        src, out, _, first, second = run
        got = {
            (r.url, r.keep)
            for r in spark.read.parquet(out)
            .select(F.col("id").alias("url"), "keep")
            .distinct()
            .collect()
        }
        docs = spark.read.parquet(src)
        want = {
            (r.id, r.keep) for r in keep_list_batch(docs).select("id", "keep").distinct().collect()
        }
        assert got == want and len(got) > 0

    def test_planted_semantics(self, spark, run):
        _, out, *_ = run
        keep = {r.id: r.keep for r in spark.read.parquet(out).select("id", "keep").distinct().collect()}
        for i in range(20):
            assert keep[f"base-{i:02d}"] is True  # originals keep
        for i in [2, 5, 8, 11, 14]:
            assert keep[f"dup-{i:02d}"] is False  # near-dups drop
        assert "short-1" not in keep  # < 3 words: no shingles, no verdict

    def test_replays_stay_kept(self, spark, run):
        """At-least-once replay of a kept doc keeps BOTH occurrences (the
        claim stores the claimer id; replayed claimer rows are still first)."""
        _, out, *_ = run
        rows = spark.read.parquet(out).filter(F.col("id").isin(["base-03", "base-07"])).collect()
        assert len(rows) == 4  # each base emitted once per occurrence
        assert all(r.keep for r in rows)

    def test_restart_is_idempotent(self, spark, run):
        src, out, ckpt, *_ = run
        n_before = spark.read.parquet(out).count()
        q = guarded_keep_stream(
            spark, src, out, ckpt, watermark="2 hours", query_name="neardup_guard2"
        )
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == n_before
