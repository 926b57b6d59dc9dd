"""Streaming image (dHash) near-dup guard vs its batch twin: planted
byte-identical images drop, originals and replays of the claimer keep,
non-image rows produce no verdicts, and a block COLLISION between far
images never drops (exact hamming verification against the claimer — the
16-bit block space saturates at corpus scale, so claim-collision alone must
not decide). Files fed in event-time order, same harness as the MinHash
guard tests."""

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.multimodal import MEDIA_SCHEMA
from erased_cells_spark.streaming.dedup import (
    _keep_from_sigs_batch,
    guarded_media_keep_stream,
    media_keep_list_batch,
)


def make_media():
    """Batch 1: 12 distinct images + 2 audio rows (no verdicts expected).
    Batch 2: 3 byte-identical copies of images 0/3/6 (new ids), 1 replay of
    image 1 (same id), 2 fresh images."""
    rng = np.random.default_rng(23)
    payloads = [rng.bytes(256) for _ in range(20)]

    def img(mid, payload, ts):
        return {
            "media_id": mid, "kind": "image", "mime": "image/png",
            "payload": bytearray(payload), "width": 32, "height": 24,
            "duration_ms": None, "ts_s": ts,
        }

    first = [img(i, payloads[i], f"2024-03-01 10:{i:02d}:00") for i in range(12)]
    first.append(
        {"media_id": 100, "kind": "audio", "mime": "audio/wav",
         "payload": bytearray(payloads[13]), "width": None, "height": None,
         "duration_ms": 2000, "ts_s": "2024-03-01 10:30:00"}
    )
    second = [
        img(1000 + j, payloads[i], f"2024-03-01 11:{j:02d}:00")
        for j, i in enumerate([0, 3, 6])
    ]
    second.append(img(1, payloads[1], "2024-03-01 11:10:00"))  # claimer replay
    second += [img(50 + i, payloads[14 + i], f"2024-03-01 11:2{i}:00") for i in range(2)]
    return first, second


def write_batches(spark, path, batches):
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(MEDIA_SCHEMA.fields) + [StructField("ts_s", StringType())])
    for i, batch in enumerate(batches):
        sub = os.path.join(path, f"b{i}")
        cols = [f.name for f in MEDIA_SCHEMA.fields]
        df = spark.createDataFrame(batch, schema)
        df.select(*cols, F.col("ts_s").cast("timestamp").alias("ts")).coalesce(
            1
        ).write.parquet(sub)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                os.rename(os.path.join(sub, f), os.path.join(path, f"{i:02d}.parquet"))
        t = time.time() - 100 + i * 5
        os.utime(os.path.join(path, f"{i:02d}.parquet"), (t, t))
    import shutil

    for i in range(len(batches)):
        shutil.rmtree(os.path.join(path, f"b{i}"), ignore_errors=True)


class TestStreamingImageGuard:
    @pytest.fixture(scope="class")
    def run(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("phash_guard")
        src = str(root / "src")
        os.makedirs(src)
        first, second = make_media()
        write_batches(spark, src, [first, second])
        out = str(root / "out")
        ckpt = str(root / "ckpt")
        q = guarded_media_keep_stream(spark, src, out, ckpt, watermark="2 hours")
        q.awaitTermination(300)
        return src, out

    def test_stream_equals_batch_twin(self, spark, run):
        src, out = run
        got = {
            (r.id, r.keep)
            for r in spark.read.parquet(out).select("id", "keep").distinct().collect()
        }
        media = spark.read.parquet(src)
        want = {
            (r.id, r.keep)
            for r in media_keep_list_batch(media).select("id", "keep").distinct().collect()
        }
        assert got == want and len(got) > 0

    def test_planted_semantics(self, spark, run):
        _, out = run
        keep = {
            r.id: r.keep
            for r in spark.read.parquet(out).select("id", "keep").distinct().collect()
        }
        for i in range(12):
            assert keep[str(i)]  # originals keep
        for i in [1000, 1001, 1002]:
            assert not keep[str(i)]  # byte-identical copies drop
        assert keep["1"]  # at-least-once replay of the claimer keeps
        assert "100" not in keep  # audio rows produce no verdicts

    def test_restart_does_not_reemit(self, spark, run, tmp_path_factory):
        """Restarting against the same checkpoint with no new input emits
        nothing new (idempotent recovery)."""
        src, out = run
        n_before = spark.read.parquet(out).count()
        ckpt = str(
            os.path.join(os.path.dirname(out), "ckpt")
        )  # the run fixture's checkpoint
        q = guarded_media_keep_stream(spark, src, out, ckpt, watermark="2 hours")
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == n_before

    def test_block_collision_without_near_dup_keeps_both(self, spark):
        """Far images sharing claimed blocks must BOTH keep: A=0 claims all
        four zero-blocks; B shares chunks 1-3 (zero) but is hamming 5 away
        (> 3) — kept; C is hamming 2 from A — dropped."""
        sigs = spark.createDataFrame(
            [
                ("A", "2024-03-01 10:00:00", 0),
                ("B", "2024-03-01 10:01:00", 0b11111),
                ("C", "2024-03-01 10:02:00", 0b11),
            ],
            "id STRING, ts_s STRING, dhash LONG",
        ).select("id", F.col("ts_s").cast("timestamp").alias("ts"), "dhash")
        keep = {r.id: r.keep for r in _keep_from_sigs_batch(sigs).collect()}
        assert keep == {"A": True, "B": True, "C": False}
