"""Per-record codec error quarantine (r7, VERDICT r6 "What's wrong #2"):
a real crawl's media is guaranteed to contain malformed bytes — one
truncated PNG/progressive JPEG/compressed WAV must not kill the Spark
job. Default mode routes per-record codec failures to rows with NULL
features and a populated `error` column; errors='strict' keeps the r6
fail-loud behavior for engine-owned fixtures."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_audio_features,
    extract_image_features,
    image_dhash,
    media_quarantine,
    synthetic_media_rows,
)


def poisoned_media(spark, n=64):
    """The standard fixture plus four malformed records a crawl would
    contain: a truncated PNG, a progressive-marked JPEG, a compressed
    (ADPCM) WAV, and an empty image payload."""
    rows = [
        {**r, "payload": bytearray(r["payload"])} for r in synthetic_media_rows(n, 5)
    ]
    png = next(r for r in rows if r["mime"] == "image/png")
    jpg = next(r for r in rows if r["mime"] == "image/jpeg")
    trunc = {**png, "media_id": 9001, "payload": png["payload"][:-12]}
    prog = bytearray(jpg["payload"])
    i = bytes(prog).find(b"\xff\xc0")
    prog[i + 1] = 0xC2  # SOF2 progressive
    bad_jpg = {**jpg, "media_id": 9002, "payload": prog}
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # tag 2 = ADPCM
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    bad_wav = {
        "media_id": 9003, "kind": "audio", "mime": "audio/wav",
        "payload": bytearray(b"RIFF" + struct.pack("<I", len(body)) + body),
        "width": None, "height": None, "duration_ms": 1000,
    }
    empty_img = {
        "media_id": 9004, "kind": "image", "mime": "image/png",
        "payload": bytearray(b""), "width": 8, "height": 8, "duration_ms": None,
    }
    return spark.createDataFrame(rows + [trunc, bad_jpg, bad_wav, empty_img], MEDIA_SCHEMA)


class TestImageQuarantine:
    def test_job_completes_and_quarantines(self, spark):
        media = poisoned_media(spark)
        feats = extract_image_features(media, out_size=16)
        bad = {r.media_id: r.error for r in media_quarantine(feats).collect()}
        assert set(bad) == {9001, 9002, 9004}
        assert "PngFormatError" in bad[9001]
        assert "JpegFormatError" in bad[9002] and "baseline" in bad[9002]
        # clean lane unchanged vs a strict run over the clean fixture
        clean = feats.filter(F.col("error").isNull()).drop("error")
        strict_rows = {
            r.media_id: r.mean_luma
            for r in extract_image_features(
                media.filter(F.col("media_id") < 9000), errors="strict"
            ).collect()
        }
        got = {r.media_id: r.mean_luma for r in clean.collect()}
        assert got == strict_rows

    def test_strict_mode_still_fails_loud(self, spark):
        media = poisoned_media(spark)
        with pytest.raises(Exception, match="PngFormatError|JpegFormatError"):
            extract_image_features(media, errors="strict").collect()

    def test_dhash_quarantine(self, spark):
        media = poisoned_media(spark)
        sigs = image_dhash(media)
        bad = {r.media_id for r in sigs.filter(F.col("error").isNotNull()).collect()}
        assert bad == {9001, 9002, 9004}
        good = sigs.filter(F.col("error").isNull())
        assert good.filter(F.col("dhash").isNull()).count() == 0
        n_images = len(
            [r for r in synthetic_media_rows(64, 5) if r["kind"] == "image"]
        )
        assert good.count() == n_images

    def test_bad_errors_param(self, spark):
        media = poisoned_media(spark)
        with pytest.raises(ValueError, match="errors"):
            extract_image_features(media, errors="ignore")


class TestAudioQuarantine:
    def test_compressed_wav_quarantined(self, spark):
        media = poisoned_media(spark)
        feats = extract_audio_features(media)
        bad = {r.media_id: r.error for r in media_quarantine(feats).collect()}
        assert 9003 in bad and "WavFormatError" in bad[9003]
        good = feats.filter(F.col("error").isNull())
        assert good.filter(F.col("rms").isNull()).count() == 0
        assert good.count() == len(
            [r for r in synthetic_media_rows(64, 5) if r["kind"] == "audio"]
        )

    def test_strict_raises(self, spark):
        media = poisoned_media(spark)
        with pytest.raises(Exception, match="WavFormatError"):
            extract_audio_features(media, errors="strict").collect()


class TestQuarantineMetricsShape:
    def test_quarantine_output_is_id_and_error_only(self, spark):
        media = poisoned_media(spark)
        q = media_quarantine(extract_image_features(media))
        assert q.columns == ["media_id", "error"]
        assert q.count() == 3
