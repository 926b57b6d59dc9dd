"""Multimodal plumbing: schema, batching, determinism, stub-decode contract."""

import numpy as np
import pytest

from erased_cells_spark.cells import CellBuffer, CellType
from erased_cells_spark.operators.multimodal import (
    decode_image_stub,
    decode_video_frame_stub,
    extract_image_features,
    extract_video_features,
    frame_sample_offsets,
    media_features_np,
    resize_nearest,
    synthetic_media,
)


class TestMultimodal:
    def test_feature_extraction_shapes_and_determinism(self, spark):
        media = synthetic_media(spark, 64)
        out = extract_image_features(media, out_size=16)
        rows = out.collect()
        # only image rows survive; every tile is a 16×16 UInt8 erased-cells buffer
        assert len(rows) == sum(1 for i in range(64) if i % 3 == 0)
        for r in rows:
            assert r.cell_type == "UInt8" and r.cols == 16 and r.rows == 16
            buf = CellBuffer.from_bytes(r.data, CellType.UInt8)
            assert len(buf) == 256
            assert r.mean_luma == f"{buf.data.astype(np.float64).mean():.6f}"
        # deterministic across runs
        again = {r.media_id: r.data for r in extract_image_features(media, 16).collect()}
        for r in rows:
            assert again[r.media_id] == r.data

    def test_resize_nearest(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        small = resize_nearest(img, 4, 4)
        assert small.shape == (4, 4)
        assert small[0, 0] == img[0, 0] and small[3, 3] == img[6, 6]
        big = resize_nearest(img, 16, 16)
        assert big.shape == (16, 16) and big[0, 0] == img[0, 0]

    def test_frame_sampling(self):
        assert list(frame_sample_offsets(3500, 1000)) == [0, 1000, 2000, 3000]
        assert len(frame_sample_offsets(0)) == 0

    def test_stub_contract(self):
        a = decode_image_stub(b"payload", 8, 6)
        assert a.shape == (6, 8) and a.dtype == np.uint8
        assert (a == decode_image_stub(b"payload", 8, 6)).all()  # deterministic
        with pytest.raises(NotImplementedError):
            decode_image_stub(b"", 8, 8)

    def test_video_frame_stub_contract(self):
        f0 = decode_video_frame_stub(b"payload", 0, 8, 6)
        f1 = decode_video_frame_stub(b"payload", 1000, 8, 6)
        assert f0.shape == (6, 8) and f0.dtype == np.uint8
        assert not (f0 == f1).all()  # distinct frames at distinct offsets
        assert (f0 == decode_video_frame_stub(b"payload", 0, 8, 6)).all()
        with pytest.raises(NotImplementedError):
            decode_video_frame_stub(b"", 0, 8, 8)

    def test_video_features_match_local_twin(self, spark):
        media = synthetic_media(spark, 64)
        got = {r.media_id: (r.n_frames, r.mean_luma) for r in extract_video_features(media).collect()}
        want = {
            mid: (nf, luma) for mid, kind, nf, luma in media_features_np() if kind == "video"
        }
        assert got == want
        # frame plan drives the decode count: 4000+i*250 ms → 4 + i//4 frames
        assert got[2][0] == len(frame_sample_offsets(4000 + 2 * 250, 1000))

    def test_audio_features_match_local_twin(self, spark):
        from erased_cells_spark.operators.multimodal import (
            AUDIO_SAMPLE_RATE,
            extract_audio_features,
        )

        media = synthetic_media(spark, 64)
        got = {r.media_id: (r.n_samples, r.rms) for r in extract_audio_features(media).collect()}
        want = {
            mid: (ns, rms) for mid, kind, ns, rms in media_features_np() if kind == "audio"
        }
        assert got == want and len(got) > 0
        # duration drives the sample count: 4000+i*250 ms at 8 kHz
        assert got[1][0] == (4000 + 1 * 250) * AUDIO_SAMPLE_RATE // 1000

    def test_audio_stub_contract(self):
        from erased_cells_spark.operators.multimodal import decode_audio_stub

        x = decode_audio_stub(b"payload", 1000)
        assert x.shape == (8000,) and x.dtype == np.int16
        assert (x == decode_audio_stub(b"payload", 1000)).all()  # deterministic
        with pytest.raises(NotImplementedError):
            decode_audio_stub(b"", 1000)

    def test_zero_duration_media_skipped_on_both_paths(self, spark):
        """ADVICE r2: the distributed operators and the local oracle twin must
        agree on degenerate input — duration_ms <= 0 produces NO feature row
        on EITHER path (video would otherwise np.stack an empty list)."""
        import pandas as pd

        from erased_cells_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_audio_features,
        )

        rows = [
            {"media_id": 0, "kind": "video", "mime": "video/mp4",
             "payload": bytearray(b"x" * 64), "width": None, "height": None, "duration_ms": 0},
            {"media_id": 1, "kind": "audio", "mime": "audio/wav",
             "payload": bytearray(b"y" * 64), "width": None, "height": None, "duration_ms": 0},
            {"media_id": 2, "kind": "video", "mime": "video/mp4",
             "payload": bytearray(b"z" * 64), "width": None, "height": None, "duration_ms": 1500},
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        vid = extract_video_features(df).collect()
        aud = extract_audio_features(df).collect()
        assert [r.media_id for r in vid] == [2]  # zero-duration video dropped
        assert aud == []  # zero-duration audio dropped
        # the local twin applies the same convention (media_features_np skips
        # duration <= 0) — asserted directly on its video branch
        from erased_cells_spark.operators.multimodal import frame_sample_offsets

        assert len(frame_sample_offsets(0)) == 0


class TestImageDhash:
    def test_dhash_gradient_locality(self):
        """The property that makes dHash a NEAR-dup hash (provable even with
        the stub codec, which can only emit exact duplicates): flipping a few
        pixels of a plane flips only the gradient bits they touch, so the
        hamming distance is small; an unrelated plane lands ~32 bits away."""
        import numpy as np

        from erased_cells_spark.operators.multimodal import dhash63

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
        h0 = dhash63(img)
        assert 0 <= h0 < 1 << 63
        near = img.copy()
        near[10, 10] = 255 - near[10, 10]  # one pixel edit
        d_near = bin(h0 ^ dhash63(near)).count("1")
        assert d_near <= 3  # a pixel affects at most its resize bucket's gradients
        other = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
        d_other = bin(h0 ^ dhash63(other)).count("1")
        assert d_other > 15  # unrelated planes are far

    def test_identical_payloads_hash_identically(self):
        from erased_cells_spark.operators.multimodal import decode_image_stub, dhash63

        a = dhash63(decode_image_stub(b"payload-bytes", 32, 24))
        b = dhash63(decode_image_stub(b"payload-bytes", 32, 24))
        assert a == b

    def test_image_dhash_matches_driver_twin(self, spark):
        from erased_cells_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            image_dhash,
            media_dhash_np,
            phash_fixture_rows,
        )

        rows = [
            {**r, "payload": bytearray(r["payload"])} for r in phash_fixture_rows(64, seed=5)
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = sorted((r.media_id, r.dhash) for r in image_dhash(df).collect())
        assert got == sorted(media_dhash_np())
        # planted copies share their source's hash exactly
        hashes = dict(got)
        assert hashes[1000] == hashes[0] == hashes[2000]


class TestAudioSpectral:
    def test_sine_wave_physics(self):
        """A pure 1 kHz tone at 8 kHz: centroid ≈ 1000 Hz, rolloff at/above
        the centroid, zcr ≈ 2·f/rate — the descriptors mean what they say."""
        from erased_cells_spark.operators.multimodal import audio_spectral_np

        rate, f, n = 8000, 1000.0, 8000
        t = np.arange(n) / rate
        x = (20000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
        zcr, cent, roll = audio_spectral_np(x, rate)
        assert abs(cent - f) < 25.0
        assert roll >= cent - 1.0
        assert abs(zcr - 2 * f / rate) < 0.01

    def test_dc_offset_not_a_zero_hz_tone(self):
        from erased_cells_spark.operators.multimodal import audio_spectral_np

        rate = 8000
        x = np.full(4000, 5000, dtype=np.int16)  # pure DC
        zcr, cent, roll = audio_spectral_np(x, rate)
        assert zcr == 0.0 and cent == 0.0 and roll == 0.0

    def test_spark_matches_local_reference(self, spark):
        from erased_cells_spark.operators.multimodal import (
            audio_spectral_np,
            extract_audio_spectral,
            synthetic_media,
            synthetic_media_rows,
        )
        from erased_cells_spark.sources.wav import WAV_MAGIC, wav_decode_mono

        media = synthetic_media(spark, 36)
        got = {
            r.media_id: (r.n_samples, r.zcr, r.spectral_centroid_hz, r.spectral_rolloff_hz)
            for r in extract_audio_spectral(media, errors="strict").collect()
        }
        want = {}
        for r in synthetic_media_rows(36):
            if r["kind"] != "audio" or (r["duration_ms"] or 0) <= 0:
                continue
            assert bytes(r["payload"][:4]) == WAV_MAGIC  # fixtures are real WAVs
            rate, x = wav_decode_mono(r["payload"])
            zcr, cent, roll = audio_spectral_np(x, rate)
            want[r["media_id"]] = (
                len(x), f"{zcr:.6f}", f"{cent:.6f}", f"{roll:.6f}"
            )
        assert got == want and got

    def test_corrupt_wav_quarantines(self, spark):
        from erased_cells_spark.operators.multimodal import (
            extract_audio_spectral,
            media_quarantine,
            synthetic_media,
            synthetic_media_rows,
        )

        rows = synthetic_media_rows(36)
        victim = next(r for r in rows if r["kind"] == "audio")
        victim["payload"] = victim["payload"][:20]  # truncated RIFF
        df = spark.createDataFrame(
            [{**r, "payload": bytearray(r["payload"])} for r in rows],
            synthetic_media(spark, 1).schema,
        )
        out = extract_audio_spectral(df)
        q = {r.media_id: r.error for r in media_quarantine(out).collect()}
        assert set(q) == {victim["media_id"]} and "WavFormatError" in q[victim["media_id"]]
        clean = out.filter(out.error.isNull()).count()
        assert clean > 0
