"""MJPEG-AVI container codec contracts (r7): byte round trips through our
own writer, frame timing, fail-loud malformed containers, the
decode_video_frame dispatch (real AVI vs stub fallback), and the video
feature lane end-to-end on real fixtures incl. the quarantine contract."""

import struct

import numpy as np
import pytest

from erased_cells_spark.operators.multimodal import (
    VIDEO_FRAME_H,
    VIDEO_FRAME_W,
    decode_video_frame,
    decode_video_frame_stub,
    extract_video_features,
    media_features_np,
    synthetic_media,
    synthetic_media_rows,
)
from erased_cells_spark.sources.avi import (
    AviFormatError,
    avi_encode_mjpeg,
    avi_frame_index_at,
    avi_frame_jpeg,
    avi_parse,
    is_avi,
)
from erased_cells_spark.sources.jpeg import jpeg_decode_luma, jpeg_encode_gray


def _mk_avi(n_frames=5, fps=4, w=32, h=24, seed=3, quality=90):
    rng = np.random.default_rng(seed)
    planes = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n_frames)]
    frames = [jpeg_encode_gray(p, quality=quality) for p in planes]
    return avi_encode_mjpeg(frames, fps=fps, width=w, height=h), planes, frames


class TestAviContainer:
    def test_round_trip_frame_bytes_identity(self):
        avi, _, frames = _mk_avi()
        assert is_avi(avi)
        meta = avi_parse(avi)
        assert (meta["fps"], meta["width"], meta["height"], meta["n_frames"]) == (
            4.0, 32, 24, 5,
        )
        for i, fr in enumerate(frames):
            assert avi_frame_jpeg(avi, i) == fr  # container adds nothing, loses nothing

    def test_frame_timing_floor_and_clamp(self):
        avi, _, _ = _mk_avi(n_frames=5, fps=4)  # 250 ms per frame
        meta = avi_parse(avi)
        assert avi_frame_index_at(meta, 0) == 0
        assert avi_frame_index_at(meta, 249) == 0
        assert avi_frame_index_at(meta, 250) == 1
        assert avi_frame_index_at(meta, 999) == 3
        assert avi_frame_index_at(meta, 10_000_000) == 4  # clamps to last
        assert avi_frame_index_at(meta, -5) == 0

    def test_odd_sized_frames_word_align(self):
        """Chunks pad to even byte counts; odd-length JPEG payloads must
        survive the walk byte-identically."""
        frames = [b"\xff\xd8" + bytes([i]) * (7 + i) for i in range(4)]  # odd+even mix
        avi = avi_encode_mjpeg(frames, fps=2, width=8, height=8)
        meta = avi_parse(avi)
        assert meta["n_frames"] == 4
        for i, fr in enumerate(frames):
            assert avi_frame_jpeg(avi, i) == fr

    @pytest.mark.parametrize(
        "mangle, msg_part",
        [
            (lambda b: b[:40], "overruns"),
            (lambda b: b"JUNK" + b[4:], "bad magic"),
            (lambda b: b[:8] + b"WAVE" + b[12:], "not 'AVI '"),
            (lambda b: b.replace(b"MJPG", b"H264", 1), "not 'MJPG'"),
            (lambda b: b.replace(b"vids", b"auds", 1), "not 'vids'"),
        ],
    )
    def test_malformed_fail_loud(self, mangle, msg_part):
        avi, _, _ = _mk_avi()
        with pytest.raises(AviFormatError, match=msg_part.replace("'", "'")[:6]):
            avi_parse(mangle(avi))

    def test_total_frames_mismatch_fails(self):
        avi, _, _ = _mk_avi(n_frames=3)
        # lie in avih dwTotalFrames (offset: find 'avih', body starts +8; field 4)
        pos = avi.index(b"avih") + 8 + 16
        bad = avi[:pos] + struct.pack("<I", 99) + avi[pos + 4 :]
        with pytest.raises(AviFormatError, match="dwTotalFrames"):
            avi_parse(bad)

    def test_encoder_validates(self):
        with pytest.raises(AviFormatError, match="at least one frame"):
            avi_encode_mjpeg([], fps=1, width=8, height=8)
        with pytest.raises(AviFormatError, match="fps"):
            avi_encode_mjpeg([b"x"], fps=0, width=8, height=8)


class TestVideoDispatch:
    def test_real_avi_decodes_real_pixels(self):
        avi, planes, _ = _mk_avi(n_frames=4, fps=1)
        for k in range(4):
            got = decode_video_frame(avi, k * 1000, 0, 0)  # dims from stream
            assert got.shape == (24, 32)
            mae = np.abs(got.astype(float) - planes[k].astype(float)).mean()
            assert mae < 12.0, (k, mae)  # the jpeg codec's q90 envelope
        # distinct frames decode to distinct planes
        a = decode_video_frame(avi, 0, 0, 0)
        b = decode_video_frame(avi, 1000, 0, 0)
        assert (a != b).any()

    def test_non_avi_falls_back_to_stub(self):
        raw = b"\x00\x01\x02mp4-ish" * 20
        want = decode_video_frame_stub(raw, 500, VIDEO_FRAME_W, VIDEO_FRAME_H)
        got = decode_video_frame(raw, 500, VIDEO_FRAME_W, VIDEO_FRAME_H)
        assert (want == got).all()

    def test_malformed_avi_raises_value_error(self):
        """Truncated AVI → AviFormatError (a ValueError) → absorbed by the
        quarantine lane, never a crash of the whole job."""
        avi, _, _ = _mk_avi()
        with pytest.raises(ValueError):
            decode_video_frame(avi[:64], 0, 0, 0)


class TestVideoLane:
    def test_fixture_mixes_real_and_stub_containers(self):
        rows = [r for r in synthetic_media_rows(36) if r["kind"] == "video"]
        real = [r for r in rows if is_avi(r["payload"])]
        stub = [r for r in rows if not is_avi(r["payload"])]
        assert real and stub, "fixture must exercise both dispatch paths"
        for r in real:
            meta = avi_parse(r["payload"])
            # 1 fps, one frame per sampled second of the declared duration
            assert meta["n_frames"] == -(-r["duration_ms"] // 1000)

    def test_spark_video_features_match_local_twin(self, spark):
        media = synthetic_media(spark, 36)
        got = {
            r.media_id: (r.n_frames, r.mean_luma)
            for r in extract_video_features(media, errors="strict").collect()
        }
        want = {
            mid: (n, luma)
            for (mid, kind, n, luma) in media_features_np(36)
            if kind == "video"
        }
        assert got == want

    def test_corrupt_avi_quarantines_not_kills(self, spark):
        rows = synthetic_media_rows(36)
        for r in rows:
            if r["kind"] == "video" and is_avi(r["payload"]):
                r["payload"] = r["payload"][:100]  # truncate mid-header
                corrupted = r["media_id"]
                break
        df = spark.createDataFrame(
            [{**r, "payload": bytearray(r["payload"])} for r in rows],
            synthetic_media(spark, 1).schema,
        )
        out = extract_video_features(df, errors="quarantine").collect()
        bad = [r for r in out if r.media_id == corrupted]
        assert len(bad) == 1 and bad[0].error and "AviFormatError" in bad[0].error
        assert bad[0].n_frames is None
        good = [r for r in out if r.media_id != corrupted and r.error is None]
        assert good, "healthy videos still produce features in the same pass"
