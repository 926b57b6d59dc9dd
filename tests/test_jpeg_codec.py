"""Baseline JFIF grayscale codec (r6): the lossy half of the real-image
story (PNG is the lossless half). Contracts: encode→decode round-trips
within quantization error at several qualities (MAE bounds — JPEG is
lossy by design, never bit equality); non-multiple-of-8 dims crop
correctly; dHash is stable through a lossy round trip on smooth images;
out-of-scope streams (progressive, multi-component, DRI, truncation)
fail loudly; the dispatcher routes JPEG magic to the real decoder; mixed
PNG+JPEG fixtures all decode to their metadata dims."""

import numpy as np
import pytest

from erased_cells_spark.operators.multimodal import (
    decode_image,
    dhash63,
    synthetic_media_rows,
)
from erased_cells_spark.sources.jpeg import (
    JPEG_MAGIC,
    JpegFormatError,
    jpeg_decode_gray,
    jpeg_encode_gray,
)


def smooth_img(h=48, w=64, phase=0.0):
    y, x = np.mgrid[0:h, 0:w]
    return np.clip(127 + 60 * np.sin(x / 5.0 + phase) * np.cos(y / 7.0), 0, 255).astype(
        np.uint8
    )


class TestRoundTrip:
    @pytest.mark.parametrize("quality,max_mae", [(95, 1.0), (85, 1.5), (50, 3.0)])
    def test_smooth_within_quant_error(self, quality, max_mae):
        img = smooth_img()
        dec = jpeg_decode_gray(jpeg_encode_gray(img, quality))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < max_mae

    def test_non_multiple_of_8_dims_crop(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(33, 41), dtype=np.uint8)
        dec = jpeg_decode_gray(jpeg_encode_gray(img, 90))
        assert dec.shape == (33, 41)
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 8.0

    def test_one_block_and_tiny_images(self):
        for shape in [(8, 8), (1, 1), (3, 11)]:
            img = np.full(shape, 190, dtype=np.uint8)
            dec = jpeg_decode_gray(jpeg_encode_gray(img, 85))
            assert dec.shape == shape
            assert np.abs(dec.astype(float) - 190).max() <= 2

    def test_dhash_stable_through_lossy_round_trip(self):
        img = smooth_img()
        rt = jpeg_decode_gray(jpeg_encode_gray(img, 85))
        assert bin(dhash63(img) ^ dhash63(rt)).count("1") <= 2
        far = smooth_img(phase=2.1)
        assert bin(dhash63(rt) ^ dhash63(far)).count("1") > 10


class TestFailLoud:
    def test_bad_magic(self):
        with pytest.raises(JpegFormatError, match="magic"):
            jpeg_decode_gray(b"\x89PNG not a jpeg")

    def test_truncated(self):
        buf = jpeg_encode_gray(smooth_img(), 85)
        with pytest.raises(JpegFormatError):
            jpeg_decode_gray(buf[:30])  # cut inside the headers

    def test_multi_component_rejected(self):
        """Patch the SOF0 component count to 3 — must refuse, not
        mis-decode."""
        buf = bytearray(jpeg_encode_gray(smooth_img(), 85))
        i = buf.find(b"\xff\xc0")
        assert i > 0
        # SOF0 payload: len(2) prec(1) h(2) w(2) ncomp(1)
        assert buf[i + 9] == 1
        buf[i + 9] = 3
        with pytest.raises(JpegFormatError, match="component"):
            jpeg_decode_gray(bytes(buf))

    def test_progressive_rejected(self):
        buf = bytearray(jpeg_encode_gray(smooth_img(), 85))
        i = buf.find(b"\xff\xc0")
        buf[i + 1] = 0xC2  # SOF2 progressive
        with pytest.raises(JpegFormatError, match="baseline"):
            jpeg_decode_gray(bytes(buf))


class TestDispatcherAndFixtures:
    def test_dispatcher_routes_jpeg_magic(self):
        img = smooth_img()
        buf = jpeg_encode_gray(img, 90)
        got = decode_image(buf, 1, 1)  # hint ignored: dims from SOF0
        assert got.shape == img.shape
        assert np.abs(got.astype(float) - img.astype(float)).mean() < 1.5

    def test_fixture_mix_and_dims(self):
        rows = [r for r in synthetic_media_rows(64) if r["kind"] == "image"]
        mimes = {r["mime"] for r in rows}
        assert mimes == {"image/png", "image/jpeg"}
        for r in rows:
            if r["mime"] == "image/jpeg":
                assert bytes(r["payload"][:2]) == JPEG_MAGIC
            img = decode_image(r["payload"], 1, 1)
            assert img.shape == (r["height"], r["width"])


class TestPropertyRoundTrip:
    """Hypothesis: ANY uint8 plane survives encode→decode with bounded
    error (lossy, but dims exact and error within the quantization
    envelope even on pure noise — the worst case for DCT coding)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    # quality → MAE ceiling, calibrated over 400 random planes (worst
    # observed: q50 24.1 — heavy quantization on tiny noise blocks padded
    # into an 8×8 DCT — q85 6.6, q95 2.2) with ~1.5× headroom
    BOUNDS = {50: 36.0, 85: 11.0, 95: 4.0}

    @staticmethod
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        q=st.sampled_from([50, 85, 95]),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=40, deadline=None)
    def test_any_plane_bounded_error(h, w, q, seed):
        rng = np.random.Generator(np.random.PCG64(seed))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        dec = jpeg_decode_gray(jpeg_encode_gray(img, q))
        assert dec.shape == (h, w)
        mae = np.abs(dec.astype(float) - img.astype(float)).mean()
        assert mae < TestPropertyRoundTrip.BOUNDS[q]
