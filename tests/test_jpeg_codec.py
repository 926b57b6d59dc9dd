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


def smooth_rgb(h=48, w=64):
    y, x = np.mgrid[0:h, 0:w]
    r = np.clip(127 + 60 * np.sin(x / 5.0), 0, 255)
    g = np.clip(127 + 60 * np.cos(y / 6.0), 0, 255)
    b = np.clip(127 + 40 * np.sin((x + y) / 9.0), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


class TestColor:
    """Baseline 3-component YCbCr (r7, VERDICT r6 item 1): a real crawl's
    images are overwhelmingly color JPEG."""

    @pytest.mark.parametrize("sub,max_mae", [("444", 2.0), ("420", 4.0)])
    def test_rgb_round_trip_within_quant_error(self, sub, max_mae):
        from erased_cells_spark.sources.jpeg import jpeg_decode, jpeg_encode_color

        rgb = smooth_rgb()
        out = jpeg_decode(jpeg_encode_color(rgb, 90, subsampling=sub))
        assert out.shape == rgb.shape and out.dtype == np.uint8
        assert np.abs(out.astype(float) - rgb).mean() < max_mae

    def test_luma_is_exact_y_not_rgb_roundtrip(self):
        """jpeg_decode_luma returns the decoded Y plane directly — its
        error vs the BT.601 luma of the source is untouched by chroma
        subsampling (444 and 420 luma identical for identical luma data)."""
        from erased_cells_spark.sources.jpeg import jpeg_decode_luma, jpeg_encode_color

        rgb = smooth_rgb()
        l444 = jpeg_decode_luma(jpeg_encode_color(rgb, 90, subsampling="444"))
        l420 = jpeg_decode_luma(jpeg_encode_color(rgb, 90, subsampling="420"))
        assert np.array_equal(l444, l420)  # same Y blocks, same tables
        ref = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        assert np.abs(l444.astype(float) - ref).mean() < 1.5

    def test_odd_dims_crop(self):
        from erased_cells_spark.sources.jpeg import jpeg_decode, jpeg_encode_color

        rgb = smooth_rgb(37, 51)
        out = jpeg_decode(jpeg_encode_color(rgb, 85))
        assert out.shape == (37, 51, 3)
        assert np.abs(out.astype(float) - rgb).mean() < 5.0

    def test_dhash_stable_through_color_round_trip(self):
        from erased_cells_spark.sources.jpeg import jpeg_decode_luma, jpeg_encode_color

        rgb = smooth_rgb()
        ref = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        h_src = dhash63(np.clip(np.round(ref), 0, 255).astype(np.uint8))
        h_dec = dhash63(jpeg_decode_luma(jpeg_encode_color(rgb, 85)))
        assert bin(h_src ^ h_dec).count("1") <= 3

    def test_gray_decoder_refuses_color(self):
        from erased_cells_spark.sources.jpeg import jpeg_encode_color

        with pytest.raises(JpegFormatError, match="component"):
            jpeg_decode_gray(jpeg_encode_color(smooth_rgb(), 85))

    def test_dispatcher_routes_color_jpeg(self):
        from erased_cells_spark.sources.jpeg import jpeg_decode_luma, jpeg_encode_color

        buf = jpeg_encode_color(smooth_rgb(), 85)
        got = decode_image(buf, 64, 48)
        assert np.array_equal(got, jpeg_decode_luma(buf))

    def test_bad_subsampling_param(self):
        from erased_cells_spark.sources.jpeg import jpeg_encode_color

        with pytest.raises(ValueError, match="subsampling"):
            jpeg_encode_color(smooth_rgb(), 85, subsampling="422")

    def test_progressive_color_rejected(self):
        from erased_cells_spark.sources.jpeg import jpeg_encode_color

        buf = bytearray(jpeg_encode_color(smooth_rgb(), 85))
        i = buf.find(b"\xff\xc0")
        buf[i + 1] = 0xC2
        with pytest.raises(JpegFormatError, match="baseline"):
            decode_image(bytes(buf), 64, 48)

    def test_color_fixture_payloads_decode_to_dims(self):
        rows = [
            r for r in synthetic_media_rows(64, 5)
            if r["kind"] == "image" and r["mime"] == "image/jpeg"
        ]
        # the r7 mix has BOTH gray and color JFIFs
        comps = set()
        for r in rows:
            from erased_cells_spark.sources.jpeg import _decode_components

            h, w, planes = _decode_components(r["payload"])
            comps.add(len(planes))
            assert (h, w) == (r["height"], r["width"])
        assert comps == {1, 3}
