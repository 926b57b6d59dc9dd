"""Checked band-nodata ingestion + windowed/resampled TIFF reads.

Reference analogs: GdalND→NoData conversion (src/gdal/mod.rs:47-70) and
read_cells(window, window_size, size) (src/gdal/rasterband.rs:37-43,82-103).
"""

import numpy as np
import pytest

from erased_cells_spark.cells.celltype import CellType
from erased_cells_spark.cells.errors import NoDataConversionError
from erased_cells_spark.cells.nodata import NoData
from erased_cells_spark.sources.tiff import band_to_masked, read_tiff

GOLD = "/root/reference/testkit/data"


class TestNoDataFromFloat:
    def test_none_is_none(self):
        for ct in CellType:
            nd = NoData.from_float(ct, None)
            assert nd.mode == "none" and nd.sentinel() is None

    def test_float_types_take_value_verbatim(self):
        nd = NoData.from_float(CellType.Float64, -9999.5)
        assert nd.mode == "value" and nd.sentinel() == -9999.5
        # NaN is a valid float sentinel (reference: nd.to_f64() = Some(NaN))
        nd = NoData.from_float(CellType.Float32, float("nan"))
        assert np.isnan(float(nd.sentinel()))

    def test_integral_in_range_truncates_toward_zero(self):
        # num-traits ToPrimitive semantics: range-check then `as`-truncate
        assert NoData.from_float(CellType.Int16, -32768.0).sentinel() == -32768
        assert NoData.from_float(CellType.UInt8, 254.9).sentinel() == 254
        assert NoData.from_float(CellType.Int32, -0.7).sentinel() == 0

    @pytest.mark.parametrize(
        ("ct", "bad"),
        [
            (CellType.UInt8, 256.0),
            (CellType.UInt8, -1.0),
            (CellType.Int16, 1e9),
            (CellType.UInt64, -0.5),  # trunc(-0.5) = 0 is in range — NOT an error
        ],
    )
    def test_out_of_range_raises(self, ct, bad):
        if ct is CellType.UInt64 and bad == -0.5:
            assert NoData.from_float(ct, bad).sentinel() == 0
            return
        with pytest.raises(NoDataConversionError) as ei:
            NoData.from_float(ct, bad)
        assert ei.value.value == bad and ei.value.dst is ct

    def test_nan_inf_unrepresentable_in_ints(self):
        for bad in (float("nan"), float("inf"), float("-inf")):
            with pytest.raises(NoDataConversionError):
                NoData.from_float(CellType.Int32, bad)


class TestWindowedRead:
    def test_full_window_equals_plain_read(self):
        full = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff")
        win = read_tiff(
            f"{GOLD}/L8-Elkton-VA-B4.tiff",
            window=(0, 0),
            window_size=(full.width, full.height),
            size=(full.width, full.height),
        )
        assert np.array_equal(full.array, win.array)

    def test_subwindow_is_the_exact_slice(self):
        full = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff")
        sub = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff", window=(7, 11), window_size=(30, 20))
        assert (sub.width, sub.height) == (30, 20)
        assert np.array_equal(sub.array, full.array[11:31, 7:37])

    def test_downsample_nearest_pixel_center(self):
        full = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff")
        small = read_tiff(
            f"{GOLD}/L8-Elkton-VA-B4.tiff",
            window=(0, 0),
            window_size=(full.width, full.height),
            size=(full.width // 2, full.height // 2),
        )
        # GDAL NearestNeighbour: src = floor((i + 0.5) * src/dst)
        ys = np.minimum(
            ((np.arange(full.height // 2) + 0.5) * full.height / (full.height // 2)).astype(int),
            full.height - 1,
        )
        xs = np.minimum(
            ((np.arange(full.width // 2) + 0.5) * full.width / (full.width // 2)).astype(int),
            full.width - 1,
        )
        assert np.array_equal(small.array, full.array[ys][:, xs])

    def test_upsample_replicates(self):
        sub = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff", window=(0, 0), window_size=(4, 4), size=(8, 8))
        assert (sub.width, sub.height) == (8, 8)
        base = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff", window=(0, 0), window_size=(4, 4))
        assert np.array_equal(sub.array[::2, ::2], base.array)  # centers hit each source pixel

    def test_bilinear_upsample_hand_checked(self):
        """2×2 → 4×4 bilinear with pixel-center mapping, checked by hand:
        out coords map to src {-0.25, 0.25, 0.75, 1.25}, so weights are
        {edge, 1/4, 3/4, edge} along each axis."""
        from erased_cells_spark.sources.tiff import _bilinear

        arr = np.array([[0.0, 10.0], [20.0, 30.0]])
        out = _bilinear(arr, 4, 4)
        want = np.array(
            [
                [0.0, 2.5, 7.5, 10.0],
                [5.0, 7.5, 12.5, 15.0],
                [15.0, 17.5, 22.5, 25.0],
                [20.0, 22.5, 27.5, 30.0],
            ]
        )
        assert np.allclose(out, want)
        # integer band: GDAL rounds half AWAY FROM ZERO (floor(x + 0.5)),
        # not banker's rint — 2.5 → 3, 7.5 → 8 (ADVICE r3)
        out_i = _bilinear(arr.astype(np.uint16), 4, 4)
        assert out_i.dtype == np.uint16
        assert np.array_equal(out_i, np.floor(want + 0.5).astype(np.uint16))
        assert out_i[0, 1] == 3  # the case rint would get wrong (2.5 → 2)

    def test_bilinear_downsample_golden_matches_local_average_map(self):
        """bilinear through read_tiff on the golden band: exact 2× downsample
        with pixel-center mapping lands every output at the center of a 2×2
        block — the value must be the mean of that block."""
        full = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff")
        h2, w2 = full.height // 2, full.width // 2
        small = read_tiff(
            f"{GOLD}/L8-Elkton-VA-B4.tiff",
            window=(0, 0),
            window_size=(w2 * 2, h2 * 2),
            size=(w2, h2),
            resample="bilinear",
        )
        blocks = full.array[: h2 * 2, : w2 * 2].astype(np.float64)
        means = blocks.reshape(h2, 2, w2, 2).mean(axis=(1, 3))
        want = np.floor(means + 0.5)  # GDAL integer rounding: half away from zero
        assert np.array_equal(small.array.astype(np.float64), want)

    def test_bilinear_identity_size_is_plain_read(self):
        full = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff")
        same = read_tiff(
            f"{GOLD}/L8-Elkton-VA-B4.tiff",
            window=(0, 0),
            window_size=(full.width, full.height),
            size=(full.width, full.height),
            resample="bilinear",
        )
        assert np.array_equal(full.array, same.array)

    def test_unknown_resample_raises(self):
        with pytest.raises(ValueError, match="resample"):
            read_tiff(
                f"{GOLD}/L8-Elkton-VA-B4.tiff",
                window=(0, 0),
                window_size=(4, 4),
                size=(8, 8),
                resample="lanczos",
            )

    def test_out_of_bounds_window_raises(self):
        full = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff")
        with pytest.raises(ValueError):
            read_tiff(
                f"{GOLD}/L8-Elkton-VA-B4.tiff",
                window=(full.width - 2, 0),
                window_size=(5, 5),
            )


class TestBandToMasked:
    def test_b5_nd_golden_masks_4_cells(self):
        # the reference's own golden: B5-nd has exactly 4 nodata cells
        band = read_tiff(f"{GOLD}/L8-Elkton-VA-B5-nd.tiff")
        m = band_to_masked(band)
        data, nodata = m.counts()
        assert nodata == 4 and data + nodata == band.width * band.height

    def test_band_without_nodata_is_all_valid(self):
        band = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff")
        m = band_to_masked(band)
        data, nodata = m.counts()
        assert nodata == 0 and data == band.width * band.height

    def test_unrepresentable_band_nodata_raises(self):
        band = read_tiff(f"{GOLD}/L8-Elkton-VA-B4.tiff")
        band.nodata = 1e12  # not representable in the band's u16 lanes
        with pytest.raises(NoDataConversionError):
            band_to_masked(band)
