"""DEFLATE-compressed and tiled TIFF layouts (reference delegates every codec
to GDAL — src/gdal/rasterband.rs:90-102; this covers the common GDAL outputs
without the dependency). Fixtures are synthesized by a minimal in-test TIFF
writer so each layout/codec combination is exercised against ground truth."""

import struct
import zlib

import numpy as np
import pytest

from erased_cells_spark.sources.tiff import read_tiff

GDAL_NODATA_TAG = 42113


def write_tiff_bytes(
    arr: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    rows_per_strip: int | None = None,
    nodata: float | None = None,
) -> bytes:
    """Minimal little-endian classic-TIFF writer (single band, single IFD)."""
    endian = "<"
    h, w = arr.shape
    dt = arr.dtype
    kind = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    arr_le = arr.astype(dt.newbyteorder("<"))

    blocks = []
    if tile:
        tw, tl = tile
        for ty in range((h + tl - 1) // tl):
            for tx in range((w + tw - 1) // tw):
                t = np.zeros((tl, tw), dt)
                sub = arr_le[ty * tl : ty * tl + tl, tx * tw : tx * tw + tw]
                t[: sub.shape[0], : sub.shape[1]] = sub
                blocks.append(t)
    else:
        rps = rows_per_strip or h
        blocks = [arr_le[y : y + rps] for y in range(0, h, rps)]

    payloads = []
    for b in blocks:
        if predictor == 2:
            d = b.astype(np.int64)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            b = d.astype(dt)  # horizontal differencing, wraps mod 2^bits
        raw = b.tobytes()
        if compression == 8:
            raw = zlib.compress(raw)
        elif compression == 5:
            raw = lzw_encode(raw)
        elif compression == 32773:
            raw = packbits_encode(raw)
        payloads.append(raw)

    data = b"".join(payloads)
    offsets, counts, pos = [], [], 8
    for p in payloads:
        offsets.append(pos)
        counts.append(len(p))
        pos += len(p)

    tags = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [bits]),
        (259, 3, [compression]),
        (262, 3, [1]),
    ]
    if tile:
        tags += [(322, 4, [tile[0]]), (323, 4, [tile[1]]), (324, 4, offsets), (325, 4, counts)]
    else:
        tags += [
            (273, 4, offsets),
            (277, 3, [1]),
            (278, 4, [rows_per_strip or h]),
            (279, 4, counts),
        ]
    if predictor != 1:
        tags.append((317, 3, [predictor]))
    tags.append((339, 3, [kind]))
    if nodata is not None:
        tags.append((GDAL_NODATA_TAG, 2, f"{nodata:g}".encode("ascii") + b"\0"))
    tags.sort(key=lambda t: t[0])

    ifd_off = 8 + len(data)
    extra_base = ifd_off + 2 + 12 * len(tags) + 4
    extra = bytearray()
    entries = b""
    fmt = {3: "H", 4: "I"}
    for tag, ttype, values in tags:
        if ttype == 2:
            payload, count = values, len(values)
        else:
            count = len(values)
            payload = struct.pack(endian + fmt[ttype] * count, *values)
        if len(payload) <= 4:
            field = payload + b"\0" * (4 - len(payload))
        else:
            field = struct.pack(endian + "I", extra_base + len(extra))
            extra += payload
        entries += struct.pack(endian + "HHI", tag, ttype, count) + field

    header = b"II" + struct.pack(endian + "HI", 42, ifd_off)
    ifd = struct.pack(endian + "H", len(tags)) + entries + struct.pack(endian + "I", 0)
    return header + data + ifd + bytes(extra)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW encoder (test-side twin of sources.tiff._lzw_decode): MSB
    packing, 9→12-bit codes, EARLY CHANGE (width grows when the next free
    code reaches 2^width − 1), clear-and-reset at table code 4094 — the
    libtiff conventions."""
    CLEAR, EOI = 256, 257

    def init():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = init()
    emitted = [(CLEAR, width)]
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emitted.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:
            emitted.append((CLEAR, width))
            table, next_code, width = init()
        w = c
    if w:
        emitted.append((table[w], width))
    emitted.append((EOI, width))
    # pack MSB-first
    acc = 0
    nb = 0
    out = bytearray()
    for code, cw in emitted:
        acc = (acc << cw) | code
        nb += cw
        while nb >= 8:
            out.append((acc >> (nb - 8)) & 0xFF)
            nb -= 8
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Simple PackBits encoder: runs ≥ 3 as replicate runs, rest literal."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i
            lit = bytearray()
            while j < n and len(lit) < 128:
                run = 1
                while j + run < n and run < 3 and data[j + run] == data[j]:
                    run += 1
                if run >= 3:
                    break
                lit += data[j : j + 1]
                j += 1
            out += bytes([len(lit) - 1]) + lit
            i = j
    return bytes(out)


@pytest.fixture()
def rng():
    return np.random.default_rng(17)


def roundtrip(tmp_path, arr, **kw):
    p = str(tmp_path / "t.tiff")
    with open(p, "wb") as f:
        f.write(write_tiff_bytes(arr, **kw))
    return p, read_tiff(p)


class TestCodecs:
    def test_deflate_strips_uint16(self, tmp_path, rng):
        arr = rng.integers(0, 65536, size=(60, 50), dtype=np.uint16)
        _, band = roundtrip(tmp_path, arr, compression=8, rows_per_strip=16, nodata=7)
        assert np.array_equal(band.array, arr)
        assert band.nodata == 7.0

    def test_deflate_with_predictor_uint8(self, tmp_path, rng):
        arr = rng.integers(0, 256, size=(33, 41), dtype=np.uint8)
        _, band = roundtrip(tmp_path, arr, compression=8, predictor=2, rows_per_strip=8)
        assert np.array_equal(band.array, arr)

    def test_deflate_with_predictor_int16_negative(self, tmp_path, rng):
        arr = rng.integers(-32768, 32768, size=(20, 20), dtype=np.int16)
        _, band = roundtrip(tmp_path, arr, compression=8, predictor=2)
        assert np.array_equal(band.array, arr)

    def test_tiled_uncompressed_partial_edge_tiles(self, tmp_path, rng):
        arr = rng.integers(0, 256, size=(40, 35), dtype=np.uint8)
        _, band = roundtrip(tmp_path, arr, tile=(16, 16))
        assert np.array_equal(band.array, arr)

    def test_tiled_deflate_predictor(self, tmp_path, rng):
        arr = rng.integers(0, 1 << 30, size=(37, 29), dtype=np.uint32)
        _, band = roundtrip(tmp_path, arr, compression=8, predictor=2, tile=(16, 8))
        assert np.array_equal(band.array, arr)

    def test_deflate_float32(self, tmp_path, rng):
        arr = rng.standard_normal((25, 30)).astype(np.float32)
        _, band = roundtrip(tmp_path, arr, compression=8, rows_per_strip=7)
        assert np.array_equal(band.array, arr)

    def test_predictor_on_float_raises(self, tmp_path, rng):
        arr = rng.standard_normal((8, 8)).astype(np.float32)
        p = str(tmp_path / "bad.tiff")
        with open(p, "wb") as f:
            f.write(write_tiff_bytes(arr, compression=8, predictor=2))
        with pytest.raises(ValueError, match="predictor"):
            read_tiff(p)

    def test_windowed_read_on_tiled_deflate(self, tmp_path, rng):
        arr = rng.integers(0, 65536, size=(48, 64), dtype=np.uint16)
        p, _ = roundtrip(tmp_path, arr, compression=8, tile=(16, 16))
        sub = read_tiff(p, window=(5, 9), window_size=(20, 12))
        assert np.array_equal(sub.array, arr[9:21, 5:25])

    def test_property_roundtrip_all_layouts(self, tmp_path):
        """Hypothesis-style sweep (seeded, deterministic): random shapes ×
        dtypes × layout × codec × predictor must round-trip bit-exactly."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        dtypes = [np.uint8, np.uint16, np.int16, np.uint32, np.float32]

        @settings(max_examples=40, deadline=None)
        @given(
            h=st.integers(1, 40),
            w=st.integers(1, 40),
            dt=st.sampled_from(range(len(dtypes))),
            comp=st.sampled_from([1, 8]),
            pred=st.sampled_from([1, 2]),
            layout=st.sampled_from(["strip", "strip8", "tile"]),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(h, w, dt, comp, pred, layout, seed):
            dtype = dtypes[dt]
            if pred == 2 and dtype is np.float32:
                return  # integer-only predictor (raise-tested separately)
            r = np.random.default_rng(seed)
            if dtype is np.float32:
                arr = r.standard_normal((h, w)).astype(np.float32)
            else:
                info = np.iinfo(dtype)
                arr = r.integers(info.min, int(info.max) + 1, size=(h, w), dtype=dtype)
            kw = {"compression": comp, "predictor": pred}
            if layout == "tile":
                kw["tile"] = (16, 16)
            elif layout == "strip8":
                kw["rows_per_strip"] = 8
            p = str(tmp_path / "prop.tiff")
            with open(p, "wb") as f:
                f.write(write_tiff_bytes(arr, **kw))
            band = read_tiff(p)
            assert band.array.dtype == arr.dtype
            assert np.array_equal(band.array, arr)

        check()

    def test_unsupported_compression_still_raises(self, tmp_path, rng):
        arr = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        p = str(tmp_path / "jpeg.tiff")
        with open(p, "wb") as f:
            f.write(write_tiff_bytes(arr, compression=1))
        raw = bytearray(open(p, "rb").read())
        # flip the compression SHORT (tag 259) to JPEG (7) in place
        i = raw.find(struct.pack("<HHI", 259, 3, 1))
        raw[i + 8 : i + 10] = struct.pack("<H", 7)
        with open(p, "wb") as f:
            f.write(bytes(raw))
        with pytest.raises(ValueError, match="compression"):
            read_tiff(p)


class TestLzwPackbits:
    """LZW (compression 5) + PackBits (32773), r4 parity tail (VERDICT r3
    item 7; reference delegates to GDAL — src/gdal/rasterband.rs:90-102)."""

    def test_lzw_known_vector(self):
        """Hand-derived spec vector: encode([7,7,7,8]) with early change →
        CLEAR,7,258,8,EOI at 9 bits = 80 01 E0 40 88 08; decode inverts."""
        from erased_cells_spark.sources.tiff import _lzw_decode

        enc = lzw_encode(bytes([7, 7, 7, 8]))
        assert enc == bytes([0x80, 0x01, 0xE0, 0x40, 0x88, 0x08])
        assert _lzw_decode(enc) == bytes([7, 7, 7, 8])

    def test_lzw_width_growth_and_clear(self):
        """> 4094 table entries forces every code width 9→12 AND a mid-stream
        CLEAR + table reset; random bytes have little repetition, driving
        fast table growth."""
        from erased_cells_spark.sources.tiff import _lzw_decode

        data = np.random.default_rng(3).integers(0, 256, 60_000, dtype=np.uint8).tobytes()
        assert _lzw_decode(lzw_encode(data)) == data

    def test_lzw_strips_uint16_predictor(self, tmp_path, rng):
        arr = rng.integers(0, 65536, size=(60, 50), dtype=np.uint16)
        _, band = roundtrip(tmp_path, arr, compression=5, predictor=2, rows_per_strip=16)
        assert np.array_equal(band.array, arr)

    def test_lzw_tiled_float32(self, tmp_path, rng):
        arr = rng.standard_normal((37, 29)).astype(np.float32)
        _, band = roundtrip(tmp_path, arr, compression=5, tile=(16, 16))
        assert np.array_equal(band.array, arr)

    def test_packbits_runs_and_literals(self, tmp_path, rng):
        # long runs (favors replicate) + noise (favors literal)
        arr = np.zeros((40, 64), dtype=np.uint8)
        arr[:20] = 200
        arr[20:] = rng.integers(0, 256, size=(20, 64), dtype=np.uint8)
        _, band = roundtrip(tmp_path, arr, compression=32773, rows_per_strip=8)
        assert np.array_equal(band.array, arr)

    def test_codec_matrix_sweep(self, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            h=st.integers(1, 40), w=st.integers(1, 40),
            comp=st.sampled_from([5, 32773]),
            layout=st.sampled_from(["strip", "strip8", "tile"]),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(h, w, comp, layout, seed):
            r = np.random.default_rng(seed)
            arr = r.integers(0, 256, size=(h, w), dtype=np.uint8)
            kw = {"compression": comp}
            if layout == "tile":
                kw["tile"] = (16, 16)
            elif layout == "strip8":
                kw["rows_per_strip"] = 8
            p = str(tmp_path / "m.tiff")
            with open(p, "wb") as f:
                f.write(write_tiff_bytes(arr, **kw))
            assert np.array_equal(read_tiff(p).array, arr)

        check()


class TestCubicResample:
    def test_cubic_reproduces_linear_fields_exactly(self, tmp_path):
        """The Keys a=-0.5 kernel reproduces degree-1 polynomials exactly —
        a plane stays a plane under cubic resampling (interior pixels;
        edges clamp)."""
        h, w = 32, 48
        yy, xx = np.mgrid[0:h, 0:w]
        arr = (2.0 * xx + 3.0 * yy + 1.0).astype(np.float64)
        p = str(tmp_path / "c.tiff")
        with open(p, "wb") as f:
            f.write(write_tiff_bytes(arr.astype(np.float32)))
        out = read_tiff(
            p, window=(0, 0), window_size=(w, h), size=(w * 2, h * 2), resample="cubic"
        ).array
        # interior: exact linear interpolation values
        ys = (np.arange(h * 2) + 0.5) * h / (h * 2) - 0.5
        xs = (np.arange(w * 2) + 0.5) * w / (w * 2) - 0.5
        want = 2.0 * xs[None, :] + 3.0 * ys[:, None] + 1.0
        assert np.allclose(out[4:-4, 4:-4], want[4:-4, 4:-4], atol=1e-4)

    def test_cubic_constant_field_and_int_clip(self, tmp_path):
        arr = np.full((16, 16), 250, dtype=np.uint8)
        p = str(tmp_path / "c2.tiff")
        with open(p, "wb") as f:
            f.write(write_tiff_bytes(arr))
        out = read_tiff(
            p, window=(0, 0), window_size=(16, 16), size=(40, 40), resample="cubic"
        ).array
        assert out.dtype == np.uint8
        assert np.all(out == 250)  # constants survive; overshoot clips in-range

    def test_unknown_resample_raises(self, tmp_path, rng):
        arr = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        p = str(tmp_path / "c3.tiff")
        with open(p, "wb") as f:
            f.write(write_tiff_bytes(arr))
        with pytest.raises(ValueError, match="resample"):
            read_tiff(p, window=(0, 0), window_size=(8, 8), size=(4, 4), resample="lanczos")
