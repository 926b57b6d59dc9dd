"""Minimal pure-numpy TIFF band reader.

Scope: what the golden files need plus the common GDAL outputs (single-band,
single-IFD, little- or big-endian, 8/16/32-bit int or float samples,
GDAL_NODATA ascii tag), in STRIP or TILED layout, uncompressed,
DEFLATE/zlib (compression 8 / legacy 32946), LZW (5, early-change
convention), or PackBits (32773), with the optional
horizontal-differencing predictor (tag 317 = 2); resampling: nearest,
bilinear, cubic (Keys a=-0.5, GDAL's CubicConvolution). This replaces the
reference's GDAL dependency for tests only (reference:
src/gdal/rasterband.rs:37-126 delegates all codecs to GDAL); the engine
proper produces rasters by rasterizing vectors, not file scans.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}

GDAL_NODATA_TAG = 42113


@dataclass
class TiffBand:
    width: int
    height: int
    array: np.ndarray  # shape (height, width)
    nodata: float | None


def _read_tag_values(buf, endian, ttype, count, value_field):
    size = _TYPE_SIZES[ttype] * count
    if size <= 4:
        raw = value_field[:size]
    else:
        (off,) = struct.unpack(endian + "I", value_field)
        raw = buf[off : off + size]
    if ttype == 3:
        return list(struct.unpack(endian + "H" * count, raw))
    if ttype == 4:
        return list(struct.unpack(endian + "I" * count, raw))
    if ttype == 2:  # ascii
        return raw.split(b"\0")[0].decode("ascii", "replace")
    if ttype == 1:
        return list(raw)
    return raw


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (compression 5): MSB-first variable-width codes, 9→12 bits,
    ClearCode 256 / EOI 257, with the TIFF 'early change' convention (the
    code width grows when the table reaches 2^width − 1, one code EARLIER
    than vanilla LZW — the libtiff/GDAL behavior)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    width = 9
    table: list[bytes] = []
    prev = b""

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return EOI
        byte0 = bitpos // 8
        window = int.from_bytes(data[byte0 : byte0 + 3].ljust(3, b"\0"), "big")
        shift = 24 - (bitpos - byte0 * 8) - width
        bitpos += width
        return (window >> shift) & ((1 << width) - 1)

    singles = [bytes([i]) for i in range(256)]
    while True:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            table = singles + [b"", b""]
            width = 9
            code = read_code()
            if code == EOI:
                break
            if code >= len(table):
                raise ValueError("LZW: bad first code after clear")
            prev = table[code]
            out += prev
            continue
        if not table:
            raise ValueError("LZW: stream does not start with a clear code")
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW: code {code} beyond table size {len(table)}")
        out += entry
        table.append(prev + entry[:1])
        prev = entry
        # EARLY CHANGE alignment: the decoder's table lags the encoder's
        # next_code by one (it learns entry n only from the code AFTER the
        # one that created it), so the width must grow at 2^width − 2 — one
        # append earlier than vanilla LZW's 2^width − 1 — to stay in step
        # with an encoder that switches at next_code == 2^width − 1.
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF PackBits (compression 32773): byte-oriented RLE."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: noop
    return bytes(out[:expected])


def _cubic(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """GDAL-style cubic-convolution resample (Keys kernel, a = −0.5 — the
    CubicConvolution GDAL uses), separable 4-tap with pixel-center mapping
    and edge clamping; integer bands round half away from zero and clip to
    the dtype range (cubic overshoots)."""
    a = -0.5

    def weights(t: np.ndarray) -> np.ndarray:
        d = np.abs(np.stack([t + 1.0, t, 1.0 - t, 2.0 - t]))
        return np.where(
            d <= 1.0,
            (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0,
            np.where(d < 2.0, a * d**3 - 5.0 * a * d**2 + 8.0 * a * d - 4.0 * a, 0.0),
        )

    h, w = arr.shape
    src = arr.astype(np.float64)
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.floor(y).astype(np.int64)
    x0 = np.floor(x).astype(np.int64)
    wy = weights(y - y0)  # (4, out_h)
    wx = weights(x - x0)  # (4, out_w)
    tmp = np.zeros((out_h, w))
    for kk in range(4):
        rows = np.clip(y0 - 1 + kk, 0, h - 1)
        tmp += src[rows] * wy[kk][:, None]
    out = np.zeros((out_h, out_w))
    for kk in range(4):
        cols = np.clip(x0 - 1 + kk, 0, w - 1)
        out += tmp[:, cols] * wx[kk][None, :]
    if np.issubdtype(arr.dtype, np.integer):
        info = np.iinfo(arr.dtype)
        return np.clip(np.floor(out + 0.5), info.min, info.max).astype(arr.dtype)
    return out.astype(arr.dtype)


def _bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """GDAL-style bilinear resample with pixel-center mapping and edge
    replication: src coordinate = (i + 0.5)·src/dst − 0.5; integer bands
    round to nearest (GDAL's convention for integer outputs)."""
    h, w = arr.shape
    src = arr.astype(np.float64)
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(y - y0, 0.0, 1.0)[:, None]
    wx = np.clip(x - x0, 0.0, 1.0)[None, :]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(arr.dtype, np.integer):
        # GDAL rounds integer outputs half AWAY FROM ZERO (floor(x + 0.5) for
        # the non-negative raster range), not banker's half-to-even — np.rint
        # would differ from real GDAL output on exact .5 interpolants
        return np.floor(out + 0.5).astype(arr.dtype)
    return out.astype(arr.dtype)


def read_tiff(
    path: str,
    window: tuple[int, int] | None = None,
    window_size: tuple[int, int] | None = None,
    size: tuple[int, int] | None = None,
    resample: str = "nearest",
) -> TiffBand:
    """Read a band, optionally a sub-window with resampling.

    Mirrors the reference's `read_cells(window, window_size, size, resample)`
    (src/gdal/rasterband.rs:37-43,82-103): `window` is the (x, y) offset from
    the top-left, `window_size` the (w, h) source extent, `size` the output
    buffer (w, h) — when it differs from window_size the source region is
    resampled with `resample` ∈ {"nearest" (GDAL default NearestNeighbour:
    src_idx = floor((i + 0.5) · src/dst)), "bilinear"}. Defaults read the
    full band."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        endian = "<"
    elif buf[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    magic, ifd_off = struct.unpack(endian + "HI", buf[2:8])
    assert magic == 42, "classic TIFF only"
    (n_tags,) = struct.unpack(endian + "H", buf[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n_tags):
        e = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack(endian + "HHI", buf[e : e + 8])
        tags[tag] = _read_tag_values(buf, endian, ttype, count, buf[e + 8 : e + 12])

    width, height = tags[256][0], tags[257][0]
    bits = tags.get(258, [8])[0]
    compression = tags.get(259, [1])[0]
    # none | LZW | DEFLATE | legacy deflate | PackBits
    if compression not in (1, 5, 8, 32946, 32773):
        raise ValueError(f"unsupported compression {compression}")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    sample_format = tags.get(339, [1])[0]  # 1 uint, 2 int, 3 float
    kind = {1: "u", 2: "i", 3: "f"}[sample_format]
    dtype = np.dtype(f"{endian}{kind}{bits // 8}")
    if predictor == 2 and kind == "f":
        raise ValueError("predictor 2 (horizontal differencing) is integer-only")

    def decode_block(off: int, cnt: int, rows: int, cols: int) -> np.ndarray:
        raw = buf[off : off + cnt]
        if compression in (8, 32946):
            raw = zlib.decompress(raw)
        elif compression == 5:
            raw = _lzw_decode(raw)
        elif compression == 32773:
            raw = _packbits_decode(raw, rows * cols * dtype.itemsize)
        block = np.frombuffer(raw, dtype=dtype, count=rows * cols).reshape(rows, cols)
        if predictor == 2:  # horizontal differencing: undo per row
            block = np.cumsum(block.astype(np.int64), axis=1).astype(dtype)
        return block

    if 322 in tags:  # tiled layout (TileWidth/TileLength/TileOffsets/Counts)
        tw, tl = tags[322][0], tags[323][0]
        t_offsets, t_counts = tags[324], tags[325]
        tiles_across = (width + tw - 1) // tw
        arr = np.zeros((height, width), dtype=dtype)
        for ti, (off, cnt) in enumerate(zip(t_offsets, t_counts)):
            ty, tx = divmod(ti, tiles_across)
            tile = decode_block(off, cnt, tl, tw)  # tiles are always full-size
            y0, x0 = ty * tl, tx * tw
            h_in, w_in = min(tl, height - y0), min(tw, width - x0)
            arr[y0 : y0 + h_in, x0 : x0 + w_in] = tile[:h_in, :w_in]
    else:
        offsets = tags[273]
        counts = tags[279]
        rows_per_strip = tags.get(278, [height])[0]
        rows_out = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rows_per_strip, height - si * rows_per_strip)
            rows_out.append(decode_block(off, cnt, nrows, width))
        arr = np.vstack(rows_out)
    arr = arr.astype(dtype.newbyteorder("="))

    if window is not None:
        wx, wy = window
        ww, wh = window_size if window_size is not None else (width - wx, height - wy)
        if not (0 <= wx and 0 <= wy and wx + ww <= width and wy + wh <= height and ww > 0 and wh > 0):
            raise ValueError(f"window {(wx, wy)}+{(ww, wh)} outside raster {(width, height)}")
        arr = arr[wy : wy + wh, wx : wx + ww]
        if size is not None and size != (ww, wh):
            out_w, out_h = size
            if resample == "nearest":
                ys = np.minimum(((np.arange(out_h) + 0.5) * wh / out_h).astype(np.int64), wh - 1)
                xs = np.minimum(((np.arange(out_w) + 0.5) * ww / out_w).astype(np.int64), ww - 1)
                arr = arr[ys][:, xs]
            elif resample == "bilinear":
                arr = _bilinear(arr, out_h, out_w)
            elif resample == "cubic":
                arr = _cubic(arr, out_h, out_w)
            else:
                raise ValueError(f"unsupported resample algorithm {resample!r}")
        height, width = arr.shape

    nodata = None
    nd = tags.get(GDAL_NODATA_TAG)
    if isinstance(nd, str):
        try:
            nodata = float(nd.strip())
        except ValueError:
            nodata = None
    return TiffBand(width=width, height=height, array=arr, nodata=nodata)


def band_to_masked(band: TiffBand):
    """TiffBand → MaskedCellBuffer via the CHECKED band-nodata ingestion
    (reference read_cells_masked + GdalND→NoData: src/gdal/rasterband.rs:
    104-126, src/gdal/mod.rs:47-70): the band's f64 nodata must be
    representable in the band's cell type, else NoDataConversionError."""
    from erased_cells_spark.cells.celltype import CellType
    from erased_cells_spark.cells.masked import MaskedCellBuffer
    from erased_cells_spark.cells.nodata import NoData

    ct = CellType.from_dtype(band.array.dtype)
    nd = NoData.from_float(ct, band.nodata)
    return MaskedCellBuffer.from_vec_with_nodata(band.array.ravel(), nd)
