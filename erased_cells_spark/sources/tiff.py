"""Minimal pure-numpy reader for uncompressed strip TIFFs.

Scope: exactly what the golden files need (single-band, single-IFD,
uncompressed strips, little- or big-endian, 8/16/32-bit int or float
samples, GDAL_NODATA ascii tag). This replaces the reference's GDAL
dependency for tests only (reference: src/gdal/rasterband.rs:37-126);
the engine proper produces rasters by rasterizing vectors, not file scans.
"""

from __future__ import annotations

import struct
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


def read_tiff(path: str) -> TiffBand:
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
    if compression != 1:
        raise ValueError(f"unsupported compression {compression}")
    sample_format = tags.get(339, [1])[0]  # 1 uint, 2 int, 3 float
    kind = {1: "u", 2: "i", 3: "f"}[sample_format]
    dtype = np.dtype(f"{endian}{kind}{bits // 8}")

    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, [height])[0]
    rows_out = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, height - si * rows_per_strip)
        strip = np.frombuffer(buf, dtype=dtype, count=nrows * width, offset=off)
        rows_out.append(strip.reshape(nrows, width))
    arr = np.vstack(rows_out).astype(dtype.newbyteorder("="))

    nodata = None
    nd = tags.get(GDAL_NODATA_TAG)
    if isinstance(nd, str):
        try:
            nodata = float(nd.strip())
        except ValueError:
            nodata = None
    return TiffBand(width=width, height=height, array=arr, nodata=nodata)
