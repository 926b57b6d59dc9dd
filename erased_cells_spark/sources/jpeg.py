"""Baseline JFIF (JPEG) codec, pure python + numpy (public spec: ITU-T
T.81 / ISO 10918-1, Annex K tables). Completes the real-codec story for
the image operators: PNG covers the lossless path (sources/png.py), this
module covers the lossy one, so both common crawl-thumbnail byte streams
decode for real.

Scope — baseline sequential DCT, 8-bit, 1-component (gray) AND
3-component interleaved YCbCr (r7, VERDICT r6 item 1: a real crawl's
images are overwhelmingly color JPEG) with 4:4:4 / 4:2:2 / 4:2:0 chroma
subsampling (any integer-ratio (h, v) factors decode; the encoder emits
4:2:0 or 4:4:4). Still out of scope and fail-loud with the reason:
progressive scans (SOF2), restart intervals (DRI), arithmetic coding,
16-bit quant tables — in a real deployment those go to libjpeg-turbo via
Pillow; the decode_image seam is one function. The DCT/IDCT are exact
orthonormal matrix products (`D @ block @ D.T`), so encode→decode round
trips are within normal quantization error — asserted as
mean-absolute-error and dHash-stability bounds in tests, not bit equality
(JPEG is lossy by design). Color conversion is the JFIF full-range BT.601
pair (RGB↔YCbCr), and `jpeg_decode_luma` returns the Y plane DIRECTLY
(exact — not recomputed from rounded RGB), which is the plane every
image-dedup operator consumes.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegFormatError(ValueError):
    """Malformed or out-of-scope JPEG (non-baseline, multi-component,
    progressive, restart-interval, truncated)."""


JPEG_MAGIC = b"\xff\xd8"

# Annex K.1 luminance quantization table (quality 50 base), zigzag order
_QUANT_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag scan order: _ZIGZAG[i] = (row, col) of the i-th coefficient
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3: standard DC luminance huffman table (BITS, HUFFVAL)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K.3: standard AC luminance huffman table
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Annex K.2 chrominance quantization table (quality 50 base), natural order
_QUANT_BASE_C = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3: standard DC chrominance huffman table
_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))
# Annex K.3: standard AC chrominance huffman table
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix: forward = D @ B @ D.T."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    d[0] /= np.sqrt(2)
    return d


_D = _dct_matrix()


def _quant_table(quality: int, base: np.ndarray = _QUANT_BASE) -> np.ndarray:
    """libjpeg quality scaling of an Annex K base table."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) from the (BITS, HUFFVAL) spec form."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)
_DC_ENC_C = _canonical_codes(_DC_BITS_C, _DC_VALS_C)
_AC_ENC_C = _canonical_codes(_AC_BITS_C, _AC_VALS_C)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  dc_enc: dict, ac_enc: dict, prev_dc: int) -> int:
    """DCT → quantize → huffman-encode one level-shifted 8×8 block;
    returns the block's DC for the next differential."""
    coef = _D @ block @ _D.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q.reshape(-1)[_ZZ]
    # DC (differential)
    size, amp = _magnitude(int(zz[0]) - prev_dc)
    code, length = dc_enc[size]
    bw.write(code, length)
    if size:
        bw.write(amp, size)
    # AC run-length
    run = 0
    for v in zz[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_enc[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size, amp = _magnitude(v)
        c, ln = ac_enc[(run << 4) | size]
        bw.write(c, ln)
        bw.write(amp, size)
        run = 0
    if run:
        c, ln = ac_enc[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def _pad_edge(img: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a 2-D plane to (ph, pw)."""
    h, w = img.shape
    padded = np.empty((ph, pw), dtype=img.dtype)
    padded[:h, :w] = img
    padded[h:, :w] = img[-1:, :]
    padded[:, w:] = padded[:, w - 1: w]
    return padded


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def jpeg_encode_gray(img: np.ndarray, quality: int = 85) -> bytes:
    """Encode a (h, w) uint8 plane as a baseline single-component JFIF."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("jpeg_encode_gray wants a 2-D uint8 array")
    h, w = img.shape
    qt = _quant_table(quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    blocks = _pad_edge(img, ph, pw).astype(np.float64) - 128.0
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            prev_dc = _encode_block(
                bw, blocks[by: by + 8, bx: bx + 8], qt, _DC_ENC, _AC_ENC, prev_dc
            )
    scan = bw.flush()
    out = bytearray(JPEG_MAGIC)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(int(x) for x in qt.reshape(-1)[_ZZ]))
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def _rgb_to_ycc(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range BT.601 RGB → (Y, Cb, Cr), float64."""
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def jpeg_encode_color(img: np.ndarray, quality: int = 85,
                      subsampling: str = "420") -> bytes:
    """Encode a (h, w, 3) uint8 RGB array as a baseline interleaved
    3-component YCbCr JFIF with 4:2:0 (default — the web's dominant
    layout) or 4:4:4 chroma."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("jpeg_encode_color wants a (h, w, 3) uint8 array")
    if subsampling not in ("420", "444"):
        raise ValueError(f"subsampling {subsampling!r} not in ('420', '444')")
    h, w = img.shape[:2]
    sub = 2 if subsampling == "420" else 1
    qt_y = _quant_table(quality)
    qt_c = _quant_table(quality, _QUANT_BASE_C)
    # pad to whole MCUs (16×16 for 4:2:0, 8×8 for 4:4:4)
    mcu = 8 * sub
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    y, cb, cr = _rgb_to_ycc(img)
    y = _pad_edge(y, ph, pw) - 128.0
    cb = _pad_edge(cb, ph, pw)
    cr = _pad_edge(cr, ph, pw)
    if sub == 2:  # box-average 2×2 chroma subsample
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cb, cr = cb - 128.0, cr - 128.0
    bw = _BitWriter()
    dc = [0, 0, 0]  # per-component DC predictors
    for my in range(0, ph, mcu):
        for mx in range(0, pw, mcu):
            for v in range(sub):  # Y data units of the MCU
                for u in range(sub):
                    by, bx = my + 8 * v, mx + 8 * u
                    dc[0] = _encode_block(
                        bw, y[by: by + 8, bx: bx + 8], qt_y,
                        _DC_ENC, _AC_ENC, dc[0],
                    )
            cy, cx = my // sub, mx // sub
            dc[1] = _encode_block(
                bw, cb[cy: cy + 8, cx: cx + 8], qt_c, _DC_ENC_C, _AC_ENC_C, dc[1]
            )
            dc[2] = _encode_block(
                bw, cr[cy: cy + 8, cx: cx + 8], qt_c, _DC_ENC_C, _AC_ENC_C, dc[2]
            )
    scan = bw.flush()
    yhv = (sub << 4) | sub  # 0x22 for 4:2:0, 0x11 for 4:4:4
    out = bytearray(JPEG_MAGIC)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(int(x) for x in qt_y.reshape(-1)[_ZZ]))
    out += _seg(0xDB, b"\x01" + bytes(int(x) for x in qt_c.reshape(-1)[_ZZ]))
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, yhv, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xC4, b"\x01" + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
    out += _seg(0xC4, b"\x11" + bytes(_AC_BITS_C) + bytes(_AC_VALS_C))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0]))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.ended = False

    def _fill(self) -> None:
        while self.n <= 24:
            if self.ended or self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # spec: pad with 1s at end
                self.n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # destuff
                elif 0xD0 <= nxt <= 0xD7:
                    raise JpegFormatError(
                        "restart markers inside entropy data are out of "
                        "baseline-gray scope (no DRI support)"
                    )
                else:
                    # a real marker (EOI, next segment): entropy data ends
                    # here — stop consuming and pad with 1s so the tail
                    # bits of the final MCU decode per spec
                    self.ended = True
                    self.pos -= 1
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value lookup for decoding."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_code(br: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        v = tree.get((length, code))
        if v is not None:
            return v
    raise JpegFormatError("invalid huffman code in entropy data")


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def _decode_components(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Parse + entropy-decode a baseline JFIF: (h, w, [full-res uint8
    plane per component]) — Y (or gray) first, then Cb, Cr. Chroma planes
    are upsampled to (h, w) by pixel replication."""
    if payload[:2] != JPEG_MAGIC:
        raise JpegFormatError("bad JPEG magic")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[dict] = []  # {id, hs, vs, tq} in SOF order
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos + 2: pos + 4])
        if pos + 2 + ln > n:
            raise JpegFormatError(f"truncated segment 0xFF{marker:02X}")
        body = payload[pos + 4: pos + 2 + ln]
        if marker == 0xDB:  # DQT
            b = body
            while b:
                if len(b) < 65:
                    raise JpegFormatError("truncated DQT table")
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ] = np.frombuffer(b[1:65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                b = b[65:]
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegFormatError(f"precision {prec} unsupported")
            if nc not in (1, 3):
                raise JpegFormatError(
                    f"{nc}-component JPEG unsupported (gray or YCbCr only)"
                )
            if len(body) < 6 + 3 * nc:
                raise JpegFormatError(
                    f"SOF0 declares {nc} components but the segment is truncated"
                )
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "hs": hv >> 4, "vs": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise JpegFormatError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) supported"
            )
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                if len(b) < 17:
                    raise JpegFormatError("truncated DHT table")
                tc, th = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                nv = sum(bits)
                if len(b) < 17 + nv:
                    raise JpegFormatError("truncated DHT values")
                vals = list(b[17: 17 + nv])
                htables[(tc, th)] = _decode_tree(bits, vals)
                b = b[17 + nv:]
        elif marker == 0xDD:
            raise JpegFormatError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if h is None:
                raise JpegFormatError("SOS before SOF0")
            ns = body[0]
            if ns != len(comps):
                raise JpegFormatError(
                    f"non-interleaved scan ({ns} of {len(comps)} components) "
                    "unsupported in baseline decoder"
                )
            sel = {}
            for i in range(ns):
                cid, da = body[1 + 2 * i], body[2 + 2 * i]
                sel[cid] = (da >> 4, da & 0xF)
            scan_comps = []
            for c in comps:
                if c["id"] not in sel:
                    raise JpegFormatError(f"SOS missing component id {c['id']}")
                if c["tq"] not in qtables:
                    raise JpegFormatError(f"missing quant table {c['tq']}")
                dc_sel, ac_sel = sel[c["id"]]
                if (0, dc_sel) not in htables or (1, ac_sel) not in htables:
                    raise JpegFormatError("missing huffman table for scan")
                scan_comps.append(
                    {
                        **c,
                        "qt": qtables[c["tq"]],
                        "dc": htables[(0, dc_sel)],
                        "ac": htables[(1, ac_sel)],
                    }
                )
            return h, w, _decode_scan(payload[pos + 2 + ln:], h, w, scan_comps)
        pos += 2 + ln
    raise JpegFormatError("no SOS scan found")


def _decode_scan(data, h, w, comps) -> list[np.ndarray]:
    """Interleaved baseline scan → one full-resolution uint8 plane per
    component (chroma pixel-replicated up to (h, w))."""
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    for c in comps:
        if not (1 <= c["hs"] <= 4 and 1 <= c["vs"] <= 4):
            raise JpegFormatError(f"sampling factors {c['hs']}x{c['vs']} invalid")
        if hmax % c["hs"] or vmax % c["vs"]:
            raise JpegFormatError(
                f"fractional chroma sampling ratio {hmax}/{c['hs']} unsupported"
            )
    br = _BitReader(data)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcx, mcy = -(-w // mcu_w), -(-h // mcu_h)
    planes = [
        np.empty((mcy * c["vs"] * 8, mcx * c["hs"] * 8), dtype=np.float64)
        for c in comps
    ]
    prev_dc = [0] * len(comps)
    for my in range(mcy):
        for mx in range(mcx):
            for ci, c in enumerate(comps):
                for v in range(c["vs"]):
                    for u in range(c["hs"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _read_code(br, c["dc"])
                        prev_dc[ci] += _extend(br.bits(size), size)
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = _read_code(br, c["ac"])
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise JpegFormatError("AC run past end of block")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZZ] = zz
                        block = _D.T @ (coef.reshape(8, 8) * c["qt"]) @ _D
                        by = (my * c["vs"] + v) * 8
                        bx = (mx * c["hs"] + u) * 8
                        planes[ci][by: by + 8, bx: bx + 8] = block
    out = []
    for c, plane in zip(comps, planes):
        up = np.repeat(
            np.repeat(plane, vmax // c["vs"], axis=0), hmax // c["hs"], axis=1
        )
        out.append(
            np.clip(np.round(up[:h, :w] + 128.0), 0, 255).astype(np.uint8)
        )
    return out


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF: (h, w) uint8 for grayscale, (h, w, 3) uint8
    RGB for 3-component YCbCr (JFIF full-range BT.601 conversion)."""
    h, w, planes = _decode_components(payload)
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def jpeg_decode_luma(payload: bytes) -> np.ndarray:
    """Decode to the (h, w) uint8 LUMA plane the dHash / feature operators
    consume: gray passes through; for YCbCr the Y component IS the BT.601
    luma — returned directly (exact, not recomputed from rounded RGB)."""
    _, _, planes = _decode_components(payload)
    return planes[0]


def jpeg_decode_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline SINGLE-component JFIF to its (h, w) uint8 plane.
    Color streams raise — callers wanting Y from color use
    jpeg_decode_luma, full RGB jpeg_decode."""
    h, w, planes = _decode_components(payload)
    if len(planes) != 1:
        raise JpegFormatError(
            f"{len(planes)}-component JPEG: jpeg_decode_gray is "
            "single-component; use jpeg_decode_luma / jpeg_decode"
        )
    return planes[0]
