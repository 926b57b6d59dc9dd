"""Baseline GIF87a/89a codec — the third REAL image format after PNG
(sources/png.py) and baseline JPEG (sources/jpeg.py); web crawls are
full of GIFs, and the media lanes' quarantine discipline needs a real
decoder to exercise, not a stub.

Scope (the same fail-loud contract as the sibling codecs):
- DECODE: non-interlaced single-image GIF87a/89a, global or local color
  table, 89a extension blocks skipped (graphic control/comment/
  application); INTERLACED images and animations (a second image
  descriptor) raise GifFormatError — out of scope, loudly.
- ENCODE: gif_encode writes a real, spec-conforming GIF87a of an (h, w)
  palette-index array + palette, used to build test fixtures (the
  png/jpeg fixture discipline — our encoder, round-trip through our
  decoder, independently checked against the source pattern).

GIF LZW vs the TIFF LZW already in sources/tiff.py: codes pack
LSB-FIRST into the byte stream (TIFF packs MSB-first), the code width
starts at `min_code_size`+1 and grows AFTER the table reaches 2^width
(TIFF grows one code EARLIER — the 'early change'), and data arrives in
<=255-byte sub-blocks. Implemented from the public GIF89a specification
(ISO/CompuServe); no reference code involved.

Scale shape: like png/jpeg — per-image python inside Arrow batches via
the multimodal dispatcher; the documented Pillow swap-in applies here
too if real media volume ever dominates."""

from __future__ import annotations

import numpy as np

GIF_MAGIC87 = b"GIF87a"
GIF_MAGIC89 = b"GIF89a"


class GifFormatError(ValueError):
    """Malformed or out-of-scope GIF — the quarantine lanes catch this."""


def _u16(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8)


def _sub_blocks(data: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at off; return (bytes, next_off)."""
    out = bytearray()
    while True:
        if off >= len(data):
            raise GifFormatError("truncated sub-block stream")
        n = data[off]
        off += 1
        if n == 0:
            return bytes(out), off
        if off + n > len(data):
            raise GifFormatError("truncated sub-block")
        out += data[off : off + n]
        off += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first packing, clear/end codes, width grows
    after the table FILLS (no early change), 12-bit cap."""
    if not 2 <= min_code_size <= 8:
        raise GifFormatError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            raise GifFormatError("LZW stream ran out of bits")
        byte0 = bitpos >> 3
        # up to 3 bytes cover any 12-bit read
        chunk = int.from_bytes(data[byte0 : byte0 + 3].ljust(3, b"\0"), "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return code

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    prev: bytes | None = None
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifFormatError("first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifFormatError("LZW code out of range")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise GifFormatError(f"LZW produced {n_out} of {n_pixels} pixels")
    return out


def gif_decode(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB of a baseline non-interlaced GIF."""
    b = bytes(payload)
    if len(b) < 13 or b[:6] not in (GIF_MAGIC87, GIF_MAGIC89):
        raise GifFormatError("not a GIF stream")
    flags = b[10]
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if off + 3 * n > len(b):
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(b[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
        off += 3 * n
    img = None
    while off < len(b):
        block = b[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # 89a extension: label + sub-blocks, skipped
            if off >= len(b):
                raise GifFormatError("truncated extension")
            off += 1
            _, off = _sub_blocks(b, off)
            continue
        if block != 0x2C:
            raise GifFormatError(f"unexpected block 0x{block:02x}")
        if img is not None:
            raise GifFormatError("animated GIF (second image) out of scope")
        if off + 9 > len(b):
            raise GifFormatError("truncated image descriptor")
        w, h = _u16(b, off + 4), _u16(b, off + 6)
        iflags = b[off + 8]
        off += 9
        if iflags & 0x40:
            raise GifFormatError("interlaced GIF out of scope")
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if off + 3 * n > len(b):
                raise GifFormatError("truncated local color table")
            ct = np.frombuffer(b[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
            off += 3 * n
        if ct is None:
            raise GifFormatError("no color table")
        if w == 0 or h == 0:
            raise GifFormatError("zero-sized image")
        if off >= len(b):
            raise GifFormatError("truncated before LZW min code size")
        mcs = b[off]
        off += 1
        data, off = _sub_blocks(b, off)
        idx = _lzw_decode(data, mcs, w * h)
        if idx.max(initial=0) >= len(ct):
            raise GifFormatError("pixel index exceeds color table")
        img = ct[idx].reshape(h, w, 3)
    if img is None:
        raise GifFormatError("no image block")
    return img


def gif_decode_luma(payload: bytes) -> np.ndarray:
    """(h, w) uint8 luma via the shared ITU-R BT.601 integer reduction
    ((77R + 150G + 29B) >> 8) — the png_decode_luma convention."""
    rgb = gif_decode(payload).astype(np.uint32)
    return ((77 * rgb[:, :, 0] + 150 * rgb[:, :, 1] + 29 * rgb[:, :, 2]) >> 8).astype(
        np.uint8
    )


def gif_encode(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Real GIF87a encoder for fixtures: (h, w) uint8 palette indices +
    (n, 3) uint8 palette (n a power of two, 4..256). Emits genuine LZW
    (table-building, growing widths) — not the degenerate clear-per-pixel
    trick — so the decoder's table/width logic is actually exercised."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("indices must be (h, w); palette (n, 3)")
    n = pal.shape[0]
    if n < 4 or n > 256 or (n & (n - 1)) != 0:
        raise ValueError("palette size must be a power of two in [4, 256]")
    if idx.max(initial=0) >= n:
        raise ValueError("index exceeds palette")
    h, w = idx.shape
    depth = max(2, int(n).bit_length() - 1)  # min code size >= 2 per spec
    out = bytearray()
    out += GIF_MAGIC87
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT present, size 2^depth
    out += pal.tobytes()
    out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0])  # no local table, not interlaced
    out += bytes([depth])

    clear = 1 << depth
    end = clear + 1
    codes: list[tuple[int, int]] = [(clear, depth + 1)]
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = depth + 1
    seq = b""
    for px in idx.ravel().tobytes():
        cand = seq + bytes([px])
        if cand in table:
            seq = cand
            continue
        codes.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = depth + 1
        seq = bytes([px])
    if seq:
        codes.append((table[seq], width))
    codes.append((end, width))

    acc = 0
    nbits = 0
    stream = bytearray()
    for code, cw in codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
