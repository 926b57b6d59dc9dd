"""Minimal MJPEG-AVI container codec — pure python/numpy, public spec.

AVI is RIFF (the same container family as sources/wav.py): a 'RIFF…AVI '
file holding a 'hdrl' LIST (avih main header + one 'strl' stream list with
strh/strf), a 'movi' LIST whose '00dc' chunks carry one compressed frame
each, and an optional 'idx1' index. With the MJPG fourcc every frame is a
standalone baseline JFIF stream — which sources/jpeg.py already decodes —
so video becomes REAL in this environment with zero new dependencies: the
container walk is this module, the per-frame codec is the existing JPEG
one (spec refs: Microsoft RIFF/AVI docs, OpenDML AVI; ITU T.81 for the
frames themselves — all public).

Scope (fail-loud beyond it, matching the repo's codec convention —
png.py/jpeg.py/wav.py): single 'vids' stream, MJPG fourcc, '00dc' frame
chunks. Out-of-scope containers (audio streams, other codecs, OpenDML
extension lists) raise AviFormatError — a ValueError, so the media
pipelines' per-record quarantine lane (multimodal._CODEC_ERRORS) absorbs
malformed crawl bytes instead of failing the job.

Used by: operators/multimodal.decode_video_frame (magic-sniffed dispatch),
the media fixtures (synthetic_media_rows packages the former stub frames
as real MJPEG-AVI), and tests/test_avi_codec.py.
"""

from __future__ import annotations

import struct

AVI_RIFF_MAGIC = b"RIFF"
AVI_FORM = b"AVI "


class AviFormatError(ValueError):
    """Malformed or out-of-scope AVI byte stream (position + reason)."""


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == AVI_RIFF_MAGIC and payload[8:12] == AVI_FORM


def _u32(b: bytes, off: int, what: str) -> int:
    if off + 4 > len(b):
        raise AviFormatError(f"truncated {what} at byte {off}")
    return struct.unpack_from("<I", b, off)[0]


def avi_encode_mjpeg(frames: list[bytes], fps: int, width: int, height: int) -> bytes:
    """Write an MJPEG AVI: one 'vids' stream, one '00dc' chunk per frame,
    idx1 index. Frames are opaque compressed streams (baseline JFIF from
    sources/jpeg.py in this repo's fixtures)."""
    if fps <= 0:
        raise AviFormatError(f"fps must be positive, got {fps}")
    if not frames:
        raise AviFormatError("MJPEG AVI needs at least one frame")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,                 # dwMaxBytesPerSec (advisory)
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0, 1,              # dwInitialFrames, dwStreams
        0,                 # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,        # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,        # flags, priority, language, initial frames
        1, fps,            # dwScale, dwRate → fps = rate/scale
        0, len(frames),    # dwStart, dwLength (frames)
        0, 0xFFFFFFFF, -1, # bufsize, quality, samplesize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_chunks = []
    idx_entries = []
    off_in_movi = 4  # offsets count from the 'movi' fourcc
    for fr in frames:
        c = chunk(b"00dc", fr)
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off_in_movi, len(fr)))
        movi_chunks.append(c)
        off_in_movi += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = AVI_FORM + hdrl + movi + idx1
    return AVI_RIFF_MAGIC + struct.pack("<I", len(body)) + body


def avi_parse(payload: bytes) -> dict:
    """Walk the container: returns {'fps', 'width', 'height', 'n_frames',
    'frames': [(abs_offset, size), ...]} — fail-loud AviFormatError with
    byte position on anything malformed or out of scope."""
    payload = bytes(payload)
    if len(payload) < 12 or payload[:4] != AVI_RIFF_MAGIC:
        raise AviFormatError("not a RIFF stream (bad magic at byte 0)")
    riff_size = _u32(payload, 4, "RIFF size")
    if 8 + riff_size > len(payload):
        raise AviFormatError(
            f"RIFF size {riff_size} overruns buffer of {len(payload)} bytes"
        )
    if payload[8:12] != AVI_FORM:
        raise AviFormatError(f"RIFF form {payload[8:12]!r} is not 'AVI '")

    fps = width = height = None
    total_frames = None
    frames: list[tuple[int, int]] = []

    def walk(start: int, end: int, depth: int) -> None:
        nonlocal fps, width, height, total_frames
        off = start
        while off + 8 <= end:
            fourcc = payload[off : off + 4]
            size = _u32(payload, off + 4, f"chunk size of {fourcc!r}")
            body0, body1 = off + 8, off + 8 + size
            if body1 > end:
                raise AviFormatError(
                    f"chunk {fourcc!r} at byte {off} (size {size}) overruns its parent"
                )
            if fourcc == b"LIST":
                form = payload[body0 : body0 + 4]
                if form in (b"hdrl", b"strl", b"movi"):
                    walk(body0 + 4, body1, depth + 1)
            elif fourcc == b"avih":
                if size < 56:
                    raise AviFormatError(f"avih chunk is {size} bytes, need 56")
                vals = struct.unpack_from("<14I", payload, body0)
                total_frames = vals[4]
                if vals[6] != 1:
                    raise AviFormatError(
                        f"{vals[6]} streams; only single-'vids'-stream AVI is in scope"
                    )
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                if size < 48:
                    raise AviFormatError(f"strh chunk is {size} bytes, need >= 48")
                fcc_type = payload[body0 : body0 + 4]
                handler = payload[body0 + 4 : body0 + 8]
                if fcc_type != b"vids":
                    raise AviFormatError(f"stream type {fcc_type!r} is not 'vids'")
                if handler != b"MJPG":
                    raise AviFormatError(f"codec {handler!r} is not 'MJPG'")
                scale, rate = struct.unpack_from("<II", payload, body0 + 20)
                if scale == 0 or rate == 0:
                    raise AviFormatError(f"strh scale/rate {scale}/{rate} invalid")
                fps = rate / scale
            elif fourcc == b"00dc":
                frames.append((body0, size))
            off = body1 + (size % 2)  # chunks are word-aligned

    walk(12, 8 + riff_size, 0)

    if fps is None:
        raise AviFormatError("no 'vids' strh header found")
    if not frames:
        raise AviFormatError("no '00dc' frame chunks in 'movi'")
    if total_frames is not None and total_frames != len(frames):
        raise AviFormatError(
            f"avih dwTotalFrames {total_frames} != {len(frames)} '00dc' chunks"
        )
    return {
        "fps": fps,
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }


def avi_frame_jpeg(payload: bytes, index: int) -> bytes:
    """The index-th frame's compressed bytes (a standalone JFIF stream)."""
    meta = avi_parse(payload)
    if not 0 <= index < meta["n_frames"]:
        raise AviFormatError(f"frame index {index} out of [0, {meta['n_frames']})")
    off, size = meta["frames"][index]
    return bytes(payload[off : off + size])


def avi_frame_index_at(payload_meta: dict, offset_ms: int) -> int:
    """Time → frame index (floor at the sampled instant, clamped to the
    last frame — the convention a seek-decode would use)."""
    idx = int(offset_ms * payload_meta["fps"] // 1000)
    return max(0, min(idx, payload_meta["n_frames"] - 1))
