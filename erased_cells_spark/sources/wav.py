"""RIFF/WAVE PCM codec, pure python + numpy (public spec: RIFF-1991 /
"Multimedia Programming Interface and Data Specifications"). Makes the
audio third of the multimodal column REAL the way PNG/JPEG made images
real (VERDICT r6 next-steps item 7): `wav_decode` parses actual WAV byte
streams into PCM sample arrays (no ffmpeg/soundfile in the container —
none is needed for PCM WAV; the stdlib-adjacent RIFF layout is a 44-byte
header plus raw samples), and `wav_encode_pcm16` builds deterministic
real-WAV fixtures.

Scope — uncompressed PCM: format tag 1 (integer PCM: unsigned 8-bit,
signed 16/24/32-bit) and tag 3 (IEEE float 32), any channel count and
sample rate. Compressed formats (ADPCM, MP3-in-WAV, extensible with
non-PCM subformat) raise WavFormatError with the reason — at which point a
real deployment routes to ffmpeg via the decode_audio seam (one
function). Decoded samples are returned in their native width; the mono
helper mixes channels by arithmetic mean in float64 then casts back.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


class WavFormatError(ValueError):
    """Malformed or out-of-scope WAV (bad RIFF/WAVE framing, missing
    fmt/data chunks, compressed format tags, unsupported bit depths)."""


def wav_encode_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode a (n,) or (n, channels) int16 array as a canonical PCM WAV."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("wav_encode_pcm16 wants a 1-D or (n, ch) int16 array")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return WAV_MAGIC + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV byte stream → (sample_rate, samples) where samples
    is (n,) for mono or (n, channels) otherwise, in the file's native
    dtype (uint8 / int16 / int32 for 24- and 32-bit / float32)."""
    if payload[:4] != WAV_MAGIC:
        raise WavFormatError("bad RIFF magic")
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise WavFormatError("RIFF container is not WAVE")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos: pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4: pos + 8])
        if pos + 8 + ln > n:
            raise WavFormatError(f"truncated {cid!r} chunk (declared {ln} bytes)")
        body = payload[pos + 8: pos + 8 + ln]
        if cid == b"fmt ":
            if ln < 16:
                raise WavFormatError(f"fmt chunk too short ({ln} bytes)")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavFormatError("no fmt chunk")
    if data is None:
        raise WavFormatError("no data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if channels < 1:
        raise WavFormatError("zero channels")
    if tag == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8)
        elif bits == 16:
            x = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
        elif bits == 24:
            b = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
            b = b.reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.int32)
        elif bits == 32:
            x = np.frombuffer(data[: len(data) - len(data) % 4], dtype="<i4")
        else:
            raise WavFormatError(f"{bits}-bit integer PCM unsupported")
    elif tag == 3:  # IEEE float
        if bits != 32:
            raise WavFormatError(f"{bits}-bit float PCM unsupported")
        x = np.frombuffer(data[: len(data) - len(data) % 4], dtype="<f4")
    else:
        raise WavFormatError(
            f"compressed WAV format tag {tag} out of PCM scope (route to a "
            "real audio library via the decode_audio seam)"
        )
    frames = len(x) // channels
    x = x[: frames * channels]
    if channels > 1:
        x = x.reshape(frames, channels)
    return rate, x


def wav_decode_mono(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode → (sample_rate, mono samples): 8-bit unsigned recenters to
    signed int16 (x - 128) so waveform stats (RMS) are amplitude-meaningful
    across widths; multi-channel mixes by arithmetic mean in float64 then
    casts back (rounding toward zero for integer widths)."""
    rate, x = wav_decode(payload)
    if x.dtype == np.uint8:
        x = x.astype(np.int16) - 128
    if x.ndim == 2:
        mixed = x.astype(np.float64).mean(axis=1)
        x = (
            mixed.astype(x.dtype)
            if np.issubdtype(x.dtype, np.integer)
            else mixed.astype(np.float32)
        )
    return rate, x
