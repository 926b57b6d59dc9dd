"""RIFF/WAVE PCM codec (r7, VERDICT r6 item 7): real audio decode the way
PNG/JPEG made images real. Contracts: int16 encode→decode round-trips
bit-exactly (PCM is lossless); 8-bit recenters; 24-bit sign-extends;
stereo mixes to mono; float32 passes through; malformed/compressed
streams fail loudly with the typed error; the decode_audio dispatcher
routes RIFF magic to the real path and everything else to the stub."""

import struct

import numpy as np
import pytest

from erased_cells_spark.operators.multimodal import decode_audio, decode_audio_stub
from erased_cells_spark.sources.wav import (
    WavFormatError,
    wav_decode,
    wav_decode_mono,
    wav_encode_pcm16,
)


def tone(n=4000, freq=440.0, rate=8000, amp=12000):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


class TestRoundTrip:
    def test_pcm16_mono_bit_exact(self):
        x = tone()
        rate, back = wav_decode(wav_encode_pcm16(x, 8000))
        assert rate == 8000 and back.dtype == np.int16
        assert np.array_equal(back, x)

    def test_pcm16_stereo_keeps_channels(self):
        x = np.stack([tone(), -tone()], axis=1)
        rate, back = wav_decode(wav_encode_pcm16(x, 44100))
        assert rate == 44100 and back.shape == x.shape
        assert np.array_equal(back, x)

    def test_stereo_mixes_to_mono(self):
        left, right = tone(amp=10000), tone(amp=2000)
        x = np.stack([left, right], axis=1)
        _, mono = wav_decode_mono(wav_encode_pcm16(x, 8000))
        assert mono.ndim == 1
        want = ((left.astype(np.float64) + right) / 2).astype(np.int16)
        assert np.array_equal(mono, want)

    def test_empty_samples(self):
        rate, back = wav_decode(wav_encode_pcm16(np.array([], dtype=np.int16)))
        assert len(back) == 0


def hand_wav(tag, bits, channels, rate, data: bytes) -> bytes:
    fmt = struct.pack(
        "<HHIIHH", tag, channels, rate,
        rate * channels * max(bits // 8, 1), channels * max(bits // 8, 1), bits,
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestWidths:
    def test_8bit_unsigned_recenters(self):
        raw = np.array([0, 128, 255], dtype=np.uint8)
        _, x = wav_decode_mono(hand_wav(1, 8, 1, 8000, raw.tobytes()))
        assert x.dtype == np.int16
        assert list(x) == [-128, 0, 127]

    def test_24bit_sign_extends(self):
        vals = [1, -1, (1 << 23) - 1, -(1 << 23)]
        data = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        _, x = wav_decode(hand_wav(1, 24, 1, 8000, data))
        assert x.dtype == np.int32 and list(x) == vals

    def test_32bit_int(self):
        vals = np.array([2**30, -(2**30), 7], dtype="<i4")
        _, x = wav_decode(hand_wav(1, 32, 1, 8000, vals.tobytes()))
        assert np.array_equal(x, vals)

    def test_float32(self):
        vals = np.array([0.5, -0.25, 1.0], dtype="<f4")
        _, x = wav_decode(hand_wav(3, 32, 1, 8000, vals.tobytes()))
        assert x.dtype == np.float32 and np.allclose(x, vals)


class TestFailLoud:
    def test_bad_magic(self):
        with pytest.raises(WavFormatError, match="magic"):
            wav_decode(b"\x89PNG not a wav at all")

    def test_not_wave(self):
        with pytest.raises(WavFormatError, match="WAVE"):
            wav_decode(b"RIFF\x04\x00\x00\x00AVI ")

    def test_truncated_chunk(self):
        buf = wav_encode_pcm16(tone(100))
        with pytest.raises(WavFormatError, match="truncated"):
            wav_decode(buf[:-10])

    def test_missing_data_chunk(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        with pytest.raises(WavFormatError, match="data"):
            wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_missing_fmt_chunk(self):
        body = b"WAVE" + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        with pytest.raises(WavFormatError, match="fmt"):
            wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_compressed_tag_rejected(self):
        with pytest.raises(WavFormatError, match="compressed"):
            wav_decode(hand_wav(2, 4, 1, 8000, b"\x00" * 8))  # ADPCM

    def test_odd_bit_depth_rejected(self):
        with pytest.raises(WavFormatError, match="unsupported"):
            wav_decode(hand_wav(1, 12, 1, 8000, b"\x00" * 6))


class TestDispatcher:
    def test_riff_routes_to_real_codec(self):
        x = tone(800)
        got = decode_audio(wav_encode_pcm16(x, 8000), duration_ms=999999)
        assert np.array_equal(got, x)  # stream length wins over the hint

    def test_non_riff_falls_back_to_stub(self):
        payload = b"not riff bytes here"
        got = decode_audio(payload, duration_ms=500)
        assert np.array_equal(got, decode_audio_stub(payload, 500))

    def test_fixture_audio_is_real_wav(self):
        from erased_cells_spark.operators.multimodal import synthetic_media_rows

        rows = [r for r in synthetic_media_rows(64, 5) if r["kind"] == "audio"]
        assert rows and all(r["payload"][:4] == b"RIFF" for r in rows)
        # and the samples are the documented stub-derived PCM
        r = rows[0]
        rate, x = wav_decode(r["payload"])
        assert rate == 8000 and len(x) == r["duration_ms"] * 8
