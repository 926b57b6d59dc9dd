"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schema, partition-preserving mapInPandas batching,
UDF signatures, tile-struct output reusing the erased-cells layout) is real
and tested. ALL THREE LANES decode real bytes now: images since r6
(`decode_image`: PNG via sources/png.py — zlib + all five scanline
filters, gray/RGB(A)/palette → BT.601 luma; baseline gray AND color JFIF
via sources/jpeg.py since r7), audio since r7 (`decode_audio`: RIFF/WAVE
PCM via sources/wav.py), video since r7 (`decode_video_frame`: MJPEG-AVI
via sources/avi.py — the container walk plus per-frame baseline-JFIF
decode through the same jpeg codec). Each dispatcher magic-sniffs the
payload; formats with no in-env decoder (WebP, MP4/H.264 — Pillow/ffmpeg
don't exist in this container) fall back to a deterministic stub decoder
seeded from the payload hash, so swapping in a real library later changes
ONE function; every schema and batch shape stays.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erased_cells_spark.plans.tuning import local_df
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("cell_type", StringType(), False),
        StructField("cols", IntegerType(), False),
        StructField("rows", IntegerType(), False),
        StructField("data", BinaryType(), False),
        StructField("mean_luma", StringType(), False),  # decimal string: cross-engine-safe
    ]
)


def decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB CODEC — deterministic fake decode: seeds a PCG from the payload
    crc and emits a (height, width) uint8 'luma' plane. The fallback for
    formats without an in-container decoder (JPEG/WebP); PNG payloads take
    the REAL path in decode_image. Raises like a real codec on empty
    payloads."""
    if not payload:
        raise NotImplementedError("empty payload; real codec unavailable in this env")
    rng = np.random.Generator(np.random.PCG64(zlib.crc32(payload)))
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Image decode dispatcher: PNG, baseline JPEG (gray AND 3-component
    YCbCr color with 4:2:0/4:2:2/4:4:4 subsampling since r7), and
    baseline GIF87a/89a (r7 third session) byte streams — magic-sniffed;
    the container-independent pure-python codecs in sources/png.py,
    sources/jpeg.py and sources/gif.py decode for REAL to their luma
    plane — dimensions come from the stream headers, not the metadata
    hint; an out-of-scope PNG/JPEG/GIF raises like a real codec would;
    any other format falls back to the deterministic stub at the hinted
    size."""
    from erased_cells_spark.sources.gif import GIF_MAGIC87, GIF_MAGIC89, gif_decode_luma
    from erased_cells_spark.sources.jpeg import JPEG_MAGIC, jpeg_decode_luma
    from erased_cells_spark.sources.png import PNG_MAGIC, png_decode_luma

    if bytes(payload[:8]) == PNG_MAGIC:
        return png_decode_luma(payload)
    if bytes(payload[:2]) == JPEG_MAGIC:
        return jpeg_decode_luma(payload)
    if bytes(payload[:6]) in (GIF_MAGIC87, GIF_MAGIC89):
        return gif_decode_luma(payload)
    return decode_image_stub(payload, width, height)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy (this part is NOT stubbed)."""
    h, w = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def frame_sample_offsets(duration_ms: int, every_ms: int = 1000) -> np.ndarray:
    """Frame-sampling plan for video: offsets of the frames to decode."""
    if duration_ms <= 0:
        return np.array([], dtype=np.int64)
    return np.arange(0, duration_ms, every_ms, dtype=np.int64)


def decode_video_frame_stub(payload: bytes, offset_ms: int, width: int, height: int) -> np.ndarray:
    """STUB CODEC — deterministic fake frame decode at a time offset: seeds
    from (payload crc, offset). The fallback for containers without an
    in-env decoder (MP4/H.264 etc. — ffmpeg doesn't exist here); MJPEG-AVI
    payloads take the REAL path in decode_video_frame. Raises like a real
    codec on empty payloads."""
    if not payload:
        raise NotImplementedError("empty payload; real codec unavailable in this env")
    rng = np.random.Generator(np.random.PCG64((zlib.crc32(payload) << 32) ^ int(offset_ms)))
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_video_frame(payload: bytes, offset_ms: int, width: int, height: int) -> np.ndarray:
    """Video frame decode dispatcher (r7): MJPEG-AVI byte streams decode
    for REAL — the RIFF container walk is sources/avi.py, the frame at
    `offset_ms` (floor at fps, clamped to the last frame) is a standalone
    baseline JFIF stream decoded by sources/jpeg.py to its luma plane.
    Dimensions come from the stream, not the metadata hint. A malformed
    AVI raises AviFormatError (a ValueError → the quarantine lane); any
    other container falls back to the deterministic stub at the hinted
    size."""
    from erased_cells_spark.sources.avi import avi_frame_index_at, avi_parse, is_avi
    from erased_cells_spark.sources.jpeg import jpeg_decode_luma

    if is_avi(bytes(payload[:12])):
        meta = avi_parse(payload)
        off, size = meta["frames"][avi_frame_index_at(meta, int(offset_ms))]
        return jpeg_decode_luma(bytes(payload[off : off + size]))
    return decode_video_frame_stub(payload, offset_ms, width, height)


# codec exceptions a QUARANTINE lane may absorb: malformed/out-of-scope
# media (PngFormatError/JpegFormatError are ValueErrors; the stubs raise
# NotImplementedError on empty payloads). Anything else — a numpy bug, a
# MemoryError — still fails the task loudly.
_CODEC_ERRORS = (ValueError, NotImplementedError)


def _quarantine_schema(base: StructType) -> StructType:
    """The quarantine-mode output schema: every non-key field nullable
    (a failed record carries NULL features) plus an `error` column holding
    'ExceptionType: message' — NULL on good rows."""
    fields = [
        StructField(f.name, f.dataType, True if f.name != "media_id" else False)
        for f in base.fields
    ]
    return StructType(fields + [StructField("error", StringType(), True)])


def media_quarantine(features: DataFrame) -> DataFrame:
    """The quarantine side-output of a quarantine-mode media operator:
    (media_id, error) of every record whose codec failed. Pair with
    `.filter(F.col('error').isNull())` for the clean lane; surface
    `.count()` of this in job metrics."""
    return features.filter(F.col("error").isNotNull()).select("media_id", "error")


def extract_image_features(
    media: DataFrame, out_size: int = 16, errors: str = "quarantine"
) -> DataFrame:
    """decode → resize → pack as an erased-cells tile struct + stats.

    mapInPandas keeps the input partitioning (no shuffle); each batch is one
    Arrow block; per-image work is whole-array numpy.

    `errors` (r7, VERDICT r6 item 1): a real crawl's media is guaranteed to
    contain malformed bytes — one truncated PNG must not kill a 100 TB job.
    - "quarantine" (default): per-record codec failures become rows with
      NULL features and `error` = 'ExceptionType: message'; good rows carry
      error NULL. Split lanes with media_quarantine / error-is-null.
    - "strict": failures raise through the task (the r6 behavior, right
      for engine-owned fixtures); output schema has NO error column."""
    if errors not in ("quarantine", "strict"):
        raise ValueError(f"errors={errors!r} not in ('quarantine', 'strict')")
    strict = errors == "strict"
    schema = FEATURE_SCHEMA if strict else _quarantine_schema(FEATURE_SCHEMA)
    empty = {f.name: None for f in schema.fields if f.name != "media_id"}

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                # Arrow→pandas renders nullable ints as floats; coerce back
                w = int(r.width) if r.width and r.width == r.width else 32
                h = int(r.height) if r.height and r.height == r.height else 32
                try:
                    img = decode_image(r.payload, w, h)
                except _CODEC_ERRORS as e:
                    if strict:
                        raise
                    rows.append(
                        {
                            "media_id": int(r.media_id),
                            **empty,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
                    continue
                small = resize_nearest(img, out_size, out_size)
                row = {
                    "media_id": int(r.media_id),
                    "cell_type": "UInt8",
                    "cols": out_size,
                    "rows": out_size,
                    "data": small.tobytes(),
                    "mean_luma": f"{small.astype(np.float64).mean():.6f}",
                }
                if not strict:
                    row["error"] = None
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(run, schema)


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("dhash", LongType(), False),
    ]
)


def dhash63(img: np.ndarray) -> int:
    """Difference hash of a luma plane: resize to 8×9 (nearest), compare
    horizontally adjacent pixels → 64 gradient bits, keep the low 63 so the
    value stays positive in a signed-64 lane (same convention as the 63-bit
    SimHash — the block index and bit_count(XOR) verify reuse that
    machinery verbatim). Perceptually near-identical images flip only a few
    gradient signs → small hamming distance."""
    small = resize_nearest(img, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1).astype(np.uint64)
    return int((bits[:63] << np.arange(63, dtype=np.uint64)).sum())


def image_dhash(
    media: DataFrame, passthrough: tuple = (), errors: str = "quarantine"
) -> DataFrame:
    """Per-image perceptual hash: decode → dHash, the signature feed
    for the image near-dup family (hamming_block_pairs + connected
    components — the multimodal twin of SimHash text dedup). Same
    partition-preserving mapInPandas shape — and the same per-record
    `errors` quarantine contract — as extract_image_features.
    `passthrough` columns (e.g. the event timestamp for the streaming
    guard) are carried alongside unchanged."""
    if errors not in ("quarantine", "strict"):
        raise ValueError(f"errors={errors!r} not in ('quarantine', 'strict')")
    strict = errors == "strict"
    base = DHASH_SCHEMA if strict else _quarantine_schema(DHASH_SCHEMA)
    schema = StructType(list(base.fields) + [media.schema[c] for c in passthrough])

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                w = int(r.width) if r.width and r.width == r.width else 32
                h = int(r.height) if r.height and r.height == r.height else 32
                try:
                    img = decode_image(r.payload, w, h)
                except _CODEC_ERRORS as e:
                    if strict:
                        raise
                    row = {
                        "media_id": int(r.media_id),
                        "dhash": None,
                        "error": f"{type(e).__name__}: {e}",
                    }
                    for c in passthrough:
                        row[c] = getattr(r, c)
                    rows.append(row)
                    continue
                row = {"media_id": int(r.media_id), "dhash": dhash63(img)}
                if not strict:
                    row["error"] = None
                for c in passthrough:
                    row[c] = getattr(r, c)
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(run, schema)


VIDEO_FRAME_W, VIDEO_FRAME_H = 32, 24  # stub decode plane for video frames

VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("mean_luma", StringType(), False),  # decimal string
    ]
)


def extract_video_features(
    media: DataFrame, every_ms: int = 1000, errors: str = "quarantine"
) -> DataFrame:
    """Video feature extraction: frame_sample_offsets plans the frames, the
    (stub) codec decodes each sampled frame, mean luma aggregates across
    frames. Same partition-preserving mapInPandas shape — and the same
    per-record `errors` quarantine contract — as the image path.

    Degenerate input convention (shared with the local twin
    media_features_np): media with duration_ms <= 0 sample ZERO frames and
    produce NO feature row on either path."""
    if errors not in ("quarantine", "strict"):
        raise ValueError(f"errors={errors!r} not in ('quarantine', 'strict')")
    strict = errors == "strict"
    schema = (
        VIDEO_FEATURE_SCHEMA if strict else _quarantine_schema(VIDEO_FEATURE_SCHEMA)
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                dur = int(r.duration_ms) if r.duration_ms == r.duration_ms else 0
                offs = frame_sample_offsets(dur, every_ms)
                if len(offs) == 0:
                    continue
                try:
                    frames = np.stack(
                        [
                            decode_video_frame(
                                r.payload, int(o), VIDEO_FRAME_W, VIDEO_FRAME_H
                            )
                            for o in offs
                        ]
                    )
                except _CODEC_ERRORS as e:
                    if strict:
                        raise
                    rows.append(
                        {
                            "media_id": int(r.media_id),
                            "n_frames": None,
                            "mean_luma": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
                    continue
                row = {
                    "media_id": int(r.media_id),
                    "n_frames": int(len(offs)),
                    "mean_luma": f"{frames.astype(np.float64).mean():.6f}",
                }
                if not strict:
                    row["error"] = None
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(run, schema)


AUDIO_SAMPLE_RATE = 8000  # stub decode rate (Hz)

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("rms", StringType(), False),  # decimal string: cross-engine-safe
    ]
)


def decode_audio_stub(
    payload: bytes, duration_ms: int, sample_rate: int = AUDIO_SAMPLE_RATE
) -> np.ndarray:
    """STUB CODEC — deterministic fake PCM decode: seeds a PCG from the
    payload crc and emits duration_ms·rate/1000 int16 samples. Replace with
    soundfile/ffmpeg when the library exists. Raises like a real codec on
    empty payloads."""
    if not payload:
        raise NotImplementedError("empty payload; real codec unavailable in this env")
    n = int(duration_ms) * sample_rate // 1000
    rng = np.random.Generator(np.random.PCG64((zlib.crc32(payload) << 16) ^ 0xAD10))
    return rng.integers(-32768, 32768, size=n, dtype=np.int16)


def decode_audio(
    payload: bytes, duration_ms: int, sample_rate: int = AUDIO_SAMPLE_RATE
) -> np.ndarray:
    """Audio decode dispatcher (the image decode_image twin): RIFF/WAVE
    byte streams decode for REAL via the pure-python PCM codec
    (sources/wav.py, r7) — sample count and rate come from the stream,
    not the metadata hint; a malformed/compressed WAV raises like a real
    codec would; any other format falls back to the deterministic stub at
    the hinted duration."""
    from erased_cells_spark.sources.wav import WAV_MAGIC, wav_decode_mono

    if bytes(payload[:4]) == WAV_MAGIC:
        _, samples = wav_decode_mono(payload)
        return samples
    return decode_audio_stub(payload, duration_ms, sample_rate)


def extract_audio_features(
    media: DataFrame, sample_rate: int = AUDIO_SAMPLE_RATE, errors: str = "quarantine"
) -> DataFrame:
    """Audio feature extraction: PCM decode → waveform stats (n_samples,
    RMS amplitude). WAV/PCM payloads decode for REAL (sources/wav.py, r7);
    other formats fall back to the deterministic stub. Same
    partition-preserving mapInPandas shape — and the same per-record
    `errors` quarantine contract — as the image/video paths; per-item
    Python loop is inherent to codec calls. Zero-duration audio produces
    NO row (the shared degenerate-input convention with
    media_features_np)."""
    if errors not in ("quarantine", "strict"):
        raise ValueError(f"errors={errors!r} not in ('quarantine', 'strict')")
    strict = errors == "strict"
    schema = (
        AUDIO_FEATURE_SCHEMA if strict else _quarantine_schema(AUDIO_FEATURE_SCHEMA)
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                dur = int(r.duration_ms) if r.duration_ms == r.duration_ms else 0
                if dur <= 0:
                    continue
                try:
                    x = decode_audio(r.payload, dur, sample_rate).astype(np.float64)
                except _CODEC_ERRORS as e:
                    if strict:
                        raise
                    rows.append(
                        {
                            "media_id": int(r.media_id),
                            "n_samples": None,
                            "rms": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
                    continue
                row = {
                    "media_id": int(r.media_id),
                    "n_samples": int(len(x)),
                    "rms": f"{np.sqrt((x ** 2).mean()):.6f}",
                }
                if not strict:
                    row["error"] = None
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(run, schema)


AUDIO_SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("zcr", StringType(), False),               # decimal strings:
        StructField("spectral_centroid_hz", StringType(), False),  # cross-engine-safe
        StructField("spectral_rolloff_hz", StringType(), False),
    ]
)


def audio_spectral_np(
    x: np.ndarray, sample_rate: int, rolloff: float = 0.85
) -> tuple[float, float, float]:
    """Spectral descriptors of one PCM clip — the reference kernel the
    distributed path and the tests share (standard public definitions:
    zero-crossing rate; magnitude-weighted mean frequency; the frequency
    below which `rolloff` of the spectral energy lies). Pure numpy rFFT on
    the MEAN-REMOVED signal: subtracting the mean kills the DC bin exactly
    (not just numerically), so silence or a constant offset reads as no
    tone at all rather than FFT round-off noise."""
    x = np.asarray(x, np.float64)
    if len(x) < 2:
        return 0.0, 0.0, 0.0
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
    mag = np.abs(np.fft.rfft(x - x.mean()))
    mag[0] = 0.0
    freqs = np.fft.rfftfreq(len(x), d=1.0 / float(sample_rate))
    total = mag.sum()
    if total == 0.0:
        return zcr, 0.0, 0.0
    centroid = float((freqs * mag).sum() / total)
    energy = np.cumsum(mag**2)
    k = int(np.searchsorted(energy, rolloff * energy[-1]))
    return zcr, centroid, float(freqs[min(k, len(freqs) - 1)])


def extract_audio_spectral(
    media: DataFrame, sample_rate: int = AUDIO_SAMPLE_RATE, errors: str = "quarantine"
) -> DataFrame:
    """Spectral audio features (r7): zero-crossing rate, spectral centroid,
    and 85% spectral rolloff from the REAL decoded samples — the
    language/music/noise triage stats a corpus pipeline filters on before
    any expensive model sees the clip. Per-clip rFFT is inherent numpy
    work (exactly the Pandas-UDF-appropriate kind); the lane shape is the
    same partition-preserving mapInPandas + per-record quarantine as every
    other media path. Frequencies are Hz from the STREAM's sample rate for
    real WAVs (the hinted rate only feeds the stub fallback)."""
    if errors not in ("quarantine", "strict"):
        raise ValueError(f"errors={errors!r} not in ('quarantine', 'strict')")
    strict = errors == "strict"
    schema = (
        AUDIO_SPECTRAL_SCHEMA if strict else _quarantine_schema(AUDIO_SPECTRAL_SCHEMA)
    )
    feat_cols = ("n_samples", "zcr", "spectral_centroid_hz", "spectral_rolloff_hz")

    def run(batches):
        from erased_cells_spark.sources.wav import WAV_MAGIC, wav_decode_mono

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                dur = int(r.duration_ms) if r.duration_ms == r.duration_ms else 0
                if dur <= 0:
                    continue
                try:
                    if bytes(r.payload[:4]) == WAV_MAGIC:
                        rate, x = wav_decode_mono(r.payload)
                    else:
                        rate = sample_rate
                        x = decode_audio_stub(r.payload, dur, sample_rate)
                except _CODEC_ERRORS as e:
                    if strict:
                        raise
                    rows.append(
                        {"media_id": int(r.media_id), "error": f"{type(e).__name__}: {e}",
                         **{c: None for c in feat_cols}}
                    )
                    continue
                zcr, cent, roll = audio_spectral_np(x, rate)
                row = {
                    "media_id": int(r.media_id),
                    "n_samples": int(len(x)),
                    "zcr": f"{zcr:.6f}",
                    "spectral_centroid_hz": f"{cent:.6f}",
                    "spectral_rolloff_hz": f"{roll:.6f}",
                }
                if not strict:
                    row["error"] = None
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(run, schema)


def synthetic_media_rows(n: int = 64, seed: int = 5) -> list[dict]:
    """Deterministic media fixture rows: payload bytes from a seeded PCG.
    Shared verbatim by the Spark fixture and the local oracle twin."""
    from erased_cells_spark.sources.png import png_encode_gray

    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + (i % 5) * 64)
        w = 32 + (i % 4) * 16 if kind == "image" else None
        h = 24 + (i % 3) * 16 if kind == "image" else None
        dur = 4000 + i * 250 if kind != "image" else None
        mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        if kind == "image":
            # REAL image payloads (r6, color since r7): the pixel plane is
            # the old stub output for these bytes (unchanged rng stream),
            # encoded as an actual byte stream the operators decode for
            # real. The mix cycles: gray JFIF, COLOR 4:2:0 JFIF, COLOR
            # 4:4:4 JFIF, and 8-bit gray PNGs with the filter type cycling
            # so fixtures exercise every unfilter path.
            plane = decode_image_stub(payload, w, h)
            slot = (i // 3) % 4
            if slot == 3:
                from erased_cells_spark.sources.jpeg import jpeg_encode_gray

                payload = jpeg_encode_gray(plane, quality=90)
                mime = "image/jpeg"
            elif slot == 1:
                from erased_cells_spark.sources.jpeg import jpeg_encode_color

                rgb = np.stack(
                    [
                        plane,
                        decode_image_stub(payload + b"G", w, h),
                        decode_image_stub(payload + b"B", w, h),
                    ],
                    axis=-1,
                )
                sub = "420" if (i // 3) % 8 == 1 else "444"
                payload = jpeg_encode_color(rgb, quality=90, subsampling=sub)
                mime = "image/jpeg"
            else:
                payload = png_encode_gray(plane, filter_type=i // 3 % 5)
        elif kind == "audio":
            # REAL audio payloads (r7): the PCM samples are the old stub
            # output for these bytes, packaged as an actual RIFF/WAVE
            # stream the decode_audio dispatcher parses for real.
            from erased_cells_spark.sources.wav import wav_encode_pcm16

            samples = decode_audio_stub(payload, dur)
            payload = wav_encode_pcm16(samples, AUDIO_SAMPLE_RATE)
        elif kind == "video" and (i // 3) % 2 == 0:
            # REAL video payloads (r7): every other video row is an actual
            # MJPEG-AVI at 1 fps — one baseline-JFIF frame per sampled
            # second, frame pixels = the old stub planes for these bytes
            # (per-frame offset seeding, unchanged rng stream), so the
            # fixture exercises container walk + per-frame JPEG decode for
            # real. The other video rows keep raw bytes (the stub-fallback
            # dispatch path for containers with no in-env codec).
            from erased_cells_spark.sources.avi import avi_encode_mjpeg
            from erased_cells_spark.sources.jpeg import jpeg_encode_gray

            n_frames = len(frame_sample_offsets(dur, 1000))
            frames = [
                jpeg_encode_gray(
                    decode_video_frame_stub(
                        payload, int(k * 1000), VIDEO_FRAME_W, VIDEO_FRAME_H
                    ),
                    quality=90,
                )
                for k in range(n_frames)
            ]
            payload = avi_encode_mjpeg(
                frames, fps=1, width=VIDEO_FRAME_W, height=VIDEO_FRAME_H
            )
            mime = "video/x-msvideo"
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": mime,
                "payload": payload,
                "width": w,
                "height": h,
                "duration_ms": dur,
            }
        )
    return rows


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic media fixture as a DataFrame."""
    rows = [{**r, "payload": bytearray(r["payload"])} for r in synthetic_media_rows(n, seed)]
    return local_df(spark, rows, MEDIA_SCHEMA)


def phash_fixture_rows(n: int = 64, seed: int = 5) -> list[dict]:
    """Media fixture for the image near-dup query: the synthetic rows PLUS
    planted byte-identical copies (every image id divisible by 12 gets a
    copy at 1000+id; image 0 gets a second copy at 2000 → one 3-cluster and
    five 2-clusters at n=64). The stub codec is a pure function of the
    payload, so byte-identical payloads are the duplicate class it can
    express (hamming 0); GRADIENT near-duplicates (hamming 1..3 from small
    pixel edits) are proven at the dhash63 unit level on synthetic planes —
    a real codec swap inherits them for free."""
    rows = synthetic_media_rows(n, seed)
    planted = []
    for r in rows:
        if r["kind"] == "image" and r["media_id"] % 12 == 0:
            planted.append({**r, "media_id": 1000 + r["media_id"]})
        if r["kind"] == "image" and r["media_id"] == 0:
            planted.append({**r, "media_id": 2000})
    return rows + planted


def media_dhash_np(n: int = 64, seed: int = 5) -> list[tuple[int, int]]:
    """Driver twin of image_dhash over the phash fixture — deterministic
    stub codec, so expected (media_id, dhash) rows are computable
    driver-side and inlined into the DuckDB oracle (the media_features_np
    convention)."""
    out = []
    for r in phash_fixture_rows(n, seed):
        if r["kind"] != "image":
            continue
        img = decode_image(r["payload"], r["width"], r["height"])
        out.append((r["media_id"], dhash63(img)))
    return out


def media_features_np(n: int = 64, seed: int = 5, out_size: int = 16, every_ms: int = 1000):
    """Local brute-force twin of extract_image_features ∪ extract_video_features
    ∪ extract_audio_features over the synthetic fixture:
    [(media_id, kind, n_units, feature)] — n_units is 1/frames/samples and
    feature is mean-luma/mean-luma/RMS per kind. Used by the pytest oracle
    AND inlined into the DuckDB CORRECTNESS oracle (the stub codecs are
    deterministic, so expected rows are computable driver-side).

    Degenerate-input convention shared with the distributed operators:
    media with duration_ms <= 0 produce NO row on either path."""
    out = []
    for r in synthetic_media_rows(n, seed):
        if r["kind"] == "image":
            img = decode_image(r["payload"], r["width"], r["height"])
            small = resize_nearest(img, out_size, out_size)
            out.append((r["media_id"], "image", 1, f"{small.astype(np.float64).mean():.6f}"))
        elif r["kind"] == "video":
            offs = frame_sample_offsets(r["duration_ms"] or 0, every_ms)
            if len(offs) == 0:
                continue
            frames = np.stack(
                [
                    decode_video_frame(r["payload"], int(o), VIDEO_FRAME_W, VIDEO_FRAME_H)
                    for o in offs
                ]
            )
            out.append(
                (r["media_id"], "video", len(offs), f"{frames.astype(np.float64).mean():.6f}")
            )
        elif r["kind"] == "audio":
            dur = r["duration_ms"] or 0
            if dur <= 0:
                continue
            x = decode_audio(r["payload"], dur).astype(np.float64)
            out.append((r["media_id"], "audio", len(x), f"{np.sqrt((x ** 2).mean()):.6f}"))
    return out
