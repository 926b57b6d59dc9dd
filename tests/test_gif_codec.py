"""Baseline GIF codec contracts (sources/gif.py): decode of a
HAND-ASSEMBLED spec fixture (bytes derived from the GIF89a spec by
hand, independent of our encoder), encode->decode roundtrips across LZW
width growth and the 4096-entry table reset, luma convention, fail-loud
out-of-scope paths, and the multimodal dispatcher + quarantine hook."""

import numpy as np
import pytest

from erased_cells_spark.sources.gif import (
    GifFormatError,
    gif_decode,
    gif_decode_luma,
    gif_encode,
)


def _pack(codes):
    acc = nb = 0
    out = bytearray()
    for c, w in codes:
        acc |= c << nb
        nb += w
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        out.append(acc & 0xFF)
    return bytes(out)


def _spec_fixture():
    """2x2, 4-color table, pixels [0,1,2,3] — code widths derived by hand
    from the spec (the 4th pixel's code is read AFTER the decoder created
    entry 7, so it and END are 4-bit)."""
    stream = _pack([(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)])
    hdr = b"GIF87a" + (2).to_bytes(2, "little") * 2 + bytes([0x81, 0, 0])
    pal = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 40, 40])
    img = b"\x2c" + b"\0" * 4 + (2).to_bytes(2, "little") * 2 + b"\0" + bytes([2])
    return hdr + pal + img + bytes([len(stream)]) + stream + b"\x00\x3b"


def test_hand_assembled_spec_fixture():
    rgb = gif_decode(_spec_fixture())
    assert rgb.reshape(4, 3).tolist() == [
        [10, 0, 0], [0, 20, 0], [0, 0, 30], [40, 40, 40]
    ]


def test_roundtrip_across_width_growth_and_table_reset():
    rng = np.random.RandomState(7)
    for n_pal, shape in [(4, (40, 40)), (16, (32, 32)), (256, (128, 128))]:
        pal = rng.randint(0, 256, size=(n_pal, 3), dtype=np.uint8)
        pal[:, 0] = np.arange(n_pal) % 256  # index-identifying channel
        idx = rng.randint(0, n_pal, size=shape, dtype=np.uint8)
        rgb = gif_decode(gif_encode(idx, pal))
        assert (rgb[:, :, 0] == idx).all()  # (128,128)@256 crosses the 4096 reset


def test_luma_convention_matches_png():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    luma = gif_decode_luma(gif_encode(idx, pal))
    p = pal.astype(np.uint32)
    want = (77 * p[:, 0] + 150 * p[:, 1] + 29 * p[:, 2]) >> 8
    assert luma.tolist() == [[want[0], want[1]], [want[2], want[3]]]


def test_fail_loud_out_of_scope():
    good = bytearray(gif_encode(np.zeros((4, 4), np.uint8), np.zeros((4, 3), np.uint8)))
    with pytest.raises(GifFormatError):
        gif_decode(b"NOTAGIF")
    with pytest.raises(GifFormatError):
        gif_decode(bytes(good[:20]))  # truncated
    interlaced = bytearray(good)
    # image descriptor flags byte: header(13) + GCT(12) + 9th byte of 0x2C block
    iflag_off = 13 + 12 + 9
    assert interlaced[13 + 12] == 0x2C
    interlaced[iflag_off] |= 0x40
    with pytest.raises(GifFormatError, match="interlmeans|interlaced"):
        gif_decode(bytes(interlaced))


def test_89a_extensions_skipped_and_animation_rejected():
    base = gif_encode(np.array([[1, 2], [3, 0]], np.uint8),
                      np.arange(12, dtype=np.uint8).reshape(4, 3))
    # splice a graphic-control extension between header+GCT and the image
    head, img = base[: 13 + 12], base[13 + 12 :]
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out = gif_decode(bytes(b"GIF89a" + head[6:] + ext + img))
    assert out.shape == (2, 2, 3)
    # a second image block = animation -> loud
    animated = head + img[:-1] + img  # drop trailer, append second image
    with pytest.raises(GifFormatError, match="animated"):
        gif_decode(bytes(animated))


def test_dispatcher_and_quarantine(spark):
    from erased_cells_spark.operators.multimodal import decode_image

    pal = np.array([[0, 0, 0], [255, 255, 255], [9, 9, 9], [1, 2, 3]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    data = gif_encode(idx, pal)
    luma = decode_image(data, 99, 99)  # dims come from the stream, not hints
    assert luma.shape == (2, 2)
    with pytest.raises(GifFormatError):
        decode_image(data[:18], 2, 2)  # truncated GIF raises, never stubs


def test_gif_through_media_features_and_quarantine(spark):
    """A good GIF decodes REAL features through extract_image_features;
    a truncated GIF lands in quarantine (GifFormatError is a ValueError)
    while the batch completes."""
    from erased_cells_spark.operators.multimodal import (
        extract_image_features,
        media_quarantine,
    )

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (np.add.outer(np.arange(24), np.arange(24)) % 16).astype(np.uint8)
    good = gif_encode(idx, pal)
    rows = [
        {"media_id": 1, "kind": "image", "mime": "image/gif",
         "payload": bytearray(good), "width": 24, "height": 24, "duration_ms": None},
        {"media_id": 2, "kind": "image", "mime": "image/gif",
         "payload": bytearray(good[:25]), "width": 24, "height": 24,
         "duration_ms": None},
    ]
    from erased_cells_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_image_features(media, out_size=8)
    got = {r.media_id: r for r in feats.collect()}
    assert got[1].error is None and got[1].cols == 8 and got[1].rows == 8
    assert got[1].mean_luma is not None
    assert got[2].error is not None
    q = {r.media_id for r in media_quarantine(feats).collect()}
    assert q == {2}
