"""Dependency-free codec tests (operators/codecs.py).

Strategy: the encoders produce canonical containers with KNOWN pixels /
samples; the decoders must recover them exactly. For PNG the decoder
supports all five scanline filters while the encoder emits only filter 0,
so the tests implement the FORWARD filters independently (straight from
the PNG spec §9 equations) and verify the decoder inverts each one —
the reference implementation is the spec, not the code under test.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from vectordb_similarity_search_spark.operators import codecs


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_gray_roundtrip_exact():
    px = _rng(1).integers(0, 256, size=(13, 7), dtype=np.uint8)
    blob = codecs.encode_png_gray(px)
    w, h, luma = codecs.decode_png(blob)
    assert (w, h) == (7, 13)
    np.testing.assert_array_equal(luma, px.reshape(-1))


def test_png_matches_committed_fixture():
    """The vendored real PNG (known pixels, produced by a reference
    encoder outside this repo) decodes to its documented pixel values."""
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_gray.png")
    w, h, luma = codecs.decode_png(open(path, "rb").read())
    assert (w, h) == (4, 2)
    np.testing.assert_array_equal(
        luma, np.array([10, 20, 30, 40, 50, 60, 70, 255], dtype=np.uint8)
    )


def _forward_filter(pixels: np.ndarray, ftypes: list[int], bpp: int) -> bytes:
    """PNG spec §9 forward filters, implemented independently of the
    decoder: Filt(x) for Sub/Up/Average/Paeth over the RAW scanlines."""
    h, stride = pixels.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        raw = pixels[y].astype(np.int32)
        ft = ftypes[y % len(ftypes)]
        line = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = raw[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[i] = (raw[i] - pred) & 0xFF
        out += bytes([ft]) + bytes(line.astype(np.uint8))
        prev = raw
    return bytes(out)


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _build_png(pixels: np.ndarray, ctype: int, ftypes: list[int]) -> bytes:
    """Hand-assemble a PNG whose scanlines use the given filter types."""
    if pixels.ndim == 2:
        h, w, ch = pixels.shape[0], pixels.shape[1], 1
        flat = pixels.reshape(h, w)
    else:
        h, w, ch = pixels.shape
        flat = pixels.reshape(h, w * ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = _forward_filter(flat, ftypes, ch)
    return (
        codecs.PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type_inverts(ftype):
    px = _rng(10 + ftype).integers(0, 256, size=(9, 11), dtype=np.uint8)
    blob = _build_png(px, ctype=0, ftypes=[ftype])
    w, h, luma = codecs.decode_png(blob)
    assert (w, h) == (11, 9)
    np.testing.assert_array_equal(luma, px.reshape(-1))


def test_png_mixed_filters_rgb_luma():
    px = _rng(5).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    blob = _build_png(px, ctype=2, ftypes=[0, 1, 2, 3, 4])
    w, h, luma = codecs.decode_png(blob)
    assert (w, h) == (5, 6)
    expected = (
        px[:, :, 0].astype(np.uint32) * 299
        + px[:, :, 1].astype(np.uint32) * 587
        + px[:, :, 2].astype(np.uint32) * 114
    ) // 1000
    np.testing.assert_array_equal(luma, expected.reshape(-1).astype(np.uint8))


def test_png_rgba_ignores_alpha():
    px = _rng(6).integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    blob = _build_png(px, ctype=6, ftypes=[4, 2])
    _, _, luma = codecs.decode_png(blob)
    expected = (
        px[:, :, 0].astype(np.uint32) * 299
        + px[:, :, 1].astype(np.uint32) * 587
        + px[:, :, 2].astype(np.uint32) * 114
    ) // 1000
    np.testing.assert_array_equal(luma, expected.reshape(-1).astype(np.uint8))


def test_png_palette():
    pal = _rng(7).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(8).integers(0, 16, size=(5, 6), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0)
    raw = _forward_filter(idx.reshape(5, 6), [0, 1], 1)
    blob = (
        codecs.PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    w, h, luma = codecs.decode_png(blob)
    rgb = pal[idx]
    expected = (
        rgb[:, :, 0].astype(np.uint32) * 299
        + rgb[:, :, 1].astype(np.uint32) * 587
        + rgb[:, :, 2].astype(np.uint32) * 114
    ) // 1000
    np.testing.assert_array_equal(luma, expected.reshape(-1).astype(np.uint8))


def test_png_unsupported_subsets_raise_not_implemented():
    px = np.zeros((2, 2), dtype=np.uint8)
    blob = codecs.encode_png_gray(px)
    # flip depth byte to 16 inside IHDR (offset: 8 magic + 8 chunk hdr + 8 w/h)
    depth16 = blob[:24] + b"\x10" + blob[25:]
    with pytest.raises(NotImplementedError):
        codecs.decode_png(depth16)
    with pytest.raises(ValueError):
        codecs.decode_png(b"nope" * 4)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp24_roundtrip_luma():
    # width 5 forces row padding (15 bytes -> 16)
    px = _rng(2).integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    blob = codecs.encode_bmp_24(px)
    w, h, luma = codecs.decode_bmp(blob)
    assert (w, h) == (5, 7)
    expected = (
        px[:, :, 0].astype(np.uint32) * 299
        + px[:, :, 1].astype(np.uint32) * 587
        + px[:, :, 2].astype(np.uint32) * 114
    ) // 1000
    np.testing.assert_array_equal(luma, expected.reshape(-1).astype(np.uint8))


def test_bmp8_palette_and_topdown():
    """Hand-assembled 8-bit palette BMP, top-down (negative height)."""
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, 0] = np.arange(256)  # blue ramp
    pal[:, 1] = 255 - np.arange(256)  # green ramp
    idx = _rng(3).integers(0, 256, size=(3, 6), dtype=np.uint8)
    row_bytes = (6 + 3) & ~3
    body = b"".join(
        idx[y].tobytes() + b"\x00" * (row_bytes - 6) for y in range(3)
    )
    pix_off = 14 + 40 + 256 * 4
    header = (
        b"BM"
        + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, 6, -3, 1, 8, 0, len(body), 0, 0, 256, 0)
    )
    blob = header + pal.tobytes() + body
    w, h, luma = codecs.decode_bmp(blob)
    assert (w, h) == (6, 3)
    # palette is BGRA: B=v, G=255-v, R=0
    expected = (
        (255 - idx.astype(np.uint32)) * 587 + idx.astype(np.uint32) * 114
    ) // 1000
    np.testing.assert_array_equal(luma, expected.reshape(-1).astype(np.uint8))


def test_bmp_rejects_compressed():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(codecs.encode_bmp_24(px))
    blob[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError):
        codecs.decode_bmp(bytes(blob))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_pcm16_roundtrip():
    samples = _rng(4).integers(-30000, 30000, size=777, dtype=np.int64).astype(
        np.int16
    )
    blob = codecs.encode_wav_pcm16(samples, rate=8000)
    n_ch, rate, n_frames, out = codecs.decode_wav(blob)
    assert (n_ch, rate, n_frames) == (1, 8000, 777)
    np.testing.assert_array_equal(out, samples)


def test_wav_pcm8_widens():
    body8 = bytes(range(0, 256, 8))
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body8)) + body8
    )
    blob = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    n_ch, rate, n_frames, out = codecs.decode_wav(blob)
    assert (n_ch, rate, n_frames) == (1, 4000, 32)
    expected = (np.frombuffer(body8, dtype=np.uint8).astype(np.int16) - 128) * 256
    np.testing.assert_array_equal(out, expected)


def test_wav_rejects_non_pcm():
    samples = np.zeros(4, dtype=np.int16)
    blob = bytearray(codecs.encode_wav_pcm16(samples))
    blob[20] = 3  # IEEE float format tag
    with pytest.raises(NotImplementedError):
        codecs.decode_wav(bytes(blob))


# ---------------------------------------------------------------------------
# Integration with the decode router
# ---------------------------------------------------------------------------


def test_decode_one_routes_builtin_codecs():
    from vectordb_similarity_search_spark.operators.multimodal import _decode_one

    png = codecs.encode_png_gray(np.full((3, 4), 100, dtype=np.uint8))
    w, h, mean, label = _decode_one(png)
    assert (w, h, mean, label) == (4, 3, 100.0, "png-builtin")

    bmp = codecs.encode_bmp_24(np.full((2, 2, 3), 50, dtype=np.uint8))
    w, h, mean, label = _decode_one(bmp)
    assert (w, h, label) == (2, 2, "bmp-builtin")
    assert mean == pytest.approx((50 * 299 + 50 * 587 + 50 * 114) // 1000)

    wav = codecs.encode_wav_pcm16(np.zeros(64, dtype=np.int16))
    w, h, mean, label = _decode_one(wav)
    assert (w, h, mean, label) == (64, 1, 128.0, "wav-builtin")


def test_decode_one_png_pillow_backstop_for_unsupported_subset():
    """A 16-bit PNG is past the builtin bound: with no pillow module it
    raises; with an injected module it routes there and labels it."""
    from vectordb_similarity_search_spark.operators.multimodal import _decode_one

    blob = codecs.encode_png_gray(np.zeros((2, 2), dtype=np.uint8))
    depth16 = blob[:24] + b"\x10" + blob[25:]
    with pytest.raises(NotImplementedError):
        _decode_one(depth16)

    class _Img:
        size = (2, 2)

        def convert(self, mode):
            return self

        def tobytes(self):
            return b"\x00" * 4

    class _Mod:
        @staticmethod
        def open(buf):
            return _Img()

    w, h, mean, label = _decode_one(depth16, pillow_image_mod=_Mod)
    assert (w, h, mean, label) == (2, 2, 0.0, "pillow")
