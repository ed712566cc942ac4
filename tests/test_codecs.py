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


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def test_gif_gray_roundtrip_exact():
    px = _rng(11).integers(0, 256, size=(23, 17), dtype=np.uint8)
    blob = codecs.encode_gif_gray(px)
    assert blob[:6] == b"GIF87a" and blob.endswith(b"\x3b")
    w, h, luma = codecs.decode_gif(blob)
    assert (w, h) == (17, 23)
    np.testing.assert_array_equal(luma, px.reshape(-1))


def _lzw_compress(indices, min_code_size):
    """Spec-derived REAL GIF LZW compressor (greedy longest-match,
    variable width, table reset at 4096) — independent of the decoder,
    so the decoder's table-building path is tested against the spec,
    not against the repo's literal-code encoder."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0

    def emit(code, width):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    cur = b""
    for px in indices:
        nxt = cur + bytes([int(px)])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # giflib convention: the width grows when the counter
            # EXCEEDS 2^width — emission #256 after a clear is the
            # first 10-bit code, not #255
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        cur = bytes([int(px)])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_decoder_inverts_real_compressor():
    """Repetitive pixels force long table matches and the KwKwK case;
    enough pixels force a width bump past 9 bits."""
    rng = _rng(12)
    # blocky image: runs + repeats to exercise real compression
    base = rng.integers(0, 8, size=(40, 40), dtype=np.uint8) * 32
    px = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)  # 80x80
    stream = _lzw_compress(px.reshape(-1), 8)
    got = np.frombuffer(
        codecs._lzw_decode(stream, 8, px.size), np.uint8
    )
    np.testing.assert_array_equal(got, px.reshape(-1))


def test_gif_hand_assembled_with_real_lzw_and_palette():
    """Full container with the test's REAL LZW stream and a color
    palette: decode must produce the 601 luma of the palette lookup."""
    import struct as _struct

    pal = _rng(13).integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = np.tile(
        _rng(14).integers(0, 256, size=(4, 30), dtype=np.uint8), (5, 1)
    )  # 20x30, vertically repetitive
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += pal.tobytes()
    # throw in a graphic-control extension to exercise the skip path
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + _struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([8])
    stream = _lzw_compress(idx.reshape(-1), 8)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    gw, gh, luma = codecs.decode_gif(bytes(out))
    assert (gw, gh) == (w, h)
    rgb = pal[idx]
    expected = (
        rgb[:, :, 0].astype(np.uint32) * 299
        + rgb[:, :, 1].astype(np.uint32) * 587
        + rgb[:, :, 2].astype(np.uint32) * 114
    ) // 1000
    np.testing.assert_array_equal(luma, expected.reshape(-1).astype(np.uint8))


def test_gif_lzw_width_boundary_matches_giflib_convention():
    """THE boundary that desynchronized this decoder twice: with 8-bit
    codes, emissions #1..#255 after a clear are 9-bit and #256 is the
    first 10-bit code (giflib `++RunningCode > MaxCode1`). Incompressible
    pixels make every emission a literal, so emission index == pixel
    index and the boundary is crossed exactly at pixel 256."""
    rng = _rng(15)
    # 600 pixels with no repeated pair -> compressor emits one literal
    # per pixel, crossing the 9->10 bit boundary at emission #256
    px = np.arange(600, dtype=np.int64) * 131 % 251
    px = px.astype(np.uint8)
    stream = _lzw_compress(px, 8)
    got = np.frombuffer(codecs._lzw_decode(stream, 8, px.size), np.uint8)
    np.testing.assert_array_equal(got, px)


def test_gif_interlaced_raises_and_router_labels():
    blob = bytearray(codecs.encode_gif_gray(np.zeros((3, 3), dtype=np.uint8)))
    # image descriptor packed byte: header(6)+lsd(7)+gct(768)+1 sep+8 desc
    ipacked_off = 6 + 7 + 768 + 9
    assert blob[ipacked_off - 9] == 0x2C
    blob[ipacked_off] |= 0x40  # set interlace bit
    with pytest.raises(NotImplementedError, match="interlaced"):
        codecs.decode_gif(bytes(blob))

    from vectordb_similarity_search_spark.operators.multimodal import _decode_one

    gif = codecs.encode_gif_gray(np.full((4, 5), 77, dtype=np.uint8))
    w, h, mean, label = _decode_one(gif)
    assert (w, h, mean, label) == (5, 4, 77.0, "gif-builtin")


def test_malformed_blobs_raise_valueerror_not_batch_killers():
    """Round-8 advisory: malformed data must surface as ValueError — the
    class _decode_one backstops to pillow — never as IndexError /
    struct.error / zlib.error, which would kill the whole Arrow batch.
    Each case held a non-ValueError escape hatch before the fix."""
    import struct as _s
    import zlib as _z

    # PNG: palette index beyond the PLTE (1-entry palette, index 3)
    def chunk(typ, body):
        return (
            _s.pack(">I", len(body)) + typ + body
            + _s.pack(">I", _z.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = _s.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = b"\x00" + bytes([3, 0])  # filter 0, indices 3 and 0
    bad_png = (
        codecs.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", b"\x10\x20\x30")
        + chunk(b"IDAT", _z.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        codecs.decode_png(bad_png)

    # PNG: truncated chunk walk (length field exceeds the blob)
    good = codecs.encode_png_gray(np.full((4, 4), 9, np.uint8))
    with pytest.raises(ValueError):
        codecs.decode_png(good[:20])
    # PNG: pixel data shorter than h*(1+stride)
    short_raw = _z.compress(b"\x00" + b"\x01")  # 1 of 2 scanlines
    bad_px = (
        codecs.PNG_MAGIC
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", short_raw)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_png(bad_px)

    # GIF: truncated mid sub-block walk
    gif = codecs.encode_gif_gray(np.full((6, 6), 50, np.uint8))
    with pytest.raises(ValueError):
        codecs.decode_gif(gif[: len(gif) // 2])
    # GIF: pixel index beyond a small local color table
    # (hand-build: 4-entry GCT but literal pixel code 7 at mcs=3)
    hdr = b"GIF87a" + _s.pack("<HHBBB", 1, 1, 0x80 | 0x01, 0, 0)
    gct = bytes(12)  # 4 entries x 3
    desc = b"\x2c" + _s.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
    # mcs=3: clear=8, eoi=9, 4-bit codes LSB-first: CLEAR(8), 7, EOI(9)
    acc = 8 | (7 << 4) | (9 << 8)
    stream = bytes([acc & 0xFF, (acc >> 8) & 0xFF])
    bad_gif = hdr + gct + desc + bytes([3, len(stream)]) + stream + b"\x00\x3b"
    with pytest.raises(ValueError, match="outside"):
        codecs.decode_gif(bad_gif)

    # BMP: header truncated / palette index beyond a short color table
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"BM" + bytes(10))
    pal_hdr = (
        b"BM"
        + _s.pack("<IHHI", 14 + 40 + 8 + 4, 0, 0, 14 + 40 + 8)
        + _s.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 0, 0, 2, 2)
    )
    bad_bmp = pal_hdr + bytes(8) + bytes([9, 0, 0, 0])  # idx 9, 2 colors
    with pytest.raises(ValueError, match="outside"):
        codecs.decode_bmp(bad_bmp)

    # WAV: fmt chunk shorter than 16 bytes
    bad_wav = (
        b"RIFF" + _s.pack("<I", 14) + b"WAVE"
        + b"fmt " + _s.pack("<I", 4) + bytes(4)
    )
    with pytest.raises(ValueError, match="fmt"):
        codecs.decode_wav(bad_wav)


def test_decode_one_bmp_pillow_backstop():
    """Round-8 advisory: the BMP branch backstops to pillow exactly like
    PNG/GIF — an out-of-subset (RLE-compressed) BMP routes to an injected
    PIL-compatible module instead of raising when one is importable, and
    still raises honestly when none is."""
    import struct as _s

    from vectordb_similarity_search_spark.operators.multimodal import (
        _decode_one,
    )

    rle_bmp = (
        b"BM"
        + _s.pack("<IHHI", 62, 0, 0, 54)
        + _s.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 1, 8, 0, 0, 0, 0)  # BI_RLE8
        + bytes(8)
    )
    with pytest.raises(NotImplementedError, match="compression"):
        _decode_one(rle_bmp)

    class _FakeImg:
        size = (2, 2)

        def convert(self, mode):
            return self

        def tobytes(self):
            return bytes([10, 20, 30, 40])

    class _FakeImageMod:
        @staticmethod
        def open(buf):
            return _FakeImg()

    w, h, mean, label = _decode_one(rle_bmp, pillow_image_mod=_FakeImageMod)
    assert (w, h, label) == (2, 2, "pillow")
    assert mean == 25.0


# ---------------------------------------------------------------------------
# JPEG (round 8 — the last raster codec, closing the pillow seam)
# ---------------------------------------------------------------------------


def test_jpeg_constant_and_smooth_roundtrip_exact():
    """DC-only content must survive exactly; a blockwise-smooth gradient
    at quality 95 reproduces exactly too (all energy in low-frequency
    coefficients the q95 table keeps at step 1-2)."""
    px = np.full((24, 17), 97, np.uint8)
    w, h, luma = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=95))
    assert (w, h) == (17, 24)
    np.testing.assert_array_equal(luma.reshape(24, 17), px)

    ramp = np.tile((np.arange(32, dtype=np.uint8) * 4), (16, 1))
    w, h, luma = codecs.decode_jpeg(codecs.encode_jpeg(ramp, quality=95))
    np.testing.assert_array_equal(luma.reshape(16, 32), ramp)


def test_jpeg_noise_roundtrip_bounded_and_orientation_correct():
    """Incompressible noise at quality 95 stays within the quantization
    error bound, and the decode is orientation-true: a horizontal ramp
    must come back closer to itself than to its transpose-pattern — the
    test that a zigzag/IDCT transpose bug cannot pass."""
    rng = np.random.default_rng(11)
    nz = rng.integers(0, 256, (40, 33), dtype=np.uint8)
    w, h, luma = codecs.decode_jpeg(codecs.encode_jpeg(nz, quality=95))
    err = np.abs(luma.reshape(40, 33).astype(int) - nz.astype(int))
    assert err.mean() < 3 and err.max() <= 15, (err.mean(), err.max())

    hramp = np.tile((np.arange(16, dtype=np.uint8) * 16), (16, 1))
    vramp = hramp.T.copy()
    for img in (hramp, vramp):
        _, _, luma = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=95))
        got = luma.reshape(16, 16).astype(int)
        self_err = np.abs(got - img.astype(int)).mean()
        flip_err = np.abs(got - img.T.astype(int)).mean()
        assert self_err <= 1 and flip_err > 20 * (self_err + 0.05), (
            self_err,
            flip_err,
        )


def test_jpeg_orientation_test_kills_miszigzagged_decoder(monkeypatch):
    """GIF-lesson discipline: the orientation test above must be PROVEN
    to kill the classic wrong variant. A decoder reading coefficients
    through a TRANSPOSED zigzag (the row/col swap bug) must fail it."""
    hramp = np.tile((np.arange(16, dtype=np.uint8) * 16), (16, 1))
    blob = codecs.encode_jpeg(hramp, quality=95)
    zz_t = [(i % 8) * 8 + i // 8 for i in codecs._ZZ]
    monkeypatch.setattr(codecs, "_ZZ", zz_t)
    _, _, luma = codecs.decode_jpeg(blob)
    got = luma.reshape(16, 16).astype(int)
    self_err = np.abs(got - hramp.astype(int)).mean()
    assert self_err > 10, self_err  # the wrong variant CANNOT stay close


def test_jpeg_color_chroma_channels_not_swapped():
    """Pure red and pure blue constants decode to their distinct 601
    lumas (76 vs 29) — a Cb/Cr swap maps one onto the other's range."""
    for rgbv, want in (((255, 0, 0), 76), ((0, 0, 255), 29)):
        img = np.zeros((16, 16, 3), np.uint8)
        img[..., 0], img[..., 1], img[..., 2] = rgbv
        for ss in ("4:4:4", "4:2:2", "4:2:0"):
            _, _, luma = codecs.decode_jpeg(
                codecs.encode_jpeg(img, quality=95, subsample=ss)
            )
            got = float(luma.mean())
            assert abs(got - want) <= 3, (rgbv, ss, got)


def test_jpeg_subsampled_sizes_and_odd_dims():
    """4:2:0 with odd dimensions: the chroma planes pad/crop correctly
    and the luma channel still reproduces a smooth image closely."""
    rng = np.random.default_rng(5)
    base = np.linspace(30, 220, 21 * 19).reshape(21, 19)
    img = np.stack(
        [base, np.roll(base, 3, axis=1), base[::-1]], axis=-1
    ).astype(np.uint8)
    for ss in ("4:2:0", "4:2:2"):
        w, h, luma = codecs.decode_jpeg(
            codecs.encode_jpeg(img, quality=95, subsample=ss)
        )
        assert (w, h) == (19, 21), ss
        want = (
            img[..., 0].astype(np.uint32) * 299
            + img[..., 1].astype(np.uint32) * 587
            + img[..., 2].astype(np.uint32) * 114
        ) // 1000
        err = np.abs(luma.reshape(21, 19).astype(int) - want.astype(int))
        assert err.mean() < 6, (ss, err.mean())


def test_jpeg_restart_markers_bit_identical():
    """DRI/RSTn only resets predictors and byte-aligns — decoded pixels
    must equal the no-restart encode exactly."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    plain = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=90))
    rst = codecs.decode_jpeg(
        codecs.encode_jpeg(px, quality=90, restart_interval=2)
    )
    assert plain[:2] == rst[:2]
    np.testing.assert_array_equal(plain[2], rst[2])


def test_jpeg_honest_bounds_and_malformed():
    """Progressive raises NotImplementedError; truncation and garbage
    raise ValueError (the router-backstopped class)."""
    px = np.full((8, 8), 50, np.uint8)
    blob = bytearray(codecs.encode_jpeg(px, quality=90))
    sof = bytes(blob).find(b"\xff\xc0")
    assert sof > 0
    prog = bytes(blob[:sof]) + b"\xff\xc2" + bytes(blob[sof + 2 :])
    with pytest.raises(NotImplementedError, match="progressive"):
        codecs.decode_jpeg(prog)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(bytes(blob[: len(blob) // 2]))
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"\xff\xd8\xff" + b"\x00" * 8)
    with pytest.raises(ValueError, match="quality"):
        codecs.encode_jpeg(px, quality=0)


def test_jpeg_router_label_and_pillow_backstop():
    """_decode_one routes JPEG through the builtin (deterministic label)
    and backstops out-of-subset streams to an injected pillow module."""
    from vectordb_similarity_search_spark.operators.multimodal import (
        _decode_one,
    )

    px = np.full((6, 9), 123, np.uint8)
    blob = codecs.encode_jpeg(px, quality=95)
    w, h, mean, label = _decode_one(blob)
    assert (w, h, label) == (9, 6, "jpeg-builtin")
    assert abs(mean - 123.0) < 1.0

    sof = blob.find(b"\xff\xc0")
    prog = blob[:sof] + b"\xff\xc2" + blob[sof + 2 :]
    with pytest.raises(NotImplementedError, match="progressive"):
        _decode_one(prog)

    class _FakeImg:
        size = (9, 6)

        def convert(self, mode):
            return self

        def tobytes(self):
            return bytes([7] * 54)

    class _FakeImageMod:
        @staticmethod
        def open(buf):
            return _FakeImg()

    w, h, mean, label = _decode_one(prog, pillow_image_mod=_FakeImageMod)
    assert (w, h, label) == (9, 6, "pillow")


def test_jpeg_non_divisible_sampling_raises_not_implemented():
    """Advisory fix: spec-legal but non-divisible sampling combos (e.g.
    Y 3x1 with Cb 2x1) must raise NotImplementedError — the replication
    upsampler's integer repeat factor would silently misalign the
    planes — so the decode router's pillow backstop handles them."""
    img = np.stack(
        [np.full((16, 16), v, np.uint8) for v in (90, 120, 200)], axis=-1
    )
    blob = bytearray(codecs.encode_jpeg(img, quality=90, subsample="4:2:0"))
    sof = bytes(blob).find(b"\xff\xc0")
    assert sof > 0
    # SOF0 layout: marker(2) len(2) prec(1) h(2) w(2) ncomp(1), then
    # per-component id(1) sampling(1) tq(1): Y sampling at sof+11,
    # Cb sampling at sof+14
    assert blob[sof + 11] == 0x22  # 4:2:0 encode: Y is 2x2
    blob[sof + 11] = 0x31  # Y 3x1
    blob[sof + 14] = 0x21  # Cb 2x1 -> hmax=3 not divisible by 2
    with pytest.raises(NotImplementedError, match="sampling"):
        codecs.decode_jpeg(bytes(blob))
