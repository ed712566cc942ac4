"""Dependency-free media codecs for the multimodal decode path.

The container ships no codec libraries (no pillow/ffmpeg), but three real
container formats ARE decodable with nothing beyond the stdlib:

- **PNG** — stdlib ``zlib`` inflates IDAT; the five scanline filters
  (None/Sub/Up/Average/Paeth) are pure arithmetic. Supported: 8-bit
  depth, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA), non-interlaced — the overwhelmingly common subset. 16-bit
  and Adam7 interlacing raise ``NotImplementedError`` (honest bound).
- **BMP** — BI_RGB uncompressed 8-bit-palette and 24/32-bit DIBs,
  bottom-up or top-down, 4-byte row padding.
- **WAV** — RIFF/WAVE PCM 16-bit (and 8-bit unsigned) ``fmt ``/``data``
  chunk walk.

Everything returns numpy arrays so the ``mapInPandas`` decode batches
stay vectorized (no per-pixel Python). Matching deterministic ENCODERS
exist for each format so the synthetic corpus can carry genuine
containers and round-trip tests can pin exact pixels.

Capability parity with the reference: the reference delegates raster
decode to torchvision/PIL (similarity_search.py has no media path at
all — this module is part of the mandated training-data-pipeline
superset, not a port).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering. ``bpp`` = bytes per pixel. Returns
    (height, width*bpp) uint8. Filters are defined byte-wise on the
    filtered stream (PNG spec §9); Sub/Paeth recurrences are sequential
    per scanline, but rows are short — the numpy fast paths cover
    None/Up and the vectorizable parts of Average."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = (line + prev).astype(np.uint8)
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PNG blob to ``(width, height, luma)`` where ``luma`` is a
    flat uint8 array (ITU-R 601 integer luma for color images — the same
    convention PIL's ``convert("L")`` uses, so a pillow-backed branch
    produces identical stats)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, palette = 8, b"", None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        # malformed-data discipline (round-8 advisory): truncated chunks
        # must surface as ValueError — the error class the decode router
        # backstops — never as an IndexError/struct.error batch-killer
        if pos + 12 + ln > len(data):
            raise ValueError("PNG chunk truncated")
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            if len(body) < 13:
                raise ValueError("PNG IHDR truncated")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
        elif typ == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} outside the "
            "supported subset (8-bit non-interlaced)"
        )
    if ctype not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype}")
    ch = _PNG_CHANNELS[ctype]
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT undecodable: {exc}") from exc
    if len(raw) < h * (1 + w * ch):
        raise ValueError("PNG pixel data truncated")
    pixels = _unfilter(raw, w, h, ch).reshape(h, w, ch)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = pixels[:, :, 0]
        if idx.size and int(idx.max()) >= len(palette):
            raise ValueError(
                f"PNG palette index {int(idx.max())} outside the "
                f"{len(palette)}-entry PLTE"
            )
        rgb = palette[idx]
        luma = _luma601(rgb)
    elif ctype == 0:
        luma = pixels[:, :, 0]
    elif ctype == 4:
        luma = pixels[:, :, 0]  # gray channel; alpha ignored for stats
    else:  # 2 (RGB) or 6 (RGBA) — alpha ignored
        luma = _luma601(pixels[:, :, :3])
    return int(w), int(h), luma.reshape(-1)


def _luma601(rgb: np.ndarray) -> np.ndarray:
    """PIL convert("L") integer luma: (R*299 + G*587 + B*114) / 1000."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as a real grayscale-8 PNG (filter 0
    per scanline, one zlib-deflated IDAT, CRC'd chunks)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w = pixels.shape

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

BMP_MAGIC = b"BM"


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an uncompressed (BI_RGB) BMP to ``(width, height, luma)``.
    Supports 8-bit palette and 24/32-bit true color, bottom-up (positive
    height) and top-down (negative height) row order, 4-byte row pad."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP")
    if len(data) < 54:  # 14-byte file header + 40-byte BITMAPINFOHEADER
        raise ValueError("BMP header truncated")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core header size {hdr_size}")
    w, h_signed = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp}")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = (w * bpp // 8 + 3) & ~3
    if pix_off + row_bytes * h > len(data) or w <= 0:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=pix_off
    ).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette: BITMAPINFOHEADER colors are BGRA quads after the header
        (used,) = struct.unpack("<I", data[46:50])
        n_colors = used or 256
        if 14 + hdr_size + n_colors * 4 > len(data):
            raise ValueError("BMP color table truncated")
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)
        idx = rows[:, :w]
        if idx.size and int(idx.max()) >= n_colors:
            raise ValueError(
                f"BMP palette index {int(idx.max())} outside the "
                f"{n_colors}-entry color table"
            )
        bgr = pal[idx][:, :, :3]
        luma = _luma601(bgr[:, :, ::-1])
    else:
        step = bpp // 8
        px = rows[:, : w * step].reshape(h, w, step)
        luma = _luma601(px[:, :, :3][:, :, ::-1])  # BGR -> RGB
    return int(w), int(h), luma.reshape(-1)


def encode_bmp_24(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a bottom-up 24-bit BI_RGB
    BMP with standard 4-byte row padding."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        line = rgb[y, :, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (row_bytes - len(line))
    pix_off = 14 + 40
    file_size = pix_off + len(body)
    header = (
        BMP_MAGIC
        + struct.pack("<IHHI", file_size, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

WAV_MAGIC = b"RIFF"


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a RIFF/WAVE PCM blob. Returns ``(n_channels, sample_rate,
    n_frames, samples)`` with ``samples`` int16 of shape (n_frames *
    n_channels,). Supports PCM 16-bit signed and 8-bit unsigned
    (widened to int16)."""
    if data[:4] != WAV_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    samples = None
    n_ch = rate = bits = 0
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt, n_ch, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif typ == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            if fmt != 1:
                raise NotImplementedError(f"WAV format tag {fmt} (not PCM)")
            if bits == 16:
                samples = np.frombuffer(body, dtype="<i2").astype(np.int16)
            elif bits == 8:
                samples = (
                    np.frombuffer(body, dtype=np.uint8).astype(np.int16) - 128
                ) * 256
            else:
                raise NotImplementedError(f"WAV bit depth {bits}")
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if samples is None:
        raise ValueError("WAV missing data chunk")
    return int(n_ch), int(rate), len(samples) // max(n_ch, 1), samples


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000, n_ch: int = 1) -> bytes:
    """Encode int16 samples as a canonical PCM-16 RIFF/WAVE blob."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    chunks = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    return WAV_MAGIC + struct.pack("<I", len(chunks)) + chunks


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

GIF_MAGIC = b"GIF8"


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: variable code width (min+1 .. 12 bits,
    LSB-first packing), CLEAR resets the table, EOI ends the stream.
    Width grows when the next table slot reaches 2^width (GIF spec
    convention, no early-change)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = bit_count = pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, bit_count, pos
        while bit_count < width:
            if pos >= len(data):
                return eoi  # truncated stream: treat as end
            acc |= data[pos] << bit_count
            bit_count += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bit_count -= width
        return code

    def fresh_table() -> list[bytes | None]:
        t: list[bytes | None] = [bytes([i]) for i in range(clear)]
        t += [None, None]  # clear, eoi slots
        return t

    table = fresh_table()
    width = min_code_size + 1
    # next_code MIRRORS THE ENCODER'S counter: it increments once per
    # received code (the first code after a clear too, which assigns no
    # table entry), NOT with the table length — the table itself stays
    # one slot behind. The width bump is giflib's RunningCode rule
    # (`++RunningCode > MaxCode1`): grow when the counter EXCEEDS
    # 2^width, i.e. at 9 bits codes #1..#255 after a clear are 9-bit
    # and #256 is the first 10-bit code. Both `==` (bump one early,
    # TIFF-style) and table-length tracking (one late) desynchronize
    # against real-world GIF encoders — relearned twice this round,
    # pinned by the boundary test against a spec-faithful compressor.
    next_code = eoi + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if next_code < 4096:
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def decode_gif(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the FIRST frame of a GIF87a/89a to ``(width, height,
    luma)`` — global or local color table, non-interlaced (interlaced
    frames raise ``NotImplementedError``; animations beyond the first
    frame are out of stats scope by design)."""
    if data[:4] != GIF_MAGIC or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("GIF header truncated")

    # malformed-data discipline (round-8 advisory): every block-walk read
    # is bounds-checked so truncation surfaces as ValueError (the class
    # the decode router backstops), never IndexError
    def need(upto: int) -> None:
        if upto > len(data):
            raise ValueError("GIF block data truncated")

    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        need(pos + n * 3)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            need(pos + 1)
            while data[pos] != 0:
                pos += 1 + data[pos]
                need(pos + 1)
            pos += 1
        elif b == 0x2C:  # image descriptor
            need(pos + 10)
            _l, _t, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                need(pos + n * 3)
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF")
            if pal is None:
                raise ValueError("GIF frame without a color table")
            need(pos + 2)
            mcs = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                need(pos + 1 + ln + 1)
                stream += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(stream), mcs, w * h), np.uint8
            )
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            if idx.size and int(idx.max()) >= len(pal):
                raise ValueError(
                    f"GIF pixel index {int(idx.max())} outside the "
                    f"{len(pal)}-entry color table"
                )
            luma = _luma601(pal[idx.reshape(h, w)])
            return int(w), int(h), luma.reshape(-1)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif_gray(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as a real single-frame GIF87a with a
    256-entry grayscale table. The LZW stream uses the classic
    minimal-encoder form: literal 9-bit codes with a CLEAR every 253
    symbols so the code width never grows — byte-for-byte valid per the
    spec, just uncompressed (every real decoder accepts it)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w = pixels.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    gray = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += gray.tobytes()  # 256x3 grayscale GCT
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([8])  # LZW min code size
    # bit writer, LSB-first, 9-bit codes
    acc = bit_count = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, bit_count
        acc |= code << bit_count
        bit_count += 9
        while bit_count >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            bit_count -= 8

    emit(256)  # initial CLEAR
    for i, px in enumerate(pixels.reshape(-1)):
        if i and i % 253 == 0:
            emit(256)  # keep the decoder's table below the width bump
        emit(int(px))
    emit(257)  # EOI
    if bit_count:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
