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


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT) — round-8, closing the last pillow seam
# ---------------------------------------------------------------------------

JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag index: _ZIGZAG[k] = (row, col) of the k-th coefficient in scan
# order (ITU-T T.81 Figure A.6); precomputed as flat natural-order index
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal 8-point DCT-II matrix: block = M @ spatial @ M.T is the
# forward transform, spatial = M.T @ block @ M the inverse (float64 —
# deterministic across sessions/platforms per IEEE 754)
_DCT_M = np.array(
    [
        [
            (np.float64(1.0) / np.sqrt(np.float64(8.0)))
            if u == 0
            else np.float64(0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)

# standard luminance quantization table (ITU-T T.81 Annex K.1, natural
# row-major order) — public spec constants, quality-scaled at encode
_STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quantization table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a JPEG BITS/HUFFVAL table (canonical
    assignment, T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _simple_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A spec-valid (BITS, HUFFVAL) covering ``symbols``: all codes share
    the smallest length L with 2^L - 1 >= n (the all-ones code of any
    length stays unused, as T.81's table derivation guarantees), except
    n > 255 spills one symbol a level down (BITS entries are bytes)."""
    n = len(symbols)
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    if n <= 255:
        bits[length - 1] = n
    else:
        bits[length - 1] = 255
        bits[length] = n - 255
    return bits, list(symbols)


def _category(v: int) -> int:
    """JPEG magnitude category: number of bits in |v|."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(
    pixels: np.ndarray,
    *,
    quality: int = 90,
    subsample: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a real
    baseline sequential JFIF JPEG: quality-scaled Annex-K quantization
    tables, canonical Huffman tables BUILT by :func:`_simple_table` and
    carried in DHT (the format is self-describing — no dependence on the
    Annex-K typical tables), optional 4:2:0 chroma subsampling (2x2 mean)
    and optional restart markers every ``restart_interval`` MCUs."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("pixels must be (h, w) gray or (h, w, 3) RGB")
    if subsample not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qt_luma = _quality_scale(_STD_LUMA_Q, quality)
    qt_chroma = _quality_scale(_STD_CHROMA_Q, quality)

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qtab = [qt_luma]
        qid = [0]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        def down(p, fy, fx):
            # pad to the factor, then fy x fx mean
            ph = np.pad(
                p,
                ((0, -p.shape[0] % fy), (0, -p.shape[1] % fx)),
                mode="edge",
            )
            return ph.reshape(
                ph.shape[0] // fy, fy, ph.shape[1] // fx, fx
            ).mean(axis=(1, 3))

        if subsample == "4:2:0":
            planes = [y, down(cb, 2, 2), down(cr, 2, 2)]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "4:2:2":  # horizontal-only chroma halving
            planes = [y, down(cb, 1, 2), down(cr, 1, 2)]
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qtab = [qt_luma, qt_chroma, qt_chroma]
        qid = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component quantized coefficient blocks, MCU traversal order
    comp_blocks: list[list[np.ndarray]] = []
    for plane, (sh, sv), qt in zip(planes, samp, qtab):
        ph = mcus_y * 8 * sv
        pw = mcus_x * 8 * sh
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[y0 : y0 + 8, x0 : x0 + 8]
                        coef = _DCT_M @ blk @ _DCT_M.T
                        q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
                        blocks.append(q.reshape(-1)[_ZZ])
        comp_blocks.append(blocks)

    # gather symbol statistics? No — fixed simple tables over the FULL
    # symbol alphabet keep the encoder deterministic and spec-valid
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_bits, dc_vals = _simple_table(dc_syms)
    ac_bits, ac_vals = _simple_table(sorted(set(ac_syms)))
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    n_comp = len(planes)
    preds = [0] * n_comp
    # interleaved MCU scan (also the non-interleaved single-component
    # case when n_comp == 1)
    blocks_per_mcu = [s[0] * s[1] for s in samp]
    idx = [0] * n_comp
    rst = 0
    total_mcus = mcus_x * mcus_y
    body = bytearray()
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad_to_byte()
            body += bw.out
            bw = _BitWriter()
            body += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * n_comp
        for c in range(n_comp):
            for _ in range(blocks_per_mcu[c]):
                zz = comp_blocks[c][idx[c]]
                idx[c] += 1
                diff = int(zz[0]) - preds[c]
                preds[c] = int(zz[0])
                cat = _category(diff)
                code, ln = dc_codes[cat]
                bw.put(code, ln)
                if cat:
                    val = diff if diff >= 0 else diff + (1 << cat) - 1
                    bw.put(val, cat)
                run = 0
                last_nz = 0
                nz = np.nonzero(zz[1:])[0]
                last_nz = (nz[-1] + 1) if nz.size else 0
                k = 1
                while k <= last_nz:
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        k += 1
                        continue
                    while run >= 16:
                        code, ln = ac_codes[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    cat = _category(v)
                    code, ln = ac_codes[(run << 4) | cat]
                    bw.put(code, ln)
                    val = v if v >= 0 else v + (1 << cat) - 1
                    bw.put(val, cat)
                    run = 0
                    k += 1
                if last_nz < 63:
                    code, ln = ac_codes[0x00]
                    bw.put(code, ln)
    bw.pad_to_byte()
    body += bw.out

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qt_luma.reshape(-1)[_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(
            0xDB, bytes([0x01]) + bytes(qt_chroma.reshape(-1)[_ZZ].astype(np.uint8))
        )
    sof = bytearray(struct.pack(">BHHB", 8, h, w, n_comp))
    for c in range(n_comp):
        sof += bytes([c + 1, (samp[c][0] << 4) | samp[c][1], qid[c]])
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([n_comp])
    for c in range(n_comp):
        sos += bytes([c + 1, 0x00])  # every component uses tables 0/0
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data: 0xFF00 byte
    stuffing is undone inline; a restart marker (0xFFD0-D7) must be
    consumed explicitly via :meth:`restart` (reads past one are an
    error). Truncation raises ValueError."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        byte = self.data[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "JPEG restart marker inside a coded segment "
                    "(stream desynchronized)"
                )
            else:
                # EOI or another marker: no more entropy bits
                raise ValueError("JPEG entropy data ended at a marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return
        raise ValueError("JPEG restart marker expected and not found")


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    """Decode one Huffman symbol: extend the code bit by bit until it
    matches a (length, code) entry (JPEG codes are <= 16 bits)."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    """T.81 EXTEND: map a ``cat``-bit magnitude to its signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a BASELINE sequential DCT JPEG to ``(width, height, luma)``
    — dependency-free, like the other builtin codecs. Supported: 8-bit
    baseline (SOF0) and extended-sequential (SOF1) Huffman scans,
    grayscale or 3-component YCbCr with arbitrary sampling factors
    (4:4:4, 4:2:0, 4:2:2, ...), one interleaved scan, restart intervals.
    Progressive (SOF2), hierarchical, lossless and arithmetic-coded
    variants raise ``NotImplementedError`` (honest bound — pillow
    backstops them where importable); malformed data raises
    ``ValueError`` (the class the decode router backstops).

    Pixel convention: IDCT is the orthonormal float64 inverse of the
    encoder's forward matrix; chroma upsampling is pixel replication;
    color conversion is the JFIF YCbCr->RGB matrix, clipped and rounded,
    then ITU-R 601 integer luma (the PIL ``convert("L")`` convention the
    other codecs share). Entropy decoding is sequential per blob by
    nature; blobs stay inside Arrow batches (operators/multimodal.py),
    so no per-pixel Python crosses the executor boundary."""
    if data[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    pos = 2
    sos_pos = None
    scan_comps: list[dict] = []
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant table")
                if p + 65 > len(body):
                    raise ValueError("JPEG DQT truncated")
                zz = np.frombuffer(body, np.uint8, 64, p + 1).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = zz
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                if p + 17 > len(body):
                    raise ValueError("JPEG DHT truncated")
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                if p + 17 + n > len(body):
                    raise ValueError("JPEG DHT truncated")
                vals = list(body[p + 17 : p + 17 + n])
                codes = _canonical_codes(bits, vals)
                htables[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG with {nc} components")
            if len(body) < 6 + 3 * nc:
                raise ValueError("JPEG SOF truncated")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            if any(c["h"] < 1 or c["v"] < 1 for c in comps):
                raise ValueError("JPEG invalid sampling factors")
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} outside the baseline/"
                "extended-sequential Huffman subset"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "JPEG multi-scan (non-interleaved) streams"
                )
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("JPEG SOS truncated")
            for c in range(ns):
                cid, tbl = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(
                    (x for x in comps if x["id"] == cid), None
                )
                if comp is None:
                    raise ValueError("JPEG SOS names an unknown component")
                comp["td"], comp["ta"] = tbl >> 4, tbl & 0x0F
                scan_comps.append(comp)
            sos_pos = pos + 2 + seg_len
            break
        # APPn, COM, and anything unrecognized: skip by length
        pos += 2 + seg_len
    if sos_pos is None or h is None:
        raise ValueError("JPEG missing SOS/SOF")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        # the replication upsampler repeats each chroma sample an
        # INTEGER number of times; spec-legal non-divisible combos
        # (e.g. Y 3x1 with Cb 2x1) would silently truncate the repeat
        # factor and misalign the planes — route them to the decode
        # router's pillow backstop instead
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"JPEG non-divisible sampling factors "
                f"({c['h']}x{c['v']} vs max {hmax}x{vmax})"
            )
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        c["qt"] = qtables[c["tq"]].reshape(8, 8).astype(np.float64)
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
        dc_t = htables.get((0, c.get("td", 0)))
        ac_t = htables.get((1, c.get("ta", 0)))
        if dc_t is None or ac_t is None:
            raise ValueError("JPEG missing Huffman table")
        c["dc_t"], c["ac_t"] = dc_t, ac_t

    br = _BitReader(data, sos_pos)
    preds = {c["id"]: 0 for c in comps}
    nat_of_zz = np.array(_ZZ, dtype=np.int64)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            br.restart()
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for c in scan_comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    sym = _huff_decode(br, c["dc_t"])
                    diff = _extend(br.bits(sym), sym) if sym else 0
                    preds[c["id"]] += diff
                    zz[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, c["ac_t"])
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        cat = rs & 0x0F
                        zz[k] = _extend(br.bits(cat), cat)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[nat_of_zz] = zz
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk.reshape(8, 8)

    planes = []
    for c in comps:
        coef = c["coef"] * c["qt"]  # dequant, all blocks at once
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_M, coef, _DCT_M)
        px = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full-resolution grid by replication, then crop
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        luma = planes[0]
    else:
        y = planes[0].astype(np.float64)
        cb = planes[1].astype(np.float64) - 128.0
        cr = planes[2].astype(np.float64) - 128.0
        r = np.clip(np.round(y + 1.402 * cr), 0, 255).astype(np.uint8)
        g = np.clip(
            np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255
        ).astype(np.uint8)
        b = np.clip(np.round(y + 1.772 * cb), 0, 255).astype(np.uint8)
        luma = _luma601(np.stack([r, g, b], axis=-1))
    return int(w), int(h), luma.reshape(-1)
