"""Pure-numpy codecs for media formats (PPM, WAV, PNG, GIF, JPEG).

The container has no PIL/cv2/ffmpeg, but these formats need no codec
library: binary PPM (P6) is a text header + raw RGB raster, RIFF/WAVE
PCM is a fixed 44-byte header + little-endian samples, PNG is
zlib-compressed (stdlib!) scanlines under five byte-level prediction
filters, GIF is variable-width LZW over palette indices in a
sub-block framed container, and baseline JPEG (greyscale) is an
8x8-DCT transform code with canonical Huffman entropy coding —
implemented here from the ITU-T T.81 spec with numpy alone. These
implementations make the m-family's decode -> resize -> feature path
REAL end-to-end — `decode_image` parses actual image bytes
(including COMPRESSED and TRANSFORM-CODED formats) and the
downstream statistics depend on the decoded values — while the
remaining codec-library formats (WebP/MP3/H.264, progressive or
chroma-subsampled JPEG) stay the documented external-codec extension
point in operators/multimodal.py.

Format references (public): the Netpbm P6 format spec (header
``P6\\n<w> <h>\\n<maxval>\\n`` then ``3*w*h`` raw bytes, ``#`` comments
allowed in the header); the Microsoft RIFF/WAVE container (chunked:
``RIFF<size>WAVE`` then ``fmt `` and ``data`` chunks; PCM16 mono);
the PNG specification (RFC 2083 / W3C PNG): 8-byte signature,
length-type-data-CRC chunks, IHDR/IDAT/IEND, zlib-deflated image data,
one filter-type byte per scanline selecting None/Sub/Up/Average/Paeth
byte predictors at bytes-per-pixel offset; and the GIF89a
specification (CompuServe, 1990): logical screen descriptor + global
color table, per-frame image descriptors, and image data as
variable-code-width LZW (clear/EOI codes, LSB-first bit packing,
code width grows 9->12 as the string table fills) split into
<=255-byte sub-blocks.

Everything is deterministic integer math — nearest-neighbor resize
uses ``src = (dst * src_dim) // dst_dim`` — so a DuckDB oracle can
state the identical arithmetic and the cross-engine hash gate applies
to decoded-pixel results, not just plumbing.
"""

from __future__ import annotations

import math
import struct
import zlib
from typing import NamedTuple

import numpy as np

PPM_MAGIC = b"P6"
WAV_MAGIC = b"RIFF"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# -- PPM (binary Netpbm, P6) ------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 raster -> binary PPM bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM bytes -> (h, w, 3) uint8. Handles whitespace runs and
    ``#`` comments in the header per the Netpbm spec; exactly one
    whitespace byte separates the maxval from the raster."""
    if not data.startswith(PPM_MAGIC):
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comment lines
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    n = w * h * 3
    raster = data[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"truncated raster: want {n} bytes, got {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize with floor index mapping
    ``src = (dst * src_dim) // dst_dim`` — integer-exact, so oracles
    can restate it."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[ys][:, xs]


# -- PNG (8-bit greyscale/RGB/RGBA, non-interlaced) -------------------------
#
# Filters operate on SCANLINE BYTES at bytes-per-pixel offset (PNG
# spec §6): for byte x with left = raw[x-bpp], up = prior[x],
# ul = prior[x-bpp] (0 beyond the left edge):
#   0 None    raw[x]
#   1 Sub     raw[x] - left            (mod 256)
#   2 Up      raw[x] - up              (mod 256)
#   3 Average raw[x] - (left+up)//2    (mod 256)
#   4 Paeth   raw[x] - PaethPredictor(left, up, ul)   (mod 256)

_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # greyscale, RGB, RGBA


def _paeth_row(raw: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Per-byte Paeth predictor for one scanline (int32 in/out)."""
    out = np.empty_like(raw)
    for x in range(len(raw)):
        a = int(raw[x - bpp]) if x >= bpp else 0  # left (reconstructed)
        b = int(prior[x])
        c = int(prior[x - bpp]) if x >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            out[x] = a
        elif pb <= pc:
            out[x] = b
        else:
            out[x] = c
    return out


def _unfilter_row(
    ftype: int, flt: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """Reconstruct one scanline (uint8) from its filtered bytes."""
    n = len(flt)
    raw = flt.astype(np.int32)
    prior32 = prior.astype(np.int32)
    if ftype == 0:
        pass
    elif ftype == 2:  # Up is fully vectorizable
        raw = (raw + prior32) & 0xFF
    elif ftype in (1, 3, 4):  # left-dependent: sequential along x
        for x in range(n):
            left = raw[x - bpp] if x >= bpp else 0
            if ftype == 1:
                raw[x] = (raw[x] + left) & 0xFF
            elif ftype == 3:
                raw[x] = (raw[x] + (left + prior32[x]) // 2) & 0xFF
            else:
                a, b = int(left), int(prior32[x])
                c = int(prior32[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw[x] = (raw[x] + pred) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return raw.astype(np.uint8)


def _filter_row(
    ftype: int, raw: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply filter ``ftype`` to one reconstructed scanline (uint8)."""
    raw32 = raw.astype(np.int32)
    prior32 = prior.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), raw32[:-bpp]])
    ul = np.concatenate([np.zeros(bpp, np.int32), prior32[:-bpp]])
    if ftype == 0:
        flt = raw32
    elif ftype == 1:
        flt = raw32 - left
    elif ftype == 2:
        flt = raw32 - prior32
    elif ftype == 3:
        flt = raw32 - (left + prior32) // 2
    elif ftype == 4:
        flt = raw32 - _paeth_row(raw32, prior32, bpp)
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (flt & 0xFF).astype(np.uint8)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 raster -> PNG bytes (color type 2, 8-bit,
    non-interlaced). Filter type cycles ``y % 5`` per scanline so every
    decoder filter path (None/Sub/Up/Average/Paeth) is exercised by any
    image taller than 4 rows — a decoder with one broken predictor
    cannot round-trip these payloads."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    bpp = 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    prior = np.zeros(w * bpp, dtype=np.uint8)
    lines = bytearray()
    for y in range(h):
        raw = arr[y].reshape(-1)
        ftype = y % 5
        lines.append(ftype)
        lines.extend(_filter_row(ftype, raw, prior, bpp).tobytes())
        prior = raw
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8. Walks the chunk list with
    CRC verification, inflates the concatenated IDAT stream, and
    reverses the per-scanline filters. Supports 8-bit greyscale / RGB /
    RGBA (color types 0/2/6), non-interlaced — the subset a metadata-
    tagged training corpus normalizes to before this stage."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack(">I", data[pos + 8 + size : pos + 12 + size])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None:
        raise ValueError("missing IHDR chunk")
    w, h, depth, ctype_id, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} comp={comp} filter={filt} "
            f"interlace={interlace} (8-bit non-interlaced only)"
        )
    if ctype_id not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype_id}")
    channels = _PNG_CHANNELS[ctype_id]
    bpp = channels
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"inflated size {len(raw)} != expected {h * (stride + 1)}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        flt = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        prior = _unfilter_row(ftype, flt, prior, bpp)
        out[y] = prior
    return out.reshape(h, w, channels)


# -- GIF (animated, 8-bit indexed, greyscale GCT) ---------------------------
#
# Image data is GIF-variant LZW over palette indices: min code size 8,
# clear = 256, end-of-information = 257, first dynamic code 258; code
# width starts at 9 bits and grows to at most 12 as the string table
# fills, following the GIF89a convention: the decoder widens when its
# table reaches 1<<width entries, and the encoder — whose table runs
# one entry ahead of the decoder's — widens one assignment later, when
# the next free code reaches (1<<width)+1. At 4096 entries the encoder
# emits CLEAR and both sides reset (the decoder also tolerates
# deferred-clear streams by freezing its full table until a CLEAR
# arrives). Codes are packed LSB-first into bytes, and the byte stream
# is framed into <=255-byte sub-blocks each preceded by its length,
# terminated by a zero-length block. Interop with standards encoders is
# regression-pinned against a checked-in real-world GIF fixture
# (tests/fixtures/earth.gif, from the public Tk 8.6 demo images).

GIF_MAGIC = b"GIF89a"
_GIF_MIN_CODE_SIZE = 8
_GIF_MAX_WIDTH = 12


def _lzw_encode(indices: bytes) -> bytes:
    """GIF-variant LZW: palette-index bytes -> packed code stream."""
    clear = 1 << _GIF_MIN_CODE_SIZE
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = _GIF_MIN_CODE_SIZE + 1
    emit(clear, width)
    buf = b""
    for byte in indices:
        nb = buf + bytes([byte])
        if nb in table:
            buf = nb
            continue
        emit(table[buf], width)
        table[nb] = next_code
        next_code += 1
        # GIF89a: widen only once a code that NEEDS width+1 bits has
        # been assigned — one entry later than the decoder, whose table
        # lags this one by a single entry.
        if next_code == (1 << width) + 1 and width < _GIF_MAX_WIDTH:
            width += 1
        if next_code == (1 << _GIF_MAX_WIDTH):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = _GIF_MIN_CODE_SIZE + 1
        buf = bytes([byte])
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(
    data: bytes, n_expected: int, min_code_size: int = _GIF_MIN_CODE_SIZE
) -> bytes:
    """GIF-variant LZW: packed code stream -> palette-index bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = []
    prev: bytes | None = None
    out = bytearray()

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out.extend(entry)
        if prev is not None and len(table) < (1 << _GIF_MAX_WIDTH):
            table.append(prev + entry[:1])
            # GIF89a rule: widen when the table is full at the current
            # width (the next append would need width+1 bits). The
            # encoder, whose table runs one entry ahead, widens at
            # next_code == (1<<width)+1 — the two stay in lockstep.
            if len(table) == (1 << width) and width < _GIF_MAX_WIDTH:
                width += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(f"LZW decoded {len(out)} bytes, want {n_expected}")
    return bytes(out)


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


GIF_GREY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(frames: np.ndarray, delay_cs: int = 4) -> bytes:
    """(n, h, w) uint8 palette-index frames -> animated GIF89a bytes
    with a 256-entry greyscale global color table. Each frame gets a
    graphic-control extension (delay in centiseconds) and its own
    LZW-compressed image data."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError(f"expected (n, h, w) uint8, got {frames.shape} {frames.dtype}")
    n, h, w = frames.shape
    out = bytearray()
    out.extend(GIF_MAGIC)
    # logical screen descriptor: GCT present, 8-bit color res, 256 entries
    out.extend(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
    out.extend(GIF_GREY_PALETTE)
    for f in range(n):
        out.extend(b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00")
        out.extend(b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00")
        out.append(_GIF_MIN_CODE_SIZE)
        out.extend(_gif_subblocks(_lzw_encode(frames[f].tobytes())))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes -> ((n, h, w) uint8 palette indices, (256, 3) uint8
    palette). Walks the block structure: logical screen descriptor +
    global color table, skips extensions, LZW-decodes each image
    descriptor's sub-block stream. Full-frame, GCT-only images (the
    subset the fixture encoder emits; per-frame local color tables and
    interlace raise)."""
    if not data.startswith(GIF_MAGIC[:3]):
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("truncated GIF")

    def _byte(p: int) -> int:
        if p >= len(data):
            raise ValueError("truncated GIF")
        return data[p]

    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_n = 2 << (packed & 0x07)
    palette = np.frombuffer(
        data[pos : pos + 3 * gct_n], dtype=np.uint8
    ).reshape(gct_n, 3)
    if gct_n < 256:
        palette = np.vstack([palette, np.zeros((256 - gct_n, 3), np.uint8)])
    pos += 3 * gct_n
    frames: list[np.ndarray] = []
    while pos < len(data):
        introducer = _byte(pos)
        pos += 1
        if introducer == 0x3B:  # trailer
            break
        if introducer == 0x21:  # extension: label + sub-blocks
            pos += 1
            while _byte(pos) != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if introducer != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{introducer:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fpacked & 0x80:
            raise ValueError("local color tables not supported")
        if fpacked & 0x40:
            raise ValueError("interlaced frames not supported")
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError("partial-frame images not supported")
        mcs = _byte(pos)
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"min code size {mcs} outside GIF89a range 2..8")
        lzw = bytearray()
        while _byte(pos) != 0:
            size = data[pos]
            if pos + 1 + size > len(data):
                raise ValueError("truncated GIF")
            lzw.extend(data[pos + 1 : pos + 1 + size])
            pos += 1 + size
        pos += 1
        idx = _lzw_decode(bytes(lzw), fw * fh, mcs)
        frames.append(np.frombuffer(idx, dtype=np.uint8).reshape(fh, fw))
    return np.stack(frames), palette


# -- WAV (RIFF PCM16 mono) --------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """1-D int16 sample array -> RIFF/WAVE PCM16 mono bytes."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError(f"expected 1-D int16, got {samples.shape} {samples.dtype}")
    pcm = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, byte_rate, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, 1-D int16 samples). Walks the
    chunk list (tolerates extra chunks like LIST/fact before data);
    PCM16 mono only."""
    if data[:4] != WAV_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    pcm = None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"only PCM16 mono supported, got fmt={fmt} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, np.frombuffer(pcm, dtype="<i2").astype(np.int16)


# -- JPEG (baseline sequential DCT, greyscale, JFIF) ------------------------
#
# The one transform-coded format in the codec family: ITU-T T.81
# baseline process (SOF0) over a single 8-bit luminance component.
# Pipeline per the spec: level shift (-128), 8x8 forward DCT,
# uniform quantization (Annex K.1 luminance table), zigzag scan,
# DC DPCM + AC zero-run-length coding, canonical Huffman entropy
# coding (Annex K.3/K.5 tables), 0xFF byte stuffing, JFIF marker
# framing (SOI/APP0/DQT/SOF0/DHT/SOS/EOI). The decoder walks the
# marker stream (skipping APPn/COM), rebuilds the canonical Huffman
# codes from BITS/HUFFVAL exactly as T.81 Annex C prescribes, handles
# restart markers (RSTn: bit realignment + DC predictor reset), and
# exposes both the full IDCT raster and the quantized-DC plane.
#
# The quantized DC path is INTEGER-EXACT and oracle-statable: for an
# 8x8 block with pixel sum S, the orthonormal FDCT gives
# F(0,0) = (S - 64*128)/8, and with the K.1 DC step q00 = 16 the
# denominator 8*q00 = 128 is a power of two, so
#     qDC = round_half_away((S - 8192) / 128)
# is exact integer arithmetic on both engines. The encoder computes
# the DC term with this integer formula (it IS the DCT DC value,
# computed without float error) so encoder, decoder, and SQL oracle
# agree bit-for-bit; the lossy AC path is exercised by roundtrip and
# property tests instead.

JPEG_MAGIC = b"\xff\xd8\xff"

# Annex K.1 luminance quantization table (row-major).
JPEG_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 (DC luminance) and K.5 (AC luminance) Huffman specs:
# BITS[i] = number of codes of length i+1; HUFFVAL in code order.
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Annex K.2 chrominance quantization table (row-major).
JPEG_QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.4 (DC chrominance) and K.6 (AC chrominance) Huffman specs.
_JPEG_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_DC_VALS_C = list(range(12))
_JPEG_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_JPEG_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Zigzag scan order (T.81 Figure 5): _JPEG_ZIGZAG[k] = row-major index
# of the k-th coefficient in scan order.
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: F = D @ block @ D.T."""
    x = np.arange(8, dtype=np.float64)
    d = np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / 16.0) / 2.0
    d[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return d


_JPEG_DCT = _jpeg_dct_matrix()


def _round_half_away(num: int, den: int) -> int:
    """round(num/den) with ties away from zero; den > 0; pure ints."""
    if num >= 0:
        return (2 * num + den) // (2 * den)
    return -((2 * -num + den) // (2 * den))


def jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C code generation: {symbol: (code, length)}. Codes
    are assigned in HUFFVAL order, counting up within each length and
    doubling at each length step (canonical Huffman)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_JPEG_DC_CODES = jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
_JPEG_AC_CODES = jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
_JPEG_DC_CODES_C = jpeg_canonical_codes(_JPEG_DC_BITS_C, _JPEG_DC_VALS_C)
_JPEG_AC_CODES_C = jpeg_canonical_codes(_JPEG_AC_BITS_C, _JPEG_AC_VALS_C)
# Decoder side: {(length, code): symbol}.
_JPEG_DC_DECODE = {(ln, c): s for s, (c, ln) in _JPEG_DC_CODES.items()}
_JPEG_AC_DECODE = {(ln, c): s for s, (c, ln) in _JPEG_AC_CODES.items()}


class _JpegBitWriter:
    """MSB-first bit packer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def restart_marker(self, n: int) -> None:
        """Byte-align with 1-fill bits, then emit RSTn (markers are
        written raw — only entropy bytes are stuffed)."""
        if self.nbits:
            self.put(0xFF, 8 - self.nbits)
        self.out += bytes([0xFF, 0xD0 + n])

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0xFF, 8 - self.nbits)  # pad with 1-bits
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits value) per T.81 F.1.2.1: negative values
    are sent as v + 2^size - 1."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _jpeg_segment(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(arr: np.ndarray, restart_interval: int = 0) -> bytes:
    """(h, w) uint8 greyscale raster -> baseline JFIF bytes.

    Arbitrary dimensions: the raster is edge-replicated up to the next
    multiple of 8 (the decoder crops back to the SOF0 dimensions).
    DC is quantized with the exact integer formula
    round_half_away((S - 8192) / 128); AC with
    sign * floor(|F|/q + 1/2) in float64. With ``restart_interval``
    > 0 a DRI segment is written and a byte-aligned RSTn marker (DC
    predictor reset) is emitted every that-many MCUs (T.81 B.2.1) —
    the mechanism real encoders use so a corrupted scan only loses
    one interval.
    """
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w) uint8 greyscale, got {arr.shape} {arr.dtype}")
    h, w = arr.shape
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"bad dimensions {h}x{w}")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")

    # Forward DCT + quantization for all blocks at once.
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .astype(np.float64)
    )
    shifted = blocks - 128.0
    coefs = np.einsum("ux,byxz,vz->byuv", _JPEG_DCT, shifted, _JPEG_DCT)
    q = np.sign(coefs) * np.floor(np.abs(coefs) / JPEG_QUANT[None, None] + 0.5)
    q = q.astype(np.int32)
    # Overwrite DC with the exact integer quantization (no float path):
    sums = blocks.reshape(ph // 8, pw // 8, 64).sum(axis=2).astype(np.int64)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            q[by, bx, 0, 0] = _round_half_away(int(sums[by, bx]) - 8192, 128)

    writer = _JpegBitWriter()
    pred = 0
    mcu = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart_marker((mcu // restart_interval - 1) % 8)
                pred = 0
            mcu += 1
            zz = q[by, bx].reshape(64)[_JPEG_ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size, extra = _jpeg_magnitude(diff)
            code, length = _JPEG_DC_CODES[size]
            writer.put(code, length)
            if size:
                writer.put(extra, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    code, length = _JPEG_AC_CODES[0x00]  # EOB
                    writer.put(code, length)
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _JPEG_AC_CODES[0xF0]  # ZRL
                    writer.put(code, length)
                    run -= 16
                size, extra = _jpeg_magnitude(v)
                code, length = _JPEG_AC_CODES[(run << 4) | size]
                writer.put(code, length)
                writer.put(extra, size)
                run = 0
    entropy = writer.flush()

    zz_quant = JPEG_QUANT.reshape(64)[_JPEG_ZIGZAG].astype(np.uint8).tobytes()
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _jpeg_segment(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    out += _jpeg_segment(0xDB, b"\x00" + zz_quant)  # DQT, Pq=0 Tq=0
    out += _jpeg_segment(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")  # SOF0
    out += _jpeg_segment(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += _jpeg_segment(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    if restart_interval:
        out += _jpeg_segment(0xDD, struct.pack(">H", restart_interval))  # DRI
    out += _jpeg_segment(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over the entropy segment: un-stuffs
    0xFF00; restart boundaries are synced explicitly by the caller
    (T.81 B.2.1 — intervals are byte-aligned with fill bits, so the
    in-flight accumulator is discarded, never decoded across)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        byte = d[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            if d[self.pos + 1] != 0x00:
                raise ValueError("JPEG entropy stream ran into a marker")
            self.pos += 2  # stuffed data byte
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def sync_restart(self) -> None:
        """Discard fill bits and consume the next RSTn marker. Between
        intervals the stream holds at most one fill byte (possibly FF
        with its stuffed 00) before the marker — anything else is
        corruption."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        for _ in range(2):  # marker now, or after one fill unit
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG: missing restart marker")
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            if d[self.pos] == 0xFF and d[self.pos + 1] == 0x00:
                self.pos += 2  # 0xFF fill byte, stuffed
            else:
                self.pos += 1  # plain fill byte
        raise ValueError("restart marker not found at interval boundary")

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        b = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(extra: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map size-bit magnitude bits to a value."""
    if size == 0:
        return 0
    if extra < (1 << (size - 1)):
        return extra - (1 << size) + 1
    return extra


class _JpegHeader(NamedTuple):
    """Everything the marker walk yields before entropy data starts
    (single-component view — the legacy greyscale decode path)."""

    quant: np.ndarray
    dc_table: dict[tuple[int, int], int]
    ac_table: dict[tuple[int, int], int]
    h: int
    w: int
    restart_interval: int
    sos_pos: int


class _JpegComp(NamedTuple):
    comp_id: int
    hsamp: int
    vsamp: int
    tq: int  # quant table id


class _JpegHeaderMulti(NamedTuple):
    """Multi-component marker-walk result (SOF0 baseline / SOF2
    progressive, 1 or 3 components; for progressive streams the
    fields describe the FIRST scan)."""

    quants: dict[int, np.ndarray]  # tq -> (8, 8) natural order
    dc_tables: dict[int, dict[tuple[int, int], int]]  # th -> decode map
    ac_tables: dict[int, dict[tuple[int, int], int]]
    comps: list[_JpegComp]  # SOF order
    sos_tables: dict[int, tuple[int, int]]  # comp_id -> (td, ta)
    h: int
    w: int
    restart_interval: int
    sos_pos: int
    progressive: bool = False
    scan_comps: tuple[int, ...] = ()  # first scan's comp ids, order
    scan_spec: tuple[int, int, int, int] = (0, 63, 0, 0)  # Ss,Se,Ah,Al


def _jpeg_parse_headers_multi(data: bytes) -> _JpegHeaderMulti:
    """Walk the marker stream up to (and including) SOS: -> all quant
    and Huffman tables by id, per-component sampling factors and table
    assignments, dimensions, restart interval, and the offset where
    entropy-coded data begins. Shared by the greyscale decoder (via
    the :func:`_jpeg_parse_headers` adapter), the restart-segment
    path, and the 4:2:0 color decoder."""
    if not data.startswith(JPEG_MAGIC[:2]):
        raise ValueError("not a JPEG payload")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict[tuple[int, int], int]] = {}
    ac_tables: dict[int, dict[tuple[int, int], int]] = {}
    comps: list[_JpegComp] = []
    sos_tables: dict[int, tuple[int, int]] = {}
    h = w = None
    restart_interval = 0
    progressive = False
    scan_comps: tuple[int, ...] = ()
    scan_spec = (0, 63, 0, 0)
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG: no SOS marker")
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[_JPEG_ZIGZAG] = zz
                quants[tq] = nat.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp not in (1, 3):
                raise ValueError(
                    f"only 8-bit 1- or 3-component supported "
                    f"(precision={precision}, components={ncomp})"
                )
            comps = [
                _JpegComp(
                    body[6 + 3 * i],
                    body[7 + 3 * i] >> 4,
                    body[7 + 3 * i] & 0x0F,
                    body[8 + 3 * i],
                )
                for i in range(ncomp)
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "only baseline (SOF0) / progressive (SOF2) supported"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                table = {
                    (ln, c): s
                    for s, (c, ln) in jpeg_canonical_codes(bits, vals).items()
                }
                if tc == 0:
                    dc_tables[th] = table
                else:
                    ac_tables[th] = table
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = body[0]
            for i in range(ns):
                cid = body[1 + 2 * i]
                sos_tables[cid] = (body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
            scan_comps = tuple(body[1 + 2 * i] for i in range(ns))
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            scan_spec = (ss, se, ahal >> 4, ahal & 0x0F)
            pos += 2 + seglen
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if not quants or not dc_tables or h is None or not comps:
        raise ValueError("missing DQT/DHT/SOF before SOS")
    if not ac_tables and not (progressive and scan_spec[1] == 0):
        raise ValueError("missing AC Huffman tables")
    return _JpegHeaderMulti(
        quants, dc_tables, ac_tables, comps, sos_tables, h, w,
        restart_interval, pos, progressive, scan_comps, scan_spec,
    )


def _jpeg_parse_headers(data: bytes) -> _JpegHeader:
    """Single-component adapter over :func:`_jpeg_parse_headers_multi`
    — the greyscale decode / restart-split paths' unchanged view."""
    hdr = _jpeg_parse_headers_multi(data)
    if hdr.progressive:
        raise ValueError(
            "progressive stream on the baseline path — use"
            " decode_jpeg_progressive_dc"
        )
    if len(hdr.comps) != 1:
        raise ValueError(
            f"single-component path on a {len(hdr.comps)}-component JPEG"
            " — use decode_jpeg_color"
        )
    comp = hdr.comps[0]
    if (comp.hsamp, comp.vsamp) != (1, 1):
        raise ValueError("subsampled components not supported")
    td, ta = hdr.sos_tables.get(comp.comp_id, (0, 0))
    return _JpegHeader(
        hdr.quants[comp.tq],
        hdr.dc_tables[td],
        hdr.ac_tables[ta],
        hdr.h,
        hdr.w,
        hdr.restart_interval,
        hdr.sos_pos,
    )


def _decode_entropy_block(
    reader: _JpegBitReader,
    dc_table: dict[tuple[int, int], int],
    ac_table: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    """Entropy-decode ONE 8x8 block: -> (zigzag-order coefficients
    (64,) int32, updated DC predictor). The AC walk must run even
    when only DC is wanted — it is what advances the bitstream."""
    zz = np.zeros(64, dtype=np.int32)
    size = reader.huffman(dc_table)
    diff = _jpeg_extend(reader.bits(size), size)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        sym = reader.huffman(ac_table)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError(f"invalid AC symbol {sym:#x}")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _jpeg_extend(reader.bits(size), size)
        k += 1
    return zz, pred


def _decode_jpeg_coefficients(
    data: bytes,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Parse markers + entropy-decode: -> (quantized coefficient
    blocks (n_by, n_bx, 8, 8) int32 in natural order, quant table
    (8, 8) int32, true height, true width)."""
    hdr = _jpeg_parse_headers(data)
    h, w, restart_interval = hdr.h, hdr.w, hdr.restart_interval
    n_by, n_bx = -(-h // 8), -(-w // 8)
    coefs = np.zeros((n_by, n_bx, 64), dtype=np.int32)
    reader = _JpegBitReader(data, hdr.sos_pos)
    pred = 0
    mcu = 0
    for by in range(n_by):
        for bx in range(n_bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.sync_restart()
                pred = 0
            zz, pred = _decode_entropy_block(
                reader, hdr.dc_table, hdr.ac_table, pred
            )
            nat = np.zeros(64, dtype=np.int32)
            nat[_JPEG_ZIGZAG] = zz
            coefs[by, bx] = nat
            mcu += 1
    return coefs.reshape(n_by, n_bx, 8, 8), hdr.quant, h, w


def decode_jpeg_dc(data: bytes) -> np.ndarray:
    """JPEG bytes -> (n_by, n_bx) int32 plane of QUANTIZED DC
    coefficients — the 1/64-scale "DC thumbnail" extractable without
    any IDCT (the standard trick for thumbnailing crawl images at
    scale). Requires full entropy decode (AC codes must be walked to
    advance the bitstream), so Huffman, DPCM, and marker handling are
    all on this path."""
    coefs, _, _, _ = _decode_jpeg_coefficients(data)
    return coefs[:, :, 0, 0]


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w) uint8 greyscale raster: entropy decode,
    dequantize, inverse DCT, level shift, clamp, crop to SOF0 dims."""
    coefs, quant, h, w = _decode_jpeg_coefficients(data)
    deq = coefs.astype(np.float64) * quant[None, None]
    blocks = np.einsum("xu,byuv,zv->byxz", _JPEG_DCT.T, deq, _JPEG_DCT.T)
    n_by, n_bx = coefs.shape[:2]
    raster = (
        blocks.transpose(0, 2, 1, 3).reshape(n_by * 8, n_bx * 8) + 128.0
    )
    return np.clip(np.round(raster), 0, 255).astype(np.uint8)[:h, :w]


def _jpeg_quantize_plane(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(ph, pw) uint8 plane (dims multiples of 8) -> quantized
    coefficient blocks (ph//8, pw//8, 8, 8) int32, with the DC term
    overwritten by the exact integer formula
    round_half_away((S - 8192) / (8 * q00)) so encoder, decoder, and
    SQL oracle agree bit-for-bit on DC for ANY quant table."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .astype(np.float64)
    )
    coefs = np.einsum("ux,byxz,vz->byuv", _JPEG_DCT, blocks - 128.0, _JPEG_DCT)
    q = (np.sign(coefs) * np.floor(np.abs(coefs) / quant[None, None] + 0.5)).astype(
        np.int32
    )
    sums = blocks.reshape(ph // 8, pw // 8, 64).sum(axis=2).astype(np.int64)
    den = 8 * int(quant[0, 0])
    for by in range(ph // 8):
        for bx in range(pw // 8):
            q[by, bx, 0, 0] = _round_half_away(int(sums[by, bx]) - 8192, den)
    return q


def _jpeg_write_block(
    writer: _JpegBitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-write ONE zigzag-ordered block; returns the new DC
    predictor. (The greyscale encoder keeps its fused loop; this is
    the shared per-block form the interleaved color scan uses.)"""
    diff = int(zz[0]) - pred
    size, extra = _jpeg_magnitude(diff)
    code, length = dc_codes[size]
    writer.put(code, length)
    if size:
        writer.put(extra, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, length = ac_codes[0x00]  # EOB
            writer.put(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.put(code, length)
            run -= 16
        size, extra = _jpeg_magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.put(code, length)
        writer.put(extra, size)
        run = 0
    return int(zz[0])


def encode_jpeg_color(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    restart_interval: int = 0,
) -> bytes:
    """YCbCr 4:2:0 component planes -> baseline JFIF bytes (SOF0,
    3 components, Y sampled 2x2 against 1x1 chroma — the layout of
    essentially every camera/web JPEG).

    Takes the COMPONENT PLANES, not RGB: per T.81 the codec is
    component-agnostic (the RGB<->YCbCr transform is JFIF metadata,
    not entropy coding), and taking planes keeps the integer-exact DC
    oracle per component. ``cb``/``cr`` arrive already at half
    resolution (ceil(h/2), ceil(w/2)) — how the subsampling happened
    is the caller's (tested float) business, what the codec owns is
    the interleaved-MCU scan. Y pads to 16-pixel multiples
    (edge-replicated), chroma to the matching 8-multiples; MCU =
    4 Y blocks (raster order) + Cb + Ca with per-component DC
    predictors (T.81 A.2.3); luma uses the Annex K.1/K.3/K.5 tables,
    chroma K.2/K.4/K.6. DC terms are integer-exact per component
    (round_half_away((S-8192)/128) luma, /136 chroma)."""
    if y.ndim != 2 or y.dtype != np.uint8:
        raise ValueError(f"expected (h, w) uint8 luma, got {y.shape} {y.dtype}")
    h, w = y.shape
    ch, cw = -(-h // 2), -(-w // 2)
    if cb.shape != (ch, cw) or cr.shape != (ch, cw):
        raise ValueError(
            f"chroma planes must be ({ch}, {cw}), got {cb.shape} {cr.shape}"
        )
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"bad dimensions {h}x{w}")
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    yp = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
    cbp = np.pad(cb, ((0, ph // 2 - ch), (0, pw // 2 - cw)), mode="edge")
    crp = np.pad(cr, ((0, ph // 2 - ch), (0, pw // 2 - cw)), mode="edge")

    qy = _jpeg_quantize_plane(yp, JPEG_QUANT)
    qcb = _jpeg_quantize_plane(cbp, JPEG_QUANT_CHROMA)
    qcr = _jpeg_quantize_plane(crp, JPEG_QUANT_CHROMA)

    writer = _JpegBitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}
    n_mcuy, n_mcux = ph // 16, pw // 16
    mcu = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart_marker((mcu // restart_interval - 1) % 8)
                preds = {"y": 0, "cb": 0, "cr": 0}
            mcu += 1
            for r in range(2):
                for c in range(2):
                    zz = qy[2 * my + r, 2 * mx + c].reshape(64)[_JPEG_ZIGZAG]
                    preds["y"] = _jpeg_write_block(
                        writer, zz, preds["y"], _JPEG_DC_CODES, _JPEG_AC_CODES
                    )
            for name, q in (("cb", qcb), ("cr", qcr)):
                zz = q[my, mx].reshape(64)[_JPEG_ZIGZAG]
                preds[name] = _jpeg_write_block(
                    writer, zz, preds[name], _JPEG_DC_CODES_C, _JPEG_AC_CODES_C
                )
    entropy = writer.flush()

    zq_l = JPEG_QUANT.reshape(64)[_JPEG_ZIGZAG].astype(np.uint8).tobytes()
    zq_c = JPEG_QUANT_CHROMA.reshape(64)[_JPEG_ZIGZAG].astype(np.uint8).tobytes()
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _jpeg_segment(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _jpeg_segment(0xDB, b"\x00" + zq_l + b"\x01" + zq_c)
    out += _jpeg_segment(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x22\x00"  # Y: 2x2 sampling, quant 0
        + b"\x02\x11\x01"  # Cb: 1x1, quant 1
        + b"\x03\x11\x01",  # Cr: 1x1, quant 1
    )
    out += _jpeg_segment(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += _jpeg_segment(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    out += _jpeg_segment(
        0xC4, b"\x01" + bytes(_JPEG_DC_BITS_C) + bytes(_JPEG_DC_VALS_C)
    )
    out += _jpeg_segment(
        0xC4, b"\x11" + bytes(_JPEG_AC_BITS_C) + bytes(_JPEG_AC_VALS_C)
    )
    if restart_interval:
        out += _jpeg_segment(0xDD, struct.pack(">H", restart_interval))
    out += _jpeg_segment(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _decode_jpeg_coefficients_color(
    data: bytes,
) -> tuple[dict[str, np.ndarray], _JpegHeaderMulti]:
    """Parse + entropy-decode a 3-component 4:2:0 baseline scan:
    -> ({'y': (2*n_mcuy, 2*n_mcux, 8, 8), 'cb': (n_mcuy, n_mcux, 8,
    8), 'cr': ...} quantized int32 natural-order blocks, header).
    Interleaved MCU order (T.81 A.2.3) with per-component DC
    predictors; restart markers reset all three."""
    hdr = _jpeg_parse_headers_multi(data)
    if hdr.progressive:
        raise ValueError(
            "progressive stream on the baseline color path — use"
            " decode_jpeg_progressive_dc"
        )
    if len(hdr.comps) != 3:
        raise ValueError("decode_jpeg_color needs a 3-component JPEG")
    samps = [(c.hsamp, c.vsamp) for c in hdr.comps]
    if samps != [(2, 2), (1, 1), (1, 1)]:
        raise ValueError(f"only 4:2:0 (2x2,1x1,1x1) supported, got {samps}")
    n_mcuy, n_mcux = -(-hdr.h // 16), -(-hdr.w // 16)
    names = ("y", "cb", "cr")
    out = {
        "y": np.zeros((2 * n_mcuy, 2 * n_mcux, 64), dtype=np.int32),
        "cb": np.zeros((n_mcuy, n_mcux, 64), dtype=np.int32),
        "cr": np.zeros((n_mcuy, n_mcux, 64), dtype=np.int32),
    }
    tables = {}
    for name, comp in zip(names, hdr.comps):
        td, ta = hdr.sos_tables.get(comp.comp_id, (0, 0))
        tables[name] = (hdr.dc_tables[td], hdr.ac_tables[ta])
    reader = _JpegBitReader(data, hdr.sos_pos)
    preds = {n: 0 for n in names}
    mcu = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if hdr.restart_interval and mcu and mcu % hdr.restart_interval == 0:
                reader.sync_restart()
                preds = {n: 0 for n in names}
            mcu += 1
            for r in range(2):
                for c in range(2):
                    zz, preds["y"] = _decode_entropy_block(
                        reader, *tables["y"], preds["y"]
                    )
                    nat = np.zeros(64, dtype=np.int32)
                    nat[_JPEG_ZIGZAG] = zz
                    out["y"][2 * my + r, 2 * mx + c] = nat
            for name in ("cb", "cr"):
                zz, preds[name] = _decode_entropy_block(
                    reader, *tables[name], preds[name]
                )
                nat = np.zeros(64, dtype=np.int32)
                nat[_JPEG_ZIGZAG] = zz
                out[name][my, mx] = nat
    return (
        {n: a.reshape(a.shape[0], a.shape[1], 8, 8) for n, a in out.items()},
        hdr,
    )


def decode_jpeg_dc_color(
    data: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """3-component 4:2:0 JPEG bytes -> (y_dc, cb_dc, cr_dc) int32
    planes of QUANTIZED per-component DC coefficients — the color "DC
    thumbnail" (1/64-scale luma + 1/256-scale chroma views) with no
    IDCT. Like the greyscale path, the full AC walk runs per block to
    advance the bitstream, so the whole interleaved entropy layer is
    on this path."""
    coefs, _ = _decode_jpeg_coefficients_color(data)
    return (
        coefs["y"][:, :, 0, 0],
        coefs["cb"][:, :, 0, 0],
        coefs["cr"][:, :, 0, 0],
    )


def _jpeg_idct_plane(coefs: np.ndarray, quant: np.ndarray) -> np.ndarray:
    deq = coefs.astype(np.float64) * quant[None, None]
    blocks = np.einsum("xu,byuv,zv->byxz", _JPEG_DCT.T, deq, _JPEG_DCT.T)
    n_by, n_bx = coefs.shape[:2]
    raster = blocks.transpose(0, 2, 1, 3).reshape(n_by * 8, n_bx * 8) + 128.0
    return np.clip(np.round(raster), 0, 255).astype(np.uint8)


def decode_jpeg_color(data: bytes) -> np.ndarray:
    """3-component 4:2:0 baseline JPEG bytes -> (h, w, 3) uint8 RGB:
    per-component IDCT, nearest-neighbor 2x chroma upsampling, JFIF
    YCbCr -> RGB (BT.601 full-range), clamp, crop to SOF0 dims."""
    coefs, hdr = _decode_jpeg_coefficients_color(data)
    tq = {n: hdr.quants[c.tq] for n, c in zip(("y", "cb", "cr"), hdr.comps)}
    h, w = hdr.h, hdr.w
    yp = _jpeg_idct_plane(coefs["y"], tq["y"])[:h, :w].astype(np.float64)
    cbp = _jpeg_idct_plane(coefs["cb"], tq["cb"])
    crp = _jpeg_idct_plane(coefs["cr"], tq["cr"])
    cbu = cbp.repeat(2, axis=0).repeat(2, axis=1)[:h, :w].astype(np.float64)
    cru = crp.repeat(2, axis=0).repeat(2, axis=1)[:h, :w].astype(np.float64)
    r = yp + 1.402 * (cru - 128.0)
    g = yp - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0)
    b = yp + 1.772 * (cbu - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def rgb_to_ycbcr420(
    rgb: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 RGB -> (y, cb, cr) planes with 2x2 box-averaged
    chroma subsampling (JFIF BT.601 full-range; floats rounded
    half-up). The encode-side companion to :func:`decode_jpeg_color`;
    float math is on the tested-roundtrip path, never the oracle."""
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    h, w = y.shape
    ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
    cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
    crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
    cb2 = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr2 = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    to8 = lambda a: np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(cb2), to8(cr2)


def split_jpeg_restarts(data: bytes) -> tuple[bytes, list[bytes]]:
    """Split a baseline JPEG at its restart-marker boundaries:
    -> (header bytes through SOS, [entropy bytes per interval]).

    This is what restart markers are FOR (T.81 B.2.1): RSTn is
    byte-aligned and byte stuffing (FF -> FF 00) guarantees no FF
    D0..D7 sequence can occur inside entropy data, so the scan can be
    partitioned by a PURE BYTE SCAN — no entropy decode, no Huffman
    tables — and each interval is independently decodable (the DC
    predictor resets to 0 at every marker). That turns one large
    image into many parallel decode tasks: a single object no longer
    serializes into a single task, which is the intra-file analogue
    of fan_out's file-level spread.

    The byte scan is component-agnostic — greyscale and interleaved
    4:2:0 color scans split identically; only the expected interval
    count depends on the MCU geometry (per-block for 1x1 single
    component, per-16x16-MCU for 2x2 color).

    Raises ValueError when the interval structure implied by DRI and
    the SOF0 dimensions does not match the markers actually present.
    """
    hdr = _jpeg_parse_headers_multi(data)
    n = len(data)
    segs: list[bytes] = []
    start = hdr.sos_pos
    i = hdr.sos_pos
    closed = False
    while i + 1 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0x00:  # stuffed FF: entropy data
            i += 2
        elif 0xD0 <= marker <= 0xD7:  # RSTn
            segs.append(data[start:i])
            start = i + 2
            i += 2
        elif marker == 0xD9:  # EOI
            segs.append(data[start:i])
            closed = True
            break
        else:
            raise ValueError(f"unexpected marker {marker:#x} in scan")
    if not closed:
        raise ValueError("truncated JPEG: missing EOI")
    if len(hdr.comps) == 1:
        mcus = -(-hdr.h // 8) * (-(-hdr.w // 8))
    else:
        mcus = -(-hdr.h // 16) * (-(-hdr.w // 16))
    expect = (
        -(-mcus // hdr.restart_interval) if hdr.restart_interval else 1
    )
    if len(segs) != expect:
        raise ValueError(
            f"found {len(segs)} restart intervals, DRI/SOF0 imply {expect}"
        )
    return data[: hdr.sos_pos], segs


class JpegSegmentDecoder:
    """Parse a JPEG header ONCE, entropy-decode many restart intervals.

    The header (canonical Huffman table reconstruction) is
    byte-identical across every interval of a payload — and across
    payloads from the same encoder config — so callers decoding many
    segments memoize one decoder per distinct header instead of paying
    the parse per interval (~7% of per-interval decode cost)."""

    def __init__(self, header: bytes) -> None:
        self._hdr = _jpeg_parse_headers(header)

    def dc(self, seg: bytes, n_mcus: int) -> np.ndarray:
        """One interval's entropy bytes -> (n_mcus,) int32 quantized
        DC values in scan order. The DC predictor starts at 0 exactly
        as it does after a restart marker; the AC walk still runs per
        block (it advances the bitstream), so Huffman and DPCM bugs
        surface here the same as in the whole-image decoder."""
        hdr = self._hdr
        reader = _JpegBitReader(seg, 0)
        pred = 0
        out = np.empty(n_mcus, dtype=np.int32)
        for k in range(n_mcus):
            zz, pred = _decode_entropy_block(
                reader, hdr.dc_table, hdr.ac_table, pred
            )
            out[k] = zz[0]
        return out


def decode_jpeg_segment_dc(header: bytes, seg: bytes, n_mcus: int) -> np.ndarray:
    """Entropy-decode ONE restart interval standalone: -> (n_mcus,)
    int32 quantized DC values in scan order. ``header`` is the
    marker-stream prefix from split_jpeg_restarts (tables travel with
    the segment — the decoder assumes nothing about the encoder).
    One-shot convenience over JpegSegmentDecoder."""
    return JpegSegmentDecoder(header).dc(seg, n_mcus)


class JpegColorSegmentDecoder:
    """The color (4:2:0 interleaved) counterpart of
    :class:`JpegSegmentDecoder`: parse the 3-component header ONCE,
    entropy-decode many restart intervals independently. Every
    interval starts with all three DC predictors at 0 (T.81 B.2.1),
    exactly as the whole-image decoder resets them at each RSTn, so
    intervals decode in any order on any task."""

    def __init__(self, header: bytes) -> None:
        hdr = _jpeg_parse_headers_multi(header)
        if len(hdr.comps) != 3:
            raise ValueError("color segment decoder needs a 3-component JPEG")
        samps = [(c.hsamp, c.vsamp) for c in hdr.comps]
        if samps != [(2, 2), (1, 1), (1, 1)]:
            raise ValueError(f"only 4:2:0 supported, got {samps}")
        self._tables = []
        for comp in hdr.comps:
            td, ta = hdr.sos_tables.get(comp.comp_id, (0, 0))
            self._tables.append((hdr.dc_tables[td], hdr.ac_tables[ta]))

    def dc(
        self, seg: bytes, n_mcus: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One interval's entropy bytes -> ((n_mcus, 4) Y quantized
        DCs in sub-block raster order, (n_mcus,) Cb, (n_mcus,) Cr),
        MCUs in scan order. The full AC walk runs per block — it is
        what advances the bitstream."""
        reader = _JpegBitReader(seg, 0)
        preds = [0, 0, 0]
        y = np.empty((n_mcus, 4), dtype=np.int32)
        cb = np.empty(n_mcus, dtype=np.int32)
        cr = np.empty(n_mcus, dtype=np.int32)
        (ydc, yac), (cbdc, cbac), (crdc, crac) = self._tables
        for k in range(n_mcus):
            for s in range(4):
                zz, preds[0] = _decode_entropy_block(reader, ydc, yac, preds[0])
                y[k, s] = zz[0]
            zz, preds[1] = _decode_entropy_block(reader, cbdc, cbac, preds[1])
            cb[k] = zz[0]
            zz, preds[2] = _decode_entropy_block(reader, crdc, crac, preds[2])
            cr[k] = zz[0]
        return y, cb, cr


# -- Progressive JPEG (SOF2): DC-scan decode --------------------------------
#
# Most large web JPEGs are progressive: the image arrives as a
# sequence of scans — a DC scan first (optionally with the low Al
# bits deferred), then AC bands refined over further scans. For a
# training-data pipeline the FIRST scan is the prize: it alone yields
# the quantized-DC thumbnail (the same 1/64-scale view m17 extracts
# from baseline files) without decoding the other 90% of the bytes.
# decode_jpeg_progressive_dc parses the marker stream, entropy-decodes
# ONLY the first scan (interleaved or single-component, generic
# HxV sampling factors, successive-approximation shift Al), and
# returns the per-component DC planes. Later scans are untouched —
# that is the point.


def encode_jpeg_progressive_dc(
    arr: np.ndarray, restart_interval: int = 0
) -> bytes:
    """(h, w) uint8 greyscale raster -> progressive JFIF bytes whose
    single scan is the full-precision DC scan (Ss=Se=0, Ah=Al=0) —
    the 'DC-only progressive' layout real encoders emit first. DC
    quantization uses the same exact integer formula as encode_jpeg,
    so the decoded DC plane is oracle-statable identically."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"bad dimensions {h}x{w}")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .astype(np.int64)
    )
    sums = blocks.reshape(ph // 8, pw // 8, 64).sum(axis=2)

    writer = _JpegBitWriter()
    pred = 0
    mcu = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart_marker((mcu // restart_interval - 1) % 8)
                pred = 0
            mcu += 1
            dc = _round_half_away(int(sums[by, bx]) - 8192, 128)
            size, extra = _jpeg_magnitude(dc - pred)
            pred = dc
            code, length = _JPEG_DC_CODES[size]
            writer.put(code, length)
            if size:
                writer.put(extra, size)
    entropy = writer.flush()

    zz_quant = JPEG_QUANT.reshape(64)[_JPEG_ZIGZAG].astype(np.uint8).tobytes()
    out = bytearray()
    out += b"\xff\xd8"
    out += _jpeg_segment(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _jpeg_segment(0xDB, b"\x00" + zz_quant)
    out += _jpeg_segment(
        0xC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    )  # SOF2
    out += _jpeg_segment(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    if restart_interval:
        out += _jpeg_segment(0xDD, struct.pack(">H", restart_interval))
    # SOS: 1 component, DC scan Ss=0 Se=0 Ah=0 Al=0
    out += _jpeg_segment(0xDA, b"\x01\x01\x00\x00\x00\x00")
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_progressive_dc(data: bytes) -> dict[str, np.ndarray]:
    """Progressive (SOF2) JPEG bytes -> {component name: int32 DC
    plane} from the FIRST scan only. The plane holds the quantized DC
    coefficients as coded in scan 1, shifted left by the scan's
    successive-approximation Al (so they approximate the full DC to
    within 2^Al); component names are 'y'/'cb'/'cr' for 3-component
    streams, 'y' for greyscale. Generic HxV sampling factors: the
    interleaved MCU walk visits hsamp x vsamp blocks per component
    per MCU (T.81 A.2.3); a single-component first scan walks that
    component's own block grid. Later scans are never read."""
    hdr = _jpeg_parse_headers_multi(data)
    if not hdr.progressive:
        raise ValueError("not a progressive (SOF2) stream")
    ss, se, _ah, al = hdr.scan_spec
    if ss != 0 or se != 0:
        raise ValueError("first scan is not a DC scan")
    names = ["y", "cb", "cr"][: len(hdr.comps)]
    by_id = {c.comp_id: (names[i], c) for i, c in enumerate(hdr.comps)}
    max_h = max(c.hsamp for c in hdr.comps)
    max_v = max(c.vsamp for c in hdr.comps)
    n_mcux = -(-hdr.w // (8 * max_h))
    n_mcuy = -(-hdr.h // (8 * max_v))
    planes = {
        names[i]: np.zeros(
            (n_mcuy * c.vsamp, n_mcux * c.hsamp), dtype=np.int32
        )
        for i, c in enumerate(hdr.comps)
    }
    reader = _JpegBitReader(data, hdr.sos_pos)
    preds = {n: 0 for n in names}

    def read_dc(name: str, table) -> int:
        size = reader.huffman(table)
        preds[name] += _jpeg_extend(reader.bits(size), size)
        return preds[name] << al

    if len(hdr.scan_comps) > 1:  # interleaved DC scan over all comps
        mcu = 0
        for my in range(n_mcuy):
            for mx in range(n_mcux):
                if (
                    hdr.restart_interval
                    and mcu
                    and mcu % hdr.restart_interval == 0
                ):
                    reader.sync_restart()
                    preds.update({n: 0 for n in names})
                mcu += 1
                for cid in hdr.scan_comps:
                    name, comp = by_id[cid]
                    td, _ = hdr.sos_tables.get(cid, (0, 0))
                    table = hdr.dc_tables[td]
                    for r in range(comp.vsamp):
                        for c in range(comp.hsamp):
                            planes[name][
                                my * comp.vsamp + r, mx * comp.hsamp + c
                            ] = read_dc(name, table)
    else:  # non-interleaved: the component's own block grid
        cid = hdr.scan_comps[0]
        name, comp = by_id[cid]
        td, _ = hdr.sos_tables.get(cid, (0, 0))
        table = hdr.dc_tables[td]
        rows = -(-(hdr.h * comp.vsamp) // (8 * max_v))
        cols = -(-(hdr.w * comp.hsamp) // (8 * max_h))
        planes[name] = np.zeros((rows, cols), dtype=np.int32)
        mcu = 0
        for by in range(rows):
            for bx in range(cols):
                if (
                    hdr.restart_interval
                    and mcu
                    and mcu % hdr.restart_interval == 0
                ):
                    reader.sync_restart()
                    preds[name] = 0
                mcu += 1
                planes[name][by, bx] = read_dc(name, table)
    return planes


# -- FLAC (fixed-predictor subset, mono 16-bit) ------------------------------
#
# A real lossless audio codec from the public FLAC format spec
# (xiph.org/flac/format.html): fLaC magic + STREAMINFO metadata block,
# then self-synchronizing frames — 14-bit sync code, coded frame
# number, CRC-8-protected header, one mono subframe per frame
# (CONSTANT / VERBATIM / FIXED order 0-4, plus LPC orders 1-32),
# rice-coded residuals (unary quotient + k-bit remainder over the
# zigzag mapping), and a CRC-16 over the whole frame. Everything is
# integer and bit-exact — FLAC is lossless — so decode(encode(pcm)) ==
# pcm EXACTLY and the decoded samples are oracle-statable.
#
# LPC subframes (the general quantized-coefficient linear predictor
# real-world encoders emit on nearly every frame) carry the
# coefficients IN the bitstream — precision-1 (4 bits), a signed
# 5-bit right-shift, then `order` signed precision-bit coefficients —
# and reconstruct with pure integer arithmetic:
#   x[i] = residual[i] + ((sum_j c_j * x[i-1-j]) >> shift)
# (arithmetic shift, i.e. floor). How an encoder ESTIMATES the
# coefficients is unconstrained by the spec (float math is fine);
# losslessness never depends on it because the residual is computed
# with the same quantized integer prediction the decoder runs.

FLAC_MAGIC = b"fLaC"

# 4-bit sample-rate codes from the frame-header table (subset).
_FLAC_RATES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_FLAC_RATES_INV = {v: k for k, v in _FLAC_RATES.items()}

# Fixed-predictor residual: res = x convolved with these (order -> taps).
_FLAC_FIXED = {
    0: [1],
    1: [1, -1],
    2: [1, -2, 1],
    3: [1, -3, 3, -1],
    4: [1, -4, 6, -4, 1],
}


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame header.
    Table-driven (one lookup per byte; the bit-serial definition lives
    in _crc_table)."""
    crc = 0
    table = _CRC8_TABLE
    for byte in data:
        crc = table[crc ^ byte]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame.
    Table-driven (one lookup per byte)."""
    crc = 0
    table = _CRC16_TABLE
    for byte in data:
        crc = (table[(crc >> 8) ^ byte] ^ (crc << 8)) & 0xFFFF
    return crc


class _BitWriter:
    """MSB-first bit packer (no byte stuffing — FLAC doesn't stuff)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over a byte window."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bitpos = pos * 8

    def bits(self, n: int) -> int:
        """Read n bits in one int.from_bytes over the covering byte
        span (the per-bit shift loop was the decode hot spot)."""
        if n == 0:
            return 0
        start = self.bitpos
        end = start + n
        byte_end = (end + 7) >> 3
        if byte_end > len(self.data):
            raise ValueError("truncated FLAC stream")
        word = int.from_bytes(self.data[start >> 3 : byte_end], "big")
        self.bitpos = end
        return (word >> ((byte_end << 3) - end)) & ((1 << n) - 1)

    def unary(self) -> int:
        """Count leading zero bits up to the terminating one — scanned
        a byte at a time (bit_length finds the first set bit)."""
        data = self.data
        pos = self.bitpos
        q = 0
        while True:
            byte_i = pos >> 3
            if byte_i >= len(data):
                raise ValueError("truncated FLAC stream")
            bit_i = pos & 7
            rest = data[byte_i] & (0xFF >> bit_i)
            if rest:
                first_one = 8 - rest.bit_length()
                q += first_one - bit_i
                self.bitpos = (byte_i << 3) + first_one + 1
                return q
            q += 8 - bit_i
            pos = (byte_i + 1) << 3
            if q > 1 << 20:
                raise ValueError("runaway unary code (corrupt FLAC)")

    def align(self) -> None:
        self.bitpos = -(-self.bitpos // 8) * 8

    def bytepos(self) -> int:
        assert self.bitpos % 8 == 0
        return self.bitpos // 8


def _flac_coded_number(n: int) -> bytes:
    """Frame-number coding (the UTF-8-style variable-length integer
    from the frame-header spec)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits_left = n.bit_length()
    nbytes = 2
    while bits_left > 6 - nbytes + 5 * (nbytes - 1) + 1:
        # capacity of an nbytes sequence: (7 - nbytes) + 6*(nbytes-1)
        if (7 - nbytes) + 6 * (nbytes - 1) >= bits_left:
            break
        nbytes += 1
        if nbytes > 7:
            raise ValueError("frame number too large")
    while (7 - nbytes) + 6 * (nbytes - 1) < bits_left:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | ((n >> shift) & ((1 << (7 - nbytes)) - 1)))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _flac_read_coded_number(reader: _BitReader) -> int:
    first = reader.bits(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    n = first & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        byte = reader.bits(8)
        if byte & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        n = (n << 6) | (byte & 0x3F)
    return n


def _flac_stream_header(
    n: int, sample_rate: int, blocksize: int, channels: int = 1
) -> bytes:
    """fLaC magic + STREAMINFO (last-metadata flag set)."""
    info = bytearray()
    info += struct.pack(">HH", blocksize, blocksize)
    info += b"\x00\x00\x00" * 2  # min/max framesize unknown
    # sample_rate(20) | channels-1(3) | bps-1(5) | total_samples(36)
    packed = (sample_rate << 44) | ((channels - 1) << 41) | (15 << 36) | n
    info += packed.to_bytes(8, "big")
    info += bytes(16)  # raw-PCM MD5 unknown
    return (
        FLAC_MAGIC + bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)
    )


def _flac_frame_header(
    f: int, bs: int, sample_rate: int, chan_code: int = 0b0000
) -> bytes:
    """CRC-8-terminated frame header (16 bps, 16-bit blocksize at end
    of header; ``chan_code`` is the 4-bit channel-assignment field:
    0=mono, 1=independent stereo, 8=left/side, 9=right/side,
    10=mid/side)."""
    hdr = _BitWriter()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 1)  # reserved
    hdr.put(0, 1)  # fixed-blocksize stream
    hdr.put(0b0111, 4)  # blocksize: 16-bit at end of header
    hdr.put(_FLAC_RATES[sample_rate], 4)
    hdr.put(chan_code, 4)
    hdr.put(0b100, 3)  # 16 bps
    hdr.put(0, 1)  # reserved
    hdr.align()
    header = hdr.bytes() + _flac_coded_number(f) + struct.pack(">H", bs - 1)
    return header + bytes([_crc8(header)])


def _write_rice(body: _BitWriter, res: np.ndarray) -> None:
    """Partition-order-0 rice residual with k from the mean zigzag
    magnitude (the spec's own estimator)."""
    u = (res << 1) ^ (res >> 63)  # zigzag
    mean = int(u.mean()) if u.size else 0
    k = min(14, max(0, int(mean).bit_length() - 1))
    body.put(0b00, 2)  # rice, 4-bit params
    body.put(0, 4)  # partition order 0
    body.put(k, 4)
    for uv in u:
        body.unary(int(uv) >> k)
        if k:
            body.put(int(uv) & ((1 << k) - 1), k)


def _flac_validate(samples: np.ndarray, sample_rate: int, blocksize: int):
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError(
            f"expected 1-D int16, got {samples.shape} {samples.dtype}"
        )
    if sample_rate not in _FLAC_RATES:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    if not 16 <= blocksize <= 65535:
        raise ValueError(f"bad blocksize {blocksize}")


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    blocksize: int = 1024,
) -> bytes:
    """1-D int16 mono samples -> FLAC bytes (fixed-predictor subset).

    Per block, the encoder picks the fixed predictor order (0-4)
    minimizing the residual magnitude sum — the spec's own fast
    estimation — then rice-codes the residuals in one partition with
    k chosen from the mean magnitude. A constant block becomes a
    CONSTANT subframe. Lossless by construction: decode_flac returns
    the exact samples."""
    _flac_validate(samples, sample_rate, blocksize)
    n = samples.size
    out = bytearray(_flac_stream_header(n, sample_rate, blocksize))
    x = samples.astype(np.int64)
    for f, start in enumerate(range(0, n, blocksize)):
        blk = x[start : start + blocksize]
        bs = blk.size
        header = _flac_frame_header(f, bs, sample_rate)
        body = _BitWriter()
        _write_fixed_subframe(body, blk, 16)
        body.align()
        frame = header + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


def _write_fixed_subframe(body: _BitWriter, blk: np.ndarray, eff: int) -> None:
    """One CONSTANT/FIXED subframe at ``eff`` sample bits (16 for a
    plain channel, 17 for a stereo side channel): pick the fixed
    predictor order 0-4 minimizing the residual magnitude sum (the
    spec's own fast estimation), rice-code the residual."""
    bs = blk.size
    if np.all(blk == blk[0]):
        body.put(0, 1)
        body.put(0b000000, 6)  # CONSTANT
        body.put(0, 1)
        body.put(int(blk[0]) & ((1 << eff) - 1), eff)
        return
    best_o, best_res, best_cost = 0, blk, None
    for o, taps in _FLAC_FIXED.items():
        if bs <= o:
            continue
        res = np.convolve(blk, taps)[o:bs] if o else blk
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    o, res = best_o, best_res.astype(np.int64)
    body.put(0, 1)
    body.put(8 + o, 6)  # FIXED order o
    body.put(0, 1)  # no wasted bits
    for w in blk[:o]:
        body.put(int(w) & ((1 << eff) - 1), eff)
    _write_rice(body, res)


def encode_flac_stereo(
    left: np.ndarray,
    right: np.ndarray,
    sample_rate: int = 16_000,
    blocksize: int = 1024,
) -> bytes:
    """Stereo int16 -> FLAC bytes with MID/SIDE channel decorrelation
    on every frame — how real-world encoders ship stereo audio: the
    two channels are usually near-identical, so coding
    ``mid = (l + r) >> 1`` and ``side = l - r`` (the side channel gets
    one extra bit of dynamic range, bps+1, per the spec) collapses the
    inter-channel redundancy before the per-channel predictor runs.
    Each frame carries channel assignment 0b1010 and two subframes
    (mid at 16 bits, side at 17); reconstruction is pure integer
    (``mid = (mid << 1) | (side & 1); l = (mid + side) >> 1;
    r = (mid - side) >> 1``), so the codec stays lossless for ANY
    stereo input."""
    _flac_validate(left, sample_rate, blocksize)
    _flac_validate(right, sample_rate, blocksize)
    if left.size != right.size:
        raise ValueError(f"channel lengths differ: {left.size}/{right.size}")
    n = left.size
    out = bytearray(_flac_stream_header(n, sample_rate, blocksize, channels=2))
    lx = left.astype(np.int64)
    rx = right.astype(np.int64)
    for f, start in enumerate(range(0, n, blocksize)):
        lb = lx[start : start + blocksize]
        rb = rx[start : start + blocksize]
        bs = lb.size
        mid = (lb + rb) >> 1
        side = lb - rb
        header = _flac_frame_header(f, bs, sample_rate, chan_code=0b1010)
        body = _BitWriter()
        _write_fixed_subframe(body, mid, 16)
        _write_fixed_subframe(body, side, 17)
        body.align()
        frame = header + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


def _estimate_lpc(blk: np.ndarray, order: int) -> np.ndarray | None:
    """Float LPC coefficient estimation: solve the autocorrelation
    normal equations (Toeplitz R a = r). The spec leaves estimation to
    the encoder; float math here is safe because the residual below is
    computed with the QUANTIZED integer coefficients the decoder reads
    back — losslessness never depends on this step."""
    x = blk.astype(np.float64)
    n = x.size
    ac = np.array(
        [float(np.dot(x[: n - lag], x[lag:])) for lag in range(order + 1)]
    )
    if ac[0] <= 0:
        return None
    r_mat = np.empty((order, order))
    for i in range(order):
        for j in range(order):
            r_mat[i, j] = ac[abs(i - j)]
    r_mat += np.eye(order) * (ac[0] * 1e-9)  # ridge: near-singular blocks
    try:
        return np.linalg.solve(r_mat, ac[1 : order + 1])
    except np.linalg.LinAlgError:
        return None


def _quantize_lpc(
    coefs: np.ndarray, precision: int
) -> tuple[np.ndarray, int] | None:
    """Float coefficients -> (precision-bit signed ints, right-shift):
    the largest shift (<= 15) that keeps every rounded coefficient in
    the signed precision-bit range."""
    cmax = float(np.max(np.abs(coefs)))
    if cmax <= 0:
        return None
    shift = precision - 1 - (math.floor(math.log2(cmax)) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.clip(np.round(coefs * (1 << shift)), -lim, lim - 1).astype(np.int64)
    if not q.any():
        return None
    return q, shift


def encode_flac_lpc(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    blocksize: int = 1024,
    order: int = 8,
    precision: int = 12,
) -> bytes:
    """1-D int16 mono samples -> FLAC bytes where EVERY subframe is an
    LPC subframe — the general quantized-coefficient predictor
    real-world encoders emit on nearly every frame (fixed predictors,
    ``encode_flac``, are the spec's fast path).

    Per block: estimate order-``order`` float coefficients from the
    autocorrelation normal equations, quantize to ``precision``-bit
    signed ints with a derived right-shift, compute the residual with
    the SAME integer prediction the decoder runs
    (``x[i] - ((sum c_j x[i-1-j]) >> shift)``), rice-code it. Blocks
    where estimation degenerates (constant/silence) fall back to the
    order-1 identity predictor ``c = [1 << shift]`` — still an LPC
    subframe, still lossless. Lossless by construction for any input:
    decode_flac returns the exact samples."""
    _flac_validate(samples, sample_rate, blocksize)
    if not 1 <= order <= 32:
        raise ValueError(f"LPC order {order} out of range 1-32")
    if not 2 <= precision <= 15:
        raise ValueError(f"precision {precision} out of range 2-15")
    n = samples.size
    out = bytearray(_flac_stream_header(n, sample_rate, blocksize))
    x = samples.astype(np.int64)
    for f, start in enumerate(range(0, n, blocksize)):
        blk = x[start : start + blocksize]
        bs = blk.size
        if bs < 2:
            # degenerate 1-sample tail: no room for warm-up + residual;
            # VERBATIM is the spec's own raw fallback
            header = _flac_frame_header(f, bs, sample_rate)
            body = _BitWriter()
            body.put(0, 1)
            body.put(0b000001, 6)  # VERBATIM
            body.put(0, 1)
            for w in blk:
                body.put(int(w) & 0xFFFF, 16)
            body.align()
            frame = header + body.bytes()
            frame += struct.pack(">H", _crc16(frame))
            out += frame
            continue
        o = min(order, bs - 1)
        est = _estimate_lpc(blk, o) if o >= 1 else None
        quant = _quantize_lpc(est, precision) if est is not None else None
        if quant is None:
            o, quant = 1, (np.array([1], dtype=np.int64), 0)
        q, shift = quant
        o = q.size
        # Integer residual with the quantized predictor (exact int64:
        # |sum| <= 32 * 2^(precision-1) * 2^15 < 2^31). conv[i] =
        # sum_j q_j * blk[i-j], so the prediction sum for sample i is
        # conv[i-1].
        conv = np.convolve(blk, q)
        pred = conv[o - 1 : bs - 1] >> shift  # arithmetic shift = floor
        res = blk[o:] - pred

        header = _flac_frame_header(f, bs, sample_rate)
        body = _BitWriter()
        body.put(0, 1)
        body.put(31 + o, 6)  # LPC order o
        body.put(0, 1)  # no wasted bits
        for w in blk[:o]:
            body.put(int(w) & 0xFFFF, 16)
        body.put(precision - 1, 4)
        body.put(shift, 5)
        for c in q:
            body.put(int(c) & ((1 << precision) - 1), precision)
        _write_rice(body, res)
        body.align()
        frame = header + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


def _read_rice_residual(reader: _BitReader, bs: int, order: int) -> np.ndarray:
    """Residual section shared by FIXED and LPC subframes: coding
    method (2), partition order (4), then per partition a rice
    parameter (4/5 bits, all-ones = escape to raw n-bit residuals)."""
    method = reader.bits(2)
    if method not in (0, 1):
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    porder = reader.bits(4)
    nparts = 1 << porder
    res = np.empty(bs - order, dtype=np.int64)
    ri = 0
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        k = reader.bits(pbits)
        if k == (1 << pbits) - 1:  # escape: raw n-bit residuals
            nb = reader.bits(5)
            for _ in range(cnt):
                v = reader.bits(nb) if nb else 0
                if nb and v >= 1 << (nb - 1):
                    v -= 1 << nb
                res[ri] = v
                ri += 1
        else:
            for _ in range(cnt):
                u = (reader.unary() << k) | (reader.bits(k) if k else 0)
                res[ri] = (u >> 1) ^ -(u & 1)  # un-zigzag
                ri += 1
    return res


def _read_subframe(reader: _BitReader, bs: int, eff_base: int):
    """One subframe at ``eff_base`` sample bits (16, or 17 for a
    stereo side channel): padding bit, 6-bit type, wasted-bits flag,
    then CONSTANT/VERBATIM/FIXED/LPC payload. Returns
    (int64 samples, subframe type code)."""
    if reader.bits(1) != 0:
        raise ValueError("bad subframe padding bit")
    stype = reader.bits(6)
    wasted = 0
    if reader.bits(1):
        wasted = 1 + reader.unary()
    eff = eff_base - wasted
    if stype == 0:  # CONSTANT
        v = reader.bits(eff)
        if v >= 1 << (eff - 1):
            v -= 1 << eff
        blk = np.full(bs, v << wasted, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        vals = np.empty(bs, dtype=np.int64)
        for i in range(bs):
            v = reader.bits(eff)
            if v >= 1 << (eff - 1):
                v -= 1 << eff
            vals[i] = v
        blk = vals << wasted
    elif 8 <= stype <= 12:  # FIXED order o
        o = stype - 8
        warm = np.empty(o, dtype=np.int64)
        for i in range(o):
            v = reader.bits(eff)
            if v >= 1 << (eff - 1):
                v -= 1 << eff
            warm[i] = v
        res = _read_rice_residual(reader, bs, o)
        # plain-int recurrence (numpy scalar indexing in a
        # sequential loop is ~5x slower than list arithmetic)
        vals = [int(w) for w in warm]
        if o == 0:
            vals = res.tolist()
        else:
            for r in res.tolist():
                if o == 1:
                    pred = vals[-1]
                elif o == 2:
                    pred = 2 * vals[-1] - vals[-2]
                elif o == 3:
                    pred = 3 * vals[-1] - 3 * vals[-2] + vals[-3]
                else:
                    pred = (
                        4 * vals[-1] - 6 * vals[-2]
                        + 4 * vals[-3] - vals[-4]
                    )
                vals.append(r + pred)
        blk = np.array(vals, dtype=np.int64) << wasted
    elif 32 <= stype <= 63:  # LPC order o = stype - 31
        o = stype - 31
        if o >= bs:
            raise ValueError(f"LPC order {o} >= blocksize {bs}")
        warm = np.empty(o, dtype=np.int64)
        for i in range(o):
            v = reader.bits(eff)
            if v >= 1 << (eff - 1):
                v -= 1 << eff
            warm[i] = v
        prec = reader.bits(4)
        if prec == 0b1111:
            raise ValueError("invalid LPC coefficient precision")
        prec += 1
        shift = reader.bits(5)
        if shift >= 16:
            shift -= 32  # two's complement
        if shift < 0:
            # the spec marks negative shifts obsolete; no encoder
            # emits them
            raise ValueError("negative LPC shift unsupported")
        coefs = np.empty(o, dtype=np.int64)
        for i in range(o):
            v = reader.bits(prec)
            if v >= 1 << (prec - 1):
                v -= 1 << prec
            coefs[i] = v
        res = _read_rice_residual(reader, bs, o)
        # x[i] = res + ((sum_j c_j * x[i-1-j]) >> shift); Python
        # ints keep the pre-shift dot product exact and >> is the
        # arithmetic (floor) shift the spec requires on negatives.
        cof = [int(c) for c in coefs]
        rng = range(1, o + 1)
        vals = [int(w) for w in warm]
        for r in res.tolist():
            acc = 0
            for j in rng:
                acc += cof[j - 1] * vals[-j]
            vals.append(r + (acc >> shift))
        blk = np.array(vals, dtype=np.int64) << wasted
    else:
        raise ValueError(f"unsupported subframe type {stype}")
    return blk, stype


def decode_flac(
    data: bytes, return_subframe_types: bool = False
) -> tuple[int, np.ndarray] | tuple[int, np.ndarray, list[int]]:
    """FLAC bytes -> (sample_rate, int16 samples — 1-D for mono,
    shape (2, n) [left; right] for stereo). Verifies the sync code,
    header CRC-8, and frame CRC-16 of every frame; supports 16-bit
    CONSTANT/VERBATIM/FIXED (orders 0-4) and LPC (orders 1-32,
    quantized-coefficient integer prediction) subframes,
    multi-partition rice residuals, the raw-escape rice code, and all
    four stereo channel assignments (independent, left/side,
    right/side, mid/side — the side channel reads at bps+1 and the
    inter-channel reconstruction is pure integer). With
    ``return_subframe_types`` the 6-bit subframe type codes are
    appended to the result in read order (one per frame for mono, two
    per frame for stereo; 0=CONSTANT, 1=VERBATIM, 8+o=FIXED order o,
    31+o=LPC order o)."""
    if not data.startswith(FLAC_MAGIC):
        raise ValueError("not a FLAC payload")
    pos = 4
    sample_rate = None
    total = None
    # metadata blocks
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if channels not in (1, 2) or bps != 16:
                raise ValueError(
                    f"only mono/stereo 16-bit supported ({channels} ch, "
                    f"{bps} bps)"
                )
        pos += 4 + blen
        if last:
            break
    if sample_rate is None:
        raise ValueError("missing STREAMINFO")
    out: list[np.ndarray] = []
    out_r: list[np.ndarray] = []  # right channel (stereo only)
    stypes: list[int] = []
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        reader = _BitReader(data, pos)
        if reader.bits(14) != 0b11111111111110:
            raise ValueError(f"bad FLAC sync at byte {pos}")
        reader.bits(1)
        reader.bits(1)
        bs_code = reader.bits(4)
        sr_code = reader.bits(4)
        chan = reader.bits(4)
        ss_code = reader.bits(3)
        reader.bits(1)
        if channels == 1 and chan != 0b0000:
            raise ValueError(f"mono stream with channel assignment {chan}")
        if channels == 2 and chan not in (0b0001, 0b1000, 0b1001, 0b1010):
            raise ValueError(f"bad stereo channel assignment {chan}")
        if ss_code != 0b100:
            raise ValueError("only 16-bit frames supported")
        _flac_read_coded_number(reader)
        if bs_code == 0b0110:
            bs = reader.bits(8) + 1
        elif bs_code == 0b0111:
            bs = reader.bits(16) + 1
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"bad blocksize code {bs_code}")
        if sr_code in _FLAC_RATES_INV:
            pass  # table rate; STREAMINFO stays authoritative
        elif sr_code == 0b1100:
            reader.bits(8)
        elif sr_code in (0b1101, 0b1110):
            reader.bits(16)
        elif sr_code != 0b0000:
            raise ValueError(f"bad sample-rate code {sr_code}")
        hdr_crc = reader.bits(8)
        hdr_end = reader.bytepos() if reader.bitpos % 8 == 0 else None
        if hdr_end is None:
            raise ValueError("misaligned FLAC header")
        if _crc8(data[pos : hdr_end - 1]) != hdr_crc:
            raise ValueError("FLAC header CRC-8 mismatch")
        # subframes (side channel reads at bps+1)
        if channels == 1:
            blk, st = _read_subframe(reader, bs, 16)
            out.append(blk)
            stypes.append(st)
        else:
            effs = {0b0001: (16, 16), 0b1000: (16, 17),
                    0b1001: (17, 16), 0b1010: (16, 17)}[chan]
            c0, st0 = _read_subframe(reader, bs, effs[0])
            c1, st1 = _read_subframe(reader, bs, effs[1])
            stypes += [st0, st1]
            if chan == 0b0001:  # independent L, R
                lch, rch = c0, c1
            elif chan == 0b1000:  # left/side: R = L - side
                lch, rch = c0, c0 - c1
            elif chan == 0b1001:  # right/side: channel 0 IS the side
                lch, rch = c1 + c0, c1
            else:  # mid/side (integer-exact inverse)
                m2 = (c0 << 1) | (c1 & 1)
                lch, rch = (m2 + c1) >> 1, (m2 - c1) >> 1
            out.append(lch)
            out_r.append(rch)
        reader.align()
        end = reader.bytepos()
        if end + 2 > len(data):
            raise ValueError("truncated FLAC frame")
        crc = struct.unpack(">H", data[end : end + 2])[0]
        if _crc16(data[pos:end]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        got += bs
        pos = end + 2
    pcm = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    if channels == 2:
        right = np.concatenate(out_r) if out_r else np.empty(0, dtype=np.int64)
        pcm = np.stack([pcm, right])
    if total and pcm.shape[-1] != total:
        raise ValueError(
            f"decoded {pcm.shape[-1]} samples, STREAMINFO says {total}"
        )
    if pcm.size and (pcm.max() > 32767 or pcm.min() < -32768):
        raise ValueError("decoded samples out of int16 range (corrupt FLAC)")
    if return_subframe_types:
        return int(sample_rate), pcm.astype(np.int16), stypes
    return int(sample_rate), pcm.astype(np.int16)


# =====================================================================
# WebP lossless (VP8L) — implemented from the PUBLIC WebP Lossless
# Bitstream Specification (RFC 9649) and the WebP Container
# Specification (RIFF layout, VP8X/ALPH chunks). Pure stdlib + numpy,
# same from-spec discipline as the PNG/GIF/JPEG/FLAC family above.
#
# Coverage:
#   decode: full image-stream — canonical prefix codes (simple AND
#     normal with RLE code-length coding + max_symbol), LZ77 backward
#     references (plain >120 distance codes exactly; the 120-entry 2D
#     neighborhood table is RECONSTRUCTED from the spec's published
#     ordering rule — sort by squared distance, then |dx|, positive dx
#     first — see _VP8L_DIST_TABLE), color cache, meta prefix codes,
#     and all four transforms (predictor incl. all 14 modes,
#     cross-color, subtract-green, color-indexing incl. sub-byte pixel
#     packing). Predictor modes 11-13 (Select/ClampAddSub*) follow the
#     spec pseudocode but no third-party VP8L pixel decoder exists in
#     this container to cross-check them; the verified surface is
#     pinned by hand-built bitstream vectors + encoder roundtrip +
#     the third-party ALPH stream in tests/fixtures/python.webp.
#   encode: subtract-green + one normal prefix-code group, literal
#     pixels, plain distance codes only — a minimal but fully
#     spec-valid writer (every bit it emits decodes through the
#     from-spec reader and, by construction, any compliant decoder).
# =====================================================================

WEBP_MAGIC = b"RIFF"

_VP8L_CL_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)


class _Vp8lBitReader:
    """LSB-first bit reader (VP8L convention: values little-endian
    bit-packed; canonical prefix codes emitted MSB-of-code first, as
    in DEFLATE)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _Vp8lBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def code(self, code: int, length: int) -> None:
        """Emit a canonical prefix code MSB-first (DEFLATE convention)."""
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _vp8l_canonical(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (numerically
    increasing codes in (length, symbol) order — DEFLATE rule)."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code, prev_len = 0, 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _Vp8lCode:
    """Decode side of one prefix code: either a 0-bit constant or a
    (length, code) -> symbol map walked bit-by-bit."""

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 0:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.const: int | None = nz[0][1]
            self.table: dict[tuple[int, int], int] = {}
            self.max_len = 0
            return
        self.const = None
        self.table = {
            (l, c): s for s, (c, l) in _vp8l_canonical(lengths).items()
        }
        self.max_len = max(l for l, _ in nz)

    def read(self, br: _Vp8lBitReader) -> int:
        if self.const is not None:
            return self.const
        code, depth = 0, 0
        while depth <= self.max_len:
            code = (code << 1) | br.bit()
            depth += 1
            sym = self.table.get((depth, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _balanced_lengths(freqs: dict[int, int], alphabet: int) -> list[int]:
    """Kraft-COMPLETE near-optimal code lengths: with n used symbols
    and 2**k <= n < 2**(k+1), the (2**(k+1) - n) most frequent symbols
    get length k and the rest k+1 (complete binary tree with n leaves).
    Optimal for the near-uniform md5 rasters this encoder targets and
    structurally depth-bounded (n <= 280+cache => max length 10)."""
    used = sorted(freqs, key=lambda s: (-freqs[s], s))
    lengths = [0] * alphabet
    n = len(used)
    if n == 1:
        lengths[used[0]] = 1  # handled as a simple code by the writer
        return lengths
    k = n.bit_length() - 1
    if n == (1 << k):
        short = n
    else:
        short = (1 << (k + 1)) - n
        k += 0  # short symbols keep length k, rest k+1
    for i, s in enumerate(used):
        lengths[s] = k if i < short else k + 1
    return lengths


def _vp8l_write_prefix_code(bw: _Vp8lBitWriter, lengths: list[int]) -> None:
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and max(used) < 256:
        bw.bits(1, 1)  # simple code
        bw.bits(len(used) - 1, 1)
        if used[0] < 2 and len(used) == 1:
            bw.bits(0, 1)  # first symbol in 1 bit
            bw.bits(used[0], 1)
        else:
            bw.bits(1, 1)  # first symbol in 8 bits
            bw.bits(used[0], 8)
        if len(used) == 2:
            bw.bits(used[1], 8)
        return
    bw.bits(0, 1)  # normal code
    cl_freq: dict[int, int] = {}
    for l in lengths:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = _balanced_lengths(cl_freq, 19)
    # a 1-symbol code-length code is legal at this level (the reader
    # builds a 0-bit constant code for it)
    bw.bits(19 - 4, 4)
    for sym in _VP8L_CL_ORDER:
        bw.bits(cl_lengths[sym], 3)
    cl_codes = _vp8l_canonical(cl_lengths)
    bw.bits(0, 1)  # no max_symbol shortcut
    single = len(cl_freq) == 1
    for l in lengths:
        if not single:
            c, n = cl_codes[l]
            bw.code(c, n)


def _vp8l_read_code_lengths(
    br: _Vp8lBitReader, alphabet: int
) -> list[int]:
    num_codes = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_VP8L_CL_ORDER[i]] = br.bits(3)
    cl_code = _Vp8lCode(cl_lengths)
    if br.bit():  # use max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8  # spec default when a repeat precedes any literal
    symbol = 0
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if symbol < alphabet:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif cl == 17:
            symbol += 3 + br.bits(3)
        else:  # 18
            symbol += 11 + br.bits(7)
    return lengths


def _vp8l_read_prefix_code(br: _Vp8lBitReader, alphabet: int) -> _Vp8lCode:
    if br.bit():  # simple
        num_symbols = br.bits(1) + 1
        if br.bit():
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        lengths = [0] * alphabet
        if num_symbols == 1:
            lengths[sym0] = 1  # becomes a 0-bit constant code
        else:
            sym1 = br.bits(8)
            lengths[sym0] = 1
            lengths[sym1] = 1
        return _Vp8lCode(lengths)
    return _Vp8lCode(_vp8l_read_code_lengths(br, alphabet))


def _vp8l_lz77_value(br: _Vp8lBitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _vp8l_lz77_code(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    rem = v - (2 << extra)
    code = 2 * (extra + 1) + (rem >> extra)
    return code, rem & ((1 << extra) - 1), extra


def _vp8l_dist_table() -> list[tuple[int, int]]:
    """The 120 2D distance codes, reconstructed from the spec's
    ordering: all (dx, dy) neighborhood offsets sorted by squared
    euclidean distance, ties by |dx| ascending, positive dx first.
    Codes > 120 are plain distances and bypass this table (the only
    path the encoder emits)."""
    cand = [
        (x, y)
        for y in range(0, 9)
        for x in range(-8, 9)
        if y > 0 or x > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cand[:120]


_VP8L_DIST_TABLE = _vp8l_dist_table()


def _vp8l_plane_to_dist(plane_code: int, width: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _VP8L_DIST_TABLE[plane_code - 1]
    return max(1, dy * width + dx)


def _vp8l_cache_idx(px: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)


def _vp8l_subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _vp8l_decode_pixels(
    br: _Vp8lBitReader,
    w: int,
    h: int,
    cache_bits: int,
    groups: list[list[_Vp8lCode]],
    meta: "object | None",
    meta_bits: int,
) -> "object":
    import numpy as np

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    pos = 0
    group = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            mpx = int(meta[(y >> meta_bits) * _vp8l_subsample(w, meta_bits)
                           + (x >> meta_bits)])
            group = groups[(mpx >> 8) & 0xFFFF]
        s = group[0].read(br)
        if s < 256:
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[_vp8l_cache_idx(px, cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _vp8l_lz77_value(br, s - 256)
            dist_code = group[4].read(br)
            dist = _vp8l_plane_to_dist(
                _vp8l_lz77_value(br, dist_code), w
            )
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[_vp8l_cache_idx(px, cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _vp8l_read_groups(
    br: _Vp8lBitReader, n_groups: int, cache_size: int
) -> list[list[_Vp8lCode]]:
    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    return [
        [_vp8l_read_prefix_code(br, a) for a in alphabets]
        for _ in range(n_groups)
    ]


def _vp8l_decode_image_stream(
    br: _Vp8lBitReader, w: int, h: int, is_level0: bool
) -> "object":
    """Decode one image stream at (w, h); returns a flat uint32 ARGB
    array of the FINAL image (transforms inverted) — the spec's
    DecodeImageStream."""
    import numpy as np

    transforms = []
    cur_w = w
    if is_level0:
        seen: set[int] = set()
        while br.bit():
            ttype = br.bits(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype == 2:  # subtract green
                transforms.append(("subgreen",))
            elif ttype in (0, 1):  # predictor / cross-color
                size_bits = br.bits(3) + 2
                bw_ = _vp8l_subsample(cur_w, size_bits)
                bh_ = _vp8l_subsample(h, size_bits)
                sub = _vp8l_decode_image_stream(br, bw_, bh_, False)
                transforms.append(
                    ("predictor" if ttype == 0 else "color", size_bits, sub)
                )
            elif ttype == 3:  # color indexing
                n_colors = br.bits(8) + 1
                pal = _vp8l_decode_image_stream(br, n_colors, 1, False)
                # palette entries are delta-coded componentwise
                acc = np.zeros(4, dtype=np.uint8)
                entries = []
                for px in pal:
                    cur = np.array(
                        [
                            (int(px) >> 24) & 0xFF,
                            (int(px) >> 16) & 0xFF,
                            (int(px) >> 8) & 0xFF,
                            int(px) & 0xFF,
                        ],
                        dtype=np.uint8,
                    )
                    acc = acc + cur  # uint8 wraparound
                    entries.append(
                        (int(acc[0]) << 24)
                        | (int(acc[1]) << 16)
                        | (int(acc[2]) << 8)
                        | int(acc[3])
                    )
                if n_colors <= 2:
                    pack_bits = 3
                elif n_colors <= 4:
                    pack_bits = 2
                elif n_colors <= 16:
                    pack_bits = 1
                else:
                    pack_bits = 0
                transforms.append(
                    ("palette", entries, pack_bits, cur_w)
                )
                cur_w = _vp8l_subsample(cur_w, pack_bits)
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: invalid color cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.bit():
        meta_bits = br.bits(3) + 2
        meta = _vp8l_decode_image_stream(
            br,
            _vp8l_subsample(cur_w, meta_bits),
            _vp8l_subsample(h, meta_bits),
            False,
        )
        n_groups = 1 + max(
            (int(px) >> 8) & 0xFFFF for px in meta
        )
    groups = _vp8l_read_groups(br, n_groups, 1 << cache_bits if cache_bits else 0)
    out = _vp8l_decode_pixels(
        br, cur_w, h, cache_bits, groups, meta, meta_bits
    )
    for t in reversed(transforms):
        if t[0] == "subgreen":
            out = _vp8l_inv_subtract_green(out)
        elif t[0] == "predictor":
            out = _vp8l_inv_predictor(out, cur_w, h, t[1], t[2])
        elif t[0] == "color":
            out = _vp8l_inv_color_transform(out, cur_w, h, t[1], t[2])
        else:  # palette
            entries, pack_bits, full_w = t[1], t[2], t[3]
            out = _vp8l_inv_palette(
                out, cur_w, h, entries, pack_bits, full_w
            )
            cur_w = full_w
    return out


def _vp8l_inv_subtract_green(out):
    g = (out >> 8) & 0xFF
    r = (((out >> 16) & 0xFF) + g) & 0xFF
    b = ((out & 0xFF) + g) & 0xFF
    return (out & 0xFF00FF00) | (r << 16) | b


def _vp8l_avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a & 0xFF) + (b & 0xFF)) >> 1))
    )


def _vp8l_add_pixels(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | ((((a & 0xFF) + (b & 0xFF)) & 0xFF))
    )


def _vp8l_select(l: int, t: int, tl: int) -> int:
    pa = pb = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        p = lc + tc - tlc
        pa += abs(p - lc)  # predict == left?
        pb += abs(p - tc)
    # RFC 9649 Select(): `if (pL < pT) return L else return T` — ties
    # go to TOP (libwebp agrees). `<=` here mis-decoded third-party
    # streams whenever pL == pT and L != T.
    return l if pa < pb else t


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _vp8l_clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp255(
            ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        )
        out |= c << sh
    return out


def _vp8l_clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _vp8l_avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        # RFC 9649 ClampAddSubtractHalf: `clamp(a + (a - b) / 2)` with
        # C integer division, which truncates TOWARD ZERO; Python `//`
        # floors, off by one for negative odd deltas (a=10, tl=13:
        # spec 9, floor-div 8).
        d = a - ((tl >> sh) & 0xFF)
        c = _clamp255(a + (abs(d) // 2) * (1 if d >= 0 else -1))
        out |= c << sh
    return out


def _vp8l_inv_predictor(res, w: int, h: int, size_bits: int, modes):
    """Spec predictor inverse: pixel = residual + prediction (per
    channel mod 256). Edge rules: (0,0) predicts opaque black; rest of
    the top row predicts LEFT; the left column predicts TOP; the
    top-right neighbor of the rightmost column is the scan-order pixel
    `pos - width + 1` (i.e. the CURRENT row's first pixel), exactly as
    the spec's flat addressing implies."""
    out = [0] * (w * h)
    blocks_w = _vp8l_subsample(w, size_bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = out[pos - 1]
        elif x == 0:
            pred = out[pos - w]
        else:
            mode = (
                int(modes[(y >> size_bits) * blocks_w + (x >> size_bits)])
                >> 8
            ) & 0xFF
            left = out[pos - 1]
            top = out[pos - w]
            tl = out[pos - w - 1]
            tr = out[pos - w + 1]  # wraps to this row's x=0 when x==w-1
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _vp8l_avg2(_vp8l_avg2(left, tr), top)
            elif mode == 6:
                pred = _vp8l_avg2(left, tl)
            elif mode == 7:
                pred = _vp8l_avg2(left, top)
            elif mode == 8:
                pred = _vp8l_avg2(tl, top)
            elif mode == 9:
                pred = _vp8l_avg2(top, tr)
            elif mode == 10:
                pred = _vp8l_avg2(
                    _vp8l_avg2(left, tl), _vp8l_avg2(top, tr)
                )
            elif mode == 11:
                pred = _vp8l_select(left, top, tl)
            elif mode == 12:
                pred = _vp8l_clamp_add_sub_full(left, top, tl)
            elif mode == 13:
                pred = _vp8l_clamp_add_sub_half(left, top, tl)
            else:
                raise ValueError(f"VP8L: invalid predictor mode {mode}")
        out[pos] = _vp8l_add_pixels(int(res[pos]), pred)
    import numpy as np

    return np.array(out, dtype=np.uint32)


def _vp8l_color_delta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 — the spec's ColorTransformDelta."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _vp8l_inv_color_transform(res, w: int, h: int, size_bits: int, cm):
    import numpy as np

    out = np.zeros(w * h, dtype=np.uint32)
    blocks_w = _vp8l_subsample(w, size_bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        el = int(cm[(y >> size_bits) * blocks_w + (x >> size_bits)])
        # spec element layout: green_to_red in the BLUE channel,
        # green_to_blue in GREEN, red_to_blue in RED
        g2r, g2b, r2b = el & 0xFF, (el >> 8) & 0xFF, (el >> 16) & 0xFF
        px = int(res[pos])
        a = (px >> 24) & 0xFF
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        r = (r + _vp8l_color_delta(g2r, g)) & 0xFF
        b = (b + _vp8l_color_delta(g2b, g) + _vp8l_color_delta(r2b, r)) & 0xFF
        out[pos] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _vp8l_inv_palette(res, packed_w, h, entries, pack_bits, full_w):
    import numpy as np

    out = np.zeros(full_w * h, dtype=np.uint32)
    per = 1 << pack_bits
    bpp = 8 >> pack_bits
    mask = (1 << bpp) - 1
    for y in range(h):
        for x in range(full_w):
            packed = int(res[y * packed_w + (x >> pack_bits)])
            idx = ((packed >> 8) >> ((x % per) * bpp)) & mask
            if idx >= len(entries):
                raise ValueError("VP8L: palette index out of range")
            out[y * full_w + x] = entries[idx]
    return out


def decode_webp_lossless_stream(
    data: bytes, w: int, h: int, is_level0: bool = True
):
    """Decode a headerless VP8L image stream (the ALPH-chunk form) to
    a flat uint32 ARGB array."""
    br = _Vp8lBitReader(data)
    return _vp8l_decode_image_stream(br, w, h, is_level0)


def _riff_chunk_list(data: bytes) -> list[tuple[bytes, bytes]]:
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) file")
    chunks: list[tuple[bytes, bytes]] = []
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        chunks.append((tag, data[pos + 8 : pos + 8 + size]))
        pos += 8 + size + (size & 1)
    return chunks


def _riff_chunks(data: bytes) -> dict[bytes, bytes]:
    return dict(_riff_chunk_list(data))


def _decode_vp8l_payload(payload: bytes):
    """A full VP8L chunk payload (signature + header + stream) ->
    (h, w, 3) uint8 RGB raster."""
    import numpy as np

    if payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _Vp8lBitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha_is_used hint
    if br.bits(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb = _vp8l_decode_image_stream(br, w, h, True)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    arr = argb.reshape(h, w)
    out[:, :, 0] = (arr >> 16) & 0xFF
    out[:, :, 1] = (arr >> 8) & 0xFF
    out[:, :, 2] = arr & 0xFF
    return out


def decode_webp_lossless(data: bytes):
    """RIFF 'WEBP' + VP8L chunk -> (h, w, 3) uint8 RGB raster."""
    chunks = _riff_chunks(data)
    if b"VP8L" not in chunks:
        raise ValueError("WebP: no VP8L chunk (lossy VP8 not supported)")
    return _decode_vp8l_payload(chunks[b"VP8L"])


def _webp_chunk(tag: bytes, body: bytes) -> bytes:
    import struct

    out = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def encode_webp_anim(frames, durations_ms: int = 40) -> bytes:
    """(n, h, w, 3) uint8 RGB -> animated WebP (container spec: VP8X
    with the ANIM flag, one ANIM chunk, one ANMF chunk per frame, each
    carrying a lossless VP8L frame at the full canvas)."""
    import struct

    import numpy as np

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape[:3]
    vp8x = bytes([0x02, 0, 0, 0]) + struct.pack("<I", w - 1)[:3] + struct.pack(
        "<I", h - 1
    )[:3]
    anim = struct.pack("<I", 0) + struct.pack("<H", 0)  # bg BGRA + loops
    body = _webp_chunk(b"VP8X", vp8x) + _webp_chunk(b"ANIM", anim)
    for i in range(n):
        inner = encode_webp_lossless(frames[i])
        vp8l_chunk = inner[12:]  # strip the frame's own RIFF header
        anmf = (
            struct.pack("<I", 0)[:3]          # frame_x / 2
            + struct.pack("<I", 0)[:3]        # frame_y / 2
            + struct.pack("<I", w - 1)[:3]
            + struct.pack("<I", h - 1)[:3]
            + struct.pack("<I", durations_ms)[:3]
            + bytes([0])                      # blend over, keep canvas
            + vp8l_chunk
        )
        body += _webp_chunk(b"ANMF", anmf)
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp_anim(data: bytes):
    """Animated WebP -> ((n, h, w, 3) uint8 RGB frames, durations_ms).
    Only full-canvas VP8L frames are supported (what encode_webp_anim
    writes; lossy ANMF frames raise)."""
    import struct

    import numpy as np

    chunks = _riff_chunk_list(data)
    tags = [t for t, _ in chunks]
    if b"VP8X" not in tags:
        raise ValueError("WebP: no VP8X chunk (not extended format)")
    vp8x = dict(chunks)[b"VP8X"]
    if not vp8x[0] & 0x02:
        raise ValueError("WebP: ANIM flag not set")
    frames, durations = [], []
    for tag, payload in chunks:
        if tag != b"ANMF":
            continue
        fw = 1 + (payload[6] | payload[7] << 8 | payload[8] << 16)
        fh = 1 + (payload[9] | payload[10] << 8 | payload[11] << 16)
        dur = payload[12] | payload[13] << 8 | payload[14] << 16
        sub = payload[16:]
        stag = sub[0:4]
        if stag != b"VP8L":
            raise ValueError(f"ANMF: unsupported frame codec {stag!r}")
        size = struct.unpack("<I", sub[4:8])[0]
        arr = _decode_vp8l_payload(sub[8 : 8 + size])
        if arr.shape[:2] != (fh, fw):
            raise ValueError("ANMF: frame dims disagree with VP8L header")
        frames.append(arr)
        durations.append(dur)
    if not frames:
        raise ValueError("WebP: no ANMF frames")
    return np.stack(frames), durations


def webp_info(data: bytes) -> dict:
    """Container-level metadata: chunk list, canvas size, alpha/format
    flags — cross-checked from the independent VP8X and frame headers
    where both exist (the real-file interop layer)."""
    chunks = _riff_chunks(data)
    info: dict = {"chunks": [t.decode("ascii").strip() for t in chunks]}
    if b"VP8X" in chunks:
        v = chunks[b"VP8X"]
        info["canvas_w"] = 1 + (v[4] | v[5] << 8 | v[6] << 16)
        info["canvas_h"] = 1 + (v[7] | v[8] << 8 | v[9] << 16)
        info["has_alpha"] = bool(v[0] & 0x10)
        info["has_anim"] = bool(v[0] & 0x02)
    if b"VP8 " in chunks:
        f = chunks[b"VP8 "]
        tag = f[0] | f[1] << 8 | f[2] << 16
        info["format"] = "lossy"
        info["keyframe"] = not (tag & 1)
        if f[3:6] != b"\x9d\x01\x2a":
            raise ValueError("VP8: bad start code")
        info["frame_w"] = (f[6] | f[7] << 8) & 0x3FFF
        info["frame_h"] = (f[8] | f[9] << 8) & 0x3FFF
    if b"VP8L" in chunks:
        p = chunks[b"VP8L"]
        if p[0] != 0x2F:
            raise ValueError("VP8L: bad signature byte")
        br = _Vp8lBitReader(p[1:])
        info["format"] = "lossless"
        info["frame_w"] = br.bits(14) + 1
        info["frame_h"] = br.bits(14) + 1
    if b"ALPH" in chunks:
        a = chunks[b"ALPH"]
        info["alpha_compression"] = a[0] & 3
        info["alpha_filter"] = (a[0] >> 2) & 3
        info["alpha_preprocess"] = (a[0] >> 4) & 3
    n_anmf = sum(1 for t, _ in _riff_chunk_list(data) if t == b"ANMF")
    if n_anmf:
        info["n_frames"] = n_anmf
    return info


def decode_webp_alpha(data: bytes):
    """Decode the ALPH chunk's alpha plane of a VP8X WebP. Compression
    method 1 is a headerless VP8L stream with alpha in the GREEN
    channel (container spec 'Alpha' section) — this is the one REAL
    third-party VP8L bitstream path testable in this container."""
    import numpy as np

    chunks = _riff_chunks(data)
    info = webp_info(data)
    a = chunks[b"ALPH"]
    w, h = info["canvas_w"], info["canvas_h"]
    method = a[0] & 3
    filt = (a[0] >> 2) & 3
    if method == 0:
        plane = np.frombuffer(a[1 : 1 + w * h], dtype=np.uint8).reshape(h, w)
        plane = plane.copy()
    elif method == 1:
        argb = decode_webp_lossless_stream(a[1:], w, h, True)
        plane = ((argb.reshape(h, w) >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"ALPH: invalid compression method {method}")
    if filt:
        # filters 1..3: horizontal / vertical / gradient prediction,
        # inverse-applied in scan order (container spec)
        out = plane.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                else:
                    left, top, tl = (
                        out[y, x - 1],
                        out[y - 1, x],
                        out[y - 1, x - 1],
                    )
                    if filt == 1:
                        pred = left
                    elif filt == 2:
                        pred = top
                    else:
                        pred = min(max(left + top - tl, 0), 255)
                out[y, x] = (out[y, x] + pred) & 0xFF
        plane = out.astype(np.uint8)
    return plane


def encode_webp_lossless(arr) -> bytes:
    """(h, w, 3) uint8 RGB -> RIFF/VP8L bytes: subtract-green
    transform + one normal prefix-code group of literal pixels (plain
    distance codes only; alpha rides a 0-bit single-symbol code).
    Minimal but fully spec-valid — see the section header."""
    import struct

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L: dimensions out of range")
    r = arr[:, :, 0].astype(np.int32)
    g = arr[:, :, 1].astype(np.int32)
    b = arr[:, :, 2].astype(np.int32)
    # subtract green (the forward transform)
    r = (r - g) & 0xFF
    b = (b - g) & 0xFF
    bw = _Vp8lBitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)  # alpha unused
    bw.bits(0, 3)  # version
    bw.bits(1, 1)  # one transform:
    bw.bits(2, 2)  # SUBTRACT_GREEN
    bw.bits(0, 1)  # no more transforms
    bw.bits(0, 1)  # no color cache
    bw.bits(0, 1)  # no meta prefix codes
    gs = g.ravel().tolist()
    rs = r.ravel().tolist()
    bs = b.ravel().tolist()

    def _freqs(vals) -> dict[int, int]:
        f: dict[int, int] = {}
        for v in vals:
            f[v] = f.get(v, 0) + 1
        return f

    green_lengths = _balanced_lengths(_freqs(gs), 256 + 24)
    red_lengths = _balanced_lengths(_freqs(rs), 256)
    blue_lengths = _balanced_lengths(_freqs(bs), 256)
    alpha_lengths = _balanced_lengths({255: 1}, 256)
    dist_lengths = _balanced_lengths({0: 1}, 40)
    for lengths in (
        green_lengths,
        red_lengths,
        blue_lengths,
        alpha_lengths,
        dist_lengths,
    ):
        _vp8l_write_prefix_code(bw, lengths)
    gc = _vp8l_canonical(green_lengths)
    rc = _vp8l_canonical(red_lengths)
    bc = _vp8l_canonical(blue_lengths)
    n_green = len([l for l in green_lengths if l])
    n_red = len([l for l in red_lengths if l])
    n_blue = len([l for l in blue_lengths if l])
    for gv, rv, bv in zip(gs, rs, bs):
        if n_green > 1:
            bw.code(*gc[gv])
        if n_red > 1:
            bw.code(*rc[rv])
        if n_blue > 1:
            bw.code(*bc[bv])
        # alpha: 0-bit code, nothing emitted
    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# =====================================================================
# MP3 (MPEG-1 Audio Layer III) FRAME-HEADER layer — from the public
# ISO/IEC 11172-3 header layout: the ingest-triage surface a training
# pipeline needs (frame walk, bitrate/samplerate tables, frame-length
# arithmetic, duration accounting) implemented for real; full audio
# decode (huffman + IMDCT + polyphase synthesis) stays a documented
# extension point, stated honestly here rather than stubbed silently.
# =====================================================================

MP3_BITRATES_KBPS = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)  # MPEG-1 Layer III bitrate_index 0..14 (0 = free, 15 = invalid)
MP3_SAMPLERATES = (44100, 48000, 32000)  # samplerate_index 0..2
MP3_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def mp3_frame_length(bitrate_kbps: int, samplerate: int, padding: int) -> int:
    """ISO 11172-3: FrameLen = floor(144 * bitrate / samplerate) + pad."""
    return (144 * bitrate_kbps * 1000) // samplerate + padding


def encode_mp3_frames(
    specs: list[tuple[int, int]],
    payload: bytes,
    samplerate_index: int = 0,
) -> bytes:
    """Build a structurally valid MPEG-1 Layer III frame sequence:
    one (bitrate_index, padding) spec per frame, payload bytes drawn
    sequentially from `payload` to fill each frame body. Headers are
    bit-exact per the spec (sync 0x7FF, version 11=MPEG-1, layer
    01=III, no CRC, mono); bodies are opaque bytes (no side info /
    huffman data — valid for header walking, not for audio decode)."""
    out = bytearray()
    pos = 0
    sr = MP3_SAMPLERATES[samplerate_index]
    for bitrate_index, padding in specs:
        if not 1 <= bitrate_index <= 14:
            raise ValueError("MP3: bitrate_index out of range")
        kbps = MP3_BITRATES_KBPS[bitrate_index]
        flen = mp3_frame_length(kbps, sr, padding)
        b0 = 0xFF
        b1 = 0b11111011  # sync(3) + version 11 + layer 01 + no-CRC 1
        b2 = (bitrate_index << 4) | (samplerate_index << 2) | (padding << 1)
        b3 = 0b11000000  # channel mode 11 = mono/single channel
        body = payload[pos : pos + flen - 4]
        if len(body) < flen - 4:
            raise ValueError("MP3: payload underrun")
        pos += flen - 4
        out += bytes([b0, b1, b2, b3]) + body
    return bytes(out)


def decode_mp3_frames(data: bytes) -> list[dict]:
    """Walk an MPEG-1 Layer III frame sequence by header arithmetic
    (no byte scanning: each header's frame length positions the next
    sync, and a broken walk desyncs immediately). Returns one dict per
    frame: bitrate_kbps, samplerate, padding, frame_len."""
    frames = []
    pos = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("MP3: truncated header")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"MP3: lost sync at byte {pos}")
        version = (b1 >> 3) & 3
        layer = (b1 >> 1) & 3
        if version != 3 or layer != 1:
            raise ValueError("MP3: only MPEG-1 Layer III supported")
        bitrate_index = (b2 >> 4) & 0xF
        samplerate_index = (b2 >> 2) & 3
        padding = (b2 >> 1) & 1
        if bitrate_index in (0, 15) or samplerate_index == 3:
            raise ValueError("MP3: invalid bitrate/samplerate index")
        kbps = MP3_BITRATES_KBPS[bitrate_index]
        sr = MP3_SAMPLERATES[samplerate_index]
        flen = mp3_frame_length(kbps, sr, padding)
        if pos + flen > len(data):
            raise ValueError("MP3: frame overruns payload")
        frames.append(
            {
                "bitrate_kbps": kbps,
                "samplerate": sr,
                "padding": padding,
                "frame_len": flen,
            }
        )
        pos += flen
    return frames


# =====================================================================
# H.264 / AVC (ISO/IEC 14496-10) NAL-unit layer — Annex B byte-stream
# walking with REAL emulation-prevention (RBSP unescaping): the
# structure-triage surface for video training data. Slice/macroblock
# decode is the documented extension point.
# =====================================================================


def h264_escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte: any 00 00 followed by
    00/01/02/03 in the raw payload becomes 00 00 03 xx on the wire."""
    out = bytearray()
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def h264_unescape_rbsp(data: bytes) -> bytes:
    """Remove emulation_prevention_three_byte (00 00 03 -> 00 00)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        byte = data[i]
        if zeros >= 2 and byte == 3 and i + 1 < len(data) and data[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
        i += 1
    return bytes(out)


def encode_annexb(nals: list[tuple[int, int, bytes]]) -> bytes:
    """(nal_ref_idc, nal_unit_type, rbsp payload) -> Annex B byte
    stream: 4-byte start code before parameter sets / IDR, 3-byte
    before other NALs (the common packaging), header byte
    forbidden_zero(1) | ref_idc(2) | type(5), payload escaped. Every
    RBSP gets the spec's rbsp_trailing_bits byte (0x80) appended — the
    stop bit is what disambiguates a payload's trailing zero bytes
    from the NEXT NAL's start code (a raw payload ending in 00 00
    would otherwise be swallowed by the start-code scan)."""
    out = bytearray()
    for ref_idc, ntype, rbsp in nals:
        start = (
            b"\x00\x00\x00\x01" if ntype in (5, 7, 8) else b"\x00\x00\x01"
        )
        out += start
        out.append(((ref_idc & 3) << 5) | (ntype & 0x1F))
        out += h264_escape_rbsp(rbsp + b"\x80")
    return bytes(out)


def decode_annexb(data: bytes) -> list[dict]:
    """Walk an Annex B stream: find start codes, split NAL units,
    unescape each RBSP. Returns dicts with ref_idc, nal_type, rbsp."""
    starts = []
    i = 0
    n = len(data)
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 4 <= n and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    if not starts or starts[0][0] != 0:
        raise ValueError("H264: stream must begin with a start code")
    nals = []
    for k, (s, body_start) in enumerate(starts):
        body_end = starts[k + 1][0] if k + 1 < len(starts) else n
        hdr = data[body_start]
        if hdr & 0x80:
            raise ValueError("H264: forbidden_zero_bit set")
        body = data[body_start + 1 : body_end]
        # trailing_zero_8bits belong to the byte stream, not the NAL
        body = body.rstrip(b"\x00")
        rbsp = h264_unescape_rbsp(body)
        if not rbsp or rbsp[-1] != 0x80:
            raise ValueError("H264: missing rbsp_trailing_bits stop byte")
        nals.append(
            {
                "ref_idc": (hdr >> 5) & 3,
                "nal_type": hdr & 0x1F,
                "rbsp": rbsp[:-1],
            }
        )
    return nals
