"""Pure-numpy codecs for media formats (PPM, WAV, PNG, animated GIF).

The container has no PIL/cv2/ffmpeg, but these formats need no codec
library: binary PPM (P6) is a text header + raw RGB raster, RIFF/WAVE
PCM is a fixed 44-byte header + little-endian samples, PNG is
zlib-compressed (stdlib!) scanlines under five byte-level prediction
filters, and GIF is variable-width LZW over palette indices in a
sub-block framed container. These implementations make the m-family's
decode -> resize -> feature path REAL end-to-end — `decode_image`
parses actual image bytes (including COMPRESSED formats) and the
downstream statistics depend on the decoded pixel values — while
codec-heavy formats (JPEG/MP3/H.264) remain the documented
external-codec extension point in operators/multimodal.py.

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

import struct
import zlib

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
# fills (both sides grow when the next free code reaches 1<<width);
# at 4096 entries the encoder emits CLEAR and both sides reset. Codes
# are packed LSB-first into bytes, and the byte stream is framed into
# <=255-byte sub-blocks each preceded by its length, terminated by a
# zero-length block.

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
        if next_code == (1 << width) and width < _GIF_MAX_WIDTH:
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


def _lzw_decode(data: bytes, n_expected: int) -> bytes:
    """GIF-variant LZW: packed code stream -> palette-index bytes."""
    clear = 1 << _GIF_MIN_CODE_SIZE
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = _GIF_MIN_CODE_SIZE + 1
    table: list[bytes] = []
    prev: bytes | None = None
    out = bytearray()

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = _GIF_MIN_CODE_SIZE + 1
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
            # The decoder's table lags the encoder by ONE entry (the
            # entry for a code is only completed when the NEXT code
            # arrives), so the width must grow one entry early:
            # when the encoder switches to width+1 after assigning
            # code (1<<width)-1, the decoder's table holds only
            # (1<<width)-1 entries.
            if len(table) == (1 << width) - 1 and width < _GIF_MAX_WIDTH:
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
        if mcs != _GIF_MIN_CODE_SIZE:
            raise ValueError(f"min code size {mcs} != {_GIF_MIN_CODE_SIZE}")
        lzw = bytearray()
        while _byte(pos) != 0:
            size = data[pos]
            if pos + 1 + size > len(data):
                raise ValueError("truncated GIF")
            lzw.extend(data[pos + 1 : pos + 1 + size])
            pos += 1 + size
        pos += 1
        idx = _lzw_decode(bytes(lzw), fw * fh)
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
