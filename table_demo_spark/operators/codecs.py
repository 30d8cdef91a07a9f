"""Pure-numpy codecs for uncompressed media formats (PPM, WAV).

The container has no PIL/cv2/ffmpeg, but uncompressed formats need no
codec library: binary PPM (P6) is a text header + raw RGB raster, and
RIFF/WAVE PCM is a fixed 44-byte header + little-endian samples. These
implementations make the m-family's decode -> resize -> feature path
REAL end-to-end — `decode_image` parses actual image bytes and the
downstream statistics depend on the decoded pixel values — while
compressed formats (JPEG/PNG/MP3) remain the documented external-codec
extension point in operators/multimodal.py.

Format references (public): the Netpbm P6 format spec (header
``P6\\n<w> <h>\\n<maxval>\\n`` then ``3*w*h`` raw bytes, ``#`` comments
allowed in the header) and the Microsoft RIFF/WAVE container (chunked:
``RIFF<size>WAVE`` then ``fmt `` and ``data`` chunks; PCM16 mono).

Everything is deterministic integer math — nearest-neighbor resize
uses ``src = (dst * src_dim) // dst_dim`` — so a DuckDB oracle can
state the identical arithmetic and the cross-engine hash gate applies
to decoded-pixel results, not just plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

PPM_MAGIC = b"P6"
WAV_MAGIC = b"RIFF"


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
