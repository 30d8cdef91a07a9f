"""HEIF-family encode/decode via the SYSTEM libheif (third-party
ground truth, the strongest adjudication class this project has).

``libheif.so.1`` (1.15.1, probed r13) bundles REAL codecs end to end:

* **AVIF** — encode through the AOMedia reference encoder (libaom
  3.6.0), decode through dav1d 6.6.0 (libheif's priority plugin; a
  fully independent AV1 decoder codebase).  1.15.1's
  ``heif_decoding_options.decoder_id`` field exists (options
  version 4) but is NOT consulted by ``heif_decode_image`` —
  probed r13: a bogus decoder_id decodes fine — so per-decode
  plugin selection is impossible here; the dav1d-vs-libaom
  cross-decoder adjudication goes through libavif's
  ``codecChoice`` instead (``decode_avif_libavif`` below);
* **HEIC** — encode through x265 3.5 (HEVC), decode through libde265
  1.0.11 (independent codebases on the two sides of the roundtrip).

This closes the r12 VERDICT "missing" item #4 (AVIF/HEIC decode was
declared out of scope "until a codec library lands in the container"
— it has landed; ``operators/multimodal.py`` routes here now).

Lossless discipline: both encoder plugins honour the ``lossless``
boolean parameter, but libheif's shared colour pipeline clips YCbCr
triples that fall outside the RGB gamut (measured r13: identical
mean-abs-diff 13.75 through x265 AND aom on full-range random planes
— codec-independent, therefore the shared conversion, not the
codecs).  Fixture planes are therefore constrained to the box
Y in [70, 180], Cb/Cr in [108, 148]: every point of the box maps
strictly inside the RGB cube, and the box is convex, so any chroma
upsampling interpolation stays in gamut too.  Within the box the
roundtrip is BIT-EXACT for both codecs at multiple (odd-grid
included) sizes — verified empirically and re-pinned in tests.

All entry points raise loudly on any libheif error (no silent
fallbacks); ``HAVE_LIBHEIF`` gates tests on other machines.
"""

from __future__ import annotations

import ctypes
import os
import tempfile

# -- enums (libheif/heif.h) -------------------------------------------------
COLORSPACE_YCBCR = 0
CHROMA_420 = 1
CHANNEL_Y, CHANNEL_CB, CHANNEL_CR = 0, 1, 2
COMPRESSION_HEVC = 1
COMPRESSION_AV1 = 4


class HeifError(ctypes.Structure):
    """struct heif_error — returned BY VALUE by most libheif calls."""

    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


class DecodingOptions(ctypes.Structure):
    """struct heif_decoding_options, version 4 (libheif 1.15.1 —
    the live alloc's version byte reads 4; colour-conversion options
    arrived with version 5 in later releases).  Only used to pass
    strict decoding defaults; ``decoder_id`` is mirrored for layout
    fidelity but 1.15.1 ignores it (see module docstring)."""

    _fields_ = [
        ("version", ctypes.c_uint8),
        ("ignore_transformations", ctypes.c_uint8),
        ("start_progress", ctypes.c_void_p),
        ("on_progress", ctypes.c_void_p),
        ("end_progress", ctypes.c_void_p),
        ("progress_user_data", ctypes.c_void_p),
        ("convert_hdr_to_8bit", ctypes.c_uint8),
        ("strict_decoding", ctypes.c_uint8),
        ("decoder_id", ctypes.c_char_p),
    ]


_lib = None


def _heif():
    """Load + type the libheif surface once per process."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        h = ctypes.CDLL("libheif.so.1")
    except OSError as exc:  # pragma: no cover - lib ships in-container
        raise ImportError("libheif.so.1 not available") from exc
    P = ctypes.POINTER
    sigs = {
        "heif_get_version": (ctypes.c_char_p, []),
        "heif_context_alloc": (ctypes.c_void_p, []),
        "heif_context_free": (None, [ctypes.c_void_p]),
        "heif_image_create": (
            HeifError,
            [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
             P(ctypes.c_void_p)],
        ),
        "heif_image_add_plane": (
            HeifError,
            [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
             ctypes.c_int],
        ),
        "heif_image_get_plane": (
            P(ctypes.c_uint8),
            [ctypes.c_void_p, ctypes.c_int, P(ctypes.c_int)],
        ),
        "heif_image_get_plane_readonly": (
            P(ctypes.c_uint8),
            [ctypes.c_void_p, ctypes.c_int, P(ctypes.c_int)],
        ),
        "heif_context_get_encoder_for_format": (
            HeifError, [ctypes.c_void_p, ctypes.c_int, P(ctypes.c_void_p)],
        ),
        "heif_encoder_set_parameter": (
            HeifError, [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p],
        ),
        "heif_encoder_set_parameter_boolean": (
            HeifError, [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int],
        ),
        "heif_encoder_release": (None, [ctypes.c_void_p]),
        "heif_context_encode_image": (
            HeifError,
            [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
             ctypes.c_void_p, P(ctypes.c_void_p)],
        ),
        "heif_context_write_to_file": (
            HeifError, [ctypes.c_void_p, ctypes.c_char_p],
        ),
        "heif_context_read_from_memory_without_copy": (
            HeifError,
            [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
             ctypes.c_void_p],
        ),
        "heif_context_get_primary_image_handle": (
            HeifError, [ctypes.c_void_p, P(ctypes.c_void_p)],
        ),
        "heif_image_handle_get_width": (ctypes.c_int, [ctypes.c_void_p]),
        "heif_image_handle_get_height": (ctypes.c_int, [ctypes.c_void_p]),
        "heif_decode_image": (
            HeifError,
            [ctypes.c_void_p, P(ctypes.c_void_p), ctypes.c_int,
             ctypes.c_int, ctypes.c_void_p],
        ),
        "heif_decoding_options_alloc": (P(DecodingOptions), []),
        "heif_decoding_options_free": (None, [P(DecodingOptions)]),
        "heif_image_release": (None, [ctypes.c_void_p]),
        "heif_image_handle_release": (None, [ctypes.c_void_p]),
    }
    for name, (restype, argtypes) in sigs.items():
        f = getattr(h, name)
        f.restype = restype
        f.argtypes = argtypes
    _lib = h
    return h


def have_libheif() -> bool:
    try:
        _heif()
        return True
    except ImportError:
        return False


def _ck(err: HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"").decode("utf-8", "replace")
        raise ValueError(
            f"libheif {what} failed: code={err.code} "
            f"subcode={err.subcode} {msg}"
        )


def _fill_plane(h, img, channel, arr) -> None:
    stride = ctypes.c_int()
    p = h.heif_image_get_plane(img, channel, ctypes.byref(stride))
    if not p:
        raise ValueError("libheif get_plane returned NULL")
    rows, cols = arr.shape
    base = ctypes.addressof(p.contents)
    for r in range(rows):
        ctypes.memmove(base + r * stride.value, arr[r].tobytes(), cols)


def _read_plane(h, img, channel, rows, cols):
    import numpy as np

    stride = ctypes.c_int()
    p = h.heif_image_get_plane_readonly(img, channel, ctypes.byref(stride))
    if not p:
        raise ValueError("libheif get_plane_readonly returned NULL")
    buf = ctypes.string_at(p, stride.value * rows)
    return (
        np.frombuffer(buf, np.uint8)
        .reshape(rows, stride.value)[:, :cols]
        .copy()
    )


def encode_heif(
    y, cb, cr, compression: int, params: tuple[tuple[str, str], ...] = (),
    lossless: bool = True,
) -> bytes:
    """Encode 8-bit YCbCr 4:2:0 planes to a HEIF container (HEIC for
    COMPRESSION_HEVC via x265, AVIF for COMPRESSION_AV1 via libaom).
    ``params`` are encoder-plugin string parameters (e.g. x265
    ``("preset", "ultrafast")``, aom ``("speed", "9")``) applied
    BEFORE the lossless flag — x265 presets reset earlier options.
    libheif 1.15 writes through its file API only (the in-memory
    writer needs a by-value-struct callback), so the container goes
    through a private temp file; at Spark scale this is a per-task
    tmpfs write, microseconds against the encode itself."""
    ph, pw = y.shape
    ch, cw = cb.shape
    if cr.shape != (ch, cw) or ch != (ph + 1) // 2 or cw != (pw + 1) // 2:
        raise ValueError("planes must be 4:2:0 (chroma = ceil(luma/2))")
    h = _heif()
    ctx = h.heif_context_alloc()
    img = ctypes.c_void_p()
    enc = ctypes.c_void_p()
    try:
        _ck(
            h.heif_image_create(
                pw, ph, COLORSPACE_YCBCR, CHROMA_420, ctypes.byref(img)
            ),
            "image_create",
        )
        for chn, arr in (
            (CHANNEL_Y, y), (CHANNEL_CB, cb), (CHANNEL_CR, cr),
        ):
            _ck(
                h.heif_image_add_plane(
                    img, chn, arr.shape[1], arr.shape[0], 8
                ),
                "add_plane",
            )
            _fill_plane(h, img, chn, arr)
        _ck(
            h.heif_context_get_encoder_for_format(
                ctx, compression, ctypes.byref(enc)
            ),
            "get_encoder",
        )
        for k, v in params:
            _ck(
                h.heif_encoder_set_parameter(enc, k.encode(), v.encode()),
                f"set_parameter {k}",
            )
        if lossless:
            _ck(
                h.heif_encoder_set_parameter_boolean(enc, b"lossless", 1),
                "set lossless",
            )
        handle = ctypes.c_void_p()
        _ck(
            h.heif_context_encode_image(
                ctx, img, enc, None, ctypes.byref(handle)
            ),
            "encode_image",
        )
        if handle:
            h.heif_image_handle_release(handle)
        fd, path = tempfile.mkstemp(suffix=".heif")
        try:
            os.close(fd)
            _ck(h.heif_context_write_to_file(ctx, path.encode()), "write")
            with open(path, "rb") as fh:
                return fh.read()
        finally:
            os.unlink(path)
    finally:
        if enc:
            h.heif_encoder_release(enc)
        if img:
            h.heif_image_release(img)
        h.heif_context_free(ctx)


def decode_heif(data: bytes):
    """Decode a HEIF container's primary image to 8-bit YCbCr 4:2:0
    numpy planes ``(y, cb, cr)``: AVIF-brand containers through
    libavif + dav1d (single-threaded), everything else through
    libheif's priority plugin (libde265 for HEIC).  Raises ValueError
    on any container/codec error (truncation, bad payloads —
    negative-tested).

    Why the AVIF split (r16, guide §4.5): libheif 1.15.1's dav1d
    plugin creates a fresh ncpu-sized dav1d thread pool PER DECODE
    and exposes no thread knob (decoder_id is dead — r13 probe).
    Measured: +32 threads spawned per decode, 8–19 ms/decode vs
    0.6 ms through libavif's default maxThreads=1 — and under 32
    concurrent Spark workers the ~1000-thread churn was m47/q43's
    5–7x run-to-run variance and inverse core scaling.  Same dav1d
    codebase on both routes; decode output proven bit-identical
    (tests/test_operators.py pins it), so the adjudication is
    unchanged."""
    if len(data) >= 12 and data[4:8] == b"ftyp" and data[8:12] == b"avif":
        try:
            return decode_avif_libavif(data, AVIF_CODEC_DAV1D)
        except ImportError:  # pragma: no cover - libavif ships in-container
            pass  # fall back to the libheif plugin path below
    return _decode_heif_libheif(data)


def _decode_heif_libheif(data: bytes):
    """The libheif-plugin decode path (dav1d for AVIF, libde265 for
    HEIC) — the pre-r16 :func:`decode_heif` body, kept as the HEIC
    route, the no-libavif fallback, and the A/B reference for the
    libavif fast path's bit-equality pin."""
    h = _heif()
    ctx = h.heif_context_alloc()
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    try:
        _ck(
            h.heif_context_read_from_memory_without_copy(
                ctx, buf, len(data), None
            ),
            "read_from_memory",
        )
        _ck(
            h.heif_context_get_primary_image_handle(
                ctx, ctypes.byref(handle)
            ),
            "get_primary_image_handle",
        )
        pw = h.heif_image_handle_get_width(handle)
        ph = h.heif_image_handle_get_height(handle)
        _ck(
            h.heif_decode_image(
                handle, ctypes.byref(img), COLORSPACE_YCBCR,
                CHROMA_420, None,
            ),
            "decode_image",
        )
        ch, cw = (ph + 1) // 2, (pw + 1) // 2
        return (
            _read_plane(h, img, CHANNEL_Y, ph, pw),
            _read_plane(h, img, CHANNEL_CB, ch, cw),
            _read_plane(h, img, CHANNEL_CR, ch, cw),
        )
    finally:
        if img:
            h.heif_image_release(img)
        if handle:
            h.heif_image_handle_release(handle)
        h.heif_context_free(ctx)


def decode_heif_rgb(data: bytes):
    """Decode a HEIF container's primary image to an interleaved
    (h, w, 3) RGB array using libheif's OWN colour conversion
    (colorspace RGB / chroma interleaved 24-bit) — the third-party
    CSC, not a hand-rolled matrix."""
    import numpy as np

    COLORSPACE_RGB, CHROMA_INTERLEAVED_RGB, CHANNEL_INTERLEAVED = 1, 10, 10
    h = _heif()
    ctx = h.heif_context_alloc()
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    try:
        _ck(
            h.heif_context_read_from_memory_without_copy(
                ctx, buf, len(data), None
            ),
            "read_from_memory",
        )
        _ck(
            h.heif_context_get_primary_image_handle(
                ctx, ctypes.byref(handle)
            ),
            "get_primary_image_handle",
        )
        pw = h.heif_image_handle_get_width(handle)
        ph = h.heif_image_handle_get_height(handle)
        _ck(
            h.heif_decode_image(
                handle, ctypes.byref(img), COLORSPACE_RGB,
                CHROMA_INTERLEAVED_RGB, None,
            ),
            "decode_image",
        )
        stride = ctypes.c_int()
        p = h.heif_image_get_plane_readonly(
            img, CHANNEL_INTERLEAVED, ctypes.byref(stride)
        )
        if not p:
            raise ValueError("libheif interleaved plane is NULL")
        raw = ctypes.string_at(p, stride.value * ph)
        return (
            np.frombuffer(raw, np.uint8)
            .reshape(ph, stride.value)[:, : 3 * pw]
            .reshape(ph, pw, 3)
            .copy()
        )
    finally:
        if img:
            h.heif_image_release(img)
        if handle:
            h.heif_image_handle_release(handle)
        h.heif_context_free(ctx)


# -- libavif cross-decoder path ----------------------------------------------
# libheif 1.15.1 cannot select its AV1 decoder plugin per decode (see
# module docstring), so the dav1d-vs-libaom adjudication uses
# libavif.so.15 (0.11 ABI), whose avifDecoder exposes codecChoice.
# Only two struct layouts are touched, both self-validated at runtime:
# codecChoice is avifDecoder's FIRST field (int at offset 0), and the
# avifImage head (width/height/depth/yuvFormat/planes/rowBytes) is
# checked field-by-field after every decode — depth must read 8,
# yuvFormat must read 4:2:0, rowBytes must cover the width — so an
# ABI drift fails loudly instead of returning garbage planes.

AVIF_CODEC_AUTO, AVIF_CODEC_AOM, AVIF_CODEC_DAV1D, AVIF_CODEC_LIBGAV1 = (
    0, 1, 2, 3,
)
_AVIF_PIXEL_FORMAT_YUV420 = 3
_AVIF_CODEC_FLAG_CAN_DECODE = 1


class _AvifImageHead(ctypes.Structure):
    """Leading fields of struct avifImage (libavif 0.11)."""

    _fields_ = [
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("depth", ctypes.c_uint32),
        ("yuvFormat", ctypes.c_int),
        ("yuvRange", ctypes.c_int),
        ("yuvChromaSamplePosition", ctypes.c_int),
        ("yuvPlanes", ctypes.c_void_p * 3),
        ("yuvRowBytes", ctypes.c_uint32 * 3),
        ("imageOwnsYUVPlanes", ctypes.c_int),
    ]


_avif_lib = None


def _avif():
    global _avif_lib
    if _avif_lib is not None:
        return _avif_lib
    try:
        a = ctypes.CDLL("libavif.so.15")
    except OSError as exc:  # pragma: no cover - lib ships in-container
        raise ImportError("libavif.so.15 not available") from exc
    a.avifDecoderCreate.restype = ctypes.c_void_p
    a.avifDecoderCreate.argtypes = []
    a.avifDecoderDestroy.restype = None
    a.avifDecoderDestroy.argtypes = [ctypes.c_void_p]
    a.avifImageCreateEmpty.restype = ctypes.c_void_p
    a.avifImageCreateEmpty.argtypes = []
    a.avifImageDestroy.restype = None
    a.avifImageDestroy.argtypes = [ctypes.c_void_p]
    a.avifDecoderReadMemory.restype = ctypes.c_int
    a.avifDecoderReadMemory.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
    ]
    a.avifResultToString.restype = ctypes.c_char_p
    a.avifResultToString.argtypes = [ctypes.c_int]
    a.avifCodecName.restype = ctypes.c_char_p
    a.avifCodecName.argtypes = [ctypes.c_int, ctypes.c_uint32]
    _avif_lib = a
    return a


def avif_decoder_available(codec_choice: int) -> bool:
    """True iff libavif was built with that codec's DECODE support."""
    name = _avif().avifCodecName(codec_choice, _AVIF_CODEC_FLAG_CAN_DECODE)
    return name is not None


def decode_avif_libavif(data: bytes, codec_choice: int):
    """Decode an AVIF through libavif with an EXPLICIT AV1 decoder
    (AVIF_CODEC_AOM / AVIF_CODEC_DAV1D / AVIF_CODEC_LIBGAV1) — the
    cross-decoder adjudication path; returns (y, cb, cr) planes.
    codecChoice is poked at avifDecoder offset 0 (its first field);
    that the choice is honoured is itself pinned in tests by asking
    for a codec libavif lacks and requiring a loud failure."""
    import numpy as np

    a = _avif()
    dec = a.avifDecoderCreate()
    img = a.avifImageCreateEmpty()
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    try:
        ctypes.memmove(dec, ctypes.byref(ctypes.c_int(codec_choice)), 4)
        res = a.avifDecoderReadMemory(dec, img, buf, len(data))
        if res != 0:
            msg = (a.avifResultToString(res) or b"?").decode()
            raise ValueError(f"libavif decode failed: {res} ({msg})")
        head = _AvifImageHead.from_address(img)
        if (
            not (0 < head.width < 65536 and 0 < head.height < 65536)
            or head.depth != 8
            or head.yuvFormat != _AVIF_PIXEL_FORMAT_YUV420
            or head.yuvRowBytes[0] < head.width
            or not head.yuvPlanes[0]
        ):
            raise ValueError(
                "avifImage ABI validation failed: "
                f"w={head.width} h={head.height} depth={head.depth} "
                f"fmt={head.yuvFormat} rb0={head.yuvRowBytes[0]}"
            )
        ph, pw = head.height, head.width
        ch, cw = (ph + 1) // 2, (pw + 1) // 2
        out = []
        for i, (rows, cols) in enumerate(((ph, pw), (ch, cw), (ch, cw))):
            rb = head.yuvRowBytes[i]
            raw = ctypes.string_at(head.yuvPlanes[i], rb * rows)
            out.append(
                np.frombuffer(raw, np.uint8)
                .reshape(rows, rb)[:, :cols]
                .copy()
            )
        return tuple(out)
    finally:
        a.avifImageDestroy(img)
        a.avifDecoderDestroy(dec)


# -- AVIF image SEQUENCES (avis brand) via avifEncoder/avifDecoder -----------
#
# llm_m52: multi-frame AVIF gives the OBU layer a NON-reduced sequence
# header (reduced_still_picture_header = 0) and real inter frames —
# the r13 verdict's "one level deeper" ask that still images cannot
# produce.  libavif 0.11.1's encoder/decoder structs are touched at a
# handful of offsets, each guarded by a DEFAULTS FINGERPRINT read at
# create time (the r13 codecChoice-at-offset-0 discipline, extended):
# an ABI drift changes the defaults we read back and fails loudly
# before any pointer is trusted.
#
# avifEncoder head (0.11.1 avif.h order): codecChoice(int),
# maxThreads(int), speed(int), keyframeInterval(int), timescale(u64).
# avifEncoderCreate defaults: [0, 1, -1 (AVIF_SPEED_DEFAULT), 0], 1.
# Default min/maxQuantizer are 0/0 = LOSSLESS, verified per doc by the
# roundtrip itself (every frame compared bit-for-bit to its source).
#
# avifDecoder config head: codecChoice(int), maxThreads(int),
# requestedSource(int), allowProgressive, allowIncremental,
# ignoreExif, ignoreXMP (avifBool each), imageSizeLimit(u32)=1<<28,
# imageDimensionLimit(u32)=32768, imageCountLimit(u32)=2592000,
# strictFlags(u32)=7; then (8-aligned) avifImage *image @48,
# imageIndex @56, imageCount @60.  The four limit/flag defaults are
# the fingerprint; the decoded avifImage head is additionally
# validated field-by-field like decode_avif_libavif does.

_AVIF_DEC_IMAGE_OFF = 48
_AVIF_DEC_INDEX_OFF = 56
_AVIF_DEC_COUNT_OFF = 60


class _AvifRWData(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p), ("size", ctypes.c_size_t)]


def _avif_seq():
    """Extend the _avif() surface with the sequence entry points."""
    a = _avif()
    if getattr(a, "_seq_typed", False):
        return a
    a.avifEncoderCreate.restype = ctypes.c_void_p
    a.avifEncoderCreate.argtypes = []
    a.avifEncoderDestroy.restype = None
    a.avifEncoderDestroy.argtypes = [ctypes.c_void_p]
    a.avifEncoderAddImage.restype = ctypes.c_int
    a.avifEncoderAddImage.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32,
    ]
    a.avifEncoderFinish.restype = ctypes.c_int
    a.avifEncoderFinish.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    a.avifImageCreate.restype = ctypes.c_void_p
    a.avifImageCreate.argtypes = [
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,
    ]
    a.avifImageAllocatePlanes.restype = ctypes.c_int
    a.avifImageAllocatePlanes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    a.avifRWDataFree.restype = None
    a.avifRWDataFree.argtypes = [ctypes.c_void_p]
    a.avifDecoderSetIOMemory.restype = ctypes.c_int
    a.avifDecoderSetIOMemory.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
    ]
    a.avifDecoderParse.restype = ctypes.c_int
    a.avifDecoderParse.argtypes = [ctypes.c_void_p]
    a.avifDecoderNextImage.restype = ctypes.c_int
    a.avifDecoderNextImage.argtypes = [ctypes.c_void_p]
    a._seq_typed = True
    return a


def _check_encoder_abi(enc) -> None:
    head = (ctypes.c_int * 4).from_address(enc)
    ts = ctypes.c_uint64.from_address(enc + 16).value
    if list(head) != [0, 1, -1, 0] or ts != 1:
        raise ValueError(
            "avifEncoder ABI fingerprint mismatch: "
            f"{list(head)} timescale={ts} (expected [0,1,-1,0] / 1)"
        )


def _check_decoder_abi(dec) -> None:
    limits = (ctypes.c_uint32 * 4).from_address(dec + 28)
    if list(limits) != [1 << 28, 32768, 2592000, 7]:
        raise ValueError(
            "avifDecoder ABI fingerprint mismatch: "
            f"{list(limits)} (expected [2^28, 32768, 2592000, 7])"
        )


def encode_avif_sequence(frames, speed: int = 9) -> bytes:
    """Encode YUV 4:2:0 frames [(y, cb, cr), ...] as a multi-frame
    AVIF image sequence (avis brand) through the REAL AOMedia
    reference encoder.  Planes are passed DIRECTLY as YUV — no RGB
    colour pipeline sits in the path (unlike libheif stills), so
    full-range noise roundtrips losslessly: libavif 0.11.1's default
    min/maxQuantizer are 0/0, AV1 lossless mode, and inter frames
    stay bit-exact too.  maxThreads is pinned to 1 (the r13 encoder
    thread-pool discipline)."""
    a = _avif_seq()
    enc = a.avifEncoderCreate()
    if not enc:
        raise MemoryError("avifEncoderCreate failed")
    imgs = []
    try:
        _check_encoder_abi(enc)
        head = (ctypes.c_int * 4).from_address(enc)
        head[1] = 1       # maxThreads
        head[2] = speed   # speed (encode time only; lossless pixels)
        for y, cb, cr in frames:
            h, w = y.shape
            if cb.shape != ((h + 1) // 2, (w + 1) // 2) or cb.shape != cr.shape:
                raise ValueError("bad 4:2:0 plane shapes")
            img = a.avifImageCreate(w, h, 8, _AVIF_PIXEL_FORMAT_YUV420)
            if not img:
                raise MemoryError("avifImageCreate failed")
            imgs.append(img)
            if a.avifImageAllocatePlanes(img, 1) != 0:  # AVIF_PLANES_YUV
                raise MemoryError("avifImageAllocatePlanes failed")
            ih = _AvifImageHead.from_address(img)
            if ih.width != w or ih.height != h or ih.depth != 8:
                raise ValueError("avifImage ABI validation failed")
            for i, pl in enumerate((y, cb, cr)):
                rb = ih.yuvRowBytes[i]
                if rb < pl.shape[1] or not ih.yuvPlanes[i]:
                    raise ValueError("avifImage plane validation failed")
                buf = pl.tobytes()
                for r in range(pl.shape[0]):
                    ctypes.memmove(
                        ih.yuvPlanes[i] + r * rb,
                        buf[r * pl.shape[1]:(r + 1) * pl.shape[1]],
                        pl.shape[1],
                    )
            res = a.avifEncoderAddImage(enc, img, 1, 0)
            if res != 0:
                msg = (a.avifResultToString(res) or b"?").decode()
                raise ValueError(f"avifEncoderAddImage failed: {msg}")
        out = _AvifRWData()
        res = a.avifEncoderFinish(enc, ctypes.byref(out))
        if res != 0:
            msg = (a.avifResultToString(res) or b"?").decode()
            raise ValueError(f"avifEncoderFinish failed: {msg}")
        try:
            return ctypes.string_at(out.data, out.size)
        finally:
            a.avifRWDataFree(ctypes.byref(out))
    finally:
        for img in imgs:
            a.avifImageDestroy(img)
        a.avifEncoderDestroy(enc)


def decode_avif_sequence(data: bytes, codec_choice: int):
    """Decode EVERY frame of an AVIF (still or sequence) with an
    explicit AV1 decoder (AVIF_CODEC_DAV1D / AVIF_CODEC_LIBGAV1 /
    AVIF_CODEC_AOM) — returns [(y, cb, cr), ...].  The per-frame
    planes come from decoder->image (offset pinned + fingerprint-
    guarded above); the avifImage head is validated before any plane
    read, and the frame count is additionally cross-checked against
    decoder->imageCount."""
    import numpy as np

    a = _avif_seq()
    dec = a.avifDecoderCreate()
    if not dec:
        raise MemoryError("avifDecoderCreate failed")
    buf = ctypes.create_string_buffer(bytes(data), len(data))
    try:
        _check_decoder_abi(dec)
        ctypes.memmove(dec, ctypes.byref(ctypes.c_int(codec_choice)), 4)
        if a.avifDecoderSetIOMemory(dec, buf, len(data)) != 0:
            raise ValueError("avifDecoderSetIOMemory failed")
        res = a.avifDecoderParse(dec)
        if res != 0:
            msg = (a.avifResultToString(res) or b"?").decode()
            raise ValueError(f"avifDecoderParse failed: {msg}")
        n_declared = ctypes.c_int.from_address(
            dec + _AVIF_DEC_COUNT_OFF
        ).value
        if not 1 <= n_declared <= 65536:
            raise ValueError(f"implausible imageCount {n_declared}")
        frames = []
        while True:
            res = a.avifDecoderNextImage(dec)
            if res != 0:
                msg = (a.avifResultToString(res) or b"?").decode()
                # End-of-stream is detected by the library's own
                # result string, not the bare enum value (r14 ADVICE:
                # AVIF_RESULT_NO_IMAGES_REMAINING is 16 in 0.11.1, but
                # enum renumbering across versions would otherwise
                # misclassify a real error as end-of-stream or vice
                # versa).  Probed in-container: avifResultToString(16)
                # == "No images remaining"; upstream later reworded it
                # to "No content after the images" — accept both.
                low = msg.lower()
                if "no images remaining" in low or "no content after" in low:
                    break
                raise ValueError(f"avifDecoderNextImage failed: {msg}")
            ptr = ctypes.c_void_p.from_address(
                dec + _AVIF_DEC_IMAGE_OFF
            ).value
            if not ptr:
                raise ValueError("decoder->image is NULL after decode")
            head = _AvifImageHead.from_address(ptr)
            if (
                not (0 < head.width < 65536 and 0 < head.height < 65536)
                or head.depth != 8
                or head.yuvFormat != _AVIF_PIXEL_FORMAT_YUV420
                or head.yuvRowBytes[0] < head.width
                or not head.yuvPlanes[0]
            ):
                raise ValueError("avifImage ABI validation failed")
            ph, pw = head.height, head.width
            ch, cw = (ph + 1) // 2, (pw + 1) // 2
            planes = []
            for i, (rows, cols) in enumerate(
                ((ph, pw), (ch, cw), (ch, cw))
            ):
                rb = head.yuvRowBytes[i]
                raw = ctypes.string_at(head.yuvPlanes[i], rb * rows)
                planes.append(
                    np.frombuffer(raw, np.uint8)
                    .reshape(rows, rb)[:, :cols]
                    .copy()
                )
            frames.append(tuple(planes))
        if len(frames) != n_declared:
            raise ValueError(
                f"decoded {len(frames)} frames, imageCount {n_declared}"
            )
        return frames
    finally:
        a.avifDecoderDestroy(dec)


# -- fixed-quantizer AVIF stills (m54) ---------------------------------------
#
# The 0.11.1 encoder head continues past the documented 4 ints +
# timescale with minQuantizer/maxQuantizer at int offsets 6/7 —
# established EMPIRICALLY, not by header recall: their defaults are
# 0/0 (the observed lossless default), poking 6 alone to 40 makes
# avifEncoderAddImage fail with INVALID_ARGUMENT (min > max), poking
# 7 alone shrinks the bitstream (range [0, 40]), and poking both to q
# yields a fixed-quantizer encode whose frame header carries
# base_q_idx == AVIF_QINDEX[q] for every q in 0..63 (the libaom
# quantizer->qindex map, re-measured exhaustively in
# tests/test_avif_sequence.py).

AVIF_QINDEX = tuple(4 * q for q in range(62)) + (249, 255)


def encode_avif_still_q(y, cb, cr, q: int, speed: int = 9) -> bytes:
    """Encode one YUV 4:2:0 frame as a still AVIF at a FIXED libaom
    quantizer (min == max == q; q = 0 is lossless): the m54 fixture —
    real lossy streams whose frame-header base_q_idx is predictable
    from the drawn q via AVIF_QINDEX."""
    if not 0 <= q <= 63:
        raise ValueError("quantizer out of range")
    a = _avif_seq()
    enc = a.avifEncoderCreate()
    if not enc:
        raise MemoryError("avifEncoderCreate failed")
    img = None
    try:
        _check_encoder_abi(enc)
        head = (ctypes.c_int * 8).from_address(enc)
        head[1] = 1       # maxThreads
        head[2] = speed
        head[6] = q       # minQuantizer
        head[7] = q       # maxQuantizer
        h, w = y.shape
        if cb.shape != ((h + 1) // 2, (w + 1) // 2) or cb.shape != cr.shape:
            raise ValueError("bad 4:2:0 plane shapes")
        img = a.avifImageCreate(w, h, 8, _AVIF_PIXEL_FORMAT_YUV420)
        if not img:
            raise MemoryError("avifImageCreate failed")
        if a.avifImageAllocatePlanes(img, 1) != 0:
            raise MemoryError("avifImageAllocatePlanes failed")
        ih = _AvifImageHead.from_address(img)
        for i, pl in enumerate((y, cb, cr)):
            rb = ih.yuvRowBytes[i]
            if rb < pl.shape[1] or not ih.yuvPlanes[i]:
                raise ValueError("avifImage plane validation failed")
            buf = pl.tobytes()
            for r in range(pl.shape[0]):
                ctypes.memmove(
                    ih.yuvPlanes[i] + r * rb,
                    buf[r * pl.shape[1]:(r + 1) * pl.shape[1]],
                    pl.shape[1],
                )
        res = a.avifEncoderAddImage(enc, img, 1, 2)  # ..FLAG_SINGLE
        if res != 0:
            msg = (a.avifResultToString(res) or b"?").decode()
            raise ValueError(f"avifEncoderAddImage failed: {msg}")
        out = _AvifRWData()
        res = a.avifEncoderFinish(enc, ctypes.byref(out))
        if res != 0:
            msg = (a.avifResultToString(res) or b"?").decode()
            raise ValueError(f"avifEncoderFinish failed: {msg}")
        try:
            return ctypes.string_at(out.data, out.size)
        finally:
            a.avifRWDataFree(ctypes.byref(out))
    finally:
        if img:
            a.avifImageDestroy(img)
        a.avifEncoderDestroy(enc)
