"""Lossy-WebP (VP8, RFC 6386) codec tests.

Third-party interop is adjudicated by the SYSTEM libwebp via ctypes
(libwebp.so.7 ships in this container): the decoder must be BIT-EXACT
at the YUV plane level against libwebp on (a) the real lossy fixture
tests/fixtures/python.webp, (b) libwebp-ENCODED streams of synthetic
images (which exercise segmentation, B_PRED modes, skip, and the
normal loop filter), and (c) this repo's own encoder's streams
(both loop filters, skip flags). Where libwebp is unavailable the
fixture decode falls back to a golden-hash pin."""

from __future__ import annotations

import ctypes
import hashlib
import os

import numpy as np
import pytest

from table_demo_spark.operators import codecs as C

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "python.webp")


def _libwebp():
    try:
        return ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None


class _Yuva(ctypes.Structure):
    _fields_ = [
        ("y", ctypes.POINTER(ctypes.c_uint8)),
        ("u", ctypes.POINTER(ctypes.c_uint8)),
        ("v", ctypes.POINTER(ctypes.c_uint8)),
        ("a", ctypes.POINTER(ctypes.c_uint8)),
        ("y_stride", ctypes.c_int),
        ("u_stride", ctypes.c_int),
        ("v_stride", ctypes.c_int),
        ("a_stride", ctypes.c_int),
        ("y_size", ctypes.c_size_t),
        ("u_size", ctypes.c_size_t),
        ("v_size", ctypes.c_size_t),
        ("a_size", ctypes.c_size_t),
    ]


class _Rgba(ctypes.Structure):
    _fields_ = [
        ("rgba", ctypes.POINTER(ctypes.c_uint8)),
        ("stride", ctypes.c_int),
        ("size", ctypes.c_size_t),
    ]


class _BufU(ctypes.Union):
    _fields_ = [("RGBA", _Rgba), ("YUVA", _Yuva)]


class _DecBuffer(ctypes.Structure):
    _fields_ = [
        ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("is_external_memory", ctypes.c_int),
        ("u", _BufU),
        ("pad", ctypes.c_uint32 * 4),
        ("private_memory", ctypes.c_void_p),
    ]


class _Features(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("has_alpha", ctypes.c_int),
        ("has_animation", ctypes.c_int),
        ("format", ctypes.c_int),
        ("pad", ctypes.c_uint32 * 5),
    ]


class _Options(ctypes.Structure):
    _fields_ = [
        ("bypass_filtering", ctypes.c_int),
        ("no_fancy_upsampling", ctypes.c_int),
        ("use_cropping", ctypes.c_int),
        ("crop_left", ctypes.c_int),
        ("crop_top", ctypes.c_int),
        ("crop_width", ctypes.c_int),
        ("crop_height", ctypes.c_int),
        ("use_scaling", ctypes.c_int),
        ("scaled_width", ctypes.c_int),
        ("scaled_height", ctypes.c_int),
        ("use_threads", ctypes.c_int),
        ("dithering_strength", ctypes.c_int),
        ("flip", ctypes.c_int),
        ("alpha_dithering_strength", ctypes.c_int),
        ("pad", ctypes.c_uint32 * 5),
    ]


class _Config(ctypes.Structure):
    # decode.h field order: input, output, options
    _fields_ = [
        ("input", _Features),
        ("output", _DecBuffer),
        ("options", _Options),
    ]


def _libwebp_yuv(lib, data: bytes, bypass_filtering: int = 0):
    lib.WebPDecode.restype = ctypes.c_int
    lib.WebPDecode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_Config)
    ]
    lib.WebPFreeDecBuffer.argtypes = [ctypes.POINTER(_DecBuffer)]
    cfg = _Config()
    ctypes.memset(ctypes.byref(cfg), 0, ctypes.sizeof(cfg))
    cfg.options.bypass_filtering = bypass_filtering
    cfg.output.colorspace = 11  # MODE_YUV
    status = lib.WebPDecode(data, len(data), ctypes.byref(cfg))
    assert status == 0, f"libwebp VP8StatusCode {status}"
    b = cfg.output
    w, h = b.width, b.height
    ch, cw = (h + 1) // 2, (w + 1) // 2
    yb = b.u.YUVA
    y = np.ctypeslib.as_array(yb.y, shape=(h, yb.y_stride))[:, :w].copy()
    u = np.ctypeslib.as_array(yb.u, shape=(ch, yb.u_stride))[:, :cw].copy()
    v = np.ctypeslib.as_array(yb.v, shape=(ch, yb.v_stride))[:, :cw].copy()
    lib.WebPFreeDecBuffer(ctypes.byref(b))
    return y, u, v


def _libwebp_encode(lib, rgb: np.ndarray, quality: float) -> bytes:
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb.tobytes(), w, h, w * 3, quality, ctypes.byref(out))
    assert n > 0
    data = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    lib.WebPFree(out)
    return data


def test_vp8_fixture_decode_golden():
    """The real third-party lossy fixture decodes to pinned planes
    (hashes equal libwebp's bit-exact output, asserted directly in
    test_vp8_fixture_matches_libwebp when the library is present)."""
    y, u, v = C.decode_webp_lossy(open(FIXTURE, "rb").read())
    assert y.shape == (16, 16)
    assert hashlib.md5(y.tobytes()).hexdigest() == (
        "dfe4982372c6c01faa923c2d30af586d"
    )
    assert hashlib.md5(u.tobytes()).hexdigest() == (
        "5c048a58ac9d2fb87442e3c601232840"
    )
    assert hashlib.md5(v.tobytes()).hexdigest() == (
        "58be420aae529777874b3041d05200d9"
    )


def test_vp8_fixture_matches_libwebp():
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 not available")
    data = open(FIXTURE, "rb").read()
    got = C.decode_webp_lossy(data)
    want = _libwebp_yuv(lib, data)
    for mine, ref in zip(got, want):
        assert (mine == ref).all()


def test_vp8_decodes_libwebp_encoded_streams_bit_exactly():
    """Real-encoder interop: libwebp-encoded images use segmentation
    (4 segments with absolute quant/filter values + a coded segment
    map), B_PRED with context-coded submodes, skip flags, and the
    normal loop filter — my decoder must match the library's own
    decode bit-exactly at every quality, including non-multiple-of-16
    dimensions (partial edge macroblocks)."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 not available")
    rng = np.random.default_rng(42)
    for (w, h) in [(48, 32), (33, 17)]:
        for q in (5, 75):
            yy, xx = np.mgrid[0:h, 0:w]
            base = (xx * 3 + yy * 2) % 256
            img = np.stack([base, 255 - base, (xx * yy) % 256], axis=-1)
            img = np.clip(
                img + rng.integers(0, 60, size=(h, w, 3)) - 30, 0, 255
            ).astype(np.uint8)
            data = _libwebp_encode(lib, img, q)
            got = C.decode_webp_lossy(data)
            want = _libwebp_yuv(lib, data, bypass_filtering=0)
            for mine, ref in zip(got, want):
                assert (mine == ref).all(), (w, h, q)


def test_vp8_mosaic_three_way_agreement():
    """The repo encoder's streams decode identically in (a) my
    decoder, (b) libwebp, and (c) the analytic tile model the llm_m31
    oracle restates — including level-0 skip macroblocks."""
    lib = _libwebp()
    levels = [40, -17, 0, 1, -64, 63]  # includes a skip MB and extremes
    mb_w, mb_h = 3, 2
    data = C.encode_webp_lossy(C.encode_vp8_dc_mosaic(levels, mb_w, mb_h))
    tiles = C.vp8_mosaic_tiles(levels, mb_w, mb_h)
    want = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    for my in range(mb_h):
        for mx in range(mb_w):
            want[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = tiles[
                my * mb_w + mx
            ]
    y, u, v = C.decode_webp_lossy(data)
    assert (y == want).all()
    assert (u == 128).all() and (v == 128).all()
    if lib is not None:
        ry, ru, rv = _libwebp_yuv(lib, data)
        assert (ry == want).all()
        assert (ru == 128).all() and (rv == 128).all()


def test_vp8_loop_filters_match_libwebp():
    """Both loop filters (normal + simple), cross-validated against
    libwebp on the repo encoder's streams at levels spanning all three
    high-edge-variance thresholds (0 / 1 / 2)."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 not available")
    import random

    rng = random.Random(9)
    for ftype in (0, 1):
        for lvl in (6, 18, 44):
            levels = [rng.randrange(-64, 64) for _ in range(6)]
            data = C.encode_webp_lossy(
                C.encode_vp8_dc_mosaic(levels, 3, 2, ftype, lvl)
            )
            got = C.decode_webp_lossy(data)
            want = _libwebp_yuv(lib, data)
            for mine, ref in zip(got, want):
                assert (mine == ref).all(), (ftype, lvl)


def test_vp8_truncated_and_garbage_fail_loudly():
    data = open(FIXTURE, "rb").read()
    with pytest.raises(ValueError):
        C.decode_vp8(b"\x00" * 12)  # bad start code
    with pytest.raises((ValueError, IndexError)):
        C.decode_webp_lossy(data[:40] + b"\x00" * 10)
    with pytest.raises(ValueError):
        C.decode_webp_lossy(b"RIFF\x04\x00\x00\x00WEBP")


def test_vp8l_decodes_libwebp_lossless_streams_exactly():
    """VP8L third-party interop via the system libwebp's LOSSLESS
    encoder: predictor transforms, cross-color, palettes (incl. a
    ~180-entry palette whose delta row uses far-window 2D LZ77
    distance codes — the case that exposed the mis-reconstructed tail
    of the distance-code table), and color-cache streams must decode
    to the exact source pixels."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 not available")
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    rng = np.random.default_rng(7)
    for (w, h) in [(16, 16), (33, 17), (64, 48)]:
        for kind in ("gradient", "noise", "flat", "photo"):
            yy, xx = np.mgrid[0:h, 0:w]
            if kind == "gradient":
                img = np.stack(
                    [(xx * 5) % 256, (yy * 7) % 256, (xx + yy) % 256], -1
                ).astype(np.uint8)
            elif kind == "noise":
                img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            elif kind == "flat":
                img = np.full((h, w, 3), 77, np.uint8)
                img[h // 2:, :] = 200
            else:  # smooth "photo": palettizes at 16x16 (~180 colors)
                base = np.sin(xx / 3) * 60 + np.cos(yy / 5) * 60 + 128
                img = np.stack(
                    [base, base * 0.8 + 20, 255 - base], -1
                ).clip(0, 255).astype(np.uint8)
            out = ctypes.POINTER(ctypes.c_uint8)()
            n = lib.WebPEncodeLosslessRGB(
                img.tobytes(), w, h, w * 3, ctypes.byref(out)
            )
            assert n > 0
            data = bytes(np.ctypeslib.as_array(out, shape=(n,)))
            lib.WebPFree(out)
            dec = C.decode_webp_lossless(data)
            assert (dec == img).all(), (w, h, kind)


def test_vp8_multi_partition_token_layout():
    """2/4/8 token partitions: MB row r's residuals live in partition
    r % n with the 3-byte size table between the header and the
    concatenated partitions; nonzero contexts still flow ACROSS
    partitions via the above row. Decodes identically to the
    single-partition stream (and bit-exactly in libwebp when
    present)."""
    import random

    lib = _libwebp()
    rng = random.Random(11)
    levels = [rng.randrange(-64, 64) for _ in range(12)]
    tiles = C.vp8_mosaic_tiles(levels, 3, 4)
    want = np.zeros((64, 48), np.uint8)
    for my in range(4):
        for mx in range(3):
            want[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = tiles[
                my * 3 + mx
            ]
    for nparts in (2, 4, 8):
        data = C.encode_webp_lossy(
            C.encode_vp8_dc_mosaic(levels, 3, 4, n_partitions=nparts)
        )
        y, u, v = C.decode_webp_lossy(data)
        assert (y == want).all(), nparts
        if lib is not None:
            ry, _ru, _rv = _libwebp_yuv(lib, data)
            assert (ry == want).all(), nparts


def _libwebp_rgb(lib, data: bytes, fancy: bool = True) -> np.ndarray:
    """MODE_RGB decode via WebPDecode (fancy selects the default
    bilinear chroma upsampler; fancy=False is no_fancy_upsampling)."""
    lib.WebPDecode.restype = ctypes.c_int
    lib.WebPDecode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_Config)
    ]
    lib.WebPFreeDecBuffer.argtypes = [ctypes.POINTER(_DecBuffer)]
    cfg = _Config()
    ctypes.memset(ctypes.byref(cfg), 0, ctypes.sizeof(cfg))
    cfg.options.no_fancy_upsampling = 0 if fancy else 1
    cfg.output.colorspace = 0  # MODE_RGB
    status = lib.WebPDecode(data, len(data), ctypes.byref(cfg))
    assert status == 0, f"libwebp VP8StatusCode {status}"
    b = cfg.output
    w, h = b.width, b.height
    r = b.u.RGBA
    arr = np.ctypeslib.as_array(
        r.rgba, shape=(h, r.stride)
    )[:, : w * 3].reshape(h, w, 3).copy()
    lib.WebPFreeDecBuffer(ctypes.byref(b))
    return arr


def test_vp8_rgb_csc_matches_libwebp():
    """vp8_yuv_to_rgb is BIT-EXACT against libwebp MODE_RGB in both
    chroma-upsampling modes (fancy bilinear-ish default and the
    no_fancy_upsampling point sampler) on the real fixture and on
    libwebp-encoded color streams with odd dimensions (the fancy
    upsampler's boundary rows/columns and odd-width tail)."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 not available")
    rng = np.random.default_rng(7)
    streams = [open(FIXTURE, "rb").read()]
    for (w, h) in [(48, 32), (33, 17), (16, 16)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 5) % 256, (yy * 7) % 256, (xx + yy) % 256], axis=-1
        )
        img = np.clip(
            img + rng.integers(0, 50, size=(h, w, 3)) - 25, 0, 255
        ).astype(np.uint8)
        streams.append(_libwebp_encode(lib, img, 75.0))
    for i, data in enumerate(streams):
        y, u, v = C.decode_webp_lossy(data)
        for fancy in (True, False):
            got = C.vp8_yuv_to_rgb(y, u, v, fancy=fancy)
            want = _libwebp_rgb(lib, data, fancy=fancy)
            assert (got == want).all(), (i, fancy)


def test_vp8_color_mosaic_three_way():
    """Chroma-DC mosaics (encode_vp8_dc_mosaic uv_levels) decode
    identically in (a) my decoder, (b) libwebp, and (c) the analytic
    Y/U/V tile chains the llm_m35 oracle restates — including an
    all-zero skip MB, a luma-only MB, and a chroma-only MB (skip is
    only legal when Y2 AND chroma are all zero)."""
    lib = _libwebp()
    mb_w, mb_h = 3, 2
    levels = [40, 0, 0, -17, 63, -64]
    uv = [(5, -7), (0, 0), (-30, 44), (0, 0), (-64, 63), (1, -1)]
    # MB1: all-zero -> skip; MB3: luma-only; MB2: chroma-only
    data = C.encode_webp_lossy(
        C.encode_vp8_dc_mosaic(levels, mb_w, mb_h, uv_levels=uv)
    )
    yt = C.vp8_mosaic_tiles(levels, mb_w, mb_h)
    ut = C.vp8_mosaic_uv_tiles([a for a, _ in uv], mb_w, mb_h)
    vt = C.vp8_mosaic_uv_tiles([b for _, b in uv], mb_w, mb_h)
    y, u, v = C.decode_webp_lossy(data)
    planes = {"y": (y, yt, 16), "u": (u, ut, 8), "v": (v, vt, 8)}
    for name, (plane, tiles, s) in planes.items():
        for my in range(mb_h):
            for mx in range(mb_w):
                tile = plane[my * s:(my + 1) * s, mx * s:(mx + 1) * s]
                assert (tile == tiles[my * mb_w + mx]).all(), (
                    name, my, mx, np.unique(tile), tiles[my * mb_w + mx]
                )
    if lib is not None:
        for mine, ref in zip((y, u, v), _libwebp_yuv(lib, data)):
            assert (mine == ref).all()


def test_decode_image_lossy_webp_full_color():
    """decode_image's VP8 branch now runs the full fixed-point CSC
    with the default fancy upsampler — bit-equal to libwebp MODE_RGB
    on the real fixture (previously luma-replicated grey)."""
    from table_demo_spark.operators.multimodal import decode_image

    data = open(FIXTURE, "rb").read()
    got = decode_image(data)
    y, u, v = C.decode_webp_lossy(data)
    assert (got == C.vp8_yuv_to_rgb(y, u, v, fancy=True)).all()
    lib = _libwebp()
    if lib is not None:
        assert (got == _libwebp_rgb(lib, data, fancy=True)).all()
    # chroma actually moves the output: not a grey replication
    assert not (got[:, :, 0] == got[:, :, 2]).all()
