"""Native HEVC kernels (operators/_hevc_native.py): the C ports of
residual_coding and the MC interpolation must be bit-for-bit equivalent
to the pure-Python reference paths — proven here by full-decode A/Bs
over real x265 streams that exercise every TU size, scan order, plane
and slice type, with the pure path forced via the HEVC_NATIVE_RESIDUAL
switch.  The libde265 adjudication inside every HEVC query is the
second, independent gate (a native divergence would flip the exact_*
flags and fail the oracle loudly)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from table_demo_spark.operators.codecs import h264_unescape_rbsp

try:
    from table_demo_spark.operators import hevc

    _HAVE = hevc.have_libde265() and hevc.have_libx265()
except Exception:  # pragma: no cover
    _HAVE = False

_NATIVE = _HAVE and hevc._native_lib() is not None


def _mk(arr, coff=0):
    y = arr.astype(np.uint8)
    cb = ((arr[::2, ::2].astype(int) + 60 + coff) % 256).astype(np.uint8)
    cr = ((arr[::2, ::2].astype(int) + 120 + coff) % 256).astype(np.uint8)
    return y, cb, cr


def _decode_both_ways(nals):
    saved = hevc.HEVC_NATIVE_RESIDUAL
    try:
        hevc.HEVC_NATIVE_RESIDUAL = False
        pure = hevc.decode_hevc_video_from_spec(nals)
        hevc.HEVC_NATIVE_RESIDUAL = True
        native = hevc.decode_hevc_video_from_spec(nals)
    finally:
        hevc.HEVC_NATIVE_RESIDUAL = saved
    return pure, native


def _assert_identical(pure, native):
    assert len(pure) == len(native)
    for (py, pcb, pcr, pst), (ny, ncb, ncr, nst) in zip(pure, native):
        assert (py == ny).all()
        assert (pcb == ncb).all()
        assert (pcr == ncr).all()
        assert pst == nst  # incl. n_coeff / n_cu / slice stats


@pytest.mark.skipif(not _NATIVE, reason="native kernel unavailable")
def test_native_builds_and_falls_back():
    """The kernel loads here; the pure path stays importable and is
    what the A/Bs below compare against."""
    assert hevc._native_lib() is not None


@pytest.mark.skipif(not _NATIVE, reason="native kernel unavailable")
def test_native_matches_pure_bframes():
    """IBBP GOPs (B arm: bi/uni MC, inter residual trees, all scan
    fallbacks) — native and pure decodes byte-identical, and both
    bit-exact vs libde265."""
    rng = np.random.RandomState(4242)
    cases = (
        (48, 48, 17, 16, 5),
        (56, 40, 33, 32, 3),
        (40, 64, 41, 16, 1),
    )
    for W, H, qp, ctu, mm in cases:
        a0 = rng.randint(0, 256, (H, W))
        a1 = rng.randint(0, 256, (H, W))
        bf = (a0 + a1 + 1) // 2
        frames = [_mk(a0), _mk(bf, 3), _mk(bf, 5), _mk(a1)]
        nals = hevc.encode_hevc_video(
            frames, qp=qp, ctu=ctu, max_merge=mm,
            extra_params=hevc.X265_BFRAME_PARAMS,
        )
        pure, native = _decode_both_ways(nals)
        _assert_identical(pure, native)
        want = hevc.decode_hevc_libde265_frames(nals)
        gs = sorted(native, key=lambda f: f[3]["poc"])
        for (gy, gcb, gcr, _), (wy, wcb, wcr) in zip(gs, want):
            assert (gy == wy).all()
            assert (gcb == wcb).all()
            assert (gcr == wcr).all()


@pytest.mark.skipif(not _NATIVE, reason="native kernel unavailable")
def test_native_matches_pure_intra_and_pslices():
    """I-only and IPP streams (intra scans incl. the mode-dependent
    horizontal/vertical 4x4/8x8 orders, P-slice AMVP + fractional
    MC) — native and pure byte-identical."""
    rng = np.random.RandomState(99)
    # intra-only: fresh noise per frame, both CTU sizes, a QP sweep
    for qp, ctu in ((12, 16), (27, 32), (42, 16)):
        frames = [
            _mk(rng.randint(0, 256, (48, 48))) for _ in range(2)
        ]
        nals = hevc.encode_hevc_video(frames, qp=qp, ctu=ctu)
        pure, native = _decode_both_ways(nals)
        _assert_identical(pure, native)
    # P slices: linear-ramp drift makes x265 code subpel MVs
    base = (np.arange(48)[:, None] * 2 + np.arange(48)[None, :] * 3) % 256
    frames = [
        _mk((base + 0) % 256),
        _mk((np.roll(base, (1, 1), (0, 1)) + 0) % 256),
        _mk((np.roll(base, (2, 2), (0, 1)) + 0) % 256),
    ]
    nals = hevc.encode_hevc_video(frames, qp=30, ctu=16)
    pure, native = _decode_both_ways(nals)
    _assert_identical(pure, native)


@pytest.mark.skipif(not _NATIVE, reason="native kernel unavailable")
def test_native_mc_kernels_match_pure_exhaustive():
    """Every fractional phase x block size x edge condition for both
    MC kernels, against the pure numpy forms on random planes
    (out-of-picture MVs included: the clamp arms)."""
    rng = np.random.RandomState(7)
    lib = hevc._native_lib()
    assert lib is not None

    class _Stub:
        pass

    ref = rng.randint(0, 256, (64, 64)).astype(np.int64)
    dec = _Stub()
    dec.h, dec.w = ref.shape
    luma = hevc.HevcInterSliceDecoder._mc_luma_raw
    chroma = hevc.HevcInterSliceDecoder._mc_chroma_raw
    saved = hevc.HEVC_NATIVE_RESIDUAL
    try:
        for n in (8, 16, 32):
            for fx in range(4):
                for fy in range(4):
                    for x0, y0 in ((0, 0), (16, 8), (60, 60), (-0, 0)):
                        mv = (
                            (fx + 4 * rng.randint(-20, 20)),
                            (fy + 4 * rng.randint(-20, 20)),
                        )
                        hevc.HEVC_NATIVE_RESIDUAL = False
                        want = luma(dec, ref, x0, y0, n, mv)
                        hevc.HEVC_NATIVE_RESIDUAL = True
                        got = luma(dec, ref, x0, y0, n, mv)
                        assert (want == got).all(), (n, fx, fy, mv)
        for nc in (4, 8, 16):
            for fx in range(8):
                for fy in range(8):
                    mv = (
                        (fx + 8 * rng.randint(-10, 10)),
                        (fy + 8 * rng.randint(-10, 10)),
                    )
                    hevc.HEVC_NATIVE_RESIDUAL = False
                    want = chroma(dec, ref, 5, 3, nc, mv)
                    hevc.HEVC_NATIVE_RESIDUAL = True
                    got = chroma(dec, ref, 5, 3, nc, mv)
                    assert (want == got).all(), (nc, fx, fy, mv)
    finally:
        hevc.HEVC_NATIVE_RESIDUAL = saved


@pytest.mark.skipif(not _NATIVE, reason="native kernel unavailable")
def test_native_inter_pred_fused_matches_pure():
    """The fused hevc_inter_pred (MC + uni/bi rounding + clip +
    store) vs the pure _inter_pred_cu chain: uni-L0 / uni-L1 / bi,
    all block sizes, fractional and far out-of-picture MVs."""
    rng = np.random.RandomState(11)

    def _stub():
        # real class without __init__ so the pure path's _mc_*_raw
        # methods resolve
        return hevc.HevcInterSliceDecoder.__new__(
            hevc.HevcInterSliceDecoder
        )

    fn = hevc.HevcInterSliceDecoder._inter_pred_cu
    saved = hevc.HEVC_NATIVE_RESIDUAL
    try:
        for trial in range(300):
            h = 32 * int(rng.randint(1, 3))
            w = 32 * int(rng.randint(1, 3))
            n = int(rng.choice([8, 16, 32]))
            x0 = 4 * int(rng.randint((w - n) // 4 + 1))
            y0 = 4 * int(rng.randint((h - n) // 4 + 1))
            pf0, pf1 = int(rng.randint(2)), int(rng.randint(2))
            if not (pf0 or pf1):
                pf0 = 1
            mv0 = (int(rng.randint(-200, 200)), int(rng.randint(-200, 200)))
            mv1 = (int(rng.randint(-200, 200)), int(rng.randint(-200, 200)))
            mot = (bool(pf0), bool(pf1), mv0, mv1)
            refs = [
                tuple(
                    rng.randint(0, 256, s).astype(np.int64)
                    for s in ((h, w), (h // 2, w // 2), (h // 2, w // 2))
                )
                for _ in range(2)
            ]

            outs = []
            for native in (False, True):
                dec = _stub()
                dec.h, dec.w = h, w
                dec.refs = refs
                dec.n_bi = 0
                dec.n_uni = [0, 0]
                dec.y = np.zeros((h, w), np.int64)
                dec.cb = np.zeros((h // 2, w // 2), np.int64)
                dec.cr = np.zeros((h // 2, w // 2), np.int64)
                hevc.HEVC_NATIVE_RESIDUAL = native
                fn(dec, x0, y0, n, mot)
                outs.append((dec.y, dec.cb, dec.cr))
            key = (trial, n, x0, y0, pf0, pf1, mv0, mv1)
            for a, b in zip(*outs):
                assert (a == b).all(), key
    finally:
        hevc.HEVC_NATIVE_RESIDUAL = saved


@pytest.mark.skipif(not _NATIVE, reason="native kernel unavailable")
def test_native_intra_recon_matches_pure_fuzz():
    """hevc_intra_recon vs the pure _intra_pred + reconstruct chain:
    randomized over all 35 modes, every TU size, random availability
    masks, block positions incl. picture edges (partial 2n runs),
    with/without residual, both strong-smoothing settings, plus
    flat-plane trials that force the strong bilinear arm."""
    lib = hevc._native_lib()
    assert lib is not None
    rng = np.random.RandomState(0xA5)

    class _Stub:
        pass

    dec = _Stub()
    pure = hevc.HevcIntraSliceDecoder._intra_pred
    for trial in range(1500):
        n = int(rng.choice([4, 8, 16, 32]))
        strong = bool(rng.randint(2))
        dec.sps = {"strong_intra_smoothing": strong}
        ph = n * int(rng.randint(1, 4))
        pw = n * int(rng.randint(1, 4))
        x0 = n * int(rng.randint(pw // n))
        y0 = n * int(rng.randint(ph // n))
        mode = int(rng.randint(35))
        c_idx = int(rng.randint(3))
        if trial % 7 == 0:
            # constant plane: zero corner gradients -> the strong
            # bilinear arm fires whenever strong and n == 32
            plane = np.full((ph, pw), int(rng.randint(256)), np.int64)
        else:
            plane = rng.randint(0, 256, (ph, pw)).astype(np.int64)
        avail = rng.randint(0, 2, (ph, pw)).astype(bool)
        res = None
        if rng.randint(2):
            res = rng.randint(-128, 128, (n, n)).astype(np.int64)

        plane_p, avail_p = plane.copy(), avail.copy()
        pred = pure(dec, plane_p, avail_p, x0, y0, n, mode, c_idx)
        out = pred if res is None else pred + res
        plane_p[y0:y0 + n, x0:x0 + n] = np.clip(out, 0, 255)
        if c_idx != 2:
            avail_p[y0:y0 + n, x0:x0 + n] = True

        plane_n, avail_n = plane.copy(), avail.copy()
        lib.hevc_intra_recon(
            plane_n.ctypes.data_as(hevc._I64P),
            avail_n.ctypes.data_as(hevc._U8P),
            ph, pw, x0, y0, n, mode, c_idx, int(strong),
            None if res is None else res.ctypes.data_as(hevc._I64P),
            int(c_idx != 2),
        )
        key = (trial, n, mode, c_idx, strong, x0, y0)
        assert (plane_n == plane_p).all(), key
        assert (avail_n == avail_p).all(), key


def test_unescape_splice_matches_reference_scan():
    """The find/splice unescape vs the per-byte reference scan, over
    a dense 00/03-biased fuzz corpus plus the known edge shapes."""

    def ref(data):
        out = bytearray()
        zeros = 0
        i = 0
        while i < len(data):
            b = data[i]
            if (
                zeros >= 2 and b == 3 and i + 1 < len(data)
                and data[i + 1] <= 3
            ):
                zeros = 0
                i += 1
                continue
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
            i += 1
        return bytes(out)

    rng = random.Random(1234)
    alphabet = (0, 0, 0, 3, 3, 1, 2, 4, 0x80)
    for _ in range(5000):
        data = bytes(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 48))
        )
        assert ref(data) == h264_unescape_rbsp(data), data.hex()
    for h in (
        "000003", "00000300", "0000037f", "000003030303",
        "0000000300", "00000300000301", "0003000003", "",
        "000003000301", "00000303",
    ):
        data = bytes.fromhex(h)
        assert ref(data) == h264_unescape_rbsp(data), h
