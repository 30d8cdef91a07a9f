"""llm_m59 HEVC B-slice battery: real x265 IBBP GOPs -> from-spec
biprediction decode (inter_pred_idc, combined merge candidates,
per-list AMVP with POC scaling, 14-bit-intermediate averaging) ->
per-display-frame bit-exact adjudication against libde265."""

from __future__ import annotations

import numpy as np
import pytest

try:
    from table_demo_spark.operators import hevc

    _HAVE = hevc.have_libde265() and hevc.have_libx265()
except Exception:  # pragma: no cover
    _HAVE = False

pytestmark = pytest.mark.skipif(
    not _HAVE, reason="libde265/libx265 not available"
)


def _mk(arr, coff=0):
    y = arr.astype(np.uint8)
    cb = ((arr[::2, ::2].astype(int) + 60 + coff) % 256).astype(np.uint8)
    cr = ((arr[::2, ::2].astype(int) + 120 + coff) % 256).astype(np.uint8)
    return y, cb, cr


def _check(nals, n):
    got = hevc.decode_hevc_video_from_spec(nals)
    want = hevc.decode_hevc_libde265_frames(nals)
    assert len(got) == len(want) == n
    gs = sorted(got, key=lambda f: f[3]["poc"])
    stats = []
    for (gy, gcb, gcr, st), (wy, wcb, wcr) in zip(gs, want):
        assert gy.shape == wy.shape
        assert (gy == wy).all() and (gcb == wcb).all() and (gcr == wcr).all()
        stats.append(st)
    return stats


def test_bslice_sweep_all_paths_exact():
    """Anchor-average (zero-MV bi merge), independent-anchor rolled
    averages (explicit two-list AMVP + fractional bi), and fresh
    noise (intra-in-B, uni L0/L1) across QPs, CTU sizes, dims, GOP
    lengths and max-merge budgets — every display frame bit-exact vs
    libde265, and every B path non-vacuously exercised."""
    rng = np.random.RandomState(77)
    tot = {"n_skip": 0, "n_merge": 0, "n_amvp": 0, "n_bi": 0,
           "n_uni_l0": 0, "n_uni_l1": 0, "n_intra_cu": 0,
           "n_frac_mv": 0}
    cases = (
        (0, 88, 88, 32, 16, 5, 2), (1, 56, 48, 17, 32, 3, 2),
        (2, 48, 48, 39, 16, 2, 2), (0, 40, 80, 38, 16, 5, 1),
        (1, 64, 64, 40, 16, 2, 2), (2, 40, 72, 41, 32, 1, 1),
    )
    for mode, W, H, qp, ctu, mm, periods in cases:
        n = 1 + 3 * periods
        if mode == 0:
            gy, gx = np.mgrid[0:H, 0:W]
            base = ((gx * 5 + gy * 3) // 2
                    + rng.randint(0, 30, (H, W))) % 256
            anchors = [
                np.roll(base, (2 * j, 4 * j), (0, 1)).astype(int)
                for j in range(periods + 1)
            ]
        elif mode == 1:
            anchors = [
                rng.randint(0, 256, (H, W)).astype(int)
                for _ in range(periods + 1)
            ]
        else:
            anchors = None
        frames = []
        if anchors is None:
            frames = [
                _mk(rng.randint(0, 256, (H, W)).astype(int), coff=i)
                for i in range(n)
            ]
        else:
            for j in range(periods):
                v0 = (2 * rng.randint(-2, 3), 2 * rng.randint(-3, 4))
                v1 = (2 * rng.randint(-2, 3), 2 * rng.randint(-3, 4))
                bf = (
                    np.roll(anchors[j], v0, (0, 1))
                    + np.roll(anchors[j + 1], v1, (0, 1)) + 1
                ) // 2
                frames += [_mk(anchors[j]), _mk(bf), _mk(bf)]
            frames.append(_mk(anchors[-1]))
        nals = hevc.encode_hevc_video(
            frames, qp=qp, ctu=ctu, max_merge=mm,
            extra_params=hevc.X265_BFRAME_PARAMS,
        )
        for st in _check(nals, n):
            for k in tot:
                tot[k] += st.get(k, 0) or 0
    for k, v in tot.items():
        assert v > 0, (k, tot)


def test_x265_cqp_bslice_qp_law():
    """The m59 oracle pins slice_qp: I = qp-3, P = qp, B = qp+2 —
    probe the whole drawn range, both CTU sizes."""
    rng = np.random.RandomState(3)
    frames = [
        _mk(rng.randint(0, 256, (32, 32)).astype(int), coff=i)
        for i in range(4)
    ]
    for qp in (12, 20, 27, 35, 42):
        for ctu in (16, 32):
            nals = hevc.encode_hevc_video(
                frames, qp=qp, ctu=ctu,
                extra_params=hevc.X265_BFRAME_PARAMS,
            )
            got = hevc.decode_hevc_video_from_spec(nals)
            by_type = {}
            for *_, st in got:
                by_type.setdefault(st["slice_type"], set()).add(
                    st["slice_qp"]
                )
            assert by_type["I"] == {qp - 3}, (qp, ctu, by_type)
            assert by_type["P"] == {qp}, (qp, ctu, by_type)
            assert by_type["B"] == {qp + 2}, (qp, ctu, by_type)


def test_gop_shape_and_display_reorder():
    """Fixed IBBP pins: decode order I P B B, POCs 0,3,1,2; B NALs
    are TRAIL_N (non-reference, b-pyramid off)."""
    rng = np.random.RandomState(9)
    frames = [
        _mk(rng.randint(0, 256, (40, 40)).astype(int), coff=i)
        for i in range(4)
    ]
    nals = hevc.encode_hevc_video(
        frames, qp=30, extra_params=hevc.X265_BFRAME_PARAMS
    )
    slice_nal_types = [
        (n[0] >> 1) & 0x3F for n in nals if ((n[0] >> 1) & 0x3F) < 32
    ]
    assert slice_nal_types == [20, 1, 0, 0]
    got = hevc.decode_hevc_video_from_spec(nals)
    assert [st["poc"] for *_, st in got] == [0, 3, 1, 2]
    assert [st["slice_type"] for *_, st in got] == ["I", "P", "B", "B"]


def test_explicit_fractional_biprediction_exercised():
    """Averages of two differently-rolled INDEPENDENT anchors force
    explicit two-list AMVP; subpel refinement makes some of those
    MVs fractional — the 14-bit-intermediate averaging path (a
    uni-style per-list rounding would diverge) on real streams."""
    rng = np.random.RandomState(5)
    H, W = 48, 64
    a0 = rng.randint(0, 256, (H, W)).astype(int)
    a1 = rng.randint(0, 256, (H, W)).astype(int)
    b = (np.roll(a0, (2, 4), (0, 1)) + np.roll(a1, (0, -6), (0, 1)) + 1) // 2
    frames = [_mk(a0), _mk(b), _mk(b), _mk(a1)]
    nals = hevc.encode_hevc_video(
        frames, qp=22, ctu=32, extra_params=hevc.X265_BFRAME_PARAMS
    )
    stats = _check(nals, 4)
    b_stats = [st for st in stats if st["slice_type"] == "B"]
    assert sum(st["n_amvp"] for st in b_stats) > 0
    assert sum(st["n_bi"] for st in b_stats) > 0
    assert sum(st["n_frac_mv"] for st in b_stats) > 0


def test_bi_intermediate_averaging_not_uni_rounding():
    """Non-vacuity for 8.5.3.3.4.3: with fractional bi MVs, averaging
    the per-list FINAL (rounded) uni predictions differs from the
    spec's 14-bit-intermediate average on real content — recompute a
    bi block both ways from the decoder's own MC kernels and require
    the two formulas to disagree somewhere on a fractional case."""
    rng = np.random.RandomState(13)
    ref0 = rng.randint(0, 256, (64, 64)).astype(np.int64)
    ref1 = rng.randint(0, 256, (64, 64)).astype(np.int64)

    class Shim:
        h, w = 64, 64
    shim = Shim()
    mc = hevc.HevcInterSliceDecoder._mc_luma_raw
    diffs = 0
    for mv0, mv1 in (((1, 2), (3, 1)), ((2, 2), (1, 3)), ((5, 7), (9, 6))):
        r0 = mc(shim, ref0, 8, 8, 16, mv0)
        r1 = mc(shim, ref1, 8, 8, 16, mv1)
        spec = np.clip((r0 + r1 + 64) >> 7, 0, 255)
        uni = (
            np.clip((r0 + 32) >> 6, 0, 255)
            + np.clip((r1 + 32) >> 6, 0, 255) + 1
        ) >> 1
        diffs += int((spec != uni).sum())
    assert diffs > 0


def test_tmvp_streams_exact_and_temporal_candidates_selected():
    """llm_m60: with temporal-mvp on, x265 must actually SELECT
    temporal candidates (merge slot and AMVP filler) somewhere in
    the sweep — and every frame stays bit-exact vs libde265 across
    P chains (NoBackwardPredFlag arm) and IBBP GOPs (future-ref col
    list arm).  The first P after the IDR exercises the
    intra-collocated-picture fallback (no temporal candidates)."""
    rng = np.random.RandomState(7)
    tm = ta = 0
    for trial in range(6):
        H, W = 8 * rng.randint(4, 10), 8 * rng.randint(4, 10)
        gy, gx = np.mgrid[0:H, 0:W]
        base = ((gx * 5 + gy * 3) // 2
                + rng.randint(0, 30, (H, W))) % 256
        frames = [_mk(base)]
        cur = base.copy()
        for _ in range(6):
            cur = np.roll(
                cur,
                (int(rng.randint(-2, 3)), int(rng.randint(-4, 5))),
                (0, 1),
            )
            frames.append(_mk(cur))
        extra = (("temporal-mvp", "1"),) + (
            hevc.X265_BFRAME_PARAMS if trial % 2 else ()
        )
        nals = hevc.encode_hevc_video(
            frames, qp=int(rng.randint(18, 40)), ctu=32,
            extra_params=extra,
        )
        for st in _check(nals, 7):
            tm += st.get("n_tmvp_merge", 0) or 0
            ta += st.get("n_tmvp_amvp", 0) or 0
    assert tm > 0 and ta > 0, (tm, ta)
