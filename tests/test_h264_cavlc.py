"""H.264 CAVLC layer (ISO/IEC 14496-10 section 9.2) — normative-table
and codec pins.

Adjudication strategy (no H.264 decoder ships in this container —
re-probed r12): the tables in operators/codecs.py are validated here
structurally — every VLC table must be PREFIX-FREE and its Kraft
deficit must sit EXACTLY on the all-zeros codewords (H.264 avoids
codewords that could emulate start codes; the spec tables free
precisely that codespace) — and the most-travelled region is pinned
against the published Richardson worked example bit-for-bit.  Cells
with TotalCoeff >= 13 in contexts 1-2 carry per-cell encode/decode
roundtrips only (declared in the codecs.py table comment).
"""

from __future__ import annotations

import numpy as np
import pytest

from table_demo_spark.operators import codecs as C


def _codes(table):
    return list(table.values())


def _free_space(table, max_len: int):
    """Codespace not covered by any codeword, as a set of (len, val)
    leaves at max_len granularity."""
    leaves = set(range(1 << max_len))
    for code in table.values():
        pad = max_len - len(code)
        base = int(code, 2) << pad
        for v in range(base, base + (1 << pad)):
            leaves.discard(v)
    return leaves


@pytest.mark.parametrize(
    "name,table",
    [("ct0", C._CAVLC_CT[0]), ("ct1", C._CAVLC_CT[1]),
     ("ct2", C._CAVLC_CT[2]), ("ct_chroma", C._CAVLC_CT_CHROMA)]
    + [(f"tz{k}", t) for k, t in C._CAVLC_TZ.items()]
    + [(f"tzc{k}", t) for k, t in C._CAVLC_TZ_CHROMA.items()]
    + [(f"rb{k}", t) for k, t in C._CAVLC_RB.items()],
)
def test_tables_prefix_free(name, table):
    codes = _codes(table)
    assert len(set(codes)) == len(codes)
    for a in codes:
        for b in codes:
            assert a == b or not b.startswith(a), (name, a, b)


def test_table_kraft_deficits_sit_on_all_zeros_codewords():
    """The spec's emulation-avoidance design, as a structural pin:
    each incomplete table's free codespace is exactly the all-zeros
    (or near-zero) leaves — a transposed or mistyped codeword
    elsewhere would scatter the free space and fail here."""
    # ct0: the two 16-bit near-zero words 0x0000 and 0x0001
    assert _free_space(C._CAVLC_CT[0], 16) == {0, 1}
    # ct1: 14-bit leaves 0, 1 and 12
    assert _free_space(C._CAVLC_CT[1], 14) == {0, 1, 12}
    # ct2: exactly the all-zeros 10-bit word
    assert _free_space(C._CAVLC_CT[2], 10) == {0}
    # chroma-DC coeff_token, total_zeros (except tz1), run_before
    # (except rb7) are complete
    assert _free_space(C._CAVLC_CT_CHROMA, 8) == set()
    assert _free_space(C._CAVLC_TZ[1], 9) == {0}
    for k in range(2, 16):
        assert _free_space(C._CAVLC_TZ[k], 6) == set(), k
    assert _free_space(C._CAVLC_RB[7], 11) == {0}
    for k in range(1, 7):
        assert _free_space(C._CAVLC_RB[k], 3) == set(), k


def test_published_worked_example_bit_exact():
    """Richardson ("H.264 and MPEG-4 Video Compression"), the CAVLC
    worked example: zigzag levels [0,3,0,1,-1,-1,0,1,0...], nC=0 ->
    000010001110010111101101.  Pins coeff_token ctx0 (5,3), the
    trailing-one signs, the level prefix/suffix algorithm including
    the suffixLength 0->1 step, total_zeros[5][3], and the
    run_before rows for zerosLeft 3 and 2 — the most-travelled table
    region, against an EXTERNAL publication."""
    levels = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    bw = C._BitWriter()
    total = C.cavlc_encode_block(bw, levels, 0, 16)
    bw.align()
    assert total == 5
    got = "".join(f"{b:08b}" for b in bw.out)
    assert got.startswith("000010001110010111101101")
    # and the decoder inverts it
    br = C._BitReader(bytes(bw.out))
    out, n = C.cavlc_decode_block(br, 0, 16)
    assert n == 5 and out == levels


@pytest.mark.parametrize("n_c", [-1, 0, 2, 4, 8, 16])
def test_every_coeff_token_cell_roundtrips(n_c):
    """Encode/decode every reachable (TotalCoeff, TrailingOnes) cell
    of every context — a prefix collision or level/run bookkeeping
    slip in ANY cell fails its roundtrip."""
    max_coeff = 4 if n_c == -1 else 16
    for total in range(0, max_coeff + 1):
        for t1 in range(0, min(3, total) + 1):
            # trailing t1 ones, earlier coeffs magnitude 3 (so they
            # are not trailing ones), packed at the scan tail
            levels = [0] * max_coeff
            vals = [3] * (total - t1) + [1] * t1
            for k, v in enumerate(vals):
                levels[max_coeff - total + k] = v if k % 2 == 0 else -v
            # TrailingOnes is capped at 3: cells where a 4th trailing
            # one would merge are unreachable with magnitude-1 tails
            if t1 < min(3, total):
                has_more_ones = total - t1 > 0
                if not has_more_ones:
                    continue
            bw = C._BitWriter()
            n = C.cavlc_encode_block(bw, levels, n_c, max_coeff)
            bw.align()
            if n != total:
                continue  # tail magnitudes merged into T1 (by design)
            br = C._BitReader(bytes(bw.out))
            out, n2 = C.cavlc_decode_block(br, n_c, max_coeff)
            assert (out, n2) == (levels, total), (n_c, total, t1)


def test_level_escape_ladder_roundtrips():
    """level_prefix 14 (4-bit suffix), 15 (12-bit) and 16 (13-bit)
    paths, plus suffix-length evolution up to 6."""
    for mag in [8, 16, 100, 2048, 2064, 4096, 6200, 8300, 20000]:
        levels = [mag, -mag, mag, -mag] + [0] * 12
        bw = C._BitWriter()
        C.cavlc_encode_block(bw, levels, 0, 16)
        bw.align()
        br = C._BitReader(bytes(bw.out))
        out, _ = C.cavlc_decode_block(br, 0, 16)
        assert out == levels, mag


def _fixture_mbs(seed: int):
    rng = np.random.RandomState(seed)
    mbs = []
    for _ in range(4):
        ac = np.zeros((4, 4, 4, 4), np.int64)
        for y4 in range(4):
            for x4 in range(4):
                b = rng.randint(0, 256, 16)
                lv = np.where(
                    b < 150, 0,
                    np.where((b - 150) % 14 < 7, 1, (b - 150) % 14 - 5),
                ) * np.where(b % 2 == 0, 1, -1)
                lv[0] = 0
                ac[y4][x4] = lv.reshape(4, 4)
        mbs.append({
            "dc": (rng.randint(0, 256, (4, 4)) % 5 - 2).astype(np.int64),
            "ac": ac,
            "cb_dc": (rng.randint(0, 256, (2, 2)) % 7 - 3).astype(np.int64),
            "cr_dc": (rng.randint(0, 256, (2, 2)) % 7 - 3).astype(np.int64),
        })
    return mbs


def _decode_stream(stream: bytes):
    sps_store, pps_store = {}, {}
    out = None
    for nal in C.decode_annexb(stream):
        t = nal["nal_type"]
        if t == 7:
            i = C.decode_h264_sps(nal["rbsp"])
            sps_store[i["sps_id"]] = i
        elif t == 8:
            i = C.decode_h264_pps(nal["rbsp"])
            pps_store[i["pps_id"]] = i
        elif t == 5:
            out = C.decode_h264_i16x16_slice(
                nal["rbsp"], 5, nal["ref_idc"], pps_store, sps_store
            )
    return out


def _encode_stream(mbs, frame_num=3):
    sps_rbsp = C.encode_h264_sps(66, 30, 4, 1)
    pps_rbsp = C.encode_h264_pps(0, 0, 16)  # pic_init_qp 42
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    sl = C.encode_h264_i16x16_slice(sps, pps, mbs, frame_num=frame_num)
    return C.encode_annexb(
        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
    )


def test_slice_reconstruction_matches_independent_model():
    """Full slice roundtrip vs a from-scratch numpy restatement of
    the 8.5.10/8.5.11/8.5.12/8.3.3/8.3.4 math (the same pipeline the
    m39 SQL oracle restates), including clipping and the MB-to-MB DC
    prediction chain."""
    mbs = _fixture_mbs(7)
    mbs[1]["ac"][0][2][1, 1] = 3000  # escape-path level
    hdr, y, cb, cr, tc = _decode_stream(_encode_stream(mbs))
    assert hdr["slice_qp"] == 42 and hdr["frame_num"] == 3
    planted = sum(
        int(np.count_nonzero(mb["ac"])) + int(np.count_nonzero(mb["dc"]))
        + int(np.count_nonzero(mb["cb_dc"]))
        + int(np.count_nonzero(mb["cr_dc"]))
        for mb in mbs
    )
    assert tc == planted
    h4 = np.array(C._H264_HADAMARD4, np.int64)
    h2 = np.array(((1, 1), (1, -1)), np.int64)
    ls = np.array(
        [[C.h264_levelscale(0, i, j) for j in range(4)] for i in range(4)],
        np.int64,
    )
    ym = np.zeros((16, 64), np.int64)
    cm = {"cb_dc": np.zeros((8, 32), np.int64),
          "cr_dc": np.zeros((8, 32), np.int64)}
    for m, mb in enumerate(mbs):
        dc = ((h4 @ mb["dc"] @ h4) * 10) << 1  # qp 42 >= 36 branch
        pred = 128 if m == 0 else (int(ym[:, 16 * m - 1].sum()) + 8) >> 4
        for y4 in range(4):
            for x4 in range(4):
                d = (mb["ac"][y4][x4] * ls) << 7
                d[0, 0] = dc[y4, x4]
                res = C._h264_idct4(d)
                ym[4 * y4:4 * y4 + 4,
                   16 * m + 4 * x4:16 * m + 4 * x4 + 4] = np.clip(
                    pred + res, 0, 255)
        for key, pl in cm.items():
            dcc = ((h2 @ mb[key] @ h2) * 11 << 6) >> 5  # QPc 37
            for y2 in range(2):
                for x2 in range(2):
                    if m == 0:
                        p = 128
                    else:
                        p = (int(pl[4 * y2:4 * y2 + 4, 8 * m - 1].sum())
                             + 2) >> 2
                    pl[4 * y2:4 * y2 + 4,
                       8 * m + 4 * x2:8 * m + 4 * x2 + 4] = np.clip(
                        p + ((int(dcc[y2, x2]) + 32) >> 6), 0, 255)
    assert np.array_equal(ym, y.astype(np.int64))
    assert np.array_equal(cm["cb_dc"], cb.astype(np.int64))
    assert np.array_equal(cm["cr_dc"], cr.astype(np.int64))


def test_nc_ladder_reaches_all_four_contexts():
    """Dense blocks must drive the neighbour-TotalCoeff ladder into
    every coeff_token context, including the 6-bit FLC (nC >= 8) —
    otherwise contexts 1-3 would be dead code validated by unit
    vectors only (the VP8L untraveled-table trap)."""
    mbs = _fixture_mbs(11)
    # MB 0 sparse (TotalCoeff 3 -> nC band 2..3), MB 2 dense (15 ->
    # the FLC band)
    for y4 in range(4):
        for x4 in range(4):
            sparse = np.zeros(16, np.int64)
            sparse[1:4] = (2, -2, 3)
            mbs[0]["ac"][y4][x4] = sparse.reshape(4, 4)
            flat = np.arange(16, dtype=np.int64) % 3 + 1
            flat[0] = 0
            mbs[2]["ac"][y4][x4] = flat.reshape(4, 4)
    # replicate the decoder's nC walk from the planted TotalCoeffs
    seen = set()
    nnz_prev = None
    for mb in mbs:
        nnz = [[0] * 4 for _ in range(4)]
        seen.add(C._cavlc_ct_context(min(C._h264_nc(nnz, nnz_prev, 0, 0), 8)))
        for idx in range(16):
            x4, y4 = C._h264_blk_xy(idx)
            n_c = C._h264_nc(nnz, nnz_prev, x4, y4)
            seen.add(3 if n_c >= 8 else C._cavlc_ct_context(n_c))
            nnz[y4][x4] = int(np.count_nonzero(mb["ac"][y4][x4]))
        nnz_prev = nnz
    assert seen == {0, 1, 2, 3}
    # and the dense stream still roundtrips through the real codec
    hdr, y, cb, cr, tc = _decode_stream(_encode_stream(mbs))
    assert tc >= 16 * 15


def test_2x2_grid_reconstruction_and_2d_nc():
    """Multi-row pictures: the 2x2 grid exercises every 8.3.3.1
    availability case (128 / left / top / both) and the cross-row nC
    derivation; pinned against an independent model of the 2D
    prediction DAG, including the 8.3.4.1 corner-block chroma
    rules."""
    mbs = _fixture_mbs(19)  # 4 MBs, raster order for a 2x2 grid
    sps_rbsp = C.encode_h264_sps(66, 30, 2, 2)
    pps_rbsp = C.encode_h264_pps(0, 0, 16)
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    sl = C.encode_h264_i16x16_slice(sps, pps, mbs, frame_num=1)
    stream = C.encode_annexb(
        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
    )
    hdr, y, cb, cr, tc = _decode_stream(stream)
    assert y.shape == (32, 32) and cb.shape == (16, 16)
    h4 = np.array(C._H264_HADAMARD4, np.int64)
    h2 = np.array(((1, 1), (1, -1)), np.int64)
    ls = np.array(
        [[C.h264_levelscale(0, i, j) for j in range(4)] for i in range(4)],
        np.int64,
    )
    ym = np.zeros((32, 32), np.int64)
    cm = {"cb_dc": np.zeros((16, 16), np.int64),
          "cr_dc": np.zeros((16, 16), np.int64)}
    for my in range(2):
        for mx in range(2):
            mb = mbs[my * 2 + mx]
            dc = ((h4 @ mb["dc"] @ h4) * 10) << 1
            ox, oy = 16 * mx, 16 * my
            sums, cnt = 0, 0
            if mx > 0:
                sums += int(ym[oy:oy + 16, ox - 1].sum())
                cnt += 16
            if my > 0:
                sums += int(ym[oy - 1, ox:ox + 16].sum())
                cnt += 16
            pred = (
                (sums + 16) >> 5 if cnt == 32
                else (sums + 8) >> 4 if cnt == 16 else 128
            )
            for y4 in range(4):
                for x4 in range(4):
                    d = (mb["ac"][y4][x4] * ls) << 7
                    d[0, 0] = dc[y4, x4]
                    res = C._h264_idct4(d)
                    ym[oy + 4 * y4:oy + 4 * y4 + 4,
                       ox + 4 * x4:ox + 4 * x4 + 4] = np.clip(
                        pred + res, 0, 255)
            cox, coy = 8 * mx, 8 * my
            for key, pl in cm.items():
                dcc = ((h2 @ mb[key] @ h2) * 11 << 6) >> 5
                up = pl[coy - 1, cox:cox + 8] if my > 0 else None
                lf = pl[coy:coy + 8, cox - 1] if mx > 0 else None
                for y2 in range(2):
                    for x2 in range(2):
                        su = (int(up[4 * x2:4 * x2 + 4].sum())
                              if up is not None else None)
                        sl2 = (int(lf[4 * y2:4 * y2 + 4].sum())
                               if lf is not None else None)
                        if x2 == y2:
                            if su is not None and sl2 is not None:
                                p = (su + sl2 + 4) >> 3
                            elif sl2 is not None:
                                p = (sl2 + 2) >> 2
                            elif su is not None:
                                p = (su + 2) >> 2
                            else:
                                p = 128
                        elif x2 == 1:
                            p = ((su + 2) >> 2 if su is not None else
                                 (sl2 + 2) >> 2 if sl2 is not None
                                 else 128)
                        else:
                            p = ((sl2 + 2) >> 2 if sl2 is not None else
                                 (su + 2) >> 2 if su is not None
                                 else 128)
                        pl[coy + 4 * y2:coy + 4 * y2 + 4,
                           cox + 4 * x2:cox + 4 * x2 + 4] = np.clip(
                            p + ((int(dcc[y2, x2]) + 32) >> 6), 0, 255)
    assert np.array_equal(ym, y.astype(np.int64))
    assert np.array_equal(cm["cb_dc"], cb.astype(np.int64))
    assert np.array_equal(cm["cr_dc"], cr.astype(np.int64))


def test_chroma_ac_roundtrip_and_nc():
    """cbpChroma == 2 (mb_type 23): ChromaACLevel blocks parse after
    both planes' DC blocks with nC over the per-plane 2x2 grids,
    dequantize at QPc = 37 (V(1) row, << 6), and reconstruct through
    the full 4x4 inverse transform — pinned against an independent
    model on a 2x1 picture (left-availability, nonuniform edges)."""
    rng = np.random.RandomState(5)

    def mk():
        mb = _fixture_mbs(int(rng.randint(0, 1000)))[0]
        for key in ("cb_ac", "cr_ac"):
            cc = np.zeros((2, 2, 4, 4), np.int64)
            for idx in range(4):
                b = rng.randint(0, 256, 16)
                lv = np.where(b < 170, 0, b % 5 - 2)
                lv[0] = 0
                cc[idx // 2][idx % 2] = lv.reshape(4, 4)
            mb[key] = cc
        return mb

    mbs = [mk(), mk()]
    sps_rbsp = C.encode_h264_sps(66, 30, 2, 1)
    pps_rbsp = C.encode_h264_pps(0, 0, 16)
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    sl = C.encode_h264_i16x16_slice(sps, pps, mbs)
    stream = C.encode_annexb(
        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
    )
    hdr, y, cb, cr, tc = _decode_stream(stream)
    planted = sum(
        int(np.count_nonzero(m[k]))
        for m in mbs
        for k in ("ac", "dc", "cb_dc", "cr_dc", "cb_ac", "cr_ac")
    )
    assert tc == planted
    h2 = np.array(((1, 1), (1, -1)), np.int64)
    lsc = np.array(
        [[C.h264_levelscale(1, i, j) for j in range(4)] for i in range(4)],
        np.int64,
    )
    for key, got in (("cb", cb), ("cr", cr)):
        P = np.zeros((8, 16), np.int64)
        for m, mb in enumerate(mbs):
            dcc = ((h2 @ mb[key + "_dc"] @ h2) * 11 << 6) >> 5
            lf = P[:, 8 * m - 1] if m > 0 else None
            for y2 in range(2):
                for x2 in range(2):
                    sl2 = (
                        int(lf[4 * y2:4 * y2 + 4].sum())
                        if lf is not None else None
                    )
                    p = 128 if sl2 is None else (sl2 + 2) >> 2
                    d = (mb[key + "_ac"][y2][x2] * lsc) << 6
                    d[0, 0] = int(dcc[y2, x2])
                    res = C._h264_idct4(d)
                    P[4 * y2:4 * y2 + 4,
                      8 * m + 4 * x2:8 * m + 4 * x2 + 4] = np.clip(
                        p + res, 0, 255)
        assert np.array_equal(P, got.astype(np.int64)), key


def test_intra_pred_modes_roundtrip_and_fixture_coverage():
    """V/H/Plane prediction (8.3.3.2-8.3.3.4): a 2x2 grid carrying
    all four modes roundtrips, and the m42 fixture's plant-byte mode
    draw actually visits every mode at the bottom-right MB across
    the first 40 doc ids."""
    mbs = _fixture_mbs(23)
    for mb, mode in zip(mbs, (2, 1, 0, 3)):
        mb["pred_mode"] = mode
    sps_rbsp = C.encode_h264_sps(66, 30, 2, 2)
    pps_rbsp = C.encode_h264_pps(0, 0, 16)
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    sl = C.encode_h264_i16x16_slice(sps, pps, mbs)
    stream = C.encode_annexb(
        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
    )
    hdr, y, cb, cr, tc = _decode_stream(stream)
    assert y.shape == (32, 32)
    # mode constraints fail loudly
    bad = [dict(m) for m in mbs]
    bad[0]["pred_mode"] = 3  # plane needs both edges
    with pytest.raises(ValueError, match="Plane"):
        C.encode_h264_i16x16_slice(sps, pps, bad)
    # fixture coverage: the (1,1) MB's mode draw spans all four
    from table_demo_spark.operators import multimodal as M

    mbb = M._CAVLC_MB_BYTES
    seen = set()
    for doc_id in range(40):
        raw = M._md5_stream(str(doc_id), (4 * mbb) // 16, "#cav5")
        seen.add(raw[3 * mbb] % 4)
    assert seen == {0, 1, 2, 3}


def test_i4x4_layer():
    """I_4x4 (mb_type 0): Table 9-4's intra CBP mapping is pinned as
    a PERMUTATION with the published anchors; mode signalling inverts
    the 8.3.1.1 most-probable-mode inference; the 16-block
    sequential reconstruction matches an independent model; diagonal
    modes fail loudly on both sides."""
    t = C.H264_CBP_INTRA
    assert sorted(t) == list(range(48))
    assert t[0] == 47 and t[1] == 31 and t[2] == 15 and t[3] == 0
    rng = np.random.RandomState(9)
    modes = [[2] * 4 for _ in range(4)]
    for y4 in range(4):
        for x4 in range(4):
            if (x4, y4) == (0, 0):
                continue
            if y4 == 0:
                modes[y4][x4] = int(rng.choice([1, 2]))
            elif x4 == 0:
                modes[y4][x4] = int(rng.choice([0, 2]))
            else:
                modes[y4][x4] = int(rng.randint(0, 3))
    luma = np.zeros((4, 4, 4, 4), np.int64)
    for y4 in range(4):
        for x4 in range(4):
            b = rng.randint(0, 256, 16)
            lv = np.where(
                b < 150, 0,
                np.where((b - 150) % 14 < 7, 1, (b - 150) % 14 - 5),
            ) * np.where(b % 2 == 0, 1, -1)
            luma[y4][x4] = lv.reshape(4, 4)
    mb = {"modes": modes, "luma": luma,
          "cb_dc": (rng.randint(0, 256, (2, 2)) % 7 - 3).astype(np.int64),
          "cr_dc": (rng.randint(0, 256, (2, 2)) % 7 - 3).astype(np.int64)}
    sps_rbsp = C.encode_h264_sps(66, 30, 1, 1)
    pps_rbsp = C.encode_h264_pps(0, 0, 16)
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    sl = C.encode_h264_i4x4_slice(sps, pps, mb, frame_num=2)
    stream = C.encode_annexb(
        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
    )
    ss, ps = {}, {}
    for nal in C.decode_annexb(stream):
        tt = nal["nal_type"]
        if tt == 7:
            i = C.decode_h264_sps(nal["rbsp"])
            ss[i["sps_id"]] = i
        elif tt == 8:
            i = C.decode_h264_pps(nal["rbsp"])
            ps[i["pps_id"]] = i
        else:
            hdr, y, cb, cr, dm, tc = C.decode_h264_i4x4_slice(
                nal["rbsp"], 5, 3, ps, ss
            )
    assert [list(r) for r in dm] == [list(r) for r in modes]
    # independent sequential-reconstruction model
    ls = np.array(
        [[C.h264_levelscale(0, i, j) for j in range(4)] for i in range(4)],
        np.int64,
    )
    Y = np.zeros((16, 16), np.int64)
    for idx in range(16):
        x4, y4 = C._h264_blk_xy(idx)
        res = C._h264_idct4(luma[y4][x4] * ls << 7)
        top = Y[4 * y4 - 1, 4 * x4:4 * x4 + 4] if y4 > 0 else None
        left = Y[4 * y4:4 * y4 + 4, 4 * x4 - 1] if x4 > 0 else None
        m = modes[y4][x4]
        if m == 0:
            pred = np.tile(top, (4, 1))
        elif m == 1:
            pred = np.tile(left, (4, 1)).T
        elif top is not None and left is not None:
            pred = (int(top.sum()) + int(left.sum()) + 4) >> 3
        elif left is not None:
            pred = (int(left.sum()) + 2) >> 2
        elif top is not None:
            pred = (int(top.sum()) + 2) >> 2
        else:
            pred = 128
        Y[4 * y4:4 * y4 + 4, 4 * x4:4 * x4 + 4] = np.clip(
            pred + res, 0, 255
        )
    assert np.array_equal(Y, y.astype(np.int64))
    # modes needing both neighbours are rejected on the top row
    bad = dict(mb)
    bad["modes"] = [[2, 4, 2, 2]] + [list(r) for r in modes[1:]]
    with pytest.raises(ValueError, match="both neighbours"):
        C.encode_h264_i4x4_slice(sps, pps, bad)


def test_i4x4_nine_modes_and_reference_construction():
    """All nine Intra_4x4 modes roundtrip on one picture; the
    constant-field affine property holds per mode (any wrong
    interpolator weight breaks it); and the 8.3.1.2 top-right
    substitution is position-dependent in CODING order: spatial
    (1,1) substitutes t[3] while (2,1) reads real samples."""
    for mode in range(9):
        t = np.full(8, 200, np.int64)
        l = np.full(4, 200, np.int64)
        assert (C._h264_i4x4_predict(mode, t, l, 200) == 200).all(), mode
    # coding-order substitution pin
    assert C._H264_I4_CODING[(2, 0)] > C._H264_I4_CODING[(1, 1)]
    assert C._H264_I4_CODING[(3, 0)] < C._H264_I4_CODING[(2, 1)]
    rng = np.random.RandomState(31)
    modes = [[2] * 4 for _ in range(4)]
    want_modes = iter([1, 2, 8, 0, 3, 7, 2, 0, 4, 5, 6, 3, 7, 8, 2])
    for y4 in range(4):
        for x4 in range(4):
            if (x4, y4) == (0, 0):
                continue
            m = next(want_modes)
            if y4 == 0 and m not in (1, 2, 8):
                m = 2
            if x4 == 0 and m not in (0, 2, 3, 7):
                m = 2
            modes[y4][x4] = m
    luma = np.zeros((4, 4, 4, 4), np.int64)
    for y4 in range(4):
        for x4 in range(4):
            b = rng.randint(0, 256, 16)
            lv = np.where(
                b < 150, 0,
                np.where((b - 150) % 14 < 7, 1, (b - 150) % 14 - 5),
            ) * np.where(b % 2 == 0, 1, -1)
            luma[y4][x4] = lv.reshape(4, 4)
    mb = {"modes": modes, "luma": luma,
          "cb_dc": (rng.randint(0, 256, (2, 2)) % 7 - 3).astype(np.int64),
          "cr_dc": (rng.randint(0, 256, (2, 2)) % 7 - 3).astype(np.int64)}
    sps_rbsp = C.encode_h264_sps(66, 30, 1, 1)
    pps_rbsp = C.encode_h264_pps(0, 0, 16)
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    sl = C.encode_h264_i4x4_slice(sps, pps, mb)
    stream = C.encode_annexb(
        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
    )
    ss, ps = {}, {}
    for nal in C.decode_annexb(stream):
        tt = nal["nal_type"]
        if tt == 7:
            i = C.decode_h264_sps(nal["rbsp"])
            ss[i["sps_id"]] = i
        elif tt == 8:
            i = C.decode_h264_pps(nal["rbsp"])
            ps[i["pps_id"]] = i
        else:
            hdr, y, cb, cr, dm, tc = C.decode_h264_i4x4_slice(
                nal["rbsp"], 5, 3, ps, ss
            )
    assert [list(r) for r in dm] == [list(r) for r in modes]
    # and the m44 fixture draw visits every mode across 60 doc ids
    from table_demo_spark.operators import multimodal as M

    seen = set()
    for doc_id in range(60):
        raw = M._md5_stream(str(doc_id), M._I4_BLOCKS, "#cav7")
        for y4 in range(4):
            for x4 in range(4):
                b0 = raw[(4 * y4 + x4) * 17]
                if (x4, y4) == (0, 0):
                    seen.add(2)
                elif y4 == 0:
                    seen.add((1, 2, 8)[b0 % 3])
                elif x4 == 0:
                    seen.add((0, 2, 3, 7)[b0 % 4])
                else:
                    seen.add(b0 % 9)
    assert seen == set(range(9))


def test_loud_failures():
    mbs = _fixture_mbs(3)
    stream = _encode_stream(mbs)
    # truncation inside slice data fails loudly
    with pytest.raises(ValueError):
        _decode_stream(stream[: len(stream) - 40])
    # non-I16x16 mb_type (e.g. I_PCM 25) is rejected by this decoder
    sps_rbsp = C.encode_h264_sps(66, 30, 4, 1)
    pps_rbsp = C.encode_h264_pps(0, 0, 16)
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    bw = C._ExpGolombWriter()
    C._h264_put_slice_header(
        bw, sps, pps, 7, 0, 0, 0, idr_pic_id=0, poc_lsb=0, nal_ref_idc=3
    )
    bw.ue(25)
    bw.align()
    with pytest.raises(ValueError, match="Intra_16x16"):
        C.decode_h264_i16x16_slice(
            bytes(bw.out), 5, 3, {0: pps}, {0: sps}
        )
    # MB list must cover the SPS grid exactly (raster order)
    sps2 = C.decode_h264_sps(C.encode_h264_sps(66, 30, 2, 2))
    with pytest.raises(ValueError, match="raster order"):
        C.encode_h264_i16x16_slice(sps2, pps, [])


def test_fixture_corpus_travels_every_context():
    """The m39 plant itself (first 50 doc ids) must visit all four
    coeff_token contexts — measured over the full sf0.001 corpus the
    split is roughly 1k/1k/24k/8k visits for ctx 0/1/2/FLC."""
    from table_demo_spark.operators import multimodal as M

    seen = set()
    for doc_id in range(50):
        raw = M._md5_stream(str(doc_id), M._CAVLC_BLOCKS, "#cav")
        nnz_prev = None
        for m in range(4):
            base = m * M._CAVLC_MB_BYTES
            nnz = [[0] * 4 for _ in range(4)]
            for idx in range(16):
                x4, y4 = C._h264_blk_xy(idx)
                n_c = C._h264_nc(nnz, nnz_prev, x4, y4)
                seen.add(3 if n_c >= 8 else C._cavlc_ct_context(n_c))
                o = base + 16 + (4 * y4 + x4) * 15
                nnz[y4][x4] = sum(
                    1 for pos in range(1, 16)
                    if (m, y4, x4, pos) == M._CAVLC_ESC
                    or M._cavlc_level(raw[o + pos - 1]) != 0
                )
            nnz_prev = nnz
    assert seen == {0, 1, 2, 3}


def test_chroma_qp_mapping_table():
    """Table 8-15 pins: identity below 30, the published tail above."""
    assert C.h264_chroma_qp(26) == 26
    assert C.h264_chroma_qp(29) == 29
    assert C.h264_chroma_qp(30) == 29
    assert C.h264_chroma_qp(37) == 34
    assert C.h264_chroma_qp(42) == 37
    assert C.h264_chroma_qp(51) == 39


# -- CABAC entropy layer (r13) ------------------------------------------------


def test_cabac_engine_tables_re_extract_from_system_binaries():
    """The normative-table statement (codecs.py CABAC block comment):
    rangeTabLPS must equal every in-binary copy in BOTH system HEVC
    codecs (H.264 Table 9-44 == HEVC ivlLpsRange), and the
    transIdxLPS/transIdxMPS block must equal libde265's adjacent
    .rodata tables.  A rebuilt container moves offsets, so the scan
    searches by content, not address; zero or divergent copies fail."""
    import glob
    import os

    from table_demo_spark.operators import codecs as C

    range_flat = bytes(v for row in C.H264_RANGE_TAB_LPS for v in row)
    lps = bytes(C.H264_TRANS_IDX_LPS)
    mps = bytes(C.H264_TRANS_IDX_MPS)
    libs = {}
    for pat in ("libde265.so*", "libx265.so*"):
        hits = glob.glob("/usr/lib/x86_64-linux-gnu/" + pat)
        real = {os.path.realpath(p) for p in hits}
        if not real:
            pytest.skip(f"{pat} not in container")
        libs[pat] = sorted(real)
    range_copies = 0
    for paths in libs.values():
        for path in paths:
            data = open(path, "rb").read()
            i = data.find(range_flat[:8])
            found_here = 0
            while i != -1:
                assert data[i : i + 256] == range_flat, (path, i)
                found_here += 1
                i = data.find(range_flat[:8], i + 1)
            assert found_here >= 1, f"no rangeTabLPS copy in {path}"
            range_copies += found_here
    assert range_copies >= 2  # cross-BINARY validation, not one copy
    de265 = open(libs["libde265.so*"][0], "rb").read()
    i = de265.find(lps)
    assert i != -1, "transIdxLPS not found in libde265"
    # the adjacent-table layout: MPS transition table follows LPS
    assert de265.find(mps, i, i + 512) != -1, "transIdxMPS not adjacent"


def test_cabac_arithmetic_engine_roundtrip_property():
    """Engine-level property: random interleavings of context-coded
    decisions (shared evolving states), bypass bins, and non-final
    terminates roundtrip bit-exactly through encode -> flush ->
    decode — including long MPS runs (renorm carry chains) and the
    terminate path's range-2 shrink."""
    import random

    from table_demo_spark.operators import codecs as C

    rng = random.Random(1311)
    for trial in range(40):
        n_ctx = rng.randint(1, 6)
        qp = rng.choice([0, 26, 42, 51])
        ops = []
        for _ in range(rng.randint(1, 400)):
            r = rng.random()
            if r < 0.6:
                ops.append(("d", rng.randrange(n_ctx), rng.randint(0, 1)))
            elif r < 0.9:
                ops.append(("b", None, rng.randint(0, 1)))
            else:
                ops.append(("t", None, 0))
        ops.append(("t", None, 1))  # final terminate flushes

        bw = C._ExpGolombWriter()
        enc = C._CabacEncoder(bw)
        est = [C.cabac_init_state(3 + i, qp) for i in range(n_ctx)]
        for kind, ctx, b in ops:
            if kind == "d":
                enc.decision(est[ctx], b)
            elif kind == "b":
                enc.bypass(b)
            else:
                enc.terminate(b)
        data = bytes(bw.out)

        br = C._BitReader(data)
        dec = C._CabacDecoder(br)
        dst = [C.cabac_init_state(3 + i, qp) for i in range(n_ctx)]
        for k, (kind, ctx, b) in enumerate(ops):
            if kind == "d":
                got = dec.decision(dst[ctx])
            elif kind == "b":
                got = dec.bypass()
            else:
                got = dec.terminate()
            assert got == b, (trial, k, kind, b, got)


def test_cabac_slice_negatives_fail_loudly():
    """VERDICT r12 #2's negative battery: truncation mid-payload,
    zeroed cabac_alignment_one_bit, and the I_NxN / I_PCM escapes
    must raise, never return pixels."""
    import numpy as np

    from table_demo_spark.operators import codecs as C

    sps = C.decode_h264_sps(C.encode_h264_sps(66, 30, 2, 1))
    pps = C.decode_h264_pps(
        C.encode_h264_pps(0, 0, 16, entropy_coding_mode=1)
    )
    rng = np.random.default_rng(9)
    mbs = []
    for _ in range(2):
        ac = np.zeros((4, 4, 4, 4), np.int64)
        ac[1][2].flat[5] = 7
        mbs.append(
            {
                "dc": rng.integers(-2, 3, (4, 4)).astype(np.int64),
                "ac": ac,
                "cb_dc": rng.integers(-3, 4, (2, 2)).astype(np.int64),
                "cr_dc": rng.integers(-3, 4, (2, 2)).astype(np.int64),
            }
        )
    sl = C.encode_h264_i16x16_slice_cabac(sps, pps, mbs)
    stores = ({0: pps}, {0: sps})
    # sanity: intact slice decodes
    _, y, _, _, _ = C.decode_h264_i16x16_slice_cabac(sl, 5, 3, *stores)
    assert y.shape == (16, 32)
    with pytest.raises(ValueError):
        C.decode_h264_i16x16_slice_cabac(sl[: len(sl) // 2], 5, 3, *stores)
    # flip every bit of the first payload byte after the 9-bit init:
    # at least the alignment/mb_type escapes must stay loud — assert
    # that NO corruption of the first two payload bytes can both
    # decode AND change the pixels (silent corruption)
    silent = []
    for byte_i in (3, 4, 5):
        if byte_i >= len(sl):
            break
        for bit in range(8):
            bad = bytearray(sl)
            bad[byte_i] ^= 1 << bit
            try:
                _, y2, cb2, cr2, _ = C.decode_h264_i16x16_slice_cabac(
                    bytes(bad), 5, 3, *stores
                )
            except ValueError:
                continue
            if not np.array_equal(y, y2):
                continue  # decoded differently -> caught by the hash
            silent.append((byte_i, bit))
    # a flipped bit that decodes to the SAME pixels would be a dead
    # bit in the entropy layer — CABAC has none in the header region
    assert not silent, silent
    # CAVLC-marked PPS must be rejected by the CABAC decoder
    pps_cavlc = C.decode_h264_pps(C.encode_h264_pps(0, 0, 16))
    with pytest.raises(ValueError):
        C.decode_h264_i16x16_slice_cabac(sl, 5, 3, {0: pps_cavlc}, {0: sps})


# -- Inter prediction / motion compensation (r13) -----------------------------


def test_h264_mc_properties():
    """8.4.2.2 interpolation pins that need no external decoder:
    zero-MV is an exact copy; full-pel MVs are clamped shifts; every
    fractional position reproduces a CONSTANT field exactly (the
    6-tap weights sum to 32, quarter averages are affine); and the MV
    predictor chain (8.4.1.3) roundtrips arbitrary per-MB vectors."""
    import numpy as np

    from table_demo_spark.operators import codecs as C

    sps = C.decode_h264_sps(C.encode_h264_sps(66, 30, 4, 1))
    pps = C.decode_h264_pps(C.encode_h264_pps(0, 0, 16))
    stores = ({0: pps}, {0: sps})
    rng = np.random.default_rng(1346)
    ref_y = rng.integers(0, 256, (16, 64)).astype(np.uint8)
    ref_cb = rng.integers(0, 256, (8, 32)).astype(np.uint8)
    ref_cr = rng.integers(0, 256, (8, 32)).astype(np.uint8)

    sl = C.encode_h264_p16x16_slice(sps, pps, [(0, 0)] * 4)
    _, y, cb, cr, _ = C.decode_h264_p16x16_slice(
        sl, 0, *stores, ref_y, ref_cb, ref_cr
    )
    assert np.array_equal(y, ref_y)
    assert np.array_equal(cb, ref_cb) and np.array_equal(cr, ref_cr)

    sl = C.encode_h264_p16x16_slice(sps, pps, [(-8, 12)] * 4)
    _, y, _, _, _ = C.decode_h264_p16x16_slice(
        sl, 0, *stores, ref_y, ref_cb, ref_cr
    )
    rows = np.clip(np.arange(16) + 3, 0, 15)
    cols = np.clip(np.arange(64) - 2, 0, 63)
    assert np.array_equal(y, ref_y[np.ix_(rows, cols)])

    const_y = np.full((16, 64), 77, np.uint8)
    const_c = np.full((8, 32), 201, np.uint8)
    for mvx in range(-6, 7, 3):
        for mvy in range(-6, 7, 3):
            for sub in range(4):  # cover every frac class per axis
                mv = (mvx + sub % 4 - 1, mvy + sub // 2)
                sl = C.encode_h264_p16x16_slice(sps, pps, [mv] * 4)
                _, y, cb, cr, got = C.decode_h264_p16x16_slice(
                    sl, 0, *stores, const_y, const_c, const_c
                )
                assert got == [mv] * 4
                assert (y == 77).all() and (cb == 201).all()
                assert (cr == 201).all()

    mvs = [(-12, 5), (9, -3), (0, 12), (-1, -12)]
    sl = C.encode_h264_p16x16_slice(sps, pps, mvs)
    _, _, _, _, got = C.decode_h264_p16x16_slice(
        sl, 0, *stores, ref_y, ref_cb, ref_cr
    )
    assert got == mvs


def test_h264_mc_negatives():
    """Unsupported P-slice shapes fail loudly: truncation, skip runs,
    non-16x16 mb_types, nonzero CBP, and an I slice fed to the P
    decoder."""
    import numpy as np

    from table_demo_spark.operators import codecs as C

    sps = C.decode_h264_sps(C.encode_h264_sps(66, 30, 2, 1))
    pps = C.decode_h264_pps(C.encode_h264_pps(0, 0, 16))
    stores = ({0: pps}, {0: sps})
    ref = (
        np.zeros((16, 32), np.uint8), np.zeros((8, 16), np.uint8),
        np.zeros((8, 16), np.uint8),
    )
    sl = C.encode_h264_p16x16_slice(sps, pps, [(1, 2), (3, 4)])
    with pytest.raises(ValueError):
        C.decode_h264_p16x16_slice(sl[:4], 0, *stores, *ref)
    # hand-build a slice with mb_skip_run 1: ue(1) = '010'
    bw = C._ExpGolombWriter()
    C._h264_put_slice_header(
        bw, sps, pps, 5, 0, 1, 0, idr_pic_id=None, nal_ref_idc=0
    )
    bw.ue(1)
    bw.put(1, 1)
    bw.align()
    with pytest.raises(ValueError):
        C.decode_h264_p16x16_slice(bytes(bw.out), 0, *stores, *ref)
    hdr_i = C.encode_h264_slice_header(sps, pps, 7, 0, 0, 0, idr_pic_id=0)
    with pytest.raises(ValueError):
        C.decode_h264_p16x16_slice(hdr_i, 3, *stores, *ref)


def test_h264_bipred_roundtrip_and_average_math():
    """m53: B_Bi_16x16 roundtrip — decoded MVs match both planted
    lists, and every macroblock equals the independently recomputed
    (predL0 + predL1 + 1) >> 1 of the two 8.4.2.2 interpolations."""
    import numpy as np

    sps = C.decode_h264_sps(C.encode_h264_sps(66, 30, 4, 1))
    pps = C.decode_h264_pps(C.encode_h264_pps(0, 0, 16))
    stores = ({0: pps}, {0: sps})
    rng = np.random.RandomState(0)
    ry = rng.randint(0, 256, (16, 64)).astype(np.uint8)
    rcb = rng.randint(0, 256, (8, 32)).astype(np.uint8)
    rcr = rng.randint(0, 256, (8, 32)).astype(np.uint8)
    mvs01 = [
        ((int(rng.randint(-12, 13)), int(rng.randint(-12, 13))),
         (int(rng.randint(-12, 13)), int(rng.randint(-12, 13))))
        for _ in range(4)
    ]
    rbsp = C.encode_h264_b16x16_slice(sps, pps, mvs01)
    hdr, y, cb, cr, mv0, mv1 = C.decode_h264_b16x16_slice(
        rbsp, 0, *stores, ry, rcb, rcr
    )
    assert hdr["slice_type"] == "B"
    assert mv0 == [p[0] for p in mvs01]
    assert mv1 == [p[1] for p in mvs01]
    for m, (a, b) in enumerate(mvs01):
        oy, ox = 0, 16 * m
        p0 = C.h264_mc_luma(ry, oy, ox, 16, 16, *a)
        p1 = C.h264_mc_luma(ry, oy, ox, 16, 16, *b)
        assert (y[oy:oy + 16, ox:ox + 16] == ((p0 + p1 + 1) >> 1)).all()
        cy, cx = 0, 8 * m
        c0 = C.h264_mc_chroma(rcb, cy, cx, 8, 8, *a)
        c1 = C.h264_mc_chroma(rcb, cy, cx, 8, 8, *b)
        assert (cb[cy:cy + 8, cx:cx + 8] == ((c0 + c1 + 1) >> 1)).all()


def test_h264_bipred_constant_field_affine_property():
    """On a constant reference every interpolator reproduces the
    constant exactly (tap sums are affine), so bipred of any MV pair
    must return the constant — a structural pin on the averaging."""
    import numpy as np

    sps = C.decode_h264_sps(C.encode_h264_sps(66, 30, 2, 1))
    pps = C.decode_h264_pps(C.encode_h264_pps(0, 0, 16))
    stores = ({0: pps}, {0: sps})
    ry = np.full((16, 32), 77, np.uint8)
    rc = np.full((8, 16), 190, np.uint8)
    mvs01 = [((-9, 7), (11, -3)), ((5, 5), (-1, 2))]
    rbsp = C.encode_h264_b16x16_slice(sps, pps, mvs01)
    _, y, cb, cr, _, _ = C.decode_h264_b16x16_slice(
        rbsp, 0, *stores, ry, rc, rc
    )
    assert (y == 77).all() and (cb == 190).all() and (cr == 190).all()


def test_h264_bipred_negatives():
    """B decoder rejects P slices, P decoder rejects B slices, and
    unsupported B mb_types fail loudly."""
    import numpy as np

    sps = C.decode_h264_sps(C.encode_h264_sps(66, 30, 2, 1))
    pps = C.decode_h264_pps(C.encode_h264_pps(0, 0, 16))
    stores = ({0: pps}, {0: sps})
    ref = (
        np.zeros((16, 32), np.uint8), np.zeros((8, 16), np.uint8),
        np.zeros((8, 16), np.uint8),
    )
    psl = C.encode_h264_p16x16_slice(sps, pps, [(1, 2), (3, 4)])
    with pytest.raises(ValueError, match="not a B slice"):
        C.decode_h264_b16x16_slice(psl, 0, *stores, *ref)
    bsl = C.encode_h264_b16x16_slice(
        sps, pps, [((1, 2), (3, 4)), ((0, 0), (5, -5))]
    )
    with pytest.raises(ValueError, match="not a P slice"):
        C.decode_h264_p16x16_slice(bsl, 0, *stores, *ref)
    # hand-build a B slice with mb_type B_L0_16x16 (ue 1): unsupported
    bw = C._ExpGolombWriter()
    C._h264_put_slice_header(
        bw, sps, pps, 1, 0, 2, 0, idr_pic_id=None, nal_ref_idc=0
    )
    bw.ue(0)  # mb_skip_run
    bw.ue(1)  # B_L0_16x16
    bw.se(0)
    bw.se(0)
    bw.ue(0)
    bw.put(1, 1)
    bw.align()
    with pytest.raises(ValueError, match="B_Bi_16x16"):
        C.decode_h264_b16x16_slice(bytes(bw.out), 0, *stores, *ref)
