"""From-spec HEVC (H.265) Main-profile intra-slice decoder, adjudicated
bit-exact against libde265 on REAL x265 bitstreams (llm_m51).

This is the r13 VERDICT "Next round #3" item: m49 walked HEVC container
STRUCTURE (ISOBMFF/hvcC/SPS) over real x265 output; this module decodes
the slice DATA — CABAC entropy layer, coding quadtree, intra
prediction, transform trees, residual coding, dequant + inverse
DCT/DST, reconstruction — entirely from the H.265 spec text, and the
in-container third-party decoder (libde265 via libheif) adjudicates
every pixel.  That is the m31/VP8-vs-libwebp pattern with the strongest
possible epistemics: the encoder (x265) and the reference decoder
(libde265) are independent codebases, and OUR decoder is a third
independent implementation — any context-table misrecall, scan-order
slip, or transform-orientation bug desynchronizes the arithmetic
decoder or the reconstruction and shows up as a pixel diff immediately.

Deliberately out of scope (fail loudly, documented): P/B slices, SAO,
tiles/WPP entry points, dependent slice segments, scaling lists,
transform_skip, transquant_bypass, PCM, 4:2:2/4:4:4, >8-bit.
DEBLOCKING is IN scope since r14 (llm_m55): the full 8.7.2 filter
runs when the stream signals it and the caller opts in
(allow_deblock=True); streams signalling deblocking still fail loudly
on the default path, and the beta'/tc' tables are .rodata-extracted,
never recalled (see the table block below).

The CABAC *engine* (range subdivision, renormalization, bypass,
terminate) is byte-identical to H.264's — r13 extracted ivlLpsRange /
transIdxLps / transIdxMps from libde265+libx265 .rodata and verified
all four in-binary copies agree (operators/codecs.py CABAC block
comment) — so this module reuses codecs._CabacDecoder verbatim.  What
is HEVC-specific is the context INIT (9.3.2.2: slope/offset nibbles)
and the init VALUES (Tables 9-5..9-32), which are declared below and
cross-checked against libde265's .rodata by
tests/test_hevc_decode.py::test_hevc_init_values_match_libde265_rodata
(exact-substring search for each [3][N] table — libde265's
contextmodel.cc lays them out in spec order).

Reference parity notes: the reference demo has no video path; this is
part of the LLM-pipeline multimodal extension (SURVEY.md §2 m-family).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from table_demo_spark.operators.codecs import (
    _BitReader,
    _CabacDecoder,
    _expgolomb_se,
    _expgolomb_ue,
    h264_unescape_rbsp,
    isobmff_find,
    parse_hvcc,
)

# ---------------------------------------------------------------------------
# Context-variable init values, H.265 Tables 9-5..9-32, laid out
# [initType 0 (I), initType 1, initType 2] x [ctxIdx 0..N-1] exactly as
# the spec prints them (and as libde265 contextmodel.cc embeds them —
# the .rodata test searches these concatenated rows byte-for-byte).
# Only elements our constrained I-slices exercise are declared; an
# element absent here cannot be reached without first hitting one of
# the loud ValueError guards below.
# ---------------------------------------------------------------------------

HEVC_CTX_INIT = {
    "split_cu_flag": (
        (139, 141, 157),
        (107, 139, 126),
        (107, 139, 126),
    ),
    "part_mode": ((184,), (154, 139, 154, 154), (154, 139, 154, 154)),
    "sao_merge_flag": ((153,), (153,), (153,)),
    "sao_type_idx": ((200,), (185,), (160,)),
    "prev_intra_luma_pred_flag": ((184,), (154,), (183,)),
    "intra_chroma_pred_mode": ((63,), (152,), (152,)),
    "split_transform_flag": (
        (153, 138, 138),
        (124, 138, 94),
        (224, 167, 122),
    ),
    "cbf_luma": ((111, 141), (153, 111), (153, 111)),
    "cbf_chroma": (
        (94, 138, 182, 154),
        (149, 107, 167, 154),
        (149, 92, 167, 154),
    ),
    "last_sig_coeff_x_prefix": (
        (110, 110, 124, 125, 140, 153, 125, 127, 140,
         109, 111, 143, 127, 111, 79, 108, 123, 63),
        (125, 110, 94, 110, 95, 79, 125, 111, 110,
         78, 110, 111, 111, 95, 94, 108, 123, 108),
        (125, 110, 124, 110, 95, 94, 125, 111, 111,
         79, 125, 126, 111, 111, 79, 108, 123, 93),
    ),
    # Table 9-16: last_sig_coeff_y_prefix rows are identical to x's.
    "last_sig_coeff_y_prefix": (
        (110, 110, 124, 125, 140, 153, 125, 127, 140,
         109, 111, 143, 127, 111, 79, 108, 123, 63),
        (125, 110, 94, 110, 95, 79, 125, 111, 110,
         78, 110, 111, 111, 95, 94, 108, 123, 108),
        (125, 110, 124, 110, 95, 94, 125, 111, 111,
         79, 125, 126, 111, 111, 79, 108, 123, 93),
    ),
    "coded_sub_block_flag": (
        (91, 171, 134, 141),
        (121, 140, 61, 154),
        (121, 140, 61, 154),
    ),
    "sig_coeff_flag": (
        (111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141,
         179, 153, 125, 107, 125, 141, 179, 153, 125, 107, 125, 141,
         179, 153, 125, 140, 139, 182, 182, 152, 136, 152, 136, 153,
         136, 139, 111, 136, 139, 111),
        (155, 154, 139, 153, 139, 123, 123, 63, 153, 166, 183, 140,
         136, 153, 154, 166, 183, 140, 136, 153, 154, 166, 183, 140,
         136, 153, 154, 170, 153, 123, 123, 107, 121, 107, 121, 167,
         151, 183, 140, 151, 183, 140),
        (170, 154, 139, 153, 139, 123, 123, 63, 124, 166, 183, 140,
         136, 153, 154, 166, 183, 140, 136, 153, 154, 166, 183, 140,
         136, 153, 154, 170, 153, 138, 138, 122, 121, 122, 121, 167,
         151, 183, 140, 151, 183, 140),
    ),
    "coeff_abs_level_greater1": (
        (140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92,
         139, 107, 122, 152, 140, 179, 166, 182, 140, 227, 122, 197),
        (154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149, 136,
         153, 121, 136, 137, 169, 194, 166, 167, 154, 167, 137, 182),
        (154, 196, 167, 167, 154, 152, 167, 182, 182, 134, 149, 136,
         153, 121, 136, 122, 169, 208, 166, 167, 154, 152, 167, 182),
    ),
    "coeff_abs_level_greater2": (
        (138, 153, 136, 167, 152, 152),
        (107, 167, 91, 122, 107, 167),
        (107, 167, 91, 107, 107, 167),
    ),
    "cu_qp_delta_abs": ((154, 154), (154, 154), (154, 154)),
    # -- inter elements (llm_m58, P slices) ---------------------------
    # Spec prints no initType-0 column for these (I slices cannot code
    # them); the 154 (CNU) placeholders below are what x265's own
    # .rodata stores in the unused I rows, and the initType-1/2 values
    # are EXTRACTED-VERIFIED: every (B,P,I) triple appears contiguously
    # in libx265's init block adjacent to the known intra tables
    # (tests/test_hevc_decode.py pins the multi-element neighbourhood
    # byte strings per the r14 single-value-context rule).
    "cu_skip_flag": (
        (154, 154, 154),
        (197, 185, 201),
        (197, 185, 201),
    ),
    "pred_mode_flag": ((154,), (149,), (134,)),
    "merge_flag": ((154,), (110,), (154,)),
    "merge_idx": ((154,), (122,), (137,)),
    "mvp_flag": ((154,), (168,), (168,)),
    "abs_mvd_greater0": ((154,), (140,), (169,)),
    "abs_mvd_greater1": ((154,), (198,), (198,)),
    "ref_idx": ((154, 154), (153, 153), (153, 153)),
    "rqt_root_cbf": ((154,), (79,), (79,)),
    "inter_pred_idc": (
        (154, 154, 154, 154, 154),
        (95, 79, 63, 31, 31),
        (95, 79, 63, 31, 31),
    ),
}


def _clip3(lo: int, hi: int, v: int) -> int:
    return lo if v < lo else hi if v > hi else v


def hevc_init_state(init_value: int, qp: int) -> list:
    """9.3.2.2: [pStateIdx, valMps] from the packed slope/offset
    nibbles at SliceQpY (H.264 carries explicit (m, n) pairs instead;
    the downstream state machine is shared)."""
    m = (init_value >> 4) * 5 - 45
    n = ((init_value & 15) << 3) - 16
    pre = _clip3(1, 126, ((m * _clip3(0, 51, qp)) >> 4) + n)
    if pre <= 63:
        return [63 - pre, 0]
    return [pre - 64, 1]


_CTX_TEMPLATES: dict = {}


class _Ctx:
    """Per-slice context variables: one [pStateIdx, valMps] list per
    (element, ctxInc), initialised eagerly at SliceQpY with initType 0
    (I slices — 9.3.2.2 Table 9-4).  The 9.3.2.2 init math is a pure
    function of (qp, init_type), so the computed table is memoized
    once per pair and each slice takes a fresh mutable copy."""

    def __init__(self, qp: int, init_type: int = 0) -> None:
        key = (qp, init_type)
        tmpl = _CTX_TEMPLATES.get(key)
        if tmpl is None:
            tmpl = _CTX_TEMPLATES[key] = {
                name: [hevc_init_state(v, qp) for v in rows[init_type]]
                for name, rows in HEVC_CTX_INIT.items()
            }
        self.states = {
            name: [s.copy() for s in rows] for name, rows in tmpl.items()
        }

    def get(self, name: str, inc: int) -> list:
        return self.states[name][inc]


# ---------------------------------------------------------------------------
# Parameter-set and slice-header parsing (7.3.2.2, 7.3.2.3, 7.3.6.1).
# ---------------------------------------------------------------------------


def parse_hevc_sps_full(nal: bytes) -> dict:
    """Full SPS walk (7.3.2.2.1) through the coding/transform block
    geometry and tool flags the slice decoder needs.  VUI and
    extensions are not walked (nothing after
    strong_intra_smoothing_enabled_flag affects decode here)."""
    if len(nal) < 2 or ((nal[0] >> 1) & 0x3F) != 33:
        raise ValueError("HEVC: not an SPS NAL")
    rbsp = h264_unescape_rbsp(nal[2:])
    br = _BitReader(rbsp)
    out = {"vps_id": br.bits(4)}
    max_sub = br.bits(3)
    br.bits(1)
    br.bits(2 + 1 + 5)  # profile space/tier/idc
    br.bits(32)  # compat flags
    br.bits(4)
    br.bits(32)
    br.bits(11)
    br.bits(1)
    out["level_idc"] = br.bits(8)
    if max_sub:
        raise ValueError("HEVC: sub-layer PTL entries unsupported")
    out["sps_id"] = _expgolomb_ue(br)
    out["chroma_format_idc"] = _expgolomb_ue(br)
    if out["chroma_format_idc"] != 1:
        raise ValueError("HEVC: only 4:2:0 supported")
    out["pic_w"] = _expgolomb_ue(br)
    out["pic_h"] = _expgolomb_ue(br)
    if br.bits(1):
        out["crop_l"] = _expgolomb_ue(br)
        out["crop_r"] = _expgolomb_ue(br)
        out["crop_t"] = _expgolomb_ue(br)
        out["crop_b"] = _expgolomb_ue(br)
    else:
        out["crop_l"] = out["crop_r"] = out["crop_t"] = out["crop_b"] = 0
    out["bit_depth_luma"] = _expgolomb_ue(br) + 8
    out["bit_depth_chroma"] = _expgolomb_ue(br) + 8
    if out["bit_depth_luma"] != 8 or out["bit_depth_chroma"] != 8:
        raise ValueError("HEVC: only 8-bit supported")
    out["log2_max_poc_lsb"] = _expgolomb_ue(br) + 4
    sub_ordering = br.bits(1)
    for _ in range((max_sub + 1) if sub_ordering else 1):
        _expgolomb_ue(br)
        _expgolomb_ue(br)
        _expgolomb_ue(br)
    out["log2_min_cb"] = _expgolomb_ue(br) + 3
    out["log2_ctb"] = out["log2_min_cb"] + _expgolomb_ue(br)
    out["log2_min_tb"] = _expgolomb_ue(br) + 2
    out["log2_max_tb"] = out["log2_min_tb"] + _expgolomb_ue(br)
    out["max_trafo_depth_inter"] = _expgolomb_ue(br)
    out["max_trafo_depth_intra"] = _expgolomb_ue(br)
    if br.bits(1):
        raise ValueError("HEVC: scaling lists unsupported")
    out["amp_enabled"] = br.bits(1)
    out["sao_enabled"] = br.bits(1)
    if br.bits(1):
        raise ValueError("HEVC: PCM unsupported")
    num_st_rps = _expgolomb_ue(br)
    out["st_rps"] = _parse_st_ref_pic_sets(br, num_st_rps)
    out["long_term_ref_pics"] = br.bits(1)
    if out["long_term_ref_pics"]:
        n = _expgolomb_ue(br)
        for _ in range(n):
            br.bits(out["log2_max_poc_lsb"])
            br.bits(1)
    out["temporal_mvp_enabled"] = br.bits(1)
    out["strong_intra_smoothing"] = br.bits(1)
    return out


def _parse_st_ref_pic_sets(br: _BitReader, num: int) -> list[dict]:
    """7.3.7 st_ref_pic_set walk.  Direct (non-inter) sets parse
    fully into {"neg": [(delta_poc, used), ...], "pos": [...]};
    inter_rps-predicted sets are size-tracked (the bit walk the SPS
    needs) and returned as {"inter": True} — a slice that actually
    REFERENCES one fails loudly downstream (x265 under the m58 pins
    emits direct sets only, and the still path emits none)."""
    sets: list[dict] = []
    n_pics = []
    for idx in range(num):
        inter = br.bits(1) if idx else 0
        if inter:
            br.bits(1)  # delta_rps_sign
            _expgolomb_ue(br)  # abs_delta_rps_minus1
            total = 0
            for _ in range(n_pics[idx - 1] + 1):
                used = br.bits(1)
                if not used:
                    if br.bits(1):
                        total += 1
                else:
                    total += 1
            n_pics.append(total - 1 if total else 0)
            sets.append({"inter": True})
        else:
            cur = _parse_direct_st_rps(br)
            n_pics.append(len(cur["neg"]) + len(cur["pos"]))
            sets.append(cur)
    return sets


def _parse_direct_st_rps(br: _BitReader) -> dict:
    """Direct (non-inter) st_ref_pic_set body: delta_poc entries are
    coded as successive differences — the stored values are the
    CUMULATIVE POC deltas (DeltaPocS0/S1 of 7.4.8)."""
    neg = _expgolomb_ue(br)
    pos = _expgolomb_ue(br)
    cur: dict = {"neg": [], "pos": []}
    for lst, n in (("neg", neg), ("pos", pos)):
        total = 0
        for _ in range(n):
            total += _expgolomb_ue(br) + 1
            used = br.bits(1)
            cur[lst].append((total, used))
    return cur


def _parse_st_ref_pic_sets_slice(
    br: _BitReader, sps_sets: list[dict]
) -> dict:
    """st_ref_pic_set(num_st_rps) coded inline in a slice header
    (7.3.6.1): stRpsIdx == num_st_rps, so the inter_rps flag is
    present iff the SPS carries any sets (x265 under the m58 pins
    emits zero SPS sets and a direct inline set)."""
    if sps_sets and br.bits(1):
        raise ValueError("HEVC: inter-predicted slice RPS unsupported")
    return _parse_direct_st_rps(br)


def parse_hevc_pps(nal: bytes) -> dict:
    """PPS walk (7.3.2.3.1) through the flags the slice decoder
    consumes; tiles/WPP/scaling-list arms fail loudly."""
    if len(nal) < 2 or ((nal[0] >> 1) & 0x3F) != 34:
        raise ValueError("HEVC: not a PPS NAL")
    rbsp = h264_unescape_rbsp(nal[2:])
    br = _BitReader(rbsp)
    out = {
        "pps_id": _expgolomb_ue(br),
        "sps_id": _expgolomb_ue(br),
        "dependent_slices": br.bits(1),
        "output_flag_present": br.bits(1),
        "extra_slice_header_bits": br.bits(3),
        "sign_data_hiding": br.bits(1),
        "cabac_init_present": br.bits(1),
    }
    out["num_ref_idx_l0_default"] = _expgolomb_ue(br) + 1
    out["num_ref_idx_l1_default"] = _expgolomb_ue(br) + 1
    out["init_qp"] = 26 + _expgolomb_se(br)
    out["constrained_intra_pred"] = br.bits(1)
    out["transform_skip_enabled"] = br.bits(1)
    out["cu_qp_delta_enabled"] = br.bits(1)
    if out["cu_qp_delta_enabled"]:
        out["diff_cu_qp_delta_depth"] = _expgolomb_ue(br)
    out["cb_qp_offset"] = _expgolomb_se(br)
    out["cr_qp_offset"] = _expgolomb_se(br)
    out["slice_chroma_qp_offsets_present"] = br.bits(1)
    out["weighted_pred"] = br.bits(1)
    out["weighted_bipred"] = br.bits(1)
    out["transquant_bypass_enabled"] = br.bits(1)
    tiles = br.bits(1)
    out["entropy_coding_sync"] = br.bits(1)
    if tiles:
        raise ValueError("HEVC: tiles unsupported")
    out["loop_filter_across_slices"] = br.bits(1)
    out["deblocking_control_present"] = br.bits(1)
    if out["deblocking_control_present"]:
        out["deblocking_override_enabled"] = br.bits(1)
        out["deblocking_disabled"] = br.bits(1)
        if not out["deblocking_disabled"]:
            out["beta_offset"] = _expgolomb_se(br) * 2
            out["tc_offset"] = _expgolomb_se(br) * 2
    else:
        out["deblocking_override_enabled"] = 0
        out["deblocking_disabled"] = 0
    if br.bits(1):
        raise ValueError("HEVC: PPS scaling lists unsupported")
    out["lists_modification_present"] = br.bits(1)
    out["log2_parallel_merge_level"] = 2 + _expgolomb_ue(br)
    out["slice_header_extension_present"] = br.bits(1)
    return out


def parse_hevc_slice_header(
    nal: bytes, sps: dict, pps: dict
) -> tuple[dict, _BitReader]:
    """Slice segment header (7.3.6.1) for IRAP I slices and (since
    llm_m58) TRAIL P slices; returns the header dict and a
    _BitReader positioned at the first slice-data byte (the CABAC
    payload begins byte-aligned after byte_alignment())."""
    nal_type = (nal[0] >> 1) & 0x3F
    if nal_type not in (0, 1, 19, 20, 21):
        raise ValueError(f"HEVC: unsupported slice NAL type {nal_type}")
    irap = nal_type >= 16
    rbsp = h264_unescape_rbsp(nal[2:])
    br = _BitReader(rbsp)
    hdr = {"nal_type": nal_type, "first_slice": br.bits(1)}
    if not hdr["first_slice"]:
        raise ValueError("HEVC: multi-slice pictures unsupported")
    if irap:
        br.bits(1)  # no_output_of_prior_pics_flag (16 <= type <= 23)
    hdr["pps_id"] = _expgolomb_ue(br)
    if hdr["pps_id"] != pps["pps_id"]:
        raise ValueError("HEVC: slice references an unknown PPS")
    for _ in range(pps["extra_slice_header_bits"]):
        br.bits(1)
    hdr["slice_type"] = _expgolomb_ue(br)
    if hdr["slice_type"] not in (0, 1, 2):
        raise ValueError("HEVC: invalid slice type")
    if hdr["slice_type"] == 2 and not irap:
        raise ValueError("HEVC: trailing I slices unsupported")
    if hdr["slice_type"] != 2 and irap:
        raise ValueError("HEVC: inter slice in an IRAP NAL")
    if pps["output_flag_present"]:
        br.bits(1)
    if nal_type == 21:  # CRA carries POC + RPS
        raise ValueError("HEVC: CRA slice headers unsupported")
    if not irap:
        hdr["poc_lsb"] = br.bits(sps["log2_max_poc_lsb"])
        if br.bits(1):  # short_term_ref_pic_set_sps_flag
            n_sets = len(sps["st_rps"])
            if n_sets == 0:
                raise ValueError("HEVC: RPS index with no SPS sets")
            bits = (n_sets - 1).bit_length()  # ceil(log2(n_sets))
            idx = br.bits(bits) if bits else 0
            rps = sps["st_rps"][idx]
        else:
            rps = _parse_st_ref_pic_sets_slice(br, sps["st_rps"])
        if rps.get("inter"):
            raise ValueError(
                "HEVC: inter-predicted ref pic set unsupported"
            )
        hdr["rps"] = rps
        # sps long_term flag was parsed (and its entries rejected are
        # impossible: parse_hevc_sps_full walks them) — x265 under the
        # m58 pins never emits long-term pics, and the SPS carries the
        # flag; slice-level lt entries only exist when it is set.
        if sps.get("long_term_ref_pics", 0):
            raise ValueError("HEVC: long-term ref pics unsupported")
        if sps["temporal_mvp_enabled"]:
            hdr["tmvp"] = br.bits(1)
    hdr["sao_luma"] = hdr["sao_chroma"] = 0
    if sps["sao_enabled"]:
        hdr["sao_luma"] = br.bits(1)
        hdr["sao_chroma"] = br.bits(1)
    hdr["cabac_init_flag"] = 0
    hdr["max_merge"] = 0
    hdr["n_ref_l0"] = 0
    hdr["n_ref_l1"] = 0
    hdr["mvd_l1_zero"] = 0
    hdr.setdefault("tmvp", 0)
    if hdr["slice_type"] in (0, 1):
        n_l0 = pps["num_ref_idx_l0_default"]
        n_l1 = pps["num_ref_idx_l1_default"]
        if br.bits(1):  # num_ref_idx_active_override_flag
            n_l0 = _expgolomb_ue(br) + 1
            if hdr["slice_type"] == 0:
                n_l1 = _expgolomb_ue(br) + 1
        hdr["n_ref_l0"] = n_l0
        hdr["n_ref_l1"] = n_l1 if hdr["slice_type"] == 0 else 0
        used = [d for d, u in hdr["rps"]["neg"] if u] + [
            d for d, u in hdr["rps"]["pos"] if u
        ]
        if pps["lists_modification_present"] and len(used) > 1:
            raise ValueError("HEVC: ref list modification unsupported")
        if hdr["slice_type"] == 0:
            hdr["mvd_l1_zero"] = br.bits(1)
        if pps["cabac_init_present"]:
            hdr["cabac_init_flag"] = br.bits(1)
        hdr["col_from_l0"] = 1
        if hdr.get("tmvp"):
            if hdr["slice_type"] == 0:
                hdr["col_from_l0"] = br.bits(1)
            n_col = (
                hdr["n_ref_l0"] if hdr["col_from_l0"] else hdr["n_ref_l1"]
            )
            if n_col > 1:
                hdr["col_ref_idx"] = _expgolomb_ue(br)
                if hdr["col_ref_idx"] != 0:
                    raise ValueError(
                        "HEVC: nonzero collocated_ref_idx unsupported"
                    )
        if hdr["slice_type"] == 1 and pps["weighted_pred"]:
            raise ValueError("HEVC: weighted prediction unsupported")
        if hdr["slice_type"] == 0 and pps["weighted_bipred"]:
            raise ValueError("HEVC: weighted biprediction unsupported")
        hdr["max_merge"] = 5 - _expgolomb_ue(br)
        if not 1 <= hdr["max_merge"] <= 5:
            raise ValueError("HEVC: invalid MaxNumMergeCand")
    hdr["slice_qp"] = pps["init_qp"] + _expgolomb_se(br)
    hdr["cb_qp_offset"] = pps["cb_qp_offset"]
    hdr["cr_qp_offset"] = pps["cr_qp_offset"]
    if pps["slice_chroma_qp_offsets_present"]:
        hdr["cb_qp_offset"] += _expgolomb_se(br)
        hdr["cr_qp_offset"] += _expgolomb_se(br)
    deblock_disabled = pps["deblocking_disabled"]
    beta_off = pps.get("beta_offset", 0)
    tc_off = pps.get("tc_offset", 0)
    if pps["deblocking_control_present"] and pps["deblocking_override_enabled"]:
        if br.bits(1):  # deblocking_filter_override_flag
            deblock_disabled = br.bits(1)
            if not deblock_disabled:
                beta_off = _expgolomb_se(br) * 2
                tc_off = _expgolomb_se(br) * 2
    hdr["deblock_disabled"] = deblock_disabled
    hdr["beta_offset"] = beta_off
    hdr["tc_offset"] = tc_off
    if pps["loop_filter_across_slices"] and (
        hdr["sao_luma"] or hdr["sao_chroma"] or not deblock_disabled
    ):
        # slice_loop_filter_across_slices_enabled_flag is present iff
        # any in-loop filter is active for this slice
        br.bits(1)
    if pps["entropy_coding_sync"]:
        n = _expgolomb_ue(br)  # num_entry_point_offsets
        if n:
            raise ValueError("HEVC: WPP entry points unsupported")
    if pps["slice_header_extension_present"]:
        n = _expgolomb_ue(br)
        for _ in range(n):
            br.bits(8)
    if br.bits(1) != 1:
        raise ValueError("HEVC: alignment_bit_equal_to_one is 0")
    while br.bitpos % 8:
        if br.bits(1):
            raise ValueError("HEVC: alignment_bit_equal_to_zero is 1")
    return hdr, br


# ---------------------------------------------------------------------------
# Scan orders (6.5.3/6.5.4) and transform matrices (8.6.4.1).
# ---------------------------------------------------------------------------


# 9.3.4.2.5 ctxIdxMap for 4x4 TBs, indexed (yp << 2) + xp — shared by
# the pure _sig_ctx below and the native kernel (passed, not retyped).
_SIG_CTX_MAP4 = (0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8)


def _diag_scan(n: int) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    x = y = 0
    while len(out) < n * n:
        while y >= 0:
            if x < n and y < n:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
    return out


def _scan_order(n: int, idx: int) -> list[tuple[int, int]]:
    if idx == 0:
        return _diag_scan(n)
    if idx == 1:  # horizontal
        return [(x, y) for y in range(n) for x in range(n)]
    return [(x, y) for x in range(n) for y in range(n)]  # vertical


_SCAN_CACHE: dict[tuple[int, int], list[tuple[int, int]]] = {}


def _scan(n: int, idx: int) -> list[tuple[int, int]]:
    key = (n, idx)
    if key not in _SCAN_CACHE:
        _SCAN_CACHE[key] = _scan_order(n, idx)
    return _SCAN_CACHE[key]


# ---------------------------------------------------------------------------
# Native residual kernel (operators/_hevc_native.py): the C port of the
# residual_coding syntax block, measured at ~72% of the from-spec decode
# after the r15 pure-Python engine work.  Tables are handed over from
# the SAME Python objects the pure path uses; context states for the six
# residual-only families are snapshotted into a per-slice byte buffer on
# first use (no other syntax element reads or writes those families).
# Set TDS_HEVC_NATIVE=0 (or flip HEVC_NATIVE_RESIDUAL) to force the
# pure-Python path — the A/B equivalence test does exactly that.
# ---------------------------------------------------------------------------

HEVC_NATIVE_RESIDUAL = os.environ.get("TDS_HEVC_NATIVE", "1") != "0"
_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)

# (family, state count) pairs, in the byte-buffer order the C kernel's
# CS_* offsets assume.
_RES_CTX_LAYOUT = (
    ("last_sig_coeff_x_prefix", 18),
    ("last_sig_coeff_y_prefix", 18),
    ("coded_sub_block_flag", 4),
    ("sig_coeff_flag", 42),
    ("coeff_abs_level_greater1", 24),
    ("coeff_abs_level_greater2", 6),
)
_RES_CTX_STATES = sum(n for _, n in _RES_CTX_LAYOUT)

_NATIVE_LIB = None
_NATIVE_TRIED = False


def _native_lib():
    """The compiled residual kernel with tables installed, or None
    (pure-Python fallback) when building/loading is impossible."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from table_demo_spark.operators import _hevc_native
            from table_demo_spark.operators.codecs import (
                _RANGE_LPS_FLAT,
                H264_TRANS_IDX_LPS,
                H264_TRANS_IDX_MPS,
            )

            lib = _hevc_native.get_lib()
            if lib is not None:
                scans = bytearray()
                for log2 in range(4):
                    nn = 1 << log2
                    for idx in range(3):
                        pts = [(0, 0)] if nn == 1 else _scan(nn, idx)
                        scans.extend((y << 4) | x for x, y in pts)
                lib.hevcres_set_tables(
                    bytes(_RANGE_LPS_FLAT),
                    bytes(H264_TRANS_IDX_LPS),
                    bytes(H264_TRANS_IDX_MPS),
                    bytes(_SIG_CTX_MAP4),
                    bytes(scans),
                    len(scans),
                )
                luma = (ctypes.c_int64 * 24)(
                    *(v for f in (1, 2, 3) for v in HEVC_LUMA_FILTER[f])
                )
                chroma = (ctypes.c_int64 * 28)(
                    *(
                        v
                        for f in (1, 2, 3, 4, 5, 6, 7)
                        for v in HEVC_CHROMA_FILTER[f]
                    )
                )
                lib.hevcres_set_mc_filters(luma, chroma)

                def _mat(m):
                    flat = np.ascontiguousarray(m, np.int64).reshape(-1)
                    return (ctypes.c_int64 * flat.size)(*flat.tolist())

                lib.hevcres_set_tx(
                    (ctypes.c_int64 * 6)(*_LEVEL_SCALE),
                    _mat(_transform_matrix(4, False)),
                    _mat(_transform_matrix(8, False)),
                    _mat(_transform_matrix(16, False)),
                    _mat(_transform_matrix(32, False)),
                    _mat(_DST4),
                )
                lib.hevcres_set_intra(
                    (ctypes.c_int64 * 33)(*_PRED_ANGLE),
                    (ctypes.c_int64 * 33)(
                        *(_INV_ANGLE.get(a, 0) for a in _PRED_ANGLE)
                    ),
                )
                _NATIVE_LIB = lib
        except Exception:
            _NATIVE_LIB = None
    return _NATIVE_LIB


def _mc_native_ok(ref: np.ndarray) -> bool:
    """The C MC kernels assume the reference plane layout the inter
    decoder constructs (C-contiguous int64); anything else falls back
    to the pure path rather than risking a stride misread."""
    return ref.dtype == np.int64 and ref.flags.c_contiguous


def _res_ctx_buf(ctx: "_Ctx"):
    """Snapshot the six residual context families into the per-slice
    C state buffer (pairs of [pStateIdx, valMps] int8s).  After this,
    the Python-side lists for THESE families are stale by design —
    _residual is their only reader/writer, and once a slice has gone
    native it stays native (the buffer is cached on the ctx)."""
    buf = getattr(ctx, "_res_nbuf", None)
    if buf is None:
        buf = (ctypes.c_int8 * (2 * _RES_CTX_STATES))()
        k = 0
        for name, cnt in _RES_CTX_LAYOUT:
            states = ctx.states[name]
            for s, mps in states:
                buf[k] = s
                buf[k + 1] = mps
                k += 2
        ctx._res_nbuf = buf
    return buf


_DCT_ODD = {
    4: (83, 36),
    8: (89, 75, 50, 18),
    16: (90, 87, 80, 70, 57, 43, 25, 9),
    32: (90, 90, 88, 85, 82, 78, 73, 67,
         61, 54, 46, 38, 31, 22, 13, 4),
}


def _dct_matrix(n: int) -> np.ndarray:
    """HEVC integer DCT basis (8.6.4.2 transMatrix): even rows recurse
    into the half-size matrix (symmetric under reversal), odd rows
    fold the hand-tuned Table coefficients through the cosine
    quadrants — reproduces the normative matrices exactly from the
    four published odd-coefficient vectors."""
    if n == 2:
        return np.array([[64, 64], [64, -64]], np.int64)
    half = _dct_matrix(n // 2)
    c = _DCT_ODD[n]
    t = np.zeros((n, n), np.int64)
    for k in range(n // 2):
        for j in range(n // 2):
            t[2 * k][j] = half[k][j]
            t[2 * k][n - 1 - j] = half[k][j]
        for j in range(n):
            a = (2 * j + 1) * (2 * k + 1)
            m = a % (4 * n)
            if m > 2 * n:
                m = 4 * n - m
            sign = 1
            if m > n:
                m = 2 * n - m
                sign = -1
            t[2 * k + 1][j] = sign * c[(m - 1) // 2]
    return t


_DST4 = np.array(
    [
        [29, 55, 74, 84],
        [74, 74, 0, -74],
        [84, -29, -74, 55],
        [55, -84, 74, -29],
    ],
    np.int64,
)

_DCT_CACHE: dict[int, np.ndarray] = {}


def _transform_matrix(n: int, dst: bool) -> np.ndarray:
    if dst:
        return _DST4
    if n not in _DCT_CACHE:
        _DCT_CACHE[n] = _dct_matrix(n)
    return _DCT_CACHE[n]


_LEVEL_SCALE = (40, 45, 51, 57, 64, 72)

# Table 8-10: chroma QP mapping for 4:2:0.
_CHROMA_QP = tuple(
    list(range(30)) + [29, 30, 31, 32, 33, 33, 34, 34, 35, 35,
                       36, 36, 37, 37] + [qp - 6 for qp in range(44, 58)]
)

# 8.4.4.2.6 Table 8-4/8-5: intraPredAngle and invAngle by mode.
_PRED_ANGLE = (
    32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26,
    -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26, 32,
)  # indexed by mode-2 for modes 2..34
_INV_ANGLE = {
    -2: -4096, -5: -1638, -9: -910, -13: -630, -17: -482,
    -21: -390, -26: -315, -32: -256,
}


def _dequant(levels: np.ndarray, qp: int, log2_size: int) -> np.ndarray:
    """8.6.3 with flat (m=16) scaling: bdShift = BitDepth + log2 - 5,
    16-bit clip."""
    bd_shift = 8 + log2_size - 5
    scaled = (
        levels.astype(np.int64) * (16 * _LEVEL_SCALE[qp % 6])
        << (qp // 6)
    )
    d = (scaled + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767)


def _inverse_transform(coeff: np.ndarray, dst: bool) -> np.ndarray:
    """8.6.4.2 two-stage inverse: vertical pass (shift 7, 16-bit
    clip), then horizontal pass (shift 20 - BitDepth = 12).  coeff is
    indexed [y][x]."""
    n = coeff.shape[0]
    t = _transform_matrix(n, dst)
    e = (t.T @ coeff + 64) >> 7
    e = np.clip(e, -32768, 32767)
    return (e @ t + 2048) >> 12


# ---------------------------------------------------------------------------
# The slice decoder.
# ---------------------------------------------------------------------------


class HevcIntraSliceDecoder:
    """Decodes one IRAP I-slice to YCbCr 4:2:0 planes, spec clauses
    cited per method.  Reconstruction is in-loop-filter-free by
    construction (the slice header parse rejects SAO/deblock slices),
    so the decoded planes are directly comparable to libde265's
    output for the same constraints."""

    def __init__(self, sps: dict, pps: dict, hdr: dict) -> None:
        self.sps = sps
        self.pps = pps
        self.qp = hdr["slice_qp"]
        self.qp_cb_off = hdr["cb_qp_offset"]
        self.qp_cr_off = hdr["cr_qp_offset"]
        self.w = sps["pic_w"]
        self.h = sps["pic_h"]
        self.log2_ctb = sps["log2_ctb"]
        self.log2_min_cb = sps["log2_min_cb"]
        if self.w % (1 << self.log2_min_cb) or self.h % (
            1 << self.log2_min_cb
        ):
            raise ValueError("HEVC: picture not MinCb-aligned")
        self.y = np.zeros((self.h, self.w), np.int64)
        cw, ch = (self.w + 1) // 2, (self.h + 1) // 2
        self.cb = np.zeros((ch, cw), np.int64)
        self.cr = np.zeros((ch, cw), np.int64)
        self.y_avail = np.zeros((self.h, self.w), bool)
        self.c_avail = np.zeros((ch, cw), bool)
        # per-4x4 maps: quadtree depth (split_cu ctx) and luma intra
        # mode (MPM derivation).
        self.ct_depth = np.zeros((self.h // 4, self.w // 4), np.int64)
        self.luma_mode = np.full((self.h // 4, self.w // 4), 1, np.int64)
        # MPM availability is z-scan DECODE order (6.4.1), not
        # reconstruction state: a later PU of an NxN CU sees the
        # earlier PU's mode before any of the CU is reconstructed.
        self.mode_avail = np.zeros((self.h // 4, self.w // 4), bool)
        self.n_cu = 0
        self.n_tu = 0
        self.n_coeff = 0
        # transform-block rectangles, the deblocking edge source: for
        # intra slices every PU boundary coincides with a TB boundary
        # (IntraSplitFlag forces the depth-0 transform split for NxN),
        # so TB edges are exactly the bS=2 edge set of 8.7.2.
        self.tu_rects_y: list[tuple[int, int, int]] = []
        self.tu_rects_c: list[tuple[int, int, int]] = []
        # SAO: slice-level flags + per-CTB parameter grid
        self.sao_luma = hdr.get("sao_luma", 0)
        self.sao_chroma = hdr.get("sao_chroma", 0)
        self.sao_params: dict[tuple[int, int], list[dict]] = {}

    # -- sao() syntax (7.3.8.3) ----------------------------------------------

    def _sao_syntax(self, dec, ctx, rx: int, ry: int) -> None:
        if rx > 0 and dec.decision(ctx.get("sao_merge_flag", 0)):
            self.sao_params[(rx, ry)] = self.sao_params[(rx - 1, ry)]
            return
        if ry > 0 and dec.decision(ctx.get("sao_merge_flag", 0)):
            self.sao_params[(rx, ry)] = self.sao_params[(rx, ry - 1)]
            return
        params = [
            {"type": 0, "offsets": (0, 0, 0, 0), "band_pos": 0, "eo": 0}
            for _ in range(3)
        ]
        for c_idx in range(3):
            if c_idx == 0 and not self.sao_luma:
                continue
            if c_idx > 0 and not self.sao_chroma:
                continue
            if c_idx == 0 or c_idx == 1:
                # sao_type_idx_luma / _chroma: TR cMax 2, first bin
                # context-coded, second bypass
                if not dec.decision(ctx.get("sao_type_idx", 0)):
                    t = 0
                else:
                    t = 2 if dec.bypass() else 1
            else:
                t = params[1]["type"]  # chroma shares the type
            params[c_idx]["type"] = t
            if t == 0:
                continue
            offs = []
            for _ in range(4):  # TR cMax 7, bypass
                v = 0
                while v < 7 and dec.bypass():
                    v += 1
                offs.append(v)
            if t == 1:  # band: explicit signs + band position
                signed = []
                for v in offs:
                    if v and dec.bypass():
                        v = -v
                    signed.append(v)
                params[c_idx]["offsets"] = tuple(signed)
                params[c_idx]["band_pos"] = dec.bypass_bits(5)
            else:  # edge: categories 1,2 positive; 3,4 negative
                params[c_idx]["offsets"] = (
                    offs[0], offs[1], -offs[2], -offs[3]
                )
                if c_idx == 0 or c_idx == 1:
                    eo = dec.bypass_bits(2)
                    params[c_idx]["eo"] = eo
                else:
                    params[c_idx]["eo"] = params[1]["eo"]
        self.sao_params[(rx, ry)] = params

    def apply_sao(self) -> None:
        """8.7.3: offsets over the (deblocked) reconstruction.  Edge
        comparisons read the INPUT picture (a frozen copy), writes go
        to the live planes; picture-boundary samples whose needed
        neighbour is outside are left unmodified."""
        eo_nbrs = {
            0: ((0, -1), (0, 1)),
            1: ((-1, 0), (1, 0)),
            2: ((-1, -1), (1, 1)),
            3: ((-1, 1), (1, -1)),
        }
        ctb = 1 << self.log2_ctb
        planes = (self.y, self.cb, self.cr)
        srcs = tuple(p.copy() for p in planes)
        for (rx, ry), params in self.sao_params.items():
            for c_idx in range(3):
                t = params[c_idx]["type"]
                if t == 0:
                    continue
                plane, src = planes[c_idx], srcs[c_idx]
                shift = 0 if c_idx == 0 else 1
                size = ctb >> shift
                x0, y0 = rx * size, ry * size
                ph, pw = plane.shape
                x1, y1 = min(x0 + size, pw), min(y0 + size, ph)
                offs = params[c_idx]["offsets"]
                if t == 1:
                    pos = params[c_idx]["band_pos"]
                    blk = src[y0:y1, x0:x1]
                    band = blk >> 3
                    out = blk.copy()
                    for k in range(4):
                        out = np.where(
                            band == (pos + k) & 31, out + offs[k], out
                        )
                    plane[y0:y1, x0:x1] = np.clip(out, 0, 255)
                else:
                    (dy0, dx0), (dy1, dx1) = eo_nbrs[params[c_idx]["eo"]]
                    for yy in range(y0, y1):
                        for xx in range(x0, x1):
                            ny0, nx0 = yy + dy0, xx + dx0
                            ny1, nx1 = yy + dy1, xx + dx1
                            if not (
                                0 <= ny0 < ph and 0 <= nx0 < pw
                                and 0 <= ny1 < ph and 0 <= nx1 < pw
                            ):
                                continue
                            p = int(src[yy, xx])
                            n0 = int(src[ny0, nx0])
                            n1 = int(src[ny1, nx1])
                            e = 2
                            e += (p > n0) - (p < n0)
                            e += (p > n1) - (p < n1)
                            # remap raw 0..4 -> category
                            cat = (1, 2, 0, 3, 4)[e]
                            if cat:
                                plane[yy, xx] = _clip3(
                                    0, 255, p + offs[cat - 1]
                                )

    # -- CABAC syntax layer -------------------------------------------------

    def decode(self, dec: _CabacDecoder, ctx: _Ctx) -> None:
        """slice_segment_data (7.3.8.1): CTUs in raster order, each
        followed by end_of_slice_segment_flag.  When the slice
        signals SAO, each CTU starts with the sao() syntax
        (7.3.8.3)."""
        ctb = 1 << self.log2_ctb
        n_ctb_x = (self.w + ctb - 1) >> self.log2_ctb
        n_ctb_y = (self.h + ctb - 1) >> self.log2_ctb
        n = n_ctb_x * n_ctb_y
        for addr in range(n):
            rx, ry = addr % n_ctb_x, addr // n_ctb_x
            x0 = rx << self.log2_ctb
            y0 = ry << self.log2_ctb
            if self.sao_luma or self.sao_chroma:
                self._sao_syntax(dec, ctx, rx, ry)
            self._coding_quadtree(dec, ctx, x0, y0, self.log2_ctb, 0)
            end = dec.terminate()
            if (addr == n - 1) != bool(end):
                raise ValueError(
                    f"HEVC: end_of_slice_segment_flag {end} at CTU "
                    f"{addr}/{n}"
                )

    def _coding_quadtree(
        self, dec, ctx, x0: int, y0: int, log2_size: int, depth: int
    ) -> None:
        """7.3.8.4 with the 9.3.4.2.2 neighbour-depth ctxInc."""
        inside = (
            x0 + (1 << log2_size) <= self.w
            and y0 + (1 << log2_size) <= self.h
        )
        if inside and log2_size > self.log2_min_cb:
            inc = 0
            if x0 > 0 and self.y_avail[y0][x0 - 1]:
                inc += int(self.ct_depth[y0 >> 2][(x0 - 1) >> 2] > depth)
            if y0 > 0 and self.y_avail[y0 - 1][x0]:
                inc += int(self.ct_depth[(y0 - 1) >> 2][x0 >> 2] > depth)
            split = dec.decision(ctx.get("split_cu_flag", inc))
        else:
            split = 1 if log2_size > self.log2_min_cb else 0
        if split:
            half = 1 << (log2_size - 1)
            for dy in (0, half):
                for dx in (0, half):
                    if x0 + dx < self.w and y0 + dy < self.h:
                        self._coding_quadtree(
                            dec, ctx, x0 + dx, y0 + dy,
                            log2_size - 1, depth + 1,
                        )
        else:
            size4 = 1 << (log2_size - 2)
            self.ct_depth[
                y0 >> 2:(y0 >> 2) + size4, x0 >> 2:(x0 >> 2) + size4
            ] = depth
            self._coding_unit(dec, ctx, x0, y0, log2_size)

    def _coding_unit(self, dec, ctx, x0: int, y0: int, log2_size: int):
        """7.3.8.5, intra-only arm (P slices override and re-enter
        via _intra_cu for their MODE_INTRA CUs)."""
        self.n_cu += 1
        if self.pps["transquant_bypass_enabled"]:
            raise ValueError("HEVC: transquant bypass unsupported")
        self._intra_cu(dec, ctx, x0, y0, log2_size)

    def _intra_cu(self, dec, ctx, x0: int, y0: int, log2_size: int):
        """Intra CU payload: luma/chroma mode syntax + TU tree."""
        part_nxn = 0
        if log2_size == self.log2_min_cb:
            part_nxn = 1 - dec.decision(ctx.get("part_mode", 0))
        n_pu = 4 if part_nxn else 1
        pb = 1 << (log2_size - (1 if part_nxn else 0))
        prev_flags = [
            dec.decision(ctx.get("prev_intra_luma_pred_flag", 0))
            for _ in range(n_pu)
        ]
        modes = []
        for i in range(n_pu):
            px = x0 + pb * (i & 1)
            py = y0 + pb * (i >> 1)
            cands = self._mpm_list(px, py)
            if prev_flags[i]:
                idx = dec.bypass()
                if idx:
                    idx += dec.bypass()
                mode = cands[idx]
            else:
                rem = dec.bypass_bits(5)
                for cand in sorted(cands):
                    if rem >= cand:
                        rem += 1
                mode = rem
            modes.append(mode)
            s4 = pb >> 2
            self.luma_mode[
                py >> 2:(py >> 2) + s4, px >> 2:(px >> 2) + s4
            ] = mode
            self.mode_avail[
                py >> 2:(py >> 2) + s4, px >> 2:(px >> 2) + s4
            ] = True
        if dec.decision(ctx.get("intra_chroma_pred_mode", 0)):
            v = dec.bypass_bits(2)
            table = {0: 0, 1: 26, 2: 10, 3: 1}
            chroma_mode = table[v]
            if chroma_mode == modes[0]:
                chroma_mode = 34
        else:
            chroma_mode = modes[0]
        max_depth = self.sps["max_trafo_depth_intra"] + part_nxn
        self._transform_tree(
            dec, ctx, x0, y0, x0, y0, log2_size, 0, 0,
            part_nxn, modes, chroma_mode, max_depth, 1, 1,
        )

    def _mpm_list(self, x: int, y: int) -> list[int]:
        """8.4.2 candidate modes; unavailable/cross-CTB-above -> DC."""
        cand_a = 1
        if x > 0 and self.mode_avail[y >> 2][(x - 1) >> 2]:
            cand_a = int(self.luma_mode[y >> 2][(x - 1) >> 2])
        cand_b = 1
        if (
            y > 0
            and self.mode_avail[(y - 1) >> 2][x >> 2]
            and (y - 1) >> self.log2_ctb == y >> self.log2_ctb
        ):
            cand_b = int(self.luma_mode[(y - 1) >> 2][x >> 2])
        if cand_a == cand_b:
            if cand_a < 2:
                return [0, 1, 26]
            return [
                cand_a,
                2 + ((cand_a + 29) % 32),
                2 + ((cand_a - 2 + 1) % 32),
            ]
        out = [cand_a, cand_b]
        if 0 not in out:
            out.append(0)
        elif 1 not in out:
            out.append(1)
        else:
            out.append(26)
        return out

    def _transform_tree(
        self, dec, ctx, x0, y0, x_base, y_base, log2_size, depth,
        blk_idx, intra_split, modes, chroma_mode, max_depth,
        parent_cbf_cb, parent_cbf_cr,
    ):
        """7.3.8.8 + per-leaf transform_unit (7.3.8.10)."""
        sps = self.sps
        if (
            log2_size <= sps["log2_max_tb"]
            and log2_size > sps["log2_min_tb"]
            and depth < max_depth
            and not (intra_split and depth == 0)
        ):
            split = dec.decision(
                ctx.get("split_transform_flag", 5 - log2_size)
            )
        else:
            split = int(
                log2_size > sps["log2_max_tb"]
                or (intra_split and depth == 0)
            )
        cbf_cb, cbf_cr = parent_cbf_cb, parent_cbf_cr
        if log2_size > 2:
            if depth == 0 or parent_cbf_cb:
                cbf_cb = dec.decision(ctx.get("cbf_chroma", depth))
            if depth == 0 or parent_cbf_cr:
                cbf_cr = dec.decision(ctx.get("cbf_chroma", depth))
        if split:
            half = 1 << (log2_size - 1)
            for i, (dx, dy) in enumerate(
                ((0, 0), (half, 0), (0, half), (half, half))
            ):
                self._transform_tree(
                    dec, ctx, x0 + dx, y0 + dy, x0, y0,
                    log2_size - 1, depth + 1, i, intra_split, modes,
                    chroma_mode, max_depth, cbf_cb, cbf_cr,
                )
            return
        cbf_luma = 1
        if True:  # intra: cbf_luma always coded (CuPredMode == INTRA)
            cbf_luma = dec.decision(
                ctx.get("cbf_luma", 1 if depth == 0 else 0)
            )
        self._transform_unit(
            dec, ctx, x0, y0, x_base, y_base, log2_size, blk_idx,
            intra_split, modes, chroma_mode, cbf_luma, cbf_cb, cbf_cr,
        )

    def _transform_unit(
        self, dec, ctx, x0, y0, x_base, y_base, log2_size, blk_idx,
        intra_split, modes, chroma_mode, cbf_luma, cbf_cb, cbf_cr,
    ):
        """Residual decode + immediate reconstruction, z-order (the
        8.4.4.1 per-transform-block intra pipeline)."""
        self.n_tu += 1
        self.tu_rects_y.append((x0, y0, 1 << log2_size))
        # luma
        if intra_split:
            pb = 1 << log2_size
            pu_i = ((y0 - y_base) // pb << 1) | ((x0 - x_base) // pb)
            mode = modes[min(pu_i, len(modes) - 1)]
        else:
            mode = modes[0]
        res = None
        if cbf_luma:
            res = self._residual_res(
                dec, ctx, log2_size, 0, mode, self.qp,
                log2_size == 2,
            )
        self._reconstruct(0, x0, y0, log2_size, mode, res)
        # chroma
        if log2_size > 2:
            self._chroma_pair(
                dec, ctx, x0 >> 1, y0 >> 1, log2_size - 1,
                chroma_mode, cbf_cb, cbf_cr,
            )
        elif blk_idx == 3:
            self._chroma_pair(
                dec, ctx, x_base >> 1, y_base >> 1, 2,
                chroma_mode, cbf_cb, cbf_cr,
            )

    def _chroma_pair(
        self, dec, ctx, xc, yc, log2_size, chroma_mode, cbf_cb, cbf_cr
    ):
        self.tu_rects_c.append((xc, yc, 1 << log2_size))
        for c_idx, cbf, qp_off in (
            (1, cbf_cb, self.qp_cb_off), (2, cbf_cr, self.qp_cr_off),
        ):
            qp_i = _clip3(0, 57, self.qp + qp_off)
            qp_c = _CHROMA_QP[qp_i]
            res = None
            if cbf:
                res = self._residual_res(
                    dec, ctx, log2_size, c_idx, chroma_mode, qp_c,
                    False,
                )
            self._reconstruct(c_idx, xc, yc, log2_size, chroma_mode, res)

    # -- residual_coding (7.3.8.11) ------------------------------------------

    def _residual(self, dec, ctx, log2_size, c_idx, pred_mode):
        n = 1 << log2_size
        # 7.4.9.11 mode-dependent scan for 4x4 and luma 8x8 intra TUs
        scan_idx = 0
        if log2_size == 2 or (log2_size == 3 and c_idx == 0):
            if 6 <= pred_mode <= 14:
                scan_idx = 2
            elif 22 <= pred_mode <= 30:
                scan_idx = 1
        if self.pps["transform_skip_enabled"]:
            raise ValueError("HEVC: transform_skip unsupported")
        last_x = self._last_prefix(dec, ctx, "last_sig_coeff_x_prefix",
                                   log2_size, c_idx)
        last_y = self._last_prefix(dec, ctx, "last_sig_coeff_y_prefix",
                                   log2_size, c_idx)
        last_x = self._last_suffix(dec, last_x)
        last_y = self._last_suffix(dec, last_y)
        if scan_idx == 2:
            last_x, last_y = last_y, last_x
        pos_scan = _scan(4, scan_idx)
        n_sb_log2 = log2_size - 2
        sb_scan = _scan(1 << n_sb_log2, scan_idx) if n_sb_log2 else [(0, 0)]
        last_sb = sb_scan.index((last_x >> 2, last_y >> 2))
        last_pos = pos_scan.index((last_x & 3, last_y & 3))
        coeffs = np.zeros((n, n), np.int64)
        csbf: dict[tuple[int, int], int] = {}
        # hoist the per-element context-state lists out of the scan
        # loops (ctx.get cost was visible at profile depth; same
        # [pStateIdx, valMps] lists, one dict lookup each)
        states = ctx.states
        sig_states = states["sig_coeff_flag"]
        csb_states = states["coded_sub_block_flag"]
        g1_states = states["coeff_abs_level_greater1"]
        g2_states = states["coeff_abs_level_greater2"]
        c1 = 1  # greater1 context state, carried ACROSS subblocks
        for i in range(last_sb, -1, -1):
            xs, ys = sb_scan[i]
            infer_dc = 0
            if i < last_sb and i > 0:
                inc = min(
                    1,
                    csbf.get((xs + 1, ys), 0) + csbf.get((xs, ys + 1), 0),
                ) + (2 if c_idx else 0)
                flag = dec.decision(csb_states[inc])
                csbf[(xs, ys)] = flag
                infer_dc = 1
            else:
                csbf[(xs, ys)] = 1
            if not csbf[(xs, ys)]:
                continue
            sig = [0] * 16
            if i == last_sb:
                sig[last_pos] = 1
                start = last_pos - 1
            else:
                start = 15
            sig_row = self._sig_ctx_row_scan(
                log2_size, c_idx, scan_idx,
                csbf.get((xs + 1, ys), 0) + 2 * csbf.get((xs, ys + 1), 0),
                xs == 0 and ys == 0,
            )
            for pos in range(start, -1, -1):
                if pos > 0 or not infer_dc:
                    sig[pos] = dec.decision(sig_states[sig_row[pos]])
                    if sig[pos]:
                        infer_dc = 0
                else:
                    sig[pos] = 1
            sig_pos = [p for p in range(15, -1, -1) if sig[p]]
            if not sig_pos:
                continue
            # 9.3.4.2.6: ctxSet from subblock index + previous
            # subblock's ending greater1Ctx (the HM c1 carry).
            ctx_set = (2 if (i > 0 and c_idx == 0) else 0) + (
                1 if c1 == 0 else 0
            )
            c1 = 1
            gt1 = []  # aligned with sig_pos[:8] (scan order)
            first_gt1 = -1
            for k, pos in enumerate(sig_pos[:8]):
                flag = dec.decision(
                    g1_states[(16 if c_idx else 0) + ctx_set * 4 + c1]
                )
                gt1.append(flag)
                if flag:
                    c1 = 0
                    if first_gt1 < 0:
                        first_gt1 = pos
                elif 0 < c1 < 3:
                    c1 += 1
            gt2 = 0
            if first_gt1 >= 0:
                gt2 = dec.decision(
                    g2_states[(4 if c_idx else 0) + ctx_set]
                )
            # sign bins for every significant position, batched into
            # one bypass fetch (MSB-first == scan order); extracted
            # inline in the level loop below
            n_sig = len(sig_pos)
            sign_word = dec.bypass_bits(n_sig)
            rice = 0
            first_coeff2 = 1
            for k, pos in enumerate(sig_pos):
                val = 1
                if k < 8:
                    val += gt1[k]
                    if pos == first_gt1:
                        val += gt2
                base = (2 + first_coeff2) if k < 8 else 1
                if val == base:
                    rem = dec.remaining(rice)
                    val += rem
                    if val > 3 << rice:
                        rice = min(rice + 1, 4)
                if val >= 2:
                    first_coeff2 = 0
                xp, yp = pos_scan[pos]
                coeffs[(ys << 2) + yp, (xs << 2) + xp] = (
                    -val if (sign_word >> (n_sig - 1 - k)) & 1 else val
                )
                self.n_coeff += 1
        return coeffs

    def _residual_res(self, dec, ctx, log2_size, c_idx, pred_mode, qp,
                      use_dst):
        """residual_coding + 8.6.3 dequant + 8.6.4.2 inverse
        transform, fused into one native call when the C kernel is
        available (decoder state synced through an in/out triple,
        context states through the per-slice buffer, same errors as
        the pure path on corrupt streams); otherwise the pure
        three-step chain."""
        if HEVC_NATIVE_RESIDUAL:
            lib = _native_lib()
            if lib is not None:
                scan_idx = 0
                if log2_size == 2 or (log2_size == 3 and c_idx == 0):
                    if 6 <= pred_mode <= 14:
                        scan_idx = 2
                    elif 22 <= pred_mode <= 30:
                        scan_idx = 1
                if self.pps["transform_skip_enabled"]:
                    raise ValueError("HEVC: transform_skip unsupported")
                br = dec.br
                data = br.data
                # per-decoder scratch (buffer + pointer + io triple):
                # every caller consumes the returned view before the
                # next _residual_res call, so reuse is safe and saves
                # an allocation + two ctypes conversions per TU
                sc = getattr(self, "_rs", None)
                if sc is None:
                    buf = np.empty(32 * 32, np.int64)
                    sc = self._rs = (
                        buf,
                        buf.ctypes.data_as(_I64P),
                        (ctypes.c_int64 * 3)(),
                        (ctypes.c_int64 * 1)(),
                    )
                buf, buf_p, io, out_n = sc
                io[0] = br.bitpos
                io[1] = dec.range
                io[2] = dec.offset
                rc = lib.hevc_residual_tx(
                    data, len(data), io, _res_ctx_buf(ctx), log2_size,
                    c_idx, scan_idx, qp, int(use_dst), buf_p, out_n,
                )
                if rc != 0:
                    if rc == -2:
                        raise ValueError("runaway bypass unary")
                    raise ValueError("truncated CABAC stream")
                br.bitpos = io[0]
                dec.range = io[1]
                dec.offset = io[2]
                self.n_coeff += out_n[0]
                n = 1 << log2_size
                return buf[:n * n].reshape(n, n)
        levels = self._residual(dec, ctx, log2_size, c_idx, pred_mode)
        return _inverse_transform(
            _dequant(levels, qp, log2_size), dst=use_dst
        )

    def _last_prefix(self, dec, ctx, name, log2_size, c_idx) -> int:
        if c_idx == 0:
            offset = 3 * (log2_size - 2) + ((log2_size - 1) >> 2)
            shift = (log2_size + 1) >> 2
        else:
            offset = 15
            shift = log2_size - 2
        c_max = (log2_size << 1) - 1
        prefix = 0
        while prefix < c_max and dec.decision(
            ctx.get(name, (prefix >> shift) + offset)
        ):
            prefix += 1
        return prefix

    def _last_suffix(self, dec, prefix: int) -> int:
        if prefix <= 3:
            return prefix
        n_bits = (prefix >> 1) - 1
        return ((2 + (prefix & 1)) << n_bits) + dec.bypass_bits(n_bits)

    @staticmethod
    def _sig_ctx(log2_size, c_idx, scan_idx, xp, yp, prev, sb_zero) -> int:
        """9.3.4.2.5 sig_coeff_flag ctxInc, with the subblock-constant
        inputs lifted: ``prev`` = csbf(right) + 2*csbf(below) and
        ``sb_zero`` = (subblock == (0, 0)) — they do not change inside
        a subblock's position loop, which lets ``_sig_ctx_row``
        memoize the whole 16-entry row."""
        if log2_size == 2:
            sig = _SIG_CTX_MAP4[(yp << 2) + xp]
        elif sb_zero and xp == 0 and yp == 0:  # xc + yc == 0
            sig = 0
        else:
            if prev == 0:
                sig = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
            elif prev == 1:
                sig = 2 if yp == 0 else (1 if yp == 1 else 0)
            elif prev == 2:
                sig = 2 if xp == 0 else (1 if xp == 1 else 0)
            else:
                sig = 2
            if c_idx == 0:
                if not sb_zero:
                    sig += 3
                if log2_size == 3:
                    sig += 9 if scan_idx == 0 else 15
                else:
                    sig += 21
            else:
                sig += 9 if log2_size == 3 else 12
        return sig + (27 if c_idx else 0)

    _SIG_CTX_ROWS: dict = {}

    @classmethod
    def _sig_ctx_row(cls, log2_size, c_idx, scan_idx, prev, sb_zero):
        """Memoized 16-entry ctxInc row (index = (yp << 2) + xp) for
        one subblock's fixed (size, plane, scan, neighbours) inputs —
        generated by the per-sample spec mapping above, so the values
        are the same by construction."""
        key = (log2_size, c_idx, scan_idx, prev, sb_zero)
        row = cls._SIG_CTX_ROWS.get(key)
        if row is None:
            row = tuple(
                cls._sig_ctx(
                    log2_size, c_idx, scan_idx, p & 3, p >> 2, prev,
                    sb_zero,
                )
                for p in range(16)
            )
            cls._SIG_CTX_ROWS[key] = row
        return row

    _SIG_CTX_ROWS_SCAN: dict = {}

    @classmethod
    def _sig_ctx_row_scan(cls, log2_size, c_idx, scan_idx, prev, sb_zero):
        """The same memoized row permuted into scan order (index =
        scan position), so the sig loop needs no (xp, yp) unpack."""
        key = (log2_size, c_idx, scan_idx, prev, sb_zero)
        row = cls._SIG_CTX_ROWS_SCAN.get(key)
        if row is None:
            base = cls._sig_ctx_row(
                log2_size, c_idx, scan_idx, prev, sb_zero
            )
            row = tuple(
                base[(yp << 2) + xp] for xp, yp in _scan(4, scan_idx)
            )
            cls._SIG_CTX_ROWS_SCAN[key] = row
        return row

    # coeff_abs_level_remaining (9.3.3.13) lives on the decoder as the
    # fused ``dec.remaining(rice)`` — the per-level wrapper call was
    # measurable at profile depth.

    # -- intra prediction + reconstruction (8.4.4.2) --------------------------

    def _reconstruct(self, c_idx, x0, y0, log2_size, mode, res):
        n = 1 << log2_size
        if c_idx == 0:
            plane, avail = self.y, self.y_avail
        elif c_idx == 1:
            plane, avail = self.cb, self.c_avail
        else:
            plane, avail = self.cr, self.c_avail
        if HEVC_NATIVE_RESIDUAL and (
            res is None
            or (res.dtype == np.int64 and res.flags.c_contiguous)
        ):
            lib = _native_lib()
            if lib is not None:
                # fused 8.4.4.2 pred + add-residual + clip + store +
                # availability marking (same semantics as the pure
                # chain below; A/B-fuzzed in tests/test_hevc_native.py).
                # Plane/avail pointers are per-decoder constants (the
                # arrays are allocated once in __init__, np.zeros ->
                # C-contiguous, and never reassigned) — cached here.
                ptrs = getattr(self, "_nat_ptrs", None)
                if ptrs is None:
                    ptrs = self._nat_ptrs = (
                        (
                            self.y.ctypes.data_as(_I64P),
                            self.y_avail.ctypes.data_as(_U8P),
                            self.y.shape[0], self.y.shape[1],
                        ),
                        (
                            self.cb.ctypes.data_as(_I64P),
                            self.c_avail.ctypes.data_as(_U8P),
                            self.cb.shape[0], self.cb.shape[1],
                        ),
                        (
                            self.cr.ctypes.data_as(_I64P),
                            self.c_avail.ctypes.data_as(_U8P),
                            self.cr.shape[0], self.cr.shape[1],
                        ),
                    )
                    self._nat_strong = int(
                        bool(self.sps["strong_intra_smoothing"])
                    )
                pp, ap, p_h, p_w = ptrs[c_idx]
                lib.hevc_intra_recon(
                    pp, ap, p_h, p_w, x0, y0, n, mode, c_idx,
                    self._nat_strong,
                    None if res is None else res.ctypes.data_as(_I64P),
                    int(c_idx != 2),
                )
                return
        pred = self._intra_pred(plane, avail, x0, y0, n, mode, c_idx)
        if res is not None:
            pred = pred + res
        plane[y0:y0 + n, x0:x0 + n] = np.clip(pred, 0, 255)
        if c_idx != 2:
            # availability is z-order precedence; cb/cr reconstruct
            # back-to-back so marking once (on cb) is equivalent, and
            # marking on cr would break nothing either — keep cb for
            # symmetry with luma.
            avail[y0:y0 + n, x0:x0 + n] = True

    def _intra_pred(self, plane, avail, x0, y0, n, mode, c_idx):
        """8.4.4.2 intra sample prediction, vectorized: the reference
        gather/substitution, smoothing filters and all three pred
        arms are whole-array int64 numpy ops (arithmetic shifts and
        floor semantics match the former per-sample Python loops
        exactly — this function was the top profile leaf of the
        intra-heavy decode queries after the CABAC engine work)."""
        ph, pw = plane.shape
        # reference sample array ref[i], i in [-2n .. 2n] flattened:
        # index 0 = corner p[-1][-1]; negatives run DOWN the left
        # column (i = -1-y); positives run along the top row
        # (i = 1+x).  8.4.4.2.2 substitution order = increasing i
        # from -2n.
        n2 = 2 * n
        total = 4 * n + 1
        vals = np.zeros(total, np.int64)
        have = np.zeros(total, bool)

        if y0 > 0 and x0 > 0 and avail[y0 - 1, x0 - 1]:
            vals[n2] = plane[y0 - 1, x0 - 1]
            have[n2] = True
        if x0 > 0:
            m = min(n2, ph - y0)
            if m > 0:
                vals[n2 - m:n2] = plane[y0:y0 + m, x0 - 1][::-1]
                have[n2 - m:n2] = avail[y0:y0 + m, x0 - 1][::-1]
        if y0 > 0:
            m = min(n2, pw - x0)
            if m > 0:
                vals[n2 + 1:n2 + 1 + m] = plane[y0 - 1, x0:x0 + m]
                have[n2 + 1:n2 + 1 + m] = avail[y0 - 1, x0:x0 + m]
        nz = np.flatnonzero(have)
        if nz.size == 0:
            vals[:] = 128
        elif nz.size < total:
            if not have[0]:
                vals[0] = vals[nz[0]]
                have[0] = True
            # forward fill == the sequential vals[i] = vals[i-1] loop
            idxs = np.where(have, np.arange(total), 0)
            np.maximum.accumulate(idxs, out=idxs)
            vals = vals[idxs]
        corner = vals[n2]
        left = vals[n2 - 1::-1][:n2].copy()  # p[-1][0..2n-1]
        top = vals[n2 + 1:].copy()  # p[0..2n-1][-1]

        # 8.4.4.2.3 filtering: [1 2 1] smoothing, or the bilinear
        # strong filter for 32x32 luma when the SPS flag is set and
        # both corner gradients are flat (threshold 1 << (BD - 5)).
        if c_idx == 0 and mode != 1 and n > 4:
            dist = min(abs(mode - 26), abs(mode - 10))
            thres = {8: 7, 16: 1, 32: 0}.get(n, 10)
            if (mode == 0 or dist > thres) and (
                self.sps["strong_intra_smoothing"]
                and n == 32
                and abs(int(corner) + int(top[n2 - 1]) - 2 * int(top[n - 1])) < 8
                and abs(int(corner) + int(left[n2 - 1]) - 2 * int(left[n - 1])) < 8
            ):
                i = np.arange(n2 - 1, dtype=np.int64)
                f_left = left.copy()
                f_top = top.copy()
                f_top[:n2 - 1] = (
                    (63 - i) * int(corner) + (i + 1) * int(top[n2 - 1]) + 32
                ) >> 6
                f_left[:n2 - 1] = (
                    (63 - i) * int(corner) + (i + 1) * int(left[n2 - 1]) + 32
                ) >> 6
                left, top = f_left, f_top
            elif mode == 0 or dist > thres:
                f_left = left.copy()
                f_top = top.copy()
                f_corner = (left[0] + 2 * corner + top[0] + 2) >> 2
                f_left[0] = (corner + 2 * left[0] + left[1] + 2) >> 2
                f_left[1:n2 - 1] = (
                    left[:n2 - 2] + 2 * left[1:n2 - 1] + left[2:n2] + 2
                ) >> 2
                f_top[0] = (corner + 2 * top[0] + top[1] + 2) >> 2
                f_top[1:n2 - 1] = (
                    top[:n2 - 2] + 2 * top[1:n2 - 1] + top[2:n2] + 2
                ) >> 2
                left, top, corner = f_left, f_top, f_corner

        if mode == 0:  # planar 8.4.4.2.4
            xx = np.arange(n, dtype=np.int64)
            yy = xx[:, None]
            pred = (
                (n - 1 - xx)[None, :] * left[:n, None]
                + (xx + 1)[None, :] * int(top[n])
                + (n - 1 - yy) * top[None, :n]
                + (yy + 1) * int(left[n])
                + n
            ) >> (n.bit_length())  # log2(n) + 1
        elif mode == 1:  # DC 8.4.4.2.5
            dc = (int(top[:n].sum() + left[:n].sum()) + n) >> (
                n.bit_length()
            )
            pred = np.full((n, n), dc, np.int64)
            if c_idx == 0 and n < 32:
                pred[0, 1:] = (top[1:n] + 3 * dc + 2) >> 2
                pred[1:, 0] = (left[1:n] + 3 * dc + 2) >> 2
                pred[0, 0] = (left[0] + 2 * dc + top[0] + 2) >> 2
        else:  # angular 8.4.4.2.6
            angle = _PRED_ANGLE[mode - 2]
            ref = np.zeros(3 * n + 2, np.int64)  # ref[-n .. 2n+1]
            base = n
            main, side = (top, left) if mode >= 18 else (left, top)
            ref[base] = corner
            ref[base + 1:base + n2 + 1] = main[:n2]
            if angle < 0:
                lo = (n * angle) >> 5
                if lo < -1:
                    inv = _INV_ANGLE[angle]
                    xs = np.arange(-1, lo - 1, -1, dtype=np.int64)
                    idx = ((xs * inv + 128) >> 8) - 1
                    ref[base + xs] = np.where(
                        idx < 0, corner, side[np.clip(idx, 0, n2 - 1)]
                    )
            ii = (np.arange(1, n + 1, dtype=np.int64) * angle) >> 5
            ff = (np.arange(1, n + 1, dtype=np.int64) * angle) & 31
            off = np.arange(n, dtype=np.int64)
            if mode >= 18:  # vertical arm: ii/ff indexed by row
                cols = base + 1 + ii[:, None] + off[None, :]
                # ff == 0 reduces to ref[cols] exactly under the >> 5
                pred = (
                    (32 - ff)[:, None] * ref[cols]
                    + ff[:, None] * ref[cols + 1] + 16
                ) >> 5
                if mode == 26 and c_idx == 0 and n < 32:
                    pred[:, 0] = np.clip(
                        int(top[0]) + ((left[:n] - corner) >> 1), 0, 255
                    )
            else:  # modes 2..17: mirror of the vertical arm
                rows = base + 1 + ii[None, :] + off[:, None]
                pred = (
                    (32 - ff)[None, :] * ref[rows]
                    + ff[None, :] * ref[rows + 1] + 16
                ) >> 5
                if mode == 10 and c_idx == 0 and n < 32:
                    pred[0, :] = np.clip(
                        int(left[0]) + ((top[:n] - corner) >> 1), 0, 255
                    )
        return pred


# -- P slices: inter prediction (llm_m58) ------------------------------------
#
# MC interpolation coefficients (8.5.3.3.3.1 luma 8-tap, .2 chroma
# 4-tap).  EXTRACTED-VERIFIED: the full table bytes appear 11 times
# across libx265's .rodata (int8 + int16 copies, all agreeing —
# re-searched in tests/test_hevc_decode.py); libde265 derives its
# copies at build time, so the end-to-end bit-exact adjudication is
# the second independent check there.

HEVC_LUMA_FILTER = {
    1: (-1, 4, -10, 58, 17, -5, 1, 0),
    2: (-1, 4, -11, 40, 40, -11, 4, -1),
    3: (0, 1, -5, 17, 58, -10, 4, -1),
}
HEVC_CHROMA_FILTER = {
    1: (-2, 58, 10, -2),
    2: (-4, 54, 16, -2),
    3: (-6, 46, 28, -4),
    4: (-4, 36, 36, -4),
    5: (-4, 28, 46, -6),
    6: (-2, 16, 54, -4),
    7: (-2, 10, 58, -2),
}


def _eg_bypass(dec, k: int) -> int:
    """9.3.3.3 k-th order Exp-Golomb bypass decode (abs_mvd_minus2
    uses k=1) — batched bypass reads, bin-identical to the per-bin
    prefix/suffix loops."""
    try:
        q = dec.bypass_unary(30 - k)
    except ValueError as e:
        if "runaway bypass unary" in str(e):
            raise ValueError("HEVC: runaway EGk prefix") from None
        raise
    return (((1 << q) - 1) << k) + dec.bypass_bits(k + q)


class HevcInterSliceDecoder(HevcIntraSliceDecoder):
    """Decodes one TRAIL P or B slice (7.3.8.5 inter arm; llm_m58 P,
    llm_m59 B).  Scope: PART_2Nx2N PUs — skip, merge (spatial +
    combined-bi + zero candidates), and explicit-MV AMVP — over ONE
    active reference per list, no TMVP, no weighted prediction;
    everything else fails loudly.  Spatial merge candidates
    (8.5.3.2.3), combined bi-predictive candidates (8.5.3.2.4), AMVP
    with the POC-distance scaling arm (8.5.3.2.7-8), inter_pred_idc
    coding (9.3.3.8, depth-keyed context), quarter-pel luma /
    eighth-pel chroma MC (8.5.3.3.3) with 14-bit-intermediate
    bi-prediction averaging (8.5.3.3.4.3), and inter residual trees
    are implemented from spec and adjudicated bit-exact against
    libde265 on real x265 streams."""

    def __init__(
        self, sps: dict, pps: dict, hdr: dict, refs, ref_pocs,
        cur_poc: int, col_info: dict | None = None,
    ) -> None:
        super().__init__(sps, pps, hdr)
        # refs: [(y, cb, cr)] per list — length 1 (P) or 2 (B)
        self.refs = [
            tuple(p.astype(np.int64) for p in r) for r in refs
        ]
        self.ref_pocs = list(ref_pocs)
        self.cur_poc = cur_poc
        # TMVP (llm_m60): the collocated picture's 16x16-granularity
        # motion summary (_col_summary of the ref this slice points
        # at via collocated_from_l0_flag), or None when the slice
        # does not enable temporal MVP / the col pic is intra-only
        self.tmvp = bool(hdr.get("tmvp")) and col_info is not None
        self.col_info = col_info
        # NoBackwardPredFlag (8.5.3.2.9): every reference POC at or
        # before the current picture
        self.no_backward = all(p <= cur_poc for p in ref_pocs)
        self.col_from_l0 = hdr.get("col_from_l0", 1)
        self.is_b = hdr["slice_type"] == 0
        self.max_merge = hdr["max_merge"]
        self.n_ref_l0 = hdr["n_ref_l0"]
        self.mvd_l1_zero = hdr["mvd_l1_zero"]
        bh, bw = self.h // 4, self.w // 4
        self.blk_coded = np.zeros((bh, bw), bool)
        self.blk_skip = np.zeros((bh, bw), bool)
        self.pf = np.zeros((bh, bw, 2), bool)
        self.mvf = np.zeros((bh, bw, 2, 2), np.int64)
        self.n_skip = 0
        self.n_merge = 0
        self.n_amvp = 0
        self.n_intra_cu = 0
        self.n_frac_mv = 0
        self.n_bi = 0
        self.n_uni = [0, 0]
        self.n_tmvp_merge = 0
        self.n_tmvp_amvp = 0

    # -- syntax (7.3.8.5 / 7.3.8.6) ------------------------------------------

    def _coding_unit(self, dec, ctx, x0: int, y0: int, log2_size: int):
        self.n_cu += 1
        if self.pps["transquant_bypass_enabled"]:
            raise ValueError("HEVC: transquant bypass unsupported")
        bx, by = x0 >> 2, y0 >> 2
        inc = 0
        if x0 > 0 and self.blk_coded[by][bx - 1]:
            inc += int(self.blk_skip[by][bx - 1])
        if y0 > 0 and self.blk_coded[by - 1][bx]:
            inc += int(self.blk_skip[by - 1][bx])
        skip = dec.decision(ctx.get("cu_skip_flag", inc))
        n = 1 << log2_size
        s4 = n >> 2
        if skip:
            self.n_skip += 1
            mot = self._merge_motion(dec, ctx, x0, y0, n)
            self._inter_pred_cu(x0, y0, n, mot)
            self._mark_inter(x0, y0, n, mot, skip=True)
            self.y_avail[y0:y0 + n, x0:x0 + n] = True
            self.c_avail[
                y0 >> 1:(y0 + n) >> 1, x0 >> 1:(x0 + n) >> 1
            ] = True
            return
        if dec.decision(ctx.get("pred_mode_flag", 0)):  # MODE_INTRA
            self.n_intra_cu += 1
            self._intra_cu(dec, ctx, x0, y0, log2_size)
            self.blk_coded[by:by + s4, bx:bx + s4] = True
            return
        # inter CU: part_mode is coded for every size (7.3.8.5);
        # PART_2Nx2N is bin "1" on context 0 — anything else is
        # outside scope (x265 pinned rect=0/amp=0).
        if not dec.decision(ctx.get("part_mode", 0)):
            raise ValueError("HEVC: non-2Nx2N inter partition")
        merge = dec.decision(ctx.get("merge_flag", 0))
        if merge:
            self.n_merge += 1
            mot = self._merge_motion(dec, ctx, x0, y0, n)
        else:
            self.n_amvp += 1
            if self.n_ref_l0 > 1 or self.hdr_n_ref_l1() > 1:
                raise ValueError("HEVC: multi-ref lists unsupported")
            if self.is_b:
                # 9.3.3.8: "1" = PRED_BI (ctx = CtDepth); "0 b" with
                # b on ctx 4 selecting L0/L1
                depth = int(self.ct_depth[y0 >> 2][x0 >> 2])
                if dec.decision(ctx.get("inter_pred_idc", depth)):
                    idc = 2  # PRED_BI
                else:
                    idc = 1 if dec.decision(
                        ctx.get("inter_pred_idc", 4)
                    ) else 0
            else:
                idc = 0  # P: inferred PRED_L0
            pf = [idc in (0, 2), idc in (1, 2)]
            mv = [(0, 0), (0, 0)]
            for lx in (0, 1):
                if not pf[lx]:
                    continue
                if lx == 1 and self.mvd_l1_zero and idc == 2:
                    mvd = (0, 0)
                else:
                    mvd = self._mvd(dec, ctx)
                mvp_flag = dec.decision(ctx.get("mvp_flag", 0))
                mvp = self._amvp(lx, x0, y0, n, mvp_flag)
                comps = []
                for p, d in zip(mvp, mvd):
                    u = (p + d) & 0xFFFF  # 8.5.3.2.1 16-bit wrap
                    comps.append(u - 0x10000 if u >= 0x8000 else u)
                mv[lx] = (comps[0], comps[1])
            mot = (pf[0], pf[1], mv[0], mv[1])
        self._inter_pred_cu(x0, y0, n, mot)
        self._mark_inter(x0, y0, n, mot, skip=False)
        rqt_root = 1
        if not merge:
            rqt_root = dec.decision(ctx.get("rqt_root_cbf", 0))
        if rqt_root:
            self._transform_tree_p(
                dec, ctx, x0, y0, x0, y0, log2_size, 0, 0,
                self.sps["max_trafo_depth_inter"], 1, 1,
            )
        self.y_avail[y0:y0 + n, x0:x0 + n] = True
        self.c_avail[
            y0 >> 1:(y0 + n) >> 1, x0 >> 1:(x0 + n) >> 1
        ] = True

    def hdr_n_ref_l1(self) -> int:
        return len(self.refs) - 1 if self.is_b else 0

    def _mark_inter(self, x0, y0, n, mot, skip: bool) -> None:
        pf0, pf1, mv0, mv1 = mot
        bx, by, s4 = x0 >> 2, y0 >> 2, n >> 2
        self.blk_coded[by:by + s4, bx:bx + s4] = True
        self.blk_skip[by:by + s4, bx:bx + s4] = skip
        self.pf[by:by + s4, bx:bx + s4, 0] = pf0
        self.pf[by:by + s4, bx:bx + s4, 1] = pf1
        self.mvf[by:by + s4, bx:bx + s4, 0] = mv0
        self.mvf[by:by + s4, bx:bx + s4, 1] = mv1
        for pf, mv in ((pf0, mv0), (pf1, mv1)):
            if pf and (mv[0] & 3 or mv[1] & 3):
                self.n_frac_mv += 1

    def _mvd(self, dec, ctx) -> tuple[int, int]:
        """7.3.8.9 mvd_coding: both greater0 flags, then both
        greater1 flags, then per-component remainder + sign."""
        gt0 = [
            dec.decision(ctx.get("abs_mvd_greater0", 0))
            for _ in range(2)
        ]
        gt1 = [
            dec.decision(ctx.get("abs_mvd_greater1", 0)) if g else 0
            for g in gt0
        ]
        out = []
        for g0, g1 in zip(gt0, gt1):
            if not g0:
                out.append(0)
                continue
            val = 2 + _eg_bypass(dec, 1) if g1 else 1
            out.append(-val if dec.bypass() else val)
        return out[0], out[1]

    def _motion_at(self, px: int, py: int):
        """Motion of the 4x4 block covering luma sample (px, py), or
        None when outside the picture, not yet decoded in z-order, or
        intra (6.4.2 availability for merge/AMVP candidates).
        Returns (pf0, pf1, mv0, mv1)."""
        if not (0 <= px < self.w and 0 <= py < self.h):
            return None
        bx, by = px >> 2, py >> 2
        if not self.blk_coded[by][bx]:
            return None
        pf0, pf1 = bool(self.pf[by][bx][0]), bool(self.pf[by][bx][1])
        if not pf0 and not pf1:
            return None  # intra
        return (
            pf0, pf1,
            (int(self.mvf[by][bx][0][0]), int(self.mvf[by][bx][0][1])),
            (int(self.mvf[by][bx][1][0]), int(self.mvf[by][bx][1][1])),
        )

    def _merge_motion(self, dec, ctx, x0, y0, n):
        """merge_idx syntax (TR, first bin context) + the 8.5.3.2.3
        spatial candidate list, extended for B slices with the
        8.5.3.2.4 combined bi-predictive candidates and per-slice-type
        zero candidates.  Candidate identity is the full (predFlags,
        mv pair) motion — with one active reference per list the
        refIdx components are structurally 0."""
        idx = 0
        if self.max_merge > 1:
            if dec.decision(ctx.get("merge_idx", 0)):
                idx = 1
                while idx < self.max_merge - 1 and dec.bypass():
                    idx += 1
        a1 = self._motion_at(x0 - 1, y0 + n - 1)
        b1 = self._motion_at(x0 + n - 1, y0 - 1)
        b0 = self._motion_at(x0 + n, y0 - 1)
        a0 = self._motion_at(x0 - 1, y0 + n)
        cands = []
        if a1 is not None:
            cands.append(a1)
        if b1 is not None and b1 != a1:
            cands.append(b1)
        if b0 is not None and b0 != b1:
            cands.append(b0)
        if a0 is not None and a0 != a1:
            cands.append(a0)
        if len(cands) < 4:  # B2 only when A1,B1,B0,A0 yielded < 4
            b2 = self._motion_at(x0 - 1, y0 - 1)
            if b2 is not None and b2 != a1 and b2 != b1:
                cands.append(b2)
        if self.tmvp and len(cands) < self.max_merge:
            # 8.5.3.2.5 temporal merging candidate (after spatial,
            # before combined/zero): per-list col derivation with
            # refIdx 0
            t0 = self._temporal_mv(x0, y0, n, 0)
            t1 = (
                self._temporal_mv(x0, y0, n, 1)
                if self.is_b and len(self.refs) == 2
                else None
            )
            if t0 is not None or t1 is not None:
                if idx == len(cands):
                    self.n_tmvp_merge += 1
                cands.append(
                    (
                        t0 is not None,
                        t1 is not None,
                        t0 if t0 is not None else (0, 0),
                        t1 if t1 is not None else (0, 0),
                    )
                )
        if self.is_b and len(self.refs) == 2:
            # 8.5.3.2.4 combined bi-predictive candidates
            orig = len(cands)
            order = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1),
                     (0, 3), (3, 0), (1, 3), (3, 1), (2, 3), (3, 2))
            comb = 0
            while (
                len(cands) < self.max_merge
                and orig > 1
                and comb < orig * (orig - 1)
            ):
                i0, i1 = order[comb]
                comb += 1
                c0, c1 = cands[i0], cands[i1]
                if not (c0[0] and c1[1]):
                    continue
                # addable unless both point at the same picture with
                # the same vector (DiffPicOrderCnt(..) == 0 && mv eq)
                if (
                    self.ref_pocs[0] == self.ref_pocs[1]
                    and c0[2] == c1[3]
                ):
                    continue
                cands.append((True, True, c0[2], c1[3]))
        zero = (
            (True, True, (0, 0), (0, 0))
            if self.is_b and len(self.refs) == 2
            else (True, False, (0, 0), (0, 0))
        )
        while len(cands) < self.max_merge:
            cands.append(zero)
        return cands[idx]

    # -- AMVP (8.5.3.2.6-8) --------------------------------------------------

    @staticmethod
    def _scale_mv(mv, tb: int, td: int):
        """8.5.3.2.8 temporal/POC-distance MV scaling (C-style
        truncating division for tx)."""
        tb = _clip3(-128, 127, tb)
        td = _clip3(-128, 127, td)
        atd = abs(td)
        tx = (16384 + (atd >> 1)) // atd
        if td < 0:
            tx = -tx
        dsf = _clip3(-4096, 4095, (tb * tx + 32) >> 6)

        def sc(v):
            val = dsf * v
            s = 1 if val >= 0 else -1
            return _clip3(-32768, 32767, s * ((abs(val) + 127) >> 8))

        return (sc(mv[0]), sc(mv[1]))

    def _amvp(self, lx: int, x0, y0, n, mvp_flag):
        """8.5.3.2.7 spatial MVP candidates for list ``lx``.  Every
        inter PU in the slice uses refIdx 0, so a neighbour's list-Y
        reference picture is the slice-level ref_pocs[Y]; the
        same-ref pass hits when that POC equals the target list's,
        and the scaled pass applies the 8.5.3.2.8 distance scaling
        otherwise."""
        target = self.ref_pocs[lx]
        a0 = self._motion_at(x0 - 1, y0 + n)
        a1 = self._motion_at(x0 - 1, y0 + n - 1)
        b0 = self._motion_at(x0 + n, y0 - 1)
        b1 = self._motion_at(x0 + n - 1, y0 - 1)
        b2 = self._motion_at(x0 - 1, y0 - 1)
        is_scaled = a0 is not None or a1 is not None

        def same_ref(cand):
            if cand is None:
                return None
            for y in (lx, 1 - lx):
                if cand[y] and y < len(self.ref_pocs) and (
                    self.ref_pocs[y] == target
                ):
                    return cand[2 + y]
            return None

        def scaled(cand):
            if cand is None:
                return None
            for y in (lx, 1 - lx):
                if cand[y] and y < len(self.ref_pocs):
                    tb = self.cur_poc - target
                    td = self.cur_poc - self.ref_pocs[y]
                    if td == 0:
                        return cand[2 + y]
                    return self._scale_mv(cand[2 + y], tb, td)
            return None

        mv_a = None
        for cand in (a0, a1):
            mv_a = same_ref(cand)
            if mv_a is not None:
                break
        if mv_a is None:
            for cand in (a0, a1):
                mv_a = scaled(cand)
                if mv_a is not None:
                    break
        mv_b = None
        for cand in (b0, b1, b2):
            mv_b = same_ref(cand)
            if mv_b is not None:
                break
        if not is_scaled:
            # 8.5.3.2.7 steps 6-7: no left neighbour exists — A takes
            # the unscaled B candidate, and B is re-derived with the
            # scaled pass
            mv_a = mv_b
            mv_b = None
            for cand in (b0, b1, b2):
                mv_b = scaled(cand)
                if mv_b is not None:
                    break
        cands = []
        if mv_a is not None:
            cands.append(mv_a)
        if mv_b is not None and mv_b != mv_a:
            cands.append(mv_b)
        if len(cands) < 2 and self.tmvp:
            # 8.5.3.2.6: the temporal candidate fills the list when
            # fewer than two spatial MVPs survive
            t = self._temporal_mv(x0, y0, n, lx)
            if t is not None:
                if mvp_flag == len(cands):
                    self.n_tmvp_amvp += 1
                cands.append(t)
        while len(cands) < 2:
            cands.append((0, 0))
        return cands[mvp_flag]

    # -- temporal (collocated) motion (8.5.3.2.8-9, llm_m60) -----------------

    def _temporal_mv(self, x0, y0, n, lx):
        """Temporal luma MV prediction: bottom-right collocated
        position first (only when inside the picture AND the same CTU
        row as the CU — 8.5.3.2.8), then the centre position; the
        stored col motion has 16x16 granularity."""
        xbr, ybr = x0 + n, y0 + n
        if (
            xbr < self.w
            and ybr < self.h
            and (y0 >> self.log2_ctb) == (ybr >> self.log2_ctb)
        ):
            mv = self._col_motion(xbr, ybr, lx)
            if mv is not None:
                return mv
        return self._col_motion(x0 + (n >> 1), y0 + (n >> 1), lx)

    def _col_motion(self, xc, yc, lx):
        """8.5.3.2.9 collocated MV: pick the col block's list (the
        available one; for bi col motion, list ``lx`` when every
        current reference precedes the picture, else the list the
        collocated picture itself came from), then scale by POC
        distances unless they match."""
        col = self.col_info
        cx, cy = xc >> 4, yc >> 4
        pf0, pf1 = col["pf"][cy][cx]
        if not pf0 and not pf1:
            return None  # collocated block is intra
        if not pf0:
            ycol = 1
        elif not pf1:
            ycol = 0
        elif self.no_backward:
            ycol = lx
        else:
            ycol = self.col_from_l0
        mvcol = (
            int(col["mv"][cy][cx][ycol][0]),
            int(col["mv"][cy][cx][ycol][1]),
        )
        td = col["poc"] - col["ref_pocs"][ycol]
        tb = self.cur_poc - self.ref_pocs[lx]
        if td == tb or td == 0:
            return mvcol
        return self._scale_mv(mvcol, tb, td)

    def col_summary(self) -> dict:
        """The decoded picture's motion field compressed to the 16x16
        storage granularity (the spec's motion data storage
        reduction: each 16x16 region keeps its top-left 4x4 block's
        motion) — what a LATER slice's TMVP reads."""
        pf16 = self.pf[::4, ::4].copy()
        mv16 = self.mvf[::4, ::4].copy()
        pocs = self.ref_pocs + [self.ref_pocs[0]] * (
            2 - len(self.ref_pocs)
        )
        return {
            "pf": pf16,
            "mv": mv16,
            "poc": self.cur_poc,
            "ref_pocs": pocs,
        }

    # -- motion compensation (8.5.3.3.3) -------------------------------------

    def _inter_pred_cu(self, x0, y0, n, mot) -> None:
        pf0, pf1, mv0, mv1 = mot
        if pf0 and pf1:
            self.n_bi += 1
        else:
            self.n_uni[0 if pf0 else 1] += 1
        nc = n >> 1
        xc, yc = x0 >> 1, y0 >> 1
        if HEVC_NATIVE_RESIDUAL:
            lib = _native_lib()
            if lib is not None:
                # per-decoder pointer cache: refs and picture planes
                # are allocated once in __init__ (contiguous int64 by
                # construction) and never reassigned
                cache = getattr(self, "_ipred_cache", None)
                if cache is None:
                    ok = all(
                        _mc_native_ok(p) for r in self.refs for p in r
                    ) and all(
                        pl.dtype == np.int64 and pl.flags.c_contiguous
                        for pl in (self.y, self.cb, self.cr)
                    )
                    if ok:
                        cache = (
                            [
                                tuple(
                                    p.ctypes.data_as(_I64P) for p in r
                                )
                                for r in self.refs
                            ],
                            (
                                self.y.ctypes.data_as(_I64P),
                                self.cb.ctypes.data_as(_I64P),
                                self.cr.ctypes.data_as(_I64P),
                            ),
                            self.cb.shape,
                        )
                    else:
                        cache = False
                    self._ipred_cache = cache
                if cache is not False:
                    refp, planep, (ch, cw) = cache
                    r0 = refp[0] if pf0 else None
                    r1 = refp[1] if pf1 else None
                    mx0, my0 = mv0 if pf0 else (0, 0)
                    mx1, my1 = mv1 if pf1 else (0, 0)
                    lib.hevc_inter_pred(
                        r0[0] if r0 else None, r1[0] if r1 else None,
                        self.h, self.w, x0, y0, n,
                        mx0, my0, mx1, my1, 1, planep[0], self.w,
                    )
                    lib.hevc_inter_pred(
                        r0[1] if r0 else None, r1[1] if r1 else None,
                        ch, cw, xc, yc, nc,
                        mx0, my0, mx1, my1, 0, planep[1], cw,
                    )
                    lib.hevc_inter_pred(
                        r0[2] if r0 else None, r1[2] if r1 else None,
                        ch, cw, xc, yc, nc,
                        mx0, my0, mx1, my1, 0, planep[2], cw,
                    )
                    return
        planes = ((self.y, x0, y0, n), (self.cb, xc, yc, nc),
                  (self.cr, xc, yc, nc))
        raws = [[], [], []]
        for lx, pf, mv in ((0, pf0, mv0), (1, pf1, mv1)):
            if not pf:
                continue
            ry, rcb, rcr = self.refs[lx]
            raws[0].append(self._mc_luma_raw(ry, x0, y0, n, mv))
            raws[1].append(self._mc_chroma_raw(rcb, xc, yc, nc, mv))
            raws[2].append(self._mc_chroma_raw(rcr, xc, yc, nc, mv))
        for (plane, px, py, pn), rs in zip(planes, raws):
            if len(rs) == 2:
                # 8.5.3.3.4.3 default bi prediction: average the
                # 14-bit intermediates, shift2 = 15 - BitDepth = 7
                out = np.clip((rs[0] + rs[1] + 64) >> 7, 0, 255)
            else:
                # 8.5.3.3.4.2 uni: shift1 = 14 - BitDepth = 6
                out = np.clip((rs[0] + 32) >> 6, 0, 255)
            plane[py:py + pn, px:px + pn] = out

    def _mc_luma_raw(self, ref, x0, y0, n, mv):
        """8.5.3.3.3.1 with BitDepth 8 (shift1 = 0, shift2 = 6):
        returns the 14-bit intermediate prediction (pre weighted-
        sample rounding).  Out-of-picture reference samples clamp to
        the picture edge (8.5.3.2.9 padding)."""
        mx, my = mv
        if HEVC_NATIVE_RESIDUAL and _mc_native_ok(ref):
            lib = _native_lib()
            if lib is not None:
                out = np.empty(n * n, np.int64)
                lib.hevc_mc_luma(
                    ref.ctypes.data_as(_I64P), self.h, self.w,
                    x0, y0, n, mx, my,
                    out.ctypes.data_as(_I64P),
                )
                return out.reshape(n, n)
        xi, fx = x0 + (mx >> 2), mx & 3
        yi, fy = y0 + (my >> 2), my & 3
        rows = np.clip(np.arange(yi - 3, yi + n + 4), 0, self.h - 1)
        cols = np.clip(np.arange(xi - 3, xi + n + 4), 0, self.w - 1)
        blk = ref[np.ix_(rows, cols)]
        if fx == 0 and fy == 0:
            return blk[3:3 + n, 3:3 + n] << 6
        if fy == 0:
            f = HEVC_LUMA_FILTER[fx]
            return sum(f[i] * blk[3:3 + n, i:i + n] for i in range(8))
        if fx == 0:
            f = HEVC_LUMA_FILTER[fy]
            return sum(f[i] * blk[i:i + n, 3:3 + n] for i in range(8))
        fh = HEVC_LUMA_FILTER[fx]
        tmp = sum(fh[i] * blk[:, i:i + n] for i in range(8))
        fv = HEVC_LUMA_FILTER[fy]
        return sum(fv[i] * tmp[i:i + n, :] for i in range(8)) >> 6

    def _mc_chroma_raw(self, ref, xc, yc, nc, mv):
        """8.5.3.3.3.2: eighth-pel 4-tap over the half-resolution
        plane; returns the 14-bit intermediate."""
        mx, my = mv
        ch, cw = ref.shape
        if HEVC_NATIVE_RESIDUAL and _mc_native_ok(ref):
            lib = _native_lib()
            if lib is not None:
                out = np.empty(nc * nc, np.int64)
                lib.hevc_mc_chroma(
                    ref.ctypes.data_as(_I64P), ch, cw,
                    xc, yc, nc, mx, my,
                    out.ctypes.data_as(_I64P),
                )
                return out.reshape(nc, nc)
        xi, fx = xc + (mx >> 3), mx & 7
        yi, fy = yc + (my >> 3), my & 7
        rows = np.clip(np.arange(yi - 1, yi + nc + 2), 0, ch - 1)
        cols = np.clip(np.arange(xi - 1, xi + nc + 2), 0, cw - 1)
        blk = ref[np.ix_(rows, cols)]
        if fx == 0 and fy == 0:
            return blk[1:1 + nc, 1:1 + nc] << 6
        if fy == 0:
            f = HEVC_CHROMA_FILTER[fx]
            return sum(f[i] * blk[1:1 + nc, i:i + nc] for i in range(4))
        if fx == 0:
            f = HEVC_CHROMA_FILTER[fy]
            return sum(f[i] * blk[i:i + nc, 1:1 + nc] for i in range(4))
        fh = HEVC_CHROMA_FILTER[fx]
        tmp = sum(fh[i] * blk[:, i:i + nc] for i in range(4))
        fv = HEVC_CHROMA_FILTER[fy]
        return sum(fv[i] * tmp[i:i + nc, :] for i in range(4)) >> 6

    # -- inter residual tree (7.3.8.8 / 7.3.8.10) ----------------------------

    def _transform_tree_p(
        self, dec, ctx, x0, y0, x_base, y_base, log2_size, depth,
        blk_idx, max_depth, parent_cbf_cb, parent_cbf_cr,
    ):
        sps = self.sps
        if (
            log2_size <= sps["log2_max_tb"]
            and log2_size > sps["log2_min_tb"]
            and depth < max_depth
        ):
            split = dec.decision(
                ctx.get("split_transform_flag", 5 - log2_size)
            )
        else:
            split = int(log2_size > sps["log2_max_tb"])
        cbf_cb, cbf_cr = parent_cbf_cb, parent_cbf_cr
        if log2_size > 2:
            if depth == 0 or parent_cbf_cb:
                cbf_cb = dec.decision(ctx.get("cbf_chroma", depth))
            if depth == 0 or parent_cbf_cr:
                cbf_cr = dec.decision(ctx.get("cbf_chroma", depth))
        if split:
            half = 1 << (log2_size - 1)
            for i, (dx, dy) in enumerate(
                ((0, 0), (half, 0), (0, half), (half, half))
            ):
                self._transform_tree_p(
                    dec, ctx, x0 + dx, y0 + dy, x0, y0,
                    log2_size - 1, depth + 1, i, max_depth,
                    cbf_cb, cbf_cr,
                )
            return
        # 7.3.8.8: for inter, cbf_luma is inferred 1 at depth 0 with
        # no chroma cbf, coded otherwise.
        if depth != 0 or cbf_cb or cbf_cr:
            cbf_luma = dec.decision(
                ctx.get("cbf_luma", 1 if depth == 0 else 0)
            )
        else:
            cbf_luma = 1
        self.n_tu += 1
        self.tu_rects_y.append((x0, y0, 1 << log2_size))
        n = 1 << log2_size
        if cbf_luma:
            # inter residuals always scan diagonally (7.4.9.11 is
            # intra-only) and always use the DCT (8.6.4.1: DST is
            # 4x4 intra luma only) — pred_mode 0 selects scan 0.
            res = self._residual_res(
                dec, ctx, log2_size, 0, 0, self.qp, False
            )
            self.y[y0:y0 + n, x0:x0 + n] = np.clip(
                self.y[y0:y0 + n, x0:x0 + n] + res, 0, 255
            )
        if log2_size > 2:
            self._chroma_add(
                dec, ctx, x0 >> 1, y0 >> 1, log2_size - 1,
                cbf_cb, cbf_cr,
            )
        elif blk_idx == 3:
            self._chroma_add(
                dec, ctx, x_base >> 1, y_base >> 1, 2,
                cbf_cb, cbf_cr,
            )

    def _chroma_add(self, dec, ctx, xc, yc, log2_size, cbf_cb, cbf_cr):
        self.tu_rects_c.append((xc, yc, 1 << log2_size))
        n = 1 << log2_size
        for c_idx, plane, cbf, qp_off in (
            (1, self.cb, cbf_cb, self.qp_cb_off),
            (2, self.cr, cbf_cr, self.qp_cr_off),
        ):
            if not cbf:
                continue
            qp_c = _CHROMA_QP[_clip3(0, 57, self.qp + qp_off)]
            res = self._residual_res(
                dec, ctx, log2_size, c_idx, 0, qp_c, False
            )
            plane[yc:yc + n, xc:xc + n] = np.clip(
                plane[yc:yc + n, xc:xc + n] + res, 0, 255
            )


# -- x265 video encoder + multi-frame decode drivers (llm_m58) ---------------

_X265 = None
_X265_PIC_PLANES_OFF = 24  # planes[3] (8 B each), then stride[3] (4 B)
_X265_PIC_STRIDE_OFF = 48
_X265_PIC_BITDEPTH_OFF = 60  # == 8 after picture_init (fingerprint)
_X265_PIC_CSP_OFF = 72  # == 1 (X265_CSP_I420) after init (fingerprint)


def _x265():
    """libx265 via ctypes.  The x265_picture offsets above are
    established EMPIRICALLY (r14 rule — never from header recall):
    picture_init leaves exactly two nonzero ints in the first 256
    bytes, bitDepth == 8 at +60 and colorSpace at +72 (1 for i420;
    re-initialising under input-csp=i444 flips +72 to 3 and nothing
    else), which pins planes[3] at +24 and stride[3] at +48; the
    poke offsets are then validated end-to-end by the lossless
    encode -> libde265 -> bit-equal-source roundtrip in
    tests/test_hevc_pslice.py."""
    global _X265
    if _X265 is None:
        import ctypes

        lib = ctypes.CDLL("libx265.so.199")
        lib.x265_param_alloc.restype = ctypes.c_void_p
        lib.x265_param_default_preset.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.x265_param_parse.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.x265_picture_alloc.restype = ctypes.c_void_p
        lib.x265_picture_init.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.x265_picture_free.argtypes = [ctypes.c_void_p]
        lib.x265_param_free.argtypes = [ctypes.c_void_p]
        lib.x265_encoder_open_199.restype = ctypes.c_void_p
        lib.x265_encoder_open_199.argtypes = [ctypes.c_void_p]
        lib.x265_encoder_encode.restype = ctypes.c_int
        lib.x265_encoder_encode.argtypes = [ctypes.c_void_p] * 5
        lib.x265_encoder_close.argtypes = [ctypes.c_void_p]
        _X265 = lib
    return _X265


def have_libx265() -> bool:
    try:
        _x265()
        return True
    except OSError:
        return False


# Parameter pins for m58 P-slice fixtures: the I-slice constrained
# set (pools/frame-threads = the r13 thread thrash fix, signhide off,
# aq off, strong-intra-smoothing off) plus the inter-side fence —
# P-only GOP (bframes 0), one reference, no TMVP, no weighted pred,
# square partitions only (rect/amp 0), scenecut off so exactly one
# leading IDR.  subme 3 turns quarter-pel refinement on (ultrafast's
# subme 0 would leave every MV integer and the 8-tap/4-tap
# interpolation paths dead).
X265_VIDEO_PARAMS = (
    ("pools", "none"),
    ("frame-threads", "1"),
    ("wpp", "0"),
    ("sao", "0"),
    # "deblock=0" only zeroes the offsets (probed: tools line still
    # lists deblock) — no-deblock is the real disable switch.
    ("no-deblock", "1"),
    ("signhide", "0"),
    ("aq-mode", "0"),
    ("strong-intra-smoothing", "0"),
    ("min-cu-size", "8"),
    ("bframes", "0"),
    ("ref", "1"),
    ("keyint", "250"),
    ("scenecut", "0"),
    ("temporal-mvp", "0"),
    ("weightp", "0"),
    ("rect", "0"),
    ("amp", "0"),
    ("subme", "3"),
    ("repeat-headers", "1"),
    ("info", "0"),
    ("annexb", "1"),
)


# Extra pins for B-frame fixtures (llm_m59): fixed IBBP GOP with no
# adaptive placement, flat reference structure (no b-pyramid), and
# weighted biprediction off (outside the decoder's scope).
X265_BFRAME_PARAMS = (
    ("bframes", "2"),
    ("b-adapt", "0"),
    ("b-pyramid", "0"),
    ("weightb", "0"),
)


def encode_hevc_video(
    frames, qp: int, ctu: int = 32, lossless: bool = False,
    max_merge: int = 2, extra_params: tuple = (),
) -> list[bytes]:
    """Encode (y, cb, cr) frame tuples with the REAL x265 encoder
    under the m58 pins; returns the bitstream as a list of NAL units
    (start codes stripped).  ``lossless=True`` is the ABI-validation
    mode (transquant bypass — decodable by libde265 but outside the
    from-spec decoder's surface)."""
    import ctypes

    x = _x265()
    h, w = frames[0][0].shape
    par = x.x265_param_alloc()
    if not par:
        raise MemoryError("x265_param_alloc failed")
    enc = None
    pics = []
    try:
        if x.x265_param_default_preset(par, b"ultrafast", None) != 0:
            raise ValueError("x265: preset rejected")
        overridden = {k for k, _ in extra_params}
        params = tuple(
            p for p in X265_VIDEO_PARAMS if p[0] not in overridden
        ) + extra_params + (
            ("input-res", f"{w}x{h}"),
            ("fps", "25"),
            ("max-merge", str(max_merge)),
        ) + ((("lossless", "1"),) if lossless else (("qp", str(qp)),))
        for k, v in params:
            if x.x265_param_parse(par, k.encode(), v.encode()) != 0:
                raise ValueError(f"x265: param {k}={v} rejected")
        enc = x.x265_encoder_open_199(par)
        if not enc:
            raise ValueError("x265: encoder_open failed")
        nal_pp = ctypes.c_void_p()
        nal_n = ctypes.c_uint()
        out: list[bytes] = []

        def drain() -> None:
            base = nal_pp.value
            for i in range(nal_n.value):
                sz = int.from_bytes(
                    ctypes.string_at(base + 16 * i + 4, 4), "little"
                )
                pay = ctypes.c_void_p.from_address(base + 16 * i + 8).value
                data = ctypes.string_at(pay, sz)
                # x265 emits Annex B (start-code-prefixed) payloads
                if data.startswith(b"\x00\x00\x00\x01"):
                    data = data[4:]
                elif data.startswith(b"\x00\x00\x01"):
                    data = data[3:]
                out.append(data)

        for fy, fcb, fcr in frames:
            pic = x.x265_picture_alloc()
            x.x265_picture_init(par, pic)
            if (
                int.from_bytes(
                    ctypes.string_at(pic + _X265_PIC_BITDEPTH_OFF, 4),
                    "little",
                ) != 8
                or int.from_bytes(
                    ctypes.string_at(pic + _X265_PIC_CSP_OFF, 4),
                    "little",
                ) != 1
            ):
                raise RuntimeError(
                    "x265_picture ABI fingerprint mismatch"
                )
            bufs = [
                np.ascontiguousarray(fy),
                np.ascontiguousarray(fcb),
                np.ascontiguousarray(fcr),
            ]
            pics.append((pic, bufs))
            for i, b in enumerate(bufs):
                ctypes.cast(
                    pic + _X265_PIC_PLANES_OFF + 8 * i,
                    ctypes.POINTER(ctypes.c_void_p),
                )[0] = b.ctypes.data
                ctypes.cast(
                    pic + _X265_PIC_STRIDE_OFF + 4 * i,
                    ctypes.POINTER(ctypes.c_int),
                )[0] = b.shape[1]
            r = x.x265_encoder_encode(
                enc, ctypes.byref(nal_pp), ctypes.byref(nal_n), pic, None
            )
            if r < 0:
                raise ValueError("x265: encode failed")
            if r > 0:
                drain()
        while True:
            r = x.x265_encoder_encode(
                enc, ctypes.byref(nal_pp), ctypes.byref(nal_n), None, None
            )
            if r < 0:
                raise ValueError("x265: flush failed")
            if r == 0:
                break
            drain()
        return out
    finally:
        if enc:
            x.x265_encoder_close(enc)
        for pic, _ in pics:
            x.x265_picture_free(pic)
        x.x265_param_free(par)


def decode_hevc_video_from_spec(nals: list[bytes]) -> list[tuple]:
    """Decode an x265 video stream (one leading IDR I-slice followed
    by TRAIL P-slices) entirely from spec; returns
    [(y, cb, cr, stats), ...] in decode order.  Every frame keeps
    the single-L0-reference discipline: each P slice's RPS must
    resolve to exactly one previously decoded picture."""
    sps = pps = None
    dpb: dict[int, tuple] = {}
    dpb_col: dict[int, dict | None] = {}
    out: list[tuple] = []
    for nal in nals:
        t = (nal[0] >> 1) & 0x3F
        if t == 32:  # VPS: nothing the slice layer needs
            continue
        if t == 33:
            sps = parse_hevc_sps_full(nal)
            continue
        if t == 34:
            pps = parse_hevc_pps(nal)
            continue
        if t in (35, 39, 40):  # AUD / SEI
            continue
        if t in (19, 20):
            if sps is None or pps is None:
                raise ValueError("HEVC: slice before parameter sets")
            y, cb, cr, st = decode_hevc_islice(nal, sps, pps)
            dpb.clear()
            dpb_col.clear()
            dpb[0] = (y, cb, cr)
            dpb_col[0] = None  # intra picture: no collocated motion
            st["poc"] = 0
            st["slice_type"] = "I"
            out.append((y, cb, cr, st))
            continue
        if t in (0, 1):
            hdr, br = parse_hevc_slice_header(nal, sps, pps)
            if hdr["deblock_disabled"] == 0:
                raise ValueError(
                    "HEVC: deblocking must be disabled (m58/m59 scope)"
                )
            if hdr["sao_luma"] or hdr["sao_chroma"]:
                raise ValueError("HEVC: SAO inter slices unsupported")
            poc = hdr["poc_lsb"]
            # RefPicList construction (8.3.4) with one active entry
            # per list: L0 = used negative pics by ascending delta
            # then used positive; L1 = used positive then negative
            # (x265 keeps extra pics in the RPS for the DPB at ref=1
            # — list tail, never referenced).
            used_neg = [d for d, u in hdr["rps"]["neg"] if u]
            used_pos = [d for d, u in hdr["rps"]["pos"] if u]
            l0 = [poc - d for d in used_neg] + [
                poc + d for d in used_pos
            ]
            l1 = [poc + d for d in used_pos] + [
                poc - d for d in used_neg
            ]
            is_b = hdr["slice_type"] == 0
            if hdr["n_ref_l0"] != 1 or not l0 or (
                is_b and (hdr["n_ref_l1"] != 1 or not l1)
            ):
                raise ValueError(
                    f"HEVC: need one active ref per list, got "
                    f"l0={hdr['n_ref_l0']} l1={hdr['n_ref_l1']} "
                    f"rps={hdr['rps']}"
                )
            ref_pocs = [l0[0]] + ([l1[0]] if is_b else [])
            for rp in ref_pocs:
                if rp not in dpb:
                    raise ValueError(
                        f"HEVC: reference POC {rp} not in DPB"
                    )
            dec = _CabacDecoder(br)
            # 9.3.2.2 Table 9-4: P initType = cabac_init ? 2 : 1,
            # B initType = cabac_init ? 1 : 2
            if is_b:
                init_type = 1 if hdr["cabac_init_flag"] else 2
            else:
                init_type = 2 if hdr["cabac_init_flag"] else 1
            ctx = _Ctx(hdr["slice_qp"], init_type)
            col_info = None
            if hdr.get("tmvp"):
                col_idx = 0 if hdr.get("col_from_l0", 1) or not is_b else 1
                col_info = dpb_col.get(ref_pocs[col_idx])
            d = HevcInterSliceDecoder(
                sps, pps, hdr, [dpb[rp] for rp in ref_pocs],
                ref_pocs, poc, col_info=col_info,
            )
            d.decode(dec, ctx)
            y = d.y.astype(np.uint8)
            cb = d.cb.astype(np.uint8)
            cr = d.cr.astype(np.uint8)
            dpb[poc] = (y, cb, cr)
            dpb_col[poc] = d.col_summary()
            st = {
                "poc": poc,
                "slice_type": "B" if is_b else "P",
                "slice_qp": hdr["slice_qp"],
                "n_cu": d.n_cu,
                "n_skip": d.n_skip,
                "n_merge": d.n_merge,
                "n_amvp": d.n_amvp,
                "n_intra_cu": d.n_intra_cu,
                "n_frac_mv": d.n_frac_mv,
                "n_bi": d.n_bi,
                "n_uni_l0": d.n_uni[0],
                "n_uni_l1": d.n_uni[1],
                "n_tmvp_merge": d.n_tmvp_merge,
                "n_tmvp_amvp": d.n_tmvp_amvp,
                "n_coeff": d.n_coeff,
            }
            out.append((y, cb, cr, st))
            continue
        raise ValueError(f"HEVC: unexpected NAL type {t}")
    return out


def decode_hevc_libde265_frames(nals: list[bytes]) -> list[tuple]:
    """All frames of an Annex-B stream through libde265 (the
    single-frame decode_hevc_libde265 keeps its original still-image
    contract); returns [(y, cb, cr), ...] in output order."""
    import ctypes

    lib = _de265()
    ctx = lib.de265_new_decoder()
    try:
        stream = b"".join(b"\x00\x00\x00\x01" + n for n in nals)
        lib.de265_push_data(ctx, stream, len(stream), 0, None)
        lib.de265_flush_data(ctx)
        more = ctypes.c_int(1)
        frames = []
        for _ in range(1000):
            lib.de265_decode(ctx, ctypes.byref(more))
            while True:
                pic = lib.de265_get_next_picture(ctx)
                if not pic:
                    break
                planes = []
                for c in range(3):
                    w = lib.de265_get_image_width(pic, c)
                    h = lib.de265_get_image_height(pic, c)
                    stride = ctypes.c_int()
                    ptr = lib.de265_get_image_plane(
                        pic, c, ctypes.byref(stride)
                    )
                    arr = np.ctypeslib.as_array(
                        ptr, shape=(h, stride.value)
                    )
                    planes.append(arr[:, :w].copy())
                frames.append(tuple(planes))
            if not more.value:
                break
        if not frames:
            raise ValueError("libde265: no frames decoded")
        return frames
    finally:
        lib.de265_free_decoder(ctx)


# -- 8.7.2 deblocking filter (m55) -------------------------------------------
#
# HEVC's beta'/tc' tables (Table 8-11) — unlike H.264's alpha/beta/tc0,
# which have no in-container source — are EXTRACTED from the system
# binaries: the byte sequences below appear once in libde265.so.0 and
# three times in libx265.so.199 (4 in-binary copies, all agreeing;
# re-extracted in tests/test_hevc_decode.py), never hand-recalled.

HEVC_DEBLOCK_BETA = (
    (0,) * 16
    + tuple(range(6, 19))
    + tuple(range(20, 65, 2))
)
HEVC_DEBLOCK_TC = (
    (0,) * 18
    + (1,) * 9
    + (2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11,
       13, 14, 16, 18, 20, 22, 24)
)
assert len(HEVC_DEBLOCK_BETA) == 52 and len(HEVC_DEBLOCK_TC) == 54


def _deblock_luma_edges(plane, edges, qp, beta_off, tc_off, vertical):
    """8.7.2.5.3/.5.7 luma edge filtering for bS=2 (all-intra) edges.
    ``edges`` is a set of (pos, seg) 4-line segments; for horizontal
    edges the plane is viewed transposed so one code path serves
    both.  In-place on the int64 plane; safe because parallel edges
    sit >= 8 samples apart while each filter touches ±3."""
    pl = plane if vertical else plane.T
    beta = HEVC_DEBLOCK_BETA[_clip3(0, 51, qp + beta_off)]
    tc = HEVC_DEBLOCK_TC[_clip3(0, 53, qp + 2 + tc_off)]
    if beta == 0:
        return
    for x, ys in sorted(edges):
        seg = pl[ys:ys + 4]
        p = seg[:, x - 4:x][:, ::-1]  # p[i][k] = p_k of row i
        q = seg[:, x:x + 4]
        dp0 = abs(int(p[0, 2] - 2 * p[0, 1] + p[0, 0]))
        dp3 = abs(int(p[3, 2] - 2 * p[3, 1] + p[3, 0]))
        dq0 = abs(int(q[0, 2] - 2 * q[0, 1] + q[0, 0]))
        dq3 = abs(int(q[3, 2] - 2 * q[3, 1] + q[3, 0]))
        dpq0, dpq3 = dp0 + dq0, dp3 + dq3
        if dpq0 + dpq3 >= beta:
            continue

        def dsam(r, dpq):
            return (
                2 * dpq < (beta >> 2)
                and abs(int(p[r, 3] - p[r, 0]))
                + abs(int(q[r, 0] - q[r, 3])) < (beta >> 3)
                and abs(int(p[r, 0] - q[r, 0])) < ((5 * tc + 1) >> 1)
            )

        if dsam(0, dpq0) and dsam(3, dpq3):
            for r in range(4):
                p0, p1, p2, p3 = (int(p[r, k]) for k in range(4))
                q0, q1, q2, q3 = (int(q[r, k]) for k in range(4))
                seg[r, x - 1] = _clip3(
                    p0 - 2 * tc, p0 + 2 * tc,
                    (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                )
                seg[r, x - 2] = _clip3(
                    p1 - 2 * tc, p1 + 2 * tc,
                    (p2 + p1 + p0 + q0 + 2) >> 2,
                )
                seg[r, x - 3] = _clip3(
                    p2 - 2 * tc, p2 + 2 * tc,
                    (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                )
                seg[r, x] = _clip3(
                    q0 - 2 * tc, q0 + 2 * tc,
                    (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                )
                seg[r, x + 1] = _clip3(
                    q1 - 2 * tc, q1 + 2 * tc,
                    (q2 + q1 + q0 + p0 + 2) >> 2,
                )
                seg[r, x + 2] = _clip3(
                    q2 - 2 * tc, q2 + 2 * tc,
                    (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                )
        else:
            dep = 1 if dp0 + dp3 < ((beta + (beta >> 1)) >> 3) else 0
            deq = 1 if dq0 + dq3 < ((beta + (beta >> 1)) >> 3) else 0
            for r in range(4):
                p0, p1, p2 = (int(p[r, k]) for k in range(3))
                q0, q1, q2 = (int(q[r, k]) for k in range(3))
                delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
                if abs(delta) >= tc * 10:
                    continue
                delta = _clip3(-tc, tc, delta)
                seg[r, x - 1] = _clip3(0, 255, p0 + delta)
                seg[r, x] = _clip3(0, 255, q0 - delta)
                if dep:
                    dp = _clip3(
                        -(tc >> 1), tc >> 1,
                        (((p2 + p0 + 1) >> 1) - p1 + delta) >> 1,
                    )
                    seg[r, x - 2] = _clip3(0, 255, p1 + dp)
                if deq:
                    dq = _clip3(
                        -(tc >> 1), tc >> 1,
                        (((q2 + q0 + 1) >> 1) - q1 - delta) >> 1,
                    )
                    seg[r, x + 1] = _clip3(0, 255, q1 + dq)


def _deblock_chroma_edges(plane, edges, qp_c, tc_off, vertical):
    """8.7.2.5.5 chroma filtering (bS=2 only, which all-intra edges
    are): per-line delta with no strong/weak decision."""
    pl = plane if vertical else plane.T
    tc = HEVC_DEBLOCK_TC[_clip3(0, 53, qp_c + 2 + tc_off)]
    if tc == 0:
        return
    for x, ys in sorted(edges):
        seg = pl[ys:ys + 4]
        for r in range(seg.shape[0]):
            p0, p1 = int(seg[r, x - 1]), int(seg[r, x - 2])
            q0, q1 = int(seg[r, x]), int(seg[r, x + 1])
            delta = _clip3(
                -tc, tc, (((q0 - p0) << 2) + p1 - q1 + 4) >> 3
            )
            seg[r, x - 1] = _clip3(0, 255, p0 + delta)
            seg[r, x] = _clip3(0, 255, q0 - delta)


def hevc_deblock(
    y, cb, cr, tu_rects_y, tu_rects_c, qp: int,
    qp_cb_off: int = 0, qp_cr_off: int = 0,
    beta_off: int = 0, tc_off: int = 0,
) -> None:
    """Apply the 8.7 deblocking filter in place to int64 planes of an
    all-intra picture: every TB edge on the luma 8-grid (chroma
    8-grid) has bS = 2.  Vertical edges across the whole picture
    first, then horizontal edges over the vertically-filtered output
    — HEVC's two-pass order, which (unlike H.264's per-MB
    interleaving) makes each pass order-independent since parallel
    edges are >= 8 samples apart."""
    for vertical in (True, False):
        edges = set()
        for (x0, y0, n) in tu_rects_y:
            pos, lo = (x0, y0) if vertical else (y0, x0)
            if pos > 0 and pos % 8 == 0:
                for s in range(lo, lo + n, 4):
                    edges.add((pos, s))
        _deblock_luma_edges(y, edges, qp, beta_off, tc_off, vertical)
        cedges = set()
        for (x0, y0, n) in tu_rects_c:
            pos, lo = (x0, y0) if vertical else (y0, x0)
            if pos > 0 and pos % 8 == 0:
                for s in range(lo, lo + n, 4):
                    cedges.add((pos, s))
        for plane, off in ((cb, qp_cb_off), (cr, qp_cr_off)):
            qp_c = _CHROMA_QP[_clip3(0, 57, qp + off)]
            _deblock_chroma_edges(plane, cedges, qp_c, tc_off, vertical)


def decode_hevc_islice(
    nal: bytes, sps: dict, pps: dict, allow_deblock: bool = False,
    allow_sao: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
    """Decode one IRAP I-slice NAL to (y, cb, cr, stats)."""
    hdr, br = parse_hevc_slice_header(nal, sps, pps)
    if hdr["deblock_disabled"] == 0 and not allow_deblock:
        raise ValueError(
            "HEVC: deblocking must be disabled (x265:no-deblock)"
        )
    if (hdr["sao_luma"] or hdr["sao_chroma"]) and not allow_sao:
        raise ValueError("HEVC: SAO-filtered slices unsupported")
    dec = _CabacDecoder(br)
    ctx = _Ctx(hdr["slice_qp"])
    d = HevcIntraSliceDecoder(sps, pps, hdr)
    d.decode(dec, ctx)
    if hdr["deblock_disabled"] == 0:
        hevc_deblock(
            d.y, d.cb, d.cr, d.tu_rects_y, d.tu_rects_c,
            hdr["slice_qp"], hdr["cb_qp_offset"], hdr["cr_qp_offset"],
            hdr["beta_offset"], hdr["tc_offset"],
        )
    if hdr["sao_luma"] or hdr["sao_chroma"]:
        d.apply_sao()
    stats = {
        "slice_qp": hdr["slice_qp"],
        "n_cu": d.n_cu,
        "n_tu": d.n_tu,
        "n_coeff": d.n_coeff,
        "deblocked": int(hdr["deblock_disabled"] == 0),
        "sao": int(bool(hdr["sao_luma"] or hdr["sao_chroma"])),
        "n_sao_ctbs": sum(
            1
            for prm in d.sao_params.values()
            if any(p["type"] for p in prm)
        ),
    }
    return d.y.astype(np.uint8), d.cb.astype(np.uint8), d.cr.astype(
        np.uint8
    ), stats


def decode_heic_from_spec(
    container: bytes, allow_deblock: bool = False, allow_sao: bool = False
):
    """Walk a HEIC container (hvcC param sets + mdat length-prefixed
    NALs — the m49 structure layer) and decode its single I-slice
    from spec.  Returns (y, cb, cr, stats)."""
    hvcc_spans = isobmff_find(container, ["meta", "iprp", "ipco", "hvcC"])
    if len(hvcc_spans) != 1:
        raise ValueError(f"HEIC: {len(hvcc_spans)} hvcC boxes")
    o, e = hvcc_spans[0]
    cfg = parse_hvcc(container[o:e])
    sps_nals = [n for t, n in cfg["param_sets"] if t == 33]
    pps_nals = [n for t, n in cfg["param_sets"] if t == 34]
    if len(sps_nals) != 1 or len(pps_nals) != 1:
        raise ValueError("HEIC: expected exactly one SPS and one PPS")
    sps = parse_hevc_sps_full(sps_nals[0])
    pps = parse_hevc_pps(pps_nals[0])
    md = isobmff_find(container, ["mdat"])
    if len(md) != 1:
        raise ValueError(f"HEIC: {len(md)} mdat boxes")
    o, e = md[0]
    ln_sz = cfg["nal_length_size"]
    p = o
    slices = []
    while p < e:
        ln = int.from_bytes(container[p:p + ln_sz], "big")
        p += ln_sz
        nal = container[p:p + ln]
        p += ln
        t = (nal[0] >> 1) & 0x3F
        if t in (19, 20, 21):
            slices.append(nal)
        elif t in (32, 33, 34, 39, 40):
            continue  # parameter sets / SEI
        else:
            raise ValueError(f"HEIC: unexpected NAL type {t} in mdat")
    if len(slices) != 1:
        raise ValueError(f"HEIC: {len(slices)} slice NALs")
    return decode_hevc_islice(slices[0], sps, pps, allow_deblock, allow_sao)


def heic_nal_units(container: bytes) -> list[bytes]:
    """All NAL units of a single-image HEIC: hvcC parameter sets
    followed by the mdat's length-prefixed payload NALs."""
    o, e = isobmff_find(container, ["meta", "iprp", "ipco", "hvcC"])[0]
    cfg = parse_hvcc(container[o:e])
    nals = [n for _, n in cfg["param_sets"]]
    o, e = isobmff_find(container, ["mdat"])[0]
    ln_sz = cfg["nal_length_size"]
    p = o
    while p < e:
        ln = int.from_bytes(container[p:p + ln_sz], "big")
        p += ln_sz
        nals.append(container[p:p + ln])
        p += ln
    return nals


# ---------------------------------------------------------------------------
# Direct libde265 adjudicator.  libheif's decode path routes YCbCr
# planes through its shared colour pipeline, which clips out-of-gamut
# samples (the r13 finding that set m47/m48's in-gamut box) — that
# clipping corrupts full-range comparisons even for YCbCr output, so
# the bit-exactness tests talk to libde265 itself: raw Annex-B in,
# raw decoder planes out, no colour handling anywhere.
# ---------------------------------------------------------------------------

_DE265 = None


def _de265():
    global _DE265
    if _DE265 is None:
        import ctypes

        lib = ctypes.CDLL("libde265.so.0")
        lib.de265_new_decoder.restype = ctypes.c_void_p
        lib.de265_push_data.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.de265_flush_data.argtypes = [ctypes.c_void_p]
        lib.de265_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)
        ]
        lib.de265_get_next_picture.argtypes = [ctypes.c_void_p]
        lib.de265_get_next_picture.restype = ctypes.c_void_p
        lib.de265_get_image_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.de265_get_image_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.de265_get_image_plane.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)
        ]
        lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
        _DE265 = lib
    return _DE265


def have_libde265() -> bool:
    try:
        _de265()
        return True
    except OSError:
        return False


def decode_hevc_libde265(nals: list[bytes]):
    """Decode NAL units through libde265 directly; returns raw
    (y, cb, cr) planes exactly as the reference decoder reconstructs
    them (pre any colour handling)."""
    import ctypes

    lib = _de265()
    ctx = lib.de265_new_decoder()
    try:
        stream = b"".join(b"\x00\x00\x00\x01" + n for n in nals)
        lib.de265_push_data(ctx, stream, len(stream), 0, None)
        lib.de265_flush_data(ctx)
        more = ctypes.c_int(1)
        pic = None
        for _ in range(100):
            lib.de265_decode(ctx, ctypes.byref(more))
            p = lib.de265_get_next_picture(ctx)
            if p:
                pic = p
                break
            if not more.value:
                break
        if not pic:
            raise ValueError("libde265: no picture decoded")
        planes = []
        for c in range(3):
            w = lib.de265_get_image_width(pic, c)
            h = lib.de265_get_image_height(pic, c)
            stride = ctypes.c_int()
            ptr = lib.de265_get_image_plane(pic, c, ctypes.byref(stride))
            arr = np.ctypeslib.as_array(ptr, shape=(h, stride.value))
            planes.append(arr[:, :w].copy())
        return planes[0], planes[1], planes[2]
    finally:
        lib.de265_free_decoder(ctx)


# x265 parameter pins that keep the emitted stream inside this
# decoder's declared surface (SAO off, deblock off, no WPP/tiles, no
# sign hiding, fixed QP, 8-bit 4:2:0) while leaving the coding
# quadtree, TU trees, all 35 intra modes, and the full residual
# entropy layer live.  pools/frame-threads pin the r13 thread-pool
# thrash fix.
X265_CONSTRAINED = (
    ("preset", "ultrafast"),
    ("x265:pools", "none"),
    ("x265:frame-threads", "1"),
    ("x265:wpp", "0"),
    ("x265:sao", "0"),
    ("x265:no-deblock", "1"),
    ("x265:min-cu-size", "8"),
    ("x265:tu-intra-depth", "2"),
    ("x265:signhide", "0"),
    ("x265:aq-mode", "0"),
    ("x265:strong-intra-smoothing", "0"),
)


def encode_heic_constrained(
    y, cb, cr, qp: int, ctu: int = 16, deblock: bool = False
) -> bytes:
    """x265-encode planes to a HEIC container under the constrained
    parameter pin (real third-party encoder — the adversarial side of
    the m51 roundtrip).  ``deblock=True`` drops the no-deblock pin so
    x265 signals in-loop deblocking (offsets 0) — the m55 fixture."""
    from table_demo_spark.operators import heif

    params = tuple(
        p for p in X265_CONSTRAINED
        if not (deblock and p[0] == "x265:no-deblock")
    ) + (("x265:ctu", str(ctu)), ("x265:qp", str(qp)))
    return heif.encode_heif(
        y, cb, cr, heif.COMPRESSION_HEVC, params, lossless=False
    )

