"""llm_m51 HEVC slice-decode battery: the from-spec intra decoder
(operators/hevc.py) against REAL x265 streams, adjudicated bit-exact
by libde265 called DIRECTLY (raw decoder planes — libheif's colour
pipeline clips out-of-gamut YCbCr, the r13 finding, so it must not
sit between the two decoders being compared)."""

from __future__ import annotations

import numpy as np
import pytest

from table_demo_spark.operators import hevc

try:
    from table_demo_spark.operators.heif import have_libheif

    _HAVE = have_libheif() and hevc.have_libde265()
except Exception:  # pragma: no cover
    _HAVE = False

pytestmark = pytest.mark.skipif(
    not _HAVE, reason="libheif/libde265 not available"
)


def _roundtrip(y, cb, cr, qp, ctu=16):
    data = hevc.encode_heic_constrained(y, cb, cr, qp, ctu=ctu)
    nals = hevc.heic_nal_units(data)
    want = hevc.decode_hevc_libde265(nals)
    got = hevc.decode_heic_from_spec(data)
    return want, got[:3], got[3]


def _assert_exact(want, got):
    for name, w, g in zip("y cb cr".split(), want, got):
        assert w.shape == g.shape, name
        assert (w == g).all(), (
            name,
            np.argwhere(w.astype(int) != g.astype(int))[:5],
        )


def test_flat_image_roundtrip_exact():
    want, got, st = _roundtrip(
        np.full((64, 64), 100, np.uint8),
        np.full((32, 32), 120, np.uint8),
        np.full((32, 32), 130, np.uint8),
        30,
    )
    _assert_exact(want, got)
    assert st["n_cu"] >= 16


def test_full_range_noise_all_qps_exact():
    """Dense full-range noise maximises residual entropy (every
    greater1/greater2/rice path live); QP sweep covers dequant
    shifts both sides of per-vs-iShift."""
    rng = np.random.RandomState(7)
    for qp in (12, 22, 30, 37, 45):
        want, got, st = _roundtrip(
            rng.randint(0, 256, (64, 64)).astype(np.uint8),
            rng.randint(0, 256, (32, 32)).astype(np.uint8),
            rng.randint(0, 256, (32, 32)).astype(np.uint8),
            qp,
        )
        _assert_exact(want, got)
        assert st["n_coeff"] > 500


def test_gradients_exercise_angular_modes_exact():
    gy, gx = np.mgrid[0:64, 0:64]
    for k, (a, b) in enumerate(((2, 1), (1, 3), (0, 2), (3, 0))):
        y = np.clip(40 + a * gy + b * gx, 0, 255).astype(np.uint8)
        cb = np.clip(90 + (gy[:32, :32] * b), 0, 255).astype(np.uint8)
        cr = np.clip(90 + (gx[:32, :32] * a), 0, 255).astype(np.uint8)
        want, got, _ = _roundtrip(y, cb, cr, 28 + 3 * k)
        _assert_exact(want, got)


def test_partial_ctu_boundary_forced_splits_exact():
    """72x64 with ctu 16: the right CTU column is partial, forcing
    inferred quadtree splits at the picture boundary."""
    rng = np.random.RandomState(11)
    y = rng.randint(0, 256, (64, 72)).astype(np.uint8)
    cb = rng.randint(0, 256, (32, 36)).astype(np.uint8)
    cr = rng.randint(0, 256, (32, 36)).astype(np.uint8)
    want, got, _ = _roundtrip(y, cb, cr, 32)
    _assert_exact(want, got)


def test_ctu32_with_strong_smoothing_paths_exact():
    """ctu 32 reaches 32x32 TUs (32-point DCT) and the 8.4.4.2.3
    strong-intra-smoothing arm on smooth content."""
    gy, gx = np.mgrid[0:96, 0:96]
    y = ((gy + gx) * 255 // 190).astype(np.uint8)
    cb = np.full((48, 48), 118, np.uint8)
    cr = np.full((48, 48), 138, np.uint8)
    data = hevc.encode_heic_constrained(y, cb, cr, 26, ctu=32)
    # re-enable the encoder's strong smoothing for this stream
    from table_demo_spark.operators import heif

    params = tuple(
        p for p in hevc.X265_CONSTRAINED
        if p[0] != "x265:strong-intra-smoothing"
    ) + (("x265:ctu", "32"), ("x265:qp", "26"))
    data = heif.encode_heif(
        y, cb, cr, heif.COMPRESSION_HEVC, params, lossless=False
    )
    nals = hevc.heic_nal_units(data)
    want = hevc.decode_hevc_libde265(nals)
    got = hevc.decode_heic_from_spec(data)
    _assert_exact(want, got[:3])


def test_mixed_texture_many_cu_shapes_exact():
    rng = np.random.RandomState(3)
    y = np.zeros((64, 64), np.uint8)
    y[:32, :32] = rng.randint(0, 256, (32, 32))
    gy, gx = np.mgrid[0:32, 0:32]
    y[:32, 32:] = (4 * gy).astype(np.uint8)
    y[32:, :32] = 200
    y[32:, 32:] = (128 + 60 * np.sin(gx / 3)).astype(np.uint8)
    cb = rng.randint(100, 156, (32, 32)).astype(np.uint8)
    cr = np.full((32, 32), 128, np.uint8)
    # x265 only splits below the CTU when RD favours it: qp=12/ctu=16
    # goes all the way to 8x8 NxN (probed: n_cu=64), qp=30/ctu=32
    # yields a mixed-depth tree, qp=42/ctu=16 stays unsplit — together
    # the three cover unsplit, partially-split and fully-split trees.
    seen_cu = []
    for qp, ctu in ((12, 16), (30, 32), (42, 16)):
        want, got, st = _roundtrip(y, cb, cr, qp, ctu=ctu)
        _assert_exact(want, got)
        seen_cu.append(st["n_cu"])
    assert max(seen_cu) > 16  # quadtree actually split somewhere


def test_hevc_init_values_match_x265_rodata():
    """Every declared context-init table (HEVC_CTX_INIT) must appear
    byte-for-byte in libx265's .rodata (x265 embeds the spec tables
    per slice type; all three rows of every element were found at
    adjacent offsets).  Guards the hand-recall trap (the r10 VP8L
    lesson): a misrecalled byte fails here, not mid-battery."""
    blob = open("/lib/x86_64-linux-gnu/libx265.so.199", "rb").read()
    for name, rows in hevc.HEVC_CTX_INIT.items():
        for i, row in enumerate(rows):
            assert blob.find(bytes(row)) >= 0, (name, i, row)


def test_dct_matrices_match_binary_tables():
    """The recursively generated integer DCT bases equal the
    binaries' own transform tables: int16 in libx265 (4/8/16/32),
    int8 g_t32 in libde265."""
    x265 = open("/lib/x86_64-linux-gnu/libx265.so.199", "rb").read()
    de265 = open("/lib/x86_64-linux-gnu/libde265.so.0", "rb").read()
    for n in (8, 16, 32):
        m = hevc._dct_matrix(n)
        assert x265.find(m.astype("<i2").tobytes()) >= 0, n
    t32 = hevc._dct_matrix(32)
    assert de265.find(t32.astype("i1").tobytes()) >= 0
    t4 = hevc._dct_matrix(4)
    assert (np.abs(t4) <= 127).all()
    assert (t4[1] == np.array([83, 36, -36, -83])).all()


def test_dst4_matches_spec_rows():
    assert (hevc._DST4[0] == np.array([29, 55, 74, 84])).all()
    assert (hevc._DST4[3] == np.array([55, -84, 74, -29])).all()


def test_truncated_container_fails_loudly():
    y = np.full((64, 64), 100, np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    data = hevc.encode_heic_constrained(y, c, c, 30)
    with pytest.raises(ValueError):
        hevc.decode_heic_from_spec(data[: len(data) // 2])


def test_unsupported_tools_fail_loudly():
    """A stream with deblocking left on must be rejected, not
    mis-decoded.  Deblocking (unlike SAO, whose per-slice flags are an
    RD decision x265 may set to 0 anyway) is a PPS/slice-header
    property, so the guard fires deterministically."""
    from table_demo_spark.operators import heif

    y = np.full((64, 64), 100, np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    params = tuple(
        p for p in hevc.X265_CONSTRAINED if p[0] != "x265:no-deblock"
    ) + (("x265:ctu", "16"), ("x265:qp", "30"))
    data = heif.encode_heif(
        y, c, c, heif.COMPRESSION_HEVC, params, lossless=False
    )
    with pytest.raises(ValueError, match="deblocking"):
        hevc.decode_heic_from_spec(data)


def test_hevc_deblock_roundtrip_exact_all_qps():
    """m55: deblocking ON — from-spec reconstruction + the full 8.7.2
    filter must match libde265 bit-for-bit across QPs (strong-filter
    low-QP, weak-filter mid, tc=0-ish high), CTU sizes, and content
    shapes (noise = dense edges mostly unfiltered; gradients with
    block steps = prime deblocking territory)."""
    rng = np.random.RandomState(21)
    gy, gx = np.mgrid[0:64, 0:64]
    fixtures = [
        (rng.randint(0, 256, (64, 64)).astype(np.uint8),
         rng.randint(0, 256, (32, 32)).astype(np.uint8),
         rng.randint(0, 256, (32, 32)).astype(np.uint8)),
        ((64 + gx + (gy // 16) * 40).clip(0, 255).astype(np.uint8),
         (100 + gx[:32, :32]).clip(0, 255).astype(np.uint8),
         np.full((32, 32), 128, np.uint8)),
    ]
    for y, cb, cr in fixtures:
        for qp, ctu in ((12, 16), (30, 32), (45, 16)):
            data = hevc.encode_heic_constrained(
                y, cb, cr, qp, ctu=ctu, deblock=True
            )
            want = hevc.decode_hevc_libde265(hevc.heic_nal_units(data))
            got = hevc.decode_heic_from_spec(data, allow_deblock=True)
            assert got[3]["deblocked"] == 1
            _assert_exact(want, got[:3])


def test_hevc_deblock_actually_modifies_pixels():
    """Non-vacuity: on a blocky gradient at mid QP the filter must
    change pixels vs the raw reconstruction (same stream, filter
    skipped at the decoder object level)."""
    gy, gx = np.mgrid[0:64, 0:64]
    y = (64 + gx + (gy // 16) * 40).clip(0, 255).astype(np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    data = hevc.encode_heic_constrained(y, c, c, 30, deblock=True)
    filtered = hevc.decode_heic_from_spec(data, allow_deblock=True)
    # raw recon: rerun the slice decode and skip the filter call
    nals = hevc.heic_nal_units(data)
    sps = hevc.parse_hevc_sps_full(
        [n for n in nals if (n[0] >> 1) & 0x3F == 33][0]
    )
    pps = hevc.parse_hevc_pps(
        [n for n in nals if (n[0] >> 1) & 0x3F == 34][0]
    )
    sl = [n for n in nals if (n[0] >> 1) & 0x3F in (19, 20, 21)][0]
    hdr, br = hevc.parse_hevc_slice_header(sl, sps, pps)
    dec = hevc._CabacDecoder(br)
    ctx = hevc._Ctx(hdr["slice_qp"])
    d = hevc.HevcIntraSliceDecoder(sps, pps, hdr)
    d.decode(dec, ctx)
    assert (filtered[0].astype(int) != d.y.astype(int)).sum() > 50


def test_hevc_deblock_tables_re_extract_from_system_binaries():
    """HEVC_DEBLOCK_BETA / HEVC_DEBLOCK_TC must appear byte-for-byte
    in BOTH libde265 and libx265 .rodata (4 in-binary copies total) —
    the tables are extracted, never recalled (the r10/r13 rule; this
    is the extraction source H.264's deblock tables lack)."""
    import re as _re

    beta = bytes(hevc.HEVC_DEBLOCK_BETA)
    tc = bytes(hevc.HEVC_DEBLOCK_TC)
    total = {"beta": 0, "tc": 0}
    for path in (
        "/usr/lib/x86_64-linux-gnu/libde265.so.0",
        "/usr/lib/x86_64-linux-gnu/libx265.so.199",
    ):
        try:
            blob = open(path, "rb").read()
        except OSError:
            pytest.skip(f"{path} not present")
        total["beta"] += len(list(_re.finditer(_re.escape(beta), blob)))
        total["tc"] += len(list(_re.finditer(_re.escape(tc), blob)))
    assert total["beta"] >= 2 and total["tc"] >= 2, total


def test_hevc_no_deblock_streams_still_reject_by_default():
    """The m51 path must keep failing loudly on deblock-signalled
    streams unless the caller opts in."""
    y = np.full((64, 64), 100, np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    data = hevc.encode_heic_constrained(y, c, c, 30, deblock=True)
    with pytest.raises(ValueError, match="deblocking"):
        hevc.decode_heic_from_spec(data)


def test_heic_grid_resolution_and_dual_decoder_crop():
    """m56: sub-64 HEIC derived-item chain — grid descriptor ==
    derived ispe == libheif's decoded shape; padded decode bit-exact
    vs libde265; 1x1-grid top-left crop bit-exact vs libheif's own
    grid-derived decode (margin-box fixtures keep lossy output inside
    the r13 gamut box — asserted, not assumed)."""
    from table_demo_spark.operators import heif
    from table_demo_spark.operators.codecs import heic_resolve_grid

    rng = np.random.RandomState(5)
    for (w, h, qp) in ((40, 24, 12), (56, 40, 17), (24, 56, 20)):
        y = (90 + rng.randint(0, 71, (h, w))).astype(np.uint8)
        cb = (114 + rng.randint(0, 29, (h // 2, w // 2))).astype(np.uint8)
        cr = (114 + rng.randint(0, 29, (h // 2, w // 2))).astype(np.uint8)
        params = hevc.X265_CONSTRAINED + (
            ("x265:ctu", "16"), ("x265:qp", str(qp)),
        )
        data = heif.encode_heif(
            y, cb, cr, heif.COMPRESSION_HEVC, params, lossless=False
        )
        st = heic_resolve_grid(data)
        assert (st["width"], st["height"]) == (w, h)
        assert st["n_items"] == 2 and st["coded_w"] == 64
        got = hevc.decode_heic_from_spec(data)
        want = hevc.decode_hevc_libde265(hevc.heic_nal_units(data))
        _assert_exact(want, got[:3])
        crop = (
            got[0][:h, :w], got[1][:h // 2, :w // 2],
            got[2][:h // 2, :w // 2],
        )
        assert crop[0].min() >= 70 and crop[0].max() <= 180  # in box
        lh = heif.decode_heif(data)
        _assert_exact(lh, crop)


def test_heic_grid_walk_negatives():
    """>=64 stills are single-item (primary hvc1, no grid) and must
    be rejected; a doctored grid descriptor whose output size
    contradicts the derived ispe must fail the triangulation."""
    from table_demo_spark.operators import heif
    from table_demo_spark.operators.codecs import (
        heic_resolve_grid,
        isobmff_find,
    )

    y = np.full((64, 64), 100, np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    data = hevc.encode_heic_constrained(y, c, c, 30)
    with pytest.raises(ValueError):
        heic_resolve_grid(data)

    y = np.full((40, 24), 100, np.uint8).T  # 24x40? keep simple:
    y = np.full((24, 40), 100, np.uint8)
    cb = np.full((12, 20), 120, np.uint8)
    cr = np.full((12, 20), 130, np.uint8)
    params = hevc.X265_CONSTRAINED + (("x265:ctu", "16"), ("x265:qp", "30"))
    data = bytearray(
        heif.encode_heif(
            y, cb, cr, heif.COMPRESSION_HEVC, params, lossless=False
        )
    )
    (io, ie), = isobmff_find(bytes(data), ["meta", "idat"])
    # ImageGrid: version, flags, rows-1, cols-1, out_w u16, out_h u16
    data[io + 4:io + 6] = (39).to_bytes(2, "big")  # out_w 40 -> 39
    with pytest.raises(ValueError, match="grid output"):
        heic_resolve_grid(bytes(data))


_M57_PARAMS = (
    ("preset", "medium"),
    ("x265:pools", "none"), ("x265:frame-threads", "1"),
    ("x265:wpp", "0"), ("x265:sao", "1"),
    ("x265:min-cu-size", "8"), ("x265:tu-intra-depth", "2"),
    ("x265:signhide", "0"), ("x265:aq-mode", "0"),
    ("x265:strong-intra-smoothing", "0"), ("x265:ctu", "16"),
)


def _m57_fixture(seed):
    rng = np.random.RandomState(seed)
    gy, gx = np.mgrid[0:64, 0:64].astype(float)
    fx, fy = 3 + seed % 5, 4 + seed % 4
    y = (128 + 80 * np.sin(gx / fx) * np.cos(gy / fy)).clip(0, 255)
    y = y.astype(np.uint8)
    r0, c0 = (seed * 13) % 48, (seed * 29) % 48
    y[r0:r0 + 4, :] = 250
    y[:, c0:c0 + 4] = 5
    cb = (128 + 40 * np.sin(gx[:32, :32] / fy)).clip(0, 255).astype(np.uint8)
    cr = (128 + 40 * np.cos(gy[:32, :32] / fx)).clip(0, 255).astype(np.uint8)
    return y, cb, cr


def test_hevc_sao_roundtrip_exact_and_actually_fires():
    """m57: both in-loop filters on — the from-spec chain (recon ->
    8.7.2 deblock -> 8.7.3 SAO) must match libde265 bit-for-bit, and
    across the fixture sweep SAO must genuinely fire (nonzero-type
    CTBs) so the application path is non-vacuous."""
    from table_demo_spark.operators import heif

    total_sao = 0
    for seed, qp in ((1, 20), (2, 22), (3, 25), (7, 19)):
        y, cb, cr = _m57_fixture(seed)
        data = heif.encode_heif(
            y, cb, cr, heif.COMPRESSION_HEVC,
            _M57_PARAMS + (("x265:qp", str(qp)),), lossless=False,
        )
        want = hevc.decode_hevc_libde265(hevc.heic_nal_units(data))
        got = hevc.decode_heic_from_spec(
            data, allow_deblock=True, allow_sao=True
        )
        assert got[3]["sao"] == 1 and got[3]["deblocked"] == 1
        _assert_exact(want, got[:3])
        total_sao += got[3]["n_sao_ctbs"]
    assert total_sao > 0, "SAO never fired across the sweep"


def test_hevc_sao_init_values_match_x265_rodata_block():
    """The SAO context inits must appear in libx265's .rodata in its
    (initType2, initType1, initType0) row order, adjacent to the
    split_transform_flag block — the same extraction discipline as
    HEVC_CTX_INIT (single-value rows are too short to search alone,
    so the full neighbourhood is pinned)."""
    blob = open("/lib/x86_64-linux-gnu/libx265.so.199", "rb").read()
    st = hevc.HEVC_CTX_INIT["split_transform_flag"]
    neigh = (
        bytes(st[2]) + bytes(st[1]) + bytes(st[0])
        + bytes(
            [hevc.HEVC_CTX_INIT["sao_type_idx"][2][0],
             hevc.HEVC_CTX_INIT["sao_type_idx"][1][0],
             hevc.HEVC_CTX_INIT["sao_type_idx"][0][0]]
        )
        + bytes(
            [hevc.HEVC_CTX_INIT["sao_merge_flag"][2][0],
             hevc.HEVC_CTX_INIT["sao_merge_flag"][1][0],
             hevc.HEVC_CTX_INIT["sao_merge_flag"][0][0]]
        )
    )
    assert blob.find(neigh) >= 0


def test_hevc_sao_streams_reject_without_opt_in():
    from table_demo_spark.operators import heif

    y, cb, cr = _m57_fixture(1)
    data = heif.encode_heif(
        y, cb, cr, heif.COMPRESSION_HEVC,
        _M57_PARAMS + (("x265:qp", "20"),), lossless=False,
    )
    with pytest.raises(ValueError, match="SAO"):
        hevc.decode_heic_from_spec(data, allow_deblock=True)
