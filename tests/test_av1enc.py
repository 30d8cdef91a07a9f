"""llm_m61 AV1 symbol-layer battery: the from-spec AV1 encoder
(od_ec entropy coding over normative default CDFs, lossless KEY
frame, from-scratch AVIF container) adjudicated by BOTH dav1d and
libgav1 — the m31/VP8 pattern inverted onto AV1."""

from __future__ import annotations

import numpy as np
import pytest

try:
    from table_demo_spark.operators import av1enc, heif

    _HAVE = (
        heif.have_libheif()
        and heif.avif_decoder_available(heif.AVIF_CODEC_DAV1D)
        and heif.avif_decoder_available(heif.AVIF_CODEC_LIBGAV1)
    )
except Exception:  # pragma: no cover
    _HAVE = False

pytestmark = pytest.mark.skipif(
    not _HAVE, reason="libavif/dav1d/libgav1 not available"
)


def test_container_rewrap_decodes_identically():
    """The from-scratch AVIF container builder: rewrapping a REAL
    libaom item payload + av1C must decode bit-identically to the
    original container through BOTH decoders — validates every box
    (ftyp/meta/hdlr/pitm/iloc/iinf/iprp/ipma/mdat) against libavif's
    strict parser with the AV1 payload held constant."""
    rng = np.random.RandomState(3)
    y = rng.randint(0, 256, (40, 56)).astype(np.uint8)
    cb = rng.randint(0, 256, (20, 28)).astype(np.uint8)
    cr = rng.randint(0, 256, (20, 28)).astype(np.uint8)
    orig = heif.encode_avif_still_q(y, cb, cr, 12)
    av1c, payload, w, h = av1enc.extract_avif_item(orig)
    mine = av1enc.build_avif_container(w, h, av1c, payload)
    for cc in (heif.AVIF_CODEC_DAV1D, heif.AVIF_CODEC_LIBGAV1):
        want = heif.decode_avif_libavif(orig, cc)
        got = heif.decode_avif_libavif(mine, cc)
        for g, r in zip(got, want):
            assert (g == r).all()


def test_od_ec_roundtrip_fuzz():
    """Encoder vs the independent spec decoder: random multi-symbol
    sequences over random strictly-decreasing inverse CDFs, plus
    literal (equiprobable) runs, must round-trip exactly."""
    import random

    rnd = random.Random(42)
    for _ in range(120):
        seq = []
        for _ in range(rnd.randint(3, 60)):
            n = rnd.randint(2, 14)
            cuts = sorted(
                rnd.sample(range(1, 32768), n - 1), reverse=True
            )
            seq.append((rnd.randrange(n), tuple(cuts + [0]), n))
        enc = av1enc.OdEcEncoder()
        for s, icdf, n in seq:
            enc.encode_symbol(s, icdf, n)
        dec = av1enc.OdEcDecoder(enc.done())
        for s, icdf, n in seq:
            assert dec.decode_symbol(icdf, n) == s


def test_sequence_header_roundtrips_through_repo_parser():
    """Our 5.5.1 reduced-still writer must parse back through the
    repo's m50 sequence-header parser with every field as written."""
    from table_demo_spark.operators.codecs import (
        parse_av1_sequence_header,
    )

    for (w, h) in ((64, 64), (40, 56), (33, 64)):
        seq = parse_av1_sequence_header(
            av1enc.write_sequence_header(w, h)
        )
        assert (seq["width"], seq["height"]) == (w, h)
        assert seq["reduced_header"] == 1
        assert seq["still_picture"] == 1
        assert seq.get("use_128x128_superblock", 0) == 0
        assert seq.get("enable_superres", 0) == 0


def test_layer_a_uniform_through_both_decoders():
    """The flagship: our od_ec-coded KEY frame (PARTITION_NONE,
    skip=1, DC_PRED over the mined default CDFs) must decode to the
    uniform 128 picture through dav1d AND libgav1 at every
    partition-symbol-coded dimension pair."""
    for w in (40, 48, 56, 64):
        for h in (40, 64):
            data = av1enc.build_layer_a_avif(w, h)
            for cc in (
                heif.AVIF_CODEC_DAV1D, heif.AVIF_CODEC_LIBGAV1,
            ):
                y, cb, cr = heif.decode_avif_libavif(data, cc)
                assert y.shape == (h, w)
                assert (y == 128).all()
                assert (cb == 128).all() and (cr == 128).all()


def test_skip_cdf_class_is_behaviorally_pinned():
    """Non-vacuity for the behavioral skip extraction: only icdf
    values in class 17 (1088..1151) decode uniform — a neighbouring
    class desyncs the entropy decode and the picture is NOT uniform
    (AV1_SKIP_ICDF0 = 1097 = 32768 - 31671 sits inside)."""
    assert av1enc.AV1_SKIP_ICDF0 >> 6 == 17
    good = av1enc.build_layer_a_avif(64, 64, av1enc.AV1_SKIP_ICDF0)
    y, cb, cr = heif.decode_avif_libavif(good, heif.AVIF_CODEC_DAV1D)
    assert (y == 128).all()
    for wrong in (15 << 6, 22 << 6, 28000):
        bad = av1enc.build_layer_a_avif(64, 64, wrong)
        try:
            y, cb, cr = heif.decode_avif_libavif(
                bad, heif.AVIF_CODEC_DAV1D
            )
            assert not (
                (y == 128).all()
                and (cb == 128).all()
                and (cr == 128).all()
            ), wrong
        except Exception:
            pass  # a desynced stream may also fail outright


def test_mined_cdf_vectors_cross_validate_in_binaries():
    """The mined partition/kf/uv default-CDF vectors must appear
    byte-for-byte in libaom AND libgav1 (dav1d stores split SIMD
    layouts — its 8-value row prefixes are checked instead)."""
    t = av1enc.mined_default_cdfs()
    aom = open("/lib/x86_64-linux-gnu/libaom.so.3", "rb").read()
    gav = open("/lib/x86_64-linux-gnu/libgav1.so.1", "rb").read()
    dav = open("/lib/x86_64-linux-gnu/libdav1d.so.6", "rb").read()
    for name, vec in t.items():
        pat = np.array(vec[:-1], "<u2").tobytes()  # informative values
        assert aom.find(pat) >= 0, name
        assert gav.find(pat) >= 0, name
        pre = np.array(vec[: min(8, len(vec) - 1)], "<u2").tobytes()
        assert dav.find(pre) >= 0, name


def test_out_of_scope_dims_fail_loudly():
    with pytest.raises(ValueError, match="partition symbol"):
        av1enc.build_layer_a_avif(32, 32)
    with pytest.raises(ValueError, match="partition symbol"):
        av1enc.build_layer_a_avif(96, 64)


def test_layer_b0_all_zero_txbs_uniform_both_decoders():
    """Layer-B0 (r16 groundwork pinned now): a skip=0 stream whose
    256 luma + 128 chroma 4x4 txbs each code all_zero=1 over the
    behaviorally-extracted txb_skip values (luma ctx0 26876, chroma
    no-neighbour ctx 22807 — the qctx-0 TX_4X4 row identified at
    libaom u16 2232867) must decode uniform-128 through BOTH
    decoders; a wrong txb_skip class desyncs (non-vacuity)."""
    av = av1enc

    def tile(luma_v, chroma_v):
        t = av.mined_default_cdfs()
        enc = av.OdEcEncoder()
        enc.encode_symbol(0, t["partition64_ctx0"], 10)
        enc.encode_symbol(0, (av.AV1_SKIP_ICDF0, 0), 2)  # skip = 0
        enc.encode_symbol(0, t["kf_y_00"], 13)
        enc.encode_symbol(0, t["uv_dc_nocfl"], 13)
        for _ in range(256):
            enc.encode_symbol(1, (luma_v, 0), 2)
        for _ in range(128):
            enc.encode_symbol(1, (chroma_v, 0), 2)
        return enc.done()

    def wrap(t):
        seq = av.obu(1, av.write_sequence_header(64, 64))
        frame = av.obu(6, av.write_frame_obu(64, 64, t))
        return av.build_avif_container(
            64, 64, bytes([0x81, 0, 0x0C, 0]) + seq, seq + frame
        )

    good = wrap(tile(26876, 22807))
    for cc in (heif.AVIF_CODEC_DAV1D, heif.AVIF_CODEC_LIBGAV1):
        y, cb, cr = heif.decode_avif_libavif(good, cc)
        assert (y == 128).all() and (cb == 128).all() and (cr == 128).all()
    # the aom .rodata row these values come from
    aom = open("/lib/x86_64-linux-gnu/libaom.so.3", "rb").read()
    row = np.array(
        [26876, 0, 0, 20656, 0, 0, 10833, 0, 0, 12479], "<u2"
    ).tobytes()
    assert aom.find(row) >= 0
    # wrong class desyncs: the picture is not uniform (or errors)
    bad = wrap(tile(20000, 22807))
    try:
        y, cb, cr = heif.decode_avif_libavif(bad, heif.AVIF_CODEC_DAV1D)
        assert not (
            (y == 128).all() and (cb == 128).all() and (cr == 128).all()
        )
    except Exception:
        pass
