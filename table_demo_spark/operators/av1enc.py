"""From-spec AV1 ENCODER groundwork (r15; the llm_m61 target): the
m31/VP8 pattern inverted onto AV1 — WE emit minimal spec-valid
streams (od_ec multi-symbol entropy coding over the normative default
CDFs with ``disable_cdf_update=1``) and the REAL third-party decoders
(dav1d AND libgav1, independent codebases selected via libavif
codecChoice) adjudicate every pixel.

This module currently ships the verified layers:

- a from-scratch minimal AVIF (ISOBMFF) container builder
  (``build_avif_container``) — validated by REWRAPPING real libaom
  item payloads and decoding bit-identically through both dav1d and
  libgav1 (tests/test_av1enc.py);
- the od_ec entropy ENCODER (``OdEcEncoder``: 15-bit-probability
  multi-symbol range coding with EC_PROB_SHIFT 6 / EC_MIN_PROB 4,
  carry-propagating MSB-first renormalization, done() flush) plus an
  independent from-spec DECODER (``OdEcDecoder``, AV1 spec 8.2) used
  for cross-implementation roundtrip tests;
- OBU assembly helpers (header + leb128 size field).

The tile/symbol layer (partition/mode/skip coding over the mined
default CDFs — see docs/AV1_CDF_NOTES.md) lands on top of these.

Reference parity: the reference demo has no video path; this is LLM
multimodal extension surface (SURVEY.md m-family).
"""

from __future__ import annotations


def _box(typ: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(
        typ, bytes([version]) + flags.to_bytes(3, "big") + payload
    )


def build_avif_container(
    w: int, h: int, av1c_payload: bytes, item_payload: bytes
) -> bytes:
    """Minimal single-item AVIF: ftyp + meta(hdlr/pitm/iloc/iinf/
    iprp(ipco: ispe+pixi+av1C, ipma)) + mdat.  libavif 0.11's strict
    decode mode requires pixi and the ipma associations; iloc v0
    carries one absolute-offset extent, patched after the meta size
    is known (two-pass assembly)."""
    ftyp = _box(
        b"ftyp", b"avif" + (0).to_bytes(4, "big") + b"avifmif1miaf"
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        (0).to_bytes(4, "big") + b"pict" + bytes(12) + b"\x00",
    )
    pitm = _full(b"pitm", 0, 0, (1).to_bytes(2, "big"))
    iinf = _full(
        b"iinf", 0, 0,
        (1).to_bytes(2, "big")
        + _full(
            b"infe", 2, 0,
            (1).to_bytes(2, "big") + (0).to_bytes(2, "big")
            + b"av01" + b"\x00",
        ),
    )
    ispe = _full(
        b"ispe", 0, 0, w.to_bytes(4, "big") + h.to_bytes(4, "big")
    )
    pixi = _full(b"pixi", 0, 0, bytes([3, 8, 8, 8]))
    ipco = _box(b"ipco", ispe + pixi + _box(b"av1C", av1c_payload))
    # associations: ispe (1), pixi (2), av1C (3, essential)
    ipma = _full(
        b"ipma", 0, 0,
        (1).to_bytes(4, "big") + (1).to_bytes(2, "big")
        + bytes([3, 0x01, 0x02, 0x83]),
    )
    iprp = _box(b"iprp", ipco + ipma)

    def iloc(off: int) -> bytes:
        body = (
            bytes([0x44, 0x00])  # offset_size 4, length_size 4
            + (1).to_bytes(2, "big")  # item_count
            + (1).to_bytes(2, "big")  # item_id
            + (0).to_bytes(2, "big")  # data_reference_index
            + (1).to_bytes(2, "big")  # extent_count
            + off.to_bytes(4, "big")
            + len(item_payload).to_bytes(4, "big")
        )
        return _full(b"iloc", 0, 0, body)

    meta = _full(b"meta", 0, 0, hdlr + pitm + iloc(0) + iinf + iprp)
    mdat_off = len(ftyp) + len(meta) + 8
    meta = _full(
        b"meta", 0, 0, hdlr + pitm + iloc(mdat_off) + iinf + iprp
    )
    return ftyp + meta + _box(b"mdat", item_payload)


def extract_avif_item(data: bytes) -> tuple[bytes, bytes, int, int]:
    """(av1C payload, item payload, width, height) of a single-item
    AVIF — the rewrap-validation source (real libaom containers via
    heif.encode_avif_still_q)."""
    from table_demo_spark.operators.codecs import isobmff_find

    (o, e), = isobmff_find(data, ["meta", "iprp", "ipco", "av1C"])
    av1c = data[o:e]
    (o, e), = isobmff_find(data, ["meta", "iprp", "ipco", "ispe"])
    w = int.from_bytes(data[o + 4:o + 8], "big")
    h = int.from_bytes(data[o + 8:o + 12], "big")
    (o, e), = isobmff_find(data, ["mdat"])
    return av1c, data[o:e], w, h


# ---------------------------------------------------------------------------
# od_ec entropy coder.  The DECODER follows AV1 spec 8.2 (init /
# decode_symbol / renormalization); the ENCODER mirrors the public
# daala-EC algorithm (libaom od_ec_encode_q15): 15-bit probabilities,
# EC_PROB_SHIFT = 6, EC_MIN_PROB = 4, MSB-first output with carry
# propagation.  Cross-implementation roundtrips (encoder vs the
# independent spec decoder) are pinned in tests; the external
# adjudication is the dav1d/libgav1 decode of full streams.
# ---------------------------------------------------------------------------

_EC_PROB_SHIFT = 6
_EC_MIN_PROB = 4


class OdEcEncoder:
    """Multi-symbol range encoder over AOM inverse CDFs (icdf[s] =
    32768 - cum(s+1), strictly decreasing to 0).

    The interval arithmetic (the u/v boundary formulas) is the
    normative part and matches the AV1 decoder bit-for-bit; the
    EMITTED REPRESENTATIVE is any value inside the final interval,
    tracked here as an exact big-integer ``low`` (one Python int in
    the coder's cumulative scale) — which makes carry propagation
    structurally impossible instead of carefully handled.  The
    decoder reads the representative's raw bits MSB-first, so
    ``done()`` just emits the (zero-padded) binary of the chosen
    in-interval value."""

    def __init__(self) -> None:
        self.low = 0  # exact big-int lower bound, scale = 15+shifts
        self.rng = 1 << 15
        self.shifts = 0  # renormalization count

    def encode_symbol(self, s: int, icdf, nsyms: int) -> None:
        """Encode symbol ``s`` with inverse CDF ``icdf`` (nsyms
        values, icdf[nsyms-1] == 0): symbol s occupies
        [rng - u_s, rng - v_s) of the current interval."""
        r = self.rng
        assert 32768 <= r <= 65535, r
        fh = icdf[s]
        v = (
            ((r >> 8) * (fh >> _EC_PROB_SHIFT))
            >> (7 - _EC_PROB_SHIFT)
        ) + _EC_MIN_PROB * (nsyms - s - 1)
        if s > 0:
            fl = icdf[s - 1]
            u = (
                ((r >> 8) * (fl >> _EC_PROB_SHIFT))
                >> (7 - _EC_PROB_SHIFT)
            ) + _EC_MIN_PROB * (nsyms - s)
            self.low += r - u
            r = u - v
        else:
            r -= v
        while r <= 0x7FFF:
            r <<= 1
            self.low <<= 1
            self.shifts += 1
        self.rng = r

    def encode_bool(self, bit: int, p15_zero: int = 16384) -> None:
        """Boolean with P(bit==0) = p15_zero / 32768."""
        self.encode_symbol(bit, (32768 - p15_zero, 0), 2)

    def encode_literal(self, value: int, n: int) -> None:
        """L(n): n equiprobable bools, MSB first (AV1 read_literal)."""
        for i in range(n - 1, -1, -1):
            self.encode_bool((value >> i) & 1)

    def done(self) -> bytes:
        """Pick the in-interval representative with the most zero
        tail bits and emit it MSB-first, zero-padded to bytes."""
        nbits = 15 + self.shifts
        lo, hi = self.low, self.low + self.rng  # [lo, hi)
        # largest z with ceil(lo / 2^z) * 2^z < hi
        z = 0
        while z < nbits:
            step = 1 << (z + 1)
            cand = -(-lo // step) * step
            if cand >= hi:
                break
            z += 1
        step = 1 << z
        c = -(-lo // step) * step
        assert lo <= c < hi
        out = bytearray()
        total = ((nbits + 7) // 8) * 8
        c <<= total - nbits  # zero-pad to a byte boundary
        for i in range(total - 8, -8, -8):
            out.append((c >> i) & 0xFF)
        return bytes(out)


class OdEcDecoder:
    """AV1 spec 8.2 symbol decoder: SymbolValue is the COMPLEMENT of
    the read bits (init ``(1<<15)-1 ^ f(15)``, renorm appends
    complemented bits), the symbol search stops at the first
    boundary at or below it, and the interval update mirrors the
    encoder's u/v arithmetic exactly."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self._bitpos = 0
        self.rng = 1 << 15
        self.val = ((1 << 15) - 1) ^ self._bits(15)

    def _bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = (
                self.data[self._bitpos >> 3]
                if (self._bitpos >> 3) < len(self.data)
                else 0
            )
            v = (v << 1) | ((byte >> (7 - (self._bitpos & 7))) & 1)
            self._bitpos += 1
        return v

    def decode_symbol(self, icdf, nsyms: int) -> int:
        r = self.rng
        val = self.val
        prev = r
        s = -1
        for k in range(nsyms):
            f = icdf[k]
            cur = (
                ((r >> 8) * (f >> _EC_PROB_SHIFT))
                >> (7 - _EC_PROB_SHIFT)
            ) + _EC_MIN_PROB * (nsyms - k - 1)
            if cur <= val:
                s = k
                break
            prev = cur
        assert s >= 0, "od_ec: no symbol interval matched"
        self.val = val - cur
        self.rng = prev - cur
        while self.rng <= 0x7FFF:
            self.rng <<= 1
            self.val = (self.val << 1) | (self._bits(1) ^ 1)
        return s

    def decode_bool(self, p15_zero: int = 16384) -> int:
        return self.decode_symbol((32768 - p15_zero, 0), 2)

    def decode_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bool()
        return v


# -- OBU assembly ------------------------------------------------------------


def leb128(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def obu(obu_type: int, payload: bytes) -> bytes:
    """Low-overhead OBU: header byte (type, has_size=1) + leb128
    size + payload."""
    header = (obu_type << 3) | 0x02  # obu_has_size_field
    return bytes([header]) + leb128(len(payload)) + payload


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes_aligned(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def write_sequence_header(w: int, h: int) -> bytes:
    """5.5.1 reduced-still-picture sequence header with every
    optional tool OFF (no filter_intra / intra-edge-filter /
    superres / cdef / restoration; 8-bit 4:2:0 full-range) — the
    exact field walk the repo's parse_av1_sequence_header reads
    back (round-trip pinned in tests)."""
    bw = _BitWriter()
    bw.put(0, 3)   # seq_profile
    bw.put(1, 1)   # still_picture
    bw.put(1, 1)   # reduced_still_picture_header
    bw.put(0, 5)   # seq_level_idx
    wbits = max(1, (w - 1).bit_length())
    hbits = max(1, (h - 1).bit_length())
    bw.put(wbits - 1, 4)
    bw.put(hbits - 1, 4)
    bw.put(w - 1, wbits)
    bw.put(h - 1, hbits)
    bw.put(0, 1)   # use_128x128_superblock
    bw.put(0, 1)   # enable_filter_intra
    bw.put(0, 1)   # enable_intra_edge_filter
    bw.put(0, 1)   # enable_superres
    bw.put(0, 1)   # enable_cdef
    bw.put(0, 1)   # enable_restoration
    # color_config
    bw.put(0, 1)   # high_bitdepth
    bw.put(0, 1)   # mono_chrome
    bw.put(0, 1)   # color_description_present
    bw.put(1, 1)   # color_range (full)
    bw.put(0, 2)   # chroma_sample_position (profile 0 = 4:2:0)
    bw.put(0, 1)   # separate_uv_delta_q
    bw.put(0, 1)   # film_grain_params_present
    bw.put(1, 1)   # trailing one bit
    return bw.bytes_aligned()


def write_frame_obu(w: int, h: int, tile_data: bytes) -> bytes:
    """OBU_FRAME payload: 5.9.2 uncompressed header for the
    reduced-still shape (KEY, shown, LOSSLESS base_q_idx=0,
    disable_cdf_update=1 so the default CDFs never adapt, single
    uniform tile) + byte alignment + the od_ec tile payload."""
    bw = _BitWriter()
    bw.put(1, 1)   # disable_cdf_update
    bw.put(0, 1)   # allow_screen_content_tools
    bw.put(0, 1)   # render_and_frame_size_different
    bw.put(1, 1)   # uniform_tile_spacing_flag
    sb_cols = (w + 63) // 64
    sb_rows = (h + 63) // 64
    if sb_cols > 1 or sb_rows > 1:
        raise ValueError("av1enc: single-superblock pictures only")
    bw.put(0, 8)   # base_q_idx = 0 (lossless)
    bw.put(0, 1)   # delta_q_y_dc coded flag
    bw.put(0, 1)   # delta_q_u_dc
    bw.put(0, 1)   # delta_q_u_ac
    bw.put(0, 1)   # using_qmatrix
    bw.put(0, 1)   # segmentation_enabled
    # base_q_idx == 0 -> no delta_q_present bit; CodedLossless -> no
    # loop filter / cdef / lr / tx_mode bits; intra -> no ref mode
    bw.put(0, 1)   # reduced_tx_set
    return bw.bytes_aligned() + tile_data


# default_skip_cdfs[ctx0] as an AOM inverse-CDF value: behaviorally
# EXTRACTED from dav1d itself (r15): only v >> 6 enters the od_ec
# arithmetic, and adaptive class-elimination over crafted streams
# (tests pin the discriminating cases) leaves exactly class 17
# (1088..1151); 1097 = 32768 - 31671, the recalled forward-probability
# form, lands inside it — recall upgraded to extraction-grade
# evidence by the behavioral pin.
AV1_SKIP_ICDF0 = 1097


def layer_a_tile(skip_icdf0: int, tables: dict) -> bytes:
    """Layer-A tile payload for one 64x64 superblock:
    PARTITION_NONE, skip=1, DC_PRED luma + chroma — four od_ec
    symbols over the default CDFs (see docs/AV1_CDF_NOTES.md)."""
    enc = OdEcEncoder()
    enc.encode_symbol(0, tables["partition64_ctx0"], 10)
    enc.encode_symbol(1, (skip_icdf0, 0), 2)
    enc.encode_symbol(0, tables["kf_y_00"], 13)
    enc.encode_symbol(0, tables["uv_dc_nocfl"], 13)
    return enc.done()


def mined_default_cdfs() -> dict:
    """The default-CDF vectors mined from libaom's .rodata (layout
    notes + 3-binary cross-validation in docs/AV1_CDF_NOTES.md),
    re-extracted at call time so a library swap fails loudly."""
    import numpy as np

    blob = open("/lib/x86_64-linux-gnu/libaom.so.3", "rb").read()
    a = np.frombuffer(
        blob[: len(blob) // 2 * 2], dtype="<u2"
    ).astype(int)
    kf_off = 4477056 // 2
    part_off = kf_off - 624
    uv_off = 2238128
    t = {
        "partition64_ctx0": tuple(
            int(x) for x in a[part_off + 12 * 11: part_off + 12 * 11 + 10]
        ),
        "kf_y_00": tuple(int(x) for x in a[kf_off: kf_off + 13]),
        "uv_dc_nocfl": tuple(int(x) for x in a[uv_off: uv_off + 13]),
    }
    for name, vec in t.items():
        if vec[-1] != 0 or not all(
            vec[i] > vec[i + 1] for i in range(len(vec) - 2)
        ):
            raise ValueError(f"av1enc: mined CDF {name} shape drifted")
    return t


def build_layer_a_avif(
    w: int, h: int, skip_icdf0: int = AV1_SKIP_ICDF0
) -> bytes:
    """A complete from-spec AVIF still: our sequence header (also in
    av1C configOBUs), our lossless KEY frame OBU with the layer-A
    tile, wrapped in our from-scratch container.  Decodes to a
    uniform 128 picture through dav1d AND libgav1 when every table
    and the od_ec emission match the normative defaults.  Dims must
    make the 64x64 partition symbol PRESENT (5.11.4: both block
    halves inside the picture), i.e. 32 < w,h <= 64."""
    if not (32 < w <= 64 and 32 < h <= 64):
        raise ValueError(
            "av1enc layer A: dims must be in (32, 64] so the 64x64 "
            "partition symbol is coded (not inferred)"
        )
    seq = obu(1, write_sequence_header(w, h))
    tables = mined_default_cdfs()
    frame = obu(6, write_frame_obu(w, h, layer_a_tile(skip_icdf0, tables)))
    av1c = bytes([0x81, 0x00, 0x0C, 0x00]) + seq
    return build_avif_container(w, h, av1c, seq + frame)
