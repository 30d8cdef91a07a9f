"""Property tests (SURVEY §5.1): the native-expression ports of the
reference's scalar functions (TaxiFunctions.scala:25-90) agree with
straight-Python ports of the formulas across randomized and boundary
inputs, including the float->double promotion order."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

LON_EAST, LON_WEST = -73.7, -74.05
LAT_NORTH, LAT_SOUTH = 41.0, 40.5
DLON, DLAT = 0.0014, 0.00125


# straight ports of TaxiFunctions.scala (float inputs, double math)
def py_in_nyc(lon: np.float32, lat: np.float32) -> bool:
    lon, lat = float(lon), float(lat)
    return not (lon > LON_EAST or lon < LON_WEST) and not (
        lat > LAT_NORTH or lat < LAT_SOUTH
    )


def py_to_cell_id(lon: np.float32, lat: np.float32) -> int:
    x_idx = math.floor((abs(LON_WEST) - abs(float(lon))) / DLON)
    y_idx = math.floor((LAT_NORTH - float(lat)) / DLAT)
    return int(x_idx + y_idx * 250)


def py_to_coords(cell: int) -> tuple[float, float]:
    x_idx = cell % 250
    y_idx = cell // 250
    lon = -(abs(LON_WEST) - x_idx * DLON - DLON / 2)
    lat = LAT_NORTH - y_idx * DLAT - DLAT / 2
    return lon, lat


def _sample_points(n: int = 2000) -> list[tuple[float, float]]:
    rng = np.random.default_rng(42)
    lon = rng.uniform(-74.2, -73.5, n).astype(np.float32)
    lat = rng.uniform(40.3, 41.2, n).astype(np.float32)
    pts = list(zip(lon.tolist(), lat.tolist()))
    # bbox and grid boundary values + the empty-coordinate default
    for b in [
        (LON_WEST, LAT_SOUTH),
        (LON_EAST, LAT_NORTH),
        (LON_WEST, LAT_NORTH),
        (LON_EAST, LAT_SOUTH),
        (0.0, 0.0),
        (-74.05 + DLON, 41.0 - DLAT),
    ]:
        pts.append((np.float32(b[0]).item(), np.float32(b[1]).item()))
    return pts


def test_in_nyc_and_cell_id_match_reference_formulas(spark):
    from table_demo_spark.functions.taxi import in_nyc, to_cell_id

    pts = _sample_points()
    df = spark.createDataFrame(pts, "lon float, lat float")
    got = df.select(
        in_nyc(F.col("lon").cast("double"), F.col("lat").cast("double")).alias("in_nyc"),
        to_cell_id(
            F.col("lon").cast("double"), F.col("lat").cast("double")
        ).alias("cell"),
        "lon",
        "lat",
    ).collect()
    for r in got:
        lon32, lat32 = np.float32(r["lon"]), np.float32(r["lat"])
        assert r["in_nyc"] == py_in_nyc(lon32, lat32), (r["lon"], r["lat"])
        assert r["cell"] == py_to_cell_id(lon32, lat32), (r["lon"], r["lat"])


def test_to_coords_roundtrip_and_formula(spark):
    from table_demo_spark.functions.taxi import to_cell_id, to_coords

    cells = list(range(0, 250 * 400, 37)) + [0, 249, 250, 62499]
    df = spark.createDataFrame([(c,) for c in cells], "cell int")
    coords = to_coords(F.col("cell"))
    got = df.select(
        "cell", coords["lon"].alias("lon"), coords["lat"].alias("lat")
    ).collect()
    for r in got:
        lon, lat = py_to_coords(r["cell"])
        assert r["lon"] == pytest.approx(lon, abs=0)
        assert r["lat"] == pytest.approx(lat, abs=0)
    # cell-center roundtrip: to_cell_id(to_coords(c)) == c
    back = df.select(
        "cell", to_cell_id(coords["lon"], coords["lat"]).alias("cell2")
    ).collect()
    for r in back:
        assert r["cell"] == r["cell2"]


def test_hour_of_day_and_to_long(spark):
    from table_demo_spark.functions.taxi import hour_of_day, to_long_millis

    ms = [0, 1, 86_399_999, 86_400_000, 1_359_849_600_123]
    df = spark.createDataFrame([(m,) for m in ms], "ms long").select(
        "ms",
        hour_of_day(F.col("ms")).alias("mod"),
        to_long_millis(F.timestamp_millis("ms")).alias("back"),
    )
    for r in df.collect():
        assert r["mod"] == r["ms"] % 86_400_000  # TaxiFunctions.scala:84
        assert r["back"] == r["ms"]  # toLong is epoch-ms, not seconds


# ---------------------------------------------------------------------------
# Round-2 operator properties: chunk coverage, URL canonicalization
# idempotence, LCG shard stability. Hypothesis generates the inputs;
# one Spark job evaluates the whole batch (properties are cheap, the
# session round-trip is not).
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    n_tokens=st.integers(min_value=1, max_value=200),
    size=st.integers(min_value=2, max_value=64),
    overlap=st.integers(min_value=0, max_value=32),
)
def test_chunk_geometry_properties(n_tokens, size, overlap):
    """Pure-geometry property (no Spark needed): starts 1, 1+stride, …
    cover every token index, neighbouring chunks overlap by
    size - stride, and no chunk is empty."""
    stride = max(1, size - overlap)
    starts = list(range(1, n_tokens + 1, stride))
    covered = set()
    for s in starts:
        chunk = range(s, min(s + size - 1, n_tokens) + 1)
        assert len(chunk) > 0
        covered.update(chunk)
    assert covered == set(range(1, n_tokens + 1))
    for a, b in zip(starts, starts[1:]):
        got_overlap = max(0, (a + size - 1) - b + 1)
        assert got_overlap == max(0, size - stride) or a + size - 1 >= n_tokens


_url_part = st.text(
    alphabet="abcdefgzXYZ019", min_size=1, max_size=8
)


@settings(max_examples=10, deadline=None)
@given(
    host=_url_part,
    path=st.lists(_url_part, max_size=3),
    www=st.booleans(),
    params=st.lists(
        st.tuples(st.sampled_from(["a", "b", "utm_x", "gclid", "z"]), _url_part),
        max_size=4,
    ),
    frag=st.booleans(),
)
def test_canonical_url_is_idempotent_and_order_insensitive(
    spark_lazy, host, path, www, params, frag
):
    from table_demo_spark.functions.text import canonical_url

    spark = spark_lazy()
    base = ("https://" + ("WWW." if www else "") + host + ".eX.com/"
            + "/".join(path))
    q = "&".join(f"{k}={v}" for k, v in params)
    url = base + (("?" + q) if q else "") + ("#f" if frag else "")
    url_rev = base + (
        ("?" + "&".join(f"{k}={v}" for k, v in reversed(params))) if q else ""
    )
    rows = (
        spark.createDataFrame([(url, url_rev)], "u string, v string")
        .select(
            canonical_url("u").alias("cu"),
            canonical_url("v").alias("cv"),
        )
        .collect()[0]
    )
    # param order never splits dedup groups
    assert rows["cu"] == rows["cv"]
    # canonical form is a fixed point
    fixed = (
        spark.createDataFrame([(rows["cu"],)], "u string")
        .select(canonical_url("u").alias("c"))
        .collect()[0]["c"]
    )
    assert fixed == rows["cu"]
    assert "#" not in rows["cu"] and "utm_" not in rows["cu"]
    assert "gclid" not in rows["cu"]


def test_lcg_shard_is_stable_under_repartition(spark):
    from table_demo_spark.operators.mixing import shard_assign

    df = spark.range(0, 300).withColumnRenamed("id", "k")
    a = {r["k"]: r["shard"] for r in shard_assign(df, "k", 16).collect()}
    b = {
        r["k"]: r["shard"]
        for r in shard_assign(df.repartition(7), "k", 16).collect()
    }
    assert a == b


def test_skyline_rewrite_matches_bruteforce_on_random_frames(spark):
    """Randomized check of the a43 sort-rewrite against the quadratic
    dominance definition — duplicate prices, duplicate points, and
    degenerate (all-equal) frames included. Batched: one Spark job
    over many random frames via a frame-id partition column."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    rows = []
    for fid in range(25):
        n = int(rng.integers(1, 30))
        prices = rng.integers(0, 8, n) * 1.5  # force duplicate prices
        sizes = rng.integers(0, 10, n)
        rows += [
            (fid, i, float(p), int(sz))
            for i, (p, sz) in enumerate(zip(prices, sizes))
        ]
    rows += [(98, 0, 1.0, 1), (99, 0, 2.0, 2), (99, 1, 2.0, 2)]  # edges
    df = spark.createDataFrame(
        rows, "fid int, pid long, price double, size int"
    )
    per_price = df.groupBy("fid", "price").agg(F.max("size").alias("pmax"))
    w = (
        Window.partitionBy("fid")
        .orderBy(F.col("price").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lt = per_price.withColumn("run_lt", F.max("pmax").over(w))
    dominated = (
        F.col("run_lt").isNotNull() & (F.col("run_lt") >= F.col("size"))
    ) | (F.col("pmax") > F.col("size"))
    got = {
        (r.fid, r.pid)
        for r in df.join(lt, ["fid", "price"]).filter(~dominated).collect()
    }
    by_fid: dict[int, list] = {}
    for fid, pid, p, sz in rows:
        by_fid.setdefault(fid, []).append((pid, p, sz))
    want = set()
    for fid, pts in by_fid.items():
        for pid, p, sz in pts:
            dom = any(
                qp <= p and qs >= sz and (qp < p or qs > sz)
                for _, qp, qs in pts
            )
            if not dom:
                want.add((fid, pid))
    assert got == want


def test_ivm_merge_randomized_splits(spark):
    """merge(agg(A), agg(B)) == agg(A ∪ B) for arbitrary split points
    and key skews — the self-maintainability property, batched into a
    handful of Spark jobs."""
    import numpy as np
    from pyspark.sql import functions as F

    from table_demo_spark.operators.cdc import merge_agg_states

    rng = np.random.default_rng(11)
    rows = [
        (int(rng.integers(0, 9)), i, int(rng.integers(-50, 50)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k long, i long, v long")

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
        )

    want = sorted(map(tuple, agg(df).collect()))
    for cut in (0, 37, 150, 299, 300):
        a, b = df.filter(F.col("i") < cut), df.filter(F.col("i") >= cut)
        got = sorted(
            map(
                tuple,
                merge_agg_states(agg(a), agg(b), ["k"], ["n", "s"]).collect(),
            )
        )
        assert got == want, f"cut={cut}"


# -- round-3: codec + distributed-rank properties ---------------------------


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_property(h, w, seed):
    """decode(encode(x)) == x for every raster shape, and the resize
    index law holds for arbitrary (possibly non-divisible) geometries."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(arr)) == arr).all()
    oh, ow = max(1, h // 2), max(1, w // 3)
    out = resize_nearest(arr, ow, oh)
    assert out.shape == (oh, ow, 3)
    for y in range(oh):
        for x in range(ow):
            assert (out[y, x] == arr[(y * h) // oh, (x * w) // ow]).all()


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=64,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    """decode(encode(x)) preserves every int16 sample (including the
    extremes and odd lengths whose data chunk needs word-align padding
    handling) and the sample rate."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_wav, encode_wav

    arr = np.array(samples, dtype=np.int16)
    got_rate, got = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    assert (got == arr).all()


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    """decode(encode(x)) == x for every raster shape: the encoder
    cycles filter types per scanline, so any image with h >= 5 pushes
    all five predictors (None/Sub/Up/Average/Paeth) through zlib and
    back."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()


def test_png_decoder_golden_vectors():
    """Decoder-only golden test — hand-built PNG bytes, filtered BY
    HAND per the PNG spec, never touching encode_png: breaks the
    inverse-pair circularity a round-trip test cannot (an encoder and
    decoder wrong in the same way still round-trip). Covers Sub and Up
    filters, RGBA alpha-drop via decode_image, greyscale broadcast,
    and CRC rejection."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from table_demo_spark.operators.codecs import decode_png
    from table_demo_spark.operators.multimodal import decode_image

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    magic = b"\x89PNG\r\n\x1a\n"
    # 2x2 RGB: row0 Sub-filtered, row1 Up-filtered (hand-computed).
    # pixels: row0 = (10,20,30),(13,25,37); row1 = (11,22,33),(15,28,41)
    r0 = bytes([1, 10, 20, 30, 3, 5, 7])
    r1 = bytes([2, 1, 2, 3, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        magic
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(r0 + r1))
        + chunk(b"IEND", b"")
    )
    want = np.array(
        [[[10, 20, 30], [13, 25, 37]], [[11, 22, 33], [15, 28, 41]]],
        dtype=np.uint8,
    )
    assert (decode_png(png) == want).all()

    # greyscale (color type 0) broadcasts to 3 channels in decode_image
    g_ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    g_png = (
        magic
        + chunk(b"IHDR", g_ihdr)
        + chunk(b"IDAT", zlib.compress(bytes([0, 7, 9])))
        + chunk(b"IEND", b"")
    )
    assert (decode_image(g_png) == [[[7, 7, 7], [9, 9, 9]]]).all()

    # RGBA (color type 6): decode_image drops alpha
    a_ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    a_png = (
        magic
        + chunk(b"IHDR", a_ihdr)
        + chunk(b"IDAT", zlib.compress(bytes([0, 1, 2, 3, 200])))
        + chunk(b"IEND", b"")
    )
    assert (decode_image(a_png) == [[[1, 2, 3]]]).all()

    # corrupted CRC must be rejected, not silently decoded
    bad = bytearray(png)
    bad[-17] ^= 0xFF  # a byte inside the IDAT crc/body region
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_binned_quantiles_match_discrete_definition_on_random_frames(spark):
    """Randomized check of the t26 histogram-sketch operator against
    the discrete-quantile definition computed in straight Python: at
    bin_width=1 each p{pct} equals q+1 where q is the smallest value
    whose cumulative count covers pct% (ceil semantics); at width W it
    equals the exclusive upper edge of q's bin, W*(q//W + 1) — so the
    estimate error is bounded by W by construction. Duplicates, single
    -value groups, and values straddling bin edges included. Batched:
    one Spark job over many random groups via the group column."""
    import math

    import numpy as np

    from table_demo_spark.operators.sketch import binned_quantiles

    rng = np.random.default_rng(11)
    w = 16
    rows, expected = [], {}
    for gid in range(20):
        n = int(rng.integers(1, 60))
        # cluster around bin edges to exercise the boundary cases
        vals = sorted(
            int(v)
            for v in np.concatenate(
                [rng.integers(0, 200, n), rng.choice([0, 15, 16, 17, 31, 32], 3)]
            )
        )
        rows += [(gid, v) for v in vals]
        exp = {}
        for pct in (50, 90, 99):
            k = math.ceil(pct / 100 * len(vals))  # 100*cum >= pct*total
            q = vals[k - 1]
            exp[f"p{pct}_exact"] = q + 1
            exp[f"p{pct}_est"] = w * (q // w + 1)
        expected[gid] = exp
    df = spark.createDataFrame(rows, "gid int, v long")
    est = binned_quantiles(df, ["gid"], "v", w, suffix="_est")
    exact = binned_quantiles(df, ["gid"], "v", 1, suffix="_exact")
    got = {
        r["gid"]: r.asDict()
        for r in est.join(exact, "gid").collect()
    }
    assert set(got) == set(expected)
    for gid, exp in expected.items():
        for col, want in exp.items():
            assert got[gid][col] == want, (gid, col, got[gid], exp)


# ---------------------------------------------------------------------------
# r9 codec-layer property tests: roundtrip invariants over adversarial
# randomized inputs (no Spark session needed — pure codec layer).
# ---------------------------------------------------------------------------


def test_vp8l_roundtrip_property():
    """encode_webp_lossless . decode_webp_lossless == id for random
    rasters of arbitrary small shapes, including degenerate 1-pixel
    and single-row/column images and constant rasters (single-symbol
    prefix codes on every channel)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from table_demo_spark.operators.codecs import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 9),
        seed=st.integers(0, 2**31 - 1),
        constant=st.booleans(),
    )
    def check(w, h, seed, constant):
        rng = np.random.default_rng(seed)
        if constant:
            arr = np.full((h, w, 3), seed % 256, dtype=np.uint8)
        else:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_webp_lossless(encode_webp_lossless(arr)) == arr).all()

    check()


def test_annexb_roundtrip_property():
    """Annex B escape/unescape and the full NAL walk are inverses for
    arbitrary payload bytes — including zero-runs and embedded start
    codes — and the escaped wire never contains a start-code or an
    unprotected zero-triple."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from table_demo_spark.operators.codecs import (
        decode_annexb,
        encode_annexb,
        h264_escape_rbsp,
        h264_unescape_rbsp,
    )

    payload = st.binary(min_size=0, max_size=64)
    zeroish = st.lists(
        st.sampled_from([0, 0, 0, 1, 2, 3, 255]), min_size=0, max_size=64
    ).map(bytes)

    @settings(max_examples=50, deadline=None)
    @given(raw=st.one_of(payload, zeroish))
    def check_escape(raw):
        wire = h264_escape_rbsp(raw)
        assert h264_unescape_rbsp(wire) == raw
        assert b"\x00\x00\x00" not in wire
        assert b"\x00\x00\x01" not in wire
        assert b"\x00\x00\x02" not in wire

    @settings(max_examples=25, deadline=None)
    @given(
        payloads=st.lists(st.one_of(payload, zeroish), min_size=1, max_size=5),
        types=st.lists(st.sampled_from([1, 5, 6, 7, 8]), min_size=5, max_size=5),
    )
    def check_walk(payloads, types):
        nals = [
            (3 if t in (5, 7, 8) else 0, t, p)
            for p, t in zip(payloads, types)
        ]
        dec = decode_annexb(encode_annexb(nals))
        assert [(d["ref_idc"], d["nal_type"], d["rbsp"]) for d in dec] == nals

    check_escape()
    check_walk()


def test_mp3_walk_property():
    """Any spec list over the full bitrate table walks back exactly,
    and total length equals the header arithmetic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from table_demo_spark.operators.codecs import (
        MP3_BITRATES_KBPS,
        decode_mp3_frames,
        encode_mp3_frames,
        mp3_frame_length,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        specs=st.lists(
            st.tuples(st.integers(1, 14), st.integers(0, 1)),
            min_size=1,
            max_size=8,
        ),
        sr_idx=st.integers(0, 2),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(specs, sr_idx, seed):
        from table_demo_spark.operators.codecs import MP3_SAMPLERATES

        sr = MP3_SAMPLERATES[sr_idx]
        need = sum(
            mp3_frame_length(MP3_BITRATES_KBPS[b], sr, p) - 4
            for b, p in specs
        )
        rng = np.random.default_rng(seed)
        filler = rng.integers(0, 256, need, dtype=np.uint8).tobytes()
        data = encode_mp3_frames(specs, filler, sr_idx)
        frames = decode_mp3_frames(data)
        assert [(f["bitrate_kbps"], f["padding"]) for f in frames] == [
            (MP3_BITRATES_KBPS[b], p) for b, p in specs
        ]
        assert all(f["samplerate"] == sr for f in frames)
        assert sum(f["frame_len"] for f in frames) == len(data)

    check()


def test_vp8_bool_coder_roundtrip_property():
    """RFC 6386 boolean arithmetic coder: any (probability, bit)
    sequence round-trips through encode -> flush -> decode, including
    carry-propagation chains (probabilities near 1 produce long 0xFF
    runs in the low end)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from table_demo_spark.operators.codecs import (
        _Vp8BoolDecoder,
        _Vp8BoolEncoder,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=254),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=1,
            max_size=600,
        )
    )
    def check(seq):
        enc = _Vp8BoolEncoder()
        for p, b in seq:
            enc.put(p, b)
        dec = _Vp8BoolDecoder(enc.flush())
        for p, b in seq:
            assert dec.get(p) == b

    check()


def test_p17_quota_math_is_bigint_exact_at_adversarial_counts(spark):
    """p17's quota/thresh arithmetic must stay integer-exact past the
    2^53 double-precision ceiling (r12 ADVICE): at real corpus counts
    budget*w products exceed what DOUBLE division represents, and the
    old double-then-cast route diverged from the oracle's exact `//`
    by one at quota boundaries.  Property: the shipped Spark DIV
    expression equals Python's exact floor division on non-negative
    longs whose products blow through 2^53.

    Headroom note (the formula's OWN ceiling, now pinned here): both
    engines compute in 64-bit, so budget*w must stay < 2^63 and
    quota*2^20 < 2^63 (quota < 2^43 ~ 8.8e12 sampled docs) — orders
    of magnitude past any real corpus, but a hard error (Spark ANSI
    ARITHMETIC_OVERFLOW), not a silent wrong answer, beyond it."""
    cases = [
        # (budget, w, wsum, n): budget*w > 2^53 (double-inexact zone)
        # while budget*w < 2^63 and quota*2^20 < 2^63 (64-bit exact)
        (10**12, 10**6, 3 * 10**6 + 7, 10**9),
        ((1 << 53) + 1, 3, 70_001, (1 << 40) + 9),
        (10**12, 999_983, 10**6 + 3, 10**12 + 1),
        (2**62 // 1000, 999, 10**6 + 7, 2**41 + 5),
        (987_654_321_987, 31_623, 97_337, 1_000_000_007),
    ]
    rows = spark.createDataFrame(
        [(b, w, s, n) for b, w, s, n in cases],
        "budget long, w long, wsum long, n long",
    )
    got = (
        rows.withColumn(
            "quota", F.expr("CAST((budget * w) DIV wsum AS BIGINT)")
        )
        .withColumn(
            "thresh",
            F.least(
                F.lit(1 << 20).cast("long"),
                F.expr(f"CAST((quota * {1 << 20}) DIV n AS BIGINT)"),
            ),
        )
        .orderBy("budget", "w")
        .collect()
    )
    for row, (b, w, s, n) in zip(got, sorted(cases)):
        quota = (b * w) // s
        assert row["quota"] == quota, (b, w, s)
        assert row["thresh"] == min(1 << 20, (quota * (1 << 20)) // n)
        # and the old double route genuinely CAN'T represent these —
        # the test would be vacuous otherwise
        assert b * w > 2**53
