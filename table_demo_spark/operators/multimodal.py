"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The convention for image/audio/video at 100 TB: the payload is an
opaque ``binary`` column (or a (path, offset, length) pointer into blob
storage), metadata travels in typed sibling columns, and all decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — one Python
process per partition, zero-copy batches, never row-at-a-time.

Decode is REAL across the codec spectrum: ``decode_image`` /
``resize_image`` parse binary PPM, PNG (zlib + filter predictors),
GIF (LZW), and baseline JPEG (Huffman + DCT — a true transform
code), and ``decoded_pcm_stats`` walks RIFF/WAVE chunks, all via the
pure-numpy codecs in operators/codecs.py — the decoded-value
statistics are oracle-gated (llm_m11..m17). Remaining formats
(WebP/AVIF/MP3/H.264) are the documented external-codec extension
point; their stand-in byte-level features keep the identical
plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = "doc_id long, n_bytes long, prefix_hex string"


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the binary payload convention from the text fixture:
    payload = utf-8 bytes. Real pipelines read parquet/iceberg with a
    true binary column; everything downstream is identical."""
    return docs.select("doc_id", F.encode(F.col(text_col), "utf-8").alias("payload"))


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an (h, w, 3) uint8 numpy raster,
    dispatching on magic bytes.

    REAL for binary PPM (P6), PNG, GIF, AND baseline JPEG — the
    decoders in operators/codecs.py handle genuinely COMPRESSED wire
    formats with stdlib-only tools (PNG: zlib + five filter
    predictors; GIF: variable-width LZW + palette; JPEG: Huffman
    entropy decode + dequantize + IDCT — a true transform-coded
    format). Greyscale is broadcast to 3 channels, RGBA drops alpha.
    Remaining formats (WebP/AVIF, progressive/chroma-subsampled JPEG)
    are the documented external-codec extension point: sniff their
    magic here and wire PIL/cv2; the surrounding mapInPandas plumbing
    is codec-agnostic."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        GIF_MAGIC,
        JPEG_MAGIC,
        PNG_MAGIC,
        PPM_MAGIC,
        decode_gif,
        decode_jpeg,
        decode_png,
        decode_ppm,
    )

    data = bytes(payload)
    if data.startswith(PPM_MAGIC):
        return decode_ppm(data)
    if data.startswith(PNG_MAGIC):
        arr = decode_png(data)
        if arr.shape[2] == 1:
            return np.repeat(arr, 3, axis=2)
        return arr[:, :, :3]
    if data.startswith(GIF_MAGIC[:3]):
        # still-image view of an animated GIF: first frame, palette-
        # mapped to RGB (LZW decode + palette lookup, codecs.decode_gif)
        frames, palette = decode_gif(data)
        return palette[frames[0]]
    if data.startswith(JPEG_MAGIC[:2]):
        grey = decode_jpeg(data)
        return np.repeat(grey[:, :, None], 3, axis=2)
    if data.startswith(b"RIFF") and data[8:12] == b"WEBP":
        # lossless -> VP8L decode (RFC 9649); lossy -> the r10 VP8
        # keyframe decoder (RFC 6386) + libwebp's fixed-point BT.601
        # CSC with the default "fancy" chroma upsampler — the RGB
        # output is bit-exact against libwebp MODE_RGB
        # (tests/test_vp8.py), keeping the dispatcher integer-exact
        from table_demo_spark.operators.codecs import (
            decode_webp_lossless,
            decode_webp_lossy,
            vp8_yuv_to_rgb,
        )

        try:
            return decode_webp_lossless(data)
        except ValueError:
            y, u, v = decode_webp_lossy(data)
            return vp8_yuv_to_rgb(y, u, v, fancy=True)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        # ISOBMFF: AVIF (dav1d/libaom) and HEIC (libde265) decode
        # through the system libheif — real third-party codecs, the
        # r13 close of the long-standing AVIF/HEIC NotImplementedError
        # guard.  RGB comes from libheif's own colour conversion.
        from table_demo_spark.operators.heif import decode_heif_rgb

        return decode_heif_rgb(data)
    raise NotImplementedError(
        "PPM/PNG/GIF/baseline-JPEG/WebP/AVIF/HEIC decode in-container;"
        " other formats need their codec library — the mapInPandas"
        " plumbing is codec-agnostic"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload (nearest-neighbor, integer-exact index
    mapping) and re-encode in the same format. REAL for binary PPM;
    runs inside the same mapInPandas batch loop as :func:`binary_meta`
    / :func:`frame_sample` — decode, resize, re-encode per batch
    element, Arrow-transfer the new binary column."""
    from table_demo_spark.operators.codecs import encode_ppm, resize_nearest

    return encode_ppm(resize_nearest(decode_image(payload), width, height))


def binary_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Byte-level feature extraction over binary payloads via Arrow-
    batched mapInPandas: (doc_id, n_bytes, prefix_hex). This is the
    exact execution shape a real decode/resize/frame-sample UDF uses —
    swap the per-batch lambda body, keep the plumbing."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "prefix_hex": payloads.map(lambda b: bytes(b)[:4].hex().upper()),
                }
            )

    return docs_with_payload.mapInPandas(extract, schema=BINARY_META_SCHEMA)


FEATURE_DIMS = 8
FEATURE_SCHEMA = "doc_id long, features array<double>"
_FEATURE_SALT = b"#feat"


def feature_extract(docs_with_payload: DataFrame) -> DataFrame:
    """Per-payload feature vector via Arrow-batched mapInPandas — the
    embedding-model-inference execution shape: one Python worker per
    partition, whole Arrow batches in, a float vector column out. The
    extractor body here is a deterministic stand-in (md5-derived
    unit-interval values — no model weights in this container); a real
    pipeline swaps the per-batch body for an ONNX/torch forward pass
    and keeps the identical plumbing, schema, and partitioning."""
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.md5(bytes(payload) + _FEATURE_SALT).hexdigest()
                feats.append(
                    [
                        int(digest[4 * j : 4 * j + 4], 16) / 65535.0
                        for j in range(FEATURE_DIMS)
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return docs_with_payload.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_no int, frame_hex string"


def frame_sample(
    docs_with_payload: DataFrame, frame_bytes: int = 16, every: int = 4
) -> DataFrame:
    """Fixed-size frame extraction + every-k-th sampling over binary
    payloads — the video-frame-sampling execution shape: one
    Arrow-batched pass, each batch sliced with zero-copy buffer math,
    output exploded to (doc_id, frame_no, frame). Only complete frames
    are emitted. A real codec swaps the slice for a decode call; the
    partitioning, batch iteration and explode shape stay identical.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for fno in range(0, len(b) // frame_bytes, every):
                    frame = b[fno * frame_bytes : (fno + 1) * frame_bytes]
                    rows.append((doc_id, fno, frame.hex().upper()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_hex"])

    return docs_with_payload.mapInPandas(sample, schema=FRAME_SCHEMA)


AUDIO_BYTES_PER_MS = 2  # synthetic PCM: 1 channel x 16-bit x 1 kHz
AUDIO_CHUNK_MS = 40
AUDIO_HOP_MS = 30
AUDIO_HEAD_BYTES = 8
AUDIO_CHUNK_SCHEMA = (
    "doc_id long, chunk_no long, start_ms long, end_ms long, head_hex string"
)


def audio_chunks(
    docs_with_payload: DataFrame,
    chunk_ms: int = AUDIO_CHUNK_MS,
    hop_ms: int = AUDIO_HOP_MS,
) -> DataFrame:
    """Overlapping fixed-duration chunk extraction over audio payloads
    — the ASR-preprocessing execution shape (windowed chunks with hop
    overlap, boundaries computed from the PCM byte-rate metadata).

    Arrow-batched ``mapInPandas``; the chunk *grid* math (duration from
    byte length, only complete windows, start/end timestamps) is real;
    the per-chunk content op is a deterministic head-bytes stand-in —
    a real pipeline swaps it for a codec/feature call (same plumbing,
    same explode shape as :func:`frame_sample`).
    """
    bpm = AUDIO_BYTES_PER_MS

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                dur_ms = len(b) // bpm
                n_chunks = (
                    (dur_ms - chunk_ms) // hop_ms + 1 if dur_ms >= chunk_ms else 0
                )
                for cno in range(n_chunks):
                    start = cno * hop_ms
                    off = start * bpm
                    rows.append(
                        (
                            doc_id,
                            cno,
                            start,
                            start + chunk_ms,
                            b[off : off + AUDIO_HEAD_BYTES].hex().upper(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "chunk_no", "start_ms", "end_ms", "head_hex"],
            )

    return docs_with_payload.mapInPandas(chunk, schema=AUDIO_CHUNK_SCHEMA)


VAD_FRAME_BYTES = 16
VAD_THRESHOLD = 1550
VAD_FRAME_SCHEMA = "doc_id long, frame_no long, energy long"


def vad_frame_energy(docs_with_payload: DataFrame) -> DataFrame:
    """Per-frame energy over binary payloads — the feature-extraction
    half of voice-activity detection. Frames are fixed-size
    non-overlapping byte windows (complete frames only); energy is the
    integer byte-sum per frame, computed VECTORIZED inside an Arrow
    batch (numpy reshape+sum — no per-byte Python). A real audio
    pipeline swaps byte-sum for RMS over decoded PCM; partitioning,
    batch iteration, and the (doc, frame, energy) contract stay
    identical. Integer energies make the downstream segmentation
    engine-exact."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            fnos: list = []
            energies: list = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b) // VAD_FRAME_BYTES
                if n == 0:
                    continue
                e = (
                    np.frombuffer(b[: n * VAD_FRAME_BYTES], dtype=np.uint8)
                    .reshape(n, VAD_FRAME_BYTES)
                    .sum(axis=1, dtype=np.int64)
                )
                ids.extend([doc_id] * n)
                fnos.extend(range(n))
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": fnos, "energy": energies}
            )

    return docs_with_payload.mapInPandas(extract, schema=VAD_FRAME_SCHEMA)


def vad_segments(
    frames: DataFrame, threshold: int = VAD_THRESHOLD
) -> DataFrame:
    """Activity segmentation: contiguous runs of frames with energy
    above threshold, merged into (start, end, n_frames, total_energy)
    segments — the gaps-and-islands rewrite (frame_no minus per-doc
    row_number is constant within a run), purely declarative after the
    Arrow extract. One shuffle on doc_id; segments per doc are
    bounded by frames per doc."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_no")
    active = frames.filter(F.col("energy") > threshold)
    seg = active.withColumn(
        "__grp", F.col("frame_no") - F.row_number().over(w)
    )
    out = (
        seg.groupBy("doc_id", "__grp")
        .agg(
            F.min("frame_no").alias("start_frame"),
            F.max("frame_no").alias("end_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("energy").cast("long").alias("total_energy"),
        )
        .drop("__grp")
    )
    w2 = Window.partitionBy("doc_id").orderBy("start_frame")
    return out.withColumn(
        "seg_no", F.row_number().over(w2).cast("long")
    ).select(
        "doc_id", "seg_no", "start_frame", "end_frame", "n_frames",
        "total_energy",
    )


IMG_WIDTH = 32  # synthetic raster geometry: 1 byte/px, fixed width
PATCH = 8  # square patch side
PATCH_SIG_BYTES = 4
PATCH_SCHEMA = (
    "doc_id long, prow long, pcol long, offset long, patch_sig string"
)


def image_patches(docs_with_payload: DataFrame) -> DataFrame:
    """ViT-style patch grid over image payloads: the payload is a
    row-major raster (1 byte/px, fixed width); patches are the PATCH x
    PATCH grid cells, each emitted with its (row, col) index and byte
    offset — the exact tiling a vision tokenizer performs before
    embedding. Complete patch rows only (the crop-to-multiple
    convention). The per-patch content op is a head-bytes signature
    stand-in; a real pipeline decodes and embeds per patch in the same
    Arrow batch loop (same plumbing as frame_sample/audio_chunks).
    """

    def tile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                height = len(b) // IMG_WIDTH
                for prow in range(height // PATCH):
                    for pcol in range(IMG_WIDTH // PATCH):
                        off = prow * PATCH * IMG_WIDTH + pcol * PATCH
                        rows.append(
                            (
                                doc_id,
                                prow,
                                pcol,
                                off,
                                b[off : off + PATCH_SIG_BYTES].hex().upper(),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "prow", "pcol", "offset", "patch_sig"],
            )

    return docs_with_payload.mapInPandas(tile, schema=PATCH_SCHEMA)


# -- REAL decode path: PPM / WAV payloads with decoded-value features -------
#
# The payload bytes are deterministic md5-stream rasters (every engine
# can restate the generator), ENCODED into real container formats
# (binary PPM / RIFF WAVE). The extractors below decode those actual
# bytes with operators/codecs.py and compute integer statistics over
# the DECODED values — a header-offset or byte-order bug anywhere in
# encode or decode shifts the raster and breaks the cross-engine hash
# against the oracle's analytic restatement of the same md5 stream.

PPM_W, PPM_H = 32, 16  # 1536 raster bytes = 96 md5 blocks
_PPM_BLOCKS = (PPM_W * PPM_H * 3) // 16
WAV_SAMPLES = 256  # 512 PCM bytes = 32 md5 blocks
WAV_RATE = 16_000
_WAV_BLOCKS = (WAV_SAMPLES * 2) // 16
LUMA_R, LUMA_G, LUMA_B = 299, 587, 114  # ITU-R BT.601, milli-weights
RESIZE_W, RESIZE_H = 16, 8


def _md5_stream(key: str, n_blocks: int, salt: str) -> bytes:
    import hashlib

    return b"".join(
        bytes.fromhex(hashlib.md5(f"{key}{salt}{i}".encode()).hexdigest())
        for i in range(n_blocks)
    )


def _spread_ids(docs: DataFrame, fraction: float = 1.0) -> DataFrame:
    """doc_id frame repartitioned to the cluster's parallelism. The
    payload builders' cost is CPU-bound Python (encode) and everything
    downstream of them is CPU-bound decode, so their parallelism must
    not be inherited from the input's FILE layout — a single-file
    fixture would otherwise serialize the whole codec path into one
    task (measured: m14's full-corpus PNG decode 10.4 s on the 1-file
    sf0.1 fixture vs 4.0 s on a 10x corpus stored as 32 files). The
    shuffle moves only doc_id longs — O(docs) bytes, negligible
    against the codec work it parallelizes — and is skipped entirely
    when the scan already has enough file splits (fan_out's guard), so
    a 100 TB multi-file input adds no Exchange.

    ``fraction`` is the SAMPLED-AUDIT knob (r14 verdict #5) for the
    expensive per-doc adjudication queries: at production scale these
    are audit passes, not full-corpus transforms, so ``fraction=1/k``
    keeps every k-th doc_id — DETERMINISTIC in doc_id (stable across
    runs, partitionings, and cluster sizes; a Bernoulli sample would
    be none of those), and a pushdown-friendly comparison filter."""
    from pyspark.sql import functions as F
    from table_demo_spark.sources.batch import fan_out

    docs = docs.select("doc_id")
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if fraction < 1.0:
        k = max(2, int(round(1.0 / fraction)))
        docs = docs.where(F.col("doc_id") % k == 0)
    return fan_out(docs)


def with_ppm_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real binary-PPM image per document, pixel
    bytes drawn from the doc's md5 stream (byte o = hex pair o%16 of
    md5('<doc_id>#img<o//16>'))."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_ppm

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_ppm(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _PPM_BLOCKS, "#img"), dtype=np.uint8
                    ).reshape(PPM_H, PPM_W, 3)
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


PNG_W, PNG_H = 24, 16  # 1152 raster bytes = 72 md5 blocks
_PNG_BLOCKS = (PNG_W * PNG_H * 3) // 16


def with_png_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real PNG image per document — the pixel
    bytes are the doc's md5 stream (salt '#png'), run through the full
    zlib-deflate + cycling scanline filters of codecs.encode_png. The
    decode side must invert BOTH the compression and all five filter
    predictors to recover the raster the oracle restates analytically."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_png

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_png(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _PNG_BLOCKS, "#png"),
                        dtype=np.uint8,
                    ).reshape(PNG_H, PNG_W, 3)
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def with_webp_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real lossless-WebP (VP8L) image per
    document — the same md5 raster as the PNG path (salt '#webp'),
    run through codecs.encode_webp_lossless (subtract-green transform
    + canonical prefix codes). The decode side must invert the
    transform and walk the full prefix-code machinery to recover the
    raster the oracle restates analytically."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_webp_lossless

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_webp_lossless(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _PNG_BLOCKS, "#webp"),
                        dtype=np.uint8,
                    ).reshape(PNG_H, PNG_W, 3)
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


VP8_MB_W, VP8_MB_H = 2, 2  # 32x32 luma, 4-macroblock DC mosaic


def with_lossy_webp_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real LOSSY-WebP (VP8 keyframe, RFC 6386)
    image per document — the 4 signed Y2-DC levels come from the doc's
    md5 bytes (salt '#vp8', level = byte%128 - 64, level 0 exercising
    the skip flag), written through the real boolean coder and token
    trees by codecs.encode_vp8_dc_mosaic. The decode side must walk
    the full keyframe machinery (header, skip, mode trees, token
    contexts, Y2 WHT, DC prediction chain) to recover the mosaic the
    oracle restates analytically; libwebp decodes the same streams to
    the same planes (pinned in tests/test_operators.py)."""
    from table_demo_spark.operators.codecs import (
        encode_vp8_dc_mosaic,
        encode_webp_lossy,
    )

    n_mb = VP8_MB_W * VP8_MB_H

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(str(doc_id), 1, "#vp8")
                levels = [(raw[i] % 128) - 64 for i in range(n_mb)]
                payloads.append(
                    encode_webp_lossy(
                        encode_vp8_dc_mosaic(levels, VP8_MB_W, VP8_MB_H)
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def vp8_mosaic_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Full VP8 keyframe decode per payload (Arrow-batched), reduced
    to integer luma statistics the oracle can restate: exact mean
    (sum*1000 // n_pixels) and min/max over the decoded Y plane."""
    from table_demo_spark.operators.codecs import decode_webp_lossy

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                y, _u, _v = decode_webp_lossy(bytes(payload))
                h, w = y.shape
                rows.append(
                    (
                        int(doc_id),
                        int(w),
                        int(h),
                        int(y.sum()) * 1000 // (w * h),
                        int(y.min()),
                        int(y.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "mean_y_milli", "y_min", "y_max",
                ],
            )

    return docs_with_payload.mapInPandas(
        stats,
        schema=(
            "doc_id long, width long, height long, "
            "mean_y_milli long, y_min long, y_max long"
        ),
    )


def with_color_webp_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a COLOR lossy-WebP (VP8 keyframe) per
    document — md5 bytes (salt '#vp8c') drive the 4 signed Y2-DC
    levels (bytes 0-3), the 4 U-plane DC levels (4-7) and the 4
    V-plane DC levels (8-11), each byte%128 - 64, written through the
    real boolean coder with the chroma token-context chain
    (codecs.encode_vp8_dc_mosaic uv_levels). The decode side must
    recover all three planes AND run libwebp's fixed-point CSC to
    reproduce the oracle's analytic RGB; libwebp decodes the same
    streams to the same planes (tests/test_vp8.py)."""
    from table_demo_spark.operators.codecs import (
        encode_vp8_dc_mosaic,
        encode_webp_lossy,
    )

    n_mb = VP8_MB_W * VP8_MB_H

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(str(doc_id), 1, "#vp8c")
                lv = [(raw[i] % 128) - 64 for i in range(3 * n_mb)]
                payloads.append(
                    encode_webp_lossy(
                        encode_vp8_dc_mosaic(
                            lv[:n_mb], VP8_MB_W, VP8_MB_H,
                            uv_levels=list(
                                zip(lv[n_mb:2 * n_mb], lv[2 * n_mb:])
                            ),
                        )
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def vp8_color_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Full VP8 keyframe decode of all three planes per payload
    (Arrow-batched) + libwebp's fixed-point BT.601 CSC
    (codecs.vp8_yuv_to_rgb, point-sampled chroma — libwebp's
    no_fancy_upsampling mode, so each macroblock's RGB is uniform and
    the oracle can restate the exact per-channel means). A swapped
    chroma plane, wrong CSC constant, or broken chroma token/context
    decode shifts a channel mean and fails the value hash; the fancy
    upsampler is adjudicated bit-exactly against libwebp MODE_RGB in
    tests/test_vp8.py instead (its cross-tile blend is deliberately
    kept off the SQL oracle)."""
    from table_demo_spark.operators.codecs import (
        decode_webp_lossy,
        vp8_yuv_to_rgb,
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                y, u, v = decode_webp_lossy(bytes(payload))
                rgb = vp8_yuv_to_rgb(y, u, v, fancy=False).astype(np.int64)
                h, w = y.shape
                npx = w * h
                r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
                rows.append(
                    (
                        int(doc_id), int(w), int(h),
                        int(r.sum()) * 1000 // npx,
                        int(g.sum()) * 1000 // npx,
                        int(b.sum()) * 1000 // npx,
                        int(r.min()), int(r.max()),
                        int(b.min()), int(b.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "mean_r_milli", "mean_g_milli", "mean_b_milli",
                    "r_min", "r_max", "b_min", "b_max",
                ],
            )

    return docs_with_payload.mapInPandas(
        stats,
        schema=(
            "doc_id long, width long, height long, "
            "mean_r_milli long, mean_g_milli long, mean_b_milli long, "
            "r_min long, r_max long, b_min long, b_max long"
        ),
    )


MP3SI_FRAMES = 4
_MP3SI_FRAME_BYTES = 47  # scfsi + 2x(gain, compress) + 2x21 scalefac bytes
_MP3SI_BLOCKS = (MP3SI_FRAMES * _MP3SI_FRAME_BYTES + 15) // 16


def _mp3si_frames(raw: bytes):
    """The md5-byte -> side-info field layout the m32 oracle restates:
    per frame f at offset o = 47f: scfsi = b[o]%16, per granule g
    (gain, scalefac_compress) = (b[o+1+2g], b[o+2+2g]%16), and the 21
    long-block scalefactors of granule g at b[o+5+21g+band] masked to
    the band's slen (scfsi-shared groups of granule 1 are ignored by
    the encoder per the spec — the decode must COPY them)."""
    from table_demo_spark.operators.codecs import MP3_SLEN

    frames = []
    for f in range(MP3SI_FRAMES):
        o = f * _MP3SI_FRAME_BYTES
        scfsi = raw[o] % 16
        grs = []
        for g in range(2):
            sc = raw[o + 2 + 2 * g] % 16
            slen1, slen2 = MP3_SLEN[sc]
            sfs = [
                raw[o + 5 + 21 * g + band]
                % (1 << (slen1 if band < 11 else slen2))
                for band in range(21)
            ]
            grs.append((raw[o + 1 + 2 * g], sc, sfs))
        frames.append((scfsi, grs))
    return frames


def with_mp3_sideinfo_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): MPEG-1 Layer III frames with REAL side info
    and part2 scale factors (codecs.encode_mp3_sideinfo_frames) — the
    layer under m29's header walk. Decoding must parse the 17-byte
    side info bit layout, the slen table, and scfsi sharing to recover
    the fields the oracle restates analytically."""
    from table_demo_spark.operators.codecs import encode_mp3_sideinfo_frames

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_mp3_sideinfo_frames(
                    _mp3si_frames(
                        _md5_stream(str(doc_id), _MP3SI_BLOCKS, "#mp3si")
                    )
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def mp3_sideinfo_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Full side-info + scale-factor decode per payload, reduced to
    the integer aggregates the oracle can restate: global-gain sum,
    transmitted part2 bit total, and the EFFECTIVE scalefactor sum
    (scfsi-copied groups counted at granule 0's values)."""
    from table_demo_spark.operators.codecs import decode_mp3_sideinfo

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_mp3_sideinfo(bytes(payload))
                gain = part2 = sf = huff = 0
                for fr in frames:
                    for g in fr["granules"]:
                        gain += g["global_gain"]
                        part2 += g["part2_bits"]
                        sf += sum(g["scalefacs"])
                        huff += g["huffman_bits"]
                rows.append(
                    (int(doc_id), len(frames), gain, part2, sf, huff)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "gain_sum",
                    "part2_sum", "sf_sum", "huffman_bits_sum",
                ],
            )

    return docs_with_payload.mapInPandas(
        stats,
        schema=(
            "doc_id long, n_frames long, gain_sum long, "
            "part2_sum long, sf_sum long, huffman_bits_sum long"
        ),
    )


def with_mixed_media_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a MIXED-codec corpus — doc_id % 3 routes to
    a real PNG (md5 raster '#png'), a lossless WebP/VP8L ('#webp'),
    or a lossy WebP/VP8 DC mosaic ('#vp8'). The crawl-ingest shape:
    one binary column, formats discovered by sniffing, every payload
    decoded through the full codec chain."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        encode_png,
        encode_vp8_dc_mosaic,
        encode_webp_lossless,
        encode_webp_lossy,
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                route = int(doc_id) % 3
                if route == 0:
                    payloads.append(
                        encode_png(
                            np.frombuffer(
                                _md5_stream(str(doc_id), _PNG_BLOCKS, "#png"),
                                dtype=np.uint8,
                            ).reshape(PNG_H, PNG_W, 3)
                        )
                    )
                elif route == 1:
                    payloads.append(
                        encode_webp_lossless(
                            np.frombuffer(
                                _md5_stream(str(doc_id), _PNG_BLOCKS, "#webp"),
                                dtype=np.uint8,
                            ).reshape(PNG_H, PNG_W, 3)
                        )
                    )
                else:
                    raw = _md5_stream(str(doc_id), 1, "#vp8")
                    levels = [
                        (raw[i] % 128) - 64 for i in range(VP8_MB_W * VP8_MB_H)
                    ]
                    payloads.append(
                        encode_webp_lossy(
                            encode_vp8_dc_mosaic(levels, VP8_MB_W, VP8_MB_H)
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def mixed_media_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Sniff each payload's format from its magic bytes (PNG signature
    vs RIFF/WEBP with a VP8L or VP8 chunk), decode it through the full
    codec chain, and emit per-doc luma statistics — the one-pass
    triage a crawl pipeline runs over a mixed media column."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from table_demo_spark.operators.codecs import PNG_MAGIC

        weights = np.array([LUMA_R, LUMA_G, LUMA_B], dtype=np.int64)
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if data.startswith(PNG_MAGIC):
                    fmt = "png"
                elif data.startswith(b"RIFF") and data[8:12] == b"WEBP":
                    fmt = "vp8l" if b"VP8L" in data[12:24] else "vp8"
                else:
                    fmt = "unknown"
                arr = decode_image(data)
                h, w = arr.shape[:2]
                total = int((arr.astype(np.int64) * weights).sum())
                rows.append(
                    (int(doc_id), fmt, w, h, total // (w * h))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height", "mean_luma_milli"
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, fmt string, width long, height long, "
            "mean_luma_milli long"
        ),
    )


def with_h264_sps_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): an Annex B stream per document opening with
    a REAL Exp-Golomb-coded SPS (fields from the doc's md5 bytes, salt
    '#sps') followed by two opaque slice-data NALs — the wild-video
    ingest shape where dimensions/profile must be parsed out of the
    parameter set, not taken from a container."""
    from table_demo_spark.operators.codecs import (
        encode_annexb,
        encode_h264_sps,
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(str(doc_id), 1, "#sps")
                prof = (66, 77, 88)[raw[0] % 3]
                level = 10 + raw[1] % 42
                mb_w = 1 + raw[2] % 120
                mb_h = 1 + raw[3] % 68
                crop = (
                    tuple(raw[4 + i] % 4 for i in range(4))
                    if raw[8] % 2
                    else (0, 0, 0, 0)
                )
                sps = encode_h264_sps(prof, level, mb_w, mb_h, crop)
                payloads.append(
                    encode_annexb(
                        [(3, 7, sps), (2, 1, raw[9:16]), (2, 1, raw[:8])]
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def h264_sps_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Walk each Annex B stream, Exp-Golomb-parse the SPS NAL, and
    emit the ingest-triage fields: profile, level, and DISPLAY
    dimensions after the 4:2:0 frame-cropping rules."""
    from table_demo_spark.operators.codecs import (
        decode_annexb,
        decode_h264_sps,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                nals = decode_annexb(bytes(payload))
                sps = next(n for n in nals if n["nal_type"] == 7)
                info = decode_h264_sps(sps["rbsp"])
                rows.append(
                    (
                        int(doc_id),
                        len(nals),
                        info["profile_idc"],
                        info["level_idc"],
                        info["width"],
                        info["height"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_nals", "profile_idc", "level_idc",
                    "width", "height",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, n_nals long, profile_idc long, level_idc long, "
            "width long, height long"
        ),
    )


PAL_W, PAL_H = 32, 32  # 1024 4-bit indices = 512 bytes = 32 md5 blocks
_PAL_BLOCKS = (PAL_W * PAL_H) // 32


def _pal_palette():
    import numpy as np

    i = np.arange(16)
    return np.stack(
        [(i * 17) % 256, (255 - i * 13) % 256, (i * 41 + 7) % 256], -1
    ).astype(np.uint8)


def with_palette_png_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a 4-bit PALETTE, Adam7-INTERLACED PNG per
    document — the two wild-web PNG axes m14's truecolor path skips.
    Indices are the doc's md5 NIBBLES (salt '#pal'), the 16-color
    palette is the analytic formula the oracle restates; the encoder
    cycles all five filters within every interlace pass, so a broken
    predictor, a mis-ordered Adam7 pass, a bit-unpack slip, or a
    palette-map bug shifts decoded pixels and fails the value hash.
    Third-party interop is pinned separately on Java-ImageIO-written
    interlaced/palette fixtures (tests/test_operators.py)."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_png_palette

    pal = _pal_palette()

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = np.frombuffer(
                    _md5_stream(str(doc_id), _PAL_BLOCKS, "#pal"),
                    dtype=np.uint8,
                )
                idx = np.empty(raw.size * 2, dtype=np.uint8)
                idx[0::2] = raw >> 4
                idx[1::2] = raw & 15
                payloads.append(
                    encode_png_palette(
                        idx.reshape(PAL_H, PAL_W), pal, depth=4,
                        interlace=True,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


H264_N_SLICES = 4


def with_h264_slices_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): an Annex B stream per document carrying a
    REAL SPS + PPS + 4 slice NALs (1 IDR/I + 3 md5-chosen P/B/I) whose
    headers are Exp-Golomb-coded from the doc's md5 bytes (salt
    '#slc') — frame_num/poc widths vary PER DOCUMENT via the SPS's
    log2_max_frame_num_minus4 and poc_type, so the decode side must
    resolve every slice through the parameter-set store to read even
    one field. Slice DATA stays opaque (2 filler bytes per NAL — the
    macroblock layer is the documented extension point)."""
    from table_demo_spark.operators.codecs import (
        decode_h264_pps,
        decode_h264_sps,
        encode_annexb,
        encode_h264_pps,
        encode_h264_slice_header,
        encode_h264_sps,
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(str(doc_id), 2, "#slc")
                q0 = raw[0] % 21 - 10
                deblock = raw[1] % 2
                entropy = (raw[1] // 2) % 2
                chroma_off = raw[2] % 25 - 12
                lmfn = raw[3] % 5
                poc_type = 0 if (raw[3] // 5) % 2 else 2
                sps_rbsp = encode_h264_sps(
                    66, 30, 40, 23,
                    log2_max_frame_num_minus4=lmfn, poc_type=poc_type,
                )
                pps_rbsp = encode_h264_pps(
                    0, 0, pic_init_qp_minus26=q0,
                    chroma_qp_index_offset=chroma_off,
                    deblocking_filter_control_present=deblock,
                    entropy_coding_mode=entropy,
                )
                sps = decode_h264_sps(sps_rbsp)
                pps = decode_h264_pps(pps_rbsp)
                nals = [(3, 7, sps_rbsp), (3, 8, pps_rbsp)]
                for s in range(H264_N_SLICES):
                    b = raw[4 + 7 * s:11 + 7 * s]
                    sel = 2 if s == 0 else b[0] % 3
                    stype_ue = sel + 5 * ((b[0] // 3) % 2)
                    hdr = encode_h264_slice_header(
                        sps, pps, stype_ue,
                        first_mb=b[1] % 16,
                        frame_num=b[2] % (1 << (4 + lmfn)),
                        slice_qp_delta=b[1] // 16 - 7,
                        idr_pic_id=b[6] % 32 if s == 0 else None,
                        poc_lsb=b[3] if poc_type == 0 else 0,
                        direct_spatial_mv=(b[0] // 8) % 2,
                        cabac_init_idc=b[4] % 3,
                        disable_deblocking_idc=b[5] % 3,
                        alpha_c0_offset_div2=(b[5] // 3) % 13 - 6,
                        beta_offset_div2=(b[5] // 39) % 7 - 3,
                    )
                    nals.append((3 if s == 0 else 2,
                                 5 if s == 0 else 1, hdr + b"\xa5\x5a"))
                payloads.append(encode_annexb(nals))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def h264_slices_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Walk each Annex B stream maintaining the SPS/PPS stores and
    parse every slice header through them (codecs.decode_h264_stream),
    reduced to per-doc aggregates over the DECODED fields — slice-type
    mix, frame_num/poc sums (widths from the active SPS), resolved
    slice QPs (base from the active PPS), CABAC init ids, and the
    deblocking overrides."""
    from table_demo_spark.operators.codecs import decode_h264_stream

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                slices = decode_h264_stream(bytes(payload))
                types = [s["slice_type"] for s in slices]
                rows.append(
                    (
                        int(doc_id),
                        len(slices),
                        types.count("I"),
                        types.count("P"),
                        types.count("B"),
                        sum(s["first_mb"] for s in slices),
                        sum(s["frame_num"] for s in slices),
                        sum(s["slice_qp"] for s in slices),
                        sum(s["poc_lsb"] for s in slices),
                        sum(s["cabac_init_idc"] for s in slices),
                        sum(s["disable_deblocking_idc"] for s in slices),
                        sum(s["alpha_c0_offset"] for s in slices),
                        sum(s["beta_offset"] for s in slices),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_slices", "n_i", "n_p", "n_b",
                    "sum_first_mb", "sum_frame_num", "sum_qp", "sum_poc",
                    "sum_cabac", "sum_dbl_idc", "sum_alpha", "sum_beta",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, n_slices long, n_i long, n_p long, n_b long, "
            "sum_first_mb long, sum_frame_num long, sum_qp long, "
            "sum_poc long, sum_cabac long, sum_dbl_idc long, "
            "sum_alpha long, sum_beta long"
        ),
    )


H264_PCM_MB_W, H264_PCM_MB_H = 2, 2  # 32x32 luma + 2x 16x16 chroma
_PCM_BLOCKS = (
    H264_PCM_MB_W * H264_PCM_MB_H * (256 + 64 + 64)
) // 16  # 96 md5 blocks


def with_h264_ipcm_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): an Annex B stream whose IDR slice decodes to
    PIXELS — every macroblock is I_PCM (the spec's raw-sample escape
    hatch, 7.4.5), planes drawn from the doc's md5 stream (salt
    '#pcm': luma bytes first, then Cb, then Cr) with the first three
    luma samples PINNED to (0, 0, 1) — a start-code-colliding run in
    every payload, so the emulation-prevention escape layer sits on
    the value hash (random bytes alone hit 00 00 0x with probability
    ~5e-4 per doc — effectively never). The decode side must cross
    the full stack: start codes, unescape, parameter-set activation,
    the slice-header field walk, per-MB mb_type + pcm-alignment, and
    the 4:2:0 sample order."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_h264_pps,
        decode_h264_sps,
        encode_annexb,
        encode_h264_ipcm_slice,
        encode_h264_pps,
        encode_h264_sps,
    )

    mw, mh = H264_PCM_MB_W, H264_PCM_MB_H
    sps_rbsp = encode_h264_sps(66, 30, mw, mh)
    pps_rbsp = encode_h264_pps(0, 0)
    sps = decode_h264_sps(sps_rbsp)
    pps = decode_h264_pps(pps_rbsp)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = np.frombuffer(
                    _md5_stream(str(doc_id), _PCM_BLOCKS, "#pcm"),
                    dtype=np.uint8,
                )
                ny, nc = 256 * mw * mh, 64 * mw * mh
                raw = raw.copy()
                raw[0:3] = (0, 0, 1)  # forced escape-layer hit
                y = raw[:ny].reshape(16 * mh, 16 * mw)
                cb = raw[ny:ny + nc].reshape(8 * mh, 8 * mw)
                cr = raw[ny + nc:ny + 2 * nc].reshape(8 * mh, 8 * mw)
                sl = encode_h264_ipcm_slice(
                    sps, pps, y, cb, cr,
                    frame_num=int(doc_id) % 16, idr_pic_id=int(doc_id) % 32,
                )
                payloads.append(
                    encode_annexb(
                        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def h264_ipcm_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each Annex B stream to PIXELS (parameter-set stores +
    I_PCM slice-data walk) and reduce to integer plane statistics the
    oracle restates from the md5 stream."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_annexb,
        decode_h264_ipcm_slice,
        decode_h264_pps,
        decode_h264_sps,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sps_store, pps_store = {}, {}
                y = cb = cr = hdr = None
                for nal in decode_annexb(bytes(payload)):
                    if nal["nal_type"] == 7:
                        info = decode_h264_sps(nal["rbsp"])
                        sps_store[info["sps_id"]] = info
                    elif nal["nal_type"] == 8:
                        info = decode_h264_pps(nal["rbsp"])
                        pps_store[info["pps_id"]] = info
                    elif nal["nal_type"] == 5:
                        hdr, y, cb, cr = decode_h264_ipcm_slice(
                            nal["rbsp"], 5, nal["ref_idc"],
                            pps_store, sps_store,
                        )
                h, w = y.shape
                rows.append(
                    (
                        int(doc_id), int(w), int(h),
                        int(hdr["frame_num"]),
                        int(y.sum()) * 1000 // (w * h),
                        int(y.min()), int(y.max()),
                        int(cb.sum()) * 1000 // (cb.size),
                        int(cr.sum()) * 1000 // (cr.size),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "frame_num",
                    "mean_y_milli", "y_min", "y_max",
                    "mean_cb_milli", "mean_cr_milli",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, width long, height long, frame_num long, "
            "mean_y_milli long, y_min long, y_max long, "
            "mean_cb_milli long, mean_cr_milli long"
        ),
    )


GIF_FRAMES = 4
GIF_H, GIF_W = 16, 32  # 512 index bytes/frame: LZW table crosses the
#                        9->10-bit width boundary on every frame, so the
#                        variable-code-width path is on the value-hash path
_GIF_BLOCKS = (GIF_FRAMES * GIF_H * GIF_W) // 16  # 128 md5 blocks


def with_gif_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real animated GIF89a per document — the
    palette-index bytes of the ``GIF_FRAMES`` frames are the doc's md5
    stream (salt '#gif'), run through variable-code-width LZW + the
    sub-block framing of codecs.encode_gif. Random index bytes push the
    per-frame LZW string table past 254 entries, so the decoder's
    width-growth synchronization is exercised by every payload; frames
    are stored INTERLACED (r11), so the 4-pass row reorder sits on the
    same value hash (the oracle is unchanged — interlace is wire
    layout, not content). Third-party interop for the interlaced path
    is pinned on a Java-ImageIO-written fixture."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_gif

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_gif(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _GIF_BLOCKS, "#gif"),
                        dtype=np.uint8,
                    ).reshape(GIF_FRAMES, GIF_H, GIF_W),
                    interlace=True,
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


GIF_FRAME_SCHEMA = "doc_id long, frame_no long, frame_hex string"


def gif_frames(docs_with_payload: DataFrame) -> DataFrame:
    """LZW-decode each animated-GIF payload and emit one row per frame
    with the hex of its DECODED palette-index bytes — the real-codec
    version of :func:`frame_sample`'s explode shape. Any bug in the
    sub-block walk, code-width synchronization, or table reset corrupts
    frame_hex and everything downstream of it."""
    from table_demo_spark.operators.codecs import decode_gif

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, _palette = decode_gif(bytes(payload))
                for fno in range(frames.shape[0]):
                    rows.append((doc_id, fno, frames[fno].tobytes().hex()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_hex"]
            )

    return docs_with_payload.mapInPandas(extract, schema=GIF_FRAME_SCHEMA)


WEBP_ANIM_FRAMES = 4
WEBP_ANIM_H, WEBP_ANIM_W = 8, 16
_WEBPA_BLOCKS = (WEBP_ANIM_FRAMES * WEBP_ANIM_H * WEBP_ANIM_W * 3) // 16


def with_webp_anim_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real ANIMATED WebP per document — 4
    full-canvas VP8L frames over the md5 raster (salt '#webpa'),
    through codecs.encode_webp_anim (VP8X + ANIM + per-frame ANMF)."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_webp_anim

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_webp_anim(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _WEBPA_BLOCKS, "#webpa"),
                        dtype=np.uint8,
                    ).reshape(
                        WEBP_ANIM_FRAMES, WEBP_ANIM_H, WEBP_ANIM_W, 3
                    )
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def webp_anim_frames(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each animated-WebP payload and emit one row per frame
    with the hex of its DECODED RGB raster — gif_frames' shape over the
    VP8L codec. Any bug in the ANMF walk or the per-frame VP8L decode
    corrupts frame_hex and everything downstream."""
    from table_demo_spark.operators.codecs import decode_webp_anim

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, _durs = decode_webp_anim(bytes(payload))
                for fno in range(frames.shape[0]):
                    rows.append((doc_id, fno, frames[fno].tobytes().hex()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_hex"]
            )

    return docs_with_payload.mapInPandas(extract, schema=GIF_FRAME_SCHEMA)


MP3_FRAMES = 6
MP3_SR_INDEX = 0  # 44100 Hz


def _mp3_specs(doc_id: int) -> list[tuple[int, int]]:
    """Deterministic per-frame (bitrate_index, padding): cycles the
    whole MPEG-1 Layer III bitrate table across the corpus."""
    return [
        (1 + (doc_id * 7 + i * 3) % 14, (doc_id + i) % 2)
        for i in range(MP3_FRAMES)
    ]


def _mp3_payload_bytes(doc_id: int) -> bytes:
    """The per-doc MP3 payload (pure function of doc_id) — shared by
    with_mp3_payload and the streaming media-triage operator."""
    from table_demo_spark.operators.codecs import (
        MP3_BITRATES_KBPS,
        MP3_SAMPLERATES,
        encode_mp3_frames,
        mp3_frame_length,
    )

    sr = MP3_SAMPLERATES[MP3_SR_INDEX]
    specs = _mp3_specs(doc_id)
    need = sum(
        mp3_frame_length(MP3_BITRATES_KBPS[b], sr, p) - 4 for b, p in specs
    )
    filler = _md5_stream(str(doc_id), -(-need // 16), "#mp3")[:need]
    return encode_mp3_frames(specs, filler, MP3_SR_INDEX)


def with_mp3_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a structurally valid MPEG-1 Layer III frame
    sequence per document (codecs.encode_mp3_frames — real header
    bits + frame-length arithmetic; bodies are md5 filler, since the
    header WALK is the operator under test)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _mp3_payload_bytes(int(doc_id)) for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def mp3_frame_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Header-walk each MP3 payload (codecs.decode_mp3_frames) and
    emit one row per frame with the PARSED header fields — a wrong
    bitrate table entry, samplerate, or frame-length formula desyncs
    the walk and corrupts every later frame."""
    from table_demo_spark.operators.codecs import decode_mp3_frames

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fno, fr in enumerate(decode_mp3_frames(bytes(payload))):
                    rows.append(
                        (
                            doc_id,
                            fno,
                            fr["bitrate_kbps"],
                            fr["padding"],
                            fr["frame_len"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_no", "bitrate_kbps", "padding",
                    "frame_len",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, frame_no long, bitrate_kbps long, "
            "padding long, frame_len long"
        ),
    )


H264_NALS = 6
H264_TYPES = (7, 8, 5, 1, 1, 1)  # SPS, PPS, IDR, 3 non-IDR slices
H264_REF_IDC = {7: 3, 8: 3, 5: 2, 1: 0}
_H264_RAW = 48          # md5 bytes per NAL before the escape motif
_H264_MOTIF_AT = 20     # where the forced 00 00 00 00 01 goes
_H264_BLOCKS = (H264_NALS * _H264_RAW) // 16


def _h264_payload_bytes(doc_id: int) -> bytes:
    """The per-doc Annex B stream (pure function of doc_id) — shared
    by with_h264_payload and the streaming media-triage operator."""
    from table_demo_spark.operators.codecs import encode_annexb

    motif = b"\x00\x00\x00\x00\x01"
    stream = _md5_stream(str(doc_id), _H264_BLOCKS, "#h264")
    nals = []
    for i, ntype in enumerate(H264_TYPES):
        raw = stream[i * _H264_RAW : (i + 1) * _H264_RAW]
        rbsp = raw[:_H264_MOTIF_AT] + motif + raw[_H264_MOTIF_AT:]
        nals.append((H264_REF_IDC[ntype], ntype, rbsp))
    return encode_annexb(nals)


def with_h264_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): an H.264 Annex B byte stream per document —
    SPS/PPS/IDR/slice NAL sequence, each RBSP a 48-byte md5 slice with
    a start-code-colliding motif (00 00 00 00 01) spliced in at byte
    20, so EVERY NAL exercises emulation-prevention escaping on the
    wire (plus whatever 00-runs the md5 bytes supply)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _h264_payload_bytes(int(doc_id)) for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def media_triage(docs: DataFrame) -> DataFrame:
    """One ingest-triage row per document: build + structure-parse the
    audio (MP3 header walk) AND video (Annex B NAL walk) payloads in a
    single Arrow pass — the summary a crawler emits before deciding
    what reaches deep decode. nal_sig_xor folds every NAL's 32-bit
    unescaped-RBSP md5 signature with XOR (order-insensitive, so the
    oracle can restate it with bit_xor)."""
    import hashlib

    from table_demo_spark.operators.codecs import (
        decode_annexb,
        decode_mp3_frames,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                frames = decode_mp3_frames(_mp3_payload_bytes(did))
                nals = decode_annexb(_h264_payload_bytes(did))
                sig_xor = 0
                for nal in nals:
                    sig_xor ^= int(
                        hashlib.md5(
                            nal["rbsp"].hex().encode()
                        ).hexdigest()[:8],
                        16,
                    )
                rows.append(
                    (
                        did,
                        len(frames),
                        sum(f["frame_len"] for f in frames),
                        max(f["bitrate_kbps"] for f in frames),
                        len(nals),
                        sum(1 for n in nals if n["nal_type"] == 5),
                        sum(len(n["rbsp"]) for n in nals),
                        sig_xor,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mp3_frames", "mp3_bytes", "mp3_kbps_max",
                    "n_nals", "n_idr", "rbsp_bytes", "nal_sig_xor",
                ],
            )

    return docs.mapInPandas(
        extract,
        schema=(
            "doc_id long, mp3_frames long, mp3_bytes long, "
            "mp3_kbps_max long, n_nals long, n_idr long, "
            "rbsp_bytes long, nal_sig_xor long"
        ),
    )


def h264_nal_units(docs_with_payload: DataFrame) -> DataFrame:
    """Walk each Annex B payload (codecs.decode_annexb) and emit one
    row per NAL with the parsed header fields and the UNESCAPED RBSP
    hex — a start-code scan or emulation-prevention bug shifts bytes
    and breaks the downstream content hash."""
    from table_demo_spark.operators.codecs import decode_annexb

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, nal in enumerate(decode_annexb(bytes(payload))):
                    rows.append(
                        (
                            doc_id,
                            i,
                            nal["nal_type"],
                            nal["ref_idc"],
                            len(nal["rbsp"]),
                            nal["rbsp"].hex(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "nal_no", "nal_type", "ref_idc",
                    "rbsp_len", "rbsp_hex",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, nal_no long, nal_type long, ref_idc long, "
            "rbsp_len long, rbsp_hex string"
        ),
    )


def with_wav_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real RIFF/WAVE PCM16 clip per document,
    sample s = little-endian int16 from md5-stream bytes (2s, 2s+1)."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_wav

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _WAV_BLOCKS, "#wav"), dtype="<i2"
                    ).astype(np.int16),
                    WAV_RATE,
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


JPEG_W, JPEG_H = 32, 24  # 768 raster bytes = 48 md5 blocks, 12 MCUs
_JPEG_BLOCKS = (JPEG_W * JPEG_H) // 16
JPEG_RESTART_INTERVAL = 5  # RSTn markers land INSIDE every image


def with_jpeg_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real baseline JFIF image per document —
    greyscale pixels from the doc's md5 stream (salt '#jpg'), run
    through the full transform-coding pipeline of codecs.encode_jpeg
    (DCT, Annex-K quantization, zigzag, DC DPCM, Huffman, byte
    stuffing), with a restart interval of 5 so RSTn handling (bit
    realignment + predictor reset) is on every payload's decode path."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_jpeg

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_jpeg(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _JPEG_BLOCKS, "#jpg"),
                        dtype=np.uint8,
                    ).reshape(JPEG_H, JPEG_W),
                    restart_interval=JPEG_RESTART_INTERVAL,
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


JPEG_DC_SCHEMA = (
    "doc_id long, n_blocks long, dc_min long, dc_max long, dc_sum long, "
    "dc_checksum long"
)


def jpeg_dc_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Entropy-decode each JPEG payload to its QUANTIZED DC plane (the
    1/64-scale "DC thumbnail" — the standard trick for classifying or
    thumbnailing crawl images without a full IDCT) and aggregate it
    per document. The DC coefficients come out of the Huffman + DPCM
    decode of the actual bitstream, so marker parsing, canonical code
    reconstruction, restart sync, and the zero-run AC walk are all on
    the value-hash path; ``dc_checksum = sum((i+1) * dc_i)`` over
    raster-order blocks pins the block ORDER, not just the multiset."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_jpeg_dc

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                dc = decode_jpeg_dc(bytes(payload)).astype(np.int64).reshape(-1)
                rows.append(
                    (
                        doc_id,
                        dc.size,
                        int(dc.min()),
                        int(dc.max()),
                        int(dc.sum()),
                        int((dc * (np.arange(dc.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_blocks", "dc_min", "dc_max", "dc_sum",
                    "dc_checksum",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=JPEG_DC_SCHEMA)


JPEG_C_W, JPEG_C_H = 32, 32  # Y: 1024 bytes = 64 blocks; 2x2 MCUs
_JPEG_C_Y_BLOCKS = (JPEG_C_W * JPEG_C_H) // 16
_JPEG_C_C_BLOCKS = (JPEG_C_W * JPEG_C_H) // 64  # half-res chroma plane
JPEG_C_RESTART = 3  # 4 MCUs -> one RSTn inside every payload


def with_color_jpeg_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real 3-component 4:2:0 baseline JFIF image
    per document — Y/Cb/Cr planes from three independent md5 streams
    (salts '#jy'/'#jcb'/'#jcr', chroma generated at half resolution
    exactly as stored), run through the full interleaved-MCU color
    pipeline of codecs.encode_jpeg_color (per-component DC predictors,
    luma + chroma Annex-K tables, restart interval 3 so color restart
    sync is on every decode path)."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_jpeg_color

    ch, cw = JPEG_C_H // 2, JPEG_C_W // 2

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def plane(doc_id, blocks, salt, h, w):
            return np.frombuffer(
                _md5_stream(str(doc_id), blocks, salt), dtype=np.uint8
            ).reshape(h, w)

        for pdf in batches:
            payloads = [
                encode_jpeg_color(
                    plane(d, _JPEG_C_Y_BLOCKS, "#jy", JPEG_C_H, JPEG_C_W),
                    plane(d, _JPEG_C_C_BLOCKS, "#jcb", ch, cw),
                    plane(d, _JPEG_C_C_BLOCKS, "#jcr", ch, cw),
                    restart_interval=JPEG_C_RESTART,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


JPEG_COLOR_DC_SCHEMA = (
    "doc_id long, n_y_blocks long, n_c_blocks long, "
    "y_dc_sum long, y_dc_checksum long, "
    "cb_dc_sum long, cb_dc_checksum long, "
    "cr_dc_sum long, cr_dc_checksum long"
)


def color_jpeg_dc_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Entropy-decode each color JPEG payload to its three QUANTIZED
    per-component DC planes (the color "DC thumbnail") and aggregate
    per document. Everything in the interleaved color entropy layer —
    4-tables-by-id Huffman reconstruction, per-component DPCM, the
    4xY+Cb+Cr MCU walk, chroma quantization, restart sync resetting
    all three predictors — is on the value-hash path; the per-plane
    ``sum((i+1) * dc_i)`` checksums pin block ORDER per component."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_jpeg_dc_color

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stats(plane: np.ndarray) -> tuple[int, int]:
            flat = plane.astype(np.int64).reshape(-1)
            return int(flat.sum()), int(
                (flat * (np.arange(flat.size) + 1)).sum()
            )

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                y, cb, cr = decode_jpeg_dc_color(bytes(payload))
                ys, yc = stats(y)
                cbs, cbc = stats(cb)
                crs, crc = stats(cr)
                rows.append(
                    (doc_id, y.size, cb.size, ys, yc, cbs, cbc, crs, crc)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_y_blocks", "n_c_blocks",
                    "y_dc_sum", "y_dc_checksum",
                    "cb_dc_sum", "cb_dc_checksum",
                    "cr_dc_sum", "cr_dc_checksum",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=JPEG_COLOR_DC_SCHEMA)


JPEG_PAR_W, JPEG_PAR_H = 64, 40  # 2560 raster bytes = 160 md5 blocks
_JPEG_PAR_BLOCKS = (JPEG_PAR_W * JPEG_PAR_H) // 16
JPEG_PAR_RESTART = 7  # 40 MCUs -> 6 intervals, the last ragged (5 MCUs)

JPEG_SEGMENT_SCHEMA = (
    "doc_id long, seg_idx long, n_mcus long, header binary, seg binary"
)


def jpeg_restart_segments(docs: DataFrame) -> DataFrame:
    """(doc_id, seg_idx, n_mcus, header, seg): one row per restart
    interval of a per-document baseline JFIF payload (greyscale pixels
    from the doc's md5 stream, salt '#jp2', 64x40, DRI=7 so the last
    interval is ragged). Encode and split happen in ONE Arrow stage —
    the split is a pure byte scan (codecs.split_jpeg_restarts: byte
    stuffing guarantees RSTn cannot occur inside entropy data), so no
    entropy work is duplicated. Every output row is independently
    decodable: the Huffman/quant tables travel in ``header`` and the
    DC predictor resets to 0 at each marker (T.81 B.2.1)."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        encode_jpeg,
        split_jpeg_restarts,
    )

    n_blocks = (JPEG_PAR_W // 8) * (JPEG_PAR_H // 8)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                payload = encode_jpeg(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _JPEG_PAR_BLOCKS, "#jp2"),
                        dtype=np.uint8,
                    ).reshape(JPEG_PAR_H, JPEG_PAR_W),
                    restart_interval=JPEG_PAR_RESTART,
                )
                header, segs = split_jpeg_restarts(payload)
                for i, seg in enumerate(segs):
                    n = min(JPEG_PAR_RESTART, n_blocks - i * JPEG_PAR_RESTART)
                    rows.append((doc_id, i, n, header, seg))
            yield pd.DataFrame(
                rows, columns=["doc_id", "seg_idx", "n_mcus", "header", "seg"]
            )

    return _spread_ids(docs).mapInPandas(build, schema=JPEG_SEGMENT_SCHEMA)


JPEG_PARALLEL_SCHEMA = (
    "doc_id long, n_segments long, n_blocks long, dc_sum long, "
    "seg_checksum long"
)


def jpeg_parallel_dc_stats(segments: DataFrame) -> DataFrame:
    """Entropy-decode every restart interval INDEPENDENTLY, then
    aggregate the quantized-DC plane per document. The segment rows
    are round-robin re-spread before the CPU-bound decode stage, so
    intervals of the SAME image land on different tasks — intra-file
    parallelism, the reason restart markers exist: at crawl scale a
    single large image (a 100-megapixel scan at DRI=64 is ~1500
    independent intervals) never serializes into one task.
    ``seg_checksum = sum((seg_idx+1) * seg_dc_sum)`` pins interval
    ASSIGNMENT, not just the DC multiset — a split off by one MCU or
    a predictor carried across a marker shifts it."""
    from table_demo_spark.operators.codecs import JpegSegmentDecoder
    from table_demo_spark.sources.batch import fan_out

    def seg_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Tables TRAVEL with every row, but the parse is memoized per
        # distinct header bytes per task (see JpegSegmentDecoder).
        decoders: dict[bytes, JpegSegmentDecoder] = {}

        for pdf in batches:
            rows = []
            for doc_id, seg_idx, n_mcus, header, seg in zip(
                pdf["doc_id"],
                pdf["seg_idx"],
                pdf["n_mcus"],
                pdf["header"],
                pdf["seg"],
            ):
                hdr = bytes(header)
                dec = decoders.get(hdr)
                if dec is None:
                    dec = decoders[hdr] = JpegSegmentDecoder(hdr)
                dc = dec.dc(bytes(seg), int(n_mcus))
                rows.append(
                    (doc_id, seg_idx, int(n_mcus), int(dc.sum(dtype="int64")))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "seg_idx", "n_mcus", "seg_dc_sum"]
            )

    decoded = fan_out(segments).mapInPandas(
        seg_decode,
        schema="doc_id long, seg_idx long, n_mcus long, seg_dc_sum long",
    )
    return decoded.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum("n_mcus").cast("long").alias("n_blocks"),
        F.sum("seg_dc_sum").cast("long").alias("dc_sum"),
        F.sum((F.col("seg_idx") + F.lit(1)) * F.col("seg_dc_sum"))
        .cast("long")
        .alias("seg_checksum"),
    )


JPEG_PROG_W, JPEG_PROG_H = 32, 24  # same grid as m17's baseline payloads
_JPEG_PROG_BLOCKS = (JPEG_PROG_W * JPEG_PROG_H) // 16
JPEG_PROG_RESTART = 4  # 12 MCUs -> RSTn inside every payload


def with_progressive_jpeg_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real PROGRESSIVE (SOF2) JFIF file per
    document whose single scan is the full-precision DC scan — the
    'DC-only progressive' prefix real encoders emit first. Pixels from
    the doc's md5 stream (salt '#jpr'); restart interval 4 so the
    progressive restart path is always exercised."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_jpeg_progressive_dc

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_jpeg_progressive_dc(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _JPEG_PROG_BLOCKS, "#jpr"),
                        dtype=np.uint8,
                    ).reshape(JPEG_PROG_H, JPEG_PROG_W),
                    restart_interval=JPEG_PROG_RESTART,
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def progressive_jpeg_dc_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode ONLY the first (DC) scan of each progressive payload —
    the crawl-thumbnail trick that skips ~90% of a progressive file's
    bytes — and aggregate the quantized DC plane per document; same
    output schema and checksum discipline as the baseline m17."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_jpeg_progressive_dc

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                dc = (
                    decode_jpeg_progressive_dc(bytes(payload))["y"]
                    .astype(np.int64)
                    .reshape(-1)
                )
                rows.append(
                    (
                        doc_id,
                        dc.size,
                        int(dc.min()),
                        int(dc.max()),
                        int(dc.sum()),
                        int((dc * (np.arange(dc.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_blocks", "dc_min", "dc_max", "dc_sum",
                    "dc_checksum",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=JPEG_DC_SCHEMA)


_FLAC_BLOCKS = 256  # 4096 md5 bytes = 2048 int16 samples
FLAC_SAMPLES = _FLAC_BLOCKS * 8
FLAC_BLOCKSIZE = 512  # 4 frames per payload
FLAC_RATE = 16_000


def with_flac_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real FLAC file per document — int16
    samples from the doc's md5 stream (salt '#flc'), compressed
    through codecs.encode_flac (fixed-predictor selection, rice-coded
    residuals, CRC-8 headers, CRC-16 frames; blocksize 512 so every
    payload spans multiple frames and the inter-frame sync/CRC path
    is always exercised)."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_flac

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_flac(
                    np.frombuffer(
                        _md5_stream(str(doc_id), _FLAC_BLOCKS, "#flc"),
                        dtype="<i2",
                    ).astype(np.int16),
                    FLAC_RATE,
                    blocksize=FLAC_BLOCKSIZE,
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


FLAC_PCM_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, "
    "pcm_sum long, pcm_abs_sum long, pcm_checksum long"
)


def flac_pcm_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each FLAC payload back to PCM (sync + CRC-8 + CRC-16
    verified per frame, fixed-predictor reconstruction, rice decode)
    and aggregate the samples per document. FLAC is lossless, so the
    oracle states the stats ANALYTICALLY from the md5 stream — any
    bit lost anywhere in the compression pipeline breaks the value
    hash; ``pcm_checksum = sum((i+1) * s_i)`` pins sample ORDER across
    frame boundaries (a frame decoded out of order or a warmup sample
    miscounted shifts it)."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_flac

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, pcm = decode_flac(bytes(payload))
                v = pcm.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        rate,
                        v.size,
                        int(v.sum()),
                        int(np.abs(v).sum()),
                        int((v * (np.arange(v.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples",
                    "pcm_sum", "pcm_abs_sum", "pcm_checksum",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=FLAC_PCM_SCHEMA)


_FLAC_LPC_ORDER = 8
_FLAC_LPC_PRECISION = 12
FLAC_LPC_FRAMES = FLAC_SAMPLES // FLAC_BLOCKSIZE  # every frame is LPC


def _flac_lpc_pcm(doc_id) -> "np.ndarray":
    """The m25 PCM: a 4-tap moving average (floor division,
    zero-padded left) of the doc's md5 int16 stream (salt '#flp').
    White md5 noise has no sample-to-sample correlation, so an LPC
    predictor trained on it is near-zero — smoothing makes the signal
    a genuine MA process with nonzero predictor taps, so the LPC path
    (coefficient quantization, shifted integer dot product, warm-up
    handoff across frames) is exercised with real arithmetic. The
    transform is lag-statable in SQL (the m24 trick, on the encode
    side instead of the decode side)."""
    import numpy as np

    m = np.frombuffer(
        _md5_stream(str(doc_id), _FLAC_BLOCKS, "#flp"), dtype="<i2"
    ).astype(np.int64)
    sm = np.convolve(m, np.ones(4, dtype=np.int64))[: m.size] // 4
    return sm.astype(np.int16)


def with_flac_lpc_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real FLAC file per document where EVERY
    subframe is an LPC subframe (codecs.encode_flac_lpc: order-8
    predictor estimated per block, 12-bit quantized coefficients with
    derived shift carried in the bitstream, rice-coded integer
    residual) — the general-predictor path real-world encoders emit on
    nearly every frame, m21's documented negative space until now."""
    import numpy as np  # noqa: F401  (dtype context for _flac_lpc_pcm)

    from table_demo_spark.operators.codecs import encode_flac_lpc

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_flac_lpc(
                    _flac_lpc_pcm(doc_id),
                    FLAC_RATE,
                    blocksize=FLAC_BLOCKSIZE,
                    order=_FLAC_LPC_ORDER,
                    precision=_FLAC_LPC_PRECISION,
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


FLAC_LPC_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, n_lpc_subframes long, "
    "pcm_sum long, pcm_abs_sum long, pcm_checksum long"
)


def flac_lpc_pcm_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each LPC-subframe FLAC payload back to PCM (sync + both
    CRCs verified per frame, quantized-coefficient integer prediction,
    rice decode) and aggregate the samples per document. FLAC is
    lossless, so the oracle states the stats ANALYTICALLY from the
    md5-derived smoothed stream; ``n_lpc_subframes`` comes from the
    decoded subframe-type codes and pins that the general LPC path —
    not a fixed-predictor fallback — produced every frame."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_flac

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, pcm, stypes = decode_flac(
                    bytes(payload), return_subframe_types=True
                )
                v = pcm.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        rate,
                        v.size,
                        sum(1 for t in stypes if 32 <= t <= 63),
                        int(v.sum()),
                        int(np.abs(v).sum()),
                        int((v * (np.arange(v.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "n_lpc_subframes",
                    "pcm_sum", "pcm_abs_sum", "pcm_checksum",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=FLAC_LPC_SCHEMA)


_FLAC_SD_BLOCKS = _FLAC_BLOCKS // 2  # 2048 bytes -> one small d per sample


def _flac_stereo_pcm(doc_id) -> tuple["np.ndarray", "np.ndarray"]:
    """The m26 stereo pair: LEFT = the '#fls' md5 stream smoothed by
    the 4-tap moving average and halved (one floor-div by 8 — nested
    integer floors compose), RIGHT = LEFT minus a small per-sample
    delta d in [-16, 16] from the '#fsd' byte stream. Real stereo
    audio is two near-identical channels; this pair makes the side
    channel (L - R = d) genuinely small, so mid/side decorrelation has
    something real to win — and every step is lag/mod-statable in
    SQL."""
    import numpy as np

    m = np.frombuffer(
        _md5_stream(str(doc_id), _FLAC_BLOCKS, "#fls"), dtype="<i2"
    ).astype(np.int64)
    left = np.convolve(m, np.ones(4, dtype=np.int64))[: m.size] // 8
    d = (
        np.frombuffer(
            _md5_stream(str(doc_id), _FLAC_SD_BLOCKS, "#fsd"), dtype=np.uint8
        ).astype(np.int64)
        % 33
        - 16
    )
    return left.astype(np.int16), (left - d).astype(np.int16)


def with_stereo_flac_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a real STEREO FLAC file per document —
    mid/side channel decorrelation on every frame, the side subframe
    at bps+1 (codecs.encode_flac_stereo), fixed-predictor subframes
    per channel."""
    from table_demo_spark.operators.codecs import encode_flac_stereo

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                left, right = _flac_stereo_pcm(doc_id)
                payloads.append(
                    encode_flac_stereo(
                        left, right, FLAC_RATE, blocksize=FLAC_BLOCKSIZE
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


FLAC_STEREO_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, n_subframes long, "
    "l_sum long, l_abs_sum long, l_checksum long, "
    "r_sum long, r_abs_sum long, r_checksum long"
)


def stereo_flac_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each stereo FLAC payload (both CRCs per frame, two
    subframes per frame, the integer mid/side inverse) and aggregate
    per channel. Lossless, so the oracle restates both channels
    analytically from the md5 streams; a swapped channel, a
    mis-shifted mid, or a side read at 16 instead of 17 bits breaks
    the per-channel checksums. ``n_subframes`` (= 2 x frames) pins
    that every frame decoded through the two-subframe stereo path."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_flac

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, pcm, stypes = decode_flac(
                    bytes(payload), return_subframe_types=True
                )
                lv = pcm[0].astype(np.int64)
                rv = pcm[1].astype(np.int64)
                idx = np.arange(lv.size) + 1
                rows.append(
                    (
                        doc_id,
                        rate,
                        lv.size,
                        len(stypes),
                        int(lv.sum()),
                        int(np.abs(lv).sum()),
                        int((lv * idx).sum()),
                        int(rv.sum()),
                        int(np.abs(rv).sum()),
                        int((rv * idx).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "n_subframes",
                    "l_sum", "l_abs_sum", "l_checksum",
                    "r_sum", "r_abs_sum", "r_checksum",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=FLAC_STEREO_SCHEMA)


JPEG_PC_W, JPEG_PC_H = 64, 32  # color: MCU grid 2x4 = 8 MCUs
_JPEG_PC_Y_BLOCKS = (JPEG_PC_W * JPEG_PC_H) // 16
_JPEG_PC_C_BLOCKS = (JPEG_PC_W * JPEG_PC_H) // 64
JPEG_PC_RESTART = 3  # 8 MCUs -> 3 intervals, the last ragged (2 MCUs)
_JPEG_PC_MCUS = (JPEG_PC_W // 16) * (JPEG_PC_H // 16)


def color_jpeg_restart_segments(docs: DataFrame) -> DataFrame:
    """(doc_id, seg_idx, n_mcus, header, seg): one row per restart
    interval of a per-document COLOR (4:2:0) JFIF payload (Y/Cb/Cr
    planes from md5 streams '#cy'/'#ccb'/'#ccr', 64x32, DRI=3 so the
    last interval is ragged). Same shape as the greyscale m18
    builder: encode + pure-byte-scan split in ONE Arrow stage; every
    output row is independently decodable (tables travel in
    ``header``, all three DC predictors reset at each marker)."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        encode_jpeg_color,
        split_jpeg_restarts,
    )

    ch, cw = JPEG_PC_H // 2, JPEG_PC_W // 2

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def plane(doc_id, blocks, salt, h, w):
            return np.frombuffer(
                _md5_stream(str(doc_id), blocks, salt), dtype=np.uint8
            ).reshape(h, w)

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                payload = encode_jpeg_color(
                    plane(doc_id, _JPEG_PC_Y_BLOCKS, "#cy", JPEG_PC_H, JPEG_PC_W),
                    plane(doc_id, _JPEG_PC_C_BLOCKS, "#ccb", ch, cw),
                    plane(doc_id, _JPEG_PC_C_BLOCKS, "#ccr", ch, cw),
                    restart_interval=JPEG_PC_RESTART,
                )
                header, segs = split_jpeg_restarts(payload)
                for i, seg in enumerate(segs):
                    n = min(
                        JPEG_PC_RESTART, _JPEG_PC_MCUS - i * JPEG_PC_RESTART
                    )
                    rows.append((doc_id, i, n, header, seg))
            yield pd.DataFrame(
                rows, columns=["doc_id", "seg_idx", "n_mcus", "header", "seg"]
            )

    return _spread_ids(docs).mapInPandas(build, schema=JPEG_SEGMENT_SCHEMA)


JPEG_COLOR_PARALLEL_SCHEMA = (
    "doc_id long, seg_idx long, n_mcus long, "
    "y_dc_sum long, cb_dc_sum long, cr_dc_sum long, "
    "y_checksum long, cb_checksum long, cr_checksum long"
)


def color_jpeg_parallel_dc_stats(segments: DataFrame) -> DataFrame:
    """Entropy-decode every COLOR restart interval INDEPENDENTLY
    (round-robin re-spread first — intervals of the same image on
    different tasks) and emit per-interval per-component DC stats.
    The order checksums pin the interleaved walk WITHIN each interval:
    Y over the flattened 4-per-MCU sub-block order (sum((4k+sub+1) *
    dc)), chroma over MCU scan order — an MCU border shifted by one,
    a sub-block swap, or any predictor carried across a marker shifts
    them."""
    import numpy as np

    from table_demo_spark.operators.codecs import JpegColorSegmentDecoder
    from table_demo_spark.sources.batch import fan_out

    def seg_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoders: dict[bytes, JpegColorSegmentDecoder] = {}
        for pdf in batches:
            rows = []
            for doc_id, seg_idx, n_mcus, header, seg in zip(
                pdf["doc_id"], pdf["seg_idx"], pdf["n_mcus"],
                pdf["header"], pdf["seg"],
            ):
                hdr = bytes(header)
                dec = decoders.get(hdr)
                if dec is None:
                    dec = decoders[hdr] = JpegColorSegmentDecoder(hdr)
                y, cb, cr = dec.dc(bytes(seg), int(n_mcus))
                yf = y.reshape(-1).astype(np.int64)
                cb = cb.astype(np.int64)
                cr = cr.astype(np.int64)
                rows.append(
                    (
                        doc_id, seg_idx, int(n_mcus),
                        int(yf.sum()), int(cb.sum()), int(cr.sum()),
                        int((yf * (np.arange(yf.size) + 1)).sum()),
                        int((cb * (np.arange(cb.size) + 1)).sum()),
                        int((cr * (np.arange(cr.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "seg_idx", "n_mcus",
                    "y_dc_sum", "cb_dc_sum", "cr_dc_sum",
                    "y_checksum", "cb_checksum", "cr_checksum",
                ],
            )

    return fan_out(segments).mapInPandas(
        seg_decode, schema=JPEG_COLOR_PARALLEL_SCHEMA
    )


DECODED_LUMA_SCHEMA = (
    "doc_id long, width long, height long, mean_luma_milli long, "
    "luma_bucket long"
)


def decoded_luma(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each PPM payload and compute integer luma statistics over
    the DECODED pixels: mean_luma_milli = sum(299 R + 587 G + 114 B)
    // (w*h), bucketed by 32000 milli-luma. Vectorized numpy inside the
    Arrow batch; dimensions come from the parsed header, not metadata."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.array([LUMA_R, LUMA_G, LUMA_B], dtype=np.int64)
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode_image(payload)
                h, w = arr.shape[:2]
                total = int((arr.astype(np.int64) * weights).sum())
                mean_milli = total // (w * h)
                rows.append((doc_id, w, h, mean_milli, mean_milli // 32_000))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "mean_luma_milli",
                    "luma_bucket",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=DECODED_LUMA_SCHEMA)


RESIZED_LUMA_SCHEMA = (
    "doc_id long, width long, height long, mean_luma_milli long"
)


def resized_luma(
    docs_with_payload: DataFrame,
    out_w: int = RESIZE_W,
    out_h: int = RESIZE_H,
) -> DataFrame:
    """decode -> resize_image (nearest-neighbor re-encode) -> decode ->
    luma over the RESIZED raster: exercises the full resize round-trip,
    not just the parser. Output dimensions come from re-parsing the
    resized payload's header."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.array([LUMA_R, LUMA_G, LUMA_B], dtype=np.int64)
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                resized = resize_image(payload, out_w, out_h)
                arr = decode_image(resized)
                h, w = arr.shape[:2]
                total = int((arr.astype(np.int64) * weights).sum())
                rows.append((doc_id, w, h, total // (w * h)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_luma_milli"],
            )

    return docs_with_payload.mapInPandas(extract, schema=RESIZED_LUMA_SCHEMA)


PCM_STATS_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, sum_abs long, "
    "mean_abs_milli long"
)


def decoded_pcm_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each WAV payload (RIFF chunk walk) and compute integer
    amplitude statistics over the DECODED int16 samples: sum of
    absolute values and its per-sample milli-mean."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_wav

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(payload))
                sum_abs = int(np.abs(samples.astype(np.int64)).sum())
                n = len(samples)
                rows.append(
                    (doc_id, rate, n, sum_abs, (sum_abs * 1000) // n)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "sum_abs",
                    "mean_abs_milli",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=PCM_STATS_SCHEMA)


PCM_VAD_FRAME_SAMPLES = 32
PCM_VAD_THRESHOLD = 524_288  # ~mean abs-sum of a 32-sample uniform frame


def decoded_pcm_frame_energy(docs_with_payload: DataFrame) -> DataFrame:
    """Per-frame integer energy over DECODED PCM — the real-codec
    version of :func:`vad_frame_energy`: decode each RIFF/WAVE payload
    (chunk walk, codecs.decode_wav), window the int16 samples into
    fixed non-overlapping frames (complete frames only) and emit the
    per-frame sum of absolute amplitudes, numpy-vectorized inside the
    Arrow batch. Feed the result to :func:`vad_segments` — the
    declarative gaps-and-islands segmentation is decode-agnostic, so
    composing real decode + existing segmentation changes no plan
    shape downstream."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_wav

    n = PCM_VAD_FRAME_SAMPLES

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            fnos: list = []
            energies: list = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, samples = decode_wav(bytes(payload))
                k = len(samples) // n
                if k == 0:
                    continue
                e = (
                    np.abs(samples[: k * n].astype(np.int64))
                    .reshape(k, n)
                    .sum(axis=1)
                )
                ids.extend([doc_id] * k)
                fnos.extend(range(k))
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": fnos, "energy": energies}
            )

    return docs_with_payload.mapInPandas(extract, schema=VAD_FRAME_SCHEMA)


# --- perceptual image hashing (aHash) -------------------------------------

AH_GRID = 8  # 8x8 block grid -> 64-bit hash
AH_BANDS = 4  # bands of 16 bits each for the Hamming candidate join
AH_BAND_BITS = 64 // AH_BANDS
_AH_BLK_H = PNG_H // AH_GRID  # 2 rows per block
_AH_BLK_W = PNG_W // AH_GRID  # 3 cols per block


def with_png_pair_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, variant, payload): TWO real PNG images per document —
    variant 0 is the doc's md5-stream raster (same bytes as
    with_png_payload), variant 1 is the same raster with ONE pixel's
    green channel saturated ((0,0,G) -> 255): a small, localized edit
    of the kind perceptual dedup exists to catch (re-encodes,
    watermarks, hot pixels) — it shifts one block sum and the global
    mean by <= 587*255 milli-luma units, so the variant's aHash differs from
    the original's in at most a few borderline bits. Both variants
    run through the full zlib-deflate + scanline-filter PNG encoder,
    so the downstream hash works on genuinely decoded pixels, not on
    the generator's arrays."""
    import numpy as np

    from table_demo_spark.operators.codecs import encode_png

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, variants, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                raster = np.frombuffer(
                    _md5_stream(str(doc_id), _PNG_BLOCKS, "#png"),
                    dtype=np.uint8,
                ).reshape(PNG_H, PNG_W, 3)
                edited = raster.copy()
                edited[0, 0, 1] = 255
                for variant, arr in ((0, raster), (1, edited)):
                    ids.append(doc_id)
                    variants.append(variant)
                    payloads.append(encode_png(arr))
            yield pd.DataFrame(
                {"doc_id": ids, "variant": variants, "payload": payloads}
            )

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, variant int, payload binary"
    )


def image_ahash_bands(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, variant, band0..band3): 64-bit average-hash of each
    decoded image, split into ``AH_BANDS`` 16-bit integers for the
    banded Hamming join. The hash is INTEGER-EXACT end to end: per
    8x8-grid block, luma sum S = sum(299r + 587g + 114b) over the
    block's pixels (the repo's integer milli-luma convention);
    bit_i = (64 * S_i > T) where T is the whole-image luma sum
    — block-mean-vs-image-mean with the division cleared, so the
    ANSI-SQL oracle states the identical comparison. Decode is the
    REAL codec path (zlib inflate + filter inversion via
    decode_image), one image per batch element, embarrassingly
    parallel."""
    import numpy as np

    n_blocks = AH_GRID * AH_GRID

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bands: list[list[int]] = [[] for _ in range(AH_BANDS)]
            for payload in pdf["payload"]:
                arr = decode_image(payload).astype(np.int64)
                luma = (
                    LUMA_R * arr[:, :, 0]
                    + LUMA_G * arr[:, :, 1]
                    + LUMA_B * arr[:, :, 2]
                )
                s = luma.reshape(
                    AH_GRID, _AH_BLK_H, AH_GRID, _AH_BLK_W
                ).sum(axis=(1, 3))
                total = int(s.sum())
                bits = (n_blocks * s.reshape(-1) > total).astype(np.int64)
                for j in range(AH_BANDS):
                    val = 0
                    for b in range(AH_BAND_BITS):
                        val |= int(bits[j * AH_BAND_BITS + b]) << b
                    out_bands[j].append(val)
            cols = {"doc_id": pdf["doc_id"], "variant": pdf["variant"]}
            for j in range(AH_BANDS):
                cols[f"band{j}"] = pd.Series(out_bands[j], dtype="int64")
            yield pd.DataFrame(cols)

    schema = "doc_id long, variant int, " + ", ".join(
        f"band{j} long" for j in range(AH_BANDS)
    )
    return docs_with_payload.mapInPandas(extract, schema=schema)


def flac_resample_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each FLAC payload and DECIMATE-BY-2 through a crude
    integer half-band filter — the 16 kHz -> 8 kHz feature-extract
    step speech pipelines run before VAD/ASR frontends:
    ``y_k = floor((s_{2k-1} + 2*s_{2k} + s_{2k+1}) / 4)`` with
    zero-padded edges (a 3-tap [1,2,1]/4 anti-alias kernel, the
    simplest filter that is not a bare sample drop). Everything after
    the lossless decode is INTEGER arithmetic with floor division, so
    the oracle states the resampled stream analytically from the md5
    PCM (lag/lead over the sample index) — a tap misaligned by one
    sample, a wrong edge pad, or floor-vs-truncate on negatives all
    shift the checksum."""
    import numpy as np

    from table_demo_spark.operators.codecs import decode_flac

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, pcm = decode_flac(bytes(payload))
                v = pcm.astype(np.int64)
                padded = np.concatenate(([0], v, [0]))
                filt = padded[:-2] + 2 * padded[1:-1] + padded[2:]
                y = np.floor_divide(filt[0::2], 4)
                rows.append(
                    (
                        doc_id,
                        rate // 2,
                        y.size,
                        int(y.sum()),
                        int(np.abs(y).sum()),
                        int((y * (np.arange(y.size) + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples",
                    "pcm_sum", "pcm_abs_sum", "pcm_checksum",
                ],
            )

    return docs_with_payload.mapInPandas(extract, schema=FLAC_PCM_SCHEMA)


H264_CAVLC_MB_W = 4  # 64x16 luma: one MB row, 4 Intra_16x16 macroblocks
# per-MB plant bytes: 16 luma-DC + 16 blocks x 15 AC + 2x4 chroma DC
_CAVLC_MB_BYTES = 16 + 16 * 15 + 8
_CAVLC_BLOCKS = (H264_CAVLC_MB_W * _CAVLC_MB_BYTES) // 16  # 66 md5 blocks
# the one pinned ESCAPE level (level_prefix >= 15 path): mb 1, spatial
# block (y4 0, x4 2), raster position 5
_CAVLC_ESC = (1, 0, 2, 5)


def _cavlc_level(b: int) -> int:
    """Planted AC level from one md5 byte — the same formula the
    oracle restates: zero with p=150/256, else magnitude 1 (p=1/2)
    or 2..8, sign from parity."""
    if b < 150:
        return 0
    m = (b - 150) % 14
    mag = 1 if m < 7 else m - 5
    return mag if b % 2 == 0 else -mag


def with_h264_cavlc_payload(
    docs: DataFrame, mb_w: int = H264_CAVLC_MB_W, mb_h: int = 1,
    chroma_ac: bool = False, pred_modes: bool = False,
    entropy: str = "cavlc",
) -> DataFrame:
    """(doc_id, payload): an Annex B stream whose IDR slice carries
    CAVLC-coded Intra_16x16 residual data (14496-10 9.2 / 7.3.5.3) —
    the entropy-coded layer under m38's I_PCM.  Levels are planted
    from the doc's md5 stream (salt '#cav') in the CODED domain —
    luma-DC Hadamard levels in [-2,2], sparse AC levels with mixed
    magnitudes (suffix-length evolution on the wire), chroma 2x2 DC
    levels — plus one pinned ~4000-levelCode ESCAPE level per doc so
    the level_prefix >= 15 path sits on every value hash.  Dense
    blocks drive the nC neighbour ladder through all four coeff_token
    contexts (left-neighbour means reach >= 8 for the FLC context)."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_h264_pps,
        decode_h264_sps,
        encode_annexb,
        encode_h264_i16x16_slice,
        encode_h264_i16x16_slice_cabac,
        encode_h264_pps,
        encode_h264_sps,
    )

    if entropy not in ("cavlc", "cabac"):
        raise ValueError(f"unknown entropy coder {entropy}")
    if entropy == "cabac" and (chroma_ac or pred_modes or mb_h != 1):
        raise ValueError("CABAC payloads ship the base m39 shape only")
    sl_encode = (
        encode_h264_i16x16_slice_cabac
        if entropy == "cabac"
        else encode_h264_i16x16_slice
    )
    mw, mh = mb_w, mb_h
    sps_rbsp = encode_h264_sps(66, 30, mw, mh)
    # pic_init_qp 42; entropy_coding_mode_flag selects the coder
    pps_rbsp = encode_h264_pps(
        0, 0, 16, entropy_coding_mode=1 if entropy == "cabac" else 0
    )
    sps = decode_h264_sps(sps_rbsp)
    pps = decode_h264_pps(pps_rbsp)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                mbb = _CAVLC_MB_BYTES + (120 if chroma_ac else 0)
                salt = (
                    "#cab" if entropy == "cabac"
                    else "#cav5" if pred_modes
                    else "#cav3" if chroma_ac
                    else "#cav" if mh == 1 else "#cav2"
                )
                raw = _md5_stream(
                    str(doc_id), (mw * mh * mbb) // 16, salt
                )
                mbs = []
                for m in range(mw * mh):
                    base = m * mbb
                    dc = np.array(
                        [raw[base + k] % 5 - 2 for k in range(16)],
                        np.int64,
                    ).reshape(4, 4)
                    ac = np.zeros((4, 4, 4, 4), np.int64)
                    for y4 in range(4):
                        for x4 in range(4):
                            o = base + 16 + (4 * y4 + x4) * 15
                            flat = np.zeros(16, np.int64)
                            for pos in range(1, 16):
                                b = raw[o + pos - 1]
                                if (m, y4, x4, pos) == _CAVLC_ESC:
                                    flat[pos] = 1000 + 4 * b
                                else:
                                    flat[pos] = _cavlc_level(b)
                            ac[y4][x4] = flat.reshape(4, 4)
                    cbo = base + 16 + 240
                    cb_dc = np.array(
                        [raw[cbo + k] % 7 - 3 for k in range(4)], np.int64
                    ).reshape(2, 2)
                    cr_dc = np.array(
                        [raw[cbo + 4 + k] % 7 - 3 for k in range(4)],
                        np.int64,
                    ).reshape(2, 2)
                    mbd = {"dc": dc, "ac": ac, "cb_dc": cb_dc,
                           "cr_dc": cr_dc}
                    if chroma_ac:
                        # 2 planes x 4 blocks x 15 AC bytes after the
                        # DC bytes: sparser than luma, zero-centred
                        for pi, key in ((0, "cb_ac"), (1, "cr_ac")):
                            cc = np.zeros((2, 2, 4, 4), np.int64)
                            for idx in range(4):
                                x2, y2 = idx % 2, idx // 2
                                o = base + 264 + pi * 60 + idx * 15
                                flat = np.zeros(16, np.int64)
                                for pos in range(1, 16):
                                    b = raw[o + pos - 1]
                                    flat[pos] = (
                                        0 if b < 170 else b % 5 - 2
                                    )
                                cc[y2][x2] = flat.reshape(4, 4)
                            mbd[key] = cc
                    if pred_modes:
                        # per-MB Intra16x16 mode from the MB's first
                        # plant byte, constrained by availability:
                        # (0,0) DC; (1,0) H|DC; (0,1) V|DC; (1,1) any
                        b0 = raw[base]
                        mxy = (m % mw, m // mw)
                        if mxy == (0, 0):
                            mbd["pred_mode"] = 2
                        elif mxy == (1, 0):
                            mbd["pred_mode"] = 1 if b0 % 2 else 2
                        elif mxy == (0, 1):
                            mbd["pred_mode"] = 0 if b0 % 2 else 2
                        else:
                            mbd["pred_mode"] = b0 % 4
                    mbs.append(mbd)
                sl = sl_encode(
                    sps, pps, mbs,
                    frame_num=int(doc_id) % 16,
                    idr_pic_id=int(doc_id) % 32,
                )
                payloads.append(
                    encode_annexb(
                        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def h264_cavlc_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each Annex B stream to PIXELS through the CAVLC slice
    walk (parameter-set stores -> slice header -> per-MB coeff_token
    / levels / total_zeros / run_before -> Hadamard + dequant +
    integer inverse transform -> DC prediction) and reduce to integer
    stats the oracle restates end-to-end from the planted levels: the
    weighted checksum makes every AC coefficient's POSITION
    hash-relevant (a plain sum would not — the inverse transform's
    AC basis functions are zero-sum)."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_annexb,
        decode_h264_i16x16_slice,
        decode_h264_i16x16_slice_cabac,
        decode_h264_pps,
        decode_h264_sps,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sps_store, pps_store = {}, {}
                out = None
                for nal in decode_annexb(bytes(payload)):
                    t = nal["nal_type"]
                    if t == 7:
                        info = decode_h264_sps(nal["rbsp"])
                        sps_store[info["sps_id"]] = info
                    elif t == 8:
                        info = decode_h264_pps(nal["rbsp"])
                        pps_store[info["pps_id"]] = info
                    elif t == 5:
                        # the ACTIVE PPS's entropy_coding_mode_flag
                        # selects the entropy layer (7.4.2.2): peek
                        # pic_parameter_set_id (the slice header's
                        # third ue(v)) — the dispatch a real decoder
                        # performs
                        from table_demo_spark.operators.codecs import (
                            _BitReader,
                            _expgolomb_ue,
                        )

                        peek = _BitReader(nal["rbsp"])
                        _expgolomb_ue(peek)  # first_mb_in_slice
                        _expgolomb_ue(peek)  # slice_type
                        pid = _expgolomb_ue(peek)
                        sl_decode = (
                            decode_h264_i16x16_slice_cabac
                            if pps_store[pid].get("entropy_coding_mode")
                            else decode_h264_i16x16_slice
                        )
                        out = sl_decode(
                            nal["rbsp"], 5, nal["ref_idc"],
                            pps_store, sps_store,
                        )
                hdr, y, cb, cr, total_coeff = out
                h, w = y.shape
                yl = y.astype(np.int64)
                px = np.arange(h * w, dtype=np.int64).reshape(h, w)
                rows.append(
                    (
                        int(doc_id), int(w), int(h),
                        int(hdr["frame_num"]), int(total_coeff),
                        int(yl.sum()),
                        int((yl * (1 + px % 7)).sum()),
                        int(yl.min()), int(yl.max()),
                        int(cb.astype(np.int64).sum()),
                        int(cr.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "frame_num",
                    "total_coeff", "sum_y", "wsum_y", "y_min", "y_max",
                    "sum_cb", "sum_cr",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, width long, height long, frame_num long, "
            "total_coeff long, sum_y long, wsum_y long, y_min long, "
            "y_max long, sum_cb long, sum_cr long"
        ),
    )


_I4_BLOCKS = 18  # 16 blocks x (1 mode + 16 level bytes) + 8 chroma DC


def with_h264_i4x4_payload(
    docs: DataFrame, full_modes: bool = False
) -> DataFrame:
    """(doc_id, payload): an Annex B stream whose IDR slice is ONE
    I_4x4 macroblock — per-4x4 prediction modes drawn from plant
    bytes under availability rules ((0,0) DC; top row H|DC; left
    column V|DC; interior V|H|DC), signalled against the 8.3.1.1
    most-probable-mode inference, coded_block_pattern 31 through the
    Table 9-4 me(v) mapping, and 16 FULL-16-coefficient CAVLC luma
    blocks (no DC/AC split — the other residual geometry)."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_h264_pps,
        decode_h264_sps,
        encode_annexb,
        encode_h264_i4x4_slice,
        encode_h264_pps,
        encode_h264_sps,
    )

    sps_rbsp = encode_h264_sps(66, 30, 1, 1)
    pps_rbsp = encode_h264_pps(0, 0, 16)  # pic_init_qp 42
    sps = decode_h264_sps(sps_rbsp)
    pps = decode_h264_pps(pps_rbsp)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(
                    str(doc_id), _I4_BLOCKS,
                    "#cav7" if full_modes else "#cav6",
                )
                modes = [[0] * 4 for _ in range(4)]
                luma = np.zeros((4, 4, 4, 4), np.int64)
                for y4 in range(4):
                    for x4 in range(4):
                        o = (4 * y4 + x4) * 17
                        b0 = raw[o]
                        if (x4, y4) == (0, 0):
                            modes[y4][x4] = 2
                        elif full_modes:
                            # full nine-mode draw under availability
                            if y4 == 0:
                                modes[y4][x4] = (1, 2, 8)[b0 % 3]
                            elif x4 == 0:
                                modes[y4][x4] = (0, 2, 3, 7)[b0 % 4]
                            else:
                                modes[y4][x4] = b0 % 9
                        elif y4 == 0:
                            modes[y4][x4] = 1 if b0 % 2 else 2
                        elif x4 == 0:
                            modes[y4][x4] = 0 if b0 % 2 else 2
                        else:
                            modes[y4][x4] = b0 % 3
                        flat = np.zeros(16, np.int64)
                        for pos in range(16):
                            flat[pos] = _cavlc_level(raw[o + 1 + pos])
                        luma[y4][x4] = flat.reshape(4, 4)
                cb_dc = np.array(
                    [raw[272 + k] % 7 - 3 for k in range(4)], np.int64
                ).reshape(2, 2)
                cr_dc = np.array(
                    [raw[276 + k] % 7 - 3 for k in range(4)], np.int64
                ).reshape(2, 2)
                sl = encode_h264_i4x4_slice(
                    sps, pps,
                    {"modes": modes, "luma": luma,
                     "cb_dc": cb_dc, "cr_dc": cr_dc},
                    frame_num=int(doc_id) % 16,
                    idr_pic_id=int(doc_id) % 32,
                )
                payloads.append(
                    encode_annexb(
                        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def h264_i4x4_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each I_4x4 stream to PIXELS (mode signalling inverted
    through the most-probable-mode inference, 16 sequential 4x4
    reconstructions) and reduce to integer stats; ``mode_sum`` pins
    the decoded mode PLANE on the value hash — a single mis-inferred
    most-probable mode shifts it even when pixels happen to agree."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_annexb,
        decode_h264_i4x4_slice,
        decode_h264_pps,
        decode_h264_sps,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sps_store, pps_store = {}, {}
                out = None
                for nal in decode_annexb(bytes(payload)):
                    t = nal["nal_type"]
                    if t == 7:
                        info = decode_h264_sps(nal["rbsp"])
                        sps_store[info["sps_id"]] = info
                    elif t == 8:
                        info = decode_h264_pps(nal["rbsp"])
                        pps_store[info["pps_id"]] = info
                    elif t == 5:
                        out = decode_h264_i4x4_slice(
                            nal["rbsp"], 5, nal["ref_idc"],
                            pps_store, sps_store,
                        )
                hdr, y, cb, cr, modes, total_coeff = out
                yl = y.astype(np.int64)
                px = np.arange(256, dtype=np.int64).reshape(16, 16)
                rows.append(
                    (
                        int(doc_id), int(hdr["frame_num"]),
                        int(total_coeff),
                        int(sum(
                            (4 * yy + xx + 1) * modes[yy][xx]
                            for yy in range(4) for xx in range(4)
                        )),
                        int(yl.sum()),
                        int((yl * (1 + px % 7)).sum()),
                        int(yl.min()), int(yl.max()),
                        int(cb.astype(np.int64).sum()),
                        int(cr.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_num", "total_coeff", "mode_sum",
                    "sum_y", "wsum_y", "y_min", "y_max",
                    "sum_cb", "sum_cr",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, frame_num long, total_coeff long, "
            "mode_sum long, sum_y long, wsum_y long, y_min long, "
            "y_max long, sum_cb long, sum_cr long"
        ),
    )


# -- HEIF-family (AVIF / HEIC) real-codec roundtrips (r13) -------------------
# The first multimodal family adjudicated by REAL third-party codecs
# end to end (operators/heif.py): AVIF = libaom encode -> dav1d decode,
# HEIC = x265 encode -> libde265 decode — independent codebases on the
# two sides of every roundtrip, plus a three-decoder (aom/dav1d/gav1)
# bit-exactness pin in tests.  Fixture planes are md5-derived and
# constrained to the in-RGB-gamut box (Y in [70,180], C in [108,148])
# under which the lossless roundtrip is bit-exact through libheif's
# shared colour pipeline (box is convex, so chroma upsampling cannot
# leave it); the oracle restates the SOURCE planes, so a broken
# encoder parameter, decoder regression, or plane-layout bug on the
# Spark side breaks the value hash.

HEIF_H, HEIF_W = 48, 64
_HEIF_YN = HEIF_H * HEIF_W
_HEIF_CN = (HEIF_H // 2) * (HEIF_W // 2)
_HEIF_BYTES = _HEIF_YN + 2 * _HEIF_CN  # 4608 = 288 md5 blocks


def _heif_planes(doc_id, salt: str):
    """Deterministic in-gamut YCbCr 4:2:0 planes from the doc's md5
    stream: byte i of the stream maps raster-order to Y (70 + b%111),
    then Cb, then Cr (108 + b%41) — the exact layout the oracle SQL
    restates byte-for-byte."""
    import numpy as np

    raw = np.frombuffer(
        _md5_stream(str(doc_id), _HEIF_BYTES // 16, salt), np.uint8
    ).astype(np.int64)
    y = (70 + raw[:_HEIF_YN] % 111).astype(np.uint8).reshape(HEIF_H, HEIF_W)
    cb = (
        (108 + raw[_HEIF_YN:_HEIF_YN + _HEIF_CN] % 41)
        .astype(np.uint8)
        .reshape(HEIF_H // 2, HEIF_W // 2)
    )
    cr = (
        (108 + raw[_HEIF_YN + _HEIF_CN:] % 41)
        .astype(np.uint8)
        .reshape(HEIF_H // 2, HEIF_W // 2)
    )
    return y, cb, cr


def with_heif_payload(docs: DataFrame, compression: int) -> DataFrame:
    """(doc_id, payload): a real AVIF (COMPRESSION_AV1, libaom) or
    HEIC (COMPRESSION_HEVC, x265) container per document, encoded
    LOSSLESS from the doc's deterministic in-gamut planes.  Encoder
    speed knobs are pinned (aom speed 9 / x265 ultrafast, both with
    single-threaded settings where exposed) — they change the
    bitstream, never the lossless pixels, so the value hash is
    encoder-setting-independent by construction."""
    from table_demo_spark.operators import heif

    if compression == heif.COMPRESSION_AV1:
        salt, params = "#avif", (("speed", "9"), ("threads", "1"))
    elif compression == heif.COMPRESSION_HEVC:
        # x265:-prefixed params pass through the libheif plugin to
        # x265_param_parse; without them each encoder instance spins
        # a pools(ncpu) thread pool and 32 concurrent Spark workers
        # thrash the box (measured r13: 124 s -> single-digit s at
        # sf0.1 with pools pinned; lossless unaffected)
        salt, params = "#heic", (
            ("preset", "ultrafast"),
            ("x265:pools", "none"),
            ("x265:frame-threads", "1"),
        )
    else:
        raise ValueError(f"unsupported HEIF compression {compression}")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                y, cb, cr = _heif_planes(doc_id, salt)
                payloads.append(
                    heif.encode_heif(y, cb, cr, compression, params)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def heif_pixel_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode each HEIF container through the system codec stack
    (dav1d for AVIF, libde265 for HEIC — libheif's priority plugins)
    and reduce the planes to position-weighted integer stats; the
    weights make every pixel's POSITION hash-relevant, so a stride
    bug, plane swap, or subsampling error shifts the checksum even
    when the multiset of pixel values survives."""
    import numpy as np

    from table_demo_spark.operators.heif import decode_heif

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                y, cb, cr = decode_heif(bytes(payload))
                ph, pw = y.shape
                yl = y.astype(np.int64).ravel()
                cbl = cb.astype(np.int64).ravel()
                crl = cr.astype(np.int64).ravel()
                wy = 1 + np.arange(yl.size, dtype=np.int64) % 7
                wc = 1 + np.arange(cbl.size, dtype=np.int64) % 5
                rows.append(
                    (
                        int(doc_id), int(pw), int(ph),
                        int(yl.sum()), int((wy * yl).sum()),
                        int(cbl.sum()), int(crl.sum()),
                        int((wc * cbl).sum() + (wc * crl).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "sum_y", "wsum_y",
                    "sum_cb", "sum_cr", "wsum_c",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, width long, height long, sum_y long, "
            "wsum_y long, sum_cb long, sum_cr long, wsum_c long"
        ),
    )


# -- HEVC slice-data decode vs libde265 (m51, r14) ---------------------------

_M51_SALT_H = "#m51h"
_M51_SALT_P = "#m51p"
_M55_SALT_H = "#m55h"
_M55_SALT_P = "#m55p"
_M51_MAX_BYTES = 64 * 64 + 2 * 32 * 32  # largest drawn plane set


def hevc_slice_decode_stats(
    docs: DataFrame, deblock: bool = False, fraction: float = 1.0
) -> DataFrame:
    """Per document: draw dims (w,h in {32..64} step 8 — partial CTUs
    under ctu=32 force boundary splits), CTU size, and QP (12..42,
    both sides of every dequant shift) from the doc's md5 header
    block; fill FULL-RANGE noise planes from the '#m51p' stream
    (maximal residual entropy — every greater1/greater2/Rice escape
    path live); encode with the REAL x265 encoder under the
    constrained-tools pin; then decode the stream TWICE — once with
    the from-spec pure-Python HEVC decoder (operators/hevc.py) and
    once with libde265 called directly via ctypes (raw decoder
    planes; libheif's colour pipeline would clip out-of-gamut YCbCr,
    the r13 finding, and full-range noise is deliberately out of
    gamut) — and compare bit-for-bit.  exact_* carry the adjudication
    onto the value hash; dims/qp/slice_qp (x265 CQP I-slice offset is
    uniformly -3 under these params, probed over qp 12..42 at both
    CTU sizes) and the source-plane checksums are md5-restatable so
    the oracle also pins that the planes fed to x265 are the claimed
    ones.  Corpus-linear: one task per doc batch after fan_out, no
    cross-partition work.

    Scale contract: full-corpus at fixture scale; at production
    scale this is a SAMPLED AUDIT query — pass ``fraction=1/k``
    for the deterministic doc_id-keyed subsample (the dataflow
    itself is corpus-linear; only the per-doc codec constant
    makes full-corpus runs expensive)."""
    import numpy as np

    from table_demo_spark.operators import hevc

    salt_h = _M55_SALT_H if deblock else _M51_SALT_H
    salt_p = _M55_SALT_P if deblock else _M51_SALT_P

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hdr = _md5_stream(str(doc_id), 1, salt_h)
                w = 32 + 8 * (hdr[0] % 5)
                h = 32 + 8 * (hdr[1] % 5)
                ctu = 16 if hdr[2] % 2 == 0 else 32
                qp = 12 + hdr[3] % 31
                yn, cn = w * h, (w // 2) * (h // 2)
                total = yn + 2 * cn
                raw = np.frombuffer(
                    _md5_stream(
                        str(doc_id), (total + 15) // 16, salt_p
                    ),
                    np.uint8,
                )[:total].astype(np.int64)
                y = raw[:yn].astype(np.uint8).reshape(h, w)
                cb = (
                    raw[yn:yn + cn].astype(np.uint8)
                    .reshape(h // 2, w // 2)
                )
                cr = (
                    raw[yn + cn:].astype(np.uint8)
                    .reshape(h // 2, w // 2)
                )
                data = hevc.encode_heic_constrained(
                    y, cb, cr, qp, ctu=ctu, deblock=deblock
                )
                gy, gcb, gcr, st = hevc.decode_heic_from_spec(
                    data, allow_deblock=deblock
                )
                ry, rcb, rcr = hevc.decode_hevc_libde265(
                    hevc.heic_nal_units(data)
                )
                wy = 1 + np.arange(yn, dtype=np.int64) % 7
                rows.append(
                    (
                        int(doc_id), w, h, ctu, qp, int(st["slice_qp"]),
                        int(raw[:yn].sum()),
                        int((wy * raw[:yn]).sum()),
                        int(raw[yn:yn + cn].sum()),
                        int(raw[yn + cn:].sum()),
                        int(gy.shape == ry.shape and bool((gy == ry).all())),
                        int(
                            gcb.shape == rcb.shape
                            and bool((gcb == rcb).all())
                        ),
                        int(
                            gcr.shape == rcr.shape
                            and bool((gcr == rcr).all())
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "ctu", "qp", "slice_qp",
                    "src_sum_y", "src_wsum_y", "src_sum_cb", "src_sum_cr",
                    "exact_y", "exact_cb", "exact_cr",
                ],
            )

    return _spread_ids(docs, fraction).mapInPandas(
        run,
        schema=(
            "doc_id long, width long, height long, ctu long, qp long, "
            "slice_qp long, src_sum_y long, src_wsum_y long, "
            "src_sum_cb long, src_sum_cr long, exact_y long, "
            "exact_cb long, exact_cr long"
        ),
    )


# -- HEVC P-slice video decode vs libde265 (m58, r15) ------------------------

_M58_SALT_H = "#m58h"
_M58_SALT_P = "#m58p"
_M58_MAX_Y = 64 * 64  # largest drawn luma plane
_M58_MAX_C = 32 * 32


def hevc_pslice_decode_stats(
    docs: DataFrame, fraction: float = 1.0
) -> DataFrame:
    """HEVC INTER layer (r14 verdict 'next round #2'): per document,
    draw dims (32..64 step 8), CTU size, QP (12..42), frame count
    (2..3), merge-candidate budget (max-merge 1..5) and a CONTENT
    MODE from the '#m58h' md5 block, build a short video, encode it
    with the REAL x265 encoder as one IDR I-slice + chained TRAIL
    P-slices (single L0 reference, no TMVP — the m58 pins), then
    decode the stream TWICE — the from-spec P-slice decoder
    (operators/hevc.py::HevcPSliceDecoder: cu_skip/merge/AMVP
    syntax, spatial candidate derivation, quarter-pel 8-tap MC,
    inter residual trees) and libde265 via ctypes — and compare
    every frame bit-for-bit.  The three content modes keep every
    inter path live AND md5/closed-form-restatable for the oracle:
    mode 0 rolls one noise plane by an even per-frame vector (pure
    translation -> skip/merge CUs with exact integer MVs), mode 1
    samples a linear ramp drifting at QUARTER-PEL steps (the 8-tap /
    4-tap interpolation filters are the only good predictor), mode 2
    draws fresh full-range noise per frame (intra-in-P CUs + dense
    inter residuals).  The oracle restates the drawn geometry, the
    x265 CQP slice-QP law (I = qp-3, P = qp, probed over the full
    sweep in tests), and source-plane checksums of the first and
    last frames (mode-dependent closed forms, incl. the modular
    roll indexing).  Corpus-linear: one task per doc batch after
    fan_out, no shuffle, no driver state.

    Scale contract: full-corpus at fixture scale; at production
    scale this is a SAMPLED AUDIT query — pass ``fraction=1/k``
    for the deterministic doc_id-keyed subsample (the dataflow
    itself is corpus-linear; only the per-doc codec constant
    makes full-corpus runs expensive)."""
    import numpy as np

    from table_demo_spark.operators import hevc

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hdr = _md5_stream(str(doc_id), 1, _M58_SALT_H)
                w = 32 + 8 * (hdr[0] % 5)
                h = 32 + 8 * (hdr[1] % 5)
                ctu = 16 if hdr[2] % 2 == 0 else 32
                qp = 12 + hdr[3] % 31
                n_frames = 2 + hdr[4] % 2
                mode = hdr[5] % 3
                max_merge = 1 + hdr[6] % 5
                yn, cn = w * h, (w // 2) * (h // 2)
                total = yn + 2 * cn
                frames = []
                if mode == 0:
                    dx = 2 * (1 + hdr[7] % 3)
                    dy = 2 * (hdr[8] % 3)
                    raw = np.frombuffer(
                        _md5_stream(
                            str(doc_id), (total + 15) // 16, _M58_SALT_P
                        ),
                        np.uint8,
                    )[:total]
                    y0 = raw[:yn].reshape(h, w)
                    cb0 = raw[yn:yn + cn].reshape(h // 2, w // 2)
                    cr0 = raw[yn + cn:].reshape(h // 2, w // 2)
                    for k in range(n_frames):
                        frames.append(
                            (
                                np.roll(y0, (k * dy, k * dx), (0, 1)),
                                np.roll(
                                    cb0,
                                    (k * dy // 2, k * dx // 2),
                                    (0, 1),
                                ),
                                np.roll(
                                    cr0,
                                    (k * dy // 2, k * dx // 2),
                                    (0, 1),
                                ),
                            )
                        )
                elif mode == 1:
                    a = 1 + hdr[7] % 3
                    b = 1 + hdr[8] % 3
                    sx = 1 + hdr[9] % 3
                    sy = hdr[10] % 3
                    rr, cc = np.mgrid[0:h, 0:w]
                    rc, ccc = np.mgrid[0:h // 2, 0:w // 2]
                    for k in range(n_frames):
                        y = (
                            (a * (4 * cc + k * sx) + b * (4 * rr + k * sy))
                            // 4
                        ) % 256
                        cb = (
                            (a * (8 * ccc + k * sx) + b * (8 * rc + k * sy))
                            // 4
                            + 60
                        ) % 256
                        cr = (cb + 60) % 256
                        frames.append(
                            (
                                y.astype(np.uint8),
                                cb.astype(np.uint8),
                                cr.astype(np.uint8),
                            )
                        )
                else:
                    raw = np.frombuffer(
                        _md5_stream(
                            str(doc_id),
                            (n_frames * total + 15) // 16,
                            _M58_SALT_P,
                        ),
                        np.uint8,
                    )
                    for k in range(n_frames):
                        sl = raw[k * total:(k + 1) * total]
                        frames.append(
                            (
                                sl[:yn].reshape(h, w),
                                sl[yn:yn + cn].reshape(h // 2, w // 2),
                                sl[yn + cn:].reshape(h // 2, w // 2),
                            )
                        )
                nals = hevc.encode_hevc_video(
                    frames, qp=qp, ctu=ctu, max_merge=max_merge
                )
                got = hevc.decode_hevc_video_from_spec(nals)
                want = hevc.decode_hevc_libde265_frames(nals)
                if len(got) != n_frames or len(want) != n_frames:
                    raise ValueError(
                        f"m58: frame count mismatch {len(got)} vs "
                        f"{len(want)} vs {n_frames}"
                    )
                p_qps = {
                    st["slice_qp"]
                    for _, _, _, st in got
                    if st["slice_type"] == "P"
                }
                if len(p_qps) != 1:
                    raise ValueError(f"m58: non-uniform P QPs {p_qps}")
                ex = [1, 1, 1]
                for (gy, gcb, gcr, _), (wy, wcb, wcr) in zip(got, want):
                    for j, (g, r) in enumerate(
                        ((gy, wy), (gcb, wcb), (gcr, wcr))
                    ):
                        if g.shape != r.shape or not (g == r).all():
                            ex[j] = 0
                wy_w = 1 + np.arange(yn, dtype=np.int64) % 7
                yf = frames[0][0].reshape(-1).astype(np.int64)
                yl = frames[-1][0].reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(doc_id), w, h, ctu, qp, n_frames, mode,
                        int(got[0][3]["slice_qp"]), int(p_qps.pop()),
                        int(yf.sum()), int((wy_w * yf).sum()),
                        int(yl.sum()), int((wy_w * yl).sum()),
                        int(frames[0][1].astype(np.int64).sum()),
                        int(frames[0][2].astype(np.int64).sum()),
                        ex[0], ex[1], ex[2],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "ctu", "qp",
                    "n_frames", "mode", "slice_qp_i", "slice_qp_p",
                    "sum_y0", "wsum_y0", "sum_ylast", "wsum_ylast",
                    "sum_cb0", "sum_cr0", "exact_y", "exact_cb",
                    "exact_cr",
                ],
            )

    return _spread_ids(docs, fraction).mapInPandas(
        run,
        schema=(
            "doc_id long, width long, height long, ctu long, qp long, "
            "n_frames long, mode long, slice_qp_i long, slice_qp_p "
            "long, sum_y0 long, wsum_y0 long, sum_ylast long, "
            "wsum_ylast long, sum_cb0 long, sum_cr0 long, "
            "exact_y long, exact_cb long, exact_cr long"
        ),
    )


# -- HEVC B-slice video decode vs libde265 (m59, r15) ------------------------

_M59_SALT_H = "#m59h"
_M59_SALT_P = "#m59p"
_M60_SALT_H = "#m60h"
_M60_SALT_P = "#m60p"


def hevc_bslice_decode_stats(
    docs: DataFrame, fraction: float = 1.0, tmvp: bool = False
) -> DataFrame:
    """HEVC BIPREDICTION (the m58 inter layer completed to B
    slices): per document a fixed-IBBP GOP video (one IDR + P
    anchors + paired TRAIL_N B slices, one active reference per
    list, no b-pyramid / weighted-bipred / TMVP) is encoded by the
    REAL x265 encoder and decoded from spec —
    HevcInterSliceDecoder's B arm: inter_pred_idc with the
    depth-keyed context, combined bi-predictive merge candidates,
    per-list AMVP with the POC-distance scaling arm,
    mvd_l1_zero_flag handling, and 14-bit-intermediate biprediction
    averaging — then adjudicated BIT-EXACT per frame (display
    order) against libde265.  Three md5-restatable content modes:
    mode 0 rolls one noise plane into anchors and sets each B pair
    to the rounded anchor average (zero-MV bi-merge territory),
    mode 1 draws INDEPENDENT noise anchors and builds B frames as
    the average of two differently-rolled anchors (explicit
    two-list AMVP with nonzero fractional MVs — measured: x265
    codes PRED_BI with subpel refinement here), mode 2 draws fresh
    noise per frame (intra-in-B + uni L0/L1 + dense residuals).
    The oracle restates geometry, the probed x265 CQP slice-QP law
    (I = qp-3, P = qp, B = qp+2, uniform over the drawn range) and
    first/last-display-frame source checksums.  Corpus-linear: one
    task per doc batch after fan_out, no shuffle, no driver state.

    Scale contract: full-corpus at fixture scale; at production
    scale this is a SAMPLED AUDIT query — pass ``fraction=1/k``
    for the deterministic doc_id-keyed subsample."""
    import numpy as np

    from table_demo_spark.operators import hevc

    salt_h = _M60_SALT_H if tmvp else _M59_SALT_H
    salt_p = _M60_SALT_P if tmvp else _M59_SALT_P
    extra = hevc.X265_BFRAME_PARAMS + (
        (("temporal-mvp", "1"),) if tmvp else ()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hdr = _md5_stream(str(doc_id), 1, salt_h)
                # smaller dim/GOP budget than m58: per-doc cost is
                # frames x bit-serial decodes, and the B battery runs
                # 4-7 frames per doc (7 on a quarter of docs)
                w = 32 + 8 * (hdr[0] % 3)
                h = 32 + 8 * (hdr[1] % 3)
                ctu = 16 if hdr[2] % 2 == 0 else 32
                qp = 12 + hdr[3] % 31
                periods = 1 + (1 if hdr[4] % 4 == 0 else 0)
                n_frames = 1 + 3 * periods
                mode = hdr[5] % 3
                max_merge = 1 + hdr[6] % 5
                v0 = (2 * (hdr[7] % 3) - 2, 2 * (hdr[8] % 4) - 4)
                v1 = (2 * (hdr[9] % 3) - 2, 2 * (hdr[10] % 4) - 4)
                yn, cn = w * h, (w // 2) * (h // 2)
                total = yn + 2 * cn
                n_slices = (
                    1 if mode == 0
                    else periods + 1 if mode == 1
                    else n_frames
                )
                raw = np.frombuffer(
                    _md5_stream(
                        str(doc_id),
                        (n_slices * total + 15) // 16,
                        salt_p,
                    ),
                    np.uint8,
                )

                def planes(sl):
                    b = raw[sl * total:(sl + 1) * total].astype(
                        np.int64
                    )
                    return (
                        b[:yn].reshape(h, w),
                        b[yn:yn + cn].reshape(h // 2, w // 2),
                        b[yn + cn:].reshape(h // 2, w // 2),
                    )

                def roll3(p, dy, dx):
                    y, cb, cr = p
                    return (
                        np.roll(y, (dy, dx), (0, 1)),
                        np.roll(cb, (dy // 2, dx // 2), (0, 1)),
                        np.roll(cr, (dy // 2, dx // 2), (0, 1)),
                    )

                def avg3(p, q):
                    return tuple(
                        (a + b + 1) // 2 for a, b in zip(p, q)
                    )

                if mode == 0:
                    base = planes(0)
                    anchors = [
                        roll3(base, 2 * j, 4 * j)
                        for j in range(periods + 1)
                    ]
                elif mode == 1:
                    anchors = [planes(j) for j in range(periods + 1)]
                else:
                    anchors = None
                disp = []
                if anchors is None:
                    disp = [planes(k) for k in range(n_frames)]
                else:
                    for j in range(periods):
                        bf = avg3(
                            roll3(anchors[j], *v0),
                            roll3(anchors[j + 1], *v1),
                        )
                        disp += [anchors[j], bf, bf]
                    disp.append(anchors[-1])
                frames = [
                    tuple(p.astype(np.uint8) for p in f) for f in disp
                ]
                nals = hevc.encode_hevc_video(
                    frames, qp=qp, ctu=ctu, max_merge=max_merge,
                    extra_params=extra,
                )
                got = hevc.decode_hevc_video_from_spec(nals)
                want = hevc.decode_hevc_libde265_frames(nals)
                if len(got) != n_frames or len(want) != n_frames:
                    raise ValueError(
                        f"m59: frame count mismatch {len(got)} vs "
                        f"{len(want)} vs {n_frames}"
                    )
                types = [st["slice_type"] for *_, st in got]
                expect = ["I"] + ["P", "B", "B"] * periods
                if types != expect:
                    raise ValueError(f"m59: GOP shape {types}")
                qps = {
                    t: {st["slice_qp"] for *_, st in got
                        if st["slice_type"] == t}
                    for t in ("I", "P", "B")
                }
                if any(len(v) != 1 for v in qps.values()):
                    raise ValueError(f"m59: non-uniform QPs {qps}")
                gs = sorted(got, key=lambda f: f[3]["poc"])
                ex = [1, 1, 1]
                for (gy, gcb, gcr, _), (wy, wcb, wcr) in zip(gs, want):
                    for j, (g, r) in enumerate(
                        ((gy, wy), (gcb, wcb), (gcr, wcr))
                    ):
                        if g.shape != r.shape or not (g == r).all():
                            ex[j] = 0
                wy_w = 1 + np.arange(yn, dtype=np.int64) % 7
                yf = disp[0][0].reshape(-1).astype(np.int64)
                yl = disp[-1][0].reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(doc_id), w, h, ctu, qp, n_frames,
                        2 * periods, mode,
                        int(qps["I"].pop()), int(qps["P"].pop()),
                        int(qps["B"].pop()),
                        int(yf.sum()), int((wy_w * yf).sum()),
                        int(yl.sum()), int((wy_w * yl).sum()),
                        int(disp[0][1].sum()), int(disp[0][2].sum()),
                        ex[0], ex[1], ex[2],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "ctu", "qp",
                    "n_frames", "n_b_frames", "mode", "slice_qp_i",
                    "slice_qp_p", "slice_qp_b", "sum_y0", "wsum_y0",
                    "sum_ylast", "wsum_ylast", "sum_cb0", "sum_cr0",
                    "exact_y", "exact_cb", "exact_cr",
                ],
            )

    return _spread_ids(docs, fraction).mapInPandas(
        run,
        schema=(
            "doc_id long, width long, height long, ctu long, qp long, "
            "n_frames long, n_b_frames long, mode long, slice_qp_i "
            "long, slice_qp_p long, slice_qp_b long, sum_y0 long, "
            "wsum_y0 long, sum_ylast long, wsum_ylast long, "
            "sum_cb0 long, sum_cr0 long, exact_y long, exact_cb long, "
            "exact_cr long"
        ),
    )


# -- From-spec AV1 symbol-layer encode vs dav1d+libgav1 (m61, r15) -----------

_M61_SALT_H = "#m61h"


def av1_symbol_layer_stats(
    docs: DataFrame, fraction: float = 1.0
) -> DataFrame:
    """AV1 SYMBOL-CODING layer (the m31/VP8 pattern inverted onto
    AV1): per document OUR from-spec encoder emits a complete AVIF
    still — od_ec multi-symbol entropy coding (exact big-integer
    range coder) over the NORMATIVE default CDFs (mined from libaom
    .rodata with 3-binary cross-validation; the skip CDF extracted
    BEHAVIORALLY from dav1d itself), a reduced-still sequence
    header, a lossless KEY frame with ``disable_cdf_update=1``, and
    a from-scratch ISOBMFF container — and BOTH dav1d and libgav1
    (independent decoder codebases via libavif codecChoice) must
    decode it to the exact uniform 128 picture.  The stream is also
    re-read by the repo's own m50/m54 from-spec parsers (container +
    sequence + quantization walk), pinning writer/reader agreement
    on the same bytes.  Any od_ec interval-arithmetic slip, wrong
    CDF vector, or header-bit error desyncs the third-party decode
    and fails the exactness flags.  Dims draw per doc over the
    partition-symbol-coded range (40..64 step 8).

    Scale contract: corpus-linear stateless per-doc map (tiny
    streams — this is the cheapest codec query in the family);
    ``fraction=1/k`` gives the deterministic sampled-audit subset."""
    import numpy as np

    from table_demo_spark.operators import av1enc, heif
    from table_demo_spark.operators.codecs import (
        av1_avif_quant_structure,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hdr = _md5_stream(str(doc_id), 1, _M61_SALT_H)
                w = 40 + 8 * (hdr[0] % 4)
                h = 40 + 8 * (hdr[1] % 4)
                data = av1enc.build_layer_a_avif(w, h)
                st = av1_avif_quant_structure(data)
                if (st["width"], st["height"]) != (w, h):
                    raise ValueError("m61: writer/parser dim mismatch")
                ex = [1, 1, 1]
                for cc in (
                    heif.AVIF_CODEC_DAV1D, heif.AVIF_CODEC_LIBGAV1,
                ):
                    y, cb, cr = heif.decode_avif_libavif(data, cc)
                    for j, (plane, shp, val) in enumerate((
                        (y, (h, w), 128),
                        (cb, ((h + 1) // 2, (w + 1) // 2), 128),
                        (cr, ((h + 1) // 2, (w + 1) // 2), 128),
                    )):
                        if plane.shape != shp or not (plane == val).all():
                            ex[j] = 0
                rows.append(
                    (
                        int(doc_id), w, h,
                        int(st["seq_profile"]), int(st["still_picture"]),
                        int(st["n_obus"]), int(st["base_q_idx"]),
                        int(st["coded_lossless"]),
                        128 * w * h,
                        128 * ((h + 1) // 2) * ((w + 1) // 2),
                        ex[0], ex[1], ex[2],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "seq_profile",
                    "still_picture", "n_obus", "base_q_idx",
                    "coded_lossless", "sum_y", "sum_c",
                    "exact_y", "exact_cb", "exact_cr",
                ],
            )

    return _spread_ids(docs, fraction).mapInPandas(
        run,
        schema=(
            "doc_id long, width long, height long, seq_profile long, "
            "still_picture long, n_obus long, base_q_idx long, "
            "coded_lossless long, sum_y long, sum_c long, "
            "exact_y long, exact_cb long, exact_cr long"
        ),
    )


# -- AVIF image sequences: non-reduced AV1 headers (m52, r14) ----------------

_M52_SALT_H = "#m52h"
_M52_SALT_P = "#m52p"
_M52_MAX_BYTES = 4 * (64 * 64 + 2 * 32 * 32)  # largest n_frames * B


def avif_sequence_stats(docs: DataFrame) -> DataFrame:
    """Per document: draw ARBITRARY dims (24..64, odd included — AV1
    codes any size, the structural contrast with HEVC's CTU padding)
    and a frame count (2..4) from the md5 header block; fill every
    frame with full-range noise from the '#m52p' stream (frames
    contiguous, frame f at byte offset f*B); encode as a REAL
    multi-frame AVIF image sequence through the AOMedia reference
    encoder (libavif avifEncoder — avis brand, default-lossless, YUV
    planes passed directly so no colour pipeline sits in the path);
    walk the container FROM SPEC (codecs.av1_avis_structure: the
    NON-reduced 5.5.1 sequence header every branch live, OBU
    accounting, and the three-way frame-count triangulation
    OBU_FRAME == temporal delimiters == stsz); then decode every
    frame TWICE — dav1d and libgav1, two independent AV1 decoder
    codebases selected via libavif codecChoice — and compare each
    frame bit-for-bit against its source planes (inter frames
    included: AV1 lossless mode must reproduce them exactly)."""
    import numpy as np

    from table_demo_spark.operators import heif
    from table_demo_spark.operators.codecs import av1_avis_structure

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hdr = _md5_stream(str(doc_id), 1, _M52_SALT_H)
                w = 24 + hdr[0] % 41
                h = 24 + hdr[1] % 41
                n = 2 + hdr[2] % 3
                cw, ch = (w + 1) // 2, (h + 1) // 2
                B = w * h + 2 * cw * ch
                raw = np.frombuffer(
                    _md5_stream(
                        str(doc_id), (n * B + 15) // 16, _M52_SALT_P
                    ),
                    np.uint8,
                )[: n * B].astype(np.int64)
                frames = []
                for f in range(n):
                    fb = raw[f * B:(f + 1) * B]
                    frames.append(
                        (
                            fb[: w * h].astype(np.uint8).reshape(h, w),
                            fb[w * h:w * h + cw * ch]
                            .astype(np.uint8).reshape(ch, cw),
                            fb[w * h + cw * ch:]
                            .astype(np.uint8).reshape(ch, cw),
                        )
                    )
                data = heif.encode_avif_sequence(frames)
                st = av1_avis_structure(data)
                dec = {}
                for name, cc in (
                    ("dav1d", heif.AVIF_CODEC_DAV1D),
                    ("gav1", heif.AVIF_CODEC_LIBGAV1),
                ):
                    got = heif.decode_avif_sequence(data, cc)
                    exact = int(
                        len(got) == n
                        and all(
                            g.shape == s.shape and bool((g == s).all())
                            for fg, fs in zip(got, frames)
                            for g, s in zip(fg, fs)
                        )
                    )
                    dec[name] = (len(got), exact)
                w0 = 1 + np.arange(B, dtype=np.int64) % 7
                rows.append(
                    (
                        int(doc_id), w, h, n, int(st["n_obus"]),
                        int(st["reduced_header"]),
                        int(st["seq_level_idx"]),
                        int(st["order_hint_bits"]),
                        int(st["bit_depth"]), int(st["color_range"]),
                        dec["dav1d"][0], dec["gav1"][0],
                        dec["dav1d"][1], dec["gav1"][1],
                        int(raw[:B].sum()), int((w0 * raw[:B]).sum()),
                        int(raw[(n - 1) * B:].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames", "n_obus",
                    "reduced_header", "seq_level_idx", "order_hint_bits",
                    "bit_depth", "color_range", "frames_dav1d",
                    "frames_gav1", "dav1d_exact", "gav1_exact",
                    "src_sum_f0", "src_wsum_f0", "src_sum_flast",
                ],
            )

    return _spread_ids(docs).mapInPandas(
        run,
        schema=(
            "doc_id long, width long, height long, n_frames long, "
            "n_obus long, reduced_header long, seq_level_idx long, "
            "order_hint_bits long, bit_depth long, color_range long, "
            "frames_dav1d long, frames_gav1 long, dav1d_exact long, "
            "gav1_exact long, src_sum_f0 long, src_wsum_f0 long, "
            "src_sum_flast long"
        ),
    )


# -- fixed-quantizer AVIF stills: frame-header quant layer (m54, r14) --------

_M54_SALT_H = "#m54h"
_M54_SALT_P = "#m54p"
_M54_MAX_BYTES = 64 * 64 + 2 * 32 * 32


def avif_quant_stats(docs: DataFrame) -> DataFrame:
    """Per document: draw dims (24..64, odd included) and a libaom
    QUANTIZER (0..63) from the md5 header block; encode full-range
    noise planes as a still AVIF at FIXED quantizer (min == max == q
    via the empirically-validated avifEncoder offsets); walk the
    container from spec one OBU level deeper than m50 — the 5.9.2
    uncompressed frame header's quantization layer — and pin
    base_q_idx against the measured 64-entry libaom
    quantizer->qindex map (heif.AVIF_QINDEX, re-probed exhaustively
    in tests); then decode the LOSSY stream with BOTH dav1d and
    libgav1 and require bit-identical planes (two independent
    implementations of AV1's normative reconstruction agreeing on a
    lossy stream), plus exact source equality when q == 0."""
    import numpy as np

    from table_demo_spark.operators import heif
    from table_demo_spark.operators.codecs import av1_avif_quant_structure

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hdr = _md5_stream(str(doc_id), 1, _M54_SALT_H)
                w = 24 + hdr[0] % 41
                h = 24 + hdr[1] % 41
                q = hdr[2] % 64
                cw, ch = (w + 1) // 2, (h + 1) // 2
                B = w * h + 2 * cw * ch
                raw = np.frombuffer(
                    _md5_stream(str(doc_id), (B + 15) // 16, _M54_SALT_P),
                    np.uint8,
                )[:B].astype(np.int64)
                y = raw[: w * h].astype(np.uint8).reshape(h, w)
                cb = (
                    raw[w * h:w * h + cw * ch]
                    .astype(np.uint8).reshape(ch, cw)
                )
                cr = raw[w * h + cw * ch:].astype(np.uint8).reshape(ch, cw)
                data = heif.encode_avif_still_q(y, cb, cr, q)
                st = av1_avif_quant_structure(data)
                d1 = heif.decode_avif_sequence(
                    data, heif.AVIF_CODEC_DAV1D
                )[0]
                d2 = heif.decode_avif_sequence(
                    data, heif.AVIF_CODEC_LIBGAV1
                )[0]
                cross = int(
                    all(
                        a.shape == b.shape and bool((a == b).all())
                        for a, b in zip(d1, d2)
                    )
                )
                lossless = int(
                    q == 0
                    and all(
                        bool((a == s).all())
                        for a, s in zip(d1, (y, cb, cr))
                    )
                )
                wgt = 1 + np.arange(B, dtype=np.int64) % 7
                rows.append(
                    (
                        int(doc_id), w, h, q,
                        int(st["base_q_idx"]),
                        int(st["coded_lossless"]),
                        int(st["delta_q_y_dc"]),
                        int(st["delta_q_present"]),
                        cross, lossless,
                        int(raw.sum()), int((wgt * raw).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "q", "base_q_idx",
                    "coded_lossless", "delta_q_y_dc", "delta_q_present",
                    "cross_exact", "lossless_roundtrip",
                    "src_sum", "src_wsum",
                ],
            )

    return _spread_ids(docs).mapInPandas(
        run,
        schema=(
            "doc_id long, width long, height long, q long, "
            "base_q_idx long, coded_lossless long, delta_q_y_dc long, "
            "delta_q_present long, cross_exact long, "
            "lossless_roundtrip long, src_sum long, src_wsum long"
        ),
    )


# -- sub-64 HEIC derived-item (grid) resolution (m56, r14) -------------------

_M56_SALT_H = "#m56h"
_M56_SALT_P = "#m56p"
_M56_MAX_BYTES = 62 * 62 + 2 * 31 * 31


def heic_grid_crop_stats(
    docs: DataFrame, fraction: float = 1.0
) -> DataFrame:
    """Per document: draw SUB-64 dims (24..62 even — libheif stores
    these as a PADDED 64x64 hvc1 item plus a 'grid' derived item
    carrying the true size, the m49 declared extension) and a QP in
    12..20; fill margin-box planes (Y [90,160], C [114,142] — lossy
    output then stays inside the r13 in-gamut box, making libheif's
    grid-derivation colour pipeline value-exact, probed); encode via
    libheif/x265 under the constrained pin; resolve the derived-item
    chain FROM SPEC (codecs.heic_resolve_grid: pitm -> ipma property
    association -> iref dimg -> iloc/idat grid descriptor, whose
    output size must equal the derived ispe); decode the padded coded
    item with the from-spec decoder and compare bit-exact against
    direct libde265; crop per the 1x1-grid rule (ISO 23008-12
    6.6.2.3, top-left) and compare bit-exact against libheif's OWN
    grid-derived decode — three independent statements of the crop
    semantics on every row.

    Scale contract: full-corpus at fixture scale; at production
    scale this is a SAMPLED AUDIT query — pass ``fraction=1/k``
    for the deterministic doc_id-keyed subsample (the dataflow
    itself is corpus-linear; only the per-doc codec constant
    makes full-corpus runs expensive)."""
    import numpy as np

    from table_demo_spark.operators import heif, hevc
    from table_demo_spark.operators.codecs import heic_resolve_grid

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hdr = _md5_stream(str(doc_id), 1, _M56_SALT_H)
                w = 2 * (12 + hdr[0] % 20)
                h = 2 * (12 + hdr[1] % 20)
                qp = 12 + hdr[2] % 9
                cw, ch = w // 2, h // 2
                yn, cn = w * h, cw * ch
                total = yn + 2 * cn
                raw = np.frombuffer(
                    _md5_stream(
                        str(doc_id), (total + 15) // 16, _M56_SALT_P
                    ),
                    np.uint8,
                )[:total].astype(np.int64)
                y = (90 + raw[:yn] % 71).astype(np.uint8).reshape(h, w)
                cb = (
                    (114 + raw[yn:yn + cn] % 29)
                    .astype(np.uint8).reshape(ch, cw)
                )
                cr = (
                    (114 + raw[yn + cn:] % 29)
                    .astype(np.uint8).reshape(ch, cw)
                )
                params = hevc.X265_CONSTRAINED + (
                    ("x265:ctu", "16"), ("x265:qp", str(qp)),
                )
                data = heif.encode_heif(
                    y, cb, cr, heif.COMPRESSION_HEVC, params,
                    lossless=False,
                )
                st = heic_resolve_grid(data)
                gy, gcb, gcr, dst = hevc.decode_heic_from_spec(data)
                ry, rcb, rcr = hevc.decode_hevc_libde265(
                    hevc.heic_nal_units(data)
                )
                pad_exact = int(
                    all(
                        a.shape == b.shape and bool((a == b).all())
                        for a, b in zip((gy, gcb, gcr), (ry, rcb, rcr))
                    )
                )
                crop = (
                    gy[:h, :w], gcb[:ch, :cw], gcr[:ch, :cw]
                )
                lh = heif.decode_heif(data)
                crop_exact = int(
                    all(
                        a.shape == b.shape and bool((a == b).all())
                        for a, b in zip(crop, lh)
                    )
                )
                rows.append(
                    (
                        int(doc_id), w, h, qp, int(dst["slice_qp"]),
                        int(st["n_items"]),
                        int(st["grid_rows"]), int(st["grid_cols"]),
                        int(st["coded_w"]), int(st["coded_h"]),
                        pad_exact, crop_exact,
                        int(y.astype(np.int64).sum()),
                        int(
                            cb.astype(np.int64).sum()
                            + cr.astype(np.int64).sum()
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "qp", "slice_qp",
                    "n_items", "grid_rows", "grid_cols",
                    "coded_w", "coded_h", "pad_exact", "crop_exact",
                    "src_sum_y", "src_sum_c",
                ],
            )

    return _spread_ids(docs, fraction).mapInPandas(
        run,
        schema=(
            "doc_id long, width long, height long, qp long, "
            "slice_qp long, n_items long, grid_rows long, "
            "grid_cols long, coded_w long, coded_h long, "
            "pad_exact long, crop_exact long, src_sum_y long, "
            "src_sum_c long"
        ),
    )


# -- HEVC SAO + deblock full in-loop chain (m57, r14) ------------------------

_M57_SALT_H = "#m57h"


def hevc_sao_decode_stats(
    docs: DataFrame, fraction: float = 1.0
) -> DataFrame:
    """Per document: a sinusoid-plus-planted-hard-edges fixture (the
    content shape that makes x265's RD actually pick nonzero SAO
    params — probed: ~3/4 of docs carry band or edge offsets at the
    drawn QPs) encoded at preset MEDIUM with BOTH in-loop filters
    signalled (SAO + deblocking; signhide/aq/strong-smoothing/wpp
    still pinned off — medium's sign-data-hiding was the r14 decoy
    desync), decoded by the from-spec chain (reconstruction -> 8.7.2
    deblock -> 8.7.3 SAO: per-CTB merge/type/offset CABAC syntax,
    band and edge application over the deblocked picture) and
    adjudicated bit-exact per pixel against direct libde265.  The
    fixture geometry (sinusoid frequencies, planted edge rows, QP)
    is md5-drawn and restated by the oracle; the sinusoid itself
    never needs SQL restatement — the adjudication is
    decoder-vs-decoder over the same real stream.

    Scale contract: full-corpus at fixture scale; at production
    scale this is a SAMPLED AUDIT query — pass ``fraction=1/k``
    for the deterministic doc_id-keyed subsample (the dataflow
    itself is corpus-linear; only the per-doc codec constant
    makes full-corpus runs expensive)."""
    import numpy as np

    from table_demo_spark.operators import heif, hevc

    params_base = (
        ("preset", "medium"),
        ("x265:pools", "none"), ("x265:frame-threads", "1"),
        ("x265:wpp", "0"), ("x265:sao", "1"),
        ("x265:min-cu-size", "8"), ("x265:tu-intra-depth", "2"),
        ("x265:signhide", "0"), ("x265:aq-mode", "0"),
        ("x265:strong-intra-smoothing", "0"), ("x265:ctu", "16"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hdr = _md5_stream(str(doc_id), 1, _M57_SALT_H)
                qp = 18 + hdr[2] % 10
                fx, fy = 3 + hdr[3] % 5, 3 + hdr[4] % 5
                r0, c0 = hdr[5] % 48, hdr[6] % 48
                gy, gx = np.mgrid[0:64, 0:64].astype(float)
                y = (
                    128 + 80 * np.sin(gx / fx) * np.cos(gy / fy)
                ).clip(0, 255).astype(np.uint8)
                y[r0:r0 + 4, :] = 250
                y[:, c0:c0 + 4] = 5
                cb = (
                    128 + 40 * np.sin(gx[:32, :32] / fy)
                ).clip(0, 255).astype(np.uint8)
                cr = (
                    128 + 40 * np.cos(gy[:32, :32] / fx)
                ).clip(0, 255).astype(np.uint8)
                data = heif.encode_heif(
                    y, cb, cr, heif.COMPRESSION_HEVC,
                    params_base + (("x265:qp", str(qp)),),
                    lossless=False,
                )
                gy_, gcb, gcr, st = hevc.decode_heic_from_spec(
                    data, allow_deblock=True, allow_sao=True
                )
                ry, rcb, rcr = hevc.decode_hevc_libde265(
                    hevc.heic_nal_units(data)
                )
                rows.append(
                    (
                        int(doc_id), 64, 64, int(qp),
                        int(st["slice_qp"]),
                        int(fx), int(fy), int(r0), int(c0),
                        int(st["deblocked"]), int(st["sao"]),
                        int(gy_.shape == ry.shape
                            and bool((gy_ == ry).all())),
                        int(gcb.shape == rcb.shape
                            and bool((gcb == rcb).all())),
                        int(gcr.shape == rcr.shape
                            and bool((gcr == rcr).all())),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "qp", "slice_qp",
                    "fx", "fy", "edge_row", "edge_col",
                    "deblocked", "sao",
                    "exact_y", "exact_cb", "exact_cr",
                ],
            )

    return _spread_ids(docs, fraction).mapInPandas(
        run,
        schema=(
            "doc_id long, width long, height long, qp long, "
            "slice_qp long, fx long, fy long, edge_row long, "
            "edge_col long, deblocked long, sao long, exact_y long, "
            "exact_cb long, exact_cr long"
        ),
    )


# -- H.264 inter prediction fixture (m46, r13) -------------------------------

_MC_SALT = "#mc"


def with_h264_mc_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a TWO-FRAME Annex B stream — frame 0 an IDR
    Intra_16x16 CAVLC picture (the m39 plant at salt '#mc'), frame 1
    a P slice of P_L0_16x16 macroblocks whose quarter-pel motion
    vectors are planted from the md5 stream right after the residual
    bytes (mvx/mvy = byte % 25 - 12, so every Fig 8-4 fractional
    position class and the picture-edge clamp paths sit on the value
    hash) and zero residual: frame 1 is EXACTLY the 8.4.2.2
    interpolation of frame 0."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_h264_pps,
        decode_h264_sps,
        encode_annexb,
        encode_h264_i16x16_slice,
        encode_h264_p16x16_slice,
        encode_h264_pps,
        encode_h264_sps,
    )

    mw = H264_CAVLC_MB_W
    sps_rbsp = encode_h264_sps(66, 30, mw, 1)
    pps_rbsp = encode_h264_pps(0, 0, 16)
    sps = decode_h264_sps(sps_rbsp)
    pps = decode_h264_pps(pps_rbsp)
    n_bytes = mw * _CAVLC_MB_BYTES + 2 * mw
    n_blocks = (n_bytes + 15) // 16

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(str(doc_id), n_blocks, _MC_SALT)
                mbs = []
                for m in range(mw):
                    base = m * _CAVLC_MB_BYTES
                    dc = np.array(
                        [raw[base + k] % 5 - 2 for k in range(16)],
                        np.int64,
                    ).reshape(4, 4)
                    ac = np.zeros((4, 4, 4, 4), np.int64)
                    for y4 in range(4):
                        for x4 in range(4):
                            o = base + 16 + (4 * y4 + x4) * 15
                            flat = np.zeros(16, np.int64)
                            for pos in range(1, 16):
                                b = raw[o + pos - 1]
                                if (m, y4, x4, pos) == _CAVLC_ESC:
                                    flat[pos] = 1000 + 4 * b
                                else:
                                    flat[pos] = _cavlc_level(b)
                            ac[y4][x4] = flat.reshape(4, 4)
                    cbo = base + 16 + 240
                    cb_dc = np.array(
                        [raw[cbo + k] % 7 - 3 for k in range(4)], np.int64
                    ).reshape(2, 2)
                    cr_dc = np.array(
                        [raw[cbo + 4 + k] % 7 - 3 for k in range(4)],
                        np.int64,
                    ).reshape(2, 2)
                    mbs.append(
                        {"dc": dc, "ac": ac, "cb_dc": cb_dc,
                         "cr_dc": cr_dc}
                    )
                mv0 = mw * _CAVLC_MB_BYTES
                mvs = [
                    (raw[mv0 + 2 * m] % 25 - 12,
                     raw[mv0 + 2 * m + 1] % 25 - 12)
                    for m in range(mw)
                ]
                f0 = int(doc_id) % 16
                idr = encode_h264_i16x16_slice(
                    sps, pps, mbs, frame_num=f0,
                    idr_pic_id=int(doc_id) % 32,
                )
                psl = encode_h264_p16x16_slice(
                    sps, pps, mvs, frame_num=(f0 + 1) % 256
                )
                payloads.append(
                    encode_annexb(
                        [(3, 7, sps_rbsp), (3, 8, pps_rbsp),
                         (3, 5, idr), (0, 1, psl)]
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def h264_mc_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode the two-frame stream — IDR through the verified m39
    CAVLC path, then the P slice motion-compensated against those
    decoded planes — and reduce FRAME 1 to position-weighted stats
    plus an MV checksum (mv_wsum pins the decoded vectors directly:
    on flat reference regions different MVs can reach the same
    pixels, so pixels alone would under-constrain the MV walk)."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_annexb,
        decode_h264_i16x16_slice,
        decode_h264_p16x16_slice,
        decode_h264_pps,
        decode_h264_sps,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sps_store, pps_store = {}, {}
                ref = None
                out = None
                for nal in decode_annexb(bytes(payload)):
                    t = nal["nal_type"]
                    if t == 7:
                        info = decode_h264_sps(nal["rbsp"])
                        sps_store[info["sps_id"]] = info
                    elif t == 8:
                        info = decode_h264_pps(nal["rbsp"])
                        pps_store[info["pps_id"]] = info
                    elif t == 5:
                        ref = decode_h264_i16x16_slice(
                            nal["rbsp"], 5, nal["ref_idc"],
                            pps_store, sps_store,
                        )
                    elif t == 1:
                        if ref is None:
                            raise ValueError(
                                "H264 MC: P slice before reference"
                            )
                        _, ry, rcb, rcr, _ = ref
                        out = decode_h264_p16x16_slice(
                            nal["rbsp"], nal["ref_idc"],
                            pps_store, sps_store, ry, rcb, rcr,
                        )
                hdr, y, cb, cr, mvs = out
                h, w = y.shape
                yl = y.astype(np.int64)
                px = np.arange(h * w, dtype=np.int64).reshape(h, w)
                mv_wsum = sum(
                    (m + 1) * (100 * (mvx + 12) + (mvy + 12))
                    for m, (mvx, mvy) in enumerate(mvs)
                )
                rows.append(
                    (
                        int(doc_id), int(w), int(h), int(mv_wsum),
                        int(yl.sum()),
                        int((yl * (1 + px % 7)).sum()),
                        int(yl.min()), int(yl.max()),
                        int(cb.astype(np.int64).sum()),
                        int(cr.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "mv_wsum",
                    "sum_y", "wsum_y", "y_min", "y_max",
                    "sum_cb", "sum_cr",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, width long, height long, mv_wsum long, "
            "sum_y long, wsum_y long, y_min long, y_max long, "
            "sum_cb long, sum_cr long"
        ),
    )


# -- H.264 B-slice bipred fixture (m53, r14) ---------------------------------

_BIPRED_SALT = "#bip"


def with_h264_bipred_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a TWO-FRAME Annex B stream — frame 0 an IDR
    Intra_16x16 CAVLC picture (the m39 plant at salt '#bip'), frame 1
    a non-ref B slice of B_Bi_16x16 macroblocks whose TWO quarter-pel
    motion vectors per MB (list 0 and list 1, planted from the md5
    stream right after the residual bytes: 4 bytes per MB) both
    resolve to frame 0 — the DPB holds a single reference, so the
    8.2.4.2.3/.4 default lists are both [frame 0] and frame 1 is
    EXACTLY the rounded average of two independent 8.4.2.2
    interpolations of frame 0 (8.4.2.3.2, weighted_bipred_idc 0)."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_h264_pps,
        decode_h264_sps,
        encode_annexb,
        encode_h264_b16x16_slice,
        encode_h264_i16x16_slice,
        encode_h264_pps,
        encode_h264_sps,
    )

    mw = H264_CAVLC_MB_W
    sps_rbsp = encode_h264_sps(66, 30, mw, 1)
    pps_rbsp = encode_h264_pps(0, 0, 16)
    sps = decode_h264_sps(sps_rbsp)
    pps = decode_h264_pps(pps_rbsp)
    n_bytes = mw * _CAVLC_MB_BYTES + 4 * mw
    n_blocks = (n_bytes + 15) // 16

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(str(doc_id), n_blocks, _BIPRED_SALT)
                mbs = []
                for m in range(mw):
                    base = m * _CAVLC_MB_BYTES
                    dc = np.array(
                        [raw[base + k] % 5 - 2 for k in range(16)],
                        np.int64,
                    ).reshape(4, 4)
                    ac = np.zeros((4, 4, 4, 4), np.int64)
                    for y4 in range(4):
                        for x4 in range(4):
                            o = base + 16 + (4 * y4 + x4) * 15
                            flat = np.zeros(16, np.int64)
                            for pos in range(1, 16):
                                b = raw[o + pos - 1]
                                if (m, y4, x4, pos) == _CAVLC_ESC:
                                    flat[pos] = 1000 + 4 * b
                                else:
                                    flat[pos] = _cavlc_level(b)
                            ac[y4][x4] = flat.reshape(4, 4)
                    cbo = base + 16 + 240
                    cb_dc = np.array(
                        [raw[cbo + k] % 7 - 3 for k in range(4)], np.int64
                    ).reshape(2, 2)
                    cr_dc = np.array(
                        [raw[cbo + 4 + k] % 7 - 3 for k in range(4)],
                        np.int64,
                    ).reshape(2, 2)
                    mbs.append(
                        {"dc": dc, "ac": ac, "cb_dc": cb_dc,
                         "cr_dc": cr_dc}
                    )
                mv0 = mw * _CAVLC_MB_BYTES
                mvs01 = [
                    (
                        (raw[mv0 + 4 * m] % 25 - 12,
                         raw[mv0 + 4 * m + 1] % 25 - 12),
                        (raw[mv0 + 4 * m + 2] % 25 - 12,
                         raw[mv0 + 4 * m + 3] % 25 - 12),
                    )
                    for m in range(mw)
                ]
                f0 = int(doc_id) % 16
                idr = encode_h264_i16x16_slice(
                    sps, pps, mbs, frame_num=f0,
                    idr_pic_id=int(doc_id) % 32,
                )
                bsl = encode_h264_b16x16_slice(
                    sps, pps, mvs01, frame_num=(f0 + 1) % 256
                )
                payloads.append(
                    encode_annexb(
                        [(3, 7, sps_rbsp), (3, 8, pps_rbsp),
                         (3, 5, idr), (0, 1, bsl)]
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return _spread_ids(docs).mapInPandas(
        build, schema="doc_id long, payload binary"
    )


def h264_bipred_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode the two-frame stream — IDR through the verified m39
    CAVLC path, then the B slice bi-predicted against those decoded
    planes — and reduce FRAME 1 to position-weighted stats plus one
    MV checksum PER LIST (each list's 8.4.1.3 predictor chain is
    independent on the wire, so each needs its own direct pin)."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_annexb,
        decode_h264_b16x16_slice,
        decode_h264_i16x16_slice,
        decode_h264_pps,
        decode_h264_sps,
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sps_store, pps_store = {}, {}
                ref = None
                out = None
                for nal in decode_annexb(bytes(payload)):
                    t = nal["nal_type"]
                    if t == 7:
                        info = decode_h264_sps(nal["rbsp"])
                        sps_store[info["sps_id"]] = info
                    elif t == 8:
                        info = decode_h264_pps(nal["rbsp"])
                        pps_store[info["pps_id"]] = info
                    elif t == 5:
                        ref = decode_h264_i16x16_slice(
                            nal["rbsp"], 5, nal["ref_idc"],
                            pps_store, sps_store,
                        )
                    elif t == 1:
                        if ref is None:
                            raise ValueError(
                                "H264 bipred: B slice before reference"
                            )
                        _, ry, rcb, rcr, _ = ref
                        out = decode_h264_b16x16_slice(
                            nal["rbsp"], nal["ref_idc"],
                            pps_store, sps_store, ry, rcb, rcr,
                        )
                hdr, y, cb, cr, mvs0, mvs1 = out
                h, w = y.shape
                yl = y.astype(np.int64)
                px = np.arange(h * w, dtype=np.int64).reshape(h, w)

                def mv_wsum(mvs):
                    return sum(
                        (m + 1) * (100 * (mvx + 12) + (mvy + 12))
                        for m, (mvx, mvy) in enumerate(mvs)
                    )

                rows.append(
                    (
                        int(doc_id), int(w), int(h),
                        int(mv_wsum(mvs0)), int(mv_wsum(mvs1)),
                        int(yl.sum()),
                        int((yl * (1 + px % 7)).sum()),
                        int(yl.min()), int(yl.max()),
                        int(cb.astype(np.int64).sum()),
                        int(cr.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "mv_wsum0", "mv_wsum1",
                    "sum_y", "wsum_y", "y_min", "y_max",
                    "sum_cb", "sum_cr",
                ],
            )

    return docs_with_payload.mapInPandas(
        extract,
        schema=(
            "doc_id long, width long, height long, mv_wsum0 long, "
            "mv_wsum1 long, sum_y long, wsum_y long, y_min long, "
            "y_max long, sum_cb long, sum_cr long"
        ),
    )


# -- HEVC structure-walk fixture (m49, r13) ----------------------------------


def hevc_structure_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, width, height, pic_w, pic_h, profile_idc, level_idc,
    chroma_format_idc, bit_depth, n_param_sets): per document, a REAL
    x265-encoded HEIC container is built at md5-drawn dimensions
    (w, h = 64 + 8*(byte % 9) each — multiples of 8 in [64, 128], so
    libheif emits a single image item and the x265 16-sample padding
    varies per doc), then walked from scratch — ISOBMFF boxes,
    hvcC, the H.265 SPS bit walk — with the parsed true dimensions
    cross-checked against libheif's own decode IN the operator (a
    from-spec parser adjudicated against the third-party stack on
    every row).  The oracle restates the dimension draw and the
    padding arithmetic; profile 3 / level 255 / chroma 1 / depth 8
    are what x265 factually signals for still pictures."""
    import numpy as np

    from table_demo_spark.operators import heif
    from table_demo_spark.operators.codecs import hevc_heic_structure

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        params = (
            ("preset", "ultrafast"),
            ("x265:pools", "none"),
            ("x265:frame-threads", "1"),
        )
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(str(doc_id), 1, "#hevc")
                w = 64 + 8 * (raw[0] % 9)
                h = 64 + 8 * (raw[1] % 9)
                gy, gx = np.indices((h, w))
                y = (70 + (gy + gx + int(doc_id)) % 111).astype(np.uint8)
                cy, cx = np.indices((h // 2, w // 2))
                cb = (108 + (cy + int(doc_id)) % 41).astype(np.uint8)
                cr = (108 + (cx + int(doc_id)) % 41).astype(np.uint8)
                data = heif.encode_heif(
                    y, cb, cr, heif.COMPRESSION_HEVC, params
                )
                st = hevc_heic_structure(data)
                if (st["width"], st["height"]) != (w, h):
                    raise ValueError(
                        f"HEIC ispe {st['width']}x{st['height']}"
                        f" != planted {w}x{h}"
                    )
                dy, _, _ = heif.decode_heif(data)
                if dy.shape != (h, w):
                    raise ValueError(
                        f"libheif decode {dy.shape} != planted {h, w}"
                    )
                rows.append(
                    (int(doc_id), st["width"], st["height"],
                     st["pic_w"], st["pic_h"], st["profile_idc"],
                     st["level_idc"], st["chroma_format_idc"],
                     st["bit_depth"], st["n_param_sets"])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "pic_w", "pic_h",
                    "profile_idc", "level_idc", "chroma_format_idc",
                    "bit_depth", "n_param_sets",
                ],
            )

    return _spread_ids(docs).mapInPandas(
        build,
        schema=(
            "doc_id long, width long, height long, pic_w long, "
            "pic_h long, profile_idc long, level_idc long, "
            "chroma_format_idc long, bit_depth long, n_param_sets long"
        ),
    )


def av1_structure_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, width, height, seq_profile, seq_level_idx,
    still_picture, n_obus, chroma_sub_x, chroma_sub_y): m50's AV1
    structure walk — per document a REAL libaom-encoded AVIF at
    md5-drawn EXACT dimensions (w, h = 2*(22 + byte % 43), even in
    [44, 128] — no alignment constraint: AV1 codes arbitrary sizes,
    which is precisely what the walk verifies against the container's
    ispe), parsed from scratch (ISOBMFF -> av1C -> OBU framing ->
    reduced-still-picture sequence header) with libheif's decode
    cross-checked in the operator."""
    import numpy as np

    from table_demo_spark.operators import heif
    from table_demo_spark.operators.codecs import av1_avif_structure

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        params = (("speed", "9"), ("threads", "1"))
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                raw = _md5_stream(str(doc_id), 1, "#av1s")
                w = 2 * (22 + raw[0] % 43)
                h = 2 * (22 + raw[1] % 43)
                gy, gx = np.indices((h, w))
                y = (70 + (gy + 2 * gx + int(doc_id)) % 111).astype(
                    np.uint8
                )
                cy, cx = np.indices(((h + 1) // 2, (w + 1) // 2))
                cb = (108 + (cy + int(doc_id)) % 41).astype(np.uint8)
                cr = (108 + (cx + int(doc_id)) % 41).astype(np.uint8)
                data = heif.encode_heif(
                    y, cb, cr, heif.COMPRESSION_AV1, params
                )
                st = av1_avif_structure(data)
                if (st["width"], st["height"]) != (w, h):
                    raise ValueError(
                        f"AVIF seq header {st['width']}x{st['height']}"
                        f" != planted {w}x{h}"
                    )
                dy, _, _ = heif.decode_heif(data)
                if dy.shape != (h, w):
                    raise ValueError(
                        f"libheif decode {dy.shape} != planted {h, w}"
                    )
                rows.append(
                    (int(doc_id), st["width"], st["height"],
                     st["seq_profile"], st["seq_level_idx"],
                     st["still_picture"], st["n_obus"],
                     st["chroma_sub_x"], st["chroma_sub_y"])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "seq_profile",
                    "seq_level_idx", "still_picture", "n_obus",
                    "chroma_sub_x", "chroma_sub_y",
                ],
            )

    return _spread_ids(docs).mapInPandas(
        build,
        schema=(
            "doc_id long, width long, height long, seq_profile long, "
            "seq_level_idx long, still_picture long, n_obus long, "
            "chroma_sub_x long, chroma_sub_y long"
        ),
    )
