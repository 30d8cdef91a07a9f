"""Dictionary-compressed corpus storage — the shard codec a 100 TB
text corpus actually ships with (zstd + a per-source trained
dictionary amortizes the shared boilerplate small documents cannot
amortize alone).

Spark-first split (the t27 sample-train / full-apply discipline):
dictionary TRAINING happens once per source over a bounded,
deterministic hash-sample collected to the driver (<= DICT_SAMPLE_CAP
docs x |sources| rows — bounded by construction), and the trained
dictionaries broadcast into one Arrow-batched APPLY pass that
compresses AND re-decompresses every document. The recovered text's
md5 rides the value hash, so a dictionary mismatch, a truncated
frame, or a codec fault anywhere breaks the oracle comparison; the
measured ratios land in docs/SCALE.md, not the hash (compressed size
is a zstd-version artifact, never an oracle quantity).

zstd is reached via ctypes against the SYSTEM libzstd (a third-party
codec, like the libwebp adjudication in tests/test_vp8.py) — pure
plumbing on our side, real compression on the library's."""

from __future__ import annotations

import ctypes
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DICT_SAMPLE_MOD = 4  # doc_id % 4 == 0 -> training sample
DICT_SAMPLE_CAP = 64  # max training docs per source (driver bound)
DICT_CAPACITY = 4096  # dictionary size budget (bytes)
ZSTD_LEVEL = 3


class _Zstd:
    """Thin ctypes veneer over libzstd.so.1 (train / compress with
    dict / decompress with dict). Raises ImportError if the library
    is absent so callers fail loudly, not silently."""

    def __init__(self) -> None:
        try:
            z = ctypes.CDLL("libzstd.so.1")
        except OSError as exc:  # pragma: no cover - lib ships in-container
            raise ImportError("libzstd.so.1 not available") from exc
        z.ZDICT_trainFromBuffer.restype = ctypes.c_size_t
        z.ZDICT_trainFromBuffer.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_uint,
        ]
        z.ZDICT_isError.restype = ctypes.c_uint
        z.ZSTD_compressBound.restype = ctypes.c_size_t
        z.ZSTD_isError.restype = ctypes.c_uint
        z.ZSTD_createCCtx.restype = ctypes.c_void_p
        z.ZSTD_createDCtx.restype = ctypes.c_void_p
        z.ZSTD_compress_usingDict.restype = ctypes.c_size_t
        z.ZSTD_compress_usingDict.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int,
        ]
        z.ZSTD_decompress_usingDict.restype = ctypes.c_size_t
        z.ZSTD_decompress_usingDict.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        self.z = z
        self.cctx = z.ZSTD_createCCtx()
        self.dctx = z.ZSTD_createDCtx()

    def train(self, samples: list[bytes], capacity: int = DICT_CAPACITY) -> bytes:
        blob = b"".join(samples)
        sizes = (ctypes.c_size_t * len(samples))(*[len(s) for s in samples])
        out = ctypes.create_string_buffer(capacity)
        n = self.z.ZDICT_trainFromBuffer(
            out, capacity, blob, sizes, len(samples)
        )
        if self.z.ZDICT_isError(n):
            # tiny/degenerate sample sets legitimately fail training;
            # the caller falls back to dict-less compression
            return b""
        return out.raw[:n]

    def compress(self, data: bytes, d: bytes) -> bytes:
        bound = self.z.ZSTD_compressBound(len(data))
        out = ctypes.create_string_buffer(bound)
        n = self.z.ZSTD_compress_usingDict(
            self.cctx, out, bound, data, len(data), d, len(d), ZSTD_LEVEL
        )
        if self.z.ZSTD_isError(n):
            raise ValueError("zstd compression failed")
        return out.raw[:n]

    def decompress(self, frame: bytes, orig_len: int, d: bytes) -> bytes:
        out = ctypes.create_string_buffer(orig_len or 1)
        n = self.z.ZSTD_decompress_usingDict(
            self.dctx, out, orig_len or 1, frame, len(frame), d, len(d)
        )
        if self.z.ZSTD_isError(n):
            raise ValueError("zstd decompression failed")
        return out.raw[:n]


def train_source_dicts(docs: DataFrame) -> dict[str, bytes]:
    """Per-source zstd dictionaries from the bounded deterministic
    sample (doc_id % DICT_SAMPLE_MOD == 0, smallest DICT_SAMPLE_CAP
    ids per source — a window prune, not a full collect)."""
    from pyspark.sql import Window

    win = Window.partitionBy("source").orderBy("doc_id")
    sample = (
        docs.filter(F.col("doc_id") % DICT_SAMPLE_MOD == 0)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= DICT_SAMPLE_CAP)
        .select("source", "text")
        .collect()
    )
    by_src: dict[str, list[bytes]] = {}
    for r in sample:
        by_src.setdefault(r["source"], []).append(r["text"].encode())
    zs = _Zstd()
    return {s: zs.train(texts) for s, texts in by_src.items()}


def compress_frames(docs: DataFrame, dicts: dict[str, bytes]) -> DataFrame:
    """The WRITE half (stream_q37's per-batch map): compress each
    document with its source's broadcast dictionary and emit the
    binary frame — what a shard writer appends to the store."""

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zs = _Zstd()
        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                raw = text.encode()
                rows.append(
                    (int(doc_id), source, len(raw),
                     zs.compress(raw, dicts.get(source, b"")))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "source", "orig_bytes", "frame"]
            )

    return docs.select("doc_id", "source", "text").mapInPandas(
        apply,
        schema="doc_id long, source string, orig_bytes long, frame binary",
    )


def decompress_stats(store: DataFrame, dicts: dict[str, bytes]) -> DataFrame:
    """The READ half: decompress every stored frame with its source's
    dictionary and emit the t35 columns (recovered md5-prefix on the
    value hash) — the consumer-side proof that the compressed store
    IS the corpus."""

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        zs = _Zstd()
        for pdf in batches:
            rows = []
            for doc_id, source, orig_bytes, frame in zip(
                pdf["doc_id"], pdf["source"], pdf["orig_bytes"], pdf["frame"]
            ):
                back = zs.decompress(
                    bytes(frame), int(orig_bytes), dicts.get(source, b"")
                )
                rows.append(
                    (int(doc_id), source, int(orig_bytes),
                     int(hashlib.md5(back).hexdigest()[:8], 16))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "source", "orig_bytes", "recovered_sig"],
            )

    return store.select(
        "doc_id", "source", "orig_bytes", "frame"
    ).mapInPandas(
        apply,
        schema="doc_id long, source string, orig_bytes long, recovered_sig long",
    )


def dict_roundtrip(docs: DataFrame, dicts: dict[str, bytes]) -> DataFrame:
    """One Arrow-batched pass: compress every document with its
    source's broadcast dictionary, decompress it back, and emit the
    RECOVERED text's signature (md5-prefix bigint) with byte lengths —
    the restatable columns. Ratios are measured in tests/docs, never
    hashed (compressed size is a zstd-version artifact)."""

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        zs = _Zstd()
        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                raw = text.encode()
                d = dicts.get(source, b"")
                frame = zs.compress(raw, d)
                back = zs.decompress(frame, len(raw), d)
                sig = int(hashlib.md5(back).hexdigest()[:8], 16)
                rows.append((int(doc_id), source, len(raw), sig))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "source", "orig_bytes", "recovered_sig"],
            )

    return docs.select("doc_id", "source", "text").mapInPandas(
        apply,
        schema="doc_id long, source string, orig_bytes long, recovered_sig long",
    )
