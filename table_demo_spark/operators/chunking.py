"""Token-window operators: exact substring dedup + overlapping chunking.

Two training-data primitives built on the same shape — a per-document
array of whitespace tokens, windowed by position with native
higher-order functions (``sequence`` + ``transform`` + ``posexplode``),
never a Python loop:

* **Substring-level exact dedup** (the MapReduce formulation of
  "Deduplicating Training Data Makes Language Models Better", Lee et
  al. 2022): hash every K-token window, find windows that occur in more
  than one document, and score each document by the fraction of its
  windows that are duplicated elsewhere. Unlike whole-document
  fingerprints (llm_d1) or MinHash (llm_d2), this catches *partial*
  copies — boilerplate headers, quoted paragraphs, templated spans.

* **Overlapping chunking** (size/stride token windows): the standard
  RAG / context-window packing step. Emits one row per chunk with a
  deterministic content signature.

Scale shape: both explode to O(total_tokens) rows — the same order as
the tokenized corpus itself, so it scales exactly like tokenization.
The dedup flag is a min/max window over the 128-bit span hash (uniform
keys — md5 output cannot skew regardless of text skew): one shuffle on
the hash, one per-doc rollup shuffle, no flags join, no O(n^2) stage,
no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table_demo_spark.functions import text as T

SUBSTR_K = 8  # window length (tokens) for substring-level dedup
CHUNK_SIZE = 32  # chunk length (tokens)
CHUNK_STRIDE = 24  # chunk step — 8-token overlap between neighbours


def _window_hashes(docs: DataFrame, text_col: str, k: int) -> DataFrame:
    """(doc_id, wh) — md5 of every k-token window. Documents shorter
    than k tokens contribute no windows (empty array, not a clamped
    descending ``sequence``)."""
    toks = T.tokens(text_col)
    wins = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - k + 1),
            lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(wins).alias("wh"))


def substring_dup_stats(
    docs: DataFrame, text_col: str = "text", k: int = SUBSTR_K
) -> DataFrame:
    """Per-document duplicated-span statistics.

    Returns (doc_id, n_windows, n_dup_windows, dup_frac) where a window
    is *duplicated* iff the identical k-token span appears in at least
    one other document. Documents with < k tokens report zero windows
    and dup_frac 0.0 (left-join zero-fill keeps every input doc).

    The dup flag is ``min(doc_id) != max(doc_id)`` over a window
    partitioned by the span hash — exactly "appears in >= 2 distinct
    docs", in ONE shuffle on the hash with no flags join. (The naive
    groupBy-flags-then-join evaluates the explode twice and, at
    fixture scale, broadcasts a flags frame as large as the window set
    — measured 2x slower at sf0.1 and OOM-shaped at 100 TB; the window
    form's per-key sort is bounded by span-hash group size, i.e. the
    duplication factor, never the corpus.)"""
    from pyspark.sql.window import Window

    wins = _window_hashes(docs, text_col, k)
    span = Window.partitionBy("wh")
    flagged = wins.select(
        "doc_id",
        (F.min("doc_id").over(span) != F.max("doc_id").over(span)).alias(
            "dup"
        ),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum(F.col("dup").cast("long")).alias("n_dup_windows"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0).cast("long")).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0).cast("long")).alias(
                "n_dup_windows"
            ),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.col("n_dup_windows") / F.col("n_windows"))
            .alias("dup_frac"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Chunk c starts at token 1 + c*stride; every start position <=
    n_tokens emits a chunk (the final chunk may be shorter than
    ``size``). Returns (doc_id, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_sig) — the signature is md5 of the space-joined chunk, the
    key a downstream chunk-level dedup or embedding step would use."""
    toks = T.tokens(text_col)
    chunks = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)),
        lambda s: F.struct(
            s.alias("start"),
            F.slice(toks, s, size).alias("chunk"),
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("c.start").cast("long").alias("chunk_start"),
            F.size("c.chunk").cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join("c.chunk", " ")).alias("chunk_sig"),
        )
    )
