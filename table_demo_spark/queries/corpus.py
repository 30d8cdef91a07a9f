"""Corpus-preparation queries: substring dedup, chunking, mixing,
sharding, payload-signature dedup.

Round-2 additions to the LLM-pipeline family (SURVEY §2 north-star
scope): the span-level dedup of Lee et al. 2022, the RAG-style
overlapping chunker, data-dependent domain mixing, the deterministic
pre-training shard shuffle, and multimodal payload-signature dedup.
Oracle SQL is generated from the same Python constants as the Spark
implementations (window length, chunk geometry, LCG constants), so
both sides stay in lock-step by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from table_demo_spark.operators import chunking, mixing
from table_demo_spark.queries import Query
from table_demo_spark.sources.batch import load_table

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"

# ---------------------------------------------------------------------------
# D13 — substring-level exact dedup (duplicated K-token spans).
# ---------------------------------------------------------------------------


def d13_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunking.substring_dup_stats(docs, "text")


_K = chunking.SUBSTR_K
D13_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
w AS (SELECT doc_id, unnest(range(1, len(toks) - {_K} + 2)) AS i, toks
      FROM t WHERE len(toks) >= {_K}),
h AS (SELECT doc_id, md5(array_to_string(toks[i:i+{_K}-1], ' ')) AS wh FROM w),
f AS (SELECT wh, count(DISTINCT doc_id) > 1 AS dup FROM h GROUP BY wh),
per AS (SELECT h.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM h JOIN f USING (wh) GROUP BY h.doc_id)
SELECT d.doc_id,
       coalesce(n_windows, 0) AS n_windows,
       coalesce(n_dup, 0) AS n_dup_windows,
       CASE WHEN coalesce(n_windows, 0) = 0 THEN 0.0
            ELSE coalesce(n_dup, 0) * 1.0 / n_windows END AS dup_frac
FROM documents d LEFT JOIN per USING (doc_id)
"""

# ---------------------------------------------------------------------------
# P5 — overlapping token-window chunking.
# ---------------------------------------------------------------------------


def p5_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunking.chunk_documents(docs, "text")


_CS, _CT = chunking.CHUNK_SIZE, chunking.CHUNK_STRIDE
P5_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks), 1) + 1, {_CT})) AS start
      FROM t)
SELECT doc_id,
       CAST((start - 1) // {_CT} AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS chunk_start,
       CAST(len(toks[start:start+{_CS}-1]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(toks[start:start+{_CS}-1], ' ')) AS chunk_sig
FROM s
"""

# ---------------------------------------------------------------------------
# P6 — domain mixing toward target weights.
#
# Weights are derived from the source id (1 + idx % 4) purely so the
# fixture exercises unequal targets; production passes any weight
# expression or a weights-table join.
# ---------------------------------------------------------------------------
MIX_BUDGET = 0.5


def _weight():
    return (
        F.expr("CAST(substring(source, 4) AS INT)") % 4 + 1
    ).cast("double")


def p6_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mixing.domain_mix(docs, "source", _weight(), MIX_BUDGET)


P6_ORACLE = f"""
WITH sizes AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_domain,
         CAST(1 + (CAST(substring(source, 4) AS INT) % 4) AS DOUBLE) AS w
  FROM documents GROUP BY source),
rates AS (
  SELECT source, n_domain,
         least(1.0, CAST({MIX_BUDGET} AS DOUBLE)
                      * (SELECT sum(n_domain) FROM sizes)
                      * (w / (SELECT sum(w) FROM sizes))
                      / n_domain) AS rate
  FROM sizes),
kept AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
  FROM documents d JOIN rates r USING (source)
  WHERE rate >= 1.0
     OR substring(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 6)
        < printf('%06x', CAST(floor(least(rate, 1.0) * 16777216.0) AS INT))
  GROUP BY d.source)
SELECT r.source, r.n_domain, r.rate,
       coalesce(k.n_kept, 0) AS n_kept
FROM rates r LEFT JOIN kept k USING (source)
"""

# ---------------------------------------------------------------------------
# P7 — deterministic shard assignment + balance report.
# ---------------------------------------------------------------------------
N_SHARDS = 8


def p7_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mixing.shard_balance_report(
        docs, "doc_id", N_SHARDS, bytes_col="n_chars"
    )


P7_ORACLE = f"""
WITH c AS (
  SELECT n_chars,
         (doc_id * {mixing.LCG_A} + {mixing.LCG_C}) % {mixing.LCG_M} AS coord
  FROM documents)
SELECT CAST(coord % {N_SHARDS} AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(coord) AS min_coord,
       max(coord) AS max_coord,
       CAST(sum(n_chars) AS BIGINT) AS n_bytes
FROM c GROUP BY 1
"""

# ---------------------------------------------------------------------------
# M5 — multimodal payload-signature near-dup (pHash plumbing).
#
# The corpus is documents ∪ a simulated re-crawl (every 7th doc
# re-ingested under a new id with an identical binary payload) — the
# situation payload dedup exists for. The signature here is a 60-bit
# md5 prefix of the raw bytes; a real perceptual hash (pHash/aHash over
# the decoded image) drops into the same column and the banding / XOR
# verify below is unchanged — banding on 4 signature substrings keeps
# candidate generation an equi-join (SimHash's S-curve argument,
# operators/dedup.py), and the Hamming verify runs only on band
# collisions.
# ---------------------------------------------------------------------------
HAMMING_MAX = 4
_RECRAWL_OFFSET = 1_000_000
_BANDS = [(1, 4), (5, 4), (9, 4), (13, 3)]  # 15 hex chars = 60 bits


def m5_payload_sig_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + _RECRAWL_OFFSET).alias("doc_id"), "text"
        )
    )
    h = F.md5(F.encode(F.col("text"), "utf-8"))
    sig = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    bands = F.array(
        *[F.substring(h, pos, ln) for pos, ln in _BANDS]
    )
    signed = corpus.select(
        "doc_id", sig.alias("sig"), F.posexplode(bands).alias("band_idx", "band")
    )
    a, b = signed.alias("a"), signed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        .cast("int")
        .alias("hamming"),
    ).filter(F.col("hamming") <= HAMMING_MAX)


def _m5_oracle() -> str:
    band_exprs = ", ".join(
        f"substring(h, {pos}, {ln})" for pos, ln in _BANDS
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_RECRAWL_OFFSET}, text FROM documents WHERE doc_id % 7 = 0),
sigs AS (
  SELECT doc_id, md5(text) AS h FROM corpus),
signed AS (
  SELECT doc_id,
         CAST('0x' || substring(h, 1, 15) AS BIGINT) AS sig,
         unnest([{band_exprs}]) AS band,
         generate_subscripts([{band_exprs}], 1) AS band_idx
  FROM sigs),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.sig AS sig_a, b.sig AS sig_b
  FROM signed a JOIN signed b
    ON a.band_idx = b.band_idx AND a.band = b.band
   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sig_a, sig_b)) <= {HAMMING_MAX}
"""


# ---------------------------------------------------------------------------
# D14 — URL canonicalization dedup.
#
# The fixture has no URL column, so crawl-shaped URLs are synthesized
# deterministically from (source, doc_id): mixed-case host, www
# prefix, trailing slash, tracking params, fragment — exactly the
# variance canonicalization exists to collapse. The operator itself
# (functions/text.py canonical_url) is the real thing: pure native
# regex/array projection, one groupBy on the canonical key.
# ---------------------------------------------------------------------------


def _synth_url():
    d = F.col("doc_id")
    return F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example.COM/Articles/"),
        (d % 50).cast("string"),
        F.lit("/?utm_source=feed&ref=r"),
        (d % 2).cast("string"),
        F.lit("&utm_campaign=c"),
        (d % 3).cast("string"),
        F.lit("#sec"),
        (d % 5).cast("string"),
    )


def d14_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.functions.text import canonical_url

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id", canonical_url(_synth_url()).alias("canonical_url")
    )
    return urls.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_variants"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


D14_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://WWW.' || source || '.Example.COM/Articles/'
           || CAST(doc_id % 50 AS VARCHAR)
           || '/?utm_source=feed&ref=r' || CAST(doc_id % 2 AS VARCHAR)
           || '&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR)
           || '#sec' || CAST(doc_id % 5 AS VARCHAR) AS url
  FROM documents),
canon AS (
  SELECT doc_id,
         'https://'
         || regexp_replace(lower(regexp_extract(url, '^https?://([^/?#]+)', 1)),
                           '^www\\.', '')
         || regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1),
                           '/$', '')
         || CASE WHEN array_to_string(list_sort(list_filter(
                        string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                        x -> NOT regexp_matches(x, '^(utm_|fbclid|gclid|msclkid)')
                             AND x <> '')), '&') <> ''
                 THEN '?' || array_to_string(list_sort(list_filter(
                        string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                        x -> NOT regexp_matches(x, '^(utm_|fbclid|gclid|msclkid)')
                             AND x <> '')), '&')
                 ELSE '' END AS canonical_url
  FROM u)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       min(doc_id) AS canonical_doc_id
FROM canon GROUP BY canonical_url
"""


# ---------------------------------------------------------------------------
# P8 — epoch oversampling plan (the up-sampling counterpart to P6).
# ---------------------------------------------------------------------------
EPOCH_BUDGET = 2.2


def p8_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mixing.epoch_plan(docs, "source", _weight(), EPOCH_BUDGET)


P8_ORACLE = f"""
WITH sizes AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_domain,
         CAST(1 + (CAST(substring(source, 4) AS INT) % 4) AS DOUBLE) AS w
  FROM documents GROUP BY source),
plan AS (
  SELECT source, n_domain,
         CAST({EPOCH_BUDGET} AS DOUBLE)
           * (SELECT sum(n_domain) FROM sizes)
           * (w / (SELECT sum(w) FROM sizes)) AS target_n
  FROM sizes),
plan2 AS (
  SELECT source, n_domain, target_n,
         CAST(floor(target_n / n_domain) AS BIGINT) AS full_epochs,
         target_n / n_domain - floor(target_n / n_domain) AS frac_rate
  FROM plan),
frac AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_frac
  FROM documents d JOIN plan2 p USING (source)
  WHERE substring(md5(CAST(doc_id AS VARCHAR) || '#epoch'), 1, 6)
        < printf('%06x', CAST(floor(frac_rate * 16777216.0) AS INT))
  GROUP BY d.source)
SELECT p.source, p.n_domain, p.target_n, p.full_epochs, p.frac_rate,
       p.full_epochs * p.n_domain + coalesce(f.n_frac, 0) AS n_effective
FROM plan2 p LEFT JOIN frac f USING (source)
"""


# ---------------------------------------------------------------------------
# P9 — weighted sampling without replacement (Efraimidis–Spirakis).
#
# "k docs per language, probability proportional to length" — the
# shape every importance-weighted subset draw takes. Priority
# ln(u)/w with u from the doc's md5 makes the draw a pure function of
# the row (operators/sampling.py), so the sample is identical under
# any partitioning and in any engine; the oracle states the same
# arithmetic. Rounded to 9 decimals before ranking so a ln() ulp
# difference between engines cannot flip a rank boundary.
# ---------------------------------------------------------------------------

_P9_K = 5


def p9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.sampling import weighted_sample_per_group

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    picked = weighted_sample_per_group(
        docs, group_col="lang", key_col="doc_id", weight_col="n_chars", k=_P9_K
    )
    return picked.select("lang", "draw_rank", "doc_id", "n_chars")


def _p9_oracle() -> str:
    from table_demo_spark.operators.sampling import _PRIORITY_ROUND, _U_WIDTH

    denom = float(16**_U_WIDTH)
    return f"""
WITH pr AS (
  SELECT lang, doc_id, n_chars,
         round(ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                        || '#wsample'), 1, {_U_WIDTH}) AS BIGINT) + 1.0)
                  / {denom!r})
               / CAST(n_chars AS DOUBLE), {_PRIORITY_ROUND}) AS p
  FROM documents WHERE n_chars > 0
)
SELECT lang,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY p DESC, doc_id ASC) AS BIGINT)
         AS draw_rank,
       doc_id, n_chars
FROM pr
QUALIFY draw_rank <= {_P9_K}
"""


# ---------------------------------------------------------------------------
# P10 — curriculum binning: order the corpus by a difficulty proxy and
# cut it into equal-depth training phases.
#
# Curriculum learning pipelines need a deterministic "phase" label per
# document (easy -> hard). Difficulty here is mean word length
# (chars/token — a standard readability proxy); phases are ntile(4)
# per language over (difficulty, doc_id), so the binning is exactly
# reproducible: same corpus, same phases, any engine, any
# partitioning. Scale shape: row-local difficulty expression + one
# ranking window per language; equal-depth cuts at 100 TB switch to
# approx-quantile boundaries (a33's sketch) applied as a row-local
# CASE — same labels up to boundary ties, documented trade.
# ---------------------------------------------------------------------------

_P10_PHASES = 4


def p10_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    scored = docs.select(
        "lang",
        "doc_id",
        F.round(
            F.length("text").cast("double") / F.size(toks).cast("double"), 6
        ).alias("difficulty"),
    ).filter(F.size(toks) > 0)
    w = Window.partitionBy("lang").orderBy(
        F.col("difficulty").asc(), F.col("doc_id").asc()
    )
    phased = scored.withColumn("phase", F.ntile(_P10_PHASES).over(w).cast("long"))
    return phased.groupBy("lang", "phase").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("difficulty").alias("min_difficulty"),
        F.max("difficulty").alias("max_difficulty"),
    )


P10_ORACLE = f"""
WITH scored AS (
  SELECT lang, doc_id,
         round(CAST(length(text) AS DOUBLE)
               / CAST(len({_TOKS}) AS DOUBLE), 6) AS difficulty
  FROM documents
  WHERE len({_TOKS}) > 0
),
phased AS (
  SELECT lang, difficulty,
         CAST(ntile({_P10_PHASES}) OVER (PARTITION BY lang
              ORDER BY difficulty ASC, doc_id ASC) AS BIGINT) AS phase
  FROM scored
)
SELECT lang, phase,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(difficulty) AS min_difficulty,
       max(difficulty) AS max_difficulty
FROM phased
GROUP BY lang, phase
"""


# ---------------------------------------------------------------------------
# P11 — group-consistent train/val/test split.
#
# Splitting per-document leaks near-duplicates and same-source
# material across splits; the pipeline-correct unit is the GROUP (here
# the source): hash the source once, every doc inherits its split.
# Deterministic md5 thresholds (the sampling.py discipline), so the
# assignment is reproducible on any engine and stable under
# re-partitioning — and cross-split source leakage is structurally
# zero, which the query surfaces as a checked column rather than a
# claim. Row-local predicate at the scan; one agg.
# ---------------------------------------------------------------------------

_P11_BANDS = (("train", 0.8), ("val", 0.9))  # else "test"


def p11_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.sampling import (
        rate_threshold_hex,
        sample_hash_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    coord = sample_hash_expr(F.col("source"), "split")
    split = (
        F.when(coord < F.lit(rate_threshold_hex(_P11_BANDS[0][1])), "train")
        .when(coord < F.lit(rate_threshold_hex(_P11_BANDS[1][1])), "val")
        .otherwise("test")
    )
    tagged = docs.withColumn("split", split)
    per_split = tagged.groupBy("split").agg(
        F.countDistinct("source").alias("n_sources"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
    )
    # structural leak check: a source must belong to exactly one split
    leak = (
        tagged.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
            .cast("long")
            .alias("leaked_sources")
        )
    )
    return per_split.crossJoin(F.broadcast(leak)).select(
        "split", "n_sources", "n_docs", "n_chars_total", "leaked_sources"
    )


def _p11_oracle() -> str:
    from table_demo_spark.operators.sampling import rate_threshold_hex

    t_train = rate_threshold_hex(_P11_BANDS[0][1])
    t_val = rate_threshold_hex(_P11_BANDS[1][1])
    return f"""
WITH tagged AS (
  SELECT *,
         CASE WHEN substring(md5(source || '#split'), 1, 6) < '{t_train}'
                THEN 'train'
              WHEN substring(md5(source || '#split'), 1, 6) < '{t_val}'
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
per_split AS (
  SELECT split,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars_total
  FROM tagged GROUP BY split
),
leak AS (
  SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS leaked_sources
  FROM (SELECT source, count(DISTINCT split) AS n_splits
        FROM tagged GROUP BY source)
)
SELECT split, n_sources, n_docs, n_chars_total, leaked_sources
FROM per_split, leak
"""


# ---------------------------------------------------------------------------
# P12 — length-bucketed batching with padding-waste accounting.
#
# Training batches pad every sequence to the batch max, so batching
# random-length docs together burns FLOPs on pad tokens; bucketing by
# length first bounds the waste. The operator assigns each doc to
# (power-of-two length bucket, batch index within bucket) — ordering
# by (n_tokens, doc_id) so assignment is deterministic — and reports
# per bucket the batch count and the exact padding waste
# sum(batch_max - len). Integer-exact; one ranking window per bucket
# (the same post-agg-bounded window shape as t15/t17).
# ---------------------------------------------------------------------------

_P12_BATCH = 8


def p12_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    lens = docs.select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    bucket = F.floor(F.log2("n_tokens")).cast("long")
    w = Window.partitionBy("bucket").orderBy("n_tokens", "doc_id")
    batched = (
        lens.withColumn("bucket", bucket)
        .withColumn(
            "batch_id",
            ((F.row_number().over(w) - 1) / F.lit(_P12_BATCH))
            .cast("long"),
        )
    )
    per_batch = batched.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_tokens").alias("mx"),
        F.sum("n_tokens").alias("sm"),
    )
    return per_batch.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum(F.col("mx") * F.col("n_docs") - F.col("sm"))
        .cast("long")
        .alias("padding_waste"),
    )


P12_ORACLE = f"""
WITH lens AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents WHERE len({_TOKS}) > 0
),
batched AS (
  SELECT CAST(floor(log2(n_tokens)) AS BIGINT) AS bucket, n_tokens,
         CAST((row_number() OVER (PARTITION BY CAST(floor(log2(n_tokens)) AS BIGINT)
                                  ORDER BY n_tokens, doc_id) - 1)
              // {_P12_BATCH} AS BIGINT) AS batch_id
  FROM lens
),
per_batch AS (
  SELECT bucket, batch_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         max(n_tokens) AS mx, sum(n_tokens) AS sm
  FROM batched GROUP BY bucket, batch_id
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(mx * n_docs - sm) AS BIGINT) AS padding_waste
FROM per_batch GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# P13 — reproducibility manifest: order-invariant per-shard digests.
#
# Dataset versioning needs a content digest per shard that any engine,
# any partitioning, any row order reproduces bit-for-bit — and that
# updates INCREMENTALLY under CDC (xor is its own inverse: adding a
# doc xors its hash in, deleting xors it back out, no rescan). Digest:
# bit_xor over each doc's 60-bit md5 prefix, per LCG shard (p7's
# assignment), alongside row/byte counts. One map-side-combined agg.
# ---------------------------------------------------------------------------


def p13_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = (mixing.lcg_coord(F.col("doc_id")) % N_SHARDS).cast("int")
    h = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
    return (
        docs.select(shard.alias("shard"), h.alias("h"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
            F.bit_xor("h").alias("content_digest"),
        )
    )


P13_ORACLE = f"""
WITH c AS (
  SELECT CAST((doc_id * {mixing.LCG_A} + {mixing.LCG_C}) % {mixing.LCG_M}
              % {N_SHARDS} AS INT) AS shard,
         CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS h,
         n_chars
  FROM documents)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_bytes,
       CAST(bit_xor(h) AS BIGINT) AS content_digest
FROM c GROUP BY shard
"""


QUERIES: list[Query] = [
    Query("llm_d13_substring_dedup", d13_substring_dedup, D13_ORACLE),
    Query("llm_p5_chunk_overlap", p5_chunk_overlap, P5_ORACLE),
    Query("llm_p6_domain_mix", p6_domain_mix, P6_ORACLE),
    Query("llm_p7_shard_assign", p7_shard_assign, P7_ORACLE),
    Query("llm_m5_payload_sig_dedup", m5_payload_sig_dedup, _m5_oracle()),
    Query("llm_d14_url_dedup", d14_url_dedup, D14_ORACLE),
    Query("llm_p8_epoch_plan", p8_epoch_plan, P8_ORACLE),
    Query("llm_p9_weighted_sample", p9_weighted_sample, _p9_oracle()),
    Query("llm_p10_curriculum", p10_curriculum, P10_ORACLE),
    Query("llm_p11_group_split", p11_group_split, _p11_oracle()),
    Query("llm_p12_length_batching", p12_length_batching, P12_ORACLE),
    Query("llm_p13_corpus_manifest", p13_corpus_manifest, P13_ORACLE),
]
