"""Deduplication operators.

Four families, each scale-shaped differently:

- **exact** — one hash-shuffle on a content fingerprint. The 100 TB
  plan: fingerprint is computed at scan (codegen), the groupBy shuffles
  only (fingerprint, doc_id) pairs, never the payload.
- **MinHash + LSH** — shingle -> k minhashes -> banded keys ->
  bucket-equi-join -> Jaccard verify. The candidate join is an
  equi-join on band keys, so it hash-partitions; no O(n^2) stage ever
  materializes. Verification re-joins the (small) candidate set back to
  the shingle sets.
- **SimHash** — one pass computes a 32-bit signature per doc; identical
  signatures (or small Hamming distance via banded re-grouping) are
  candidates. Cheapest near-dup pass: a single groupBy on the signature.
- **blocked n-gram Jaccard** — exact Jaccard inside cheap blocks
  (language + length band). Exact but quadratic per block; the LSH
  operator is the scale path, this is the precision tool.

Hash choice: md5 of the shingle text (+ a per-function salt). md5 is
deliberately chosen over Spark's xxhash64/murmur because it is
bit-identical in every engine (incl. the DuckDB oracle) — the LSH
recall behavior itself is therefore oracle-checkable, not just the
final verified pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table_demo_spark.functions.text import tokens, word_ngrams
from table_demo_spark.sources.batch import fan_out

N_MINHASH = 18
N_BANDS = 6  # 6 bands x 3 rows: inflection (1/6)^(1/3) ≈ 0.55 — matched to
# the 0.5 default threshold. P(candidate) = 1-(1-s^3)^6: 0.99 at s=0.8,
# 0.92 at 0.7, 0.55 at 0.5, 0.15 at 0.3 — weak pairs mostly never reach
# the (join-heavy) verification stage, unlike a 2-rows-per-band layout
# whose inflection sits at 0.41 and floods verify with s≈0.3 pairs.
ROWS_PER_BAND = N_MINHASH // N_BANDS


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact (normalized) dedup: md5 over the normalized token stream;
    canonical id = min doc id per fingerprint.

    Single shuffle on the fingerprint (window min), so the
    tokenize+hash projection runs exactly once per row — the groupBy +
    join-back formulation evaluates it twice (once per join side) and
    shuffles twice."""
    from pyspark.sql import Window

    from table_demo_spark.functions.text import doc_fingerprint

    with_fp = docs.select(
        F.col(id_col).alias("doc_id"), doc_fingerprint(text_col).alias("fingerprint")
    )
    canonical = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    return with_fp.select(
        "doc_id",
        canonical.alias("canonical_id"),
        (F.col("doc_id") != canonical).alias("is_dup"),
        "fingerprint",
    )


def shingle_sets(docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shingles) with distinct word n-gram shingles; docs with
    fewer than n tokens are excluded (they have no n-grams)."""
    toks = tokens(text_col)
    docs = fan_out(docs)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_ngrams(toks, n)).alias("shingles"),
    ).filter(F.size("shingles") > 0)


HASHES_PER_DIGEST = 6  # 32 hex chars -> six 5-hex (20-bit) hash slices


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh11) — k minhashes per doc.

    Relational shape: explode shingles -> 2 salted md5 per shingle ->
    groupBy(doc_id) with 12 min() aggregates over 5-hex digest slices.
    One shuffle, map-side combined (partial mins), md5 evaluated exactly
    twice per shingle. This beats the array-expression form (array_min
    over transform) because CollapseProject duplicates the md5 transform
    into every one of the 12 array_mins — same lesson as
    :func:`simhash_signatures`'s explode form.
    """
    ex = sh.select(F.col("doc_id"), F.explode("shingles").alias("s")).select(
        "doc_id",
        *[
            F.md5(F.concat(F.col("s"), F.lit(f"#{j}"))).alias(f"d{j}")
            for j in range(N_MINHASH // HASHES_PER_DIGEST)
        ],
    )
    return ex.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.col(f"d{i // HASHES_PER_DIGEST}"),
                    (i % HASHES_PER_DIGEST) * 5 + 1,
                    5,
                )
            ).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )


def band_keys_frame(sig: DataFrame) -> DataFrame:
    """(doc_id, band, key) — the banded-minhash bucket keys, exploded
    one row per band. Shared by the batch self-join candidates and the
    streaming band-store join (streaming/queries.run_q25)."""
    band_keys = F.array(
        *[
            F.md5(
                F.concat(
                    *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                )
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.posexplode(band_keys).alias("band", "key"))


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate pairs from banded minhash
    signatures: explode band keys, self-equi-join on (band, key) —
    hash-partitionable, never all-pairs. Shared by every verifier
    (Jaccard, edit distance)."""
    bands = band_keys_frame(sig)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def edit_distance_pairs(
    docs: DataFrame,
    rel_threshold: float = 0.3,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fuzzy near-dup pairs: LSH candidates verified by NORMALIZED
    Levenshtein distance — dist / max(len) <= ``rel_threshold`` over
    the normalized token stream.

    Edit distance is the right verifier when near-dups differ by
    small in-place edits (OCR noise, template fill-ins) that shuffle
    few tokens but break shingle sets disproportionately; Jaccard
    (minhash_lsh_pairs) is the right one for block moves. Candidates
    come from the same banded-minhash equi-join either way — only the
    per-pair verdict differs, and levenshtein() is a JVM built-in,
    codegen'd per candidate pair.

    Scale: O(len_a * len_b) per CANDIDATE pair (never per corpus
    pair); the LSH S-curve bounds candidates, the same argument as
    minhash_lsh_pairs. No driver state, three equi-join shuffles."""
    sh = shingle_sets(docs, n, id_col, text_col)
    cands = lsh_candidates(minhash_signatures(sh))
    norm = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(tokens(text_col), " ").alias("norm"),
    )
    na = norm.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("norm_a"))
    nb = norm.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("norm_b"))
    dist = F.levenshtein("norm_a", "norm_b").cast("long")
    rel = dist.cast("double") / F.greatest(
        F.length("norm_a"), F.length("norm_b")
    ).cast("double")
    return (
        cands.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", dist.alias("edit_dist"), rel.alias("rel_dist"))
        .filter(F.col("rel_dist") <= rel_threshold)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact Jaccard verification.

    Plan shape: scan -> shingle projection -> explode 6 band keys ->
    self-equi-join on (band, key) -> distinct candidate pairs ->
    re-join shingle sets -> exact Jaccard filter. Every join is an
    equi-join (hash-partitionable); candidates are a tiny fraction of
    n^2 by LSH construction.
    """
    sh = shingle_sets(docs, n, id_col, text_col).cache()
    sig = minhash_signatures(sh)
    cands = lsh_candidates(sig)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 32-bit SimHash per document.

    Relational plan: explode tokens, hash each token ONCE, fan out 32
    bit positions, two partial-aggregating shuffles (votes, then
    signature). This beats the closed-form expression variant
    (functions.text.simhash32) by ~30x on wide corpora because the
    expression form re-evaluates md5 per bit; the explode form is also
    the shape that scales — both shuffles are map-side combined.
    """
    tok = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("t"),
    ).select("doc_id", F.md5("t").alias("digest"))
    bits = tok.select(
        "doc_id",
        "digest",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    )
    high = list("89abcdef")
    votes = bits.groupBy("doc_id", "b").agg(
        F.sum(
            F.when(
                F.substring("digest", F.col("b") + 1, 1).isin(*high), F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias("w")
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("w") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
            .otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("simhash")
    )


# Geometric length-bucket boundaries with step ratio >= 1.25: two
# lengths inside the 20% band (min >= 0.8*max <=> max <= 1.25*min)
# always land in the SAME or ADJACENT buckets, so the band join
# becomes an equi-join on (lang, bucket) with a one-bucket probe.
def _jaccard_bucket_bounds() -> list[int]:
    bounds = [1]
    while bounds[-1] < 1 << 20:
        bounds.append(max(bounds[-1] + 1, -(-bounds[-1] * 5 // 4)))
    return bounds


_JACCARD_BUCKET_BOUNDS = _jaccard_bucket_bounds()


def _length_bucket(col: F.Column) -> F.Column:
    bounds = F.array(*[F.lit(b) for b in _JACCARD_BUCKET_BOUNDS])
    return F.size(F.filter(bounds, lambda b: b <= col))


def _jaccard_candidates_band(meta: DataFrame) -> DataFrame:
    """(doc_a, doc_b) banded candidates via the r6 (lang x geometric
    length-bucket) equi-join: every doc gets a ratio-1.25 integer
    bucket (banded pairs are at most one bucket apart), the right side
    probes (bucket, bucket+1), candidates carry integers only. Each
    unordered pair is produced exactly ONCE — no dedup shuffle."""
    bucketed = meta.withColumn("bkt", _length_bucket(F.col("n_chars")))
    left = bucketed.select(
        F.col("doc_id").alias("doc_l"),
        F.col("lang").alias("lang_l"),
        F.col("n_chars").alias("nc_l"),
        F.col("bkt").alias("bkt_l"),
    )
    right = bucketed.select(
        F.col("doc_id").alias("doc_r"),
        F.col("lang").alias("lang_r"),
        F.col("n_chars").alias("nc_r"),
        F.col("bkt").alias("bkt_r"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("jkey"),
    )
    # Exactly-once pair matching: same-bucket pairs keep the doc order
    # rule; adjacent-bucket pairs match only with the higher bucket on
    # the left, which is already unique.
    return left.join(
        right,
        (F.col("lang_l") == F.col("lang_r"))
        & (F.col("bkt_l") == F.col("jkey"))
        & (
            F.abs(F.col("nc_l") - F.col("nc_r")) * 5
            <= F.greatest("nc_l", "nc_r")
        )
        & (
            ((F.col("jkey") == F.col("bkt_r")) & (F.col("doc_l") < F.col("doc_r")))
            | (F.col("jkey") == F.col("bkt_r") + 1)
        ),
    ).select(
        F.least("doc_l", "doc_r").alias("doc_a"),
        F.greatest("doc_l", "doc_r").alias("doc_b"),
    )


def blocked_jaccard_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.5,
    length_band_pct: int = 20,
) -> DataFrame:
    """Exact n-gram Jaccard inside (lang, length-band) blocks.

    Blocking predicate uses integer math (5*|d| <= max) so the oracle
    reproduces it exactly. The precision tool; use minhash_lsh_pairs
    when even the pruned candidate set is too large.

    Execution shape (fourth rework, r9 — the measured winner of a
    three-way A/B): the r6 (lang x geometric length-bucket) band join
    generates candidates — one row per unordered pair, integers only,
    NO dedup shuffle — and shingle identity is a 60-bit md5 slice, so
    the per-pair intersection runs over LONG arrays instead of string
    arrays. The A/B that settled it (sf0.1 warm / key-shifted 10x
    dup-heavy fixture): band+strings 19.3 s / 96 s; PPJoin prefix
    index+strings (Xiao et al. WWW'08) 9.8 s / 405 s — the token
    join's per-pair multiplicity explodes when copies share every
    prefix token (158M pre-distinct rows, a 149 s distinct);
    band+longs 9.2 s / 33 s — dominates BOTH corpora, because the
    real cost was never candidate count but the string array_intersect
    (~3x slower per pair and 3-4x more shuffle bytes than longs).

    Hashing note (md5-as-cross-engine-hash discipline, module
    docstring): Jaccard is computed over 60-bit md5 slices of the
    distinct shingles; both engines hash identically, so results stay
    bit-equal, and a 60-bit collision (~2^-60 per shingle pair) is the
    same negligible, deterministic event on both sides.

    Skewed (lang, bucket) keys are the AQE-skew-join case at scale."""
    assert length_band_pct == 20, "integer blocking is specialized to 20%"
    sh = shingle_sets(docs, n).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                "shingles",
                lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                    "long"
                ),
            )
        ).alias("shingles"),
    )
    meta = docs.select(F.col("doc_id"), "lang", "n_chars")
    cands = _jaccard_candidates_band(meta)
    paired = cands.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        paired.select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Distributed connected components over an undirected edge list:
    ``(id, component)`` where component = min node id in the cluster.

    The missing piece between pairwise near-dup detection and the
    actual dedup decision: LSH/Jaccard emit PAIRS, but "keep one doc
    per duplicate group" needs the transitive closure of those pairs
    (A~B, B~C => {A,B,C} one group, one canonical survivor).

    Pregel-style min-label propagation: per iteration one equi-join
    (edges x labels) + one groupBy-min — both hash-partitioned on node
    id, no driver-side graph. The driver runs only the convergence
    loop (count of changed labels per iteration — the standard
    driver-coordinated fixpoint, O(1) rows to the driver).
    ``localCheckpoint`` truncates lineage each round so plans stay
    flat. Iterations = graph diameter; near-dup clusters are
    shallow (duplicates of one source document), so 3-5 rounds
    converge. For adversarial long-chain graphs swap the step for
    alternating large-star/small-star (same join/agg primitives,
    O(log n) rounds).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        # Materialize the edge list ONCE (r16, guide §2.4/§5): `sym`
        # is lazy and every iteration's localCheckpoint job re-planned
        # it from scratch, so the WHOLE upstream pair pipeline (d7:
        # shingle -> minhash -> LSH band self-join -> Jaccard verify)
        # re-executed per round — new plan => new shuffle ids, no
        # exchange reuse across jobs.  The near-dup edge list is tiny
        # by construction (bounded by verified pairs), so one eager
        # localCheckpoint trades O(iterations) full pipeline re-runs
        # for one materialization.  Interleaved A/B at sf0.1 (d7's
        # exact loop, 2 reps each): 8.9/7.9 s -> 4.6/4.1 s (~1.9x),
        # identical labels; per-iteration plans drop the LSH subtree.
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor = sym.join(
            labels.withColumnRenamed("id", "u"), "u"
        ).select(F.col("v").alias("id"), "label")
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share
    any word ``n``-gram with a held-out benchmark/eval corpus (the
    GPT-3/Pile-style n-gram overlap check, reference-free).

    Scale shape (the asymmetry is the whole design): the benchmark
    side is tiny and bounded (eval sets, not training data), so its
    distinct n-gram set is the broadcast side of the join; the
    training side — the 100 TB one — streams through in a single pass:
    tokenize -> distinct n-grams -> explode -> broadcast-hash-join ->
    one hash shuffle on doc_id for the per-doc rollup. No sort-merge
    join, no shuffle of the benchmark, no second pass over the
    payload (gram count is carried alongside the exploded rows).

    Returns one row per training doc: ``doc_id, n_grams, n_hits,
    contaminated`` where ``n_hits`` counts *distinct* overlapping
    n-grams.
    """
    grams_of = lambda c: F.array_distinct(word_ngrams(tokens(c), n))  # noqa: E731
    bench_grams = (
        benchmark.select(F.explode(grams_of(text_col)).alias("gram")).distinct()
    )
    # Two-step projection: the gram array materializes once per row under
    # the Generate; size() and explode_outer() both reference the column
    # attribute instead of re-running tokenize+shingle.
    with_grams = train.select(
        F.col(id_col).alias("doc_id"), grams_of(text_col).alias("grams")
    )
    exploded = with_grams.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_grams"),
        F.explode_outer("grams").alias("gram"),
    )
    hit = F.when(F.col("hit").isNotNull(), 1).otherwise(0)
    return (
        exploded.join(
            F.broadcast(bench_grams.withColumn("hit", F.lit(1))), "gram", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.sum(hit).cast("long").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


SIMHASH_BANDS = 4  # 4 x 8-bit slices of the 32-bit signature
SIMHASH_HAMMING_MAX = 3


def simhash_pairs(
    docs: DataFrame,
    hamming_max: int = SIMHASH_HAMMING_MAX,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-duplicate pairs: banded bucket join + exact
    Hamming verify (Charikar 2002 / the Google near-dup pipeline,
    Manku et al. 2007).

    By pigeonhole, two 32-bit signatures within Hamming distance
    ``hamming_max`` < SIMHASH_BANDS must agree EXACTLY on at least one
    of the 4 byte-slices — so candidates come from an equi-join on
    (band, slice value), never an all-pairs scan, and the verifier is
    one codegen'd ``bit_count(xor)`` per candidate. Same
    candidates-then-verify shape as the minhash family; SimHash is the
    right tool when near-dups differ by a few tokens (bit flips are
    proportional to edited token weight), minhash when they share
    shingle sets.
    """
    sig = simhash_signatures(docs, id_col, text_col)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(simhash >> {8 * b}) & 255").alias("slice"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.slice").alias("slice"))
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.expr("sim_a ^ sim_b")).cast("long")
    return cands.select(
        "doc_a", "doc_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= hamming_max)
