"""Cardinality sketching as pure relational algebra.

``hll_cardinality`` is a real HyperLogLog — md5-bucketed registers,
leading-zero ranks, the 0.7213 bias-corrected harmonic estimate — but
built entirely from deterministic relational expressions, so the
*sketch itself* is reproducible bit-for-bit in any engine (the DuckDB
oracle included). Spark's own ``approx_count_distinct`` would be
cheaper per row (HLL++ in Tungsten) but its register state is engine
internal; this formulation trades a constant factor for cross-engine
verifiability — the same trade the dedup family makes with md5.

Scale shape: one explode-free pass computes (bucket, rank) per row;
``groupBy(group, bucket)`` keeps at most ``group x 256`` register rows
(map-side combined max), and the register rollup is O(groups). The
harmonic sum is computed in *integer* arithmetic — each register
contributes ``2^(50 - M_j)`` as a BIGINT — because a float sum of
powers of two spanning >53 bits of magnitude rounds differently per
summation order, while the scaled-integer sum is exact at any
parallelism; the only float op is the final constant / sum division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_REGISTERS = 256  # 2^8 buckets: first 2 md5 hex chars
VALUE_HEX = 13  # next 13 hex chars -> 52-bit rank domain
RANK_CAP = 50  # keeps 2^(50 - M_j) a positive BIGINT
# alpha_256 * m^2 * 2^50, precomputed to one double literal so both
# engines parse/carry the identical constant
ALPHA_M2_SCALED = (0.7213 / (1 + 1.079 / M_REGISTERS)) * M_REGISTERS * M_REGISTERS * float(1 << RANK_CAP)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """The sketch state: (group..., bucket, m_j) register rows.

    Registers are MERGEABLE by per-(group, bucket) max — merging
    partial registers from any partitioning of the input (micro-batches
    included) yields exactly the registers of the whole input, because
    max is associative, commutative, and idempotent. This is what makes
    the sketch streaming- and shard-safe with no replay guard."""
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, VALUE_HEX), 16, 10).cast("long")
    rank = F.least(
        F.when(v > 0, F.lit(VALUE_HEX * 4 + 1) - F.length(F.bin(v))).otherwise(
            F.lit(RANK_CAP)
        ),
        F.lit(RANK_CAP),
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("m_j"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll registers up to (group..., n_registers, est_distinct)."""
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_registers"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {RANK_CAP} - m_j)")
            )
            .cast("long")
            .alias("s_present"),
        )
        .withColumn(
            "est_distinct",
            F.lit(ALPHA_M2_SCALED)
            / (
                F.col("s_present")
                + (F.lit(M_REGISTERS) - F.col("n_registers"))
                * F.expr(f"shiftleft(CAST(1 AS BIGINT), {RANK_CAP})")
            ),
        )
        .drop("s_present")
    )


def hll_cardinality(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL distinct estimate + exact distinct + rel. error.

    Returns (group..., n_registers, est_distinct, exact_distinct,
    rel_err). The raw bias-corrected estimate (no small-range linear
    counting) — documented, deterministic, oracle-checkable.
    """
    scaled = hll_estimate(hll_registers(df, group_cols, value_col), group_cols)
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).cast("long").alias("exact_distinct")
    )
    return scaled.join(exact, group_cols).select(
        *group_cols,
        "n_registers",
        "est_distinct",
        "exact_distinct",
        (
            (F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("rel_err"),
    )


CMS_DEPTH = 4
CMS_HEX = 13  # md5 hex chars parsed per hash (52-bit domain, then % width)


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = 16,
) -> DataFrame:
    """Count-Min-sketch frequency estimates for the top-``k`` values —
    the frequency twin of :func:`hll_cardinality`, and like it built
    from deterministic relational expressions only: counters are plain
    integer sums, the point estimate is min over ``depth`` counters,
    so sketch state and estimates are bit-identical in any engine.

    Returns (value, est_cnt, true_cnt, overcount) for the top-k values
    by estimated count (CMS never undercounts: overcount >= 0 always —
    the defining one-sided error). The candidate set probed here is
    every distinct value, which verifies the whole sketch; a production
    run probes a small candidate list against the same counter table.

    Scale shape: the counter table is depth x width rows REGARDLESS of
    input size (two map-side-combined aggregations build it), and the
    probe join broadcasts it. The default ``width`` is fixture-small on
    purpose so collisions actually occur and the one-sided error is
    exercised; size width ~ e/epsilon for a real corpus.
    """
    val = F.col(value_col).cast("string")

    def pos(j: int) -> F.Column:
        h = F.md5(F.concat(val, F.lit(f"#cms{j}")))
        return (
            F.conv(F.substring(h, 1, CMS_HEX), 16, 10).cast("long") % width
        ).cast("int")

    positions = F.array(
        *[
            F.struct(F.lit(j).alias("depth"), pos(j).alias("col"))
            for j in range(depth)
        ]
    )
    exploded = df.select(val.alias("v"), F.explode(positions).alias("p")).select(
        "v", F.col("p.depth").alias("depth"), F.col("p.col").alias("col")
    )
    counters = exploded.groupBy("depth", "col").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    probes = exploded.distinct()
    est = (
        probes.join(F.broadcast(counters), ["depth", "col"])
        .groupBy("v")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    truth = df.select(val.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("est_cnt").desc(), F.col("v").asc())
    return (
        est.join(truth, "v")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("v").alias("value"),
            "est_cnt",
            "true_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter as a broadcastable relational bitset.
#
# The classical training-data use: "have we already crawled/ingested
# this document?" against a reference corpus too big to equi-join
# per-probe. The filter state here is the SET of set-bit positions —
# at most BLOOM_M rows no matter how many keys were inserted — so the
# membership test is a broadcast join, never a shuffle of the probe
# side against the reference side. Positions are md5-derived
# (BLOOM_M = 16^BLOOM_M_HEX, so a hex prefix IS the position — no
# modulo bias, and the DuckDB oracle states the identical arithmetic).
#
# Scale shape: build = one narrow pass over the reference + a
# <=BLOOM_M-row distinct; probe = codegen'd position computation + a
# broadcast left join + a count-per-key agg. False positives are the
# documented price (P ~ (1 - e^(-kn/m))^k); the fixture query surfaces
# them explicitly (bloom_hit vs true_member).
# ---------------------------------------------------------------------------

BLOOM_M_HEX = 3  # 3 hex chars -> m = 4096 bit positions
BLOOM_M = 16**BLOOM_M_HEX
BLOOM_K = 3  # hash functions per key


def _bloom_positions(key, salt: str, k: int):
    """Array of k bit positions for a key: position_i is the first
    BLOOM_M_HEX hex chars of md5(key#salt<i>) parsed base-16."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(key.cast("string"), F.lit(f"#{salt}{i}"))),
                    1,
                    BLOOM_M_HEX,
                ),
                16,
                10,
            ).cast("int")
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, salt: str = "bloom", k: int = BLOOM_K
) -> DataFrame:
    """The filter: distinct set-bit positions (column ``pos``), <=
    BLOOM_M rows — a sparse bitset any engine can re-derive."""
    return (
        df.select(F.explode(_bloom_positions(F.col(key_col), salt, k)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    probe: DataFrame,
    key_col: str,
    bits: DataFrame,
    salt: str = "bloom",
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership test: a key MAY be present iff all k of its positions
    are set. ``bits`` is broadcast (bounded by BLOOM_M rows); the agg
    counts matched positions per row, so duplicate positions within a
    key's own array (hash collisions) still total k when all are set.
    All probe columns are carried through (grouped on — rows are
    expected unique per probe row, e.g. keyed by an id column)."""
    cols = probe.columns
    exploded = probe.select(
        "*",
        F.explode(_bloom_positions(F.col(key_col), salt, k)).alias("pos"),
    )
    hit = F.broadcast(bits.withColumn("__set", F.lit(1)))
    return (
        exploded.join(hit, "pos", "left")
        .groupBy(*cols)
        .agg((F.count("__set") == k).alias("bloom_hit"))
    )


QUANTILE_PCTS = (50, 90, 99)


def binned_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bin_width: int,
    pcts: tuple[int, ...] = QUANTILE_PCTS,
    suffix: str = "",
) -> DataFrame:
    """Histogram-sketch quantiles: per group, the smallest exclusive
    bin upper edge ``(bin+1)*bin_width`` covering the pct-th value —
    the quantile triplet of the sketch family (HLL cardinality, CMS
    frequency, histogram rank). One row per group with ``p{pct}``
    columns; ``bin_width=1`` degenerates to the exact discrete
    quantile's exclusive upper bound ``q+1``, so the estimate error is
    provably ``< bin_width`` and measurable by running both widths.

    Scale shape (why this beats exact percentile at 100 TB): the only
    row-sized stage is the ``groupBy(group, bin)`` count, which is
    map-side combined down to at most ``groups x (max_value /
    bin_width)`` rows — sketch state is FIXED-SIZE regardless of input
    rows, mergeable by per-bin sum (associative + commutative), hence
    shard- and streaming-safe. The cumulative window then runs over
    bin rows only (bounded by the value range, not the data), so no
    full-data sort ever happens — Spark's exact ``percentile`` would
    shuffle every value to its group's reducer and sort there. All
    arithmetic is integer (threshold test ``100*cum >= pct*total`` by
    cross-multiplication), so results hash-match any engine at any
    parallelism."""
    from pyspark.sql import Window

    bins = (
        df.select(
            *group_cols,
            F.floor(F.col(value_col) / F.lit(bin_width))
            .cast("long")
            .alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    part = Window.partitionBy(*group_cols)
    cum_w = part.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = bins.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(part).alias("total"),
    )
    aggs = [
        F.min(
            F.when(
                F.lit(100) * F.col("cum") >= F.lit(pct) * F.col("total"),
                (F.col("bin") + 1) * bin_width,
            )
        )
        .cast("long")
        .alias(f"p{pct}{suffix}")
        for pct in pcts
    ]
    return c.groupBy(*group_cols).agg(*aggs)
