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


def hll_cardinality(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL distinct estimate + exact distinct + rel. error.

    Returns (group..., n_registers, est_distinct, exact_distinct,
    rel_err). The raw bias-corrected estimate (no small-range linear
    counting) — documented, deterministic, oracle-checkable.
    """
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, VALUE_HEX), 16, 10).cast("long")
    rank = F.least(
        F.when(v > 0, F.lit(VALUE_HEX * 4 + 1) - F.length(F.bin(v))).otherwise(
            F.lit(RANK_CAP)
        ),
        F.lit(RANK_CAP),
    )
    regs = (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("m_j"))
    )
    scaled = (
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
    )
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
