"""Deterministic sampling operators for training-data pipelines.

Reproducible corpus subsetting is a pipeline primitive: re-running the
pipeline (or running it on two clusters) must pick the SAME rows, and
downsampling rates usually differ per stratum (language, quality band,
source). Random sampling (``df.sample``) is seed+partitioning
dependent; these operators hash row identity instead, so membership is
a pure function of the row — stable under repartitioning, retries,
incremental reruns, and engine choice.

Mechanism: a row is kept iff the first 6 hex digits of
``md5(key # salt)`` sort below the stratum's threshold
``hex(floor(rate * 16^6))``. Lowercase fixed-width hex compares
lexicographically in numeric order, so the test is a plain string
comparison — bit-identical in any engine with md5 (the DuckDB oracle
states the same predicate verbatim). Scale shape: pure codegen'd
row-local predicate at the scan, no shuffle, pushes below joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 6  # 24 bits of md5 — rate resolution 1/16^6 ≈ 6e-8


def rate_threshold_hex(rate: float) -> str:
    """Hex literal h such that P[prefix6(md5) < h] == rate.

    rate 1.0 returns 'g' — one char lexicographically above every hex
    digit, so the comparison keeps all rows. (The naive 7-char literal
    '1000000' would sort BELOW most 6-char coordinates.)"""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    n = int(rate * 16**_HEX_WIDTH)
    if n >= 16**_HEX_WIDTH:
        return "g"
    return format(n, f"0{_HEX_WIDTH}x")


def sample_hash_expr(key: Column, salt: str) -> Column:
    """The row's sampling coordinate: first 6 hex chars of the salted
    key digest (lowercase, fixed width — lexicographic == numeric)."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(f"#{salt}"))), 1, _HEX_WIDTH
    )


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Uniform deterministic sample: keep ~rate of rows, membership a
    pure function of (key, salt)."""
    coord = sample_hash_expr(F.col(key_col), salt)
    return df.filter(coord < F.lit(rate_threshold_hex(rate)))


def stratified_hash_sample(
    df: DataFrame,
    strata: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic downsampling: ``rates`` maps stratum
    value -> keep rate (unlisted strata get ``default_rate``). The
    per-row threshold is a CASE over hex literals, so the whole
    predicate stays codegen'd at the scan."""
    coord = sample_hash_expr(F.col(key_col), salt)
    thr = F.lit(rate_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(strata == value, F.lit(rate_threshold_hex(rate))).otherwise(thr)
    return df.filter(coord < thr)


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-Res).
#
# Pipelines often want "k docs per stratum, probability proportional
# to weight" (length-weighted eval subsets, importance-weighted
# mixture draws). A-Res makes that a pure rank: give each row priority
# ln(u)/w with u ~ U(0,1] and keep the k largest per group — provably
# equivalent to sequential weighted draws without replacement
# (Efraimidis & Spirakis 2006). With u derived from md5 the draw is a
# pure function of the row, so it is partitioning-stable and
# reproducible cross-engine, same discipline as hash_sample above.
#
# Scale shape: per-row codegen'd priority + one top-k-per-group window
# (map-side partial via rank pushdown at scale: a real deployment adds
# a per-partition top-k before the shuffle; at fixture scale the plain
# window is the honest plan). Priorities are rounded to 9 decimals so
# the ln() ulp gap between engines can't flip a rank boundary; ties
# (astronomically rare post-round) break on the key.
# ---------------------------------------------------------------------------

_U_WIDTH = 6  # 24 bits of md5 -> u in (0, 1], resolution 1/16^6
_PRIORITY_ROUND = 9


def weighted_priority(key: Column, weight: Column, salt: str) -> Column:
    """round(ln((h+1)/16^6) / w, 9) — h the 24-bit md5 prefix. +1 keeps
    u > 0 (ln defined) and makes u=1 reachable, matching U(0,1]."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f"#{salt}"))), 1, _U_WIDTH
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(16**_U_WIDTH))
    return F.round(F.log(u) / weight.cast("double"), _PRIORITY_ROUND)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Top-k per group by A-Res priority (desc), key asc on ties.
    Weights must be > 0. Adds ``draw_rank``; drops the float priority
    from the output so downstream comparisons stay integer/string."""
    from pyspark.sql import Window

    pr = weighted_priority(F.col(key_col), F.col(weight_col), salt)
    w = Window.partitionBy(group_col).orderBy(
        pr.desc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("draw_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("draw_rank") <= k)
    )
