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
