"""Skew-safe two-stage aggregation (salting).

A plain ``groupBy(k).agg(...)`` sends every row of a hot key to one
reducer; at 100 TB a single skewed key (one language, one event type,
one null bucket) serializes the whole stage. ``salted_agg`` splits each
key into sub-groups first, aggregates the sub-groups in parallel, then
merges the (tiny) partials — the standard salting rewrite, valid for
any algebraic aggregate (sum/count/min/max here).

AQE's skew handling (``spark.sql.adaptive``) covers skewed *joins*;
skewed *aggregations* still need this rewrite when map-side combine
isn't enough (e.g. high-cardinality payload expressions downstream).

The salt is ``spark_partition_id()``: deterministic for a given scan,
no extra column scan, and it makes stage 1 a purely local combine per
input partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_alias: str | None = "n",
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Exactly ``df.groupBy(keys).agg(count, sum(c)..., min/max(c)...)``
    but skew-proof: per-partition partials, then a merge on keys whose
    input is |keys| x |partitions| rows regardless of data skew."""
    keys = list(keys)
    partials = []
    finals = []
    if count_alias:
        partials.append(F.count(F.lit(1)).alias("__cnt"))
        finals.append(F.sum("__cnt").cast("long").alias(count_alias))
    for c in sum_cols:
        partials.append(F.sum(c).alias(f"__sum_{c}"))
        finals.append(F.sum(f"__sum_{c}").alias(f"sum_{c}"))
    for c in min_cols:
        partials.append(F.min(c).alias(f"__min_{c}"))
        finals.append(F.min(f"__min_{c}").alias(f"min_{c}"))
    for c in max_cols:
        partials.append(F.max(c).alias(f"__max_{c}"))
        finals.append(F.max(f"__max_{c}").alias(f"max_{c}"))
    stage1 = df.groupBy(
        *keys, F.spark_partition_id().alias("__salt")
    ).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def split_hot_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_threshold: int,
) -> DataFrame:
    """Hot/cold split join — the explicit form of skew-join handling
    for when AQE can't save you (first shuffle already OOMs a task, or
    the engine predates runtime replanning): keys whose fact-side
    frequency reaches ``hot_threshold`` join via a BROADCAST of just
    the dim rows for those keys (a small set by construction — few
    keys are hot), while the cold long tail takes the ordinary
    shuffle join; the union is the full join result.

    This differs from salting: salting spreads one hot key across
    reducers but still shuffles the fact side; the split avoids
    shuffling hot fact rows entirely. Cost: one extra pass to count
    key frequencies (reusable if the stats are maintained as a table).
    Inner-join semantics; every row routes to exactly one branch, so
    no dedup is needed.
    """
    counts = fact.groupBy(key).agg(F.count(F.lit(1)).alias("__cnt"))
    hot_keys = counts.filter(F.col("__cnt") >= hot_threshold).select(key)
    fact_hot = fact.join(F.broadcast(hot_keys), key, "left_semi")
    fact_cold = fact.join(F.broadcast(hot_keys), key, "left_anti")
    dim_hot = dim.join(F.broadcast(hot_keys), key, "left_semi")
    return fact_hot.join(F.broadcast(dim_hot), key).unionByName(
        fact_cold.join(dim, key)
    )
