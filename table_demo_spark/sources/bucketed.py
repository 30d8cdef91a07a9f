"""Bucketed (hash-clustered) table materialization — the shuffle-free
fact-fact join path.

At 100 TB the single most expensive plan node is the shuffle of two
fact tables onto their join key (orders x lineitem in TPC-H terms; the
reference never joins at all, so this is north-star surface). Spark's
answer is *bucketing*: write both tables hash-clustered into the same
number of buckets on the join key (`DataFrameWriter.bucketBy` +
`sortBy`). A later equi-join on that key reads co-located buckets and
Catalyst elides BOTH Exchange nodes — and with sorted buckets the Sort
nodes too — turning an all-to-all network stage into a per-bucket
streamed merge. The write-side cost is paid once; every downstream
join, aggregation, or dedup keyed on the bucket column reuses the
clustering for free.

This is the storage-layout analog of the streaming state partitioning
in `streaming/queries.py`: pick the partitioning once, keep every stage
on it. Plan shape is pinned by ``tests/test_plans.py`` (a bucketed
orders⋈lineitem must show zero Exchange and a SortMergeJoin).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def _safe_name(prefix: str, *parts: str) -> str:
    h = hashlib.md5("|".join(parts).encode()).hexdigest()[:10]
    return f"{prefix}_{h}"


def materialize_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
) -> DataFrame:
    """Write ``df`` as an external parquet table hash-bucketed (and
    sorted) on ``bucket_col``; return the catalog-backed DataFrame.

    The returned frame carries the bucket spec in the catalog, which is
    what lets Catalyst prove co-partitioning at join planning time — a
    plain ``spark.read.parquet`` of the same files would NOT (file
    sources only expose bucketing through the catalog).
    """
    if path is None:
        path = os.path.join(
            tempfile.gettempdir(), "table_demo_bucketed", name
        )
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(name)
    )
    return spark.table(name)


def bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    left: DataFrame,
    left_name: str,
    left_key: str,
    right: DataFrame,
    right_name: str,
    right_key: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Materialize two tables bucketed into the SAME bucket count on
    their respective join keys (the co-partitioning contract; bucket
    counts must match or Catalyst re-shuffles the smaller side)."""
    lname = _safe_name(left_name, sf_dir, left_key, str(n_buckets))
    rname = _safe_name(right_name, sf_dir, right_key, str(n_buckets))
    lt = materialize_bucketed(spark, left, lname, left_key, n_buckets)
    rt = materialize_bucketed(spark, right, rname, right_key, n_buckets)
    return lt, rt
