"""Distributed global rank — no single-task sort.

``row_number() OVER (ORDER BY ...)`` with an empty partition spec
funnels the entire frame through one task's sort (Spark plans an
``Exchange SinglePartition`` + ``Window``), which is a scale-killer
whenever the frame grows with the corpus (token vocabularies, pair
counts). This operator produces the identical dense 1..N ranking with
a two-pass range-partitioned plan:

1. ``repartitionByRange`` on the rank ordering — Spark's range
   partitioner guarantees every row in partition *i* orders before
   every row in partition *i+1*, so a global rank decomposes into
   (rows in earlier partitions) + (local rank);
2. local ``row_number`` per range partition (parallel sorts);
3. per-partition row counts -> running-sum offsets. That frame is
   exactly ``num_partitions`` rows — bounded by cluster geometry, not
   data — so its tiny running-sum window and the broadcast join back
   are scale-free.

The ordering must be a total order (no ties across rows), otherwise
rows equal under the ordering may straddle a range boundary and the
offset arithmetic would double-count; callers rank grouped frames
where the last key is unique (e.g. the token itself).

INVARIANT (exchange reuse): the local-rank subtree and the
sizes/offsets subtree both contain the same ``repartitionByRange``
exchange; correctness requires Spark to dedupe them into ONE physical
exchange (``ReusedExchange``), because two independently executed
range exchanges would sample partition boundaries independently and
could assign rows to different ``spark_partition_id`` buckets between
the subtrees, corrupting the offset arithmetic.
``spark.sql.exchange.reuse.enabled`` defaults to true and the planner
rule fires on the identical subtrees; the invariant is pinned by
``tests/test_plans.py::test_distributed_rank_reuses_range_exchange``
(statically, AQE scoped off, like the pagerank pin) so any future
plan or config drift fails loudly instead of silently mis-ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_rank(
    df: DataFrame,
    order: list[Column],
    rank_name: str = "rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Append ``rank_name`` = global row_number under ``order``."""
    ranged = df.repartitionByRange(num_partitions, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("__pid").orderBy(*order)
    local = ranged.withColumn(
        "__local_rank", F.row_number().over(local_w).cast("long")
    )
    sizes = local.groupBy("__pid").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    # Running sum over the per-partition size frame: num_partitions
    # rows total, bounded by cluster geometry — safe unpartitioned.
    off_w = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "__pid",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0))
        .cast("long")
        .alias("__offset"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_name,
            (F.col("__offset") + F.col("__local_rank")).cast("long"),
        )
        .drop("__pid", "__local_rank", "__offset")
    )
