"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``table_demo_spark.queries`` (one module per
family: reference / analytics / llmops); this file only adapts the
registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's Q1 (tumbling-window departure
    counts per grid cell) on sf0.001."""
    from table_demo_spark.queries.reference import q1_tumble

    return q1_tumble(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from table_demo_spark.queries import all_queries

    return {q.name: q.spark_fn for q in all_queries()}


def oracle_sql() -> dict[str, str]:
    from table_demo_spark.queries import all_queries

    return {q.name: q.oracle for q in all_queries() if q.oracle is not None}
