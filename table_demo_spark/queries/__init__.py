"""Query registry.

Each implemented query/operator from SURVEY.md §2 is declared once as a
:class:`Query` — a named pair of (a) the Spark implementation, a
callable ``(spark, sf_dir) -> DataFrame``, and (b) the equivalent ANSI
SQL the DuckDB oracle runs over the same parquet fixtures. Keeping both
sides adjacent in source is the engine's correctness discipline: a
query without an oracle is not done.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession


class Query(NamedTuple):
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check


def all_queries() -> list[Query]:
    from table_demo_spark.queries import (
        analytics,
        corpus,
        llmops,
        reference,
        sources_fmt,
        streaming,
    )

    return (
        reference.QUERIES
        + analytics.QUERIES
        + llmops.QUERIES
        + corpus.QUERIES
        + sources_fmt.QUERIES
        + streaming.QUERIES
    )
