"""Source-format queries: JSONL and ORC connectors, oracle-gated.

Each query materializes the events fixture in the target format (once,
cached), reads it back through the format's reader, and returns the
full typed row set — the oracle is the parquet view of the same
records, so any serialization loss, schema drift, or reader bug breaks
the hash. See sources/formats.py for the scale rationale (explicit
JSON schema, splittability, columnar pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from table_demo_spark.queries import Query

_EVENTS_ORACLE = """
SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
FROM events
"""


def s1_jsonl_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.sources import formats

    path = formats.ensure_events_jsonl(spark, sf_dir)
    return formats.read_events_jsonl(spark, path).select(
        "event_id", "ts_ms", "user_id", "event_type", "value", "props"
    )


def s2_orc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.sources import formats

    path = formats.ensure_events_orc(spark, sf_dir)
    return formats.read_events_orc(spark, path).select(
        "event_id", "ts_ms", "user_id", "event_type", "value", "props"
    )


QUERIES: list[Query] = [
    Query("src_s1_jsonl_events", s1_jsonl_events, _EVENTS_ORACLE),
    Query("src_s2_orc_events", s2_orc_events, _EVENTS_ORACLE),
]
