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
from pyspark.sql import functions as F

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


def s3_text_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.sources import formats

    path = formats.ensure_events_text(spark, sf_dir)
    return formats.read_events_text(spark, path).select(
        "event_id", "ts_ms", "user_id", "event_type", "value", "props"
    )


_PARTITIONED_ORACLE = """
SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
FROM events
WHERE event_type IN ('click', 'purchase')
"""


def s11_xml_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-XML ingestion (Spark 4's built-in xml source — the
    enterprise-feed shape): events written as <event> elements and
    read back with a DECLARED schema (no sampling inference pass).
    The oracle is the parquet events table verbatim, so a mis-escaped
    entity in the JSON-carrying props strings, a dropped record at a
    file-split boundary, or a double that fails to round-trip through
    its text form breaks the value hash."""
    from table_demo_spark.sources import formats

    path = formats.ensure_events_xml(spark, sf_dir)
    return formats.read_events_xml(spark, path).select(
        "event_id", "ts_ms", "user_id", "event_type", "value", "props"
    )


def s4_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned read: the event_type filter must resolve to
    `PartitionFilters` on the scan (directories for the other three
    event types are never opened) — asserted by the plan test."""
    from pyspark.sql import functions as F

    from table_demo_spark.sources import formats

    path = formats.ensure_events_partitioned(spark, sf_dir)
    return (
        formats.read_events_partitioned(spark, path)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "ts_ms", "user_id", "event_type", "value", "props")
    )


def s5_permissive_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine-and-continue ingestion: the dirty fixture truncates
    every 50th record; the PERMISSIVE reader must surface exactly the
    clean rows (malformed ones carry their raw text in _corrupt and
    are filtered here — one lost row in the clean set or one corrupt
    row leaking through breaks the hash)."""
    from pyspark.sql import functions as F

    from table_demo_spark.sources import formats

    path = formats.ensure_events_jsonl_dirty(spark, sf_dir)
    df = formats.read_events_jsonl_permissive(spark, path)
    return df.filter(F.col(formats.CORRUPT_COL).isNull()).select(
        "event_id", "ts_ms", "user_id", "event_type", "value", "props"
    )


from table_demo_spark.sources.formats import DIRTY_EVERY  # noqa: E402

_PERMISSIVE_ORACLE = f"""
SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
FROM events
WHERE event_id % {DIRTY_EVERY} <> 0
"""


def s6_compacted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as table maintenance: fragment the events
    fixture into 64 tiny parquet files, compact with
    operators/layout.compact_files, and read the compacted table back
    in full. Content identity under rewrite is the correctness
    contract (one duplicated or lost row breaks the hash); the
    file-count collapse itself is pinned by
    tests/test_operators.py::test_compact_files_reduces_count."""
    import tempfile

    from pyspark.sql import functions as F

    from table_demo_spark.operators.layout import compact_files
    from table_demo_spark.sources.batch import load_table

    base = tempfile.mkdtemp(prefix="tds-compact-")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    ev.repartition(64).write.parquet(f"{base}/fragmented")
    compact_files(spark, f"{base}/fragmented", f"{base}/compacted")
    return spark.read.parquet(f"{base}/compacted").select(
        "event_id", "ts_ms", "user_id", "event_type", "value", "props"
    )


def s7_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolved dataset read: v1 parquet files predate the
    (value, props) columns, v2 files carry them; ``mergeSchema``
    reconciles to the widest schema with NULLs for the missing
    columns (sources/formats.py read_events_evolved). NULL value ->
    -1.0 sentinel for dtype-stable comparison; has_value records
    which generation served the row."""
    from table_demo_spark.sources import formats

    path = formats.ensure_events_evolved(spark, sf_dir)
    ev = formats.read_events_evolved(spark, path)
    return ev.select(
        "event_id",
        "ts_ms",
        "user_id",
        "event_type",
        F.coalesce(F.col("value"), F.lit(-1.0)).alias("value"),
        F.col("value").isNotNull().alias("has_value"),
    )


_EVOLVED_ORACLE = """
SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type,
       CASE WHEN event_id % 2 = 0 THEN CAST(-1.0 AS DOUBLE)
            ELSE value END AS value,
       event_id % 2 = 1 AS has_value
FROM events
"""


def s8_quoted_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-4180 quoted-CSV roundtrip: the props column is JSON (commas
    + double quotes in every row), so the write must quote-wrap and
    quote-double and the read must undo both exactly; floats travel as
    scaled-integer cents because float->text->float is the one lossy
    leg of CSV. The oracle is the parquet view — any mangling breaks
    the hash on the props value itself."""
    from table_demo_spark.sources import formats

    path = formats.ensure_events_quoted_csv(spark, sf_dir)
    return formats.read_events_quoted_csv(spark, path).select(
        "event_id", "ts_ms", "user_id", "event_type", "props", "value_cents"
    )


_QUOTED_CSV_ORACLE = """
SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, props,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM events
"""


def s9_multiline_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file JSON arrays (the API-dump / export shape): each file
    is ONE JSON value, parsed under ``multiLine`` — deliberately the
    anti-JSONL: not line-splittable, so read parallelism equals file
    count and the 100 TB guidance is 'shard at WRITE time' (the
    builder emits one array per shard). Same rows as every other
    events source — the oracle is shared."""
    from table_demo_spark.sources import formats

    path = formats.ensure_events_multiline_json(spark, sf_dir)
    return formats.read_events_multiline_json(spark, path).select(
        "event_id", "ts_ms", "user_id", "event_type", "value", "props"
    )


def s10_binary_file_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``binaryFile`` source over a directory of REAL
    PNG files — the object-store layout multimodal corpora actually
    arrive in (one opaque file per image, id in the file name).
    ``pathGlobFilter`` prunes non-image files at LISTING time, the
    doc id is one regexp over the path column, and the payloads are
    decoded through the full zlib+filter codec chain to luma stats —
    so the oracle is batch m14's, verbatim: a file dropped by the
    listing, truncated by the reader, or mis-keyed by the path parse
    breaks the value hash. Parallelism is per-file (binary objects
    are unsplittable), exactly the right unit at 100 TB of images."""
    from table_demo_spark.operators import multimodal
    from table_demo_spark.sources import formats

    path = formats.ensure_docs_png_files(spark, sf_dir)
    files = formats.read_docs_binary_files(spark, path)
    return multimodal.decoded_luma(files.select("doc_id", "payload"))


def _m14_oracle() -> str:
    from table_demo_spark.queries.llmops import M14_ORACLE

    return M14_ORACLE


QUERIES: list[Query] = [
    Query("src_s1_jsonl_events", s1_jsonl_events, _EVENTS_ORACLE),
    Query("src_s2_orc_events", s2_orc_events, _EVENTS_ORACLE),
    Query("src_s3_text_events", s3_text_events, _EVENTS_ORACLE),
    Query("src_s4_partitioned_events", s4_partitioned_events, _PARTITIONED_ORACLE),
    Query("src_s5_permissive_jsonl", s5_permissive_jsonl, _PERMISSIVE_ORACLE),
    Query("src_s6_compacted_events", s6_compacted_events, _EVENTS_ORACLE),
    Query("src_s7_schema_evolution", s7_schema_evolution, _EVOLVED_ORACLE),
    Query("src_s8_quoted_csv", s8_quoted_csv, _QUOTED_CSV_ORACLE),
    Query("src_s9_multiline_json", s9_multiline_json, _EVENTS_ORACLE),
    Query("src_s10_binary_file_images", s10_binary_file_images, _m14_oracle()),
    Query("src_s11_xml_events", s11_xml_events, _EVENTS_ORACLE),
]
