"""Upsert sinks — the Spark port of ``ElasticUpsertTableSink``.

Reference behaviors reproduced:
- key-based upsert with the document id built by joining key-field
  values with ':' (ElasticUpsertTableSink.scala:125);
- upsert vs delete dispatch on the changelog flag (:144-147) — in
  Structured Streaming ``update`` output mode there are no deletes
  (state eviction is watermark-driven), so the sink's delete path is
  exercised only by the foreachBatch retraction strategies;
- append fast path (:86,96-114) — plain inserts.

``MemoryUpsertSink`` is the in-process stand-in for Elasticsearch: a
keyed dict the tests and demos can assert on. ``foreach_batch_upsert``
adapts any keyed store to ``writeStream.foreachBatch``. A real target
(Delta MERGE, JDBC upsert, ES bulk) plugs in by implementing
``upsert(rows)`` / ``delete(keys)``.
"""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame

from table_demo_spark.plans.modes import ContinuousPlan, infer_plan


class MemoryUpsertSink:
    """Thread-safe keyed row store; doc id = ':'-joined key values."""

    def __init__(self, key_cols: tuple[str, ...]):
        self.key_cols = key_cols
        self._rows: dict[str, dict] = {}
        self._lock = threading.Lock()

    def doc_id(self, row: dict) -> str:
        return ":".join(str(row[k]) for k in self.key_cols)

    def upsert(self, rows: list[dict]) -> None:
        with self._lock:
            for r in rows:
                self._rows[self.doc_id(r)] = r

    def delete(self, keys: list[str]) -> None:
        with self._lock:
            for k in keys:
                self._rows.pop(k, None)

    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self._rows.values())


def foreach_batch_upsert(
    sink: MemoryUpsertSink,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function applying each micro-batch as upserts.

    In ``update`` mode a micro-batch contains exactly the keys whose
    aggregate changed — applying them as key-based upserts reproduces
    the reference's continuously-updated result table. At scale the
    collect below becomes the sink client's bulk API (ES bulk, Delta
    MERGE) executed per partition via ``df.foreachPartition``.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        sink.upsert([r.asDict() for r in batch_df.collect()])

    return fn


def run_to_upsert_sink(
    stream_df: DataFrame,
    plan: ContinuousPlan | None = None,
    flatten_window: str | None = "window",
) -> tuple[MemoryUpsertSink, "object"]:
    """Bind a continuous query to a MemoryUpsertSink — the engine-side
    analog of ``table.writeToSink(new ElasticUpsertTableSink(...))``
    (TaxiRideQueries.scala:91-99): infer output mode + upsert keys from
    the plan, start the stream. Returns (sink, StreamingQuery)."""
    if plan is None:
        plan = infer_plan(stream_df)
    df = stream_df
    keys = list(plan.upsert_keys)
    if flatten_window and flatten_window in df.columns:
        # window struct -> its end timestamp as the key component
        from pyspark.sql import functions as F

        df = df.withColumn(flatten_window, F.unix_millis(F.col(f"{flatten_window}.end")))
    sink = MemoryUpsertSink(tuple(keys))
    query = (
        df.writeStream.outputMode(plan.output_mode)
        .foreachBatch(foreach_batch_upsert(sink))
        .option("checkpointLocation", _tmp_checkpoint())
        .start()
    )
    return sink, query


def _tmp_checkpoint() -> str:
    import tempfile

    return tempfile.mkdtemp(prefix="tds-ckpt-")
