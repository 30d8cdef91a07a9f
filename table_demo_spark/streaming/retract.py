"""Retract changelog support — the third of the reference's three
stream<->table conversion modes (SURVEY §1.4).

Flink's ``toRetractStream[Row]`` (TaxiRideQueries.scala:89,158) encodes
every update to a continuously-updating result as a pair
``(false, oldRow)`` then ``(true, newRow)``; downstream operators (the
second aggregation in Q3) and sinks (delete path of
ElasticUpsertTableSink.scala:140-147) consume exactly this encoding.

Structured Streaming's ``update`` output mode emits only the new row
per changed key; :class:`RetractStreamAdapter` reconstructs the full
retract encoding from it by remembering the previous row per key —
which is precisely what Flink's planner-managed operator state held.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame


class RetractStreamAdapter:
    """Converts update-mode micro-batches into a retract changelog.

    ``consumer(flag, row)`` receives ``(False, old_row)`` before
    ``(True, new_row)`` for every changed key, and a bare
    ``(True, row)`` for first-seen keys — Flink's accumulate/retract
    contract. ``ttl_ms`` mirrors the reference's idle-state retention
    (``withIdleStateRetentionTime``, TaxiRideQueries.scala:99): keys
    idle longer than the TTL are dropped from the adapter's state, and
    a ``(False, last_row)`` retraction is emitted for them (the result
    row disappears, exactly like Flink's state eviction)."""

    def __init__(
        self,
        key_cols: tuple[str, ...],
        consumer: Callable[[bool, dict], None],
        ttl_ms: int | None = None,
        now_fn: Callable[[], float] = time.time,
    ):
        self.key_cols = key_cols
        self.consumer = consumer
        self.ttl_ms = ttl_ms
        self.now_fn = now_fn
        self._prev: dict[tuple, dict] = {}
        self._last_seen: dict[tuple, float] = {}

    def _key(self, row: dict) -> tuple:
        return tuple(row[k] for k in self.key_cols)

    def apply_rows(self, rows: list[dict]) -> None:
        now = self.now_fn()
        for row in rows:
            k = self._key(row)
            old = self._prev.get(k)
            if old is not None:
                self.consumer(False, old)
            self.consumer(True, row)
            self._prev[k] = row
            self._last_seen[k] = now
        self._expire(now)

    def _expire(self, now: float) -> None:
        if self.ttl_ms is None:
            return
        cutoff = now - self.ttl_ms / 1000.0
        for k in [k for k, t in self._last_seen.items() if t < cutoff]:
            self.consumer(False, self._prev.pop(k))
            del self._last_seen[k]

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_rows([r.asDict() for r in batch_df.collect()])

        return fn
