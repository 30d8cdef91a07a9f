"""Event-replay streaming source — the Spark-native port of
``TaxiRideSource.java``.

Reference semantics reproduced (file:line cites into /root/reference):
- events served in event-time order, re-ordered by a bounded random
  delay (truncated Gaussian, mean maxDelay/2, seeded —
  TaxiRideSource.java:126,230-237): we pre-compute a seeded per-row
  delay and sort by delayed *emit time*, exactly the reference's
  PriorityQueue-on-emit-time behavior (:127-134,163-213).
- wall-clock pacing at a serving-speed factor (:216-219): offsets
  advance with real elapsed time * serving_speed.
- watermarking is NOT re-implemented in the source: Spark's
  ``withWatermark`` supplies the bounded-out-of-orderness watermark
  the reference emitted by hand (:102,150,210).

Implementation: Spark 4 Python Data Source API (``DataSource`` +
``DataSourceStreamReader``). The fixture file is loaded once on the
driver and offsets index into the emit-ordered rows; ``read(part)``
slices that order. For production scale the same class would map
offsets to (file, row-group) ranges instead of a driver-resident
table — the offset/partition protocol is identical.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


def gaussian_delays_ms(n: int, max_delay_ms: int, seed: int) -> list[int]:
    """Truncated-Gaussian per-event delay in [0, max_delay_ms] — the
    reference's getNormalDelayMsecs (TaxiRideSource.java:230-237):
    ``rand.nextGaussian() * x + x`` with ``x = maxDelayMsecs / 2``,
    i.e. mean max/2 AND std max/2, resampling until in range."""
    rnd = random.Random(seed)
    out = []
    x = max_delay_ms / 2
    std = max_delay_ms / 2
    for _ in range(n):
        while True:
            d = rnd.gauss(x, std)
            if 0 <= d <= max_delay_ms:
                out.append(int(d))
                break
    return out


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


# Replay-frontier persistence, keyed by the options that fix the emit
# order. A reader restarted from a checkpoint must RESUME the replay
# frontier where its predecessor left off: a fresh wall clock would
# re-traverse [t0, K) and report latestOffset below the committed offset
# K for a while, during which the engine sees "no new data" —
# processAllAvailable() returns early and the stream tail is silently
# never processed. The reader lives in a dedicated Python worker process
# (python_streaming_source_runner) that dies with the query, so the
# frontier must survive OUTSIDE that process: a small file on the driver
# host (where the stream-reader worker always runs). Fresh queries reset
# it — the engine calls initialOffset() only when there is no checkpoint,
# which is exactly the fresh/restart discriminator.


def _frontier_path(key: tuple) -> str:
    import hashlib
    import os
    import tempfile

    digest = hashlib.md5(repr(key).encode()).hexdigest()[:16]
    return os.path.join(
        tempfile.gettempdir(), f"replay-frontier-{os.getuid()}-{digest}"
    )


def _frontier_read(key: tuple) -> int:
    try:
        with open(_frontier_path(key)) as f:
            return int(f.read().strip() or 0)
    except (OSError, ValueError):
        return 0


def _frontier_write(key: tuple, idx: int) -> None:
    import os
    import tempfile

    path = _frontier_path(key)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    try:
        with os.fdopen(fd, "w") as f:
            f.write(str(idx))
        os.replace(tmp, path)  # atomic: concurrent readers never see torn writes
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass


class ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        import time

        import pyarrow.parquet as pq

        self._path = options["path"]
        self._time_col = options.get("timecol", "ts")
        self._speed = float(options.get("speed", 600.0))
        self._max_delay_ms = int(options.get("maxdelayms", 60_000))
        self._seed = int(options.get("seed", 7452))
        self._n_parts = int(options.get("numpartitions", 8))
        # Per-query discriminator for the persisted frontier (callers
        # pass their checkpoint dir): without it, two concurrent queries
        # with identical options would share — and corrupt — one
        # frontier file (a fresh query's initialOffset() reset would
        # rewind a running query's pacing clock).
        self._frontier_key = options.get("frontierkey", "")

        tbl = pq.read_table(self._path)
        df = tbl.to_pandas()
        # normalize every datetime column to epoch-ms int64 (matches the
        # long columns the schema() declares for timestamps)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[ns]").astype("int64") // 1_000_000
        ts_ms = df[self._time_col].to_numpy()
        delays = gaussian_delays_ms(len(df), self._max_delay_ms, self._seed)
        emit_ms = ts_ms + delays
        order = emit_ms.argsort(kind="stable")
        import pyarrow as pa

        # emit-ordered Arrow table: read() slices it zero-copy and
        # yields RecordBatches (the vectorized data-source path) —
        # row-at-a-time tuple yielding measured ~4x slower end-to-end
        self._arrow = pa.Table.from_pandas(
            df.iloc[order].reset_index(drop=True), preserve_index=False
        )
        self._emit_ms = emit_ms[order]
        self._wall_start = time.time()
        self._clock_key = (
            self._path, self._time_col, self._max_delay_ms, self._seed,
            self._frontier_key,
        )
        # assume restart-resume until initialOffset() proves fresh start
        self._base_idx = min(_frontier_read(self._clock_key), len(self._emit_ms))
        self._seen_hi = 0  # highest offset the engine has shown us (WAL)

    def _advance_frontier(self, idx: int) -> None:
        if idx > _frontier_read(self._clock_key):
            _frontier_write(self._clock_key, idx)

    def initialOffset(self) -> dict:
        # fresh query (no checkpoint): replay — and pace — from the start
        self._base_idx = 0
        _frontier_write(self._clock_key, 0)
        return {"idx": 0}

    def latestOffset(self) -> dict:
        import time

        import numpy as np

        if len(self._emit_ms) == 0:
            return {"idx": 0}
        # anchor the clock at the first unserved row's emit time, so the
        # row at _base_idx becomes available immediately (frontier is
        # inclusive via side="right") — on restart this makes progress
        # visible to the engine at once instead of after a catch-up lag
        anchor = int(self._emit_ms[min(self._base_idx, len(self._emit_ms) - 1)])
        elapsed_ms = (time.time() - self._wall_start) * 1000.0
        frontier = anchor + elapsed_ms * self._speed
        # all rows whose (delayed) emit time has been reached
        idx = int(np.searchsorted(self._emit_ms, frontier, side="right"))
        idx = max(idx, self._base_idx, self._seen_hi)
        self._advance_frontier(idx)
        return {"idx": idx}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["idx"], end["idx"]
        self._seen_hi = max(self._seen_hi, lo, hi)
        self._advance_frontier(self._seen_hi)
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        n = min(self._n_parts, hi - lo)
        step = math.ceil((hi - lo) / n)
        return [
            _RangePartition(i, min(i + step, hi)) for i in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        chunk = self._arrow.slice(
            partition.start, partition.end - partition.start
        )
        yield from chunk.to_batches(max_chunksize=20_000)

    def commit(self, end: dict) -> None:
        self._seen_hi = max(self._seen_hi, end["idx"])
        self._advance_frontier(self._seen_hi)


class ReplayDataSource(DataSource):
    """spark.readStream.format("replay").option("path", ...) source."""

    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        # Derive the Spark schema from the parquet footer; timestamps
        # surface as epoch-ms longs (the reader emits pandas rows whose
        # datetime64 values Spark would coerce ambiguously — explicit
        # ms keeps the contract engine-neutral; downstream converts via
        # timestamp_millis()).
        schema = pq.read_schema(self.options["path"])
        fields = []
        for f in schema:
            t = str(f.type)
            if t.startswith("timestamp"):
                spark_t = "long"
            else:
                spark_t = {
                    "int64": "long",
                    "int32": "int",
                    "double": "double",
                    "float": "float",
                    "string": "string",
                    "large_string": "string",
                    "bool": "boolean",
                }.get(t, "string")
            fields.append(f"{f.name} {spark_t}")
        return ", ".join(fields)

    def streamReader(self, schema: StructType) -> ReplayStreamReader:
        return ReplayStreamReader(schema, dict(self.options))


def register_replay_source(spark) -> None:
    spark.dataSource.register(ReplayDataSource)
