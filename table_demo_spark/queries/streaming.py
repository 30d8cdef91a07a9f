"""Driver-facing streaming queries: run each continuous query over the
replay source to completion and return its final sink state as a
DataFrame.

These are the same operators as queries/reference.py executed through
the *streaming* path (replay source -> watermark -> stateful operator
-> upsert sink), so the oracle story is strong:

- Q1 (windowed agg, update mode): the upsert sink's final state equals
  the batch answer exactly -> reuses Q1's oracle, full hash check.
- Q3 (chained agg with retractions): the level-2 histogram's final
  state equals the batch histogram -> reuses Q3's oracle.
- Q2 (time-range over-window via applyInPandasWithState): append-mode
  emission is watermark-gated, so the final output is exactly the
  events with rowtime <= max(rowtime) - watermark_delay, each with its
  *complete* preceding-range count (disorder 60s < delay 61s guarantees
  completeness) -- deterministic and SQL-expressible, full hash check.

Replay pacing uses a very large speed factor so the whole fixture is
"due" within the first micro-batch trigger; correctness never depends
on pacing, only completion time does.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from table_demo_spark.queries import Query
from table_demo_spark.queries.llmops import M17_ORACLE as _M17_ORACLE
from table_demo_spark.queries.llmops import _heif_oracle as _heif_oracle_gen
from table_demo_spark.queries.llmops import _hevc_slice_oracle as _hevc_slice_oracle_gen
from table_demo_spark.queries.llmops import _m59_oracle as _m59_oracle_gen
from table_demo_spark.queries.analytics import A12_ORACLE as _A12_ORACLE
from table_demo_spark.queries.llmops import _m19_oracle

_M19_ORACLE = _m19_oracle()
from table_demo_spark.queries.llmops import S3_ORACLE as _S3_ORACLE
from table_demo_spark.queries.llmops import _m23_oracle

_M23_ORACLE = _m23_oracle()
from table_demo_spark.queries.reference import (
    _DEPARTURES_CTE,
    OVER_RANGE_MS,
    Q1_ORACLE,
    Q3_ORACLE,
    Q3_THRESHOLD,
)

DRIVER_SPEED = 5e8  # ~16 years of event time per wall-clock second
WATERMARK_MS = 61_000  # streaming/queries.py WATERMARK

# State partitions for the micro-batch stateful operators below. These
# drain a whole fixture in a couple of micro-batches, so per-partition
# state-store open/commit overhead dominates over parallelism — fewer,
# fatter state partitions win (measured at sf0.1: 32 -> 4 partitions cuts
# the full q1 drain from 8.2s to 5.3s). Round 3 re-A/B'd 4 vs 2 vs 1
# INTERLEAVED (sequential A/Bs drift): 2 and 4 are indistinguishable
# within the box's ±6% noise on q1/q2/q22, and the Python-stateful
# group (q3/q15/q16) leans toward 4 — keeping 4. A real cluster
# deployment sizes this to executor count instead; AQE cannot
# (streaming state partition count is fixed at the first checkpoint).
STATE_PARTITIONS = "4"


class _state_partitions:
    """Scope streaming-drain session confs around one run.

    ``no_data=False`` additionally disables no-data micro-batches for
    queries whose output emits within the data batch itself (the
    ``quiet_polls=1`` drains: update-mode aggregations, inner joins) —
    the trailing watermark-advance batch only performs state cleanup
    there, and skipping it saves ~0.5 s per drain (round-3 A/B:
    q1 3.3 -> 2.9 s). Watermark-GATED emission (append-mode timeouts,
    session close, outer-join null padding) MUST keep no-data batches:
    their output trails data by watermark advances."""

    def __init__(self, spark: SparkSession, no_data: bool = True):
        self._spark = spark
        self._no_data = no_data

    def __enter__(self):
        conf = self._spark.conf
        self._saved = conf.get("spark.sql.shuffle.partitions")
        conf.set("spark.sql.shuffle.partitions", STATE_PARTITIONS)
        self._saved_nd = conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
        if not self._no_data:
            conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    def __exit__(self, *exc):
        conf = self._spark.conf
        conf.set("spark.sql.shuffle.partitions", self._saved)
        conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", self._saved_nd
        )


# Transient executor/worker spawn failures at stream start: under heavy
# concurrent load a Python worker can fail to connect back before the
# stream has processed a single offset (observed once in the driver's
# 32-core concurrent run, CORRECTNESS_r04 stream_q7; reproduces green
# solo with identical code). At cluster scale transient worker/executor
# spawn failures are normal and the harness must absorb them: the
# *_final wrappers get ONE bounded retry — a full re-run of the wrapper
# body, which creates a fresh sink and a fresh checkpoint, so the retry
# is a from-scratch run, never a resume of partial state. The retry is
# deliberately narrow: only worker-connect failure signatures, and only
# when NO micro-batch committed (a failure after committed offsets may
# be a real defect and must surface).
_WORKER_CONNECT_MARKERS = (
    "Python worker failed to connect back",
    "Python worker exited unexpectedly",
)


class _TransientStreamStartError(RuntimeError):
    """A stream died with a worker-spawn signature before committing
    any micro-batch — a from-scratch retry is sound."""


def _raise_drain_failure(query, exc: Exception) -> None:
    """Re-raise ``exc`` as retryable iff it matches a worker-connect
    signature and the stream committed nothing."""
    msg = str(exc)
    if any(m in msg for m in _WORKER_CONNECT_MARKERS):
        try:
            committed = bool(query.recentProgress)
        except Exception:
            committed = True  # can't prove zero offsets -> don't retry
        if not committed:
            raise _TransientStreamStartError(msg) from exc
    raise exc


def _with_start_retry(fn):
    """Wrap a ``*_final`` driver query with one bounded from-scratch
    retry on :class:`_TransientStreamStartError` (see above)."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            return fn(spark, sf_dir)
        except _TransientStreamStartError:
            return fn(spark, sf_dir)

    return wrapper


def _drain(query, size_fn, quiet_polls: int = 4, timeout_s: float = 120.0):
    """Process all available data, then wait for watermark-driven
    no-data batches (event-time timeouts) to finish flushing.

    quiet_polls > 1 is only needed for watermark-GATED emission (append
    mode over stateful ops: q2's event-time timeouts, q4's session
    close) where output trails data by no-data watermark batches.
    Update-mode aggregations and inner stream-stream joins emit within
    the data batch itself — one confirming poll suffices.

    The quiesce criterion is (batchId, watermark, sink size) all stable
    across ``quiet_polls`` observations taken while no trigger is
    active: no-data batches fire engine-side on watermark advance, so
    the loop only *observes* (status + progress reads, no extra batch
    executions), and a poll taken mid-batch never counts toward
    stability — a slow flush batch can't be mistaken for quiescence."""
    try:
        query.processAllAvailable()
    except Exception as e:
        _raise_drain_failure(query, e)
    prev, stable, deadline = None, 0, time.time() + timeout_s
    while stable < quiet_polls and time.time() < deadline:
        if query.status.get("isTriggerActive") or query.status.get(
            "isDataAvailable"
        ):
            try:
                query.processAllAvailable()
            except Exception as e:
                _raise_drain_failure(query, e)
            stable, prev = 0, None
            continue
        lp = query.lastProgress or {}
        cur = (
            lp.get("batchId"),
            (lp.get("eventTime") or {}).get("watermark"),
            size_fn(),
        )
        stable = stable + 1 if cur == prev else 0
        prev = cur
        time.sleep(0.1)
    query.stop()


def _rows_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Materialize a small driver-side snapshot as a DataFrame via the
    Arrow path (pandas -> Arrow batches): one JVM-side conversion
    instead of 32 Python-worker pickle tasks — measured 4x faster per
    materialization (BASELINE.md round-3 A/B). Column names are parsed
    from the DDL schema string; the explicit schema governs dtypes."""
    import pandas as pd

    cols = [f.strip().split()[0] for f in schema.split(",")]
    pdf = pd.DataFrame(list(rows), columns=cols)
    # Scope the Arrow conf to this one conversion: the shared session
    # must not observe a leaked global (ADVICE r3) — every other query
    # in the run sees the caller's setting restored.
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        return spark.createDataFrame(pdf, schema=schema)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _parquet_sink(key_cols: tuple[str, ...]):
    """Durable upsert sink in a fresh temp dir — the driver-gated
    update/changelog streaming queries write through the
    production-shaped parquet MERGE target, never a driver-resident
    dict."""
    from table_demo_spark.scratch import scratch_dir
    from table_demo_spark.streaming.upsert import ParquetUpsertSink

    return ParquetUpsertSink(scratch_dir("tds-sink-"), key_cols)


def _append_sink():
    """Durable append sink = Spark's native parquet file sink in a
    fresh temp dir — for append-mode streams keys never update, so
    each micro-batch writes only its own files (no merge; the scale
    shape for unbounded appends)."""
    from table_demo_spark.scratch import scratch_dir
    from table_demo_spark.streaming.upsert import ParquetAppendSink

    return ParquetAppendSink(scratch_dir("tds-appsink-"))


def q1_stream_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q1_stream

    with _state_partitions(spark, no_data=False):
        sink, query = run_q1_stream(spark, sf_dir, speed=DRIVER_SPEED)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        F.col("cell").cast("int"),
        F.col("dept_time").cast("long"),
        F.col("dept_cnt").cast("long"),
    )


def q2_stream_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q2_stream

    sink = _append_sink()
    with _state_partitions(spark):
        _, query = run_q2_stream(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, sink.count)
    return sink.snapshot_df(spark).select(
        "cell", "ride_id", "rowtime_ms", "dept_cnt"
    )


def q3_stream_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q3_stream

    with _state_partitions(spark, no_data=False):
        sink, query = run_q3_stream(
            spark, sf_dir, speed=DRIVER_SPEED, threshold=Q3_THRESHOLD
        )
        _drain(query, lambda: sink.count(spark), quiet_polls=1)
    return sink.snapshot_df(spark).select("dept_cnt", "cnt_freq")


# Q2 streaming oracle: the watermark-passed prefix of the batch
# over-window result. Final watermark = max departure time - delay;
# emission condition is rowtime <= watermark (inclusive).
Q2_STREAM_ORACLE = f"""{_DEPARTURES_CTE},
counted AS (
  SELECT
    ride_id,
    cell,
    epoch_ms(rowtime) AS rowtime_ms,
    count(ride_id) OVER (
      PARTITION BY cell ORDER BY epoch_ms(rowtime)
      RANGE BETWEEN {OVER_RANGE_MS} PRECEDING AND CURRENT ROW
    ) AS dept_cnt
  FROM departures
)
SELECT cell, ride_id, rowtime_ms, dept_cnt
FROM counted
WHERE rowtime_ms <= (SELECT max(epoch_ms(rowtime)) FROM departures) - {WATERMARK_MS}
"""


def q4_session_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q4_session_stream

    sink = _append_sink()
    with _state_partitions(spark):
        _, query = q4_session_stream(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, sink.count)
    return sink.snapshot_df(spark).select("user_id", "session_start", "n_events")


# Session-window append emission: a session is final when the watermark
# passes its close (last event + gap). Verified empirically at sf0.001
# and sf0.01: emitted == {sessions: last_ms + gap <= max_ms - delay}.
_GAP_MS = 30 * 60_000
Q4_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= {_GAP_MS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
),
agg AS (
  SELECT user_id,
         epoch_ms(min(ts)) AS session_start,
         count(*) AS n_events,
         epoch_ms(max(ts)) AS last_ms
  FROM sessions
  GROUP BY user_id, session_no
)
SELECT user_id, session_start, n_events
FROM agg
WHERE last_ms + {_GAP_MS} <=
      (SELECT max(epoch_ms(ts)) FROM events) - {WATERMARK_MS}
"""


def q5_join_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q5_join_stream

    sink = _append_sink()
    with _state_partitions(spark, no_data=False):
        _, query = q5_join_stream(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "user_id", "click_id", "purchase_id", "click_ms", "purchase_ms"
    )


# Stream-stream inner join: every matching pair is emitted exactly
# once (the watermark only bounds state, not emission), so the final
# sink state is the full batch interval join.
_Q5_WITHIN_MS = 10 * 60_000
Q5_JOIN_ORACLE = f"""
SELECT
  c.user_id AS user_id,
  c.event_id AS click_id,
  p.event_id AS purchase_id,
  epoch_ms(c.ts) AS click_ms,
  epoch_ms(p.ts) AS purchase_ms
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND epoch_ms(p.ts) >= epoch_ms(c.ts)
 AND epoch_ms(p.ts) <= epoch_ms(c.ts) + {_Q5_WITHIN_MS}
"""


def q6_dedup_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q6_dedup_stream

    sink = _append_sink()
    with _state_partitions(spark, no_data=False):
        _, query = q6_dedup_stream(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select("user_id", "event_type")


# Streaming dedup projects only the key, so whichever duplicate wins
# the first-arrival race, the emitted row is identical -> plain
# DISTINCT is the exact oracle.
Q6_DEDUP_ORACLE = "SELECT DISTINCT user_id, event_type FROM events"


def q7_enrich_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q7_enrich_stream

    with _state_partitions(spark, no_data=False):
        sink, query = q7_enrich_stream(spark, sf_dir, speed=DRIVER_SPEED)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        F.col("c_mktsegment").cast("string"),
        F.col("n_events").cast("long"),
        F.col("revenue").cast("double"),
    )


Q7_ENRICH_ORACLE = """
SELECT
  c.c_mktsegment AS c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q8_retract_delete_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q8_retract_delete

    sink = _parquet_sink(("cell",))
    with _state_partitions(spark, no_data=False):
        _, query = run_q8_retract_delete(
            spark, sf_dir, speed=DRIVER_SPEED, limit=_Q8_LIMIT, sink=sink
        )
        _drain(query, lambda: sink.count(spark), quiet_polls=1)
    return sink.snapshot_df(spark).select("cell", "dept_cnt")


# Retract -> durable delete: final state = the gated aggregate, i.e.
# exactly the cells whose TOTAL count stayed within the limit — any
# cell that ever crossed it was deleted from the parquet sink by a 'D'
# changelog row. At sf0.01 per-cell counts span 17..43, so limit=30
# forces real deletions (~half the cells); a lingering deleted row or
# a lost delete both fail the hash.
_Q8_LIMIT = 30
Q8_RETRACT_DELETE_ORACLE = f"""{_DEPARTURES_CTE}
SELECT cell, CAST(count(*) AS BIGINT) AS dept_cnt
FROM departures
GROUP BY cell
HAVING count(*) <= {_Q8_LIMIT}
"""


def q9_debug_sink_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q9_debug_sink

    with _state_partitions(spark, no_data=False):
        sink, query = run_q9_debug_sink(spark, sf_dir, speed=DRIVER_SPEED)
        _drain(query, lambda: len(sink.log()), quiet_polls=1)
    assert len(sink.log()) >= len(sink.snapshot())  # every change logged
    return _rows_df(
        spark,
        sink.snapshot(),
        "event_type string, n_events long, revenue double",
    )


# Console/debug sink (K4): the last logged update per key of an
# update-mode aggregate equals the final aggregate.
Q9_DEBUG_ORACLE = """
SELECT
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM events
GROUP BY event_type
"""


def q10_ttl_expiry_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q10_ttl_expiry

    sink = _parquet_sink(("cell",))
    with _state_partitions(spark):
        _, query = run_q10_ttl_expiry(
            spark, sf_dir, speed=DRIVER_SPEED, ttl_ms=_Q10_TTL_MS, sink=sink
        )
        _drain(query, lambda: sink.count(spark))
    return sink.snapshot_df(spark).select("cell", "dept_cnt")


# Idle-state retention in event time (R16): a gap >= TTL resets the
# key's count (state expired between events -> recount, Flink
# withIdleStateRetentionTime semantics), and a key idle >= TTL at the
# final watermark has its result row deleted. Oracle: sessionize each
# cell with gap = TTL, keep the LAST session's count, drop cells whose
# last event is idle at the final watermark.
_Q10_TTL_MS = 48 * 3600_000
Q10_TTL_ORACLE = f"""{_DEPARTURES_CTE},
fin AS (
  SELECT max(epoch_ms(rowtime)) - {WATERMARK_MS} AS wm FROM departures
),
-- the operator only ever processes events at/below the final
-- watermark; the trailing {WATERMARK_MS} ms stay buffered forever
proc AS (
  SELECT cell, ride_id, rowtime FROM departures
  WHERE epoch_ms(rowtime) <= (SELECT wm FROM fin)
),
flagged AS (
  SELECT cell, ride_id, rowtime,
         CASE WHEN epoch_ms(rowtime) - epoch_ms(lag(rowtime) OVER w) >= {_Q10_TTL_MS}
              THEN 1 ELSE 0 END AS reset
  FROM proc
  WINDOW w AS (PARTITION BY cell ORDER BY rowtime, ride_id)
),
sess AS (
  SELECT cell, rowtime,
         sum(reset) OVER (PARTITION BY cell ORDER BY rowtime, ride_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
agg AS (
  SELECT cell, sid, CAST(count(*) AS BIGINT) AS dept_cnt,
         max(epoch_ms(rowtime)) AS last_ms
  FROM sess GROUP BY cell, sid
),
last AS (
  SELECT cell, dept_cnt, last_ms FROM agg
  QUALIFY row_number() OVER (PARTITION BY cell ORDER BY sid DESC) = 1
)
SELECT cell, dept_cnt FROM last
WHERE last_ms + {_Q10_TTL_MS} > (SELECT wm FROM fin)
"""


# Q11 oracle: Q1's tumbling count, but over the CSV-roundtripped data:
# coordinates are float32 (serialize/parse casts), which flips the
# floor() at the synthetic coordinates' exact cell boundaries, and
# rowtime is second-truncated (never crosses a 1-day window). The CTE
# mirrors exactly what the file-stream parser yields.
from table_demo_spark.queries.reference import (  # noqa: E402
    SQL_CELL,
    SQL_IN_NYC,
    TUMBLE_MS,
    _RIDES_CTE,
)

Q11_CSV_ORACLE = f"""{_RIDES_CTE},
csv_rides AS (
  SELECT ride_id, is_start,
         date_trunc('second', rowtime) AS rowtime,
         CAST(start_lon AS FLOAT) AS start_lon,
         CAST(start_lat AS FLOAT) AS start_lat
  FROM rides
),
departures AS (
  SELECT
    ride_id,
    {SQL_CELL.format(lon='start_lon', lat='start_lat')} AS cell,
    rowtime
  FROM csv_rides
  WHERE is_start AND {SQL_IN_NYC.format(lon='start_lon', lat='start_lat')}
)
SELECT
  cell,
  (epoch_ms(rowtime) // {TUMBLE_MS}) * {TUMBLE_MS} + {TUMBLE_MS} AS dept_time,
  count(ride_id) AS dept_cnt
FROM departures
GROUP BY cell, (epoch_ms(rowtime) // {TUMBLE_MS}) * {TUMBLE_MS} + {TUMBLE_MS}
"""


def q11_csv_stream_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.queries.streaming import _parquet_sink
    from table_demo_spark.streaming.queries import run_q11_csv_stream

    sink = _parquet_sink(("cell", "dept_time"))
    with _state_partitions(spark, no_data=False):
        _, query = run_q11_csv_stream(spark, sf_dir, sink=sink)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select("cell", "dept_time", "dept_cnt")


def q12_left_join_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q12_left_join_stream

    sink = _append_sink()
    with _state_partitions(spark):
        _, query = q12_left_join_stream(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, sink.count)
    out = sink.snapshot_df(spark)
    # Null purchase columns (expired unmatched clicks) -> -1 sentinels:
    # the driver's compare needs stable int64 dtype on both sides, and
    # nullable-long -> pandas would drift to float64/object.
    return out.select(
        "user_id",
        "click_id",
        F.coalesce(F.col("purchase_id"), F.lit(-1)).cast("long").alias("purchase_id"),
        "click_ms",
        F.coalesce(F.col("purchase_ms"), F.lit(-1)).cast("long").alias("purchase_ms"),
    )


# Left-outer stream-stream join: matches emit exactly once (as inner);
# an unmatched click emits with nulls only after the watermark passes
# the end of its match window (click_ms + within). Clicks in the
# trailing watermark horizon stay buffered forever — the oracle keeps
# matched pairs plus exactly the expired unmatched clicks. The query's
# event-time watermark is the MIN over its two inputs' watermarks, and
# each input sees only its own filtered sub-stream — so the final
# watermark is least(max click ts, max purchase ts) - delay, NOT the
# global max over all events.
Q12_LEFT_JOIN_ORACLE = f"""
WITH fin AS (
  SELECT least(
    (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'click'),
    (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'purchase')
  ) - {WATERMARK_MS} AS wm
),
c AS (SELECT event_id AS click_id, user_id, epoch_ms(ts) AS click_ms
      FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ms
      FROM events WHERE event_type = 'purchase'),
matched AS (
  SELECT c.user_id, c.click_id, p.purchase_id, c.click_ms, p.purchase_ms
  FROM c JOIN p ON c.user_id = p.user_id
   AND p.purchase_ms >= c.click_ms
   AND p.purchase_ms <= c.click_ms + {_Q5_WITHIN_MS}
)
SELECT user_id, click_id, purchase_id, click_ms, purchase_ms FROM matched
UNION ALL
SELECT c.user_id, c.click_id, CAST(-1 AS BIGINT) AS purchase_id,
       c.click_ms, CAST(-1 AS BIGINT) AS purchase_ms
FROM c
ANTI JOIN matched m ON c.click_id = m.click_id
WHERE c.click_ms + {_Q5_WITHIN_MS} < (SELECT wm FROM fin)
"""


def q13_sliding_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q13_sliding_stream

    sink = _parquet_sink(("event_type", "win_start"))
    with _state_partitions(spark, no_data=False):
        _, query = q13_sliding_stream(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, lambda: sink.count(spark), quiet_polls=1)
    return sink.snapshot_df(spark).select("event_type", "win_start", "n")


# Sliding-window update-mode agg: disorder (60s) < watermark delay
# (61s) means no window is ever resurrected after state eviction, so
# the final upsert state equals the batch hopping-window aggregate
# (same argument as q1; window family = an_a15's oracle shape grouped
# by event_type).
_Q13_DAY = 86_400_000
Q13_SLIDING_ORACLE = f"""
SELECT event_type, ws AS win_start, count(*) AS n
FROM (
  SELECT event_type, (epoch_ms(ts) // {_Q13_DAY} - off) * {_Q13_DAY} AS ws
  FROM events, (SELECT unnest([0, 1]) AS off)
)
GROUP BY event_type, ws
"""


def q14_topk_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q14_topk

    sink = _parquet_sink(("cell",))
    with _state_partitions(spark, no_data=False):
        _, query = run_q14_topk(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, lambda: sink.count(spark), quiet_polls=1)
    # read-path k-selection over the materialized view: TakeOrdered
    # (per-partition heap, k rows to the driver), never a global sort
    return (
        sink.snapshot_df(spark)
        .orderBy(F.col("dept_cnt").desc(), F.col("cell"))
        .limit(_Q14_K)
        .select("cell", "dept_cnt")
    )


# Continuous top-k: the upsert view's final state equals the batch
# per-cell count (q3-level-1 argument), so top-k over it equals batch
# top-k with the same (count desc, cell) tiebreak.
_Q14_K = 10
Q14_TOPK_ORACLE = f"""{_DEPARTURES_CTE}
SELECT cell, CAST(count(*) AS BIGINT) AS dept_cnt
FROM departures
GROUP BY cell
ORDER BY dept_cnt DESC, cell
LIMIT {_Q14_K}
"""


def q15_running_totals_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q15_running_totals

    sink = _parquet_sink(("user_id",))
    with _state_partitions(spark, no_data=False):
        _, query = run_q15_running_totals(
            spark, sf_dir, speed=DRIVER_SPEED, sink=sink
        )
        _drain(query, lambda: sink.count(spark), quiet_polls=1)
    return sink.snapshot_df(spark).select("user_id", "n_events", "sum_cents")


# transformWithState running totals: integer cents in state make the
# final per-user totals equal the batch aggregate exactly, independent
# of micro-batch slicing. round() on exact-2-decimal doubles is the
# same integer both engines.
Q15_TOTALS_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY user_id
"""


def q16_hll_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.sketch import hll_estimate
    from table_demo_spark.streaming.queries import run_q16_hll_sketch

    with _state_partitions(spark, no_data=False):
        sink, query = run_q16_hll_sketch(spark, sf_dir, speed=DRIVER_SPEED)
        _drain(query, lambda: sink.count(spark), quiet_polls=1)
    return hll_estimate(sink.snapshot_df(spark), ["event_type"]).select(
        "event_type", "n_registers", "est_distinct"
    )


def _q16_oracle() -> str:
    # The streamed sketch's registers are bit-identical to the batch
    # sketch's (max-merge is order/partition-invariant), so the oracle
    # is the batch HLL formula over the whole events table.
    from table_demo_spark.operators.sketch import (
        ALPHA_M2_SCALED,
        M_REGISTERS,
        RANK_CAP,
        VALUE_HEX,
    )

    full_rank = VALUE_HEX * 4 + 1
    return f"""
WITH v AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS tok FROM events
),
bits AS (
  SELECT event_type,
         CAST('0x' || substring(md5(tok), 1, 2) AS BIGINT) AS bucket,
         CAST('0x' || substring(md5(tok), 3, {VALUE_HEX}) AS BIGINT) AS val
  FROM v),
ranks AS (
  SELECT event_type, bucket,
         least(CASE WHEN val > 0 THEN {full_rank} - length(bin(val))
                    ELSE {RANK_CAP} END, {RANK_CAP}) AS rank
  FROM bits),
regs AS (SELECT event_type, bucket, max(rank) AS m_j
         FROM ranks GROUP BY 1, 2)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_registers,
       CAST({ALPHA_M2_SCALED!r} AS DOUBLE)
         / (sum(1::BIGINT << ({RANK_CAP} - m_j))
            + ({M_REGISTERS} - count(*)) * (1::BIGINT << {RANK_CAP}))
         AS est_distinct
FROM regs GROUP BY event_type
"""


def q17_fanout_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.sketch import hll_estimate
    from table_demo_spark.streaming.queries import run_q17_fanout

    with _state_partitions(spark, no_data=False):
        archive, sketch, query = run_q17_fanout(
            spark, sf_dir, speed=DRIVER_SPEED
        )
        _drain(query, lambda: archive.count(spark), quiet_polls=1)
    counts = (
        archive.snapshot_df(spark)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    est = hll_estimate(sketch.snapshot_df(spark), ["event_type"]).select(
        "event_type", "est_distinct"
    )
    return counts.join(est, "event_type").select(
        "event_type", "n_events", F.col("est_distinct").alias("est_users")
    )


def _q17_oracle() -> str:
    # archive count = plain per-type count; sketch estimate = the batch
    # HLL formula (register max-merge is partition-invariant)
    from table_demo_spark.operators.sketch import (
        ALPHA_M2_SCALED,
        M_REGISTERS,
        RANK_CAP,
        VALUE_HEX,
    )

    full_rank = VALUE_HEX * 4 + 1
    return f"""
WITH bits AS (
  SELECT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 2) AS BIGINT)
           AS bucket,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 3, {VALUE_HEX})
              AS BIGINT) AS val
  FROM events),
regs AS (
  SELECT event_type, bucket,
         max(least(CASE WHEN val > 0 THEN {full_rank} - length(bin(val))
                        ELSE {RANK_CAP} END, {RANK_CAP})) AS m_j
  FROM bits GROUP BY 1, 2),
est AS (
  SELECT event_type,
         CAST({ALPHA_M2_SCALED!r} AS DOUBLE)
           / (sum(1::BIGINT << ({RANK_CAP} - m_j))
              + ({M_REGISTERS} - count(*)) * (1::BIGINT << {RANK_CAP}))
           AS est_users
  FROM regs GROUP BY event_type),
cnt AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type)
SELECT event_type, n_events, est_users
FROM cnt JOIN est USING (event_type)
"""


def q18_cdc_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q18_cdc_apply

    with _state_partitions(spark, no_data=False):
        sink, query = run_q18_cdc_apply(spark, sf_dir, speed=DRIVER_SPEED)
        _drain(query, lambda: sink.count(spark), quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "user_id",
        "last_event_type",
        "value_cents",
        F.col("ts").alias("last_ts_ms"),
    )


# Version-merged CDC state is order-invariant, so the final table is
# exactly the batch "newest change per user" with deletes filtered.
Q18_CDC_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, value, epoch_ms(ts) AS ts_ms,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       event_type AS last_event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents,
       ts_ms AS last_ts_ms
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
"""


def q19_anti_join_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q19_anti_join_stream

    sink = _append_sink()
    with _state_partitions(spark):
        _, query = q19_anti_join_stream(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, sink.count)
    return sink.snapshot_df(spark).select("view_id", "user_id", "view_ms")


# Anti-join emission is watermark-gated: an unmatched view appears only
# after the watermark passes the end of its match window. Views still
# inside the trailing horizon stay buffered — the oracle keeps exactly
# the EXPIRED unmatched views. The join watermark is the min over the
# two filtered sub-streams (same rule as q12's oracle).
Q19_ANTI_JOIN_ORACLE = f"""
WITH fin AS (
  SELECT least(
    (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'view'),
    (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'purchase')
  ) - {WATERMARK_MS} AS wm
),
v AS (SELECT event_id AS view_id, user_id, epoch_ms(ts) AS view_ms
      FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, epoch_ms(ts) AS purchase_ms
      FROM events WHERE event_type = 'purchase'),
matched AS (
  SELECT DISTINCT v.view_id
  FROM v JOIN p ON v.user_id = p.user_id
   AND p.purchase_ms >= v.view_ms
   AND p.purchase_ms <= v.view_ms + {_Q5_WITHIN_MS}
)
SELECT v.view_id, v.user_id, v.view_ms
FROM v
ANTI JOIN matched m ON v.view_id = m.view_id
WHERE v.view_ms + {_Q5_WITHIN_MS} < (SELECT wm FROM fin)
"""


def q20_semi_join_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q20_semi_join_stream

    sink = _append_sink()
    with _state_partitions(spark):
        _, query = q20_semi_join_stream(spark, sf_dir, speed=DRIVER_SPEED, sink=sink)
        _drain(query, sink.count)
    return sink.snapshot_df(spark).select("view_id", "user_id", "view_ms")


# Semi-join emission is NOT watermark-gated: the left row emits the
# moment its first match arrives (and only once). A qualifying
# purchase always arrives while its view is still buffered — the view
# evicts only once wm > view_ms + within, and a purchase is at most
# the watermark delay late, so purchase_ms > wm at arrival while
# purchase_ms <= view_ms + within. Final state = exactly the distinct
# matched views, no expiry filter (contrast Q19's oracle).
Q20_SEMI_JOIN_ORACLE = f"""
WITH v AS (SELECT event_id AS view_id, user_id, epoch_ms(ts) AS view_ms
           FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, epoch_ms(ts) AS purchase_ms
      FROM events WHERE event_type = 'purchase')
SELECT DISTINCT v.view_id, v.user_id, v.view_ms
FROM v JOIN p ON v.user_id = p.user_id
 AND p.purchase_ms >= v.view_ms
 AND p.purchase_ms <= v.view_ms + {_Q5_WITHIN_MS}
"""


def q21_dead_letter_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import run_q21_dead_letter

    with _state_partitions(spark, no_data=False):
        counts, dlq, query = run_q21_dead_letter(spark, sf_dir)
        _drain(query, lambda: counts.count() + dlq.count(), quiet_polls=1)
    ok_rows = counts.snapshot_df(spark).select(
        F.lit("ok").alias("kind"),
        F.col("cell").cast("string").alias("key"),
        F.col("n").cast("long").alias("n"),
    )
    dlq_rows = (
        dlq.snapshot_df(spark)
        .groupBy("line")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("dlq").alias("kind"), F.col("line").alias("key"), "n")
    )
    return ok_rows.unionByName(dlq_rows)


def _q21_oracle() -> str:
    from table_demo_spark.sources.taxi_csv import DIRTY_MOD

    return f"""{_RIDES_CTE},
csv_rides AS (
  SELECT ride_id, is_start,
         CAST(start_lon AS FLOAT) AS start_lon,
         CAST(start_lat AS FLOAT) AS start_lat
  FROM rides
),
good AS (
  SELECT {SQL_CELL.format(lon='start_lon', lat='start_lat')} AS cell
  FROM csv_rides
  WHERE ride_id % {DIRTY_MOD} <> 0 AND is_start
    AND {SQL_IN_NYC.format(lon='start_lon', lat='start_lat')}
)
SELECT 'ok' AS kind, CAST(cell AS VARCHAR) AS key,
       CAST(count(*) AS BIGINT) AS n
FROM good GROUP BY cell
UNION ALL
SELECT 'dlq' AS kind, 'CORRUPT,' || CAST(ride_id AS VARCHAR) AS key,
       CAST(count(*) AS BIGINT) AS n
FROM rides WHERE ride_id % {DIRTY_MOD} = 0 GROUP BY ride_id
"""


def q22_full_outer_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.streaming.queries import q22_full_outer_join_stream

    sink = _append_sink()
    with _state_partitions(spark):
        _, query = q22_full_outer_join_stream(
            spark, sf_dir, speed=DRIVER_SPEED, sink=sink
        )
        _drain(query, sink.count)
    return sink.snapshot_df(spark).select(
        "user_id", "click_id", "purchase_id", "click_ms", "purchase_ms"
    )


# Full-outer emission: matches as inner; unmatched clicks flush when
# wm > click_ms + within (same as Q12's left rows); unmatched
# purchases flush when wm > purchase_ms (their match window closes at
# their own timestamp, since matching clicks satisfy click_ms in
# [purchase_ms - within, purchase_ms]). wm = min over the two filtered
# sub-streams' (max ts - delay), as in Q12/Q19.
Q22_FULL_OUTER_ORACLE = f"""
WITH fin AS (
  SELECT least(
    (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'click'),
    (SELECT max(epoch_ms(ts)) FROM events WHERE event_type = 'purchase')
  ) - {WATERMARK_MS} AS wm
),
c AS (SELECT event_id AS click_id, user_id, epoch_ms(ts) AS click_ms
      FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ms
      FROM events WHERE event_type = 'purchase'),
matched AS (
  SELECT c.user_id, c.click_id, p.purchase_id, c.click_ms, p.purchase_ms
  FROM c JOIN p ON c.user_id = p.user_id
   AND p.purchase_ms >= c.click_ms
   AND p.purchase_ms <= c.click_ms + {_Q5_WITHIN_MS}
)
SELECT user_id, click_id, purchase_id, click_ms, purchase_ms FROM matched
UNION ALL
SELECT c.user_id, c.click_id, CAST(-1 AS BIGINT), c.click_ms,
       CAST(-1 AS BIGINT)
FROM c ANTI JOIN matched m ON c.click_id = m.click_id
WHERE c.click_ms + {_Q5_WITHIN_MS} < (SELECT wm FROM fin)
UNION ALL
SELECT p.user_id, CAST(-1 AS BIGINT), p.purchase_id, CAST(-1 AS BIGINT),
       p.purchase_ms
FROM p ANTI JOIN matched m ON p.purchase_id = m.purchase_id
WHERE p.purchase_ms < (SELECT wm FROM fin)
"""


def q23_http_upsert_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 through a NETWORK-boundary sink: the ES-stub HTTP server +
    bulk upsert client (streaming/http_sink.py). Each micro-batch
    partition posts its own idempotent bulk request from the executor;
    the injected 503 on the first bulk request forces the retry path
    on the wire during the drain, and the final store must still equal
    the batch Q1 answer exactly (same oracle as stream_q1) — retry +
    replay convergence, verified by value hash, not argued."""
    from table_demo_spark.streaming.http_sink import EsStubServer, HttpUpsertSink
    from table_demo_spark.streaming.queries import (
        _checkpoint_dir,
        q1_stream,
        stream_departures,
        stream_rides,
    )

    server = EsStubServer()
    try:
        server.fail_next(1)  # first bulk POST 503s -> client must retry
        sink = HttpUpsertSink(server.url, ("cell", "dept_time"))
        ckpt = _checkpoint_dir()
        with _state_partitions(spark, no_data=False):
            out = q1_stream(
                stream_departures(
                    stream_rides(
                        spark, sf_dir, DRIVER_SPEED, frontier_key=ckpt
                    )
                )
            )
            query = (
                out.writeStream.outputMode("update")
                .option("checkpointLocation", ckpt)
                .foreachBatch(sink.foreach_batch())
                .start()
            )
            _drain(query, lambda: len(sink.snapshot()), quiet_polls=1)
        rows = sink.snapshot()
        assert server.request_count > server.applied_count  # retry happened
    finally:
        server.close()
    return _rows_df(
        spark, rows, "cell int, dept_time long, dept_cnt long"
    )


def q24_http_retract_delete_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8's retract->delete changelog through the NETWORK sink: 'D'
    rows become bulk delete actions on the wire
    (ElasticUpsertTableSink.scala:140-147 dispatch over a real
    socket), with an injected 503 forcing a retried bulk request mid-
    drain. Final store must equal the gated aggregate exactly — a
    lingering deleted key, a lost delete, or a double-applied replay
    all fail the hash (same oracle as stream_q8)."""
    from table_demo_spark.streaming.http_sink import EsStubServer, HttpUpsertSink
    from table_demo_spark.streaming.queries import run_q8_retract_delete

    server = EsStubServer()
    try:
        server.fail_next(1)
        sink = HttpUpsertSink(server.url, ("cell",))
        with _state_partitions(spark, no_data=False):
            _, query = run_q8_retract_delete(
                spark, sf_dir, speed=DRIVER_SPEED, limit=_Q8_LIMIT, sink=sink
            )
            _drain(query, lambda: len(sink.snapshot()), quiet_polls=1)
        rows = sink.snapshot()
        assert server.request_count > server.applied_count  # retry happened
    finally:
        server.close()
    return _rows_df(spark, rows, "cell int, dept_cnt long")


def _q25_oracle() -> str:
    # The streaming pipeline converges to batch d2's answer exactly.
    from table_demo_spark.queries.llmops import D2_ORACLE

    return D2_ORACLE


def q25_streaming_neardup_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous MinHash-LSH near-dup over crawl shards (streaming
    d2): row-local banded signatures -> durable BUCKETED band/shingle
    stores (per-batch probe shuffles only the batch, never the
    history) -> per-batch exact-Jaccard verify -> pair-keyed upsert
    sink. The final sink must equal batch d2 EXACTLY (same bands, same
    threshold) — arrival order never changes the answer, cross-band
    and replayed duplicate candidates converge by upsert idempotency.
    The 4-shard default run crosses the geometric size trigger
    (Q25_COMPACT_MIN_ROWS at sf0.01), so store compaction is
    driver-gated too; retention stays infinite here — that is what
    makes the final state equal batch d2 exactly."""
    from table_demo_spark.queries.llmops import JACCARD_THRESHOLD
    from table_demo_spark.streaming.queries import run_q25_streaming_neardup

    with _state_partitions(spark, no_data=False):
        sink, query, cleanup = run_q25_streaming_neardup(
            spark, sf_dir, threshold=JACCARD_THRESHOLD
        )
        try:
            _drain(query, lambda: sink.count(spark), quiet_polls=1)
        except BaseException:
            # A retried attempt builds fresh stores; drop this
            # attempt's catalog tables + scratch instead of orphaning
            # them for the session lifetime. Stop the query FIRST —
            # a failure raised from the polling loop (not the stream)
            # leaves it active, and dropping its stores under a live
            # foreachBatch would crash the stream instead of ending it.
            try:
                query.stop()
            except Exception:
                pass
            cleanup()
            raise
    out = sink.snapshot_df(spark).select("doc_a", "doc_b", "jaccard")
    cleanup()  # the sink snapshot is store-independent parquet
    return out


def q26_stream_tokenize_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous one-pass BPE tokenization of the crawl with an
    offline-learned vocabulary (streaming t28): merges learned batch-
    side on the deterministic hash sample, each micro-batch tokenized
    by a STATELESS Arrow-batched map — no state store, no watermark,
    O(batch) per trigger — into the native parquet append sink. Final
    sink contents = per-doc stats for the whole corpus, gated against
    the fully unrolled relational rewrite oracle."""
    from table_demo_spark.streaming.queries import run_q26_stream_tokenize

    sink = None
    with _state_partitions(spark, no_data=False):
        sink, query = run_q26_stream_tokenize(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "doc_id", "n_before", "n_after", "n_merged"
    )


def _q26_oracle() -> str:
    from table_demo_spark.operators.sampling import rate_threshold_hex
    from table_demo_spark.queries.llmops import _bpe_train_apply_oracle
    from table_demo_spark.streaming.queries import _Q26_ITERS

    predicate = (
        f"WHERE substr(md5(CAST(doc_id AS VARCHAR) || '#bpetrain'), 1, 6)"
        f" < '{rate_threshold_hex(0.25)}'"
    )
    return _bpe_train_apply_oracle(predicate, "", _Q26_ITERS)


def q28_media_decode_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous media decode (streaming m17): each arriving shard's
    documents get a real baseline-JFIF payload built and entropy-
    decoded to quantized-DC stats by the SAME stateless Arrow operator
    chain the batch query uses — no state store, no watermark,
    O(batch) per trigger, native parquet append sink. Final sink
    contents = batch m17 exactly (M17_ORACLE verbatim), so a doc
    dropped or decoded twice at a micro-batch boundary breaks the
    value hash."""
    from table_demo_spark.streaming.queries import run_q28_media_decode

    with _state_partitions(spark, no_data=False):
        sink, query = run_q28_media_decode(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "doc_id", "n_blocks", "dc_min", "dc_max", "dc_sum", "dc_checksum"
    )


def q43_avif_ingest_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous REAL-codec media decode (streaming m47): each
    arriving shard's documents get a genuine AVIF container encoded
    lossless by libaom and decoded back through dav1d — the
    third-party codec stack at ingest, by the SAME stateless Arrow
    chain the batch query uses.  No state store, no watermark,
    O(batch) per trigger; oracle = m47's source-plane restatement
    verbatim, so a doc dropped or decoded twice at a micro-batch
    boundary breaks the value hash."""
    from table_demo_spark.streaming.queries import run_q43_avif_ingest

    with _state_partitions(spark, no_data=False):
        sink, query = run_q43_avif_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "doc_id", "width", "height", "sum_y", "wsum_y",
        "sum_cb", "sum_cr", "wsum_c",
    ).orderBy("doc_id")


def q45_hevc_ingest_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous REAL-codec HEVC decode at ingest (streaming m55):
    each arriving shard's documents get a deblock-signalled x265
    encode, the from-spec decode + full 8.7.2 in-loop filter, and a
    per-pixel libde265 adjudication — the newest codec layer on the
    streaming path, by the SAME stateless Arrow chain the batch query
    uses.  No state store, no watermark, O(batch) per trigger; oracle
    = m55's restatement verbatim, so a doc dropped or decoded twice
    at a micro-batch boundary breaks the value hash.

    Scale contract: full-stream at fixture scale, SAMPLED AUDIT at
    production scale (the batch operator's fraction=1/k knob gives
    the deterministic doc_id-keyed subsample per micro-batch)."""
    from table_demo_spark.streaming.queries import run_q45_hevc_ingest

    with _state_partitions(spark, no_data=False):
        sink, query = run_q45_hevc_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "doc_id", "width", "height", "ctu", "qp", "slice_qp",
        "src_sum_y", "src_wsum_y", "src_sum_cb", "src_sum_cr",
        "exact_y", "exact_cb", "exact_cr",
    ).orderBy("doc_id")


def q46_bvideo_ingest_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous REAL-codec HEVC B-VIDEO decode at ingest (streaming
    m60): each arriving shard's documents get a fixed-IBBP
    temporal-MVP x265 encode, the from-spec inter decode
    (biprediction, combined merge candidates, TMVP via the DPB's
    16x16 motion summaries) and per-display-frame libde265
    adjudication — the newest codec layer on the streaming path, by
    the SAME stateless Arrow chain batch m60 uses.  No state store,
    no watermark, O(batch) per trigger; oracle = m60's restatement
    verbatim, so a doc dropped or decoded twice at a micro-batch
    boundary breaks the value hash.

    Scale contract: full-stream at fixture scale, SAMPLED AUDIT at
    production scale (the batch operator's fraction=1/k knob gives
    the deterministic doc_id-keyed subsample per micro-batch)."""
    from table_demo_spark.streaming.queries import run_q46_bvideo_ingest

    with _state_partitions(spark, no_data=False):
        sink, query = run_q46_bvideo_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "doc_id", "width", "height", "ctu", "qp", "n_frames",
        "n_b_frames", "mode", "slice_qp_i", "slice_qp_p", "slice_qp_b",
        "sum_y0", "wsum_y0", "sum_ylast", "wsum_ylast",
        "sum_cb0", "sum_cr0", "exact_y", "exact_cb", "exact_cr",
    ).orderBy("doc_id")


def q30_color_decode_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous COLOR media decode (streaming m19): arriving shards'
    documents get a real 3-component 4:2:0 JFIF payload built and
    entropy-decoded to per-component quantized-DC stats by the SAME
    stateless Arrow chain batch m19 uses — interleaved MCU walk,
    chroma tables, restart sync all on the streaming path. Final sink
    contents = batch m19 exactly (its oracle verbatim)."""
    from table_demo_spark.streaming.queries import run_q30_color_media_decode

    with _state_partitions(spark, no_data=False):
        sink, query = run_q30_color_media_decode(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "doc_id", "n_y_blocks", "n_c_blocks",
        "y_dc_sum", "y_dc_checksum",
        "cb_dc_sum", "cb_dc_checksum",
        "cr_dc_sum", "cr_dc_checksum",
    )


def q34_media_triage_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality STRUCTURE triage at ingest (streaming m29+m30):
    each arriving shard's documents get real MP3 frame sequences and
    H.264 Annex B streams built and header-walked in one stateless
    Arrow pass — frame-length arithmetic, start-code scan, and
    emulation-prevention unescaping all on the streaming path (the
    per-NAL signature XOR folds the unescaped bytes into the value
    hash). Final sink contents = the analytic per-doc combination of
    the m29 and m30 oracles, so a doc dropped or triaged twice at a
    micro-batch boundary breaks the hash."""
    from table_demo_spark.streaming.queries import run_q34_media_triage

    with _state_partitions(spark, no_data=False):
        sink, query = run_q34_media_triage(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "doc_id", "mp3_frames", "mp3_bytes", "mp3_kbps_max",
        "n_nals", "n_idr", "rbsp_bytes", "nal_sig_xor",
    )


def _q34_oracle() -> str:
    from table_demo_spark.operators import multimodal
    from table_demo_spark.operators.codecs import (
        MP3_BITRATES_KBPS,
        MP3_SAMPLERATES,
    )

    table = ", ".join(str(k) for k in MP3_BITRATES_KBPS[1:])
    sr = MP3_SAMPLERATES[multimodal.MP3_SR_INDEX]
    raw_hex = multimodal._H264_RAW * 2
    cut = multimodal._H264_MOTIF_AT * 2
    rbsp_len = multimodal._H264_RAW + 5
    n_idr = sum(1 for t in multimodal.H264_TYPES if t == 5)
    return f"""
WITH f AS (
  SELECT doc_id,
         list_extract([{table}],
                      CAST(1 + (doc_id * 7 + i * 3) % 14 AS INT)) AS kbps,
         (doc_id + i) % 2 AS pad
  FROM documents,
       (SELECT unnest(range(0, {multimodal.MP3_FRAMES})) AS i)
),
mp3 AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS mp3_frames,
         CAST(sum(144 * kbps * 1000 // {sr} + pad) AS BIGINT) AS mp3_bytes,
         CAST(max(kbps) AS BIGINT) AS mp3_kbps_max
  FROM f GROUP BY doc_id
),
blocks AS (
  SELECT doc_id, i,
         md5(CAST(doc_id AS VARCHAR) || '#h264' || i) AS h
  FROM documents,
       (SELECT unnest(range(0, {multimodal._H264_BLOCKS})) AS i)
),
hx AS (
  SELECT doc_id, string_agg(h, '' ORDER BY i) AS hx
  FROM blocks GROUP BY doc_id
),
nals AS (
  SELECT doc_id,
         substr(hx, CAST(i * {raw_hex} + 1 AS BIGINT), {cut})
           || '0000000001'
           || substr(hx, CAST(i * {raw_hex} + {cut} + 1 AS BIGINT),
                     {raw_hex - cut}) AS rbsp_hex
  FROM hx, (SELECT unnest(range(0, {multimodal.H264_NALS})) AS i)
),
h264 AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_nals,
         CAST({n_idr} AS BIGINT) AS n_idr,
         CAST(count(*) * {rbsp_len} AS BIGINT) AS rbsp_bytes,
         CAST(bit_xor(CAST('0x' || substr(md5(rbsp_hex), 1, 8) AS BIGINT))
              AS BIGINT) AS nal_sig_xor
  FROM nals GROUP BY doc_id
)
SELECT m.doc_id, m.mp3_frames, m.mp3_bytes, m.mp3_kbps_max,
       h.n_nals, h.n_idr, h.rbsp_bytes, h.nal_sig_xor
FROM mp3 m JOIN h264 h ON h.doc_id = m.doc_id
"""


def q35_graph_ingest_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained navigable ANN graph (streaming s18 —
    the third leg of the vector-store lifecycle after q29's routed
    ingest and q33's router retrain). The queryable result is the
    CURRENT graph: per-src top-M over the whole emission log
    (q35_final_edges). Because each batch scores exactly the pairs
    involving a new vector — arrivals toward everything seen, AND
    back-edges from already-ingested vectors toward arrivals in their
    probe buckets — that compaction equals llm_s18's batch-built edge
    set on the same corpus, so the oracle is the STATIC graph SQL: a
    vector dropped, duplicated, scored against the wrong prefix, or a
    missing back-edge breaks the value hash."""
    from table_demo_spark.streaming.queries import (
        q35_final_edges,
        run_q35_graph_ingest,
    )

    with _state_partitions(spark, no_data=False):
        sink, query = run_q35_graph_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return q35_final_edges(sink.snapshot_df(spark))


def _q35_oracle() -> str:
    from table_demo_spark.queries.llmops import _graph_edges_sql

    return f"""
WITH {_graph_edges_sql()}
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       CAST(rn AS BIGINT) AS rank
FROM edges
"""


def q36_graph_reshard_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_q35 with self-resharding (the r10 verdict's #4): the
    drain starts at the bucket count the FIRST batch justifies and,
    when the growing corpus outgrows it, opens a new generation —
    re-bucketing the whole stored corpus under the re-derived bit
    count and rebuilding the edge set at it — then continues
    incrementally. The sf0.01 drive crosses one reshard boundary
    (4 -> 5 bits at batch 2); the oracle is the STATIC s18 graph SQL
    at graph_bits(n_total, Q36_TARGET_BUCKET), so the query is green
    only if resharding PRESERVED the graph: a stale pre-reshard edge
    surviving compaction, a vector dropped in the re-bucket, or a
    post-reshard increment scored at the old bits breaks the hash."""
    from table_demo_spark.streaming.queries import (
        q36_final_edges,
        run_q36_graph_reshard,
    )

    with _state_partitions(spark, no_data=False):
        sink, query = run_q36_graph_reshard(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return q36_final_edges(spark, sink)


def _q36_oracle() -> str:
    from table_demo_spark.queries.llmops import _graph_edges_sql
    from table_demo_spark.streaming.queries import Q36_TARGET_BUCKET

    return f"""
WITH {_graph_edges_sql(target=Q36_TARGET_BUCKET)}
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       CAST(rn AS BIGINT) AS rank
FROM edges
"""


def q38_hnsw_ingest_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HNSW hierarchy maintained AT INGEST (r11 verdict #3):
    stream_q36's self-resharding machinery per layer — every arriving
    vector draws its s23 geometric layer and joins every graph at or
    below it, each layer an independent generation-aware store
    resharding at its own corpus-scaled bits. The oracle is s23's
    STATIC per-layer hierarchy SQL at the re-derived bit counts, so
    the query is green only if per-layer resharding preserved every
    layer's graph — a vector filed on the wrong layer, a stale
    pre-reshard edge, or an upper layer scored at layer-0's bits
    breaks the hash."""
    from table_demo_spark.streaming.queries import (
        q38_final_edges,
        run_q38_hnsw_ingest,
    )

    with _state_partitions(spark, no_data=False):
        sink, query = run_q38_hnsw_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return q38_final_edges(spark, sink)


def _q38_oracle() -> str:
    from table_demo_spark.queries.llmops import _graph_edges_sql
    from table_demo_spark.streaming.queries import Q36_TARGET_BUCKET

    lay_h = (
        "CAST('0x' || substring(md5('L' || CAST(vec_id AS VARCHAR)), 1, 8)"
        " AS BIGINT)"
    )
    member = {
        0: "TRUE",
        1: "vec_id IN (SELECT vec_id FROM lay WHERE lv >= 1)",
        2: "vec_id IN (SELECT vec_id FROM lay WHERE lv >= 2)",
    }
    chains = ",".join(
        _graph_edges_sql(
            target=Q36_TARGET_BUCKET, suffix=f"_l{lv}",
            member_sql=member[lv],
        )
        for lv in (0, 1, 2)
    )
    union = " UNION ALL ".join(
        f"SELECT CAST({lv} AS BIGINT) AS lv, CAST(src AS BIGINT) AS src,"
        f" CAST(dst AS BIGINT) AS dst, CAST(rn AS BIGINT) AS rank"
        f" FROM edges_l{lv}"
        for lv in (0, 1, 2)
    )
    return f"""
WITH lay AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN {lay_h} % 16 = 0 THEN 2
              WHEN {lay_h} % 4 = 0 THEN 1 ELSE 0 END AS lv
  FROM embeddings
),
{chains}
{union}
"""


def s25_serve_hnsw_ingested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serve leg over the INGESTED hierarchy — closing stream_q38
    into the lifecycle the way s22 closed q36: llm_s23's hierarchical
    descent (greedy top-layer hops, then the layer-0 beam) runs over
    stream_q38's per-layer max-generation edge stores, each of which
    was maintained — and possibly resharded — at ingest. The oracle
    is s23's full static hierarchy SQL at the re-derived bits, so the
    query is green only if build == maintain == per-layer reshard ==
    descend == serve on one hash chain."""
    from table_demo_spark.functions.vector import cosine
    from table_demo_spark.queries.llmops import (
        _S18_PROBE,
        _S23_HOPS,
        _S23_MAXL,
        _s23_layer_col,
        beam_walk,
    )
    from table_demo_spark.sources.batch import load_table
    from table_demo_spark.streaming.queries import (
        q38_final_edges,
        run_q38_hnsw_ingest,
    )

    with _state_partitions(spark, no_data=False):
        sink, query = run_q38_hnsw_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    store = q38_final_edges(spark, sink).persist()
    emb = load_table(spark, sf_dir, "embeddings")
    lay = emb.select("vec_id", "embedding", _s23_layer_col().alias("lv"))
    qv = emb.filter(F.col("vec_id") == _S18_PROBE).select(
        F.col("embedding").alias("qv")
    )

    def score(ids: list[int]) -> dict[int, float]:
        rows = (
            emb.filter(F.col("vec_id").isin(ids))
            .crossJoin(F.broadcast(qv))
            .select(
                "vec_id",
                F.round(cosine("embedding", "qv"), 9).alias("cos_sim"),
            )
            .collect()
        )
        return {int(r["vec_id"]): float(r["cos_sim"]) for r in rows}

    try:
        cur = int(
            lay.orderBy(F.col("lv").desc(), F.col("vec_id").asc())
            .limit(1).collect()[0]["vec_id"]
        )
        cur_cos = score([cur])[cur]
        for lvl in range(_S23_MAXL, 0, -1):
            edges_l = store.filter(F.col("lv") == lvl)
            nb = emb.select(
                F.col("vec_id").alias("nb_id"),
                F.col("embedding").alias("nb_vec"),
            )
            for _ in range(_S23_HOPS):
                rows = (
                    edges_l.filter(F.col("src") == cur)
                    .join(nb, nb["nb_id"] == F.col("dst"))
                    .crossJoin(F.broadcast(qv))
                    .select(
                        "nb_id",
                        F.round(cosine("nb_vec", "qv"), 9).alias("cos_sim"),
                    )
                    .collect()
                )
                pool = {int(r["nb_id"]): float(r["cos_sim"]) for r in rows}
                pool[cur] = cur_cos
                nxt, nxt_cos = sorted(
                    pool.items(), key=lambda kv: (-kv[1], kv[0])
                )[0]
                if nxt == cur:
                    break
                cur, cur_cos = nxt, nxt_cos
        return beam_walk(
            spark, emb,
            store.filter(F.col("lv") == 0).select("src", "dst"),
            entry=cur,
        )
    finally:
        store.unpersist()


def _s25_oracle() -> str:
    from table_demo_spark.queries.llmops import _s23_oracle
    from table_demo_spark.streaming.queries import Q36_TARGET_BUCKET

    return _s23_oracle(Q36_TARGET_BUCKET)


def q39_decontam_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at ingest (llm_p16's streaming leg): eval-set
    near-dup fingerprints built offline, every arriving batch's
    train docs band-probe the store and Jaccard-verify collisions,
    contaminated docs quarantined in-flight. The oracle is p16's
    batch SQL VERBATIM, so the query is green only if the streamed
    split equals the batch split doc-for-doc — streaming == batch
    decontamination on one hash chain."""
    from table_demo_spark.streaming.queries import run_q39_decontam_ingest

    with _state_partitions(spark, no_data=False):
        sink, query = run_q39_decontam_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select("doc_id", "split")


def _q39_oracle() -> str:
    from table_demo_spark.queries.llmops import _p16_oracle

    return _p16_oracle()


def q40_mixture_ingest_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling at ingest (llm_p17's streaming leg): the
    temperature manifest broadcasts into the stream and each batch
    keeps its deterministic-draw winners; the drained per-source
    aggregates merged with the manifest equal p17's batch output
    row-for-row (the draw is per-doc deterministic, so sharding
    cannot change the sample). Oracle = p17's SQL verbatim."""
    from table_demo_spark.streaming.queries import run_q40_mixture_ingest

    with _state_partitions(spark, no_data=False):
        sink, query = run_q40_mixture_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    agg = (
        sink.snapshot_df(spark)
        .groupBy("source")
        .agg(
            F.sum("n_sampled").alias("n_sampled"),
            F.sum("id_sum").alias("id_sum"),
        )
    )
    man = spark.read.parquet(sink.path.rstrip("/") + "-manifest")
    return (
        man.join(agg, "source", "left")
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.col("w").alias("weight"),
            "quota",
            "thresh",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("id_sum", F.lit(0)).alias("id_sum"),
        )
        .orderBy("source")
    )


def _q40_oracle() -> str:
    from table_demo_spark.queries.llmops import _p17_oracle

    return _p17_oracle()


def q41_pipeline_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED ingest pipeline: decontaminate -> mixture-sample
    -> tokenize -> compressed shards, all inside ONE foreachBatch
    (the four single-op ingest streams q39/q40/q26/q37 run as one
    crawl flow).  The result reads the compressed store BACK: per
    sampled doc, the BPE token stats plus the zstd-recovered text
    signature.  The oracle is the composed batch SQL — p16's split
    chain and p17's manifest thresholds select the kept docs INSIDE
    the unrolled BPE train->apply oracle's apply predicate, joined
    with the t35 text-signature restatement — so a doc kept by the
    wrong stage, tokenized with the wrong vocabulary, or compressed
    with the wrong source's dictionary breaks the value hash.  This
    pins operator COMPOSABILITY, which no single-op query does."""
    from table_demo_spark.operators import compress
    from table_demo_spark.streaming.queries import run_q41_pipeline_ingest

    with _state_partitions(spark, no_data=False):
        sink, query, dicts = run_q41_pipeline_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    snap = sink.snapshot_df(spark)
    dec = compress.decompress_stats(snap, dicts).select(
        "doc_id", "orig_bytes", "recovered_sig"
    )
    return (
        snap.select("doc_id", "n_before", "n_after", "n_merged")
        .join(dec, "doc_id")
        .orderBy("doc_id")
    )


def _q41_oracle() -> str:
    from table_demo_spark.operators.sampling import rate_threshold_hex
    from table_demo_spark.queries.llmops import (
        _bpe_train_apply_oracle,
        _p16_oracle,
        _p17_oracle,
    )

    train_where = (
        f"WHERE substr(md5(CAST(doc_id AS VARCHAR) || '#bpetrain'), 1, 6)"
        f" < '{rate_threshold_hex(0.25)}'"
    )
    # the composed keep-predicate: survived decontamination (p16's
    # split says 'train') AND won the deterministic mixture draw
    # (p17's per-source threshold) — both full oracle queries embed
    # as derived tables (DuckDB allows WITH inside subqueries)
    kept_where = f"""WHERE doc_id IN (
  SELECT d2.doc_id
  FROM documents d2
  JOIN ({_p16_oracle()}) s ON s.doc_id = d2.doc_id
  JOIN ({_p17_oracle()}) m ON m.source = d2.source
  WHERE s.split = 'train'
    AND CAST('0x' || substring(
          md5('mix' || CAST(d2.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        % 1048576 < m.thresh
)"""
    from table_demo_spark.streaming.queries import _Q26_ITERS

    bpe = _bpe_train_apply_oracle(train_where, kept_where, _Q26_ITERS)
    return f"""
SELECT b.doc_id, b.n_before, b.n_after, b.n_merged,
       CAST(strlen(d.text) AS BIGINT) AS orig_bytes,
       CAST('0x' || substring(md5(d.text), 1, 8) AS BIGINT)
         AS recovered_sig
FROM ({bpe}) b
JOIN documents d ON d.doc_id = b.doc_id
ORDER BY b.doc_id
"""


def s20_serve_ingested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVE leg of the vector-store lifecycle, closing its last
    seam: llm_s18's beam walk runs over the edge store stream_q35
    maintained incrementally at ingest — not over a batch-built graph.
    The oracle is llm_s18's full build+walk SQL, so the query is green
    only if the incrementally-maintained graph IS the batch graph
    (build ≡ maintain) and the walk over it returns the identical
    beam (≡ serve)."""
    from table_demo_spark.queries.llmops import beam_walk
    from table_demo_spark.sources.batch import load_table
    from table_demo_spark.streaming.queries import (
        q35_final_edges,
        run_q35_graph_ingest,
    )

    with _state_partitions(spark, no_data=False):
        sink, query = run_q35_graph_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    edges = q35_final_edges(sink.snapshot_df(spark)).select("src", "dst")
    emb = load_table(spark, sf_dir, "embeddings")
    return beam_walk(spark, emb, edges)


def _s20_oracle() -> str:
    from table_demo_spark.queries.llmops import _s18_oracle

    return _s18_oracle()


def s22_serve_resharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serve leg over the SELF-RESHARDED store — closing q36 into
    the lifecycle chain the way s20 closed q35: llm_s18's beam walk
    runs over stream_q36's max-generation edge store, whose drain
    crossed reshard boundaries mid-stream. The oracle is the full
    batch build+walk SQL at the re-derived bits, so the query is
    green only if build ≡ maintain ≡ RESHARD ≡ serve — an edge lost
    or duplicated across a generation boundary changes the beam."""
    from table_demo_spark.queries.llmops import beam_walk
    from table_demo_spark.sources.batch import load_table
    from table_demo_spark.streaming.queries import (
        q36_final_edges,
        run_q36_graph_reshard,
    )

    with _state_partitions(spark, no_data=False):
        sink, query = run_q36_graph_reshard(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    edges = q36_final_edges(spark, sink).select("src", "dst")
    emb = load_table(spark, sf_dir, "embeddings")
    return beam_walk(spark, emb, edges)


def _s22_oracle() -> str:
    from table_demo_spark.queries.llmops import _s18_oracle
    from table_demo_spark.streaming.queries import Q36_TARGET_BUCKET

    return _s18_oracle(target=Q36_TARGET_BUCKET)


def q37_dict_ingest_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-compressed shard store maintained at ingest (t35's
    streaming leg): per-source dictionaries train offline, the drain
    appends each arriving shard's documents as zstd frames, and the
    queryable result DECOMPRESSES the whole store back — oracle =
    llm_t35's (md5 of the recovered text per doc), so a frame written
    with the wrong source's dictionary, a truncated append, or a
    replay duplicate breaks the value hash."""
    from table_demo_spark.operators import compress
    from table_demo_spark.streaming.queries import run_q37_dict_ingest

    with _state_partitions(spark, no_data=False):
        sink, query, dicts = run_q37_dict_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return compress.decompress_stats(sink.snapshot_df(spark), dicts)


def _q37_oracle() -> str:
    from table_demo_spark.queries.llmops import T35_ORACLE

    return T35_ORACLE


def q31_temporal_enrich_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-table enrichment at ingest (streaming a12): each
    arriving purchase is enriched per micro-batch with the click
    version valid AS OF its own event time, by the UNCHANGED batch
    as-of operator against the offline-built versioned dimension.
    Final upsert state = the batch as-of join exactly (A12_ORACLE
    verbatim): an event enriched with a later-versioned click, dropped,
    or enriched twice breaks the value hash."""
    from table_demo_spark.streaming.queries import run_q31_temporal_enrich

    with _state_partitions(spark, no_data=False):
        sink, query = run_q31_temporal_enrich(
            spark, sf_dir, speed=DRIVER_SPEED
        )
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        "event_id", "user_id", "purchase_ms", "click_id", "click_ms"
    )


def q29_ann_index_ingest_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index maintained at ingest (streaming s3): arriving
    embeddings are routed into centroid-partitioned inverted lists by
    a stateless literal-centroid projection; after the drain the probe
    reads ONLY the probed centroids' partitions (IN-list directory
    pruning — the on-disk layout is the index) and exact-reranks.
    Result must equal batch llm_s3 exactly: a vector routed to the
    wrong list, dropped, or indexed twice breaks the value hash."""
    from table_demo_spark.operators import similarity
    from table_demo_spark.queries.llmops import ANN_K, N_QUERY_VECS
    from table_demo_spark.sources.batch import load_table
    from table_demo_spark.streaming.queries import run_q29_ann_index_ingest

    with _state_partitions(spark, no_data=False):
        sink, query, _ = run_q29_ann_index_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(
        F.col("vec_id") < similarity.N_CENTROIDS
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cent_vec"),
    )
    queries_df = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    # Route ONCE: the collected probe set (bounded: <= N_QUERY_VECS *
    # N_PROBE rows by construction) yields both the partition-pruning
    # IN-list and the probe relation the rerank joins against.
    routed = similarity.ivf_route(queries_df, centroids)
    probe_rows = routed.collect()
    probe_ids = sorted({r["centroid_id"] for r in probe_rows})
    probes = spark.createDataFrame(probe_rows, routed.schema)
    store = (
        sink.snapshot_df(spark)
        .filter(F.col("centroid_id").isin(probe_ids))
        .select(
            F.col("centroid_id").cast("long").alias("centroid_id"),
            "neighbor_id",
            "c_vec",
        )
    )
    return similarity.ivf_probe(
        store, queries_df, centroids, k=ANN_K, probes=probes
    )


def q27_available_now_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger.AvailableNow incremental batch: the per-(lang, source)
    corpus rollup runs as a self-terminating streaming invocation,
    then runs AGAIN from the same checkpoint — the production
    schedule-a-stream pattern. The second invocation sees no new files
    and must leave the keyed upsert sink byte-identical; the oracle is
    the plain batch GROUP BY, so any reprocessing (double counts) or
    offset loss (missing shards) breaks the value hash."""
    from table_demo_spark.streaming.queries import run_q27_available_now

    def await_done(query):
        try:
            done = query.awaitTermination(180)
        except Exception as e:
            _raise_drain_failure(query, e)
        if not done:  # still running: never reuse its checkpoint
            query.stop()
            raise TimeoutError(
                "AvailableNow invocation exceeded 180s before terminating"
            )

    with _state_partitions(spark, no_data=False):
        sink, query, ckpt = run_q27_available_now(spark, sf_dir)
        await_done(query)
        _, query2, _ = run_q27_available_now(
            spark, sf_dir, sink=sink, checkpoint=ckpt
        )
        await_done(query2)
    return sink.snapshot_df(spark).select(
        "lang", "source", "n_docs", "sum_chars"
    )



def q42_state_audit_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE AS A TABLE — Spark 4's State Data Source reader
    (``spark.read.format("statestore")``), the introspection surface
    for every stateful operator in this module: a native update-mode
    rollup over the doc shards is drained with AvailableNow (noop
    sink — the deliverable is the CHECKPOINT, not the output), then
    the state store itself is read back as a DataFrame and flattened.
    The oracle is the plain batch GROUP BY, so the hash pins that the
    committed state — key structs, internal sum/count buffers, across
    every state-store shuffle partition — is exactly the final
    aggregate: nothing leaked, nothing duplicated, no stale versions
    surfaced.  This is the audit a production TTL/retention story
    needs (inspect what the store holds WITHOUT replaying the query);
    r12 VERDICT #6 probed it as possibly OSS-gated — it is present
    and works in OSS Spark 4.1.2, including per-version TIME TRAVEL
    via option("batchId", k), pinned in tests: every committed state
    version equals the batch GROUP BY over exactly the shard prefix
    the checkpoint's offset log says that batch had consumed."""
    from table_demo_spark.streaming.queries import run_q42_state_rollup

    with _state_partitions(spark, no_data=False):
        query, ckpt = run_q42_state_rollup(spark, sf_dir)
        try:
            done = query.awaitTermination(180)
        except Exception as e:
            _raise_drain_failure(query, e)
        if not done:
            query.stop()
            raise TimeoutError(
                "AvailableNow invocation exceeded 180s before terminating"
            )
    state = spark.read.format("statestore").load(ckpt)
    # the value struct carries the INTERNAL aggregation buffer field
    # names (count/sum), not the query's output aliases — part of
    # what this audit documents about the state layout
    return state.select(
        F.col("key.lang").alias("lang"),
        F.col("key.source").alias("source"),
        F.col("value.count").cast("long").alias("n_docs"),
        F.col("value.sum").cast("long").alias("sum_chars"),
    ).orderBy("lang", "source")


Q42_STATE_AUDIT_ORACLE = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def q44_watermark_eviction_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE RETENTION ACROSS VERSIONS (r13 verdict #7) — q42's
    time-travel statestore reader composed with watermark eviction:
    an append-mode tumbling-window count with a 4-hour watermark
    drains over SIX chronological event shards (one per micro-batch,
    rank-split in event-time order so the batch -> time-range mapping
    is a pure function of the fixture), then EVERY committed state
    version is read back via option("batchId", v) and reduced to
    (how many windows the store holds, their total count, the oldest
    and newest open window).  The oracle restates the watermark
    recurrence analytically — wm_v = max event time of batches < v
    minus the delay, a window is held iff it has data in batches <= v
    and its END exceeds wm_v — so a store that leaks expired windows,
    evicts early, or resurrects a window on a later version breaks
    the hash at the exact version where it happened.  This is the
    retention audit q10's TTL query cannot perform: q10 checks final
    sink contents; q44 checks WHAT THE STORE HELD AT EVERY COMMIT.
    The per-version loop is bounded by the shard count (6 statestore
    reads of a few hundred rows — the documented bounded driver
    round-trip exception)."""
    import os

    from table_demo_spark.streaming.queries import (
        Q44_SHARDS,
        run_q44_watermark_rollup,
    )

    with _state_partitions(spark, no_data=False):
        query, ckpt = run_q44_watermark_rollup(spark, sf_dir)
        try:
            done = query.awaitTermination(180)
        except Exception as e:
            _raise_drain_failure(query, e)
        if not done:
            query.stop()
            raise TimeoutError(
                "AvailableNow invocation exceeded 180s before terminating"
            )
    commits = sorted(
        int(f)
        for f in os.listdir(os.path.join(ckpt, "commits"))
        if f.lstrip("-").isdigit() and int(f) >= 0
    )
    if len(commits) != Q44_SHARDS:
        raise RuntimeError(
            f"q44 expected {Q44_SHARDS} committed batches (one per "
            f"time shard, no-data batches disabled), got {commits}"
        )
    rows = []
    for v in commits:
        st = (
            spark.read.format("statestore")
            .option("batchId", v)
            .load(ckpt)
            .select(
                F.unix_millis(F.col("key.window.start")).alias("ws_ms"),
                F.col("value.count").cast("long").alias("cnt"),
            )
        )
        r = st.agg(
            F.count(F.lit(1)).cast("long").alias("n_open"),
            F.sum("cnt").cast("long").alias("sum_cnt"),
            F.min("ws_ms").cast("long").alias("oldest_open_ms"),
            F.max("ws_ms").cast("long").alias("newest_open_ms"),
        ).collect()[0]
        rows.append(
            (
                v,
                r["n_open"],
                r["sum_cnt"],
                r["oldest_open_ms"],
                r["newest_open_ms"],
            )
        )
    return spark.createDataFrame(
        rows,
        "version long, n_open long, sum_cnt long, "
        "oldest_open_ms long, newest_open_ms long",
    ).orderBy("version")


# The eviction predicate (window END strictly greater than the
# watermark survives) and the ms-floor watermark arithmetic are
# empirically pinned against the fixture in tests/test_streaming.py::
# test_q44_watermark_eviction_audit_semantics; an exact wm ==
# window-end collision cannot occur on these fixtures (microsecond-
# noise timestamps — asserted there per shard, not assumed).
# Generated from the runner's own constants (same-constants
# discipline, r14 ADVICE): shard count, window size, and watermark
# delay all come from streaming/queries.py — changing any of them
# re-derives BOTH sides.
from table_demo_spark.streaming.queries import (  # noqa: E402
    Q44_DELAY_MS as _Q44_DELAY_MS,
    Q44_SHARDS as _Q44_SHARDS,
    Q44_WINDOW_MS as _Q44_WIN_MS,
)

Q44_WATERMARK_EVICTION_ORACLE = f"""
WITH ranked AS (
  SELECT ts, row_number() OVER (ORDER BY ts, event_id) AS rn,
         count(*) OVER () AS n
  FROM events
),
sharded AS MATERIALIZED (
  SELECT ts,
         CAST((rn - 1) // ((n + {_Q44_SHARDS - 1}) // {_Q44_SHARDS})
              AS BIGINT) AS shard
  FROM ranked
),
wins AS MATERIALIZED (
  SELECT shard,
         (epoch_ns(ts) // 1000000) // {_Q44_WIN_MS} * {_Q44_WIN_MS}
           AS wstart_ms,
         count(*) AS cnt
  FROM sharded GROUP BY 1, 2
),
wm AS (
  SELECT v.v,
         coalesce(
           (SELECT max(epoch_ns(s.ts) // 1000000)
            FROM sharded s WHERE s.shard < v.v) - {_Q44_DELAY_MS},
           -1) AS wm_ms
  FROM (SELECT unnest(range(0, {_Q44_SHARDS})) AS v) v
),
state AS (
  SELECT wm.v, w.wstart_ms, sum(w.cnt) AS cnt
  FROM wm JOIN wins w ON w.shard <= wm.v
  WHERE w.wstart_ms + {_Q44_WIN_MS} > wm.wm_ms
  GROUP BY wm.v, w.wstart_ms
)
SELECT v AS version,
       CAST(count(*) AS BIGINT) AS n_open,
       CAST(sum(cnt) AS BIGINT) AS sum_cnt,
       CAST(min(wstart_ms) AS BIGINT) AS oldest_open_ms,
       CAST(max(wstart_ms) AS BIGINT) AS newest_open_ms
FROM state
GROUP BY v
ORDER BY v
"""


def q33_centroid_drift_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN ingest with centroid DRIFT (q29 production-shaped): the
    first half of the corpus routes with the stream-start centroids
    (gen 0); the sink then retrains — one rounded Lloyd step over its
    OWN gen-0 inverted lists — and the second half re-routes against
    the new matrix (gen 1). Final state = the full routing table; the
    oracle restates both generations analytically (the s14
    literal-centroid trick, chained: cent1 is SQL-stated as the
    rounded per-cluster means of the cent0 assignment over the first
    half). A row routed with the wrong generation's centroids,
    retrained from the wrong subset, or double-written on a replayed
    batch breaks the value hash."""
    from table_demo_spark.streaming.queries import run_q33_centroid_drift

    with _state_partitions(spark, no_data=False):
        sink, query = run_q33_centroid_drift(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return sink.snapshot_df(spark).select(
        F.col("neighbor_id").cast("long").alias("vec_id"),
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.col("gen").cast("long").alias("gen"),
    )


def _q33_oracle() -> str:
    from table_demo_spark.operators import similarity
    from table_demo_spark.queries.llmops import _sql_cosine

    k, dim = similarity.N_CENTROIDS, similarity.DIM
    return f"""
WITH cent0 AS (
  SELECT vec_id AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id < {k}
),
bound AS (
  -- rank-based half split (vec_ids need not be dense): the max id
  -- among the first 2*ceil(N/4) ids in ascending order
  SELECT max(vec_id) AS hv FROM (
    SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
    FROM embeddings
  ) WHERE rn <= 2 * ((SELECT (count(*) + 3) // 4 FROM embeddings))
),
a0 AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_sql_cosine('e.embedding', 'c.cv')} DESC,
                      c.cid ASC) AS rk
    FROM embeddings e CROSS JOIN cent0 c
    WHERE e.vec_id <= (SELECT hv FROM bound)
  ) WHERE rk = 1
),
m AS (
  SELECT cid, d,
         round(avg(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE)), 6) AS v
  FROM a0 CROSS JOIN (SELECT unnest(range(0, {dim})) AS d)
  GROUP BY cid, d
),
cent1 AS (
  SELECT c0.cid, coalesce(m1.cv, c0.cv) AS cv
  FROM cent0 c0 LEFT JOIN (
    SELECT cid, list(v ORDER BY d) AS cv FROM m GROUP BY cid
  ) m1 ON c0.cid = m1.cid
),
a1 AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_sql_cosine('e.embedding', 'c.cv')} DESC,
                      c.cid ASC) AS rk
    FROM embeddings e CROSS JOIN cent1 c
    WHERE e.vec_id > (SELECT hv FROM bound)
  ) WHERE rk = 1
)
SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id,
       CAST(0 AS BIGINT) AS gen
FROM a0
UNION ALL
SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id,
       CAST(1 AS BIGINT) AS gen
FROM a1
"""


def q32_phash_index_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image-dedup index maintained at ingest
    (streaming m23): arriving documents' PNG variants are decoded and
    aHashed by the SAME stateless Arrow chain batch m23 uses, the
    (img_key, bands) rows append to the store, and the post-drain
    probe runs the UNCHANGED banded-Hamming join over the store.
    Result must equal batch llm_m23 exactly (its oracle verbatim) —
    an image hashed twice, dropped at a micro-batch boundary, or
    banded differently on the stream breaks the value hash."""
    from table_demo_spark.queries.llmops import phash_pairs
    from table_demo_spark.streaming.queries import run_q32_phash_ingest

    with _state_partitions(spark, no_data=False):
        sink, query = run_q32_phash_ingest(spark, sf_dir)
        _drain(query, sink.count, quiet_polls=1)
    return phash_pairs(sink.snapshot_df(spark)).select(
        "a_key", "b_key", "hamming"
    )


Q27_AVAILABLE_NOW_ORACLE = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang, source
"""


QUERIES: list[Query] = [
    Query("stream_q1_tumble_upsert", q1_stream_final, Q1_ORACLE),
    Query("stream_q2_over_range", q2_stream_final, Q2_STREAM_ORACLE),
    Query("stream_q3_chained_agg", q3_stream_final, Q3_ORACLE),
    Query("stream_q4_session_window", q4_session_final, Q4_SESSION_ORACLE),
    Query("stream_q5_interval_join", q5_join_final, Q5_JOIN_ORACLE),
    Query("stream_q6_dedup", q6_dedup_final, Q6_DEDUP_ORACLE),
    Query("stream_q7_enrich_agg", q7_enrich_final, Q7_ENRICH_ORACLE),
    Query("stream_q8_retract_delete", q8_retract_delete_final, Q8_RETRACT_DELETE_ORACLE),
    Query("stream_q9_debug_sink", q9_debug_sink_final, Q9_DEBUG_ORACLE),
    Query("stream_q10_ttl_expiry", q10_ttl_expiry_final, Q10_TTL_ORACLE),
    Query("stream_q11_csv_gzip_source", q11_csv_stream_final, Q11_CSV_ORACLE),
    Query("stream_q12_left_outer_join", q12_left_join_final, Q12_LEFT_JOIN_ORACLE),
    Query("stream_q13_sliding_window", q13_sliding_final, Q13_SLIDING_ORACLE),
    Query("stream_q14_topk", q14_topk_final, Q14_TOPK_ORACLE),
    Query("stream_q15_running_totals", q15_running_totals_final, Q15_TOTALS_ORACLE),
    Query("stream_q16_hll_distinct", q16_hll_final, _q16_oracle()),
    Query("stream_q17_fanout", q17_fanout_final, _q17_oracle()),
    Query("stream_q18_cdc_apply", q18_cdc_final, Q18_CDC_ORACLE),
    Query("stream_q19_anti_join", q19_anti_join_final, Q19_ANTI_JOIN_ORACLE),
    Query("stream_q20_semi_join", q20_semi_join_final, Q20_SEMI_JOIN_ORACLE),
    Query("stream_q21_dead_letter", q21_dead_letter_final, _q21_oracle()),
    Query("stream_q22_full_outer_join", q22_full_outer_final, Q22_FULL_OUTER_ORACLE),
    Query("stream_q23_http_upsert", q23_http_upsert_final, Q1_ORACLE),
    Query(
        "stream_q24_http_retract_delete",
        q24_http_retract_delete_final,
        Q8_RETRACT_DELETE_ORACLE,
    ),
    Query(
        "stream_q25_streaming_neardup",
        q25_streaming_neardup_final,
        _q25_oracle(),
    ),
    Query("stream_q26_stream_tokenize", q26_stream_tokenize_final, _q26_oracle()),
    Query(
        "stream_q27_available_now",
        q27_available_now_final,
        Q27_AVAILABLE_NOW_ORACLE,
    ),
    Query("stream_q28_media_decode", q28_media_decode_final, _M17_ORACLE),
    Query("stream_q29_ann_index_ingest", q29_ann_index_ingest_final, _S3_ORACLE),
    Query("stream_q30_color_decode", q30_color_decode_final, _M19_ORACLE),
    Query("stream_q31_temporal_enrich", q31_temporal_enrich_final, _A12_ORACLE),
    Query("stream_q32_phash_index_ingest", q32_phash_index_final, _M23_ORACLE),
    Query("stream_q33_centroid_drift", q33_centroid_drift_final, _q33_oracle()),
    Query("stream_q34_media_triage", q34_media_triage_final, _q34_oracle()),
    Query("stream_q35_graph_ingest", q35_graph_ingest_final, _q35_oracle()),
    Query("stream_q36_graph_reshard", q36_graph_reshard_final, _q36_oracle()),
    Query("stream_q38_hnsw_ingest", q38_hnsw_ingest_final, _q38_oracle()),
    Query("llm_s25_serve_hnsw_ingested", s25_serve_hnsw_ingested, _s25_oracle()),
    Query("stream_q39_decontam_ingest", q39_decontam_final, _q39_oracle()),
    Query("stream_q40_mixture_ingest", q40_mixture_ingest_final, _q40_oracle()),
    Query("stream_q37_dict_ingest", q37_dict_ingest_final, _q37_oracle()),
    Query("stream_q41_pipeline_ingest", q41_pipeline_final, _q41_oracle()),
    Query("stream_q42_state_audit", q42_state_audit_final, Q42_STATE_AUDIT_ORACLE),
    Query(
        "stream_q44_watermark_eviction",
        q44_watermark_eviction_final,
        Q44_WATERMARK_EVICTION_ORACLE,
    ),
    Query("stream_q43_avif_ingest", q43_avif_ingest_final, _heif_oracle_gen("#avif")),
    Query(
        "stream_q45_hevc_ingest",
        q45_hevc_ingest_final,
        _hevc_slice_oracle_gen("#m55h", "#m55p"),
    ),
    Query(
        "stream_q46_bvideo_ingest",
        q46_bvideo_ingest_final,
        _m59_oracle_gen("#m60h", "#m60p"),
    ),
    Query("llm_s20_serve_ingested", s20_serve_ingested, _s20_oracle()),
    Query("llm_s22_serve_resharded", s22_serve_resharded, _s22_oracle()),
]

# Every stream wrapper gets the bounded worker-spawn retry (fresh
# sink + fresh checkpoint per attempt; see _with_start_retry).
QUERIES = [q._replace(spark_fn=_with_start_retry(q.spark_fn)) for q in QUERIES]
