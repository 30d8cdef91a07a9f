"""Output-mode and upsert-key inference.

The reference's planner probes the sink to decide append-vs-upsert and
derives the upsert key from the query's GROUP BY
(``ElasticUpsertTableSink.setIsAppendOnly`` :86, ``setKeyFields``
:51-55; SURVEY §1.4). Catalyst/Structured Streaming has no such
planner feature — the user picks an outputMode — so the engine
re-derives both here by walking the analyzed logical plan:

- topmost streaming ``Aggregate`` -> upsert keys = its grouping
  columns; mode = ``update`` (continuous upsert), unless every
  grouping expression set includes the event-time window (then the
  result is append-only once the watermark passes, the reference's
  append fast path).
- no aggregate -> append-only, no key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class ContinuousPlan:
    is_append_only: bool
    upsert_keys: tuple[str, ...]

    @property
    def output_mode(self) -> str:
        return "append" if self.is_append_only else "update"


def _analyzed_plan(df: DataFrame):
    return df._jdf.queryExecution().analyzed()


def _is_event_time_window(expr) -> bool:
    """True iff a grouping expression is Catalyst's generated event-time
    window: the TimeWindow/SessionWindow node itself, or the attribute
    the TimeWindowing rule emits — named exactly ``window`` /
    ``session_window`` AND typed struct<start:timestamp,end:timestamp>.
    (A user column that merely *contains* 'window' in its name — e.g.
    ``window_type`` — must NOT match: misclassifying it would pick
    append mode for a continuously-updating aggregate and the upsert
    sink would miss every later update.)"""
    cls = expr.getClass().getSimpleName()
    if cls in ("TimeWindow", "SessionWindow"):
        return True
    name = str(expr.sql()).strip("`").split(".")[-1].strip("`")
    if name not in ("window", "session_window"):
        return False
    try:
        dt = expr.dataType().simpleString()
    except Exception:
        return False
    return dt.startswith("struct<start:timestamp,end:timestamp")


def _walk(node, results: list) -> None:
    name = node.getClass().getSimpleName()
    if name == "Aggregate":
        exprs = [
            node.groupingExpressions().apply(i)
            for i in range(node.groupingExpressions().size())
        ]
        results.append(exprs)
    for i in range(node.children().size()):
        _walk(node.children().apply(i), results)


def infer_plan(df: DataFrame) -> ContinuousPlan:
    """Derive (append-only?, upsert keys) from the DataFrame's analyzed
    plan — the engine-side equivalent of Flink's update-mode inference.
    """
    aggs: list[list] = []
    _walk(_analyzed_plan(df), aggs)
    if not aggs:
        return ContinuousPlan(is_append_only=True, upsert_keys=())
    top = aggs[0]  # topmost aggregate decides the result's key
    keys = []
    windowed = False
    for e in top:
        if _is_event_time_window(e):
            windowed = True
            keys.append("window")
        else:
            s = str(e.sql()).strip("`")
            keys.append(s.split(".")[-1].strip("`"))
    # A single windowed aggregate is append-only once the watermark
    # closes each window (reference fast path). A windowed agg *below*
    # another agg, or an unwindowed agg, keeps retracting -> update.
    append_only = windowed and len(aggs) == 1
    return ContinuousPlan(is_append_only=append_only, upsert_keys=tuple(keys))
