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


def _walk(node, results: list) -> None:
    name = node.getClass().getSimpleName()
    if name == "Aggregate":
        groupings = [
            str(node.groupingExpressions().apply(i).sql())
            for i in range(node.groupingExpressions().size())
        ]
        results.append(groupings)
    for i in range(node.children().size()):
        _walk(node.children().apply(i), results)


def infer_plan(df: DataFrame) -> ContinuousPlan:
    """Derive (append-only?, upsert keys) from the DataFrame's analyzed
    plan — the engine-side equivalent of Flink's update-mode inference.
    """
    aggs: list[list[str]] = []
    _walk(_analyzed_plan(df), aggs)
    if not aggs:
        return ContinuousPlan(is_append_only=True, upsert_keys=())
    top = aggs[0]  # topmost aggregate decides the result's key
    keys = []
    windowed = False
    for g in top:
        s = g.strip("`")
        if "window" in s.lower():
            windowed = True
            keys.append("window")
        else:
            keys.append(s.split(".")[-1].strip("`"))
    # A single windowed aggregate is append-only once the watermark
    # closes each window (reference fast path). A windowed agg *below*
    # another agg, or an unwindowed agg, keeps retracting -> update.
    append_only = windowed and len(aggs) == 1
    return ContinuousPlan(is_append_only=append_only, upsert_keys=tuple(keys))
