"""Output-mode and upsert-key inference.

The reference's planner probes the sink to decide append-vs-upsert and
derives the upsert key from the query's GROUP BY
(``ElasticUpsertTableSink.setIsAppendOnly`` :86, ``setKeyFields``
:51-55; SURVEY §1.4) — and, crucially, it traces those keys *through
subsequent projections*: the demo's Q1 projects
``'w.end.cast(LONG) as 'deptTime`` and the planner still derives
``(cell, deptTime)`` as the upsert key (Flink's UpdatingPlanChecker
forwards a key through a Calc when it is an identity rename or a
group-window ``start``/``end`` property — the window end uniquely
identifies a tumbling/sliding window instance).

Catalyst/Structured Streaming has no such planner feature — the user
picks an outputMode — so the engine re-derives both here by walking
the analyzed logical plan:

- topmost streaming ``Aggregate`` -> upsert keys = its grouping
  columns, then traced upward through every ``Project`` between the
  aggregate and the plan root (identity/Cast renames and
  ``window.start``/``window.end`` extractions rename the key; any
  other transformation drops it); mode = ``update`` (continuous
  upsert), unless every grouping expression set includes the
  event-time window (then the result is append-only once the
  watermark passes, the reference's append fast path).
- no aggregate -> append-only, no key.
"""

from __future__ import annotations

import re
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


_WINDOW_STRUCT = "struct<start:timestamp,end:timestamp"


def _is_event_time_window(expr, agg_child=None) -> bool:
    """True iff a grouping expression is Catalyst's generated event-time
    window: the TimeWindow/SessionWindow node itself, or the attribute
    the TimeWindowing rule emits.  The rule's attribute is named
    ``window`` / ``session_window`` unless the user aliased it
    (``F.window(...).alias("w")``), so for struct-typed attributes with
    other names we additionally check whether the subtree *below* the
    aggregate defines that exprId as a TimeWindow/SessionWindow alias.
    (A user column that merely *contains* 'window' in its name — e.g.
    ``window_type`` — must NOT match: misclassifying it would pick
    append mode for a continuously-updating aggregate and the upsert
    sink would miss every later update.)"""
    cls = expr.getClass().getSimpleName()
    if cls in ("TimeWindow", "SessionWindow"):
        return True
    try:
        dt = expr.dataType().simpleString()
    except Exception:
        return False
    if not dt.startswith(_WINDOW_STRUCT):
        return False
    name = str(expr.sql()).strip("`").split(".")[-1].strip("`")
    if name in ("window", "session_window"):
        return True
    if agg_child is not None and cls == "AttributeReference":
        return _subtree_defines_time_window(agg_child, expr.exprId().toString())
    return False


def _subtree_defines_time_window(node, expr_id: str) -> bool:
    """Does any Project below the aggregate alias a TimeWindow /
    SessionWindow expression under this exprId (the TimeWindowing
    rewrite, possibly user-aliased)?"""
    if node.getClass().getSimpleName() == "Project":
        plist = node.projectList()
        for i in range(plist.size()):
            ne = plist.apply(i)
            if (
                ne.getClass().getSimpleName() == "Alias"
                and ne.exprId().toString() == expr_id
                and ne.child().getClass().getSimpleName()
                in ("TimeWindow", "SessionWindow")
            ):
                return True
    for i in range(node.children().size()):
        if _subtree_defines_time_window(node.children().apply(i), expr_id):
            return True
    return False


def _walk_aggregates(node, results: list) -> None:
    if node.getClass().getSimpleName() == "Aggregate":
        results.append(node)
    for i in range(node.children().size()):
        _walk_aggregates(node.children().apply(i), results)


def _path_to_top_aggregate(node):
    """(nodes from root down to — excluding — the topmost Aggregate,
    the Aggregate) or None when the plan has no aggregate."""
    if node.getClass().getSimpleName() == "Aggregate":
        return [], node
    for i in range(node.children().size()):
        r = _path_to_top_aggregate(node.children().apply(i))
        if r is not None:
            return [node] + r[0], r[1]
    return None


def _attr_refs(expr) -> list:
    """The AttributeReferences an expression reads (via Catalyst's
    AttributeSet)."""
    out = []
    it = expr.references().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _strip_casts(expr):
    while expr.getClass().getSimpleName() == "Cast":
        expr = expr.child()
    return expr


_WINDOW_BOUND = re.compile(r"\.(?:`)?(start|end)(?:`)?\b", re.IGNORECASE)


def _extracts_window_bound(expr) -> str | None:
    """Which window bound does the expression tree extract from its
    (single) window-struct input — e.g. ``unix_millis(w.end)`` or
    ``CAST(w.end AS LONG)``?  Returns ``"end"``, ``"start"``, or None.
    Checked structurally (a GetStructField node naming start/end) with
    the rendered SQL as fallback; ``end`` wins if one expression
    somehow touches both. ``end`` as the canonical bound is a demo-
    derived choice, not a planner citation: the reference only ever
    projects ``'w.end`` (TaxiRideQueries.scala Q1 — the sink key it
    hands ElasticUpsertTableSink.scala:51-55 is whatever the plan
    checker forwarded), and in Flink's planner start/end of one window
    form a single key group, so either bound identifies the instance —
    we pick END as the group's representative because it is the only
    bound the reference demo materializes (ADVICE r8)."""

    def any_node(e) -> str | None:
        found: str | None = None
        if e.getClass().getSimpleName() == "GetStructField":
            try:
                name = str(e.extractFieldName()).lower()
                if name in ("start", "end"):
                    found = name
            except Exception:
                m = _WINDOW_BOUND.search(str(e.sql()))
                if m:
                    found = m.group(1).lower()
        if found == "end":
            return "end"
        for i in range(e.children().size()):
            sub = any_node(e.children().apply(i))
            if sub == "end":
                return "end"
            found = found or sub
        return found

    return any_node(expr)


class _Key:
    """A grouping key being traced from the aggregate's output toward
    the plan root.  ``expr_id`` is None when the key has no stable
    output attribute (untraceable complex grouping expression)."""

    __slots__ = ("expr_id", "name", "is_window")

    def __init__(self, expr_id: str | None, name: str, is_window: bool):
        self.expr_id = expr_id
        self.name = name
        self.is_window = is_window


def _keys_at_aggregate(agg) -> tuple[list[_Key], bool]:
    """Resolve each grouping expression to its (exprId, name) in the
    Aggregate's own output, window-classified. Returns (keys, windowed)."""
    agg_child = agg.children().apply(0) if agg.children().size() else None
    gexprs = [
        agg.groupingExpressions().apply(i)
        for i in range(agg.groupingExpressions().size())
    ]
    result_exprs = [
        agg.aggregateExpressions().apply(i)
        for i in range(agg.aggregateExpressions().size())
    ]
    keys: list[_Key] = []
    windowed = False
    for g in gexprs:
        is_win = _is_event_time_window(g, agg_child)
        windowed = windowed or is_win
        # Resolve the grouping expression to the Aggregate's OWN output
        # attribute: the aggregate list re-aliases grouping columns
        # (``F.window(..).alias("w")`` groups on attribute ``window``
        # but outputs ``Alias(window) AS w`` with a fresh exprId — the
        # Project above references *that* id).
        resolved = None
        for ne in result_exprs:
            cls = ne.getClass().getSimpleName()
            if (
                cls == "AttributeReference"
                and g.getClass().getSimpleName() == "AttributeReference"
                and ne.exprId().toString() == g.exprId().toString()
            ):
                resolved = _Key(ne.exprId().toString(), str(ne.name()), is_win)
                break
            if cls == "Alias" and ne.child().semanticEquals(g):
                resolved = _Key(ne.exprId().toString(), str(ne.name()), is_win)
                break
        if resolved is None:
            if g.getClass().getSimpleName() == "AttributeReference":
                # grouped-but-not-selected column: keep the id so the
                # trace fails naturally with the original column name
                resolved = _Key(g.exprId().toString(), str(g.name()), is_win)
            else:
                name = "window" if is_win else str(g.sql()).strip("`").split(".")[-1]
                resolved = _Key(None, name, is_win)
        keys.append(resolved)
    return keys, windowed


def _trace_through_project(keys: list[_Key], project) -> list[_Key]:
    """Map keys across one Project (reference semantics: identity /
    Cast renames forward a key; a window key additionally survives
    ``start``/``end`` extraction, since the window end uniquely
    identifies a tumbling/sliding window instance). A key the Project
    does not forward keeps its old name but loses its exprId — it can
    no longer be traced and will fail the output-column check with the
    original diagnostic."""
    by_id = {k.expr_id: k for k in keys if k.expr_id is not None}
    carried: dict[str, _Key] = {}
    # How an already-carried WINDOW key was traced: "start"/"end" for a
    # bound extraction, "struct" for an identity carry of the raw
    # window struct. Replacement rule (explicit, ADVICE r7+r8): an
    # alias extracting .end REPLACES one extracting .start (end is the
    # canonical representative of the window key group — see
    # _extracts_window_bound), but NEVER replaces a carried struct: the
    # struct holds both bounds, a strictly stronger key than either
    # one, so struct-vs-bound coexistence resolves to the struct
    # regardless of projection order.
    carried_bound: dict[str, str] = {}
    plist = project.projectList()
    for i in range(plist.size()):
        ne = plist.apply(i)
        cls = ne.getClass().getSimpleName()
        if cls == "AttributeReference":
            k = by_id.get(ne.exprId().toString())
            if k is not None and (
                k.expr_id not in carried
                # struct beats a bound carried earlier in the list —
                # order-independence of the precedence rule
                or (
                    k.is_window
                    and carried_bound.get(k.expr_id) in ("start", "end")
                )
            ):
                carried[k.expr_id] = k
                if k.is_window:
                    carried_bound[k.expr_id] = "struct"
            continue
        if cls != "Alias":
            continue
        refs = _attr_refs(ne.child())
        if len(refs) != 1:
            continue
        k = by_id.get(refs[0].exprId().toString())
        if k is None:
            continue
        bound = _extracts_window_bound(ne.child()) if k.is_window else None
        core = _strip_casts(ne.child())
        identity = core.getClass().getSimpleName() == "AttributeReference"
        if k.expr_id in carried:
            prev = carried_bound.get(k.expr_id)
            end_over_start = bound == "end" and prev == "start"
            # an identity alias of the raw struct also beats a bound
            struct_over_bound = (
                k.is_window
                and identity
                and bound is None
                and prev in ("start", "end")
            )
            if not (end_over_start or struct_over_bound):
                continue
        window_bound = k.is_window and bound is not None
        if identity or window_bound:
            carried[k.expr_id] = _Key(
                ne.exprId().toString(),
                str(ne.name()),
                # the extracted bound is a plain column now, not the
                # window struct — later projects treat it as identity
                k.is_window and not window_bound,
            )
            if window_bound:
                carried_bound[k.expr_id] = bound
            elif k.is_window:
                carried_bound[k.expr_id] = "struct"
    return [carried.get(k.expr_id, _Key(None, k.name, k.is_window)) for k in keys]


def infer_plan(df: DataFrame) -> ContinuousPlan:
    """Derive (append-only?, upsert keys) from the DataFrame's analyzed
    plan — the engine-side equivalent of Flink's update-mode inference,
    including the reference planner's key tracing through projections
    (``ElasticUpsertTableSink.scala:51-55``: Q1's
    ``'w.end.cast(LONG) as 'deptTime`` still yields key
    ``(cell, deptTime)``)."""
    root = _analyzed_plan(df)
    located = _path_to_top_aggregate(root)
    if located is None:
        return ContinuousPlan(is_append_only=True, upsert_keys=())
    path, agg = located
    all_aggs: list = []
    _walk_aggregates(root, all_aggs)
    keys, windowed = _keys_at_aggregate(agg)
    # Trace upward: nearest Project above the aggregate first.
    for node in reversed(path):
        if node.getClass().getSimpleName() == "Project":
            keys = _trace_through_project(keys, node)
    # A single windowed aggregate is append-only once the watermark
    # closes each window (reference fast path). A windowed agg *below*
    # another agg, or an unwindowed agg, keeps retracting -> update.
    append_only = windowed and len(all_aggs) == 1
    return ContinuousPlan(
        is_append_only=append_only, upsert_keys=tuple(k.name for k in keys)
    )
