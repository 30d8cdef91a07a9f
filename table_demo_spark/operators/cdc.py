"""Changelog materialization: fold an ordered CDC stream (insert /
update / delete ops with a version column) into current table state —
the batch expression of the stream/table duality the reference is
built on (SURVEY §1.4; `ElasticUpsertTableSink.scala:116-148` applies
exactly this op-dispatch one message at a time).

`merge_into` (operators/merge.py) applies ONE changeset where each key
appears at most once; `materialize_changelog` is the general form —
a key may appear many times across versions and the LATEST op wins.

Scale shape: one `groupBy(keys)` with a `max_by` aggregate. This is
deliberately an aggregation, NOT a `row_number()` window: aggregation
gets map-side partial combine (each input partition pre-folds its local
changes per key before the shuffle), so shuffled bytes are O(#distinct
keys touched), not O(#change events). A window would shuffle and sort
the full changelog. For a CDC feed where hot keys receive many updates
(the common case), that difference is the whole ballgame at 100 TB.

The non-key payload travels as ONE struct inside `max_by`, so the
winning row is taken atomically — never a column-wise mix of two
versions (same lesson as merge.py / asof.py).

Ties: `version` must be unique per key (every real CDC feed — Debezium
LSN, binlog offset, Kafka offset — provides this). With duplicate
versions `max_by` picks an arbitrary winner, same as the reference's
last-message-wins would be nondeterministic under reordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_history(
    changelog: DataFrame,
    keys: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Slowly-changing-dimension Type 2: turn the changelog into
    versioned history rows with validity intervals.

    Every non-delete change becomes a row valid from its version until
    the key's next change (any op — an update supersedes, a delete
    closes); the open interval (``valid_to`` null) marks the current
    row, unless the key's last op is a delete, in which case the key
    has no current row.

    Scale shape: one hash shuffle on the key + a per-key window sort.
    Unlike `materialize_changelog` (aggregation — keeps one row), SCD2
    inherently keeps every version, so the window's O(changes per key)
    sort is the semantic minimum, and per-key version chains bound the
    sort partitions (no global sort).
    """
    from pyspark.sql import Window

    payload = [
        c for c in changelog.columns if c not in (*keys, version_col, op_col)
    ]
    w = Window.partitionBy(*keys).orderBy(version_col)
    hist = changelog.withColumn("valid_to", F.lead(version_col).over(w))
    return hist.filter(F.col(op_col) != F.lit("D")).select(
        *keys,
        F.col(version_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        *payload,
    )


def materialize_changelog(
    changelog: DataFrame,
    keys: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Fold a changelog to current state.

    ``changelog`` columns: ``keys`` + ``version_col`` + ``op_col``
    ('I'/'U' upsert, 'D' delete) + payload columns. Returns one row per
    live key: the payload of its highest-version change, plus
    ``version_col`` (the snapshot frontier per key); deleted keys are
    absent.
    """
    payload = [
        c for c in changelog.columns if c not in (*keys, version_col, op_col)
    ]
    latest = changelog.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("__op"), *payload), F.col(version_col)
        ).alias("__last"),
        F.max(version_col).alias(version_col),
    )
    return latest.filter(F.col("__last.__op") != F.lit("D")).select(
        *keys, version_col, "__last.*"
    ).drop("__op")


def merge_agg_states(
    state: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental view maintenance for distributive aggregates: merge
    a materialized per-key aggregate STATE with the partial aggregate
    of a new DELTA batch — full-outer on the key, null-safe addition
    per measure. count/sum/min/max-style (self-maintainable) views
    update in O(|delta| + |touched keys|) instead of a full recompute;
    this merge is exactly Spark's own partial->final aggregation
    contract applied across BATCHES rather than partitions, so
    merge(agg(base), agg(delta)) == agg(base ∪ delta) by algebra (the
    property tests pin it). AVG travels as (sum, count); non-
    distributive aggregates (exact distinct, median) need their
    mergeable sketch form instead (HLL in operators/sketch.py).

    Scale shape: the delta side is aggregated before the merge, so the
    join shuffles O(#touched keys); with the state table bucketed on
    the key the merge is shuffle-free on the state side.
    """
    from pyspark.sql import functions as F

    s = state.alias("s")
    d = delta.alias("d")
    cond = [F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in key_cols]
    merged = s.join(d, cond, "full_outer")
    keys = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k) for k in key_cols
    ]
    sums = [
        (
            F.coalesce(F.col(f"s.{c}"), F.lit(0))
            + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        )
        .cast("long")
        .alias(c)
        for c in sum_cols
    ]
    return merged.select(*keys, *sums)
