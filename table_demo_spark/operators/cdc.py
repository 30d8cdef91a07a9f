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
