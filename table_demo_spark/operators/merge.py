"""Batch MERGE INTO: key-based upsert/delete of a source changeset
into a target table — the batch twin of the streaming upsert sink
(``ElasticUpsertTableSink.scala:127-147`` dispatch semantics, and the
Delta/Iceberg ``MERGE`` shape) expressed as one distributed join.

Contract: ``source`` carries the target's columns plus an optional op
column (default name ``__op``): 'U' (or absent) upserts the key —
matched rows are replaced wholesale, unmatched rows insert; 'D'
deletes the key.

Scale shape: exactly one hash-partitioned full-outer join on the key
(both sides shuffle once; AQE handles skew) — no window, no
driver-side state, no per-key loop. Non-key columns travel as one
struct per side so the merged row is taken atomically from whichever
side wins (the asof_join lesson: per-column coalesce can interleave
columns from different rows when sources carry nulls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_COL = "__op"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Return the merged table (same schema as ``target``)."""
    vals = [c for c in target.columns if c not in keys]
    has_op = op_col in source.columns
    op = F.col(op_col) if has_op else F.lit("U")
    t = target.select(*keys, F.struct(*vals).alias("__t"))
    s = source.select(*keys, F.struct(*vals).alias("__s"), op.alias("__o"))
    merged = (
        t.join(s, keys, "full_outer")
        # a 'D' source row removes the key; a 'U' row wins over target
        .filter(F.col("__o").isNull() | (F.col("__o") != F.lit("D")))
        .select(
            *keys,
            F.when(F.col("__s").isNotNull(), F.col("__s"))
            .otherwise(F.col("__t"))
            .alias("__m"),
        )
    )
    return merged.select(*keys, "__m.*")
