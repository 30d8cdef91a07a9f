"""As-of (event-time lookup) join — an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches to each left row the single
most recent right row with ``right_ts <= left_ts`` for the same key
(left-outer semantics: unmatched left rows keep nulls).

Implementation is the single-shuffle union trick, not a join:
both sides are unioned with a side tag, hash-shuffled ONCE on the key,
sorted within partitions by (ts, side), and a running
``last(value, ignorenulls=True)`` window carries the latest right-side
payload forward onto each left row. Compared to the naive
``left JOIN right ON key AND right_ts <= left_ts`` + max() + re-join
(two shuffles of the big side plus an exploding inequality join), this
is one shuffle and linear work — the shape that survives 100 TB.
Right-side ties on (key, ts) must be pre-deduplicated by the caller
(pick a deterministic winner) — the reference semantics of "the" latest
row requires a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, the latest right row with ts <= left ts.

    Returns all left columns plus ``<value_col><suffix>`` for each
    right value column (null when no right row precedes the left row).

    All value columns are carried as ONE struct so the matched right
    row is taken atomically — carrying each column independently would
    silently mix columns from different right rows whenever the latest
    right row holds a NULL in one of them.
    """
    from pyspark.sql.types import StructField, StructType

    left_cols = left.columns
    payload_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    r = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c != on
            else F.col(on)
            for c in left_cols
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__payload"),
    )
    # right sorts before left at equal ts => "<=" (inclusive) semantics
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        *left_cols,
        F.col("__side"),
        F.last("__payload", ignorenulls=True).over(w).alias("__p"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__p.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
