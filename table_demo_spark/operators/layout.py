"""Z-order (Morton) storage layout for multi-dimensional data skipping.

At 100 TB the fastest predicate is the one that never reads its data:
parquet scans prune whole row groups whose column min/max statistics
exclude the filter range. A single-column sort gives that for one
column only; interleaving the bits of two (or more) bucketized columns
into a Morton key and range-partitioning + sorting by it clusters BOTH
dimensions, so a 2-d box predicate touches only the row groups whose
(x, y) envelope intersects the box — the Delta Lake / Databricks
OPTIMIZE ZORDER BY technique, built here from native expressions.

Everything is JVM-side bit arithmetic (shiftright / bitwise & / |) —
codegen'd, shuffle = the one repartitionByRange a sorted write needs
anyway. The write itself is plain parquet: skipping needs no index
sidecar, just better statistics per row group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 10  # per-dimension buckets = 2^10; z-key spans 20 bits


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] linearly onto integer buckets [0, 2^bits - 1]."""
    n = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * n).cast("long")


def zorder_key(
    x: Column, y: Column, *, x_range: tuple[float, float],
    y_range: tuple[float, float], bits: int = Z_BITS,
) -> Column:
    """Interleave the bits of two bucketized columns (x even bits,
    y odd bits) into one Morton key."""
    bx = _bucket(x, *x_range, bits)
    by = _bucket(y, *y_range, bits)
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(bx, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(by, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    n_files: int = 8,
    bits: int = Z_BITS,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of (x, y).

    ``repartitionByRange`` on the key splits the z-curve into
    ``n_files`` contiguous segments (each file covers a compact 2-d
    tile set); ``sortWithinPartitions`` orders rows inside each file so
    parquet's per-row-group statistics are tight on BOTH x and y."""
    key = zorder_key(
        F.col(x), F.col(y), x_range=x_range, y_range=y_range, bits=bits
    )
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction (the OPTIMIZE half of Delta's
    OPTIMIZE/ZORDER pair): rewrite a fragmented parquet directory into
    ceil(total_bytes / target_bytes) files and return that count.

    Streaming sinks and over-parallel writers leave directories with
    thousands of KB-sized files; at 100 TB the resulting per-file open
    + footer-read overhead dominates scan time and floods the driver's
    split enumeration. Sizing from actual on-disk bytes (compressed)
    rather than row counts keeps output files near the HDFS-friendly
    target regardless of schema width.

    Uses ``coalesce`` (narrow, no shuffle — partitions are merely
    glued) rather than ``repartition``: compaction must not pay a
    full-data shuffle, and row order inside surviving files is
    irrelevant for size-based compaction (z-order clustering is
    ``zorder_write``'s job)."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src).coalesce(n).write.mode("overwrite").parquet(dst)
    return n


class VersionedParquetTable:
    """Retained-generation parquet table with snapshot (time-travel)
    reads — the lakehouse primitive under "VERSION AS OF".

    Unlike the streaming sinks' gen-flip stores (which delete the old
    generation once the new one commits), every version directory here
    is RETAINED: ``write_version`` appends ``version=N``, readers pin
    any historical N. Writes are atomic at directory granularity — a
    version is visible only after its parquet write completes, so a
    concurrent reader of ``latest_version`` never sees a partial
    snapshot. Retention at 100 TB is a policy knob (vacuum old
    versions); the read path prunes to exactly one version directory,
    so history depth never taxes a query.
    """

    def __init__(self, path: str):
        import os

        self.path = path
        os.makedirs(path, exist_ok=True)

    def history(self) -> list[int]:
        import os
        import re

        return sorted(
            int(m.group(1))
            for d in os.listdir(self.path)
            if (m := re.fullmatch(r"version=(\d+)", d))
        )

    def latest_version(self) -> int:
        hist = self.history()
        if not hist:
            raise ValueError(f"no versions at {self.path}")
        return hist[-1]

    def _dir(self, version: int) -> str:
        return f"{self.path}/version={version}"

    def write_version(self, df: DataFrame) -> int:
        nxt = (self.history()[-1] + 1) if self.history() else 1
        df.write.mode("errorifexists").parquet(self._dir(nxt))
        return nxt

    def read_version(self, spark, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        if v not in self.history():
            raise ValueError(f"version {v} not in {self.history()}")
        return spark.read.parquet(self._dir(v))
