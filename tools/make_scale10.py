#!/usr/bin/env python
"""Build the 10x scaling fixture used by docs/SCALE.md's measurements.

Key-shifted copies of the sf0.1 tables: doc_id/vec_id/event_id shifted
by an EVEN offset per copy (parity-based splits survive), documents
content-tagged per copy (near-dup semantics still collapse the copies
— the dup-explosion robustness scenario is intentional). documents/
embeddings are written as 32 files (multi-file production layout);
events as ONE file (the replay source reads a single parquet file,
like the driver fixtures).

Usage: python tools/make_scale10.py [out_dir=/tmp/scale10] \
           [src_sf=/root/testdata/sf0.1] [copies=10]

A third argument builds the wider fixtures the 100 TB extrapolation
leans on (e.g. ``/tmp/scale30 /root/testdata/sf0.1 30`` for the r11
30x keyspace rows in docs/SCALE.md).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

SHIFT = 10_000_000
COPIES = 10


def main() -> None:
    global COPIES
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    if len(sys.argv) > 3:
        COPIES = int(sys.argv[3])
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        # the fixture build unions COPIES full tables through one
        # shuffle; the 1g local-mode default heap spill-crashes at
        # 30x (SPILL_OUT_OF_MEMORY) — this is a builder tool, give it
        # a real heap
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    os.makedirs(out, exist_ok=True)

    def tenfold(table: str, key: str, tag_text: bool):
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = []
        for i in range(COPIES):
            c = base.withColumn(key, F.col(key) + F.lit(i * SHIFT))
            if tag_text:
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" c{i}"))
                )
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    for table, key, tag in [
        ("documents", "doc_id", True),
        ("embeddings", "vec_id", False),
    ]:
        dest = os.path.join(out, f"{table}.parquet")
        shutil.rmtree(dest, ignore_errors=True)
        tenfold(table, key, tag).repartition(32).write.mode(
            "overwrite"
        ).parquet(dest)
        print(table, spark.read.parquet(dest).count())

    # events: single file (replay-source contract)
    tmp = os.path.join(out, "events_tmp")
    tenfold("events", "event_id", False).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(out, "events.parquet")
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    elif os.path.exists(dest):
        os.remove(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    print("events", spark.read.parquet(dest).count())

    # TPC-H facts: 10x with shifted ORDER keys only — customers,
    # suppliers and parts stay the originals, so the fixture models
    # the production shape (facts grow, dimensions do not) and every
    # dim join keeps its selectivity.
    for table, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        dest = os.path.join(out, f"{table}.parquet")
        if os.path.islink(dest):
            os.remove(dest)
        else:
            shutil.rmtree(dest, ignore_errors=True)
        tenfold(table, key, False).repartition(32).write.mode(
            "overwrite"
        ).parquet(dest)
        print(table, spark.read.parquet(dest).count())

    # remaining dims: symlink the originals
    for t in ["region", "nation", "customer", "supplier", "part"]:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{src}/{t}.parquet", dst)
    print("done:", out)


if __name__ == "__main__":
    main()
