#!/usr/bin/env python
"""Solo per-query timing probe: noop-sink each named query at
$SPARK_GRAFT_SF_DIR (default sf0.1), after the same warm-up bench.py
uses. Prints one line per query; run SOLO on a quiet box.

Usage: python tools/probe_queries.py name [name...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from table_demo_spark.queries import all_queries
    from table_demo_spark.session import get_spark
    from table_demo_spark.sources.batch import TABLES, load_table

    spark = get_spark(app_name="probe")
    registry = {q.name: q.spark_fn for q in all_queries()}
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    # Arrow/pandas worker warm-up (mirrors bench.py).
    registry["llm_m11_decoded_luma"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    for name in names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        print(f"PROBE {name} {dt:.3f}s", flush=True)


if __name__ == "__main__":
    main()
