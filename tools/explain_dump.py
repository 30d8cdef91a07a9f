#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<tag>/.

Usage: python tools/explain_dump.py <outdir> <suffix> [names...]
Writes <outdir>/<name>_<suffix>.txt for each name (default: a pinned
set of optimization-target queries). Plan-only — nothing executes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "llm_m39_h264_cavlc_pixels",
    "llm_m45_h264_cabac_pixels",
    "llm_m46_h264_inter_pixels",
    "llm_m51_hevc_slice_decode",
    "llm_m53_h264_bipred_pixels",
    "llm_m55_hevc_deblock_decode",
    "llm_m56_heic_grid_crop",
    "llm_m57_hevc_sao_decode",
    "llm_m58_hevc_pslice_decode",
    "llm_m59_hevc_bslice_decode",
    "llm_m60_hevc_tmvp_decode",
    "llm_m47_avif_pixels",
    "llm_m48_heic_pixels",
    "llm_d4_dedup_ngram_jaccard",
    "llm_d7_neardup_clusters",
    "an_a41_pagerank",
    "llm_t25_bpe_encode",
    "llm_t31_bpe_batched_train",
    # NOTE: stream_* / serve-from-store queries are absent by design:
    # constructing their DataFrame runs the ingest drain (heavy side
    # effect), and their cost is micro-batch machinery, not plan shape.
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)

    from table_demo_spark.queries import all_queries
    from table_demo_spark.session import get_spark

    spark = get_spark(app_name="explain-dump")
    registry = {q.name: q.spark_fn for q in all_queries()}
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
