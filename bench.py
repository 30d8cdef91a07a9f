#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect cost). Timing excludes session bootstrap.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "ref_q1_tumble",
    "ref_q2_over_range",
    "ref_q3_cnt_freq",
    "an_a1_pricing_summary",
    "an_a2_revenue_by_nation",
    "an_a3_top_customers",
    "an_a5_semi_join",
    "an_a9_interval_join",
    "an_a10_sessionize",
    "an_a11_json_extract",
    "an_a12_asof_join",
    "llm_d1_dedup_exact",
    "llm_d2_dedup_minhash_lsh",
    "llm_d3_dedup_simhash",
    "llm_d5_embedding_neardup",
    "llm_s1_ann_topk",
    "llm_s2_ann_lsh_topk",
    "llm_s3_ann_ivf_topk",
    "llm_t1_text_stats",
    "llm_t3_token_topk",
    "llm_t6_winnow_fingerprints",
    "llm_m1_binary_meta",
    "llm_p1_prep_pipeline",
    "an_a4_rollup",
    "an_a14_cube",
    "an_a20_pivot",
    "an_a21_correlated_subquery",
    "an_a22_lag_gaps",
    "an_a23_market_share",
    "an_a24_grouping_sets",
    "llm_d8_semantic_dedup",
    "llm_d9_containment_pairs",
    "llm_t9_repetition_signals",
    "llm_p3_sequence_pack",
    "llm_s5_kmeans_refine",
    "llm_d11_decontaminate",
    "llm_t11_unigram_freq_score",
    "llm_p4_curation_pipeline",
    "an_a31_merge_into",
    "an_a32_cdc_materialize",
    "an_a33_histogram_quantiles",
    "an_a34_zorder_skipping",
    "llm_s7_pq_topk",
    "llm_t14_bigram_lm",
    # full replay -> stateful operator -> sink drains
    "stream_q1_tumble_upsert",
    "stream_q2_over_range",
    "stream_q3_chained_agg",
    "stream_q4_session_window",
    "stream_q12_left_outer_join",
    "stream_q13_sliding_window",
    "stream_q14_topk",
    "stream_q15_running_totals",
    "llm_d13_substring_dedup",
    "llm_p5_chunk_overlap",
    "llm_p6_domain_mix",
    "llm_p7_shard_assign",
    "llm_m5_payload_sig_dedup",
    "an_a37_date_spine",
    "stream_q16_hll_distinct",
    "llm_d14_url_dedup",
    "an_a38_multi_predicate",
    "an_a39_time_travel_diff",
    "stream_q17_fanout",
    "an_a40_cohort_retention",
    "llm_p8_epoch_plan",
    "an_a41_pagerank",
    "an_a42_spatial_join",
    "llm_d15_bloom_filter",
    "llm_t15_bpe_pairs",
    "llm_s8_rand_projection",
    "llm_p9_weighted_sample",
    "an_a43_skyline",
    "an_a44_triangle_count",
    "an_a45_waiting_suppliers",
    "an_a46_mad_outliers",
    "llm_p10_curriculum",
    "stream_q18_cdc_apply",
    "llm_m6_vad_segments",
    "stream_q19_anti_join",
    "llm_t16_vocab_growth",
    "llm_t17_zipf_buckets",
    "an_a47_incremental_mv",
    "llm_s9_maxsim_topk",
    "llm_p11_group_split",
    "llm_m7_image_patches",
    "llm_d16_minhash_calibration",
    "src_s7_schema_evolution",
    "llm_d17_simhash_pairs",
    "an_a48_max_concurrency",
    "llm_t18_blocklist_filter",
    "llm_p12_length_batching",
    "llm_t19_boilerplate_prefix",
    "llm_t20_bpe_train",
    "an_a49_custdist",
    "an_a50_hot_key_join",
    "llm_s10_maxsim_pruned",
    "an_a51_bfs_reachability",
    "llm_p13_corpus_manifest",
    "llm_d18_ingest_dedup",
    "llm_m8_modality_router",
    "an_a52_important_parts",
    "an_a53_top_supplier",
    "an_a54_supplier_relationship",
    "an_a55_small_qty_revenue",
    "an_a56_large_volume_customers",
    "an_a57_excess_shipment_suppliers",
    "an_a58_global_sales_opportunity",
    "llm_s11_mips_topk",
    "llm_t21_readability",
    "llm_m9_scene_cuts",
    "stream_q20_semi_join",
    "an_a59_hll_rollup",
    "an_a60_event_paths",
    "an_a61_shortest_path",
    "llm_p14_interleave_schedule",
    "stream_q21_dead_letter",
    "llm_t22_rake_keywords",
    "llm_d19_quality_dedup",
    "llm_m10_pair_audit",
    "llm_m11_decoded_luma",
    "llm_m12_resize_luma",
    "llm_m13_wav_energy",
    "llm_m14_png_luma",
    "llm_m15_gif_scene_cuts",
    "llm_m17_jpeg_dc",
    "llm_m18_jpeg_restart_parallel",
    "llm_t24_heldout_lm_filter",
    "llm_t29_gopher_rules",
    "llm_s13_filtered_ann",
    "llm_m16_pcm_vad_segments",
    "llm_s12_two_stage_rerank",
    "llm_p16_decontaminated_split",
    "llm_t25_bpe_encode",
    "llm_t27_bpe_sample_train",
    "llm_t26_quantile_sketch",
    "llm_t23_domain_drift",
    "src_s8_quoted_csv",
    "stream_q22_full_outer_join",
    "stream_q23_http_upsert",
    "stream_q24_http_retract_delete",
    "stream_q25_streaming_neardup",
    "stream_q27_available_now",
    "stream_q28_media_decode",
    "stream_q29_ann_index_ingest",
    "llm_p15_budget_select",
    "an_a62_validity_audit",
    "an_a63_profile_knn",
    # r6 additions (r5 verdict #4: close the bench blind spot) —
    # every source-format reader, the remaining streaming join/dedup
    # modes, the n-gram/GEMM/cluster dedup variants, and the two new
    # BPE trainers.
    "src_s1_jsonl_events",
    "src_s2_orc_events",
    "src_s3_text_events",
    "src_s4_partitioned_events",
    "src_s5_permissive_jsonl",
    "src_s6_compacted_events",
    "stream_q5_interval_join",
    "stream_q6_dedup",
    "stream_q11_csv_gzip_source",
    "llm_d4_dedup_ngram_jaccard",
    "llm_d6_neardup_lsh_gemm",
    "llm_d7_neardup_clusters",
    "llm_t30_bpe_local_train",
    "llm_t31_bpe_batched_train",
    "llm_s14_ivf_kmeans_topk",
    "llm_s15_hybrid_rrf",
    "llm_s16_binary_hamming",
    "llm_s17_cascade_rerank",
    "llm_m27_webp_luma",
    "llm_s18_graph_beam_search",
    "llm_s19_graph_recall",
    "llm_m28_webp_anim_cuts",
    "llm_m29_mp3_frame_walk",
    "llm_m30_h264_nal_walk",
    "stream_q34_media_triage",
    "stream_q35_graph_ingest",
    "llm_s20_serve_ingested",
    "llm_m31_vp8_mosaic_luma",
    "llm_m32_mp3_sideinfo",
    "llm_s21_batched_beam_serve",
    "llm_m33_mixed_media_triage",
    "llm_m34_h264_sps",
    "llm_m35_vp8_color_rgb",
    "llm_m36_h264_slice_headers",
    "llm_m37_png_palette_luma",
    "llm_s23_hnsw_layered",
    "src_s11_xml_events",
    "llm_m38_h264_ipcm_pixels",
    "llm_m39_h264_cavlc_pixels",
    "llm_m40_h264_cavlc_multirow",
    "llm_m41_h264_cavlc_chroma_ac",
    "llm_m42_h264_intra_pred_modes",
    "llm_p17_mixture_sample",
    "stream_q39_decontam_ingest",
    "llm_m43_h264_i4x4_mosaic",
    "llm_m44_h264_i4x4_all_modes",
    "stream_q40_mixture_ingest",
    "an_a79_listagg_group_by_all",
    "an_a80_variant_explode",
    "an_a81_measure_unpivot",
    "an_a82_lateral_topk",
    "an_a77_pipe_syntax_pricing",
    "an_a78_collated_segments",
    "llm_m45_h264_cabac_pixels",
    "llm_m46_h264_inter_pixels",
    "llm_m47_avif_pixels",
    "llm_m48_heic_pixels",
    "llm_m49_hevc_structure",
    "llm_m50_av1_structure",
    "llm_m51_hevc_slice_decode",
    "llm_m52_avif_sequence",
    "llm_m53_h264_bipred_pixels",
    "llm_m54_avif_quant_layer",
    "llm_m55_hevc_deblock_decode",
    "llm_m56_heic_grid_crop",
    "llm_m57_hevc_sao_decode",
    "llm_m58_hevc_pslice_decode",
    "llm_m59_hevc_bslice_decode",
    "llm_m60_hevc_tmvp_decode",
    "llm_m61_av1_symbol_encode",
    "llm_s24_batched_hnsw_serve",
    "llm_t35_zstd_dict_roundtrip",
    "an_a75_recursive_bom",
    "an_a76_variant_json",
    "stream_q37_dict_ingest",
    "llm_m19_color_jpeg_dc",
    "stream_q30_color_decode",
    "llm_m20_color_jpeg_parallel",
    "llm_m21_flac_pcm",
    "an_a64_label_propagation",
    "llm_m22_progressive_jpeg_dc",
    "llm_m23_image_phash_neardup",
    "llm_m24_flac_resample",
    "llm_m25_flac_lpc",
    "llm_m26_stereo_flac",
    "llm_t33_shingle_novelty",
    "llm_t34_classifier_auc",
    "llm_t32_linear_quality_classifier",
    "stream_q31_temporal_enrich",
    "stream_q32_phash_index_ingest",
    "stream_q33_centroid_drift",
    "llm_d20_semantic_dedup_kmeans",
    "an_a65_returned_item_reporting",
    "an_a66_local_supplier_volume",
    "an_a67_volume_shipping",
    "an_a68_promotion_effect",
    "an_a69_product_profit",
    "an_a70_shipping_priority",
    "an_a71_order_priority",
    "an_a72_revenue_forecast",
    "an_a73_shipping_delay",
    "an_a74_audience_overlap",
    "src_s9_multiline_json",
    "src_s10_binary_file_images",
    "stream_q41_pipeline_ingest",
    "stream_q42_state_audit",
    "stream_q43_avif_ingest",
    "stream_q44_watermark_eviction",
    "stream_q45_hevc_ingest",
    "stream_q46_bvideo_ingest",
]

# Every registry query is either in HEADLINE or here, with the reason
# it is not timed — the partition is pinned by
# tests/test_registry.py::test_bench_headline_partitions_the_registry,
# so a new query cannot silently fall outside the bench (r5 verdict
# "no silent caps").
EXCLUDED: dict[str, str] = {
    "ref_q1_tumble_sql": "dialect twin of ref_q1_tumble: same Catalyst plan by construction (pinned by tests/test_dialects.py), timing it twice measures nothing",
    "ref_q4_cell_coords": "projection-only variant over ref_q1's scan; its cost IS the scan, already timed by ref_q1_tumble",
    "ref_q5_geo_points": "projection-only variant over ref_q1's scan, as ref_q4",
    "ref_s2_csv_roundtrip": "runs on the fixed 10k-line taxi CSV sample regardless of sf: sf-independent, sub-second",
    "ref_s1_csv_gzip": "gzip variant of ref_s2 on the same fixed-size sample: sf-independent, sub-second",
    "an_a6_set_ops": "sub-second plan-shape variant (union/intersect/except) of scans timed elsewhere; no novel physical operator",
    "an_a7_window_rank": "window-function shape variant; the partitioned-window cost is timed by an_a22_lag_gaps",
    "an_a8_distinct_agg": "distinct-agg rewrite over the a1 scan; partial-agg shape timed by an_a1",
    "an_a13_salted_agg": "skew-salting DEMO of the a2 aggregate; same bytes scanned as an_a2_revenue_by_nation",
    "an_a15_sliding_window": "batch sliding-window twin of stream_q13 (timed); same expansion factor",
    "an_a16_part_filter": "partition-pruning microbench: the point is the plan pin (tests/test_plans.py), wall time is one pruned scan",
    "an_a17_anti_join": "join-mode twin of an_a5_semi_join (timed); identical physical shape, opposite filter",
    "an_a18_full_outer": "join-mode twin of stream_q22_full_outer_join (timed) in batch form",
    "an_a19_percentiles": "exact-percentile window over the a33 data; sketch counterpart an_a33 is timed",
    "an_a25_min_cost_supplier": "TPC-H Q2 inner correlated block, already executed inside an_a2/an_a52 shapes; sub-second",
    "an_a26_conditional_agg": "CASE-aggregate over the a1 scan; no shuffle beyond an_a1's",
    "an_a27_distribution_windows": "ntile/cume_dist variant of the a7/a22 window shape",
    "an_a28_unpivot": "stack() projection over one scan; sub-second, no shuffle",
    "an_a29_bucketed_join": "bucketed-table demo whose cost is the one-time bucket write; the probe join is timed via stream_q25's store probes",
    "an_a30_array_agg": "collect_list agg over the a1 scan; same single-exchange shape",
    "an_a35_funnel": "sessionize variant; the sessionization window is timed by an_a10_sessionize",
    "an_a36_scd2_history": "SCD2 window chain timed end-to-end by an_a62_validity_audit (superset)",
    "llm_t2_lang_id": "single-scan text metric over documents; scan+agg cost identical to llm_t1_text_stats (timed)",
    "llm_t4_fingerprints": "single-scan hash projection; covered by llm_t6_winnow_fingerprints (timed, strict superset)",
    "llm_t5_token_counts": "single-scan token-count metric; same scan as llm_t1",
    "llm_t7_stopword_scrub": "single-scan token filter; same scan shape as llm_t1/t3",
    "llm_t8_tfidf_topk": "two-agg tf-idf over the t3 token explode; token-explode cost timed by llm_t3_token_topk",
    "llm_t10_pii_redact": "regexp_replace projection over one scan; sub-second",
    "llm_t12_hll_cardinality": "sketch-agg over one scan; HLL agg cost timed by an_a59_hll_rollup (hierarchical superset)",
    "llm_t13_cms_heavy_hitters": "sketch-agg over one scan; same shape as t12, heavy-hitter verify timed via llm_t3",
    "llm_t28_bpe_vocab_apply": "wall time dominated by the sequential sample-train rounds (pure job latency on tiny per-round data); the one-pass APPLY it exists to prove is a single corpus scan — rationale in BASELINE.md",
    "stream_q26_stream_tokenize": "same train-round latency domination as llm_t28; the streaming apply pass is one micro-batch scan",
    "llm_p2_stratified_sample": "single-scan hash-threshold sample; sampling shape timed by llm_p9_weighted_sample",
    "llm_s4_quantize_int8": "projection-only int8 quantization over the embeddings scan; feeds (and is timed inside) llm_s7_pq_topk",
    "llm_s6_ann_recall": "recall AUDIT of llm_s2 vs llm_s1 — re-runs two timed queries to compare them; timing the comparison double-counts",
    "llm_d10_paragraph_dedup": "paragraph-grain twin of llm_d1's window-min dedup (timed); same single-exchange shape on exploded rows",
    "llm_d12_fuzzy_dedup": "edit-distance verify over llm_d2's candidate pairs; candidate generation (the scale axis) timed by llm_d2",
    "llm_m2_frame_sample": "stub decode path (deterministic fake frames); the real codec family m11-m18 is timed",
    "llm_m3_feature_extract": "stub feature extractor; real decode+feature paths timed by m11/m16/m17",
    "llm_m4_audio_chunks": "chunk-grid arithmetic over stub audio; real PCM paths timed by m13/m16",
    "stream_q7_enrich_agg": "broadcast-enrich correctness drain on a 5-row dimension; steady-state stream throughput timed by stream_q1/q2/q3",
    "stream_q8_retract_delete": "changelog-mode correctness drain (retract->delete); tiny keyed window, mode semantics are the point",
    "stream_q9_debug_sink": "console/debug sink — documented as 'not a scale target' (streaming/upsert.py)",
    "stream_q10_ttl_expiry": "TTL-expiry correctness drain over a small keyed window; expiry rides q25's compaction where it IS timed",
    "stream_q36_graph_reshard": "deliberately crosses TWO reshard boundaries at sf0.1 (3 full graph rebuilds by design — 36 s solo); steady-state drain cost is timed by stream_q35, reshard scaling rows live in docs/SCALE.md",
    "llm_s22_serve_resharded": "runs the full q36 reshard drain before the walk (same 3-rebuild cost as stream_q36); the serve-from-store walk itself is timed by llm_s20",
    "stream_q38_hnsw_ingest": "runs THREE per-layer q36-style reshard drains in one stream at sf0.1 (layer 0 pays q36's full rebuild cost plus two upper-layer ladders); steady-state per-batch cost is timed by stream_q35, hierarchy scaling rows live in docs/SCALE.md",
    "llm_s25_serve_hnsw_ingested": "runs the full q38 hierarchical drain before the descent (the 3-ladder cost above); the descent+beam itself is timed by llm_s23/llm_s24",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from table_demo_spark.queries import all_queries
    from table_demo_spark.session import get_spark

    spark = get_spark(app_name="bench")
    registry = {q.name: q.spark_fn for q in all_queries()}

    # Warm up the JVM / codegen / parquet footers so per-query timings
    # measure the queries, not session bootstrap.
    from table_demo_spark.sources.batch import TABLES, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    # Warm the streaming path too (Python data-source + state-store
    # workers): a tiny replay run absorbs the one-time worker spin-up
    # so the streaming headline times steady-state throughput. The
    # emit-order prep for the bench fixture is likewise one-time
    # (cached across runs) — materialize it outside the timed region.
    from table_demo_spark.sources.replay import ensure_emit_ordered

    registry["stream_q1_tumble_upsert"](spark, "/root/testdata/sf0.001")
    ensure_emit_ordered(spark, f"{sf_dir}/events.parquet")
    # Warm the Arrow/pandas worker pool too: the first MapInPandas
    # stage pays Python-worker spawn + Arrow init (~1 s), which would
    # otherwise land on whichever m-family query happens to run first
    # and masquerade as its regression. m11 (not m1) also exercises the
    # md5-payload builder + fan-out shuffle path the codec family
    # shares, so its ~1 s first-stage cost stops landing on the first
    # m-family headline entry.
    registry["llm_m11_decoded_luma"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    # Warm the broadcast-join machinery: the suite's FIRST broadcast
    # join pays one-time TorrentBroadcast init (~1 s), which for three
    # rounds running landed on an_a2_revenue_by_nation and printed a
    # phantom 2x line in every artifact (r7-r9 BASELINE.md notes). A
    # tiny dimension-table broadcast absorbs it here.
    from pyspark.sql import functions as F

    load_table(spark, sf_dir, "orders").join(
        F.broadcast(load_table(spark, sf_dir, "region")),
        F.col("o_orderkey") % 5 == F.col("r_regionkey"),
    ).selectExpr("count(*)").collect()

    # Suite-order experiment hook (r13 BASELINE watch item): a
    # comma-separated SPARK_GRAFT_DEFER list is moved to the END of the
    # headline, so an A/B pair of runs isolates whether mid-suite
    # entries (e.g. the r13 codec queries) tax everything after them
    # via residual worker state. Unset => committed order, unchanged.
    order = list(HEADLINE)
    defer = [n for n in os.environ.get("SPARK_GRAFT_DEFER", "").split(",") if n]
    if defer:
        order = [n for n in order if n not in defer] + [
            n for n in defer if n in order
        ]

    timings: dict[str, float] = {}
    for name in order:
        fn = registry[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # Drop caches an operator may have pinned (e.g. dedup's
        # shingle-set reuse): each headline entry is timed
        # self-contained, and leaked cache blocks otherwise accumulate
        # across the suite until the heap fills.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    # Key order matters: the driver archives only the TAIL of this line
    # (last ~2000 chars), so the headline totals go LAST — the per-query
    # map may be truncated, but value/n_queries/sf always survive.
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "n_queries": len(timings),
            "value": total,
        }
    )
    # The r15 PERF comparison lost its baseline to stdout truncation
    # (BENCH_r14 parsed: null).  Persist the same JSON to a stable file
    # path in the same run so the next round's comparison can always
    # recover the full per-query map even if the captured line is cut.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_last.json"),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # a read-only checkout must not break the bench contract
    print(line)


if __name__ == "__main__":
    main()
