"""Measure dedup/ANN/text entry scaling: sf0.1 vs a 10x corpus.

Runs the candidate-generation-heavy catalog entries at both scales and
prints the time ratio. Sub-quadratic candidate generation should land
ratios well under the ~15x danger line for a 10x input (a quadratic
blowup would show ~100x). Results are recorded in SCALING.md.

Usage: python tools/gen_scale_data.py && python tools/bench_scaling.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession

ENTRIES = [
    "dedup_exact_groups",
    "minhash_near_dup_pairs",
    "near_dup_dedup_count",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "semantic_dedup_clustered",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_contamination_check",
    "text_quality",
    # round-2 batch additions
    "text_soft_dedup_weights",
    "text_heavy_hitters",
    "ann_pq_topk",
    "ann_pq_rerank_topk",
    "text_span_corruption",
    "text_bigram_pmi",
    "contrastive_pairs_mining",
    "docs_quality_ensemble",
    "q_rolling_active_users",
    # round-2 batch 3: bigram LM (token self-join), sweep-line, shard plan,
    # sequence mining, retrieval eval (two full ANN runs)
    "text_perplexity_bigram",
    "q_peak_concurrency",
    "shard_plan_by_tokens",
    "q_sequential_patterns",
    "ann_recall_eval",
    "q_psi_drift",
    "multimodal_image_near_dup",
    # round-3 additions: lossy-codec decode, portable bootstrap, two-phase
    # gap audit, median imputation, ER clustering
    "multimodal_jpeg_decode",
    "q_bootstrap_ci",
    "q_id_gap_audit",
    "q_impute_median_by_group",
    "er_match_clusters",
    # round-5 additions: new codec + web-pipeline entries
    "multimodal_progressive_decode",
    "multimodal_mp4_scene_cuts",
    "multimodal_flac_decode",
    "text_html_extract",
    "url_normalize_dedup",
    "warc_extract_pipeline",
    "text_markdown_extract",
    "url_robots_filter",
    # round-6: multi-pattern blocklist scan (Aho-Corasick)
    "text_blocklist_ac",
    # round-7: mixture/batching/fertility/ICP-ordering additions
    "mixture_unimax_plan",
    "length_bucket_batches",
    "text_tokenizer_fertility",
    "semantic_doc_order",
    "chat_format_audit",
    "text_paragraph_dedup_stats",
    "embedding_knn_graph",
    "embedding_centroid_drift",
    "ann_lsh_index_topk",
    "embedding_cluster_medoids",
    "mixture_epoch_expansion",
    # round-8: pipeline-accounting additions
    "mixture_temperature_weights",
    "prefix_cache_groups",
    "text_ngram_novelty",
    "quality_threshold_sweep",
    "packing_efficiency_sweep",
    "chat_loss_masking_stats",
    "quality_gate_by_source",
    "curriculum_phase_plan",
    "hybrid_retrieval_overlap",
    "ann_hamming_topk",
    "source_cap_downsample",
    "graph_modularity",
    "near_dup_keep_best",
    "ann_ivfpq_topk",
    "ann_ivfpq_index_topk",
    # round-11: lifecycle / streaming-ingest / eval additions
    "ann_ivf_index_upsert",
    "ann_graph_ooc_index_topk",
    "ann_graph_index_lifecycle",
    "stream_ann_ingest",
    "hard_negative_mining",
    "retrieval_ndcg_eval",
    "quality_score_calibration",
]


def run(spark, fn, sf_dir: str) -> float:
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    n = df.count()  # full execution without driver materialization
    dt = time.monotonic() - t0
    return dt, n


def main() -> None:
    from overseer_spark.queries.catalog import CATALOG

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # warm up the JVM / Arrow / Python-worker pools so the first timed
    # entry is not charged for session startup
    run(spark, CATALOG["dedup_exact_groups"].fn, "/root/testdata/sf0.01")
    run(spark, CATALOG["ann_cosine_topk"].fn, "/root/testdata/sf0.01")
    out = {}
    for name in ENTRIES:
        fn = CATALOG[name].fn
        t_small, n_small = run(spark, fn, "/root/testdata/sf0.1")
        t_big, n_big = run(spark, fn, ".bench_sf1")
        out[name] = {
            "sf0.1_sec": round(t_small, 2),
            "x10_sec": round(t_big, 2),
            "ratio": round(t_big / t_small, 1),
            "rows_small": n_small,
            "rows_big": n_big,
        }
        print(json.dumps({name: out[name]}))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
