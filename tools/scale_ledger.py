#!/usr/bin/env python3
"""Build the 100x coverage ledger (VERDICT r18 item 6) into BENCH_SCALE.json.

Usage: python3 tools/scale_ledger.py <oracle_sql.json>

Classifies EVERY registry row as either `covered` (it has a measured
100x-probe entry in one of BENCH_SCALE.json's data_factor=100 runs) or
`exempt` with a per-family structural reason naming the covered family
representatives. The result lands under the top-level key
`coverage_ledger` with a `families` reason table, so the classification is
one artifact, auditable row by row. Dev tool only (driver-independent).
"""
import json
import sys

FAMILIES = {
    "interchange-roundtrip": (
        "fixed-size interchange fixtures (5-25 row CSV/JSON/jsonl.gz/text/"
        "ORC/mergeSchema/corrupt-quarantine round-trips written by the query "
        "itself) - input does not scale with the corpus by construction; the "
        "corpus-scan path is covered by scan_parquet_full"),
    "scan-linear": (
        "single-pass projected/pruned/blob scans - cost is scan-volume-"
        "linear by definition (PushedFilters/ReadSchema plan-pinned); "
        "representative scan_parquet_full covered at 100x"),
    "sink": (
        "write-volume-linear sinks and reader-flag data-skipping proofs "
        "over staged layouts; covered representatives: sink_zorder_skipping "
        "(write-volume-linear, 30.9 @100x), sink_incremental_agg_maintain, "
        "sink_dynamic_partition_overwrite + sink_metrics_compact_serve "
        "(wave 3)"),
    "join": (
        "single-shuffle (or broadcast/bucketed/DPP no-shuffle) equi-, "
        "range- and as-of joins on the declared keys - shuffle-volume-"
        "linear; covered representatives: join_bucketed_colocated, "
        "sql_flagship_twin, join_star_multiway (wave 3)"),
    "agg-fold": (
        "partial-aggregating single-exchange folds (map-side combine, one "
        "row per group shuffles); covered representatives: agg_groupby_hash, "
        "agg_salted_skew, agg_skew_kurtosis, agg_weighted_median, "
        "agg_bootstrap_ci, agg_mad_robust + wave-3 agg_mse_loss/"
        "agg_unpivot_stack/agg_freq_items_misra_gries"),
    "window": (
        "per-user/series windowed ops sharing the ONE user_id exchange with "
        "bounded frames - exchange-volume-linear; covered representatives: "
        "window_moving_avg, window_bollinger_bands + wave-3 "
        "window_ntile_split; funnel rows share the same exchange shape"),
    "map-side": (
        "codegen'd map-side projections/filters with scan pushdown and no "
        "exchange (PlanInvariantSpec pins the plan shape) - trivially "
        "scan-linear; covered representatives: clean_impute_neighborhood_"
        "clip, ml_zscore_standardize (wave 3)"),
    "topk-setop": (
        "distributed TakeOrderedAndProject top-k / single-exchange set ops "
        "- per-partition heads only; sort_multi_key adjudicated linear at "
        "30x by isolated re-measure (run 12 flag_adjudication)"),
    "streaming": (
        "watermark-bounded keyed state on the profiled micro-batch "
        "machinery floor (StreamFloorProfile); covered representatives: the "
        "full stream-stream join family, stream_cdc_upsert_sink, "
        "stream_restart_exactly_once, stream_cusum_alert + 8 wave-3 "
        "streaming rows"),
    "ml-model-bound": (
        "fixed model-tensor geometry (8-64 sequence/matrix rows, bounded "
        "dims) - cost is model-bound, not corpus-bound; the corpus-fed "
        "trainers ARE the scale surface and are covered: ml_train_adam_"
        "iterations, ml_conv_train_gd, ml_kfold_cv, ml_linreg_normal_eq, "
        "ml_pca_power_iteration, ml_transformer_block_forward + wave-3 "
        "ml_train_gd_iterations/ml_kmeans_iterations/ml_kmeans_mllib/"
        "ml_gbt_boost_round"),
    "ml-corpus-fold": (
        "single-fold scans/groupBys over events/embeddings (the agg-fold "
        "shape, often output-linear by declaration); covered "
        "representatives: ml_quantize_int8, ml_dpo_pair_loss + wave-3 "
        "ml_cnn_infer_render/ml_cnn_forward_compose/ml_onehot_encode/"
        "ml_naive_bayes_lang/ml_histogram_split_finding"),
    "text-dedup-curation": (
        "corpus folds ONCE to vocabulary/model-sized tables (Zipf-bounded) "
        "or bounded-slice/banded pairwise confirms - text never shuffles in "
        "any gate; covered representatives: text_tokenize_wordcount, "
        "text_cooccur_pmi, text_unigram_train, dedup_minhash_lsh/_mllib, "
        "dedup_repeated_spans, dedup_suffix_array_rank, dedup_cc_clusters, "
        "dedup_semantic_embcluster, all 3 perplexity gates, "
        "corpus_token_budget_mix + wave-3 text_bpe_train_merges/"
        "text_bpe_encode_tokens/decontaminate_ngram_overlap/"
        "dedup_incremental_bloom"),
    "sim-multimodal": (
        "bounded query slices over ANN indexes whose BUILD and partitioned "
        "layouts are covered (sim_ann_pq/opq/ivfpq, sim_hybrid_rrf, "
        "sim_ann_graph_greedy + AnnBuildBench build probe) + wave-3 "
        "sim_ann_lsh_topk/multimodal_image_phash; multimodal decode rows "
        "are per-row map work (stubbed decode) - scan-linear"),
    "graph": (
        "iterative one-equi-join+fold rounds over the localCheckpointed "
        "trade/knn graphs; covered representatives: graph_pagerank_unrolled, "
        "graph_label_propagation, graph_kcore_prune, graph_scc_knn, "
        "graph_hits_hubs_auth, graph_knn_triangles, graph_bipartite_"
        "copurchase + wave-3 graph_bfs_frontier"),
}

# Ordered (predicate, family) rules; first match wins.
RULES = [
    (lambda q: q in {
        "scan_csv_roundtrip", "scan_json_roundtrip", "scan_jsonl_gzip",
        "scan_text_lines", "scan_orc_roundtrip", "scan_merge_schema",
        "scan_corrupt_tolerant", "scan_npz_roundtrip"},
     "interchange-roundtrip"),
    (lambda q: q.startswith("scan_"), "scan-linear"),
    (lambda q: q.startswith("sink_"), "sink"),
    (lambda q: q.startswith("join_"), "join"),
    (lambda q: q in {
        "project_select_channel", "filter_range_validity",
        "filter_compound_or", "clip_least_greatest", "impute_when_otherwise",
        "clean_impute_neighborhood_clip", "dropna_invalid_rows",
        "ml_zscore_standardize", "scalar_minmax_normalize"} or
        q.startswith("scalar_"), "map-side"),
    (lambda q: q.startswith("agg_"), "agg-fold"),
    (lambda q: q.startswith("window_") or q.startswith("funnel_"), "window"),
    (lambda q: q in {
        "sort_multi_key", "limit_head", "union_all_concat",
        "except_holdout", "intersect_common"}, "topk-setop"),
    (lambda q: q.startswith("stream_"), "streaming"),
    (lambda q: q in {
        "ml_layernorm_rmsnorm", "ml_rope_rotate", "ml_attention_entropy",
        "ml_kv_cache_decode", "ml_lora_matvec", "ml_moe_route_top2",
        "ml_mlp_gelu_forward", "ml_topp_nucleus_sample",
        "ml_speculative_decode_accept", "ml_beam_search_decode",
        "ml_temperature_calibrate", "ml_embedding_whitening",
        "ml_infonce_contrastive", "ml_train_logreg_gd",
        "ml_train_eval_epochs", "ml_train_checkpoint_resume",
        "ml_als_step", "ml_gbt_boost_round"}, "ml-model-bound"),
    (lambda q: q.startswith("ml_"), "ml-corpus-fold"),
    (lambda q: q.startswith(("text_", "dedup_", "corpus_", "curation_",
                             "decontaminate_", "seq_", "vocab_",
                             "sample_")), "text-dedup-curation"),
    (lambda q: q.startswith(("sim_", "multimodal_")), "sim-multimodal"),
    (lambda q: q.startswith("graph_"), "graph"),
]


def main():
    registry = sorted(json.load(open(sys.argv[1])))
    path = "BENCH_SCALE.json"
    d = json.load(open(path))
    covered = {}
    for i, r in enumerate(d["runs"]):
        if r.get("data_factor") == 100 and isinstance(r.get("queries"), dict):
            for q in r["queries"]:
                covered.setdefault(q, i)
    rows = {}
    n_cov = n_ex = 0
    for q in registry:
        if q in covered:
            rows[q] = {"status": "covered", "run_index": covered[q]}
            n_cov += 1
        else:
            fam = next((f for pred, f in RULES if pred(q)), None)
            if fam is None:
                print(f"ERROR: no family rule for {q}", file=sys.stderr)
                sys.exit(1)
            rows[q] = {"status": "exempt", "family": fam}
            n_ex += 1
    d["coverage_ledger"] = {
        "round": 19,
        "note": (
            "VERDICT r18 item 6: every registry row classified covered "
            "(a measured 100x entry in one of this file's data_factor=100 "
            "runs, referenced by run_index) or exempt with a per-family "
            "structural reason naming covered representatives (the "
            "`families` table). Regenerate with tools/scale_ledger.py "
            "after adding probe runs."),
        "n_registry": len(registry),
        "n_covered": n_cov,
        "n_exempt": n_ex,
        "families": FAMILIES,
        "rows": rows,
    }
    json.dump(d, open(path, "w"), indent=1)
    print(f"ledger: {n_cov} covered, {n_ex} exempt, {len(registry)} total")
    from collections import Counter
    print(Counter(v.get("family") for v in rows.values()
                  if v["status"] == "exempt"))


if __name__ == "__main__":
    main()
