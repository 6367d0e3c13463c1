#!/usr/bin/env python
"""Regenerate COVERAGE.md from the registry (run after adding keys).

Fails if any registered key is missing from the section map below — the
map IS the SURVEY.md §2 traceability record, so additions must be placed
deliberately.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from correlationapi_spark.registry import load_registry

SECTIONS = {
    "§2.1 Scans/sources/sinks": [
        "q_scan_parquet", "q_scan_pruned", "q_scan_csv", "q_scan_json",
        "q_scan_orc", "q_sink_parquet_roundtrip", "q_scan_partition_pruned", "q_scan_binaryfile", "q_scan_csv_malformed", "q_scan_schema_evolution",
    ],
    "§2.2 Projections/filters": [
        "q_project_arith", "q_filter_cmp", "q_filter_bool", "q_filter_in",
        "q_filter_between", "q_filter_like", "q_filter_null", "q_case_when", "q_cast",
        "q_subquery_scalar", "q_subquery_correlated",
    ],
    "§2.3 Joins": [
        "q_join_inner", "q_join_multi", "q_join_left", "q_join_full", "q_join_semi",
        "q_join_anti", "q_join_cross", "q_join_theta", "q_join_range", "q_join_asof", "q_join_asof_nearest", "q_join_interval",
        "q_join_broadcast", "q_join_bucketed", "q_join_salted", "q_join_asof_tolerance", "q_join_null_safe",
    ],
    "§2.4 Aggregations + correlation": [
        "q_agg_global", "q_agg_group", "q_agg_having", "q_agg_distinct",
        "q_agg_approx_distinct", "q_agg_rollup", "q_agg_cube", "q_agg_gsets", "q_agg_grouping_id",
        "q_agg_stats", "q_agg_percentile", "q_agg_approx_percentile", "q_agg_collect",
        "q_agg_histogram", "q_agg_first_last", "q_agg_corr", "q_agg_covar", "q_corr_matrix",
        "q_corr_spearman", "q_ts_resample", "q_ts_rollup", "q_corr_rolling", "q_corr_lagged", "q_flagship",
        "q_agg_mode", "q_agg_salted", "q_agg_weighted", "q_agg_hll_merge", "q_agg_theta_sets", "q_agg_quantile_merge", "q_agg_freq_items", "q_corr_matrix_spearman", "q_corr_matrix_kendall", "q_corr_xcorr", "q_corr_kendall", "q_corr_cramer", "q_corr_eta", "q_corr_partial", "q_corr_semipartial", "q_corr_spearman_grouped",
        "q_pacf", "q_corr_partial2", "q_ljung_box", "q_win_slope", "q_win_zscore",
        "q_corr_ci", "q_corr_pointbiserial", "q_theil_u", "q_mutual_info",
        "q_agg_regr", "q_agg_mean_family", "q_agg_moments", "q_agg_gini", "q_agg_trimmed_mean", "q_ts_ewma", "q_ts_fill_grouped", "q_ts_interpolate",
        "q_corr_weighted", "q_corr_bicor", "q_corr_distance", "q_ks_test", "q_mannwhitney", "q_ttest_welch", "q_anova", "q_levene", "q_prop_ztest", "q_seasonality", "q_drift_daily", "q_drift_psi", "q_drift_js", "q_drift_cusum", "q_drift_chi2", "q_ols_daily", "q_ols_dw", "q_ols_multi2", "q_forecast_naive", "q_ts_holt", "q_ts_holtwinters", "q_assoc_mixed", "q_corr_icc", "q_cronbach_alpha", "q_corr_ccc", "q_corr_kappa", "q_ts_trend", "q_agg_entropy",
        "q_jarque_bera", "q_cohens_d", "q_corr_gamma", "q_tukey_hsd", "q_agg_bool",
        "q_agg_extremes_by", "q_percentile_weighted", "q_ts_decompose",
        "q_agg_bitmap_distinct", "q_ts_anomaly_seasonal", "q_corr_matrix_gram",
    ],
    "§2.5 Window functions": [
        "q_win_rownum", "q_win_rank", "q_win_lag", "q_win_frame_rows",
        "q_win_frame_range", "q_win_time_range", "q_win_firstlast", "q_topk_group",
        "q_win_distribution", "q_win_median", "q_win_share", "q_win_ntile", "q_win_cumulative_distinct",
    ],
    "§2.6 Sorts/limits": ["q_sort_multi", "q_limit_topk", "q_limit_offset"],
    "§2.7 Set operations": ["q_set_union", "q_set_intersect", "q_set_intersect_all", "q_set_except", "q_distinct", "q_unpivot"],
    "§2.8 Scalar functions": [
        "q_fn_string", "q_fn_date", "q_fn_math", "q_fn_array", "q_fn_array_explode",
        "q_fn_array_hof", "q_fn_map", "q_fn_json", "q_fn_cond", "q_fn_hash",
        "q_fn_hash_spark", "q_fn_try", "q_fn_bitwise", "q_fn_url", "q_fn_regexp", "q_fn_format", "q_fn_variant",
        "q_cpu_fold",
    ],
    "§2.9 LLM-pipeline (north-star)": [
        "q_dedup_exact", "q_dedup_keep_best", "q_dedup_incremental", "q_dedup_ngram", "q_dedup_near", "q_dedup_simhash",
        "q_dedup_cluster", "q_contamination", "q_dedup_url",
        "q_dedup_embed", "q_dedup_embed_lsh", "q_sim_topk", "q_sim_assign", "q_sim_topk_lsh", "q_sim_topk_ivf", "q_sim_topk_pq", "q_sim_topk_ivfpq", "q_sim_index_append", "q_sim_pairs", "q_sim_pairs_lsh", "q_embed_norm", "q_embed_quantize",
        "q_text_stats", "q_text_tfidf", "q_text_ngram", "q_text_sentiment",
        "q_text_langid", "q_text_quality", "q_text_readability", "q_text_fingerprint", "q_text_winnow", "q_text_tokens_bpeish",
        "q_text_repetition", "q_text_keyword", "q_text_boilerplate", "q_quality_pipeline", "q_pipeline_pretrain", "q_text_perplexity", "q_embed_centroid", "q_embed_pca", "q_embed_pq", "q_embed_knn_graph", "q_text_bpe_train",
        "q_vocab_coverage", "q_text_zipf",
        "q_split_stable", "q_split_hash", "q_sample_stratified", "q_sample_fraction", "q_sample_reservoir",
        "q_sample_weighted", "q_sample_balanced", "q_sample_systematic", "q_sample_cluster", "q_domain_mix", "q_sample_temperature",
        "q_multimodal_meta", "q_multimodal_frames", "q_multimodal_phash", "q_multimodal_resize", "q_dedup_image", "q_pack_chunks",
        "q_pack_bpeish", "q_pack_bpe", "q_pack_bestfit", "q_cluster_kmeans_step",
        "q_text_gopher", "q_text_bigram_lm", "q_text_bigram_kn", "q_text_hashing_trick", "q_text_pii_scrub", "q_text_compress_ratio", "q_multimodal_audio_spectral",
    ],
    "§2.10 Streaming (batch-equivalent declared forms)": [
        "q_stream_tumbling", "q_stream_sliding", "q_stream_session", "q_stream_dedup",
        "q_stream_static_join", "q_stream_stream_join", "q_stream_stateful", "q_stream_corr", "q_stream_drift_psi",
    ],
    "§2.11 UDF/UDAF/UDTF": [
        "q_udf_python", "q_udf_pandas", "q_udf_arrow", "q_udaf_grouped", "q_udaf_agg",
        "q_sim_topk_pandas", "q_udtf_tokens",
    ],
    "Composed user-level queries (beyond §2: TPC-H shapes, pivot)": [
        "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
        "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9",
        "q_tpch_q10", "q_tpch_q11", "q_tpch_q12", "q_tpch_q13", "q_tpch_q14",
        "q_tpch_q15", "q_tpch_q16", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19",
        "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
        "q_pivot",
    ],
    "Event analytics (beyond §2: product-analytics surface)": [
        "q_funnel", "q_funnel_window", "q_event_path", "q_event_transitions", "q_event_markov_stationary", "q_event_dau_wau", "q_event_pareto", "q_graph_pagerank", "q_graph_degree", "q_graph_triangles", "q_graph_jaccard", "q_graph_assortativity", "q_graph_kcore", "q_attribution", "q_attribution_multi", "q_retention", "q_anomaly", "q_anomaly_mad", "q_session_stats", "q_profile", "q_cdc_merge", "q_scd2", "q_scd2_merge", "q_fk_integrity", "q_basket_lift", "q_rfm", "q_gaps_islands", "q_benford", "q_survival_km", "q_survival_logrank",
    ],
}


def main() -> None:
    r = load_registry()
    listed = [k for ks in SECTIONS.values() for k in ks]
    assert set(listed) == set(r), f"section map out of sync: {set(listed) ^ set(r)}"

    lines = [
        "# COVERAGE — declared inventory vs SURVEY.md §2",
        "",
        "Generated by tools/gen_coverage.py from `correlationapi_spark.registry`.",
        "Every key is driver-checked: **oracle** = exact DuckDB hash-match at",
        "sf0.01; **rows-only** = no exact cross-engine oracle exists (reason",
        "recorded in the QuerySpec and backed by a unit test in",
        "`tests/test_rowsonly.py`).",
        "",
    ]
    n_oracle = 0
    for sec, keys in SECTIONS.items():
        lines += [f"## {sec}", "", "| key | check | module | doc |", "| --- | --- | --- | --- |"]
        for k in keys:
            s = r[k]
            mode = "oracle" if s.oracle else "rows-only"
            n_oracle += s.oracle is not None
            mod = s.fn.__module__.replace("correlationapi_spark.", "")
            doc = (s.doc or "").replace("|", "/")[:90]
            lines.append(f"| `{k}` | {mode} | `{mod}` | {doc} |")
        lines.append("")
    lines.append(f"**Totals: {len(r)} keys — {n_oracle} oracle-checked, {len(r) - n_oracle} rows-only.**")
    lines += [
        "Validation record: `tools/check.py` sweeps are logged in",
        "BENCHLOG.md per round (which keys, which scale factors, the",
        "failure count) — the generated table above lists DECLARED keys;",
        "the sweep log is the evidence a given key count was actually",
        "run green (review r07: an unconditional claim here would",
        "auto-renew for keys added after the last recorded sweep).",
    ]
    lines += [
        "",
        "Beyond the keyed inventory, the service surface has three entry",
        "points: the Python API (`api.CorrelationAPI`), the CLI (`python -m",
        "correlationapi_spark …`), and the REST listener (`http_api.py`,",
        "stdlib `http.server`, `python -m correlationapi_spark serve`),",
        "covering the reference's HTTP consumption model end to end.",
    ]
    lines += ["", "Rows-only reasons:", ""]
    for k, s in sorted(r.items()):
        if s.oracle is None:
            lines.append(f"- `{k}`: {s.rows_only_reason}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"COVERAGE.md: {len(r)} keys, {n_oracle} oracled")


if __name__ == "__main__":
    main()
