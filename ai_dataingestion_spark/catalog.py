"""Operator catalog: the registry behind ``__spark_entry__.queries()``.

Every operator from SURVEY.md §2 registers itself here as a QuerySpec:
a name (the literal §2 ID), a callable ``(spark, sf_dir) -> DataFrame``, and —
for oracle-verified operators — the equivalent DuckDB SQL. The driver runs
both sides at sf0.01 and hash-compares (row count + schema + order-insensitive
value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded to a fixed number of decimals on both sides
  (double summation order differs between engines — SURVEY.md §5.4);
- rankings/top-k always carry a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame operator query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator id: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Operators earlier driver sweeps already verified green on the CURRENT
# corpus. The driver caps its oracle sweep at the FIRST 50 entries of
# queries() per round, so registration order is the coverage rotation knob:
# not-yet-driver-checked operators must come first to earn their green rows.
# Round-5 rotation (VERDICT r4 items 1-2, 4-5): the 49 green rows of
# CORRECTNESS_r04 move into this set; the r4 deferred tier is emptied so
# its 12 locally-green IDs rank 0 into the r5 window alongside the fixed
# text_fingerprint (the one r4 ERR — output shape, now array_join'ed);
# udf_grouped_map / udf_map_in_pandas (evicted from the r4 window, green
# evidence predates the corpus regen) re-check at rank 1; the 3 rows-only
# IDs take rank-2 tail slots for their first driver rows. Remaining window
# slots fall to attested-green rank-4 entries and any round-5 additions
# (which register at rank 0).
_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        # --- round 1 green (still attested: no events dependency) ---
        "agg_groupby", "agg_global", "agg_distinct",
        "agg_having", "agg_rollup", "agg_grouping_sets",
        "agg_percentile", "agg_stats", "agg_collect",
        "agg_top_groups", "agg_arg_minmax",
        "agg_rollup_grouping", "agg_bool", "tpch_q3_shipping_priority",
        "tpch_q5_local_volume", "tpch_q10_returned_items",
        "unpivot_melt",
        "win_nth_value", "join_bucketed", "quality_observe", "join_inner",
        "join_broadcast", "join_left", "join_right", "join_full",
        "join_semi", "join_anti", "join_cross",
        "join_multiway", "join_null_safe", "project_select", "project_cast",
        "filter_pred", "filter_like_regex", "distinct_rows",
        "set_union_distinct", "set_intersect", "set_except", "sort_multi",
        "topk_global",
        # --- round 2 green (still attested) ---
        "dedup_exact", "dedup_ngram_jaccard", "embed_normalize", "fn_array",
        "fn_array_hof", "fn_bitwise", "fn_cond", "fn_date", "fn_hash",
        "fn_math", "fn_null_semantics", "fn_regex",
        "fn_string", "fn_string_parts", "fn_struct_array",
        "fn_trig", "limit_offset", "multimodal_binary_features",
        "multimodal_join", "sentiment_lexicon", "sim_cosine_topk",
        "sim_knn_label", "sim_pair_dedup", "text_clean", "text_langid",
        "text_ngrams", "text_quality_filter", "text_quality_score",
        "text_stopwords", "text_tfidf", "text_token_count", "text_tokenize",
        "udf_pandas_agg",
        "udf_pandas_scalar", "udf_python",
        "win_ntile_dist", "win_rank", "win_running", "win_topk_group",
        # --- round 3 green (checked against the regenerated µs corpus) ---
        "text_lang_stats", "udtf_python", "scan_parquet", "scan_csv",
        "scan_json", "scan_text", "sink_parquet_part", "sink_csv_json",
        "quality_profile", "quality_constraints", "schema_evolve",
        "pipeline_upsert_merge", "pipeline_cdc_diff", "source_stream_file",
        "stream_dedup", "stream_stateful", "stream_sink_parquet",
        "ingest_incremental", "pipeline_e2e_text", "tpch_q6_forecast_revenue",
        "tpch_q14_promo_revenue", "tpch_q7_volume_shipping",
        "subquery_scalar_avg", "agg_median", "agg_weighted_avg",
        "quality_outlier_iqr", "fn_levenshtein_match", "embed_label_centroid",
        "text_keyword_extract", "dedup_cross_source",
        "dedup_cluster_components", "multimodal_frame_sample",
        "stream_static_join", "agg_histogram_bins", "text_pii_scrub",
        "text_chunk_overlap", "split_train_eval", "join_salted_skew",
        "embed_quantize_int8", "text_perplexity_proxy", "tpch_q4_late_orders",
        "tpch_q12_priority_by_flag", "tpch_q13_order_distribution",
        # --- round 4 green (49 rows of CORRECTNESS_r04) ---
        "agg_approx_distinct", "agg_cube", "events_cohort_retention",
        "events_transition_matrix", "events_dau_mau", "join_range",
        "join_asof", "win_lag_lead", "win_moving_range", "win_first_last",
        "fn_timestamp", "dedup_near_minhash", "dedup_simhash",
        "dedup_fingerprint_pairs", "text_containment_pairs",
        "embed_dim_stats", "pipeline_compact_latest", "stream_tumbling",
        "stream_sliding", "stream_session", "events_timeseries_rollup",
        "pipeline_scd2_intervals", "events_anomaly_zscore",
        "tpch_q18_large_orders", "text_contamination_ngram",
        "text_repetition_stats", "dedup_normalized_text",
        "sample_stratified", "pack_context_windows", "agg_mode_per_group",
        "join_interval_overlap", "win_gaps_islands", "quality_domain_cap",
        "text_vocab_growth", "stream_stream_join", "events_sessionize_batch",
        "customer_rfm_segments", "lineitem_abc_pareto",
        "embed_centroid_outliers", "agg_corr_regression", "agg_conditional",
        "agg_salted_skew", "events_funnel", "pivot_wide", "set_union_all",
        "win_moving", "win_lag_default", "fn_map", "fn_json",
    }
)

# Formerly-green oracle-backed IDs whose green rows predate the driver's
# corpus regeneration (stale evidence): re-check them right after the
# rank-0 block. Round 5: only the two UDF-plumbing re-checks evicted from
# the r4 window remain; the other nine earned fresh r4 green rows.
_EVENTS_RECHECK: frozenset[str] = frozenset(
    {
        "udf_grouped_map",
        "udf_map_in_pandas",
    }
)


# Operators added AFTER this round's 50-slot window was finalized: they
# rank behind the rows-only tier so they don't evict the planned re-checks
# mid-round; drop them from this set next round to rotate them into the
# window (they are locally oracle-verified + unit-tested meanwhile).
# Round 5: the r5 window is exactly full (45 rank-0 + 2 re-checks + 3
# rows-only), so every §2.Q addition (operators/round5b.py through
# round6b.py — waves 2-28, 126 oracle + 1 rows-only IDs) defers to the
# r6 window. Each is locally oracle-verified (driver sim at sf0.01 —
# full-loop runs this session, latest: 292 ok / 4 rows-only / 0 fail
# at wave 15; every later wave sim'd green on registration) and swept
# in the Tier-2 parity loop meanwhile.
# ROUND-6 SELF: empty this set so the deferred IDs rank into the r6
# window in registration order. They now span ~3.3 windows (163
# deferred — waves 2-45 — + 2 udf re-checks): r6 takes the first 50 by
# registration index (waves 2-5 plus part of 6), the remainder stays
# rank-0 and automatically fronts the r7/r8/r9 windows — no action
# needed beyond emptying this set each round.
_DEFER_TO_NEXT_ROUND: frozenset[str] = frozenset(
    {
        "tpch_q2_min_cost_supplier",
        "tpch_q21_single_late_supplier",
        "orders_repeat_customer_rate",
        "customer_order_gap_stats",
        "events_attribution_last_touch",
        "events_type_cooccurrence",
        "text_kl_divergence_sources",
        "text_hapax_ratio",
        "dedup_edit_distance_blocked",
        "agg_geo_harmonic_means",
        "quality_null_blank_matrix",
        "embed_label_eta_squared",
        # --- third wave (operators/round5c.py) ---
        "scan_partition_pruned",
        "join_dpp_partitioned",
        "customer_cohort_ltv",
        "orders_basket_size_histogram",
        "brand_copurchase_lift",
        "events_hour_gap_ranges",
        "events_survival_weeks",
        "text_bigram_cond_entropy",
        "fn_string_codec",
        # --- fourth wave (operators/round5d.py) ---
        "agg_chi_square_independence",
        "quality_benford_first_digit",
        "events_autocorrelation_daily",
        "lineitem_discount_quantity_regr",
        "orders_seasonal_index",
        # --- fifth wave (operators/round5e.py) ---
        "tpch_q20_excess_share_suppliers",
        "catalog_table_stats",
        "events_type_day_jaccard",
        "embed_pca_top_component",
        "agg_hll_sketch_merge",  # rows-only: keep it from evicting the
        # three planned rank-2 rows-only checks from the full r5 window
        # --- sixth wave (operators/round5f.py) ---
        "fn_try_safe_arith",
        "scan_csv_malformed_permissive",
        "lineitem_quantity_cusum_shift",
        "events_error_burst_5min",
        # --- seventh wave (operators/round5g.py) ---
        "events_user_lifecycle_states",
        "quality_referential_integrity",
        "events_funnel_time_bounded",
        "dedup_minhash_estimate_error",
        # --- eighth wave (operators/round5h.py) ---
        "win_percentile_disc_vs_cont",
        "events_markov_2step_paths",
        "text_shingle_df_spectrum",
        "pipeline_watermark_lag_report",
        "sim_cosine_range_search",
        # --- ninth wave (operators/round5i.py) ---
        "events_peak_concurrency",
        "events_anomaly_mad",
        "orders_duplicate_invoice_detect",
        "lineitem_ship_latency_by_nation",
        "fn_string_format",
        "events_ab_proportion_ztest",
        # --- tenth wave (operators/round5j.py) ---
        "dedup_lsh_band_tuning",
        "text_collocation_pmi",
        "text_chunk_dup_ratio",
        "scan_parquet_schema_merge",
        "sink_parquet_codecs",
        # --- eleventh wave (operators/round5k.py) ---
        "events_late_arrival_audit",
        "dedup_removal_plan",
        "scan_json_schema_infer",
        "win_range_numeric_frame",
        # --- twelfth wave (operators/round5l.py) ---
        "events_sessions_bounce_rate",
        "embed_label_confusion",
        "brand_pareto_coverage",
        "fn_timezone_convert",
        # --- thirteenth wave (operators/round5m.py) ---
        "events_gap_fill_linear",
        "supplier_hhi_by_nation",
        "multimodal_payload_dedup",
        "events_value_winsorized_stats",
        # --- fourteenth wave (operators/round5n.py) ---
        "udf_python_arrow",
        "sink_write_modes",
        "subquery_not_in_null_trap",
        "quality_schema_contract",
        # --- fifteenth wave (operators/round5o.py) ---
        "sink_csv_quoted_roundtrip",
        "events_pre_post_welch_t",
        "win_running_distinct",
        "dedup_incremental_batch",
        # --- sixteenth wave (operators/round5p.py) ---
        "pipeline_idempotent_ledger",
        "sample_k_per_group_stable",
        "fn_content_uuid",
        "events_cep_triple_pattern",
        # --- seventeenth wave (operators/round5q.py) ---
        "graph_copurchase_triangles",
        "scan_text_wholefile",
        "events_seasonal_naive_backtest",
        "topk_per_group_strategies",
        # --- eighteenth wave (operators/round5r.py) ---
        "events_top_session_paths",
        "events_attribution_linear",
        "events_time_to_convert_quantiles",
        "pipeline_compaction_planner",
        # --- nineteenth wave (operators/round5s.py) ---
        "fn_array_set_ops",
        "scan_binary_files",
        "fn_iso_week_parity",
        "agg_equidepth_histogram",
        # --- twentieth wave (operators/round5t.py) ---
        "events_alert_rules",
        "agg_empty_relation_semantics",
        "win_default_frame_ties",
        "text_js_divergence_pairwise",
        # --- twenty-first wave (operators/round5u.py) ---
        "text_bm25_topk",
        "search_inverted_index_and_query",
        "multimodal_coverage_audit",
        "events_rolling_7d_active_users",
        # --- twenty-second wave (operators/round5v.py) ---
        "lineitem_abc_xyz_matrix",
        "embed_mmr_select",
        "part_single_source_risk",
        "dedup_partition_invariance",
        # --- twenty-third wave (operators/round5w.py) ---
        "agg_partial_merge_proof",
        "events_transition_dwell_stats",
        "pipeline_shard_manifest",
        "supplier_quadrant_classification",
        # --- twenty-fourth wave (operators/round5x.py) ---
        "embed_index_upsert_refresh",
        "quality_ks_two_sample",
        "sort_keyset_pagination",
        "orders_fiscal_calendar_rollup",
        # --- twenty-fifth wave (operators/round5y.py) ---
        "fn_business_days_diff",
        "fn_minmax_scale_check",
        "text_readability_score",
        "orders_ytd_vs_prior_year",
        # --- twenty-sixth wave (operators/round5z.py) ---
        "text_vocab_oov_rate",
        "join_asof_directions",
        "quality_key_sequence_gaps",
        "pipeline_retention_gc_plan",
        # --- twenty-seventh wave (operators/round6a.py) ---
        "events_diff_in_differences",
        "lineitem_price_index",
        "sink_file_layout_audit",
        "text_batch_novelty_rate",
        # --- twenty-eighth wave (operators/round6b.py) ---
        "events_cuped_adjustment",
        "agg_log2_histogram",
        "supplier_scorecard_composite",
        "events_sample_size_calc",
        # --- twenty-ninth wave (operators/round6c.py) ---
        "quality_psi_drift",
        "agg_median_of_means",
        "dedup_representative_selection",
        # --- thirtieth wave (operators/round6d.py) ---
        "orders_moving_annual_total",
        "events_session_depth_survival",
        "events_session_gap_sensitivity",
        "text_token_length_histogram",
        # --- thirty-first wave (operators/round6e.py) ---
        "text_rank_stability_spearman",
        "events_longest_same_type_run",
        "embed_dim_corr_pairs",
        "scan_csv_column_reorder",
        # --- thirty-second wave (operators/round6f.py) ---
        "events_wow_change_contributions",
        "trade_flow_nation_matrix",
        "sort_null_ordering",
        "pipeline_resume_watermark",
        # --- thirty-third wave (operators/round6g.py) ---
        "dedup_eval_precision_recall",
        "agg_weighted_median",
        "text_topk_coverage_curve",
        # --- thirty-fourth wave (operators/round6h.py) ---
        "orders_open_backlog_sweepline",
        "graph_pagerank_trade",
        "orders_priority_mix_shift",
        "quality_contingency_residuals",
        # --- thirty-fifth wave (operators/round6i.py) ---
        "part_skyline_price_size",
        "agg_theil_decomposition",
        "events_rolling_corr_daily",
        # --- thirty-sixth wave (operators/round6j.py) ---
        "dedup_cdc_chunking",
        "quality_column_entropy_profile",
        "events_interarrival_burstiness",
        # --- thirty-seventh wave (operators/round6k.py) ---
        "customer_segment_migration",
        "events_kaplan_meier_daily",
        "agg_bootstrap_mean_ci",
        # --- thirty-eighth wave (operators/round6l.py) ---
        "embed_prefix_energy_fraction",
        "lineitem_wilson_ci_return_rate",
        "join_strategy_equivalence",
        # --- thirty-ninth wave (operators/round6m.py) ---
        "join_epsilon_float",
        "events_max_sliding_hour_rate",
        "sink_dynamic_partition_overwrite",
        # --- fortieth wave (operators/round6n.py) ---
        "stream_foreachbatch_upsert",
        "agg_stratified_estimator_variance",
        "events_pchart_error_rate",
        # --- forty-first wave (operators/round6o.py) ---
        "events_pit_training_features",
        "embed_sign_hamming_separation",
        "orders_hierarchy_share_of_parent",
        # --- forty-second wave (operators/round6p.py) ---
        "events_markov_entropy_rate",
        "embed_pq_reconstruction_error",
        "sink_csv_gzip_roundtrip",
        # --- forty-third wave (operators/round6q.py) ---
        "text_naive_bayes_source_classifier",
        "orders_seasonal_decomposition_additive",
        "fn_json_nested_roundtrip",
        # --- forty-fourth wave (operators/round6r.py) ---
        "orders_fulfillment_vintage_curves",
        "fn_array_reduce_horner",
        "events_circular_time_stats",
        # --- forty-fifth wave (operators/round6s.py) ---
        "win_loo_outlier_zscore",
        "agg_cube_margin_consistency",
        # --- forty-sixth wave (operators/round6t.py) ---
        "events_ab_srm_check",
        "quality_fd_discovery",
        "catalog_temporal_coverage",
        # --- forty-seventh wave (operators/round6u.py) ---
        "orders_simpsons_reversal_check",
        "pipeline_cdc_column_breakdown",
        # --- forty-eighth wave (operators/round6v.py) ---
        "quality_table_fingerprint",
    }
)


def _rotation_rank(spec: QuerySpec) -> int:
    """0 = unchecked with oracle (front of the driver window), 1 = stale
    events-touching green needing re-check, 2 = unchecked rows-only,
    3 = deferred-to-next-round additions, 4 = attested driver-green
    (back of the line)."""
    if spec.name in _EVENTS_RECHECK:
        return 1
    if spec.name in _DEFER_TO_NEXT_ROUND:
        return 3
    if spec.name in _DRIVER_CHECKED:
        return 4
    return 0 if spec.oracle is not None else 2


def all_specs() -> dict[str, QuerySpec]:
    """All registered operators, ordered for the driver's 50-query sweep
    window (imports the operator packages on demand)."""
    import ai_dataingestion_spark.operators  # noqa: F401  (self-registers)

    ordered = sorted(
        enumerate(_REGISTRY.values()), key=lambda t: (_rotation_rank(t[1]), t[0])
    )
    return {spec.name: spec for _, spec in ordered}


def queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: v.oracle for k, v in all_specs().items() if v.oracle is not None}
