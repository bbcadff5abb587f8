"""Query registry — the single source of truth wiring the engine's
operator surface (SURVEY.md §2.B) to the driver contract in
``__spark_entry__.py``.

Every operator the engine claims is registered here with
  * a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
  * (when SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle.

Determinism contract (the driver hashes values order-insensitively but
exactly): every registered query must produce a bit-stable row multiset.
See ``compat.py`` for the decimal/rounding helpers that make float
aggregates reproducible across Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")

        # Driver-compat output layer (compat.py module doc): every
        # registered query's final DECIMAL columns become DOUBLE on both
        # engines so the driver's pandas canonicalizer sees identical
        # dtypes. No-op for queries without decimal outputs.
        from nchu_bigdata_spark.compat import finalize_oracle, finalize_output

        def final_fn(spark: SparkSession, sf_dir: str, _fn: QueryFn = fn) -> DataFrame:
            # Queries run under caller-owned sessions (the driver's);
            # pin the runtime confs that change result SEMANTICS so
            # behavior can't drift with the caller's defaults: UTC
            # session clock (timestamp bucketing/formatting), ANSI off
            # (permissive casts, matching both the reference's
            # Double.parseDouble semantics and the DuckDB oracles as
            # written), Arrow on (the pandas-UDF operators assume
            # vectorized transfer).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.ansi.enabled", "false")
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
            # Plan-choice confs, re-pinned to the engine's declared
            # values (session.PLAN_CONF_PINS — the same single source
            # get_session builds with): a query that overrides them for
            # its own demonstration (e.g. join_bloom_prune disables
            # broadcast so the runtime bloom filter can inject) must
            # stay overridden through its OWN lazy execution, so it
            # can't restore them itself — instead every query entry
            # re-pins, bounding any override's blast radius to exactly
            # one query.
            from nchu_bigdata_spark.session import PLAN_CONF_PINS

            for k, v in PLAN_CONF_PINS.items():
                spark.conf.set(k, v)
            return finalize_output(_fn(spark, sf_dir))

        final_fn.__name__ = fn.__name__
        final_fn.__doc__ = fn.__doc__
        final_fn.__wrapped__ = fn

        REGISTRY[name] = QuerySpec(
            name=name,
            fn=final_fn,
            oracle=finalize_oracle(oracle) if oracle is not None else None,
            tags=tags,
            doc=doc or (fn.__doc__ or ""),
        )
        return fn

    return deco


# Driver presentation order. The driver checks the FIRST 50 registered
# queries each round; rotating this list is how every SURVEY §2.B id
# accumulates a driver CORRECTNESS row across rounds. History: r1
# relational/join/agg/fn/stream/sub; r2 window/UDF/dedup/similarity/
# kmeans/text/multimodal/pipeline; r3 the remainder (7 events queries
# errored on the TIMESTAMP_NTZ read, since fixed); r4 re-confirmed the
# errored 7 + refreshed every round-2-signal id; r5 covered the 10 new
# ids + 5 changed plans + all 35 r3-signal ids (50 checked, 0 fail).
# Round 7's window (VERDICT r6 item 1 — certify the 41 round-6-born
# ids): (a) the 6 ids whose code or oracle changed in r7 (agg_approx's
# bounded-verdict oracle; exact-integer reworks of agg_percentile_exact
# / agg_corr / agg_regression; text_collocation_pmi's lift statistic;
# stream_cdc_upsert's value-tiebreak oracle — ADVICE r6 closures), then
# (b) the 2 r4-stale ids displaced from the r6 window, then (c) the 36
# remaining round-6-born ids with no driver row yet, then (d) 6 of the
# oldest r5-green refreshes. The r6-window ids (fresh r6 greens) and
# the rest of the r5 greens rotate behind the marker for r8. R7's
# window came back 46 green + 4 no_oracle (the by-design rows-only
# ids), so every r6-born id now holds an official green row. Round 8's
# window: the 24 round-7-born ids (including all 5 ADVICE-r7-fixed
# ones, certifying under the fixed shapes), agg_sketch_merge under its
# new bounded-verdict oracle, any new r8-born ids, then the oldest
# (r5-signal) refreshes to fill 50.
DRIVER_ORDER = [
    # -- round-8 window: born in round 7, no driver row yet (the
    #    round bar's remaining gap); the 5 ADVICE-r7-fixed ids are
    #    all in this group, certifying under the fixed shapes --
    "tpch_q8",
    "tpch_q9",
    "tpch_q20",
    "tpch_q2",
    "text_line_dedup",
    "mixture_weights",
    "embed_covariance",
    "project_unpivot",
    "tokenize_chunk_overlap",
    "fn_bitwise",
    "win_fill_forward",
    "agg_mode",
    "scan_csv_corrupt",
    "graph_bfs",
    "text_heavy_hitters",
    "ts_resample",
    "sample_importance",
    "table_diff",
    "fn_url",
    "sim_mips",
    "sort_zorder",
    "agg_histogram",
    "events_rfm",
    "agg_argmax",
    # -- oracle reshaped in round 8 (bounded-verdict form closes
    #    the last structural no_oracle; certify under it) --
    "agg_sketch_merge",
    # -- born in round 8: certify immediately --
    "stats_profile",
    "sub_any_all",
    "scan_schema_evolution",
    "dedup_edit_distance",
    "embed_norm_stats",
    "tokenize_vocab_coverage",
    "events_ab_test",
    "ts_ewma",
    "win_running_distinct",
    "dedup_containment",
    "join_null_safe",
    "fn_conditional",
    "graph_degree_distribution",
    "sample_split",
    "win_rolling_median",
    "scan_binary_files",
    "agg_approx_topk",
    "events_active_users",
    "agg_moments",
    "stream_enrich_static",
    "agg_predicates",
    "rollup_incremental",
    "topk_percent",
    "events_gap_detect",
    "events_inter_arrival",
    # -- born late in round 8 (after the 50-window filled): first in
    #    line for the round-9 rotation. R9 window plan: these 11, then
    #    the 14 certifiable late-r8 ids below (sub_division ..
    #    sample_negatives, minus multimodal_audio_stats — rows-only by
    #    design, it can never hash-certify), then the round-8
    #    session-2-born ids (graph_connected_components ..
    #    graph_label_propagation, ~36 ids interleaved further down in
    #    this list) — more than one 50-window, so the session-2 tail
    #    (whatever r9's window can't fit) leads r10's. Oldest
    #    refreshes resume after the backlog clears. --
    "agg_skyline",
    "win_streak",
    "win_lorenz",
    "ts_interpolate",
    "text_diversity",
    "sample_poisson",
    "events_overlap_matrix",
    "curate_domain_balance",
    "scan_partition_pruned",
    "events_forecast_snaive",
    "orders_cohort_ltv",
    "sub_division",
    "agg_string_agg",
    "fn_hash",
    "dq_constraints",
    "events_seasonality",
    "events_attribution",
    "dedup_prefix",
    "graph_neighbor_jaccard",
    "scan_nested_json",
    "fn_regex",
    "agg_weighted",
    "multimodal_audio_stats",
    "basket_rules",
    "agg_cube",
    "sample_negatives",
    "events_trigram_paths",
    "events_burstiness",
    "ts_autocorr",
    "orders_fulfillment_lag",
    "text_k_anonymity",
    "agg_countmin",
    "sample_temperature",
    "graph_kcore_peel",
    "dedup_url",
    "ts_drawdown",
    "events_stickiness",
    "stream_topk",
    "join_asof_nearest",
    "dq_drift",
    "embed_outliers",
    "join_asof_tolerance",
    "events_concurrency",
    "orders_market_share",
    "dq_freshness",
    "events_bounce",
    "ts_mad_anomaly",
    "agg_benford",
    "dedup_bloom",
    "events_session_hist",
    "orders_abc_class",
    "events_new_vs_returning",
    "text_readability",
    "graph_sssp_weighted",
    "orders_hhi",
    "dq_embed_drift",
    "dedup_recall_eval",
    "graph_assortativity",
    "curate_funnel_report",
    "orders_customer_migration",
    "events_lateness_profile",
    "sample_group_holdout",
    "sim_ivf_balance",
    "dedup_cluster_stats",
    "graph_clustering_coeff",
    "events_conversion_lag",
    "fn_surrogate_key",
    "orders_backlog",
    "graph_link_predict",
    "ts_changepoint",
    "sample_time_split",
    "curate_canonical",
    "agg_winsorized_mean",
    "win_rolling_regression",
    "sample_balanced",
    "ts_decompose",
    "dedup_threshold_sweep",
    "graph_modularity",
    "multimodal_phash_clusters",
    "win_ohlc_bars",
    "orders_reorder_rate",
    "events_hazard_rate",
    "graph_random_walk",
    "table_fingerprint",
    "dq_referential_integrity",
    "win_cusum_chart",
    "join_pit_scd2",
    "multimodal_audio_vad",
    "dedup_band_tuning",
    "events_did",
    "sample_kfold",
    "scan_txn_log",
    "graph_ego_features",
    "orders_margin_waterfall",
    "events_incidents",
    "orders_supplier_scorecard",
    "tokenize_truncation_audit",
    "stream_ohlc",
    "text_rake_keyphrases",
    "ts_densify",
    "text_lang_confusion",
    "agg_weighted_percentile",
    "events_decay_attribution",
    "multimodal_image_stats",
    "scan_mor_deletes",
    "events_slo_burn",
    "dedup_agreement",
    "orders_aging_wip",
    "embed_separability",
    "multimodal_scene_changes",
    "fn_fiscal_calendar",
    "orders_pvm_variance",
    "set_except_all",
    "sample_smote_midpoints",
    "events_bot_flags",
    "events_srm_check",
    "win_mtd_ytd",
    "text_code_detection",
    "sim_nprobe_sweep",
    "orders_xyz_class",
    "sample_class_weights",
    "events_growth_accounting",
    "sample_hard_negatives",
    "win_yoy_compare",
    "agg_tukey_fences",
    "dedup_minhash_estimate",
    "text_vocab_overlap",
    "orders_returns_rate",
    "sub_not_in_null",
    "win_change_runs",
    "events_cuped",
    "events_mann_whitney",
    # -- born in round 8, session 2 --
    "graph_connected_components",
    "events_ks_test",
    "agg_gini",
    "ts_cross_correlation",
    "events_sample_size",
    "sample_shard_assign",
    "sim_ann_lsh",
    "agg_ratio_pin",
    "embed_pca_power",
    "agg_percentile_hist",
    "join_existence",
    "events_velocity_flags",
    "orders_interval_merge",
    "dq_header_detail",
    "multimodal_batch_plan",
    "embed_matryoshka_eval",
    "win_percent_of_parent",
    "dq_join_fanout",
    "win_topn_ties",
    "graph_hits",
    "text_feature_hashing",
    "agg_ols_multi",
    "win_vwap",
    "set_union_by_name",
    "sim_rrf_fusion",
    "agg_median_ci_bootstrap",
    "agg_bitmap_intersect",
    "scan_csv_multiline",
    "join_anti_range",
    "fn_luhn_check",
    "ts_theil_sen",
    "ts_runs_test",
    "dq_duplicate_billing",
    "win_bollinger",
    "fn_codecs",
    "graph_label_propagation",
    "text_vocab_mass_ladder",
    "ts_ema_crossover",
    "sample_curriculum",
    "scan_txn_time_travel",
    "fn_snowflake_decode",
    "graph_pagerank_personalized",
    "orders_perfect_rate",
    "win_gap_to_leader",
    "events_weekend_lift",
    "sink_dynamic_overwrite",
    "events_peak_days",
    "orders_rank_stability",
    "tokenize_padding_waste",
    "win_drawdown_duration",
    # -- displaced from the r8 window by the 25 r8-born ids (the
    #    r8-born certify first; r5-signal refreshes queue for r9) --
    "multimodal_resize",
    "udtf_python_arrow",
    "dedup_minhash",
    "dedup_clusters",
    "dedup_simhash",
    "sim_ann_ivf",
    "pack_sequences",
    "curate_corpus",
    "sample_stratified",
    "text_repetition",
    "kmeans_assign",
    "tpch_q3",
    "tpch_q6",
    "udf_scalar_pandas",
    "join_cross_argmin",
    "fn_math",
    "fn_array",
    "scan_csv",
    "scan_orc",
    "sink_partitioned",
    "project_select",
    "scan_parquet",
    "filter_pred",
    "lateral_explode",
    "sample_hash",
    # -- behind the 50-window: r6/r7-fresh greens rotate for r9+;
    #    the three exact-Python-replay rows-only ids (zlib/aHash,
    #    genuinely not SQL-expressible) sit here by design --
    "agg_approx",
    "agg_percentile_exact",
    "agg_corr",
    "agg_regression",
    "text_collocation_pmi",
    "stream_cdc_upsert",
    "dedup_embed_cosine",
    "decontam_ngram",
    "text_pii_scrub",
    "embed_quantize",
    "dedup_incremental",
    "join_bloom_prune",
    "merge_upsert",
    "ann_recall_eval",
    "tpch_q7",
    "tpch_q12",
    "tpch_q17",
    "scd2_history",
    "join_interval_overlap",
    "text_bpe_pairs",
    "events_anomaly",
    "graph_pagerank",
    "graph_triangles",
    "scan_text",
    "sample_reservoir",
    "text_compression_ratio",
    "multimodal_phash",
    "multimodal_phash_pairs",
    "agg_bitmap_distinct",
    "win_first_last",
    "events_markov",
    "tpch_q10",
    "tpch_q14",
    "win_sessionize",
    "sub_lateral",
    "tpch_q4",
    "tpch_q13",
    "tpch_q22",
    "tpch_q15",
    "tpch_q16",
    "tpch_q19",
    "tpch_q11",
    "tpch_q21",
    "dedup_simhash_pairs",
    "text_ngram_stats",
    "sample_token_budget",
    "tpch_q18",
    "events_funnel",
    "win_distribution",
    "join_broadcast",
    "join_semi",
    "join_anti",
    "sort_limit",
    "topk_per_group",
    "set_union",
    "set_intersect",
    "set_except",
    "fn_string",
    "fn_date",
    "sub_exists",
    "sub_scalar",
    "sub_in",
    "dedup_ngram_jaccard",
    "events_retention",
    "sub_recursive",
    "kmeans_fit",
    "multimodal_decode",
    "sim_topk",
    "agg_hash",
    "stream_sliding",
    "stream_stream_join",
    "multimodal_decode_meta",
    "tpch_q5",
    "join_dpp",
    "win_argmin",
    "udtf_apply_in_pandas",
    "text_tokenize_tfidf",
    "join_asof",
    "scan_json",
    "fn_json",
    "stream_session",
    "stream_dedup",
    "stream_stateful",
    "stream_watermark_late",
    "stream_tumbling",
    "agg_distinct",
    "fn_map",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_vector_mean",
    "rollup_hypertable",
    "join_shuffle",
    "join_outer",
    "join_theta_range",
    "join_bucketed",
    "join_skew_salted",
    "win_rank",
    "win_lag_lead",
    "win_frame_avg",
    "win_running_total",
    "win_range_frame",
    "win_ntile",
    "udaf_grouped_pandas",
    "text_stats",
    "text_langid",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "multimodal_cols",
    "multimodal_framesample",
    "dedup_exact",
]


def ordered_specs() -> dict[str, QuerySpec]:
    """Registry in driver presentation order (DRIVER_ORDER first, any
    unlisted registrations appended alphabetically so nothing is ever
    silently dropped)."""
    specs = load_all_queries()
    ordered = [n for n in DRIVER_ORDER if n in specs]
    ordered += sorted(n for n in specs if n not in DRIVER_ORDER)
    return {n: specs[n] for n in ordered}


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query/operator module (triggering registration) and
    return the registry."""
    # Imports are deferred so `import nchu_bigdata_spark` stays cheap and
    # circular imports are impossible.
    from nchu_bigdata_spark import queries as _q  # noqa: F401
    from nchu_bigdata_spark import operators as _o  # noqa: F401

    return REGISTRY
