"""Declared query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) registers here: a DataFrame builder
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB
oracle SQL string producing identical column names and values.

Import side effects populate the registry; ``all_queries()`` /
``all_oracles()`` are what ``__spark_entry__.py`` re-exports.
"""

from .registry import all_oracles, all_queries, deprioritize, query

# Import for registration side effects.
from . import relational  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import scalar  # noqa: E402,F401
from . import ingestion  # noqa: E402,F401
from . import movement  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import eventsops  # noqa: E402,F401
from . import streamingq  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import skewq  # noqa: E402,F401
from . import statsq  # noqa: E402,F401
from . import clusterq  # noqa: E402,F401
from . import coverage  # noqa: E402,F401
from . import funnelq  # noqa: E402,F401
from . import trainprep  # noqa: E402,F401

# The driver verifies in iteration order and caps its batch at ~50
# entries per round, so enumeration order is a verification-evidence
# budget. Round-5 tiers:
#   1. (default order) _MUST_SURFACE_R5 — the only four
#      declared-and-oracle-backed queries without a green driver row
#      (their exact oracles landed in round 4 after the tier-1 budget
#      was full; CORRECTNESS still carries stale r1/r3 `no_oracle`
#      rows) — plus EVERY query added during round 5 (both the
#      corpus/ANN tier and the round-5b tier: recursive CTE, setsim,
#      skip-gram, quantile-normalize, MAD, JL, incremental join,
#      gaps-islands, temperature sampling, leakage guard, BPE encode,
#      lang confusion), which register un-deprioritized and therefore
#      surface automatically — ~41 unverified entries, inside the ~50
#      budget;
#   2. _R1_GREENS — green in round 1 and never re-confirmed since;
#      rotated into the remaining budget slots oldest-first so the
#      current code gets fresh driver evidence on them;
#   3. _R3_GREENS then _R4_GREENS — re-confirmed recently, last;
#   4. _ROWS_ONLY_SKETCHES — HLL++/KLL sketches that can never
#      hash-match a DuckDB oracle by nature; dead last so they never
#      burn a hash-checkable slot.
# ROUND-6 NOTE: after CORRECTNESS_r05 lands, fold the round-5 head
# into a new greens tier and rotate the remaining _R1_GREENS forward.
_MUST_SURFACE_R5 = (
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_cosine_ann_ivf",
    "q_curriculum_buckets",
)

_R1_GREENS = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q_semi_join",
    "q_anti_join",
    "q_topk_customers",
    "q_distinct_agg",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_reconcile_counts",
    "q_dedup_latest",
    "q_window_running",
    "q_window_rank",
    "q_window_moving",
    "q_window_share",
    "q_window_first_last",
    "q_window_distribution",
    "q_string_funcs",
    "q_date_funcs",
    "q_json_funcs",
    "q_case_expr",
    "q_hash_funcs",
    "q_regexp_funcs",
    "q_map_funcs",
    "q_null_semantics",
    "q_sanitize_columns",
    "q_bronze_silver_roundtrip",
    "q_audit_stamping",
    "q_null_normalize",
    "q_merge_upsert",
    "q_incremental_watermark",
    "q_full_copy_verified",
    "q_tolerant_reconcile",
    "q_token_stats",
    "q_text_quality",
    "q_lang_id",
    "q_fingerprint",
    "q_dedup_exact",
    "q_dedup_exact_planted",
    "q_ngram_jaccard",
    "q_cosine_topk_exact",
)

_R3_GREENS = (
    "q_math_funcs",
    "q_jsonschema_silver",
    "q_fixed_wrap_roundtrip",
    "q_ts_serialization",
    "q_partition_retention",
    "q_hilbert_layout",
    "q_scd2_asof",
    "q_cosine_ann_lsh",
    "q_embedding_norms",
    "q_embedding_neardup",
    "q_knn_join",
    "q_binary_metadata",
    "q_frame_sample",
    "q_tumbling_window",
    "q_sliding_window",
    "q_session_window",
    "q_watermark_finality",
    "q_event_rate_per_user",
    "q_stream_tumbling",
    "q_stream_sessionize",
    "q_stream_exactly_once",
    "q_stream_join",
    "q_asof_join",
    "q_range_join",
    "q_salted_agg",
    "q_salted_join",
    "q_percentiles",
    "q_skew_detect",
    "q_histogram_quantiles",
    "q_profile_table",
    "q_stats_moments",
    "q_nearest_supplier",
    "q_quality_report",
    "q_nearest_supplier_bucketed",
    "q_dedup_clusters",
    "q_label_propagation",
    "q_token_topk",
    "q_hash_sample",
    "q_window_range",
    "q_ntile",
    "q_funnel",
    "q_cohort_retention",
    "q_pii_redaction",
    "q_contamination_13gram",
    "q_domain_mixture",
    "q_sequence_packing_greedy",
    "q_corpus_pipeline",
)

_R4_GREENS = (
    "q_geojson_points",
    "q_uuid_deterministic",
    "q_unpivot",
    "q_array_lambda",
    "q_schema_evolution",
    "q_format_matrix",
    "q_incremental_rollup",
    "q_ledger_ingest",
    "q_cdc_tombstones",
    "q_compaction",
    "q_gopher_repetition",
    "q_incremental_dedup",
    "q_image_decode_real",
    "q_audio_decode_real",
    "q_image_resize_real",
    "q_pivot_event_type",
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_priority_shipping",
    "q14_promo_share",
    "q16_supplier_diversity",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_dormant_rich",
    "q_argmax_join_back",
    "q13_order_distribution",
    "q15_top_supplier",
    "q17_small_quantity",
    "q2_min_cost_supplier",
    "q_sql_surface",
    "q20_supplier_share",
    "q_exists_combo",
    "q11_important_stock",
    "q21_waiting_supplier",
    "q_resample_ffill",
    "q_json_unpack_view",
    "q_incremental_quantiles",
    "q_haversine_nearest",
    "q_dedup_clusters_star",
    "q_pagerank_cycle",
    "q_udtf_sentences",
    "q_pandas_udaf_ols",
    "q_array_funcs",
    "q_monthly_trend",
    "q_stratified_sample",
    "q_sequence_packing",
    "q_ngram_topk_global",
)

_ROWS_ONLY_SKETCHES = (
    "q_approx_distinct",
    "q_approx_quantiles",
)

deprioritize(_R1_GREENS + _R3_GREENS + _R4_GREENS + _ROWS_ONLY_SKETCHES)

__all__ = ["all_queries", "all_oracles", "query"]
