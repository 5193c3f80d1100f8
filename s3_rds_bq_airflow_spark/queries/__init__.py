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
# budget. Three tiers:
#   1. (default order) queries with NO driver row yet whose operator
#      family also has no green sibling — these must surface first;
#   2. _DEFER_NONGREEN: no driver row yet, but their family is already
#      evidenced green (TPC-H star-join/agg variants — q1/q3/q5/q6
#      passed in round 1) or a twin is ahead of them in tier 1;
#   3. _DRIVER_GREEN_R01: green in round 1 — last.
# q_math_funcs is intentionally in tier 1: its round-1 row was a hash
# FAIL (decimal-vs-double) — fixed since, needs a fresh row.
_DEFER_NONGREEN = (
    # Round-2 additions whose operator family already has green rows
    # (scalar / movement); novel-family round-2 queries stay in tier 1.
    # Family-redundant tier-1 members demoted to keep tier 1 at the
    # ~50-entry driver cap (each has a sibling shape ahead of it):
    "q_sequence_packing",      # greedy variant carries the family
    "q_stratified_sample",     # q_hash_sample green r1
    "q_monthly_trend",         # date family green r1
    "q_array_funcs",           # scalar family green r1
    "q_pivot_event_type",      # events family via q_event_rate_per_user
    "q_json_unpack_view",      # same from_json machinery as q_fixed_wrap_roundtrip
    "q_sql_surface",           # SQL-API twin of green DataFrame queries
    "q_image_decode_real",
    "q_audio_decode_real",
    "q_image_resize_real",
    "q_resample_ffill",
    "q_incremental_dedup",
    "q_incremental_quantiles",
    "q_incremental_rollup",
    "q_ledger_ingest",
    "q_pagerank_cycle",
    "q_udtf_sentences",
    "q_pandas_udaf_ols",
    "q_cdc_tombstones",
    "q_compaction",
    "q_unpivot",
    "q_array_lambda",
    "q_geojson_points",
    "q_uuid_deterministic",
    "q_format_matrix",
    "q_schema_evolution",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q21_waiting_supplier",
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_supplier_share",
    "q22_dormant_rich",
    "q_argmax_join_back",
    "q_exists_combo",
    "q_haversine_nearest",
)

_DRIVER_GREEN_R01 = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q_semi_join",
    "q_anti_join",
    "q_topk_customers",
    "q_distinct_agg",
    "q_approx_distinct",
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
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_ngram_jaccard",
    "q_cosine_topk_exact",
)
deprioritize(_DEFER_NONGREEN + _DRIVER_GREEN_R01)

__all__ = ["all_queries", "all_oracles", "query"]
