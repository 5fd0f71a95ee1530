"""Driver-facing query catalog: every implemented operator from
SURVEY.md §2 has a named entry here, most with a DuckDB oracle.

Importing this package populates ``REGISTRY``.
"""

from claude_code_memory_spark.queries.base import REGISTRY, oracle_sql_map, query_map  # noqa: F401
from claude_code_memory_spark.queries import (  # noqa: F401,E402
    clusterq,
    dedupq,
    graphq,
    mlq,
    pipelineq,
    relational,
    relational2,
    relational3,
    relational4,
    search,
    sessionsq,
    statsq,
    textopsq,
    timeseriesq,
)

# The driver verifies only the FIRST 50 registry entries (insertion order).
#
# CURATION RULE (explicit since round 6, verdict r5 item 3): each round the
# window is filled oldest-green-first from the full catalog's driver
# history — an entry's priority is the round of its most recent green
# CORRECTNESS_r*.json row (never-checked entries count as round 0 and
# always lead). New queries added in the current round join the FRONT of
# the NEXT round's queue. Permanent anchors are windowed only when slots
# remain after the staleness sweep. Target invariant: no catalog entry's
# latest green row is ever more than 2 driver rounds old; with 144 entries
# and 50 slots the rotation period is ~3 rounds, so the sweep must never
# be preempted.
#
# Round-11 window, executing the round-10 queue exactly (r10 verdict
# item 1): (a) the 12 r7-last-green cohort leftovers — 3 driver rounds
# stale, top staleness priority (all judge-selfchecked green at sf0.01
# in the r10 verdict); (b) round 10 added no new catalog entries, so
# the rest of the window is (c) the first 38 of the 50-entry
# r8-last-green cohort, in catalog order. 12 + 38 = 50; the remaining
# 12 r8 entries (transition_matrix_events, scd2_user_state_intervals,
# stickiness_dau_wau, vector_pca_covariance, sketch_kmv_mergeable,
# sample_bottomk_per_type, corr_matrix_lineitem, anomaly_mad_outliers,
# pareto_nation_revenue, text_ttr_hapax, text_sliding_chunks,
# timeseries_ewma_window) lead the round-12 queue, followed by any
# round-11 additions, then the r9 cohort. After this rotation no
# catalog entry's latest driver green is older than r8.
# tests/test_registry_order.py pins this window.
_DRIVER_WINDOW = [
    # -- (a) the twelve r7-last-green leftovers --
    "sketch_heavy_hitters",
    "feature_winsorize_clip",
    "sketch_window_distinct",
    "privacy_pseudonymize",
    "sketch_hll_mergeable",
    "text_gopher_rules",
    "tokenizer_bpe_encode_top_symbols",
    "text_token_entropy",
    "timeseries_gapfill_locf",
    "timeseries_interpolate_linear",
    "anomaly_rolling_zscore",
    "asof_join_salted_events",
    # -- (c) r8-last-green cohort, first 38 in catalog order --
    "dedup_exact_kept",
    "dedup_minhash_lsh",
    "dedup_edit_distance",
    "ml_logreg_quality",
    "knn_classify_majority",
    "mixture_lang_source_mi",
    "cap_docs_per_source",
    "sample_weighted_bottomk",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "agg_cube_orders",
    "agg_event_stats",
    "filter_payload_equality",
    "filter_must_should_not",
    "filter_score_threshold",
    "join_anti_customers_without_urgent",
    "join_semi_customers_with_urgent",
    "join_hash_dedup_probe",
    "set_union_distinct_nations",
    "set_except_intersect",
    "hash_ids_documents",
    "scalar_regex_extract",
    "window_rank_ntile",
    "pivot_status_by_priority",
    "scalar_datetime_parts",
    "q6_revenue_delta",
    "q10_returned_items",
    "agg_rollup_orders",
    "join_salted_status_revenue",
    "q4_order_priority",
    "quality_constraint_report",
    "dense_topk",
    "bm25_keyword_topk",
    "hybrid_rrf_search",
    "vector_pq_trained_error",
    "vector_ivfpq_adc_topk",
    "sessionize_events",
    "funnel_view_click_purchase",
]
# Round-12 rotation queue (oldest-green-first after this round lands):
# (a) the 12 r8-cohort entries deferred above (listed in the window
#     comment); (b) any round-11 additions (never driver-checked);
# (c) the 50-entry r9-last-green cohort — whatever fits after (a)+(b);
#     remainder rotates in round 13 with the r10 cohort.


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly at import: a typo here silently shrinks coverage
        raise RuntimeError(f"_DRIVER_WINDOW names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, e) for n, e in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
