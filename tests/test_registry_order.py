"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so the rotation rule (oldest-green-first, see
queries/__init__.py) is executed exactly and an import-order change can
never silently shrink driver coverage.
"""

from claude_code_memory_spark.queries import REGISTRY, _DRIVER_WINDOW

# Round-8 window: the 7 round-7 additions (never driver-checked), the two
# r4-last-green deferrals from round 7 (q3/q5), and the first 41 of the
# r5-last-green cohort (verdict r7 item 2). The 9 deferred r5 entries
# lead the round-9 queue.
R7_NEW = {
    "cap_docs_per_source",
    "knn_classify_majority",
    "mixture_lang_source_mi",
    "sample_weighted_bottomk",
    "text_sliding_chunks",
    "text_ttr_hapax",
    "timeseries_ewma_window",
}

R4_DEFERRED = {
    "q3_shipping_priority",
    "q5_revenue_by_nation",
}

R5_COHORT_41 = {
    "dedup_exact_kept",
    "dedup_minhash_lsh",
    "dedup_edit_distance",
    "ml_logreg_quality",
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
    "transition_matrix_events",
    "scd2_user_state_intervals",
    "stickiness_dau_wau",
    "vector_pca_covariance",
    "sketch_kmv_mergeable",
    "sample_bottomk_per_type",
    "corr_matrix_lineitem",
    "anomaly_mad_outliers",
    "pareto_nation_revenue",
}


def test_driver_window_is_the_staleness_sweep():
    window = set(list(REGISTRY)[:50])
    assert R7_NEW <= window, f"missing r7 additions: {sorted(R7_NEW - window)}"
    assert R4_DEFERRED <= window, f"missing r4 deferrals: {sorted(R4_DEFERRED - window)}"
    assert R5_COHORT_41 <= window, f"missing r5 cohort: {sorted(R5_COHORT_41 - window)}"
    assert len(R7_NEW | R4_DEFERRED | R5_COHORT_41) == 50


def test_window_is_exactly_the_declared_list():
    """The registry's first len(_DRIVER_WINDOW) entries ARE the declared
    window, in order — a silent reorder (e.g. an import-order change)
    would otherwise shrink driver coverage invisibly."""
    assert list(REGISTRY)[: len(_DRIVER_WINDOW)] == _DRIVER_WINDOW
    assert len(_DRIVER_WINDOW) == 50


def test_registry_complete():
    # every entry callable, oracles are strings when present
    assert len(REGISTRY) >= 152
    for name, e in REGISTRY.items():
        assert callable(e.fn), name
        assert e.oracle is None or isinstance(e.oracle, str), name
