"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so the rotation rule (oldest-green-first, see
queries/__init__.py) is executed exactly and an import-order change can
never silently shrink driver coverage.
"""

from claude_code_memory_spark.queries import REGISTRY, _DRIVER_WINDOW

# Round-11 window: the 12 r7-last-green cohort leftovers (3 driver
# rounds stale — verdict r10 item 1: the pre-named round-11 queue),
# then the first 38 of the r8-last-green cohort in catalog order.
# Round 10 added no catalog entries, so there is no never-checked
# segment this round. The 12 deferred r8 entries lead the round-12
# queue.
R7_LEFTOVERS = {
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
}

R8_COHORT_38 = {
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
}


def test_driver_window_is_the_staleness_sweep():
    window = set(list(REGISTRY)[:50])
    assert R7_LEFTOVERS <= window, f"missing r7 leftovers: {sorted(R7_LEFTOVERS - window)}"
    assert R8_COHORT_38 <= window, f"missing r8 cohort: {sorted(R8_COHORT_38 - window)}"
    assert len(R7_LEFTOVERS | R8_COHORT_38) == 50


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
