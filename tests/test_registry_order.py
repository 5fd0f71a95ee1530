"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so the rotation rule (oldest-green-first, see
queries/__init__.py) is executed exactly and an import-order change can
never silently shrink driver coverage.
"""

from claude_code_memory_spark.queries import REGISTRY, _DRIVER_WINDOW

# Round-6 window: the staleness sweep consumes all 50 slots —
# the 8 entries whose only green row is round 1, then the full
# 42-entry round-3-last-green cohort (verdict r5 item 3).
R1_ONLY = {
    "dedup_duplicate_clusters",
    "dedup_embedding_neardup",
    "filter_exclude_pattern",
    "join_full_outer_diff",
    "sample_stratified_by_lang",
    "token_frequency_top50",
    "weighted_content_assembly",
    "window_running_user_value",
}

R3_COHORT = {
    "agg_second_moments",
    "agg_value_percentiles",
    "ann_ivf_probe",
    "ann_lsh_bucket",
    "asof_join_events",
    "corpus_filter_funnel",
    "debounce_last_event_wins",
    "dense_topk_filtered",
    "events_json_props",
    "graph_bfs2_brand_parts",
    "knn_join_queries",
    "multimodal_binary_stats",
    "pivot_priority_by_year",
    "q11_important_stock",
    "q12_priority_by_returnflag",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q18_large_volume_customers",
    "q19_disjunctive_filter",
    "q1_pricing_summary",
    "q20_dominant_supplier",
    "q21_sole_returning_supplier",
    "q22_idle_rich_customers",
    "q2_top_supplier_per_part",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "rrf_fusion_events",
    "split_train_val_test",
    "text_c4_filter",
    "text_camel_spacing",
    "text_complexity",
    "text_fingerprints",
    "text_language_id",
    "text_pii_redaction",
    "text_quality_scores",
    "text_repetition_signals",
    "text_token_counts",
    "vector_quantization_error",
    "window_top_customers_per_nation",
}


def test_driver_window_is_the_staleness_sweep():
    window = set(list(REGISTRY)[:50])
    assert R1_ONLY <= window, f"missing r1-only entries: {sorted(R1_ONLY - window)}"
    assert R3_COHORT <= window, f"missing r3 cohort: {sorted(R3_COHORT - window)}"
    assert len(R1_ONLY | R3_COHORT) == 50


def test_window_is_exactly_the_declared_list():
    """The registry's first len(_DRIVER_WINDOW) entries ARE the declared
    window, in order — a silent reorder (e.g. an import-order change)
    would otherwise shrink driver coverage invisibly."""
    assert list(REGISTRY)[: len(_DRIVER_WINDOW)] == _DRIVER_WINDOW
    assert len(_DRIVER_WINDOW) == 50


def test_registry_complete():
    # every entry callable, oracles are strings when present
    assert len(REGISTRY) >= 138
    for name, e in REGISTRY.items():
        assert callable(e.fn), name
        assert e.oracle is None or isinstance(e.oracle, str), name
