"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so the rotation rule (oldest-green-first, see
queries/__init__.py) is executed exactly and an import-order change can
never silently shrink driver coverage.
"""

from claude_code_memory_spark.queries import REGISTRY, _DRIVER_WINDOW

# Round-9 window: the 3 round-8 additions (never driver-checked), the
# 9 r5-last-green entries deferred out of the round-8 window, and the
# first 38 of the r6-last-green cohort (verdict r8 item 1 — "rotate all
# 12 unwitnessed entries"). The 12 deferred r6 entries lead the
# round-10 queue.
R8_NEW = {
    "corpus_epoch_allocation",
    "dedup_prefix_boilerplate",
    "split_time_embargo",
}

R5_DEFERRED = {
    "diag_key_skew",
    "sketch_countmin_freq",
    "sketch_kmv_jaccard",
    "sketch_approx_quantiles",
    "agg_token_histogram",
    "text_pmi_cooccurrence",
    "tokenizer_bpe_pair_counts",
    "lm_bigram_doc_scores",
    "pack_training_sequences",
}

R6_COHORT_38 = {
    "dedup_embedding_neardup",
    "dedup_duplicate_clusters",
    "split_train_val_test",
    "sample_stratified_by_lang",
    "graph_bfs2_brand_parts",
    "q1_pricing_summary",
    "filter_exclude_pattern",
    "join_full_outer_diff",
    "window_top_customers_per_nation",
    "window_running_user_value",
    "rrf_fusion_events",
    "token_frequency_top50",
    "weighted_content_assembly",
    "ann_lsh_bucket",
    "asof_join_events",
    "multimodal_binary_stats",
    "q19_disjunctive_filter",
    "q2_top_supplier_per_part",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_by_returnflag",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q18_large_volume_customers",
    "q21_sole_returning_supplier",
    "q22_idle_rich_customers",
    "q11_important_stock",
    "q20_dominant_supplier",
    "dense_topk_filtered",
    "knn_join_queries",
    "vector_quantization_error",
    "ann_ivf_probe",
    "debounce_last_event_wins",
    "events_json_props",
    "agg_value_percentiles",
}


def test_driver_window_is_the_staleness_sweep():
    window = set(list(REGISTRY)[:50])
    assert R8_NEW <= window, f"missing r8 additions: {sorted(R8_NEW - window)}"
    assert R5_DEFERRED <= window, f"missing r5 deferrals: {sorted(R5_DEFERRED - window)}"
    assert R6_COHORT_38 <= window, f"missing r6 cohort: {sorted(R6_COHORT_38 - window)}"
    assert len(R8_NEW | R5_DEFERRED | R6_COHORT_38) == 50


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
