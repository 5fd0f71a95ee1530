"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so the rotation rule (oldest-green-first, see
queries/__init__.py) is executed exactly and an import-order change can
never silently shrink driver coverage.
"""

from claude_code_memory_spark.queries import REGISTRY, _DRIVER_WINDOW

# Round-7 window: the 8 round-6 additions (never driver-checked) plus
# 42 of the 44 round-4-last-green entries (verdict r6 item 2). The two
# deferred r4 entries (q3_shipping_priority, q5_revenue_by_nation) lead
# the round-8 queue and were selfchecked green this round.
R6_NEW = {
    "ann_hard_negatives",
    "dedup_keep_best_per_cluster",
    "dedup_ngram_exposure",
    "mixture_domain_weights",
    "sample_dsir_importance",
    "split_group_holdout",
    "text_token_entropy",
    "tokenizer_bpe_encode_top_symbols",
}

R4_COHORT = {
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_user_segments_bitmap",
    "anomaly_rolling_zscore",
    "asof_join_salted_events",
    "chunk_pack_running_budget",
    "cluster_kmeans_sizes",
    "decontaminate_vs_benchmark",
    "dedup_clusters_star",
    "dedup_cross_substring",
    "dedup_minhash_delta",
    "dedup_ngram_jaccard",
    "dedup_repeated_ngrams",
    "dedup_semantic_cells",
    "dedup_simhash",
    "feature_winsorize_clip",
    "graph_pagerank_nations",
    "graph_triangle_counts",
    "ivf_knn_join_batch",
    "knn_per_label",
    "layout_zorder_tiles",
    "privacy_pseudonymize",
    "q17_small_quantity_revenue",
    "range_join_click_to_purchase",
    "relations_orphan_cleanup",
    "retention_cohorts",
    "sample_domain_mixture",
    "scroll_pagination",
    "sessionize_builtin_window",
    "sketch_approx_distinct",
    "sketch_heavy_hitters",
    "sketch_hll_mergeable",
    "sketch_window_distinct",
    "sliding_window_counts",
    "text_gopher_rules",
    "timeseries_gapfill_locf",
    "timeseries_interpolate_linear",
    "tumbling_window_counts",
    "vector_pq_adc_topk",
    "vector_pq_error",
    "window_lag_lead",
    "window_time_range_frame",
}


def test_driver_window_is_the_staleness_sweep():
    window = set(list(REGISTRY)[:50])
    assert R6_NEW <= window, f"missing r6 additions: {sorted(R6_NEW - window)}"
    assert R4_COHORT <= window, f"missing r4 cohort: {sorted(R4_COHORT - window)}"
    assert len(R6_NEW | R4_COHORT) == 50


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
