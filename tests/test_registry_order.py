"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so the rotation rule (oldest-green-first, see
queries/__init__.py) is executed exactly and an import-order change can
never silently shrink driver coverage.
"""

from claude_code_memory_spark.queries import REGISTRY, _DRIVER_WINDOW

# Round-10 window: the 12 r6-last-green cohort leftovers (3 driver
# rounds stale — verdict r9 item 1: "rotate the final 12 r6-stale
# entries"), then the first 38 of the r7-last-green cohort in catalog
# order. Round 9 added no catalog entries, so there is no never-checked
# segment this round. The 12 deferred r7 entries lead the round-11
# queue.
R6_LEFTOVERS = {
    "agg_second_moments",
    "pivot_priority_by_year",
    "text_language_id",
    "text_quality_scores",
    "text_token_counts",
    "text_fingerprints",
    "text_complexity",
    "text_camel_spacing",
    "corpus_filter_funnel",
    "text_repetition_signals",
    "text_pii_redaction",
    "text_c4_filter",
}

R7_COHORT_38 = {
    "cluster_kmeans_sizes",
    "dedup_semantic_cells",
    "dedup_repeated_ngrams",
    "sample_domain_mixture",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_minhash_delta",
    "dedup_cross_substring",
    "dedup_clusters_star",
    "dedup_keep_best_per_cluster",
    "dedup_ngram_exposure",
    "graph_pagerank_nations",
    "graph_triangle_counts",
    "mixture_domain_weights",
    "sample_dsir_importance",
    "decontaminate_vs_benchmark",
    "split_group_holdout",
    "relations_orphan_cleanup",
    "agg_percentiles",
    "window_lag_lead",
    "scroll_pagination",
    "chunk_pack_running_budget",
    "agg_grouping_sets",
    "window_time_range_frame",
    "agg_user_segments_bitmap",
    "q17_small_quantity_revenue",
    "range_join_click_to_purchase",
    "layout_zorder_tiles",
    "knn_per_label",
    "ivf_knn_join_batch",
    "vector_pq_error",
    "vector_pq_adc_topk",
    "ann_hard_negatives",
    "tumbling_window_counts",
    "sessionize_builtin_window",
    "retention_cohorts",
    "sliding_window_counts",
    "sketch_approx_distinct",
}


def test_driver_window_is_the_staleness_sweep():
    window = set(list(REGISTRY)[:50])
    assert R6_LEFTOVERS <= window, f"missing r6 leftovers: {sorted(R6_LEFTOVERS - window)}"
    assert R7_COHORT_38 <= window, f"missing r7 cohort: {sorted(R7_COHORT_38 - window)}"
    assert len(R6_LEFTOVERS | R7_COHORT_38) == 50


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
