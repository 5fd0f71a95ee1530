"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so every operator family keeps at least one
driver-checked representative and the flagship search modes stay inside.
"""

from claude_code_memory_spark.queries import REGISTRY


def test_driver_window_covers_flagships_and_families():
    window = list(REGISTRY)[:50]
    must_have = {
        # new in the round-4 continuation session — never driver-checked
        "text_gopher_rules",
        "graph_triangle_counts",
        "sketch_heavy_hitters",
        "sessionize_builtin_window",
        "dedup_cross_substring",
        "layout_zorder_tiles",
        "retention_cohorts",
        "sliding_window_counts",
        "agg_grouping_sets",
        "window_time_range_frame",
        "agg_user_segments_bitmap",
        "quality_constraint_report",
        "feature_winsorize_clip",
        "dedup_clusters_star",
        "sketch_window_distinct",
        "privacy_pseudonymize",
        # added in the third continuation session — never driver-checked
        "timeseries_gapfill_locf",
        "timeseries_interpolate_linear",
        "anomaly_rolling_zscore",
        "asof_join_salted_events",
        "sketch_hll_mergeable",
        # changed/added in round 4 — must be re-validated by the driver
        "sessionize_events",
        "tumbling_window_counts",
        "knn_per_label",
        "ivf_knn_join_batch",
        "sketch_approx_distinct",
        "cluster_kmeans_sizes",
        "dedup_semantic_cells",
        "dedup_repeated_ngrams",
        "sample_domain_mixture",
        "vector_pq_error",
        "graph_pagerank_nations",
        # permanent anchors: the reference's core query modes
        "dense_topk",
        "bm25_keyword_topk",
        "hybrid_rrf_search",
        "dedup_minhash_lsh",
        # freshness rotation: oldest-green families back in the window
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "relations_orphan_cleanup",
        "agg_percentiles",
        "window_lag_lead",
        "scroll_pagination",
        "range_join_click_to_purchase",
        "chunk_pack_running_budget",
        "decontaminate_vs_benchmark",
    }
    missing = must_have - set(window)
    assert not missing, f"driver window is missing: {sorted(missing)}"


def test_registry_complete():
    # every entry callable, oracles are strings when present
    assert len(REGISTRY) >= 82
    for name, e in REGISTRY.items():
        assert callable(e.fn), name
        assert e.oracle is None or isinstance(e.oracle, str), name
