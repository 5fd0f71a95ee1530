"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so every operator family keeps at least one
driver-checked representative and the flagship search modes stay inside.
"""

from claude_code_memory_spark.queries import REGISTRY


def test_driver_window_covers_flagships_and_families():
    window = list(REGISTRY)[:50]
    must_have = {
        # three search modes — the reference's core query
        "dense_topk",
        "bm25_keyword_topk",
        "hybrid_rrf_search",
        # sessions / streaming
        "sessionize_events",
        "tumbling_window_counts",
        # text analysis
        "text_language_id",
        "text_token_counts",
        # round-1 hash-mismatch fixes must be re-checked
        "split_train_val_test",
        "multimodal_binary_stats",
        # one per already-green family
        "dedup_minhash_lsh",
        "q1_pricing_summary",
        "asof_join_events",
        "rrf_fusion_events",
        "window_top_customers_per_nation",
        "ann_lsh_bucket",
        "graph_bfs2_brand_parts",
        # never driver-sampled before round 3
        "ann_ivf_probe",
        "q11_important_stock",
        "q20_dominant_supplier",
        "text_pii_redaction",
        "text_c4_filter",
        "agg_value_percentiles",
        "pivot_priority_by_year",
    }
    missing = must_have - set(window)
    assert not missing, f"driver window is missing: {sorted(missing)}"


def test_registry_complete():
    # every entry callable, oracles are strings when present
    assert len(REGISTRY) >= 82
    for name, e in REGISTRY.items():
        assert callable(e.fn), name
        assert e.oracle is None or isinstance(e.oracle, str), name
