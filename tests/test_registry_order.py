"""The driver verifies only the first 50 registry entries (insertion
order). Pin the window so every operator family keeps at least one
driver-checked representative and the flagship search modes stay inside.
"""

from claude_code_memory_spark.queries import REGISTRY, _DRIVER_WINDOW


def test_driver_window_covers_flagships_and_families():
    window = list(REGISTRY)[:50]
    must_have = {
        # round-4 additions that had never been driver-checked — the
        # round-5 window's first priority (verdict r4 item 2)
        "text_pmi_cooccurrence",
        "tokenizer_bpe_pair_counts",
        "sketch_kmv_mergeable",
        "transition_matrix_events",
        "sample_bottomk_per_type",
        "corr_matrix_lineitem",
        "anomaly_mad_outliers",
        "scd2_user_state_intervals",
        "pareto_nation_revenue",
        "diag_key_skew",
        "vector_ivfpq_adc_topk",
        "stickiness_dau_wau",
        "vector_pca_covariance",
        "agg_token_histogram",
        "vector_pq_trained_error",
        "dedup_edit_distance",
        "funnel_view_click_purchase",
        # the two round-4 hash-red rows, re-validating after the
        # oracle HUGEINT casts (verdict r4 item 1)
        "sessionize_events",
        "quality_constraint_report",
        # new in round 5 — never driver-checked
        "sketch_countmin_freq",
        "lm_bigram_doc_scores",
        "sketch_kmv_jaccard",
        "sketch_approx_quantiles",
        "ml_logreg_quality",
        "pack_training_sequences",
        # permanent anchors: the reference's core query modes
        "dense_topk",
        "bm25_keyword_topk",
        "hybrid_rrf_search",
        "dedup_minhash_lsh",
    }
    missing = must_have - set(window)
    assert not missing, f"driver window is missing: {sorted(missing)}"


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
