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
# Round-12 window, executing the round-11 queue exactly (r11 verdict
# item 1): (a) the 12 r8-last-green deferrals — 3 driver rounds stale,
# top staleness priority (all judge-selfchecked green at sf0.01 in the
# r11 verdict); (b) round 11 added no new catalog entries, so the rest
# of the window is the first 38 of the 50-entry r9-last-green cohort,
# in catalog order. 12 + 38 = 50; the remaining 12 r9 entries
# (debounce_last_event_wins, events_json_props, agg_value_percentiles,
# diag_key_skew, sketch_countmin_freq, sketch_kmv_jaccard,
# sketch_approx_quantiles, agg_token_histogram, text_pmi_cooccurrence,
# tokenizer_bpe_pair_counts, lm_bigram_doc_scores,
# pack_training_sequences) lead the round-13 queue, followed by any
# round-12 additions, then the r10 cohort. After this rotation no
# catalog entry's latest driver green is older than r9.
# tests/test_registry_order.py pins this window.
_DRIVER_WINDOW = [
    "transition_matrix_events",
    "scd2_user_state_intervals",
    "stickiness_dau_wau",
    "vector_pca_covariance",
    "sketch_kmv_mergeable",
    "sample_bottomk_per_type",
    "corr_matrix_lineitem",
    "anomaly_mad_outliers",
    "pareto_nation_revenue",
    "text_ttr_hapax",
    "text_sliding_chunks",
    "timeseries_ewma_window",
    "dedup_embedding_neardup",
    "dedup_duplicate_clusters",
    "dedup_prefix_boilerplate",
    "corpus_epoch_allocation",
    "split_train_val_test",
    "sample_stratified_by_lang",
    "graph_bfs2_brand_parts",
    "split_time_embargo",
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
]
# Round-13 rotation queue (oldest-green-first after this round lands):
# (a) the 12 r9-cohort entries deferred above (listed in the window
#     comment); (b) any round-12 additions (never driver-checked);
# (c) the 50-entry r10-last-green cohort — whatever fits after (a)+(b);
#     remainder rotates in round 14 with the r11 cohort.


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly at import: a typo here silently shrinks coverage
        raise RuntimeError(f"_DRIVER_WINDOW names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, e) for n, e in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
