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
# Round-6 window, executing the round-5 queue exactly: (a) the eight
# entries whose ONLY green row is round 1 — all selfcheck-reverified by
# the r5 judge, windowed here so the catalog has no r1-only rows left;
# (b) all 42 entries last green in round 3 (three rounds stale at the end
# of r6 otherwise). 8 + 42 = 50: the staleness sweep consumes the entire
# window, so the four permanent anchors (r5-green, fresh) sit this round
# out. tests/test_registry_order.py pins this window.
_DRIVER_WINDOW = [
    # -- (a) r1-only green rows: the oldest debt in the catalog --
    "dedup_duplicate_clusters",
    "dedup_embedding_neardup",
    "filter_exclude_pattern",
    "join_full_outer_diff",
    "sample_stratified_by_lang",
    "token_frequency_top50",
    "weighted_content_assembly",
    "window_running_user_value",
    # -- (b) the full r3-last-green cohort (42 entries) --
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
]
# Round-7 rotation queue (oldest-green-first after this round lands):
# (a) the queries added in round 6 lead (never driver-checked:
#     dedup_keep_best_per_cluster, mixture_domain_weights,
#     sample_dsir_importance, ann_hard_negatives,
#     tokenizer_bpe_encode_top_symbols, text_token_entropy,
#     dedup_ngram_exposure, split_group_holdout — all
#     selfcheck-green on arrival);
# (b) the 44-entry r4-last-green cohort (two rounds stale at end of r6 —
# the freshness bound): sessionize_builtin_window, chunk_pack_running_budget,
# relations_orphan_cleanup, scroll_pagination, the dedup family
# (minhash_lsh_delta, cross_substring, decontaminate, simhash, ngram),
# the time-series flagships, graph_pagerank/triangles, and the rest of the
# r4 window — 44 into 50 slots leaves ~6 for the r5 anchors
# (dense_topk, bm25_keyword_topk, hybrid_rrf_search, dedup_minhash_lsh)
# and the freshest r5 cohort's own rotation begins in round 8.


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly at import: a typo here silently shrinks coverage
        raise RuntimeError(f"_DRIVER_WINDOW names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, e) for n, e in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
