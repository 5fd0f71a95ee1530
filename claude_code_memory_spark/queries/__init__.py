"""Driver-facing query catalog: every implemented operator from
SURVEY.md §2 has a named entry here, most with a DuckDB oracle.

Importing this package populates ``REGISTRY``.
"""

from claude_code_memory_spark.queries.base import REGISTRY, oracle_sql_map, query_map  # noqa: F401
from claude_code_memory_spark.queries import (  # noqa: F401,E402
    dedupq,
    pipelineq,
    relational,
    relational2,
    relational3,
    relational4,
    search,
    sessionsq,
    statsq,
    textopsq,
)

# The driver verifies only the FIRST 50 registry entries (insertion order).
# Round-3 window: queries with no green driver row yet take priority — the
# four round-2 reds (sessionize/tumbling/debounce's ts fix, q12's oracle
# cast), ann_ivf_probe (never inside a driver window), and the round-3
# additions (q11/q20, text_pii_redaction/text_c4_filter). They displace
# double-green entries (agg_event_stats, set_except_intersect,
# hash_ids_documents, filter_must_should_not, dedup_exact_kept) whose
# families keep green rows from rounds 1-2.
# tests/test_registry_order.py pins this window.
_DRIVER_WINDOW = [
    # -- flagship search modes (never driver-checked in round 1) --
    "dense_topk",
    "bm25_keyword_topk",
    "hybrid_rrf_search",
    "dense_topk_filtered",
    "knn_per_label",
    "knn_join_queries",
    "vector_quantization_error",
    # -- sessions / streaming shapes --
    "sessionize_events",
    "tumbling_window_counts",
    "debounce_last_event_wins",
    "events_json_props",
    # -- text analysis --
    "text_language_id",
    "text_quality_scores",
    "text_token_counts",
    "text_fingerprints",
    "text_complexity",
    "text_camel_spacing",
    "corpus_filter_funnel",
    "text_repetition_signals",
    # -- adapted TPC-H shapes (relational4) --
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
    "q19_disjunctive_filter",
    "q21_sole_returning_supplier",
    "q22_idle_rich_customers",
    # -- round-1 hash mismatches, re-check after oracle cast fix --
    "split_train_val_test",
    "multimodal_binary_stats",
    # -- one representative per round-1-green family --
    "dedup_minhash_lsh",
    "graph_bfs2_brand_parts",
    "q1_pricing_summary",
    "asof_join_events",
    "rrf_fusion_events",
    "window_top_customers_per_nation",
    "ann_lsh_bucket",
    # -- never driver-sampled before round 3 --
    "ann_ivf_probe",
    "q11_important_stock",
    "q20_dominant_supplier",
    "text_pii_redaction",
    "text_c4_filter",
    "agg_value_percentiles",
    "agg_second_moments",
    "pivot_priority_by_year",
    "sketch_approx_distinct",
]


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly at import: a typo here silently shrinks coverage
        raise RuntimeError(f"_DRIVER_WINDOW names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, e) for n, e in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
