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
# Round-5 window, executing the round-4 queue exactly: (a) the 17 round-4
# entries never driver-checked lead (all selfcheck-green, HUGEINT oracles
# pre-cast); (b) the two round-4 hash-red rows (oracle HUGEINT artifact,
# now CAST AS BIGINT — values were proven exactly equal) re-validate;
# (c) the queries added THIS round (count-min, bigram-LM scoring, KMV
# Jaccard); (d) the four permanent anchors; (e) freshness rotation:
# the five r1-green shapes displaced last round, the six r2-last-green
# entries (two rounds stale — the freshness bound), and 13 of the 18
# r1-green entries the round-4 queue listed. tests/test_registry_order.py
# pins this window.
_DRIVER_WINDOW = [
    # -- (a) round-4 additions never driver-checked: validate first --
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
    # -- (b) the round-4 hash-reds, oracle-typing fixed --
    "sessionize_events",
    "quality_constraint_report",
    # -- (c) new this round: never driver-checked --
    "sketch_countmin_freq",
    "lm_bigram_doc_scores",
    "sketch_kmv_jaccard",
    "sketch_approx_quantiles",
    "ml_logreg_quality",
    "pack_training_sequences",
    # -- (d) permanent anchors: the reference's core query modes --
    "dense_topk",
    "bm25_keyword_topk",
    "hybrid_rrf_search",
    "dedup_minhash_lsh",
    # -- (e) freshness: r1-green shapes displaced by round 4's window --
    "filter_payload_equality",
    "join_anti_customers_without_urgent",
    "join_hash_dedup_probe",
    "set_union_distinct_nations",
    "scalar_regex_extract",
    # -- (e) r2-last-green (two rounds stale, the freshness bound) --
    "dedup_exact_kept",
    "agg_event_stats",
    "filter_must_should_not",
    "set_except_intersect",
    "hash_ids_documents",
    "join_salted_status_revenue",
    # -- (e) r1-green entries from the round-4 queue (13 of 18 fit) --
    "window_rank_ntile",
    "pivot_status_by_priority",
    "filter_score_threshold",
    "join_semi_customers_with_urgent",
    "agg_cube_orders",
    "q6_revenue_delta",
    "q10_returned_items",
    "scalar_datetime_parts",
    "q4_order_priority",
    "agg_rollup_orders",
]
# Round-6 rotation queue: (a) the eight r1-green entries that did not fit
# this window — dedup_embedding_neardup (SemDeDup twin windowed),
# dedup_duplicate_clusters (star twin green r4),
# sample_stratified_by_lang, weighted_content_assembly,
# window_running_user_value, token_frequency_top50, filter_exclude_pattern,
# join_full_outer_diff
# (each family-covered by a windowed twin); (b) the r3/r4 double-greens
# displaced this round (text-analysis family, time-series flagships,
# dedup family, graph family) — at end of r5 they are one-to-two rounds
# stale; rotate oldest-green-first as usual.


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly at import: a typo here silently shrinks coverage
        raise RuntimeError(f"_DRIVER_WINDOW names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, e) for n, e in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
