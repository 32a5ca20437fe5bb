"""Driver-snapshot stability: CORRECTNESS snapshots sample exactly
the first 50 insertion-order entries of build_queries(). Accidental
reordering (an alphabetizing refactor, an insert in the middle)
would silently change WHICH queries the driver attests — this pin
makes that a loud local failure. Update deliberately when rotating
(each round's rotation is a planned, reviewed change).
"""

from tidb_lightning_release_4_0_spark.registry import (
    _R6_PREFIX,
    build_queries,
)

# Round-6 rotation (docs/ROTATION.md): 37 never-attested entries,
# the 2 r05 hash-fix re-attestations, then 11 oldest-attested.
DRIVER_SAMPLED_50 = ['orc_roundtrip', 'bm25_topdocs', 'kmeans_embeddings', 'dedup_apply_semantic', 'pagerank_events', 'weighted_sample_docs', 'mixture_temperature', 'dsir_select_docs', 'c4_line_filter_docs', 'simhash_dup_pairs', 'dedup_apply_simhash', 'bigram_lm_score', 'strip_boilerplate_docs', 'char_entropy_docs', 'winnow_fingerprints', 'winnow_candidates', 'jaccard_join_docs', 'dedup_apply_winnow', 'resume_split_jsonl', 'cohort_retention', 'funnel_events', 'rfm_segments', 'bpe_merges', 'anomaly_days', 'nfc_normalize_docs', 'triangles_dupgraph', 'bpe_encode_docs', 'zipf_alpha_docs', 'embedding_covariance', 'pca_embeddings', 'hybrid_rrf_docs', 'market_basket', 'readability_docs', 'clustering_coeff', 'benford_prices', 'fuzzy_match_parts', 'mutual_info_events', 'promo_share_lineitem', 'priority_lines', 'top_terms', 'percentiles_lineitem', 'sessionize_events', 'salted_agg_lineitem', 'chunk_plan', 'asof_join_orders', 'range_join_events', 'click_purchase_attribution', 'hll_distinct_parts', 'hll_users_by_event', 'cms_term_counts']


def test_registry_first_50_pinned():
    assert list(build_queries())[:50] == DRIVER_SAMPLED_50
    assert _R6_PREFIX == DRIVER_SAMPLED_50
    assert len(set(DRIVER_SAMPLED_50)) == 50
