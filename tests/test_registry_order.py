"""Driver-snapshot stability: CORRECTNESS snapshots sample exactly
the first 50 insertion-order entries of build_queries(). Accidental
reordering (an alphabetizing refactor, an insert in the middle)
would silently change WHICH queries the driver attests — this pin
makes that a loud local failure. Update deliberately when rotating
(each round's rotation is a planned, reviewed change).
"""

from tidb_lightning_release_4_0_spark.registry import (
    _R9_PREFIX,
    build_queries,
)

# Round-9 rotation (docs/ROTATION.md): the lead block is the two new
# round-9 entries (media_decode_png / media_resize_png — the
# compressed-image PNG codec path, first-ever hash checks), then the
# oldest-attested cohort by (latest-attested-round, name) across
# CORRECTNESS_r0{1..8}: the seven remaining r05 entries and the
# first 41 of the r06 cohort.
DRIVER_SAMPLED_50 = [
    "media_decode_png",
    "media_resize_png",
    "media_frame_sample_avi",
    "media_header_meta",
    "strip_html",
    "tfidf_terms",
    "token_histogram",
    "top_supplier_revenue",
    "url_canonicalize",
    "volume_shipping",
    "waiting_suppliers",
    "anomaly_days",
    "asof_join_orders",
    "benford_prices",
    "bigram_lm_score",
    "bm25_topdocs",
    "bpe_encode_docs",
    "bpe_merges",
    "c4_line_filter_docs",
    "char_entropy_docs",
    "chunk_plan",
    "click_purchase_attribution",
    "clustering_coeff",
    "cms_term_counts",
    "cohort_retention",
    "dedup_apply_semantic",
    "dedup_apply_simhash",
    "dedup_apply_winnow",
    "dsir_select_docs",
    "embedding_covariance",
    "funnel_events",
    "fuzzy_match_parts",
    "hll_distinct_parts",
    "hll_users_by_event",
    "hybrid_rrf_docs",
    "jaccard_join_docs",
    "kmeans_embeddings",
    "market_basket",
    "mixture_temperature",
    "mutual_info_events",
    "nfc_normalize_docs",
    "orc_roundtrip",
    "pagerank_events",
    "pca_embeddings",
    "percentiles_lineitem",
    "priority_lines",
    "promo_share_lineitem",
    "range_join_events",
    "readability_docs",
    "resume_split_jsonl",
]


def test_registry_first_50_pinned():
    assert list(build_queries())[:50] == DRIVER_SAMPLED_50
    assert _R9_PREFIX == DRIVER_SAMPLED_50
    assert len(set(DRIVER_SAMPLED_50)) == 50
