"""Driver-snapshot stability: CORRECTNESS snapshots sample exactly
the first 50 insertion-order entries of build_queries(). Accidental
reordering (an alphabetizing refactor, an insert in the middle)
would silently change WHICH queries the driver attests — this pin
makes that a loud local failure. Update deliberately when rotating
(each round's rotation is a planned, reviewed change).
"""

from tidb_lightning_release_4_0_spark.registry import build_queries

DRIVER_SAMPLED_50 = ['hll_union_keys', 'hll_overlap_partkeys', 'url_canonicalize', 'strip_html', 'pivot_events', 'cube_lineitem', 'moving_avg_events', 'ntile_customers', 'string_agg_nations', 'tfidf_terms', 'custdist_orders', 'promo_share_lineitem', 'dedup_cluster', 'decontaminate', 'sample_stratified', 'quality_filter', 'pack_sequences', 'quantize_embeddings', 'token_histogram', 'curation_funnel', 'repetition_stats', 'media_metadata', 'salted_join_orders', 'chunk_documents', 'pii_scrub', 'provenance_filter', 'lm_score', 'mixture_sample', 'dedup_apply_cluster', 'dedup_incremental', 'order_priority_count', 'top_supplier_revenue', 'cheapest_shipper', 'local_supplier_volume', 'volume_shipping', 'market_share', 'profit_by_nation', 'returned_items', 'important_parts', 'priority_lines', 'small_qty_revenue', 'bracket_revenue', 'waiting_suppliers', 'excess_shippers', 'large_orders', 'idle_customers', 'part_supplier_variety', 'sample_stratified_hash', 'resume_split_csv', 'bloom_prune_orders']


def test_registry_first_50_pinned():
    assert list(build_queries())[:50] == DRIVER_SAMPLED_50
