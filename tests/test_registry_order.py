"""Driver-snapshot stability: CORRECTNESS snapshots sample exactly
the first 50 insertion-order entries of build_queries(). Accidental
reordering (an alphabetizing refactor, an insert in the middle)
would silently change WHICH queries the driver attests — this pin
makes that a loud local failure. Update deliberately when rotating
(each round's rotation is a planned, reviewed change).
"""

from tidb_lightning_release_4_0_spark.registry import (
    _R8_PREFIX,
    build_queries,
)

# Round-8 rotation (docs/ROTATION.md): the lead block is
# kv_crc64_orders_dec (new: myDecimal-binary KV parity vs the
# pure-SQL twin), kv_crc64_orders_v2 + kv_crc64_events_kinds (new),
# multimodal_features (rewritten: real BMP decode, first hash check),
# split_csv_rowids (the r7 red, re-attesting after the fix) and
# events_sliding_window (new: hopping-window streaming twin); then
# the three r04 leftovers and the first 41 of the 48-entry r05
# cohort by name (the remaining seven r05 entries roll to round 9).
DRIVER_SAMPLED_50 = [
    "kv_crc64_orders_dec",
    "kv_crc64_orders_v2",
    "kv_crc64_events_kinds",
    "multimodal_features",
    "split_csv_rowids",
    "events_sliding_window",
    "uint64_decimal",
    "window_rank_customers",
    "window_running_total",
    "bloom_prune_orders",
    "bracket_revenue",
    "cheapest_shipper",
    "chunk_documents",
    "cube_lineitem",
    "curation_funnel",
    "custdist_orders",
    "decontaminate",
    "dedup_apply_cluster",
    "dedup_cluster",
    "dedup_incremental",
    "excess_shippers",
    "hll_overlap_partkeys",
    "hll_union_keys",
    "idle_customers",
    "important_parts",
    "large_orders",
    "lm_score",
    "local_supplier_volume",
    "market_share",
    "media_metadata",
    "mixture_sample",
    "moving_avg_events",
    "ntile_customers",
    "order_priority_count",
    "pack_sequences",
    "part_supplier_variety",
    "pii_scrub",
    "pivot_events",
    "profit_by_nation",
    "provenance_filter",
    "quality_filter",
    "quantize_embeddings",
    "repetition_stats",
    "resume_split_csv",
    "returned_items",
    "salted_join_orders",
    "sample_stratified",
    "sample_stratified_hash",
    "small_qty_revenue",
    "string_agg_nations",
]


def test_registry_first_50_pinned():
    assert list(build_queries())[:50] == DRIVER_SAMPLED_50
    assert _R8_PREFIX == DRIVER_SAMPLED_50
    assert len(set(DRIVER_SAMPLED_50)) == 50
