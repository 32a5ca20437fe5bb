"""Driver-snapshot stability: CORRECTNESS snapshots sample exactly
the first 50 insertion-order entries of build_queries(). Accidental
reordering (an alphabetizing refactor, an insert in the middle)
would silently change WHICH queries the driver attests — this pin
makes that a loud local failure. Update deliberately when rotating
(each round's rotation is a planned, reviewed change).
"""

from tidb_lightning_release_4_0_spark.registry import (
    _R11_PREFIX,
    build_queries,
)

# Round-11 rotation (docs/ROTATION.md): the lead slot is the new
# round-11 entry (media_frame_sample_mjpeg — compressed video:
# MJPEG-AVI walk + per-frame baseline-JPEG decode incl. DRI/RSTn),
# then the oldest-attested cohort by (latest-attested-round, name)
# across CORRECTNESS_r0{1..10}: the twelve remaining r07 entries
# (incl. simhash, re-attesting next to the r11 simhash_dup_pairs
# rework) and the first 37 of the r08 cohort (quantize_embeddings
# et al. roll to round 12).
DRIVER_SAMPLED_50 = [
    "media_decode_jpeg_progressive",
    "media_frame_sample_mjpeg",
    "mysql_cast_tinyint",
    "ngram_jaccard",
    "pricing_summary",
    "random_project",
    "rollup_orders",
    "router_merge_orders",
    "rowid_dense_orders",
    "semi_join_suppliers",
    "simhash",
    "text_stats",
    "top_orders_by_revenue",
    "topk_parts",
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
    "events_sliding_window",
    "excess_shippers",
    "hll_overlap_partkeys",
    "hll_union_keys",
    "idle_customers",
    "important_parts",
    "kv_crc64_events_kinds",
    "kv_crc64_orders_dec",
    "kv_crc64_orders_v2",
    "large_orders",
    "lm_score",
    "local_supplier_volume",
    "market_share",
    "media_metadata",
    "mixture_sample",
    "moving_avg_events",
    "multimodal_features",
    "ntile_customers",
    "order_priority_count",
    "pack_sequences",
    "part_supplier_variety",
    "pii_scrub",
    "pivot_events",
    "profit_by_nation",
    "provenance_filter",
]


def test_registry_first_50_pinned():
    assert list(build_queries())[:50] == DRIVER_SAMPLED_50
    assert _R11_PREFIX == DRIVER_SAMPLED_50
    assert len(set(DRIVER_SAMPLED_50)) == 50
