"""Driver-snapshot stability: CORRECTNESS snapshots sample exactly
the first 50 insertion-order entries of build_queries(). Accidental
reordering (an alphabetizing refactor, an insert in the middle)
would silently change WHICH queries the driver attests — this pin
makes that a loud local failure. Update deliberately when rotating
(each round's rotation is a planned, reviewed change).
"""

from tidb_lightning_release_4_0_spark.registry import (
    _R7_PREFIX,
    build_queries,
)

# Round-7 rotation (docs/ROTATION.md): the new kv_crc64_orders
# (KV-byte parity vs a shared-nothing SQL encoder) and
# corpus_diff_docs entries lead, then the entries whose latest green
# driver attestation is oldest — 1 from r03 + 47 of the r04 cohort
# (by name; `uint64_decimal`, `window_rank_customers` and
# `window_running_total` roll to round 8).
DRIVER_SAMPLED_50 = [
    "kv_crc64_orders",
    "corpus_diff_docs",
    "hist_quantiles_price",
    "alloc_base_orders",
    "ann_recall_ivf",
    "ann_recall_lsh",
    "ann_topk",
    "ann_topk_ivf",
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_q64",
    "ann_topk_lsh",
    "ann_topk_pq",
    "ann_topk_pq_q64",
    "anti_join_customers",
    "checksum_crc64_lineitem",
    "checksum_lineitem",
    "checksum_orders",
    "dedup_apply_exact",
    "dedup_apply_minhash",
    "dedup_apply_spans",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_xx",
    "default_fill_customer",
    "dup_ignore_events",
    "dup_replace_events",
    "duplicate_spans",
    "embedding_dups",
    "enum_cast_events",
    "events_tumbling_window",
    "filtered_revenue",
    "gopher_repetition",
    "index_checksum_orders",
    "json_extract_events",
    "jsonl_roundtrip",
    "minhash_signatures",
    "multimodal_features",
    "mysql_cast_tinyint",
    "ngram_jaccard",
    "pricing_summary",
    "random_project",
    "rollup_orders",
    "router_merge_orders",
    "rowid_dense_orders",
    "semi_join_suppliers",
    "simhash",
    "split_csv_rowids",
    "text_stats",
    "top_orders_by_revenue",
    "topk_parts",
]


def test_registry_first_50_pinned():
    assert list(build_queries())[:50] == DRIVER_SAMPLED_50
    assert _R7_PREFIX == DRIVER_SAMPLED_50
    assert len(set(DRIVER_SAMPLED_50)) == 50
