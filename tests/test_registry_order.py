"""Driver-snapshot stability: CORRECTNESS snapshots sample exactly
the first 50 insertion-order entries of build_queries(). Accidental
reordering (an alphabetizing refactor, an insert in the middle)
would silently change WHICH queries the driver attests — this pin
makes that a loud local failure. Update deliberately when rotating
(each round's rotation is a planned, reviewed change).
"""

from tidb_lightning_release_4_0_spark.registry import (
    _R10_PREFIX,
    build_queries,
)

# Round-10 rotation (docs/ROTATION.md): the lead block is the two
# new round-10 entries (media_decode_jpeg / media_resize_jpeg — the
# baseline-JPEG codec path, first-ever hash checks) plus
# media_header_meta (EXTENDED with JVM-side JPEG SOF0 parsing — must
# re-attest), then the oldest-attested cohort by
# (latest-attested-round, name) across CORRECTNESS_r0{1..9}: the
# eleven remaining r06 entries and the first 36 of the r07 cohort
# (mysql_cast_tinyint rolls to round 11).
DRIVER_SAMPLED_50 = [
    "media_decode_jpeg",
    "media_resize_jpeg",
    "media_header_meta",
    "rfm_segments",
    "salted_agg_lineitem",
    "sessionize_events",
    "simhash_dup_pairs",
    "strip_boilerplate_docs",
    "top_terms",
    "triangles_dupgraph",
    "weighted_sample_docs",
    "winnow_candidates",
    "winnow_fingerprints",
    "zipf_alpha_docs",
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
    "corpus_diff_docs",
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
    "hist_quantiles_price",
    "index_checksum_orders",
    "json_extract_events",
    "jsonl_roundtrip",
    "kv_crc64_orders",
    "minhash_signatures",
]


def test_registry_first_50_pinned():
    assert list(build_queries())[:50] == DRIVER_SAMPLED_50
    assert _R10_PREFIX == DRIVER_SAMPLED_50
    assert len(set(DRIVER_SAMPLED_50)) == 50
