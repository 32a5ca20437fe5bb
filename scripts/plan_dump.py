"""Dump .explain('formatted') for bench-timed registry queries.

Usage: python scripts/plan_dump.py <outdir> [query ...]

Writes <outdir>/<query>_<tag>.txt (tag from $PLAN_TAG, default
'before') for each named query, or for every bench-timed query when
none are named. Guide §1: capture the plan shape (Exchange count,
join strategy, PushedFilters, Python eval nodes) before and after
each optimization so claims are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("PLAN_TAG", "before")

BENCH_QUERIES = [
    "checksum_lineitem", "pricing_summary", "top_orders_by_revenue",
    "filtered_revenue", "window_running_total", "dedup_exact",
    "dedup_minhash", "simhash", "text_stats", "ann_topk",
    "embedding_dups", "quality_filter", "dedup_cluster", "lm_score",
    "chunk_documents", "pii_scrub", "dedup_incremental",
    "local_supplier_volume", "waiting_suppliers",
    "click_purchase_attribution", "hll_distinct_parts", "ann_topk_pq",
    "strip_html", "url_canonicalize", "ann_topk_ivfpq",
    "ann_topk_pq_q64", "ann_topk_ivfpq_q64", "dedup_minhash_xx",
    "market_share", "profit_by_nation", "small_qty_revenue",
    "excess_shippers", "bm25_topdocs", "kmeans_embeddings",
    "bloom_prune_orders", "dsir_select_docs", "c4_line_filter_docs",
    "simhash_dup_pairs", "bigram_lm_score", "winnow_fingerprints",
    "bpe_merges",
]


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r11"
    names = sys.argv[2:] or BENCH_QUERIES
    os.makedirs(outdir, exist_ok=True)

    from tidb_lightning_release_4_0_spark.registry import build_queries
    from tidb_lightning_release_4_0_spark.session import get_spark

    spark = get_spark(app_name="plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            plan = f"EXPLAIN FAILED: {e}"
        path = os.path.join(outdir, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
