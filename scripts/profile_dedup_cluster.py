"""Job-level timing of dedup_cluster at local[$SPARK_GRAFT_CPUS]
(r12 directive #3: the r11 32-core driver run read 4.10 s vs 1.58 s
at 8 cores on untouched code). Splits the query into its sequential
pieces — pair-source materialization (the take() fast-path probe),
driver union-find, label frame build — and times the bench's exact
`.count()` action, with dedup_minhash alongside as the pair-source
control.

Usage: python scripts/profile_dedup_cluster.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    from tidb_lightning_release_4_0_spark.operators import curation as CU
    from tidb_lightning_release_4_0_spark.operators import dedup as D
    from tidb_lightning_release_4_0_spark.session import get_spark
    from tidb_lightning_release_4_0_spark.sources.testdata import load_table

    spark = get_spark(app_name="profile_cluster", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # bench-parity warm-up
    D.minhash_lsh_pairs(docs, threshold=0.2).count()

    out: dict = {"reps": []}
    for _ in range(REPS):
        rec: dict = {}
        t0 = time.monotonic()
        D.minhash_lsh_pairs(docs, threshold=0.2).count()
        rec["dedup_minhash_count"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        CU.connected_components(
            D.minhash_lsh_pairs(docs, threshold=0.2)
        ).count()
        rec["dedup_cluster_count"] = round(time.monotonic() - t0, 3)

        # piecewise: the take() probe vs everything after it
        from pyspark.sql import functions as F

        pairs = D.minhash_lsh_pairs(docs, threshold=0.2)
        e = pairs.select(
            F.col("left_id").alias("src"), F.col("right_id").alias("dst")
        ).localCheckpoint(eager=False)
        t0 = time.monotonic()
        head = e.take(200_001)
        rec["pairs_take"] = round(time.monotonic() - t0, 3)
        rec["n_pairs"] = len(head)
        t0 = time.monotonic()
        rows = CU.union_find_min([(r["src"], r["dst"]) for r in head])
        rec["union_find"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        spark.createDataFrame(
            rows,
            schema=e.select(
                F.col("src").alias("doc_id"),
                F.col("dst").alias("cluster_id"),
            ).schema,
        ).count()
        rec["labels_count"] = round(time.monotonic() - t0, 3)
        out["reps"].append(rec)
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
