"""Stage-level timing of the ann50k bench cells (r12 directive #5):
split ann_topk_ivfpq(encode="numpy") into its sequential driver
stages — centroid collect, query collect + driver table build, fused
mapInPandas job — using the same cached 50k-vector corpus bench.py
builds. Prints one JSON line per rep set.

Usage: python scripts/profile_ann50k.py [reps]
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
TMP = os.path.join(REPO, ".tmp", "bench")


def main() -> None:
    from pyspark.sql import functions as F

    import tidb_lightning_release_4_0_spark.operators.similarity as SIM
    from tidb_lightning_release_4_0_spark.session import get_spark

    spark = get_spark(app_name="profile_ann50k", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    sf_tag = os.path.basename(SF_DIR.rstrip("/")) or "sf"
    ann_dir = os.path.join(TMP, f"ann50k_{sf_tag}.parquet")
    if not os.path.isdir(ann_dir):
        raise SystemExit("run bench.py once first to build the corpus")
    corpus = spark.read.parquet(ann_dir)
    queries = corpus.filter(F.col("vec_id") < 64)

    # warm both paths once (bench parity)
    SIM.ann_topk_pq(
        queries.limit(3), corpus.limit(1000), k=5, encode="numpy"
    ).count()
    SIM.ann_topk_ivfpq(
        queries.limit(3), corpus.limit(1000), k=5, n_cells=8, n_probe=2,
        encode="numpy",
    ).count()

    out: dict = {"stages": []}
    for _ in range(REPS):
        t0 = time.monotonic()
        cents = SIM._collect_centroids(corpus, 32, "vec_id", "embedding")
        t1 = time.monotonic()
        qrows = queries.select("vec_id", "embedding").collect()
        t2 = time.monotonic()
        # driver table build (same math the operator runs)
        import math

        def py_sq_l2(sub, cent):
            acc = 0.0
            for x, y in zip(sub, cent):
                d = x - y
                acc += d * d
            return acc

        rows = []
        for r in qrows:
            vec = [float(x) for x in r["embedding"]]
            tabs = [
                [
                    py_sq_l2(
                        vec[m * SIM._PQ_SUB : (m + 1) * SIM._PQ_SUB],
                        SIM._pq_centroid(m, j),
                    )
                    for j in range(SIM._PQ_K)
                ]
                for m in range(SIM._PQ_M)
            ]
            vnorm = math.sqrt(SIM._py_dot(vec, vec))
            scored = []
            for i, (_, cv) in enumerate(cents):
                den = vnorm * math.sqrt(SIM._py_dot(cv, cv))
                scored.append(
                    (i, SIM._py_dot(vec, cv) / den if den > 0 else -1e30)
                )
            probed = sorted(scored, key=lambda t: (-t[1], t[0]))
            rows.append((int(r["vec_id"]), tabs, [i for i, _ in probed[:2]]))
        t3 = time.monotonic()
        fused = SIM._np_pq_topk_fused(
            corpus, "embedding", "vec_id", 5,
            [r[0] for r in rows], [r[1] for r in rows],
            cents=cents, q_cells=[r[2] for r in rows],
        )
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(
            F.col("_ad").asc(), F.col("c_id").asc()
        )
        (
            fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .count()
        )
        t4 = time.monotonic()
        # the full operator, for the end-to-end number
        SIM.ann_topk_ivfpq(
            queries, corpus, k=5, n_cells=32, n_probe=2, encode="numpy"
        ).count()
        t5 = time.monotonic()
        out["stages"].append(
            {
                "centroid_collect": round(t1 - t0, 3),
                "query_collect": round(t2 - t1, 3),
                "driver_tables": round(t3 - t2, 3),
                "fused_job": round(t4 - t3, 3),
                "full_operator": round(t5 - t4, 3),
            }
        )
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
