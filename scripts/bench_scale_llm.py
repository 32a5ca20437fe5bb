"""LLM-pipeline operator scale curve (round-9 directive #1, extended
to 1024x by round-10 directive #2): measure dedup_minhash /
simhash_dup_pairs / dedup_cluster / ann_ivfpq at 1x..1024x the sf0.1
corpus, recording throughput AND candidate-pair counts so the
"bucketed, not all-pairs" claim is MEASURED — candidate pairs must
grow ~linearly with corpus size while the brute-force all-pairs count
grows quadratically.

Corpus construction (documents): N salted copies of the sf0.1
documents table. Copy k SUFFIXES every token with a copy tag
("word" -> "wordzK"), a bijection on the vocabulary: every 3-word
shingle of copy k is the base shingle with per-token tags, so
within-copy Jaccard similarity is EXACTLY the base corpus's while
shingle sets are DISJOINT across copies (a first attempt that
INSERTED salt tokens between words was scrapped — the inserted token
appears in every shingle, manufacturing similarity between unrelated
docs and exploding the candidate count superlinearly as a corpus
artifact, not an operator property). The true near-dup pair count
therefore grows linearly by construction, and a correctly-bucketed
candidate generator must track it; an all-pairs (or boilerplate-
collapsed) generator would blow up quadratically.

simhash is measured at the SHIPPED DEFAULTS (round-10: 60-bit
signatures, 6 blocks, hamming 3 — Manku combination banding, twenty
30-bit keys). The r9 curve demonstrated the old 32-bit/4-band
one-block banding saturating its 2^8 band space at 64x (1.25B
candidates, 256x infeasible — kept in docs/SCALE_CURVE_LLM_r09.json
as the measured failure mode); the 2^30 combination-key space keeps
expected collision candidates ~ 20 * n^2 / 2^30, i.e. sub-linear in
corpus bytes until n approaches ~10M docs per shard.

Corpus construction (embeddings): N deterministically-jittered
replicas (the same recipe as bench.py's ann50k corpus), queries fixed
at the 64 lowest base ids. The IVF candidate count is the sum over
queries of their probed cells' occupancy — compared against the
brute-force queries x corpus count.

Usage: python scripts/bench_scale_llm.py [N ...]
(default 1 4 16 64 256 1024)
Prints ONE JSON line; the full table also lands in
docs/SCALE_CURVE_LLM_r10.json. Run uncontended.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")), 1)
TMP = os.path.join(REPO, ".tmp", "bench_scale_llm")
# comma list to re-measure a subset (e.g. after an operator fix) and
# deep-merge into the existing curve file; empty = all operators
OPS = {
    o for o in os.environ.get("SPARK_GRAFT_SCALE_OPS", "").split(",") if o
}


def _want(op: str) -> bool:
    return not OPS or op in OPS


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def _med_best(fn):
    ts = [_timed(fn) for _ in range(REPS)]
    return round(statistics.median(ts), 3), round(min(ts), 3)


def build_docs(spark, n: int) -> str:
    """N salted copies of sf0.1 documents -> parquet; returns path.

    crossJoin with a rep range instead of an n-branch union (the r9
    shape): identical corpus (same doc_id mapping, same per-copy
    token-suffix bijection), but the plan stays O(1) in n — a
    1024-branch union plan is its own bottleneck."""
    from pyspark.sql import functions as F

    path = os.path.join(TMP, f"docs_{n}x.parquet")
    if os.path.isdir(path):
        return path
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    reps = spark.range(n).toDF("rep")
    df = base.crossJoin(reps).select(
        (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1z"), F.col("rep").cast("string")),
            )
        )
        .alias("text"),
    )
    df.repartition(CPUS).write.mode("overwrite").parquet(path)
    return path


def build_embs(spark, n: int) -> str:
    """N jittered replicas of sf0.1 embeddings (bench.py's ann50k
    recipe) -> parquet; returns path."""
    from pyspark.sql import functions as F

    path = os.path.join(TMP, f"embs_{n}x.parquet")
    if os.path.isdir(path):
        return path
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    reps = spark.range(n).toDF("rep")
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") * n + F.col("rep")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x
                + (
                    F.pmod(
                        F.hash(F.col("vec_id") * n + F.col("rep"), i),
                        F.lit(1000),
                    )
                    - 500
                )
                / 100000.0
            ).cast("float"),
        ).alias("embedding"),
    )
    big.repartition(max(CPUS // 2, 1)).write.mode("overwrite").parquet(path)
    return path


def simhash_candidate_pairs(
    docs, bits: int = 60, n_bands: int = 6, max_hamming: int = 3,
    max_bucket: int = 256,
) -> int:
    """Unique key-collision pair count BEFORE the hamming filter —
    the candidate set the operator actually scores, r11 shape: the
    shipped hot-bucket cap and the minimal-agreeing-combo single
    emission (so no candidate-volume .distinct(), which itself
    spilled at 1024x in the r10 measurement — SCALE.md finding 3).
    Built from the operator's own helpers so the probe tracks the
    library."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tidb_lightning_release_4_0_spark.operators.dedup import (
        _simhash_block_combos,
        simhash,
    )
    from tidb_lightning_release_4_0_spark.session import (
        derived_shuffle_partitions,
    )

    combos = _simhash_block_combos(bits, n_bands, max_hamming)
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    sigs = docs.select(
        F.col("doc_id"), simhash(F.col("text"), bits).alias("sig")
    )

    def combo_key(combo):
        k = F.lit(0).cast("long")
        for j, b in enumerate(combo):
            blk = (
                F.shiftright(F.col("sig"), b * band_bits)
                .bitwiseAND(F.lit(mask))
            )
            k = k + F.shiftleft(blk, j * band_bits)
        return k

    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("band"),
                        combo_key(c).alias("val"),
                    )
                    for ci, c in enumerate(combos)
                ]
            )
        ).alias("b"),
    ).select(
        "doc_id", "sig",
        F.col("b.band").alias("band"), F.col("b.val").alias("val"),
    )
    parts = derived_shuffle_partitions(
        docs.count() * len(combos), row_bytes=40
    )
    bands = bands.repartition(parts, "band", "val")
    w = Window.partitionBy("band", "val")
    bands = (
        bands.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )
    lut = F.array(
        *[
            F.lit(v)
            for v in __import__(
                "tidb_lightning_release_4_0_spark.operators.dedup",
                fromlist=["_simhash_min_combo_lut"],
            )._simhash_min_combo_lut(combos, n_bands)
        ]
    )
    x = F.col("l.sig").bitwiseXOR(F.col("r.sig"))
    zb = F.lit(0)
    for b in range(n_bands):
        zb = zb + F.shiftleft(
            (
                F.shiftright(x, b * band_bits).bitwiseAND(F.lit(mask))
                == 0
            ).cast("int"),
            b,
        )
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .filter(F.col("l.band") == F.element_at(lut, zb + 1))
        .count()
    )


def ivf_candidates(spark, corpus, n_cells: int, n_probe: int) -> int:
    """Sum over queries of their probed cells' occupancy — the exact
    candidate count ann_topk_ivfpq's probe join scores."""
    import tidb_lightning_release_4_0_spark.operators.similarity as SIM

    cents = SIM._collect_centroids(corpus, n_cells, "vec_id", "embedding")
    enc = SIM._np_corpus_encode(corpus, "embedding", "vec_id", cents=cents)
    sizes = {r["_cell"]: r["count"] for r in enc.groupBy("_cell").count().collect()}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    total = 0
    for r in corpus.filter("vec_id < 64").select("vec_id", "embedding").collect():
        vec = [float(x) for x in r["embedding"]]
        vn = math.sqrt(dot(vec, vec))
        scored = []
        for i, (_, cv) in enumerate(cents):
            den = vn * math.sqrt(dot(cv, cv))
            scored.append((i, dot(vec, cv) / den if den > 0 else float("-inf")))
        probed = sorted(scored, key=lambda t: (-t[1], t[0]))[:n_probe]
        total += sum(sizes.get(i, 0) for i, _ in probed)
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from tidb_lightning_release_4_0_spark.operators import curation as CU
    from tidb_lightning_release_4_0_spark.operators import dedup as D
    from tidb_lightning_release_4_0_spark.operators import similarity as SIM
    from tidb_lightning_release_4_0_spark.session import get_spark

    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64, 256, 1024]
    os.makedirs(TMP, exist_ok=True)
    spark = get_spark(app_name="bench_scale_llm", shuffle_partitions=CPUS)
    load_start = os.getloadavg()[0]

    points: dict[str, dict] = {}
    for n in scales:
        docs = spark.read.parquet(build_docs(spark, n))
        n_docs = docs.count()
        text_mib = (
            docs.agg(F.sum(F.octet_length("text"))).first()[0] / (1 << 20)
        )
        brute_pairs = n_docs * (n_docs - 1) // 2
        entry: dict = {
            "rows_docs": n_docs,
            "text_mib": round(text_mib, 2),
            "all_pairs_bruteforce": brute_pairs,
        }

        # --- dedup_minhash (LSH banding, skew-capped buckets) ---
        if _want("dedup_minhash"):
            mh = lambda: D.minhash_lsh_pairs(docs, threshold=0.2).count()  # noqa: E731
            mh()  # warm
            med, best = _med_best(mh)
            entry["dedup_minhash"] = {
                "sec": med, "sec_best": best,
                "mib_per_sec": round(text_mib / med, 2),
                "mib_per_sec_best": round(text_mib / best, 2),
                "dup_pairs": D.minhash_lsh_pairs(
                    docs, threshold=0.2
                ).count(),
                # pre-threshold bucket-co-located pairs: the candidates
                "candidate_pairs": D.minhash_lsh_pairs(
                    docs, threshold=0.0
                ).count(),
            }

        # --- simhash_dup_pairs at the SHIPPED DEFAULTS (no kwargs, so
        # the curve measures exactly what a user gets). The r9 curve
        # demonstrated the retired 32-bit/4-band default saturating
        # its 2^8 band space at 64x (docs/SCALE_CURVE_LLM_r09.json);
        # the 60/6/3 combination banding's 2^30 key space removes the
        # skip — every cell is measured.
        if _want("simhash_dup_pairs"):
            sh = lambda: D.simhash_dup_pairs(docs).count()  # noqa: E731
            sh()
            med, best = _med_best(sh)
            entry["simhash_dup_pairs"] = {
                "sec": med, "sec_best": best,
                "mib_per_sec": round(text_mib / med, 2),
                "mib_per_sec_best": round(text_mib / best, 2),
                "dup_pairs": D.simhash_dup_pairs(docs).count(),
                "candidate_pairs": simhash_candidate_pairs(docs),
            }

        # --- dedup_cluster (connected components over the pair graph)
        if _want("dedup_cluster"):
            cl = lambda: CU.connected_components(  # noqa: E731
                D.minhash_lsh_pairs(docs, threshold=0.2)
            ).count()
            cl()
            med, best = _med_best(cl)
            entry["dedup_cluster"] = {
                "sec": med, "sec_best": best,
                "mib_per_sec": round(text_mib / med, 2),
                "mib_per_sec_best": round(text_mib / best, 2),
                "clusters": CU.connected_components(
                    D.minhash_lsh_pairs(docs, threshold=0.2)
                ).count(),
            }

        # --- ann_ivfpq at the same replication factor ---
        if _want("ann_ivfpq_q64"):
            corpus = spark.read.parquet(build_embs(spark, n)).cache()
            n_vec = corpus.count()
            emb_mib = n_vec * 64 * 4 / (1 << 20)
            q = corpus.filter(F.col("vec_id") < 64)
            ann = lambda: SIM.ann_topk_ivfpq(  # noqa: E731
                q, corpus, k=5, n_cells=32, n_probe=2, encode="numpy"
            ).count()
            ann()
            med, best = _med_best(ann)
            cand = ivf_candidates(spark, corpus, n_cells=32, n_probe=2)
            entry["ann_ivfpq_q64"] = {
                "rows_vectors": n_vec,
                "emb_mib": round(emb_mib, 2),
                "sec": med, "sec_best": best,
                "mib_per_sec": round(emb_mib / med, 2),
                "mib_per_sec_best": round(emb_mib / best, 2),
                "candidate_pairs": cand,
                "all_pairs_bruteforce": 64 * (n_vec - 1),
                "prune_ratio": round(cand / (64 * (n_vec - 1)), 4),
            }
            corpus.unpersist()
        points[f"{n}x"] = entry
        print(f"# {n}x done: {json.dumps(entry)}", file=sys.stderr)

    # merge into the existing curve file so incremental runs
    # (e.g. re-measuring ONE operator after a fix) extend rather than
    # clobber; a fresh round file seeds from the prior round's so
    # untouched operators carry their last measurement (provenance in
    # the "note" field)
    path = os.path.join(REPO, "docs", "SCALE_CURVE_LLM_r12.json")
    seed = path if os.path.exists(path) else os.path.join(
        REPO, "docs", "SCALE_CURVE_LLM_r11.json"
    )
    merged = points
    if os.path.exists(seed):
        try:
            with open(seed) as f:
                prior = json.load(f).get("points", {})
            merged = dict(prior)
            for scale, entry in points.items():
                merged[scale] = {**merged.get(scale, {}), **entry}
        except (OSError, ValueError):
            pass
    out = {
        "metric": "llm_operator_scale_curve",
        "unit": "MiB/s",
        "sf": 0.1,
        "reps": REPS,
        "cpus": CPUS,
        "loadavg_start": round(load_start, 2),
        "note": (
            "cells measured this run: ops="
            + (",".join(sorted(OPS)) if OPS else "all")
            + f" scales={scales}; other cells carried from the prior "
            "round's curve (operator code unchanged there)"
        ),
        "points": merged,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
