"""Weighted sampling without replacement (curation.weighted_sample).
Oracle equality runs in tests/test_registry_oracle.py; here the
statistical contract is pinned: inclusion tracks weight, and the draw
is a function of ids alone (reproducible across partitionings)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidb_lightning_release_4_0_spark.operators.curation import (
    weighted_sample,
)

_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("w", T.DoubleType()),
])


def test_weight_proportional_inclusion(spark):
    # 500 light rows (w=1) + 50 heavy rows (w=100): a 50-row sample
    # must be dominated by heavy rows (E[heavy] ~ 47)
    rows = [(i, 1.0) for i in range(500)] + [
        (1000 + i, 100.0) for i in range(50)
    ]
    out = weighted_sample(
        spark.createDataFrame(rows, _SCHEMA), "w", 50
    ).collect()
    heavy = sum(1 for r in out if r["doc_id"] >= 1000)
    assert len(out) == 50
    assert heavy >= 35, heavy


def test_repartition_invariant(spark):
    rows = [(i, float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, _SCHEMA)
    a = {(r["doc_id"], r["sample_rank"])
         for r in weighted_sample(df, "w", 20).collect()}
    b = {(r["doc_id"], r["sample_rank"])
         for r in weighted_sample(df.repartition(13), "w", 20).collect()}
    assert a == b


def test_rank_one_is_argmax_key(spark):
    # sanity: the kept set is exactly the n largest ln(u)/w keys
    import hashlib

    rows = [(i, float(1 + (i * 13) % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {r["doc_id"] for r in weighted_sample(df, "w", 10).collect()}
    import math

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return math.log((h + 1) / float((1 << 60) + 1)) / w

    expect = {i for i, _ in sorted(
        rows, key=lambda t: (-key(*t), t[0])
    )[:10]}
    assert out == expect
