"""Deterministic Lloyd k-means (similarity.py::kmeans_assign).
Oracle equality for the registry entry runs in
tests/test_registry_oracle.py; here the operator contract is pinned
on a corpus with planted structure."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidb_lightning_release_4_0_spark.operators.similarity import (
    kmeans_assign,
)


def _blobs(spark):
    # 3 tight blobs far apart in 4-d; ids interleave the blobs so the
    # lowest-id init starts with one seed in each of blobs 0,1,2
    rows = []
    centers = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 0.0, 0.0],
               [0.0, 0.0, 10.0, 10.0]]
    for i in range(60):
        c = centers[i % 3]
        jit = ((i * 37) % 7 - 3) / 10.0  # deterministic, +-0.3
        rows.append((i, [x + jit for x in c]))
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return spark.createDataFrame(rows, schema)


def test_blobs_recovered_and_deterministic(spark):
    df = _blobs(spark)
    out = kmeans_assign(df, k=3, iters=2).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"] % 3)
    # every recovered cluster is pure: one planted blob per cluster
    assert len(by_cluster) == 3
    assert all(len(v) == 1 for v in by_cluster.values()), by_cluster
    # rerun -> identical assignment (no rand(), no ordering effects)
    again = {(r["vec_id"], r["cluster"]) for r in
             kmeans_assign(df, k=3, iters=2).collect()}
    assert again == {(r["vec_id"], r["cluster"]) for r in out}


def test_empty_cluster_survives(spark):
    # k=4 over 3 blobs: one init seed loses all points after the
    # first update; the operator must keep going with the survivors
    df = _blobs(spark)
    out = kmeans_assign(df, k=4, iters=2)
    assert out.count() == 60
    assert out.select("cluster").distinct().count() <= 4
