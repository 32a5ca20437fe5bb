"""PageRank (curation.py::pagerank). Oracle equality runs in
tests/test_registry_oracle.py; here the analytic contract is pinned
on graphs with known closed-form behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tidb_lightning_release_4_0_spark.operators.curation import pagerank

_EDGE_SCHEMA = T.StructType([
    T.StructField("src", T.LongType()),
    T.StructField("dst", T.LongType()),
])


def _pr(spark, edges, iters=3):
    df = spark.createDataFrame(edges, _EDGE_SCHEMA)
    return {r["node"]: r["rank"] for r in pagerank(df, iters=iters).collect()}


def test_mass_conserved_and_symmetric(spark):
    # 3-cycle: perfect symmetry -> every node exactly 1/3, any iters
    r = _pr(spark, [(1, 2), (2, 3), (3, 1)], iters=4)
    assert r == {1: pytest.approx(1 / 3, abs=1e-6),
                 2: pytest.approx(1 / 3, abs=1e-6),
                 3: pytest.approx(1 / 3, abs=1e-6)}


def test_authority_orders_and_dangling(spark):
    # 1..4 all point at 5 (dangling). 5's mass must dominate, the
    # total must stay 1 (dangling redistribution), and sources tie.
    r = _pr(spark, [(i, 5) for i in range(1, 5)])
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-5)
    assert r[5] > r[1] * 3
    assert len({r[i] for i in range(1, 5)}) == 1


def test_duplicate_edges_count_once(spark):
    once = _pr(spark, [(1, 2), (2, 1), (1, 3)])
    dup = _pr(spark, [(1, 2), (1, 2), (2, 1), (1, 3), (1, 3)])
    assert once == dup
