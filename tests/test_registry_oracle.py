"""Every queries()/oracle_sql() pair must hash-match under the local
replica of the driver's DuckDB comparison."""

from __future__ import annotations

import pytest

from tidb_lightning_release_4_0_spark.registry import (
    build_oracle_sql,
    build_queries,
)
from tests.oracle import compare

QUERIES = build_queries()
ORACLES = build_oracle_sql()


def test_registry_complete():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir)
