"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pricing-summary query at sf0.001;
``queries``/``oracle_sql`` expose the operator registry
(tidb_lightning_release_4_0_spark/registry.py) — one entry per
implemented operator from SURVEY.md §2 plus the beyond-reference
training-data operators (dedup / similarity / text analysis), each
with a DuckDB-verifiable ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tidb_lightning_release_4_0_spark.registry import (  # noqa: E402
    build_oracle_sql,
    build_queries,
    q_pricing_summary,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
