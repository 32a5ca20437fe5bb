"""Loader for the driver's synthetic parquet tables (TESTDATA.md).

The testdata is written with TIMESTAMP(NANOS) parquet logical type,
which Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We
read nanos as longs (spark.sql.legacy.parquet.nanosAsLong) and
rebuild proper TimestampType columns with integer division — the
footer (read driver-side via pyarrow, O(KB)) tells us which columns
are nanosecond timestamps. DuckDB performs the same ns -> us
truncation, so values agree across engines.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nanos_ts_cols(path: str) -> list[str]:
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin UTC so timestamp rendering/collection matches DuckDB's naive
    # timestamps regardless of the caller's session defaults
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in _nanos_ts_cols(path):
        # integer DIV keeps full precision (ns values overflow double)
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    out = {}
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            df = load_table(spark, sf_dir, t)
            if register_views:
                df.createOrReplaceTempView(t)
            out[t] = df
    return out
