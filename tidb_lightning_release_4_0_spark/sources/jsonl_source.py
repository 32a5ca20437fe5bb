"""JSON-Lines source — the ingest side of the training-data handoff
format (curation.export_jsonl writes it; this reads it back).

Beyond-reference source extension (the reference reads mydumper
CSV/SQL only): JSONL is what most public corpus distributions and
training loaders speak, so a user curating data with this engine can
both emit and re-ingest it without leaving Spark.

Scale shape: Spark's native JSON reader with an EXPLICIT schema —
no sampling/inference pass over 100 TB — and multiLine=false, so
uncompressed shards split at maxPartitionBytes byte ranges (JSONL's
one-object-per-line framing makes line-boundary resync exact);
gzip shards parallelize per-file. PERMISSIVE mode captures rows that
fail the schema into a corrupt-record column instead of failing the
job, mirroring the CSV fast path's fallback contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    paths: list[str] | str,
    schema: T.StructType | str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL file(s) with an explicit schema.

    ``schema``: StructType or DDL string ("doc_id bigint, text
    string, ..."). ``keep_corrupt=True`` appends ``_corrupt_record``
    (the raw line for rows that failed the schema; NULL otherwise) —
    the caller decides whether to route them to a fallback parse or
    count them as data-quality signal.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    fields = list(schema.fields)
    if keep_corrupt:
        fields = fields + [
            T.StructField(CORRUPT_COL, T.StringType(), True)
        ]
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(T.StructType(fields))
        .json(paths)
    )
    if not keep_corrupt and CORRUPT_COL in df.columns:
        df = df.drop(CORRUPT_COL)
    return df
