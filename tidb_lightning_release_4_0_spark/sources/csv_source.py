"""S4: CSV source with MySQL LOAD DATA INFILE semantics.

The reference's CSV parser (lightning/mydump/csv_parser.go:13-152,
grammar csv_parser.rl:23-54) supports configurable separator /
delimiter / header / null sentinel (default ``\\N``) /
backslash-escape / trim-last-separator, quoted newlines and ``""``
escaping. Spark's native CSV reader covers this near-1:1
(SURVEY.md §2.1 S4) — it is splittable, vectorized and JVM-side, so
it *replaces* rather than ports the Ragel lexer; only
``trim-last-separator`` needs a post-fix.

All columns are read as strings; typing happens in the cast layer
(T3), mirroring the reference where every CSV field starts as a
string datum (csv_parser.go:62-76).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..config import CSVConfig


def read_csv(
    spark: SparkSession,
    paths: list[str] | str,
    cfg: CSVConfig,
    num_columns: int | None = None,
    column_names: list[str] | None = None,
    byte_faithful: bool = True,
) -> DataFrame:
    """Read CSV file(s) into an all-string DataFrame.

    Column naming: with ``cfg.header`` the file's header row names the
    columns (order only — never types, csv_parser.go:101-118);
    otherwise ``_c0.._cN`` positional names (or ``column_names``).

    Scale: the reader is splittable (quoted newlines force multiLine
    which disables intra-file splitting, same trade-off the reference
    makes by re-syncing rows at chunk boundaries); with many files,
    parallelism comes from the file list. Filters/pruning push into
    the scan via Catalyst.
    """
    cfg.validate()
    opts = cfg.spark_options()
    if byte_faithful:
        # Read ISO-8859-1: every byte maps 1:1 to a char, so BLOB
        # columns with raw bytes survive the reader (the reference's
        # parser is byte-oriented, csv_parser.rl). The cast layer
        # re-decodes text columns to the table charset.
        opts["encoding"] = "ISO-8859-1"
    reader = spark.read.options(**opts)
    # mydumper writes a trailing separator: the lexer DROPS the extra
    # field it produces (csv_parser.rl trim-last-sep), it does not
    # null out the real last column — so read n+1 columns and drop
    # the synthetic one. A legitimately-empty last value ('' vs NULL)
    # survives intact.
    extra = "_trailing_sep" if cfg.trim_last_sep else None
    if column_names:
        names = list(column_names) + ([extra] if extra else [])
        schema = T.StructType(
            [T.StructField(c, T.StringType(), True) for c in names]
        )
        df = reader.schema(schema).csv(paths)
    elif num_columns:
        n = num_columns + (1 if extra else 0)
        schema = T.StructType(
            [T.StructField(f"_c{i}", T.StringType(), True) for i in range(n)]
        )
        df = reader.schema(schema).csv(paths)
        if extra:
            extra = f"_c{num_columns}"
    else:
        # infer column COUNT only (types stay string); with a trailing
        # separator the inferred frame already carries the extra field
        # as its last column
        df = reader.option("inferSchema", "false").csv(paths)
        if cfg.trim_last_sep:
            extra = df.columns[-1]
    if extra:
        df = df.drop(extra)
    return df
