"""Input-partitioning helpers shared by the corpus operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Spread a small (few-file) scan across the cluster's cores.

    Small corpora often arrive as one parquet file -> one partition,
    serializing per-row work (signatures, norms) on a single core. A
    large corpus already has >= parallelism input files, so this is a
    no-op there — the gate reads only scan metadata (file listing),
    never triggers a job or an RDD conversion, and never forces a
    shuffle on data that is already well partitioned (the wrong
    reflex at 100 TB would be an unconditional repartition of the
    whole corpus).
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        return df
    if 0 < nfiles < max(par // 2, 1):
        return df.repartition(par)
    return df
