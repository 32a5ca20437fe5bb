"""PySpark-native bulk-ingest / data-pipeline engine.

A from-scratch re-expression of the capabilities of
scsldb/tidb-lightning-release-4.0 (see /root/reference) on Apache Spark:

- mydumper-format dump discovery (schema/data file classification,
  black/white-list filtering, table routing / shard-merge)
- CSV and SQL-dump sources with MySQL LOAD DATA semantics
- MySQL type casting (strict / lenient SQL modes), default fill,
  column permutation, deterministic row-id assignment
- CRC checksum verification aggregates (local vs sink re-scan)
- checkpointed, resumable multi-table restore orchestration
- JDBC / Parquet / Delta-style sinks with replace / ignore / error
  duplicate handling

Beyond the reference, it adds large-scale training-data pipeline
operators: exact & fuzzy deduplication (MinHash-LSH, SimHash, n-gram
Jaccard, embedding cosine), similarity search, text analysis, and
multimodal column plumbing.

Everything is DataFrame-first: logical plans are declared with the
PySpark DataFrame/SQL API so Catalyst/Tungsten choose physical
strategies; Python-side code is confined to plan construction and the
few genuinely custom kernels (mydumper statement lexing, crc64-ecma).
"""

__version__ = "0.1.0"
