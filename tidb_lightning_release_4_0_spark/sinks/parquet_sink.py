"""Parquet sink — the bulk-file analog of the importer backend (K2).

The reference's importer backend streams KV mutations and then
atomically ingests SSTs (lightning/backend/importer.go:104-221).
The Spark-native analog is a partitioned parquet (or Delta) write
followed by an atomic publish; dedup modes are applied on read-back
for `replace`/`ignore` using the table's key columns.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import Sink, SinkResult


class ParquetSink(Sink):
    def __init__(
        self,
        root: str,
        on_duplicate: str = "replace",
        key_columns: dict[str, list[str]] | None = None,
        partition_spec: dict[str, tuple[str, int]] | None = None,
        sorted_output: bool = False,
        bucket_buckets: int = 0,
        incremental: bool = False,
        zorder_columns: list[str] | None = None,
    ):
        self.root = root
        self.on_duplicate = on_duplicate
        #: sort rows by PK within each output file (local sort, no
        #: shuffle) — the sorted-SST ingest analog; enables min/max
        #: pruning for readers of the delivered table
        self.sorted_output = sorted_output
        #: >0: deliver keyed tables hash-bucketed on the PK
        #: (df.write.bucketBy(n).sortBy) and register them in the
        #: session catalog — downstream joins/aggs between tables
        #: bucketed on the same key with the same n run WITHOUT a
        #: shuffle (the co-located-join property the reference gets
        #: from range-sharded SST regions). Whole-table delivery only
        #: (bucket layout is a per-table invariant, so no engine
        #: split and no post-hoc compaction).
        self.bucket_buckets = bucket_buckets
        #: cross-RUN dup semantics: a new load merges with the
        #: already-delivered table instead of overwriting it —
        #: replace: arriving rows win; ignore: delivered rows win;
        #: error: any key overlap raises Duplicate entry. This is the
        #: tidb-backend behavior (INSERT/REPLACE/INSERT IGNORE into a
        #: live table, tidb.go:54-62; golden flow
        #: tests/tidb_duplicate_data/run.sh) mapped to bulk files.
        self.incremental = incremental
        #: Z-order clustered delivery: tables containing ALL these
        #: columns are range-partitioned + sorted on the interleaved
        #: bit code of the columns' quantile-bin ranks, so EVERY
        #: listed column gets narrow per-file min/max ranges — the
        #: multi-column file-pruning property (Delta/Iceberg
        #: OPTIMIZE ZORDER analog; single-column sorts prune one
        #: dimension only). Takes precedence over sorted_output.
        self.zorder_columns = zorder_columns or []
        self.key_columns = key_columns or {}
        # table -> (column, n): PARTITION BY HASH/KEY targets map to a
        # partitioned parquet layout, `_p = value mod n` directory
        # partitions (MySQL hash partitioning is modulo for integer
        # columns; tests/partitioned-table golden)
        self.partition_spec = partition_spec or {}
        # table -> StructType delivered by THIS process's plain
        # (non-directory-partitioned) writes: read_back can then skip
        # parquet schema inference — a driver-side footer-read job
        # per spark.read.parquet, paid twice per restored table
        # (verify + analyze). Partitioned layouts are never recorded
        # (their columns come from directory discovery), and a table
        # not written this process falls back to inference.
        self._delivered_schema: dict = {}

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table.replace("`", ""))

    @staticmethod
    def _catalog_ident(table: str) -> tuple[str, str]:
        """'db.tbl' -> catalog (database, table) names: the dump's
        database becomes `tlr4s_<db>` in the session catalog. Names
        are sanitized to bare identifiers (catalog.createTable parses
        its name argument unquoted) and digit-leading table names —
        legal in MySQL — get a ``t_`` prefix; collisions between
        sanitized names (``a-b`` vs ``a_b``) are accepted and
        documented, the sink path keeps the original name."""
        import re

        parts = table.replace("`", "").split(".")
        db = parts[0] if len(parts) > 1 else "default"
        san = lambda x: re.sub(r"[^0-9A-Za-z_]", "_", x)  # noqa: E731
        tbl = san(parts[-1])
        if tbl and tbl[0].isdigit():
            tbl = "t_" + tbl
        return "tlr4s_" + san(db), tbl

    def init_schema(self, spark, table, schema, ddl=None) -> None:
        """K5: create the catalog database + external table from the
        dump's DDL before any data lands (restoreSchema analog,
        restore.go:329-373) — `SHOW TABLES IN tlr4s_<db>` reflects
        the dump's structure immediately; the entry points at the
        (still empty) sink path and becomes queryable as engines
        deliver."""
        db, tbl = self._catalog_ident(table)
        path = self._path(table)
        os.makedirs(path, exist_ok=True)
        st = schema.struct_type
        if not schema.has_int_pk:
            from ..operators.permutation import ROWID_COL
            from pyspark.sql import types as T

            st = st.add(T.StructField(ROWID_COL, T.LongType()))
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
        spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{tbl}`")
        spark.catalog.createTable(
            f"{db}.{tbl}",
            path=path,
            source="parquet",
            schema=st,
            recursiveFileLookup="true",
        )

    def probe(self, spark: SparkSession) -> None:
        """O10: the target root must be creatable and writable."""
        try:
            os.makedirs(self.root, exist_ok=True)
            t = os.path.join(self.root, ".tlr4s_probe")
            with open(t, "w") as f:
                f.write("ok")
            os.remove(t)
        except OSError as e:
            raise RuntimeError(
                f"parquet sink target {self.root!r} is not writable: {e}"
            ) from e

    _Z_BITS = 8  # quantile bins per column (2^8 = 256 ranks)

    def _zorder(self, df: DataFrame) -> DataFrame | None:
        """Cluster rows along the Z-curve of the configured columns.

        Each column is ranked into 256 approximate-quantile bins
        (one sampling pass at write time — the opt-in cost), the bin
        ranks are bit-interleaved into a single code, and the data is
        range-partitioned + sorted on that code. Every file then
        covers a small hyper-rectangle: a predicate on ANY of the
        z-columns prunes to ~files^(1/k) of the files, where a plain
        sort prunes only its leading column."""
        cols = self.zorder_columns
        # the documented contract: only tables containing ALL listed
        # columns are z-ordered — a partial match must not impose the
        # layout (and its sampling pass) on an unrelated table
        if len(cols) < 2 or not all(c in df.columns for c in cols):
            return None
        # quantile edges from a sample (driver-sized: bins x cols)
        qs = [i / (1 << self._Z_BITS) for i in range(1, 1 << self._Z_BITS)]
        num = df.select(
            *[F.col(c).cast("double").alias(c) for c in cols]
        )
        edges = num.approxQuantile(cols, qs, 0.01)
        def bin_expr(c: str, es: list[float]):
            # rank = number of edges <= value (codegen'd lambda over
            # a literal array; 255 comparisons per row per column)
            arr = ", ".join(repr(float(e)) for e in es)
            return F.expr(
                f"cardinality(filter(array({arr}), "
                f"e -> e <= cast({c} as double)))"
            )
        z = F.lit(0).cast("long")
        for bit in range(self._Z_BITS):
            for ci, c in enumerate(cols):
                b = bin_expr(c, edges[ci])
                z = z + F.shiftleft(
                    F.shiftright(b.cast("long"), bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + ci,
                )
        return (
            df.withColumn("_zcode", z)
            .repartitionByRange("_zcode")
            .sortWithinPartitions("_zcode")
            .drop("_zcode")
        )

    def _sorted(self, df: DataFrame, table: str) -> DataFrame:
        """Key-sorted delivery (opt-in).

        ``sorted_output=True`` (file grain): local per-task sort on
        the PK — no exchange — so each output file is internally
        ordered and carries tight min/max statistics (the sorted-SST
        ingest property, mapped to parquet zone maps).

        ``sorted_output="global"``: range-partition + sort — files
        cover DISJOINT ascending key ranges across the whole table,
        the full analog of the reference streaming sorted SSTs into
        range-sharded regions (backend/sql2kv.go KV ordering →
        importer ingest). Costs one sampled range exchange; buys
        file-level pruning for any downstream key-range scan (a
        range predicate touches O(files_in_range), not O(all
        files)).

        ``zorder_columns`` (takes precedence): multi-column Z-curve
        clustering — see _zorder."""
        zdf = self._zorder(df)
        if zdf is not None:
            return zdf
        keys = self.key_columns.get(table)
        if not (self.sorted_output and keys):
            return df
        sort_cols = [k for k in keys if k in df.columns]
        if not sort_cols:
            return df
        if self.sorted_output == "global":
            return df.repartitionByRange(*sort_cols).sortWithinPartitions(
                *sort_cols
            )
        return df.sortWithinPartitions(*sort_cols)

    def _partitioned(self, df: DataFrame, table: str):
        spec = self.partition_spec.get(table)
        if not spec or spec[0] not in df.columns or spec[1] <= 0:
            return df, []
        col, n = spec
        return (
            df.withColumn("_p", F.pmod(F.col(col).cast("long"), F.lit(n))),
            ["_p"],
        )

    @staticmethod
    def _invalidate_sidecar(path: str) -> None:
        """Any fresh delivery invalidates the delivered-checksum
        sidecar (the pipeline re-stores it after verification; a
        stale one would poison a later incremental C3). The caller
        reads the prior value BEFORE write() runs."""
        sc = os.path.join(path, "_checksum.json")
        if os.path.exists(sc):
            os.remove(sc)

    def write(self, df: DataFrame, table: str) -> SinkResult:
        # No up-front sidecar invalidation here: a REJECTED batch (any
        # dup mode) must leave the delivered checksum armed, and every
        # successful non-incremental publish replaces the whole dir —
        # which removes a stale sidecar implicitly. Only write_engine
        # needs an explicit invalidate (engine subdirs never clear the
        # table root).
        path = self._path(table)
        self._recover_merge(path)
        keys = self.key_columns.get(table)
        if keys and self.on_duplicate in ("replace", "ignore"):
            # keyed upsert semantics (K3 dup modes, tidb.go:54-62):
            # replace -> last row per key wins; ignore -> first kept.
            # _row_id gives the deterministic arrival order.
            order = F.col("_row_id") if "_row_id" in df.columns else F.lit(0)
            direction = order.desc() if self.on_duplicate == "replace" else order.asc()
            w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(direction)
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        if "_row_id" in df.columns:
            df = df.drop("_row_id")  # arrival order served its purpose
        if self.incremental and self._has_data(path):
            return self._write_incremental(df, table, path, keys)
        if self.bucket_buckets > 0 and keys:
            return self._write_bucketed(df, table, path, keys)
        df = self._sorted(df, table)
        if keys and self.on_duplicate == "error":
            # dup detection runs against a STAGING copy, key-pruned, so
            # the whole source parse/cast pipeline isn't re-run (for
            # .sql dumps that second pass was a full Python-lexer
            # re-read). Only a validated result is published — a
            # duplicate input or a crash mid-check leaves prior good
            # data at the destination untouched (the reference's tidb
            # backend errors mid-INSERT without clobbering the target,
            # tidb.go:271-316).
            tmp = path + ".staging"
            shutil.rmtree(tmp, ignore_errors=True)
            pdf, pcols = self._partitioned(df, table)
            pdf.write.mode("overwrite").partitionBy(*pcols).parquet(tmp)
            spark = df.sparkSession
            dup = (
                spark.read.parquet(tmp)
                .groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
            ).collect()
            if dup:
                shutil.rmtree(tmp, ignore_errors=True)
                raise ValueError(f"Duplicate entry for key {dup[0]}")
            shutil.rmtree(path, ignore_errors=True)
            os.replace(tmp, path)
            self._record_schema(table, pdf, pcols)
        else:
            pdf, pcols = self._partitioned(df, table)
            pdf.write.mode("overwrite").partitionBy(*pcols).parquet(path)
            self._record_schema(table, pdf, pcols)
        # rows are reported by the caller's Observation (no extra scan)
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
        )
        return SinkResult(table=table, rows=-1, bytes_written=size)

    def _write_bucketed(
        self, df: DataFrame, table: str, path: str, keys: list[str]
    ) -> SinkResult:
        """Bucketed delivery: hash-bucket + sort the table on its PK
        and register the bucket layout in the session catalog, so a
        downstream join or aggregation between two tables delivered
        with the same key/bucket-count needs NO exchange — the Spark
        analog of the reference's range-sharded, key-sorted regions
        (every SST batch lands pre-sorted inside one region,
        backend/sql2kv.go KV ordering). Costs one shuffle at write
        time (paid once), saves one per downstream join (paid per
        query).

        `error` dup mode validates against an unbucketed STAGING copy
        first (one extra scan of staged bytes, not a source re-parse);
        only validated data reaches the target."""
        # conservative: bucketed layouts re-infer schema on read_back
        self._delivered_schema.pop(table, None)
        spark = df.sparkSession
        db, tbl = self._catalog_ident(table)
        tmp = None
        if self.on_duplicate == "error":
            tmp = path + ".staging"
            shutil.rmtree(tmp, ignore_errors=True)
            df.write.mode("overwrite").parquet(tmp)
            dup = (
                spark.read.parquet(tmp)
                .groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
            ).collect()
            if dup:
                shutil.rmtree(tmp, ignore_errors=True)
                raise ValueError(f"Duplicate entry for key {dup[0]}")
            df = spark.read.parquet(tmp)
        res = self._publish_bucketed(df, table, path, keys)
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)
        return res

    def _publish_bucketed(
        self, df: DataFrame, table: str, path: str, keys: list[str]
    ) -> SinkResult:
        """Bucketed write of already-validated data + catalog
        registration. The input must NOT be a live read of ``path``
        (saveAsTable overwrites it)."""
        spark = df.sparkSession
        db, tbl = self._catalog_ident(table)
        pdf, pcols = self._partitioned(df, table)
        # align task partitioning with the bucket hash (same Murmur3
        # expression): each task then holds exactly one bucket, so
        # the write emits n_buckets files instead of tasks x buckets
        pdf = pdf.repartition(
            self.bucket_buckets, *[F.col(k) for k in keys]
        )
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
        spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{tbl}`")
        shutil.rmtree(path, ignore_errors=True)
        w = pdf.write.mode("overwrite").option("path", path)
        if pcols:
            w = w.partitionBy(*pcols)
        (
            w.bucketBy(self.bucket_buckets, keys[0], *keys[1:])
            .sortBy(*keys)
            .saveAsTable(f"{db}.{tbl}")
        )
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
        )
        return SinkResult(table=table, rows=-1, bytes_written=size)

    @staticmethod
    def _recover_merge(path: str) -> None:
        """Finish a merge publish interrupted mid-swap. The publish
        sequence is path->path.old, path.merged->path, rm path.old;
        a crash in either window leaves a state this repairs:

        - `path` missing + `.merged` present: the fully-merged output
          survived but was never promoted — promote it now, so the
          previously delivered rows it carries are not lost.
        - `path` present + `.old` present: promotion succeeded, only
          the cleanup was lost — drop the stale `.old` copy.
        """
        out, old = path + ".merged", path + ".old"
        if not os.path.isdir(path) and os.path.isdir(out):
            os.replace(out, path)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    @staticmethod
    def _has_data(path: str) -> bool:
        return os.path.isdir(path) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(path)
            for f in fs
        )

    def _write_incremental(
        self, df: DataFrame, table: str, path: str, keys: list[str] | None
    ) -> SinkResult:
        """Cross-run merge with the already-delivered table — the
        tidb-backend live-table semantics (tidb.go:54-62; golden:
        tests/tidb_duplicate_data/run.sh) for bulk files:

        - replace: arriving rows win on key overlap
        - ignore: delivered rows win on key overlap
        - error: any overlap (or in-batch dup) raises Duplicate entry
          BEFORE the target is touched
        - no PK: append; `_tidb_rowid` continues from the delivered
          max (the AllocBase continuation, C4)

        The merge rewrites the table through a staging dir and
        publishes with an atomic rename — a crash mid-merge leaves
        the previous table intact.

        Partition pruning: when the table is hash-partitioned
        (`partition_spec`) on a PK column, ONLY the partitions that
        receive arriving keys are read, merged, and swapped — an
        increment touching k of n partitions costs O(k/n) of the
        table instead of O(table). Safe because MySQL requires every
        unique key to include the partition column, so a key's rows
        can only ever live in its own hash partition. The
        per-partition swap is not one atomic rename; a crash
        mid-publish leaves the table mixed and the invalid
        checkpoint routes the rerun through ctl, like any failed
        import."""
        # conservative: merged layouts re-infer schema on read_back
        self._delivered_schema.pop(table, None)
        spark = df.sparkSession
        spec = self.partition_spec.get(table)
        pvals: list[int] | None = None
        if (
            spec is not None
            and keys
            and spec[0] in keys
            and self.bucket_buckets <= 0
            and os.path.isdir(path)
            and any(e.startswith("_p=") for e in os.listdir(path))
        ):
            col, n = spec
            pvals = sorted(
                int(r["_pv"])
                for r in df.select(
                    F.pmod(F.col(col).cast("long"), F.lit(n)).alias("_pv")
                )
                .distinct()
                .collect()
            )  # driver-sized: at most n partition ids
            existing = (
                spark.read.parquet(path)  # partition-aware read
                .filter(F.col("_p").isin(pvals))
                .drop("_p")
            )
        else:
            existing = spark.read.option(
                "recursiveFileLookup", "true"
            ).parquet(path)
            if "_p" in existing.columns:
                existing = existing.drop("_p")  # re-derived at write
        stage = path + ".staging"
        shutil.rmtree(stage, ignore_errors=True)
        if keys:
            if self.on_duplicate == "error":
                df.write.mode("overwrite").parquet(stage)
                batch = spark.read.parquet(stage)
                dup = (
                    batch.groupBy(*keys)
                    .count()
                    .filter(F.col("count") > 1)
                    .limit(1)
                ).collect()
                if not dup:
                    dup = (
                        batch.select(*keys)
                        .join(existing.select(*keys), on=keys)
                        .limit(1)
                    ).collect()
                if dup:
                    shutil.rmtree(stage, ignore_errors=True)
                    raise ValueError(f"Duplicate entry for key {dup[0]}")
                merged = existing.unionByName(batch)
            else:
                u = existing.withColumn("_gen", F.lit(0)).unionByName(
                    df.withColumn("_gen", F.lit(1))
                )
                direction = (
                    F.col("_gen").desc()
                    if self.on_duplicate == "replace"
                    else F.col("_gen").asc()
                )
                w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
                    direction
                )
                merged = (
                    u.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "_gen")
                )
        else:
            from ..operators.permutation import ROWID_COL

            merged_new = df
            if ROWID_COL in existing.columns and ROWID_COL in df.columns:
                base = (
                    existing.agg(F.max(F.col(ROWID_COL)).alias("m")).first()[
                        "m"
                    ]
                    or 0
                )
                merged_new = df.withColumn(
                    ROWID_COL, F.col(ROWID_COL) + F.lit(int(base))
                )
            merged = existing.unionByName(merged_new)
        out = path + ".merged"
        shutil.rmtree(out, ignore_errors=True)
        merged = self._sorted(merged, table)
        pdf, pcols = self._partitioned(merged, table)
        pdf.write.mode("overwrite").partitionBy(*pcols).parquet(out)
        shutil.rmtree(stage, ignore_errors=True)
        if self.bucket_buckets > 0 and keys:
            res = self._publish_bucketed(
                spark.read.parquet(out), table, path, keys
            )
            shutil.rmtree(out, ignore_errors=True)
            return res
        if pvals is not None:
            # swap only the hash partitions the increment touched;
            # every other partition dir is left byte-identical. The
            # sidecar no longer describes the merged table — drop it
            # now (the pipeline re-stores it after verification)
            self._invalidate_sidecar(path)
            for v in pvals:
                sub = f"_p={v}"
                src = os.path.join(out, sub)
                dst = os.path.join(path, sub)
                shutil.rmtree(dst, ignore_errors=True)
                if os.path.isdir(src):
                    os.replace(src, dst)
            shutil.rmtree(out, ignore_errors=True)
        else:
            # Swap that never leaves `path` absent (a crash between a
            # rmtree(path) and the rename would make the NEXT run see
            # _has_data()==False, write the new batch alone, and —
            # because the checksum sidecar died with the dir — pass C3
            # verification while silently dropping every previously
            # delivered row). Order: path -> .old, .merged -> path,
            # rmtree(.old). Each window is recoverable: `.merged`
            # leftover with `path` missing is re-published by
            # _recover_merge() at the next write; a leftover `.old` is
            # garbage-collected there too.
            old = path + ".old"
            shutil.rmtree(old, ignore_errors=True)
            os.replace(path, old)
            os.replace(out, path)
            shutil.rmtree(old, ignore_errors=True)
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
        )
        return SinkResult(table=table, rows=-1, bytes_written=size)

    def write_engine(
        self, df: DataFrame, table: str, engine_id: int
    ) -> SinkResult:
        """One engine batch -> one overwritten subdirectory.

        ``engine_<id>`` is overwritten atomically per delivery (Spark
        job commit), so re-running an engine after a crash between
        delivery and checkpoint mark is idempotent — the K2 engine
        lifecycle (OpenEngine->ImportEngine, backend.go:80-118) mapped
        onto directory-grain replace. Keyed dedup modes are handled by
        the caller across engines."""
        path = os.path.join(self._path(table), f"engine_{int(engine_id)}")
        self._invalidate_sidecar(self._path(table))
        if "_row_id" in df.columns:
            df = df.drop("_row_id")
        df = self._sorted(df, table)
        df, pcols = self._partitioned(df, table)
        df.write.mode("overwrite").partitionBy(*pcols).parquet(path)
        self._record_schema(table, df, pcols)
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
        )
        return SinkResult(table=table, rows=-1, bytes_written=size)

    def write_index(
        self, df: DataFrame, table: str, index_name: str, sort_cols: list[str]
    ) -> None:
        """T8 index engine: deliver one secondary index as a range-
        partitioned, sorted-within-partition projection — the analog
        of the reference's sorted index-KV engine (sql2kv.go:218-239;
        index engines are separate from the data engine,
        backend.go:80-118). `_indexes/` is underscore-prefixed, so
        data read_back / analyze never see these files."""
        path = os.path.join(self._path(table), "_indexes", index_name)
        (
            df.repartitionByRange(*sort_cols)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .parquet(path)
        )

    def read_index(
        self, spark: SparkSession, table: str, index_name: str
    ) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self._path(table), "_indexes", index_name)
        )

    def _record_schema(self, table: str, df: DataFrame, pcols) -> None:
        """Remember the delivered schema of a plain write so
        read_back can skip parquet footer inference (one driver-side
        job per spark.read.parquet); a partitioned layout drops the
        record — its columns come from directory discovery."""
        if pcols:
            self._delivered_schema.pop(table, None)
        else:
            self._delivered_schema[table] = df.schema

    def read_back(self, spark: SparkSession, table: str) -> DataFrame:
        # recursive: the engine-grain path writes engine_<n>/
        # subdirectories; single-shot writes files at the root —
        # recursiveFileLookup reads both layouts
        reader = spark.read.option("recursiveFileLookup", "true")
        st = self._delivered_schema.get(table)
        if st is not None:
            reader = reader.schema(st)
        return reader.parquet(self._path(table))

    # target output file size for finalize-compaction (O9's
    # full-compact analog; Delta OPTIMIZE equivalent)
    target_file_bytes: int = 128 << 20

    def finalize(self, spark: SparkSession, table: str) -> None:
        """Compact small output files (restore.go:1056-1070 runs a
        full TiKV compaction post-import; the bulk-file analog is
        rewriting tiny parquet files into ~target-size ones).

        Index engines under `_indexes/` are excluded from the size
        heuristic (they are not data files) and carried over to the
        compacted layout — a compaction must never drop delivered
        indexes."""
        if self.bucket_buckets > 0 and self.key_columns.get(table):
            # bucketed layouts encode the bucket id in file names and
            # the catalog — a coalesce rewrite would destroy both
            return
        path = self._path(table)
        idx_dir = os.path.join(path, "_indexes")
        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
            and not os.path.join(dp, f).startswith(idx_dir + os.sep)
        ]
        if len(files) <= 1:
            return
        total = sum(os.path.getsize(f) for f in files)
        want = max(int(total / self.target_file_bytes), 1)
        if want < len(files) / 2:  # only rewrite when clearly fragmented
            df = spark.read.option("recursiveFileLookup", "true").parquet(path)
            tmp = path + ".compact"
            df.coalesce(want).write.mode("overwrite").parquet(tmp)
            if os.path.isdir(idx_dir):
                shutil.move(idx_dir, os.path.join(tmp, "_indexes"))
            sidecar = os.path.join(path, "_checksum.json")
            if os.path.exists(sidecar):
                # compaction does not change content: the delivered
                # checksum stays valid
                shutil.move(sidecar, os.path.join(tmp, "_checksum.json"))
            shutil.rmtree(path)
            os.replace(tmp, path)

    def analyze(
        self, spark: SparkSession, table: str, noscan: bool = False
    ) -> bool:
        """C5: register the restored parquet as an external catalog
        table and run ANALYZE TABLE ... COMPUTE STATISTICS — the
        Spark-native twin of the post-import ANALYZE the reference
        executes against TiDB (restore.go:1038-1050). The catalog
        entry persists: downstream queries on the registered name get
        CBO row/size statistics.

        ``noscan=True`` runs ``ANALYZE ... NOSCAN`` instead: catalog
        sizeInBytes from the file listing, zero jobs. The pipeline
        passes it when the run already verified an exact delivered
        row count (observe/read-back), so re-counting would be a
        redundant extra pass over the whole table."""
        path = self._path(table)
        if not os.path.isdir(path):
            return False
        stmt_tail = "COMPUTE STATISTICS NOSCAN" if noscan else (
            "COMPUTE STATISTICS"
        )
        db, tbl = self._catalog_ident(table)
        if self.bucket_buckets > 0 and self.key_columns.get(table):
            # _write_bucketed already registered the table WITH its
            # bucket spec — re-creating it here would drop that
            # metadata and downstream joins would shuffle again
            if spark.catalog.tableExists(f"{db}.{tbl}"):
                spark.sql(
                    f"ANALYZE TABLE `{db}`.`{tbl}` {stmt_tail}"
                )
                return True
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
        spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{tbl}`")
        # re-register with the DELIVERED schema (authoritative over
        # the DDL prediction init_schema used) + recursive lookup:
        # the engine-grain layout nests files under engine_<n>/
        schema = self.read_back(spark, table).schema
        spark.catalog.createTable(
            f"{db}.{tbl}",
            path=path,
            source="parquet",
            schema=schema,
            recursiveFileLookup="true",
        )
        spark.sql(f"ANALYZE TABLE `{db}`.`{tbl}` {stmt_tail}")
        return True

    def cleanup(self, table: str) -> None:
        shutil.rmtree(self._path(table), ignore_errors=True)
