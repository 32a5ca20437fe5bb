"""The restore controller: the reference's fixed 6-step "plan"
(RestoreController.Run, lightning/restore/restore.go:252-287)
re-expressed as per-table Spark jobs.

    [1] preflight checks        (restore.go:1117-1134)
    [2] restore schema          (restore.go:289-333)
    [3] restore tables          (restore.go:563-685)
    [4] full compact            (restore.go:1056-1070)  -> sink finalize
    [5] switch to normal mode   (restore.go:1088-1091)  -> n/a
    [6] clean checkpoints       (restore.go:1217-1236)

Per table, the reference fans out engines/chunks/encode/deliver
goroutines (restore.go:736-852,1557-1803); all of that collapses
into one Spark stage pipeline per table:
``read (S3/S4) -> permutation/cast/rowid (F3,F4,T3-T5) -> sink
write (K3) -> checksum verify (C1-C3)``. Tables are submitted
smallest-first (O3, loader.go:213-220); failures collect into the
per-table error summary (O12, restore.go:89-129).
"""

from __future__ import annotations

import datetime as _dt
import logging
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Config, strict_sql_mode
from ..functions.checksum import Checksum
from ..operators.permutation import apply_permutation
from ..sinks.base import Sink
from ..sinks.memory_sink import MemorySink
from ..sinks.parquet_sink import ParquetSink
from ..sources.csv_source import read_csv
from ..sources.mydump_loader import MDTableMeta, discover_cfg
from ..sources.schema_reader import TableSchema, load_table_schema
from ..sources.sql_dump_source import (
    probe_insert_columns,
    project_fields,
    read_sql_dump,
)
from .checkpoints import CheckpointStore, Status

log = logging.getLogger("tidb_lightning_spark")


@dataclass
class TableResult:
    table: str
    status: str  # "restored" | "failed" | "skipped"
    rows: int = 0
    checksum: Checksum | None = None
    alloc_base: int = 0
    error: str | None = None
    seconds: float = 0.0
    source_bytes: int = 0


@dataclass
class RunSummary:
    """O12 error summary (restore.go:89-129)."""

    tables: dict[str, TableResult] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(t.status != "failed" for t in self.tables.values())

    def report(self) -> str:
        lines = []
        for name, r in sorted(self.tables.items()):
            if r.status == "failed":
                lines.append(f"[-] [table: {name}] error: {r.error}")
            else:
                mibs = (
                    r.source_bytes / r.seconds / (1 << 20) if r.seconds else 0
                )
                lines.append(
                    f"[+] [table: {name}] rows={r.rows} "
                    f"alloc_base={r.alloc_base} speed={mibs:.1f} MiB/s"
                )
        return "\n".join(lines)


class RestoreController:
    def __init__(
        self,
        spark: SparkSession,
        cfg: Config,
        sink: Sink | None = None,
        checkpoints: CheckpointStore | None = None,
    ):
        self.spark = spark
        self.cfg = cfg.adjust()
        self.sink = sink or self._default_sink()
        self.cp = checkpoints or CheckpointStore(
            cfg.checkpoint_path or None, enabled=cfg.checkpoint_enable
        )
        self.job_timestamp = _dt.datetime.utcnow().replace(microsecond=0)

    def _default_sink(self) -> Sink:
        if self.cfg.backend == "parquet":
            return ParquetSink(self.cfg.target_dir, self.cfg.on_duplicate)
        if self.cfg.backend == "jdbc":
            from ..sinks.jdbc_sink import JDBCSink

            t = self.cfg.tidb
            return JDBCSink(
                url=f"jdbc:mysql://{t.host}:{t.port}",
                user=t.user,
                password=t.password,
                on_duplicate=self.cfg.on_duplicate,
            )
        if self.cfg.backend == "memory":
            return MemorySink(self.cfg.on_duplicate)
        raise ValueError(f"unknown backend: {self.cfg.backend!r}")

    # -- [2] schema restore ------------------------------------------------
    def load_schemas(self) -> dict[str, tuple[MDTableMeta, TableSchema]]:
        out = {}
        for db in discover_cfg(self.cfg):
            for tbl in db.tables.values():
                name = f"{db.name}.{tbl.name}"
                if self.cfg.mydumper.no_schema:
                    # no-schema mode: the target table already exists;
                    # take its schema from the sink (config.go:143,
                    # tests/no_schema/run.sh)
                    schema = self._schema_from_sink(name)
                    if schema is None:
                        log.warning("no target table for %s (no-schema)", name)
                        continue
                elif tbl.schema_file is None:
                    log.warning("missing schema file for %s", name)
                    continue
                else:
                    schema = load_table_schema(
                        tbl.schema_file, self.cfg.mydumper.character_set
                    )
                out[name] = (tbl, schema)
        return out

    def _schema_from_sink(self, name: str) -> TableSchema | None:
        """Build a TableSchema from an existing sink table's Spark
        schema (the LoadSchemaInfo-from-target analog,
        lightning/restore/tidb.go:154-208)."""
        from ..sources.schema_reader import ColumnSpec
        from pyspark.sql import types as T

        try:
            df = self.sink.read_back(self.spark, name)
        except Exception:
            return None
        spark_to_mysql = {
            T.ByteType: "tinyint", T.ShortType: "smallint",
            T.IntegerType: "int", T.LongType: "bigint",
            T.FloatType: "float", T.DoubleType: "double",
            T.StringType: "varchar", T.BinaryType: "blob",
            T.TimestampType: "datetime", T.DateType: "date",
            T.BooleanType: "tinyint",
        }
        cols = []
        for f in df.schema.fields:
            if f.name.startswith("_"):
                continue
            mysql_t = (
                "decimal"
                if isinstance(f.dataType, T.DecimalType)
                else spark_to_mysql.get(type(f.dataType), "varchar")
            )
            cols.append(
                ColumnSpec(
                    name=f.name,
                    mysql_type=mysql_t,
                    spark_type=f.dataType,
                    nullable=f.nullable,
                )
            )
        return TableSchema(name=name.split(".")[-1], columns=cols)

    # -- [3] per-table restore --------------------------------------------
    def read_table(self, meta: MDTableMeta, schema: TableSchema) -> DataFrame:
        """Source read + permutation/cast/rowid; one Spark plan."""
        csv_files = [f for f in meta.data_files if f.path.lower().endswith(".csv")]
        sql_files = [f for f in meta.data_files if f.path.lower().endswith(".sql")]
        strict = strict_sql_mode(self.cfg.tidb.sql_mode)
        frames: list[DataFrame] = []

        if csv_files and self.cfg.mydumper.csv.strict_parser:
            from ..sources.csv_strict import read_csv_strict

            csv_cfg = self.cfg.mydumper.csv
            ncols = len(schema.columns)
            raw, header_cols = read_csv_strict(
                self.spark,
                [(f.path, f.size) for f in csv_files],
                csv_cfg,
                ncols,
            )
            file_columns = header_cols or [c.name for c in schema.columns]
            df = project_fields(raw, len(file_columns))
            df = df.toDF(*(["_row_id"] + file_columns))
            frames.append(
                apply_permutation(
                    df,
                    schema,
                    file_columns,
                    rowid=df["_row_id"],
                    job_timestamp=self.job_timestamp,
                    strict=strict,
                    keep=["_row_id"],
                    source_latin1=True,
                    charset=self.cfg.mydumper.character_set,
                )
            )
        elif csv_files:
            csv_cfg = self.cfg.mydumper.csv
            ncols = len(schema.columns)
            from ..operators.rowid import assign_rowid_by_file, file_row_bases

            bases = file_row_bases(
                [(f.path, f.size) for f in csv_files], ncols, is_sql=False
            )
            # strict sql_mode disables the fast path: the JVM parser
            # silently accepts tokens strict MySQL must reject — ''
            # in a numeric/date column reads as NULL (univocity nulls
            # empty tokens before type parse, indistinguishable from
            # \N afterwards), and NaN/Infinity/hex-float/'5d' parse
            # as Java double values. The string path routes every
            # token through mysql_cast(strict=True), which raises.
            native_ok = (
                csv_cfg.native_typed
                and not strict
                and not csv_cfg.header
                and not csv_cfg.not_null
                and csv_cfg.null != ""
            )
            if native_ok:
                # typed fast path: vectorized JVM parse for clean
                # rows; corrupt-record fallback through mysql_cast
                from ..sources.csv_source import read_csv_native

                nf = read_csv_native(
                    self.spark,
                    [f.path for f in csv_files],
                    csv_cfg,
                    schema.columns,
                )
                # multiLine CSV reads are whole-file, and the
                # session's openCostInBytes disables file packing ->
                # one file per task, so row-ids need no extra job
                df = assign_rowid_by_file(
                    nf.df, bases, one_file_per_partition=True
                )
                frames.append(
                    apply_permutation(
                        df,
                        schema,
                        [c.name for c in schema.columns],
                        rowid=df["_row_id"],
                        job_timestamp=self.job_timestamp,
                        strict=strict,
                        keep=["_row_id"],
                        source_latin1=True,
                        charset=self.cfg.mydumper.character_set,
                        native_frame=nf,
                    )
                )
            else:
                file_cols = (
                    None  # header row names columns; read by reader
                    if csv_cfg.header
                    else [c.name for c in schema.columns]
                )
                df = read_csv(
                    self.spark,
                    [f.path for f in csv_files],
                    csv_cfg,
                    column_names=file_cols,
                    num_columns=None if file_cols else ncols,
                )
                df = assign_rowid_by_file(
                    df, bases, one_file_per_partition=True
                )
                file_columns = (
                    [c for c in df.columns if c != "_row_id"]
                    if csv_cfg.header
                    else file_cols
                )
                frames.append(
                    apply_permutation(
                        df,
                        schema,
                        [c for c in file_columns if c != "_row_id"],
                        rowid=df["_row_id"],
                        job_timestamp=self.job_timestamp,
                        strict=strict,
                        keep=["_row_id"],
                        source_latin1=True,
                        charset=self.cfg.mydumper.character_set,
                    )
                )
        if sql_files:
            # column list from the first INSERT's header, read
            # driver-side (64 KiB peek — no Spark job); else table
            # order (the common mydumper case)
            file_columns = probe_insert_columns(
                sql_files[0].path, self.cfg.mydumper.character_set
            ) or [c.name for c in schema.columns]
            df = read_sql_dump(
                self.spark,
                [(f.path, f.size) for f in sql_files],
                self.cfg.mydumper.character_set,
                num_columns=len(file_columns),
                columnar=True,
            )
            df = df.toDF(*(["_row_id"] + file_columns))
            frames.append(
                apply_permutation(
                    df,
                    schema,
                    file_columns,
                    rowid=df["_row_id"],
                    job_timestamp=self.job_timestamp,
                    strict=strict,
                    keep=["_row_id"],
                )
            )
        if not frames:
            raise ValueError(f"no data files for {meta.db}.{meta.name}")
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        return df

    def restore_table(
        self, name: str, meta: MDTableMeta, schema: TableSchema
    ) -> TableResult:
        """One table's restore as (ideally) two data passes:

        pass 1 — read -> transform -> WRITE, with the C1 checksum
        triple + row count computed *during* the write via
        ``df.observe`` (the Spark analog of the reference computing
        checksums inside the deliver loop, restore.go:1557-1638:
        no separate source scan);

        pass 2 — sink read-back computing (checksum, max-rowid) in a
        single aggregate: C2 remote checksum + C4 AllocBase together
        (restore.go:998-1053 runs these as separate post-process
        steps against TiDB; one scan serves both here).
        """
        from pyspark.sql import Observation

        t0 = time.monotonic()
        try:
            if self.cp.table_status(name) >= Status.CHECKSUMMED:
                return TableResult(table=name, status="skipped")
            df = self.read_table(meta, schema)
            self.cp.set_table_status(name, Status.LOADED)

            cols = [c.name for c in schema.columns]
            keys = schema.primary_key
            if isinstance(self.sink, ParquetSink) and keys:
                self.sink.key_columns[name] = keys

            local = None
            obs = None
            dedup_may_drop = bool(keys) and self.cfg.on_duplicate in (
                "replace",
                "ignore",
            )
            if self.cfg.checksum:
                # row hash projected ONCE into _h (+_len for the
                # canonical modes); the observe aggregates only touch
                # those columns, so hashing runs once per row inside
                # the write job
                df = self._with_row_hash(df, cols)
                obs = Observation(f"checksum:{name}")
                metrics = [
                    F.bit_xor(F.col("_h")).alias("crc_xor"),
                    (
                        F.sum("_len").cast("long")
                        if "_len" in df.columns
                        else F.lit(-1).cast("long")
                    ).alias("total_bytes"),
                    F.count(F.lit(1)).alias("total_kvs"),
                ]
                df = df.observe(obs, *metrics).drop(
                    *[c for c in ("_h", "_len") if c in df.columns]
                )

            res = self.sink.write(df, name)
            self.cp.set_table_status(name, Status.IMPORTED)

            if obs is not None:
                m = obs.get
                local = Checksum(
                    m["crc_xor"], m["total_bytes"], m["total_kvs"]
                )
            rows = res.rows if res.rows >= 0 else (local.total_kvs if local else -1)

            # pass 2: one read-back scan -> remote checksum + alloc base
            back = self.sink.read_back(self.spark, name)
            id_col = self._alloc_id_column(back, schema)
            aggs = []
            proj = back
            if self.cfg.checksum and local is not None and not dedup_may_drop:
                from ..functions.checksum import canonical_row
                from ..functions.hashing import hash60

                proj = self._with_row_hash(back, cols)
                aggs += [
                    F.bit_xor(F.col("_h")).alias("crc_xor"),
                    (
                        F.sum("_len").cast("long")
                        if "_len" in proj.columns
                        else F.lit(-1).cast("long")
                    ).alias("total_bytes"),
                    F.count(F.lit(1)).alias("total_kvs"),
                ]
            if id_col:
                aggs.append(F.max(F.col(id_col).cast("long")).alias("max_id"))
            if dedup_may_drop:
                # observation counted pre-dedup rows; report the
                # sink's actual row count instead
                aggs.append(F.count(F.lit(1)).alias("sink_rows"))
            base = 1
            if aggs:
                row = proj.agg(*aggs).collect()[0]
                if "sink_rows" in row.__fields__:
                    rows = row["sink_rows"]
                if "crc_xor" in row.__fields__:
                    remote = Checksum(
                        row["crc_xor"], row["total_bytes"], row["total_kvs"]
                    )
                    if remote != local:
                        raise ValueError(
                            f"checksum mismatched remote vs local => "
                            f"(checksum: {remote.crc_xor} vs {local.crc_xor}) "
                            f"(total_kvs: {remote.total_kvs} vs {local.total_kvs}) "
                            f"(total_bytes: {remote.total_bytes} vs "
                            f"{local.total_bytes})"
                        )
                if id_col:
                    base = (row["max_id"] or 0) + 1
                if rows < 0 and "total_kvs" in row.__fields__:
                    rows = row["total_kvs"]
            if self.cfg.checksum:
                self.cp.set_table_status(name, Status.CHECKSUMMED)
            if self.cfg.compact:
                # post-restore full compaction is opt-in, like the
                # reference (config.go:122-123 default false)
                self.sink.finalize(self.spark, name)
            self.cp.set_table_status(name, Status.ANALYZED)
            return TableResult(
                table=name,
                status="restored",
                rows=rows,
                checksum=local,
                alloc_base=base,
                seconds=time.monotonic() - t0,
                source_bytes=meta.total_size,
            )
        except Exception as e:  # O12: collect, don't abort the run
            log.exception("restore failed for %s", name)
            return TableResult(
                table=name,
                status="failed",
                error=str(e),
                seconds=time.monotonic() - t0,
            )

    def _with_row_hash(self, df: DataFrame, cols: list[str]) -> DataFrame:
        """Project the per-row checksum hash `_h` (+ `_len` for the
        canonical-serialization modes) — C1's map side.

        Modes (cfg.checksum_algo):
        - ``xxdirect`` (default, the 100 TB path): xxhash64 straight
          over the typed columns — no string canonicalization at all;
          byte accounting not tracked (total_bytes = -1). Valid
          because both sides of the compare (observe vs read-back)
          use the identical function.
        - ``xxhash64`` / ``hash60`` / ``crc64``: canonical-string
          serialization then hash; hash60 is ANSI-oracle-portable,
          crc64 is bit-compatible with the reference
          (verification/checksum.go:37).
        """
        algo = getattr(self.cfg, "checksum_algo", "xxdirect")
        if algo == "xxdirect":
            return df.withColumn(
                "_h", F.xxhash64(*[F.col(c) for c in cols])
            )
        from ..functions.checksum import canonical_row

        if algo == "hash60":
            from ..functions.hashing import hash60 as fn
        elif algo == "crc64":
            from ..functions.hashing import crc64 as fn
        else:
            fn = F.xxhash64
        canon = canonical_row(df, cols)
        return df.withColumn("_h", fn(canon)).withColumn(
            "_len", F.length(canon)
        )

    @staticmethod
    def _alloc_id_column(df: DataFrame, schema: TableSchema) -> str | None:
        """Column feeding AllocBase (C4): auto-inc, _tidb_rowid, or
        the single-int PK (allocator.go:40-52 semantics)."""
        from ..operators.permutation import ROWID_COL

        for c in (schema.auto_increment_column, ROWID_COL):
            if c and c in df.columns:
                return c
        pk = schema.primary_key
        if pk and schema.has_int_pk and pk[0] in df.columns:
            return pk[0]
        return None

    def run(self) -> RunSummary:
        """[3] restoreTables: small-first submission (O3), up to
        ``table_concurrency`` tables in flight (O1: the reference's
        table worker pool, config.go:373-386 — here Spark's scheduler
        multiplexes the concurrent jobs across executor cores)."""
        import concurrent.futures as cf

        summary = RunSummary()
        schemas = self.load_schemas()
        ordered = sorted(
            schemas.items(), key=lambda kv: kv[1][0].total_size
        )
        conc = max(int(getattr(self.cfg, "table_concurrency", 1)), 1)
        if conc == 1 or len(ordered) <= 1:
            for name, (meta, schema) in ordered:
                summary.tables[name] = self.restore_table(name, meta, schema)
        else:
            with cf.ThreadPoolExecutor(max_workers=conc) as pool:
                futs = {
                    pool.submit(self.restore_table, name, meta, schema): name
                    for name, (meta, schema) in ordered
                }
                for fut in cf.as_completed(futs):
                    summary.tables[futs[fut]] = fut.result()
        if summary.ok:
            self.cp.clean()  # [6]
        return summary
