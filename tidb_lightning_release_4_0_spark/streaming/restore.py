"""Continuous restore: the batch ingest pipeline as a Structured
Streaming job.

The reference is batch-only; its nearest concept is server mode —
an HTTP task queue feeding identical batch pipelines
(lightning/lightning.go:149-167, lightning/config/configlist.go).
Spark-first, the task queue IS the file source: new dump files
landing in the source directory become micro-batches, and each
micro-batch runs the exact same permutation/cast ladder as the batch
path (operators/permutation.py::apply_permutation), so semantics are
identical by construction.

Design (and why it survives a real cluster):

- **File-source stream** with ``maxFilesPerTrigger``: Spark's file
  source checkpoint tracks which dump files are consumed — the
  streaming analog of the chunk checkpoint (checkpoints.go:92-130).
- **Row-id allocation across micro-batches** mirrors the reference's
  AllocBase chaining (restore.go:1005-1014): a JSON ledger in the
  stream checkpoint dir reserves ``[base, base+n)`` per batch_id
  BEFORE the batch writes. Replayed batches (crash between reserve
  and commit) find their reservation and reuse it — ids never skip
  or collide.
- **Idempotent sink**: each micro-batch overwrites its own
  ``batch=<id>`` subdirectory, so at-least-once foreachBatch replay
  yields exactly-once table contents (the same replace-on-republish
  trick the batch parquet sink's finalize uses).
- **Incremental checksum**: the C1 XOR/sum monoid (checksum.go:77-86)
  merges per-batch triples in the ledger — a crash-resumed stream
  continues the running checksum instead of rescanning the sink.

Per-batch dense row-ids are ordered by (source file, canonical row
hash): deterministic for distinct rows; identical duplicate rows may
permute ids among themselves across replays, which is
data-equivalent (same multiset, same checksum).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.checksum import Checksum, canonical_row, checksum_df
from ..operators.permutation import ROWID_COL, apply_permutation
from ..sources.schema_reader import TableSchema
from ..sources.sql_dump_source import MISSING_FIELD as _MISSING


class _Ledger:
    """Atomic JSON state: row-id reservations + running checksum."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict:
        try:
            with open(self.path, "r", encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return {"next": 1, "batches": {}, "crc": 0, "bytes": 0, "kvs": 0}

    def save(self, state: dict) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.path), suffix=".ledger"
        )
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)


class StreamingRestore:
    """Continuous restore of one table from a growing dump directory
    of headerless CSV parts."""

    def __init__(
        self,
        spark: SparkSession,
        schema: TableSchema,
        source_dir: str,
        sink_dir: str,
        checkpoint_dir: str,
        strict: bool = False,
        charset: str = "utf8mb4",
        sep: str = ",",
        quote: str = '"',
        max_files_per_trigger: int = 8,
        source_format: str = "csv",
    ):
        if source_format not in ("csv", "jsonl"):
            raise ValueError(f"unknown source_format {source_format!r}")
        #: "csv" (positional mydumper parts, the batch-S4 dialect) or
        #: "jsonl" (named fields — the training-data handoff format;
        #: values stream in as strings and run the SAME MySQL cast
        #: ladder, so a JSONL corpus gets identical typing semantics)
        self.source_format = source_format
        self.spark = spark
        self.schema = schema
        self.source_dir = source_dir
        self.sink_dir = sink_dir
        self.checkpoint_dir = checkpoint_dir
        self.strict = strict
        self.charset = charset
        self.sep = sep
        self.quote = quote
        self.max_files = max_files_per_trigger
        self.ledger = _Ledger(os.path.join(checkpoint_dir, "rowid_ledger.json"))

    # -- source ---------------------------------------------------------

    def _raw_stream(self) -> DataFrame:
        if self.source_format == "jsonl":
            # Lines stream in RAW via the text source and each
            # micro-batch parses them itself (_transform): key casing
            # is matched case-insensitively PER LINE, so an empty
            # source dir at stream start, later files with different
            # key casing, and .jsonl.gz parts all parse correctly —
            # a stream-start schema probe would freeze whatever casing
            # the first file happened to use (or the DDL casing when
            # the dir starts empty, the normal continuous-restore
            # case) and silently read every other casing as NULL.
            return (
                self.spark.readStream.option(
                    "maxFilesPerTrigger", str(self.max_files)
                )
                .option("pathGlobFilter", "*.jsonl*")
                .text(self.source_dir)
            )
        ncols = len(self.schema.columns)
        st = T.StructType(
            [T.StructField(f"_c{i}", T.StringType()) for i in range(ncols)]
        )
        return (
            self.spark.readStream.schema(st)
            .option("maxFilesPerTrigger", str(self.max_files))
            .option("sep", self.sep)
            .option("quote", self.quote)
            .option("encoding", "ISO-8859-1")  # byte-faithful, as batch S4
            .option("mode", "PERMISSIVE")
            .csv(self.source_dir)
        )

    # -- per-batch transform -------------------------------------------

    def _transform(self, batch_df: DataFrame, base: int) -> DataFrame:
        """The batch-path ladder on one micro-batch: dense row-ids
        from the reserved base, then permutation + MySQL cast.

        Row-ids parallelize per file: an O(#files) count pass fixes
        each file's base offset, then row_number windows PER FILE —
        a global unpartitioned window would funnel the whole batch
        through one task (the count is a second scan of the batch,
        bounded by maxFilesPerTrigger)."""
        cols = [c.name for c in self.schema.columns]
        if self.source_format == "jsonl":
            # Raw lines from the text stream: parse each line to
            # map<string,string> under FAILFAST (a malformed line
            # STOPS the stream loudly instead of committing a
            # fabricated all-null row to the sink and the running
            # checksum ledger), lowercase the keys JVM-side, and look
            # each DDL column up case-insensitively — no stream-start
            # schema probe to go stale. Values parse through the same
            # Jackson string conversion the named-schema reader used,
            # and the cast ladder owns typing exactly like CSV.
            df = batch_df.withColumn("_file", F.input_file_name())
            df = df.filter(F.trim(F.col("value")) != "")
            m = F.from_json(
                F.col("value"),
                "map<string,string>",
                {"mode": "FAILFAST"},
            )
            m = F.map_from_arrays(
                F.transform(F.map_keys(m), F.lower),
                F.map_values(m),
            )
            df = df.select(m.alias("_m"), "_file").select(
                *[
                    F.col("_m")[c.name.lower()].alias(c.name)
                    for c in self.schema.columns
                ],
                F.col("_file"),
            )
            # a row where EVERY column is missing means the line's
            # keys match no DDL column at all — flag it so the batch
            # fails instead of committing default-filled fabrications
            allnull = F.lit(True)
            for c in cols:
                allnull = allnull & F.col(c).isNull()
            df = df.withColumn("_allnull", allnull.cast("int"))
            # same batch-path semantics (pipeline.py jsonl block):
            # JSON cannot distinguish an absent key from null, so a
            # null in a NOT NULL column maps to the missing sentinel
            # and takes the column DEFAULT; nullable columns keep
            # real NULLs
            df = df.select(
                *[
                    (
                        F.coalesce(
                            F.col(c.name), F.lit(_MISSING)
                        ).alias(c.name)
                        if not c.nullable
                        else F.col(c.name)
                    )
                    for c in self.schema.columns
                ],
                F.col("_file"),
                F.col("_allnull"),
            )
        else:
            df = batch_df.toDF(*cols).withColumn(
                "_file", F.input_file_name()
            ).withColumn("_allnull", F.lit(0))
        counts = (
            df.groupBy("_file")
            .agg(
                F.count(F.lit(1)).alias("count"),
                F.sum("_allnull").alias("_an"),
            )
            .orderBy("_file")
            .collect()
        )
        bad = [
            r["_file"]
            for r in counts
            if r["count"] > 0 and r["_an"] == r["count"]
        ]
        if bad:
            raise ValueError(
                f"JSONL batch: file(s) {bad} parsed entirely NULL "
                "across all columns — their keys match no target "
                "column; refusing to fabricate default-filled rows"
            )
        df = df.drop("_allnull")
        mapping: list = []
        acc = base
        for r in counts:
            mapping += [F.lit(r["_file"]), F.lit(acc)]
            acc += r["count"]
        fbase = (
            F.create_map(*mapping)[F.col("_file")]
            if mapping
            else F.lit(base)
        )
        rn = F.row_number().over(
            Window.partitionBy("_file").orderBy(
                F.md5(canonical_row(df, cols).cast("binary"))
            )
        )
        df = df.withColumn("_rowid", (fbase - 1 + rn).cast("long"))
        out = apply_permutation(
            df,
            self.schema,
            cols,
            rowid=F.col("_rowid"),
            strict=self.strict,
            # CSV streams read byte-faithful ISO-8859-1 (the batch-S4
            # trick) and re-decode in the cast layer; the JSON reader
            # decodes REAL UTF-8 — running its strings through the
            # latin1 re-decode crashes on any non-ASCII value
            # (MALFORMED_CHARACTER_CODING) and mangles chars > U+00FF
            source_latin1=(self.source_format == "csv"),
            charset=self.charset,
            missing_sentinel=(
                None if self.source_format == "csv" else _MISSING
            ),
        )
        return out

    # -- sink -----------------------------------------------------------

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        state = self.ledger.load()
        bid = str(batch_id)
        if bid in state["batches"]:
            # replayed batch: reuse its reservation, rewrite its dir
            base = state["batches"][bid]["base"]
        else:
            base = state["next"]
        out = self._transform(batch_df, base)
        # namespaced partition-dir name: a plain `batch=` would
        # collide with a real table column named `batch`
        path = os.path.join(self.sink_dir, f"tlr4s_batch={batch_id}")
        out.write.mode("overwrite").parquet(path)
        # count + checksum from the WRITTEN data (one scan, no
        # re-execution of the transform lineage)
        written = self.spark.read.parquet(path)
        row = checksum_df(written).collect()[0]
        n = row["total_kvs"]
        if bid not in state["batches"]:
            c = Checksum(
                row["crc_xor"] or 0, row["total_bytes"] or 0, n
            ).add(Checksum(state["crc"], state["bytes"], state["kvs"]))
            state["batches"][bid] = {"base": base, "rows": n}
            state["next"] = base + n
            state["crc"], state["bytes"], state["kvs"] = (
                c.crc_xor,
                c.total_bytes,
                c.total_kvs,
            )
            self.ledger.save(state)

    # -- driver ---------------------------------------------------------

    def start(self, available_now: bool = True):
        """Start the stream; availableNow drains the current directory
        contents then stops (the batch-equivalence mode)."""
        w = (
            self._raw_stream()
            .writeStream.foreachBatch(self._process_batch)
            .option(
                "checkpointLocation",
                os.path.join(self.checkpoint_dir, "stream"),
            )
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    def run_until_complete(self, timeout_s: int = 300) -> None:
        q = self.start(available_now=True)
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"streaming restore did not drain within {timeout_s}s"
            )

    def result(self) -> DataFrame:
        """The restored table (batch view over all committed batches)."""
        df = self.spark.read.parquet(self.sink_dir)
        return df.drop("tlr4s_batch")

    def checksum(self) -> Checksum:
        s = self.ledger.load()
        return Checksum(s["crc"], s["bytes"], s["kvs"])
