"""Round-3 reference golden parity: the remaining run.sh suites.

- tool_135: auto-increment variants (PK, plain KEY, composite with
  UNIQUE) — count/sum/min/max invariants and the rebased alloc base
  (run.sh checks an INSERT after import gets id > max).
- tool_1420: fully backquoted identifiers + INSERT with explicit
  column list and double-quoted strings.
- tool_1472: explicit auto-increment VALUES spread over multiple
  files with comment noise; alloc base continues past the explicit
  max (run.sh: INSERT () gets a=5 / b=10).
- checkpoint_timestamp: a crash-resumed task fills IDENTICAL
  CURRENT_TIMESTAMP defaults — the frozen task timestamp lives in
  the checkpoint (run.sh asserts COUNT(DISTINCT ts)=1 over 98 rows).

Fixtures are regenerated here (same value ranges the reference data
files use), not copied.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.config import (
    Config,
    MydumperConfig,
    TiDBConfig,
)
from tidb_lightning_release_4_0_spark.plans.checkpoints import (
    CheckpointStore,
)
from tidb_lightning_release_4_0_spark.plans.pipeline import RestoreController
from tidb_lightning_release_4_0_spark.sinks.parquet_sink import ParquetSink

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "r3g"
)


def _dump(subdir: str, files: dict[str, bytes]) -> str:
    d = os.path.join(TMP, subdir)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for name, content in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(content)
    return d


def _cfg(d: str, tgt: str, **kw) -> Config:
    return Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="parquet",
        target_dir=tgt,
        checkpoint_enable=False,
        tidb=TiDBConfig(sql_mode=""),
        **kw,
    )


def test_tool_135_autoinc_variants(spark):
    """Reference tests/tool_135: values 102..1101 into an
    auto-increment PK — count 1000, sum 601500, min 102, max 1101,
    and the next allocated id exceeds 1101."""
    stmts = []
    for p in range(10):
        vals = ",".join(f"({102 + p * 100 + k})" for k in range(100))
        stmts.append(f"insert into bar1 values {vals};")
    files = {
        "tool_135-schema-create.sql": b"create database if not exists tool_135;",
        "tool_135.bar1-schema.sql": (
            b"create table bar1(a int auto_increment primary key);"
        ),
        "tool_135.bar1.sql": "\n".join(stmts).encode(),
    }
    d = _dump("tool135", files)
    tgt = os.path.join(TMP, "tool135_sink")
    shutil.rmtree(tgt, ignore_errors=True)
    run = RestoreController(spark, _cfg(d, tgt)).run()
    assert run.ok, run.report()
    t = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(tgt, "tool_135.bar1")
    )
    row = t.agg(
        F.count("a").alias("n"),
        F.sum("a").alias("s"),
        F.min("a").alias("lo"),
        F.max("a").alias("hi"),
    ).collect()[0]
    assert (row["n"], row["s"], row["lo"], row["hi"]) == (
        1000,
        601500,
        102,
        1101,
    )
    # run.sh: INSERT after import allocates above the imported max
    assert run.tables["tool_135.bar1"].alloc_base == 1102


def test_tool_1420_quoted_identifiers(spark):
    """Reference tests/tool_1420: backquoted db/table/column names +
    INSERT with explicit column list and double-quoted string."""
    files = {
        "EE1420-schema-create.sql": b"CREATE DATABASE `EE1420`;",
        "EE1420.pt_role-schema.sql": (
            b"CREATE TABLE `pt_role` (\n  `ROLE_ID` varchar(50) NOT NULL\n);"
        ),
        "EE1420.pt_role.sql": (
            b'INSERT INTO `pt_role` (`ROLE_ID`) VALUES ("1");'
        ),
    }
    d = _dump("ee1420", files)
    tgt = os.path.join(TMP, "ee1420_sink")
    shutil.rmtree(tgt, ignore_errors=True)
    run = RestoreController(spark, _cfg(d, tgt)).run()
    assert run.ok, run.report()
    t = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(tgt, "EE1420.pt_role")
    )
    assert [r["ROLE_ID"] for r in t.collect()] == ["1"]


def test_tool_1472_autoinc_explicit_values(spark):
    """Reference tests/tool_1472: explicit auto-increment values over
    multiple files with comment noise; alloc base rebased past the
    max so the reference's follow-up INSERT () gets a=5 / b=10."""
    noise = b"-- include some comments to inflate the file size.\n" * 7
    files = {
        "EE1472-schema-create.sql": b"create database `EE1472`;",
        "EE1472.pk-schema.sql": (
            b"create table `pk` (\n    a tinyint primary key auto_increment\n);"
        ),
        "EE1472.pk.1.sql": b"insert into `pk` values (3);\n" + noise,
        "EE1472.pk.2.sql": b"insert into `pk` values (4);\n" + noise,
        "EE1472.notpk-schema.sql": (
            b"create table `notpk` (\n    a int primary key,\n"
            b"    b tinyint auto_increment,\n    key(b)\n);"
        ),
        "EE1472.notpk.1.sql": (
            b"insert into `notpk` values (1111, 6);\n" + noise
        ),
        "EE1472.notpk.2.sql": (
            b"insert into `notpk` values (2222, 9);\n" + noise
        ),
    }
    d = _dump("ee1472", files)
    tgt = os.path.join(TMP, "ee1472_sink")
    shutil.rmtree(tgt, ignore_errors=True)
    run = RestoreController(spark, _cfg(d, tgt)).run()
    assert run.ok, run.report()
    pk = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(tgt, "EE1472.pk")
    )
    assert sorted(r["a"] for r in pk.collect()) == [3, 4]
    assert run.tables["EE1472.pk"].alloc_base == 5
    notpk = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(tgt, "EE1472.notpk")
    )
    got = {r["a"]: r["b"] for r in notpk.collect()}
    assert got == {1111: 6, 2222: 9}
    assert run.tables["EE1472.notpk"].alloc_base == 10


class _FailSecondEngineSink(ParquetSink):
    def __init__(self, root: str):
        super().__init__(root, on_duplicate="error")
        self.fail_next = True

    def write_engine(self, df, table, engine_id):
        if engine_id == 1 and self.fail_next:
            self.fail_next = False
            raise RuntimeError("injected crash (FailIfImportedChunk)")
        return super().write_engine(df, table, engine_id)


def test_checkpoint_timestamp_frozen_across_resume(spark):
    """Reference tests/checkpoint_timestamp: 98 rows of
    CURRENT_TIMESTAMP defaults restored across a crash + resume must
    share ONE distinct timestamp (task ts persisted in the
    checkpoint, not re-frozen per process)."""
    def _stmts(n: int) -> bytes:
        return "\n".join(
            "insert into cpts values " + ", ".join(["()"] * 14) + ";"
            for _ in range(n)
        ).encode()

    files = {
        "cpts-schema-create.sql": b"create database cpts;",
        "cpts.cpts-schema.sql": (
            b"create table cpts (ts datetime not null "
            b"default current_timestamp, key(ts));"
        ),
        "cpts.cpts.1.sql": _stmts(4),  # 56 rows
        "cpts.cpts.2.sql": _stmts(3),  # 42 rows -> 98 total
    }
    d = _dump("cpts", files)
    tgt = os.path.join(TMP, "cpts_sink")
    cp_path = os.path.join(TMP, "cpts_cp.json")
    shutil.rmtree(tgt, ignore_errors=True)
    if os.path.exists(cp_path):
        os.remove(cp_path)

    def cfg():
        return Config(
            mydumper=MydumperConfig(source_dir=d, batch_size=1),
            backend="parquet",
            target_dir=tgt,
            on_duplicate="error",
            checkpoint_path=cp_path,
            tidb=TiDBConfig(sql_mode=""),
        )

    sink1 = _FailSecondEngineSink(tgt)
    run1 = RestoreController(spark, cfg(), sink=sink1).run()
    assert not run1.ok  # crashed mid-table
    sink2 = ParquetSink(tgt, on_duplicate="error")
    cp2 = CheckpointStore(cp_path)
    cp2.ignore_error("cpts.cpts")  # clear the errored status (ctl)
    run2 = RestoreController(
        spark, cfg(), sink=sink2, checkpoints=cp2
    ).run()
    assert run2.ok, run2.report()
    t = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(tgt, "cpts.cpts")
    )
    row = t.agg(
        F.count("ts").alias("a"),
        F.count_distinct("ts").alias("b"),
    ).collect()[0]
    assert (row["a"], row["b"]) == (98, 1), (row["a"], row["b"])
