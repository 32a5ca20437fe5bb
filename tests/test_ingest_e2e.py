"""End-to-end ingest: testdata -> mydumper dump -> restore -> checksum
parity with the original parquet tables.

This is the Spark analog of the reference's integration pattern:
seed a dump dir, run the pipeline, assert golden aggregates
(tests/various_types/run.sh style) — here the golden is the checksum
triple of the source-of-truth parquet."""

from __future__ import annotations

import os

import pytest

from tidb_lightning_release_4_0_spark.config import Config, MydumperConfig
from tidb_lightning_release_4_0_spark.functions.checksum import checksum
from tidb_lightning_release_4_0_spark.plans.pipeline import RestoreController
from tidb_lightning_release_4_0_spark.sources.dump_writer import write_dump_table

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")

LINEITEM_DDL = """
CREATE TABLE `lineitem` (
  `l_orderkey` BIGINT NOT NULL,
  `l_partkey` BIGINT NOT NULL,
  `l_suppkey` BIGINT NOT NULL,
  `l_linenumber` INT NOT NULL,
  `l_quantity` DOUBLE NOT NULL,
  `l_extendedprice` DOUBLE NOT NULL,
  `l_discount` DOUBLE NOT NULL,
  `l_tax` DOUBLE NOT NULL,
  `l_returnflag` VARCHAR(1) NOT NULL,
  `l_linestatus` VARCHAR(1) NOT NULL,
  `l_shipdate` DATETIME NOT NULL,
  PRIMARY KEY (`l_orderkey`, `l_linenumber`)
)
"""

NATION_DDL = """
CREATE TABLE `nation` (
  `n_nationkey` INT NOT NULL PRIMARY KEY,
  `n_name` VARCHAR(32) NOT NULL,
  `n_regionkey` INT NOT NULL
)
"""


@pytest.fixture(scope="module")
def dump_dir(tables):
    out = os.path.join(TMP, "dump_e2e")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    write_dump_table(
        out, "tpch", "lineitem", tables["lineitem"].toPandas(),
        LINEITEM_DDL, fmt="csv", parts=4,
    )
    write_dump_table(
        out, "tpch", "nation", tables["nation"].toPandas(),
        NATION_DDL, fmt="sql", parts=2,
    )
    return out


def test_restore_roundtrip(spark, tables, dump_dir):
    cfg = Config(
        mydumper=MydumperConfig(source_dir=dump_dir),
        backend="memory",
        on_duplicate="error",
        checkpoint_enable=False,
    )
    from tidb_lightning_release_4_0_spark.sinks.memory_sink import MemorySink

    sink = MemorySink(on_duplicate="error")
    ctl = RestoreController(spark, cfg, sink=sink)
    summary = ctl.run()
    assert summary.ok, summary.report()
    assert summary.tables["tpch.lineitem"].rows == tables["lineitem"].count()
    assert summary.tables["tpch.nation"].rows == 25

    # checksum parity against the source-of-truth parquet
    li_cols = tables["lineitem"].columns
    got = sink.tables["tpch.lineitem"]
    assert checksum(got, li_cols) == checksum(tables["lineitem"], li_cols)

    na_cols = tables["nation"].columns
    got_n = sink.tables["tpch.nation"]
    assert checksum(got_n, na_cols) == checksum(tables["nation"], na_cols)


def test_restore_schema_types(spark, tables, dump_dir):
    from tidb_lightning_release_4_0_spark.sources.schema_reader import (
        load_table_schema,
    )

    sch = load_table_schema(os.path.join(dump_dir, "tpch.lineitem-schema.sql"))
    assert [c.name for c in sch.columns][:3] == [
        "l_orderkey", "l_partkey", "l_suppkey",
    ]
    assert sch.primary_key == ["l_orderkey", "l_linenumber"]
    assert not sch.has_int_pk  # composite pk -> _tidb_rowid synthesized
    assert sch.columns[4].spark_type.simpleString() == "double"
    assert sch.columns[10].spark_type.simpleString() == "timestamp"
