"""no-schema mode, JDBC SQL-text rendering, exotic identifiers."""

from __future__ import annotations

import datetime
import os
import shutil

from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.config import Config, MydumperConfig
from tidb_lightning_release_4_0_spark.plans.pipeline import RestoreController
from tidb_lightning_release_4_0_spark.sinks.jdbc_sink import (
    escape_sql_string,
    render_insert,
    render_sql_value,
)
from tidb_lightning_release_4_0_spark.sinks.memory_sink import MemorySink

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "misc"
)


def _dump(subdir: str, files: dict[str, bytes]) -> str:
    d = os.path.join(TMP, subdir)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for name, content in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(content)
    return d


def test_no_schema_mode(spark):
    """tests/no_schema: no *-schema.sql files; schema comes from the
    pre-created target table; golden sum(x)=120."""
    d = _dump(
        "noschema",
        {"noschema.t.sql": b"INSERT INTO t VALUES (20), (40), (60);"},
    )
    sink = MemorySink(on_duplicate="error")
    # pre-register the target table (x INT PRIMARY KEY)
    pre = spark.createDataFrame([(0,)], "x int").limit(0)
    sink.tables["noschema.t"] = pre
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d, no_schema=True),
        backend="memory",
        checkpoint_enable=False,
        checksum=False,
    )
    s = RestoreController(spark, cfg, sink=sink).run()
    assert s.ok, s.report()
    assert (
        sink.tables["noschema.t"].agg(F.sum("x")).collect()[0][0] == 120
    )


def test_jdbc_sql_text_rendering():
    """T7/K3: literal rendering + escaping (tidb.go:96-132,271-311)."""
    assert escape_sql_string("a'b\\c\nd") == "'a\\'b\\\\c\\nd'"
    assert escape_sql_string("\0\b\t\x1a") == "'\\0\\b\\t\\Z'"
    assert render_sql_value(None) == "NULL"
    assert render_sql_value(True) == "1"
    assert render_sql_value(42) == "42"
    assert render_sql_value(4.5) == "4.5"
    assert render_sql_value(b"\xff\x00") == "x'ff00'"
    assert (
        render_sql_value(datetime.datetime(2020, 1, 2, 3, 4, 5))
        == "'2020-01-02 03:04:05'"
    )
    sql = render_insert(
        "tbl", ["a", "b"], [(1, "x"), (2, None)], on_duplicate="replace"
    )
    assert sql == "REPLACE INTO `tbl` (`a`,`b`) VALUES (1,'x'),(2,NULL)"
    assert render_insert("t", ["a"], [(1,)], "ignore").startswith(
        "INSERT IGNORE INTO"
    )
    assert render_insert("t", ["a"], [(1,)], "error").startswith(
        "INSERT INTO"
    )


def test_exotic_identifiers(spark):
    """tests/exotic_filenames-flavored: unicode db/table names and
    backquoted column identifiers round-trip."""
    d = _dump(
        "exotic",
        {
            "中文庫-schema-create.sql": "CREATE DATABASE `中文庫`;".encode(),
            "中文庫.表格-schema.sql": (
                "create table `表格` (`键` int primary key, "
                "`名 字` varchar(10));".encode()
            ),
            "中文庫.表格.sql": (
                "INSERT INTO `表格` VALUES (1, '一'), (2, '二'), (3, NULL);".encode()
            ),
        },
    )
    sink = MemorySink(on_duplicate="error")
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="memory",
        checkpoint_enable=False,
        checksum=False,
    )
    s = RestoreController(spark, cfg, sink=sink).run()
    assert s.ok, s.report()
    t = sink.tables["中文庫.表格"]
    assert t.columns == ["键", "名 字"]
    assert t.count() == 3
    assert t.filter(F.col("键") == 1).collect()[0]["名 字"] == "一"


def test_explicit_tidb_rowid_column(spark):
    """tests/tidb_rowid explicit_tidb_rowid: a _tidb_rowid column in
    the data file is honored (restore.go:1381-1388)."""
    d = _dump(
        "explicit_rowid",
        {
            "r-schema-create.sql": b"CREATE DATABASE r;",
            "r.t-schema.sql": b"create table t (pk varchar(4) primary key);",
            "r.t.sql": (
                b"INSERT INTO t (pk, _tidb_rowid) VALUES "
                b"('a', 10), ('b', 20), ('c', 30);"
            ),
        },
    )
    sink = MemorySink(on_duplicate="error")
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="memory",
        checkpoint_enable=False,
        checksum=False,
    )
    s = RestoreController(spark, cfg, sink=sink).run()
    assert s.ok, s.report()
    t = sink.tables["r.t"]
    assert sorted(r["_tidb_rowid"] for r in t.collect()) == [10, 20, 30]
    assert s.tables["r.t"].alloc_base == 31
