"""Parity tests reproducing the reference integration suites' golden
values (SURVEY.md §5). Fixture data is reconstructed programmatically
from the documented semantics — never copied from the reference tree.

Covered suites:
- tests/csv (escapes, empty strings)         -> test_csv_escapes*
- tests/various_types (bit/decimal/uint64)   -> test_vt_*
- tests/sqlmode (strict vs lenient)          -> test_sqlmode_*
- tests/default-columns                      -> test_default_columns
- tests/tidb_rowid                           -> test_tidb_rowid
- tests/routes                               -> test_routes
- tests/black-white-list                     -> test_black_white_list
- tests/character_sets (gb18030)             -> test_character_sets
- tests/checkpoint_chunks (resume)           -> test_checkpoint_resume
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.config import (
    Config,
    FilterRule,
    MydumperConfig,
    RouteRule,
)
from tidb_lightning_release_4_0_spark.plans.checkpoints import (
    CheckpointStore,
    Status,
)
from tidb_lightning_release_4_0_spark.plans.pipeline import RestoreController
from tidb_lightning_release_4_0_spark.sinks.memory_sink import MemorySink

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "goldens"
)


def _dump(subdir: str, files: dict[str, bytes]) -> str:
    d = os.path.join(TMP, subdir)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for name, content in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(content)
    return d


def _restore(spark, source_dir, **cfg_kwargs):
    sink = MemorySink(on_duplicate=cfg_kwargs.pop("on_duplicate", "error"))
    md = MydumperConfig(
        source_dir=source_dir,
        character_set=cfg_kwargs.pop("character_set", "auto"),
    )
    if cfg_kwargs.pop("strict_csv", False):
        md.csv.strict_parser = True
    cfg = Config(
        mydumper=md,
        backend="memory",
        checkpoint_enable=False,
        **cfg_kwargs,
    )
    ctl = RestoreController(spark, cfg, sink=sink)
    return ctl.run(), sink


# ---------------------------------------------------------------------------
# tests/csv: escapes + empty strings (run.sh:19-38)
# ---------------------------------------------------------------------------


def test_csv_escapes(spark):
    """Backslash escapes, doubled quotes, embedded newlines, raw blob
    bytes; goldens hex(t)=5C/22/0A, hex(b)=FFFFFFFF/0D0A0D0A/5C2C5C2C
    (tests/csv/run.sh:19-33). Note the uppercase .CSV extension."""
    csv_bytes = (
        b'"1","\\\\","{\\"?\\": []}","\xff\xff\xff\xff"\n'
        b'"2","\\"","\\"\\\\n\\\\n\\\\n\\"","\r\\\n\r\\\n"\n'
        b'"3","\\\n","[\\",,,\\"]","\\\\,\\\\,"\n'
    )
    ddl = (
        b"create table `escapes` ("
        b"`i` int primary key, `t` text, `j` json, `b` blob);"
    )
    d = _dump(
        "csv_escapes",
        {
            "csv-schema-create.sql": b"CREATE DATABASE csv;",
            "csv.escapes-schema.sql": ddl,
            "csv.escapes.CSV": csv_bytes,
        },
    )
    summary, sink = _restore(spark, d, strict_csv=True)
    assert summary.ok, summary.report()
    got = (
        sink.tables["csv.escapes"]
        .select("i", F.upper(F.hex("t")).alias("ht"), "j", F.upper(F.hex("b")).alias("hb"))
        .orderBy("i")
        .collect()
    )
    assert [r["ht"] for r in got] == ["5C", "22", "0A"]
    assert [r["hb"] for r in got] == ["FFFFFFFF", "0D0A0D0A", "5C2C5C2C"]
    assert got[0]["j"] == '{"?": []}'
    assert got[2]["j"] == '[",,,"]'


def test_csv_empty_strings(spark):
    """A field of four quote chars is one literal quote; empty stays
    empty string, not NULL; b <> empty matches nothing
    (tests/csv/run.sh:35-38)."""
    csv_bytes = b'1,"a",""\n2,"",""\n3,"""",""\n'
    ddl = b"create table empty_strings (id int, a varchar(10), b varchar(10));"
    d = _dump(
        "csv_empty",
        {
            "csv-schema-create.sql": b"CREATE DATABASE csv;",
            "csv.empty_strings-schema.sql": ddl,
            "csv.empty_strings.csv": csv_bytes,
        },
    )
    summary, sink = _restore(spark, d, strict_csv=True)
    assert summary.ok, summary.report()
    t = sink.tables["csv.empty_strings"]
    assert [r["id"] for r in t.filter(F.col("a") == '"').collect()] == [3]
    assert t.filter(F.col("b") != "").count() == 0
    assert t.filter(F.col("b").isNull()).count() == 0


# ---------------------------------------------------------------------------
# tests/various_types (run.sh:28-41,96-109)
# ---------------------------------------------------------------------------


def test_vt_bit(spark):
    """BIT(2) from binary literals; sum(ref)=82 where pk=0b10
    mirrors the shape of tests/various_types/run.sh:28-33."""
    sql = (
        b"INSERT INTO `bit` (`ref`, `pk`) VALUES "
        b"(40, b'10'), (42, 0b10), (7, b'01'), (1, b'11');"
    )
    ddl = b"create table `bit` (`ref` int not null, `pk` bit(2) not null);"
    d = _dump(
        "vt_bit",
        {
            "vt-schema-create.sql": b"CREATE DATABASE vt;",
            "vt.bit-schema.sql": ddl,
            "vt.bit.sql": sql,
        },
    )
    summary, sink = _restore(spark, d)
    assert summary.ok, summary.report()
    t = sink.tables["vt.bit"]
    row = t.filter(F.col("pk") == 2).agg(F.sum("ref").alias("s")).collect()[0]
    assert row["s"] == 82
    assert t.agg(F.min("pk"), F.max("pk")).collect()[0][0:2] == (1, 3)


def test_vt_precise_types(spark):
    """uint64 fidelity: 18446744073709551614 must round-trip exactly
    (-> DecimalType(20,0)); bigint min-ish; 21-digit decimal
    (tests/various_types/run.sh:105-109)."""
    sql = (
        b"INSERT INTO `precise_types` VALUES "
        b"(18446744073709551614, -9223372036854775806, "
        b"99999999999999999999.0, 1.8446744073709552e19);"
    )
    ddl = (
        b"create table precise_types ("
        b"a bigint unsigned not null, b bigint not null, "
        b"c decimal(21,1) not null, d double not null);"
    )
    d = _dump(
        "vt_precise",
        {
            "vt-schema-create.sql": b"CREATE DATABASE vt;",
            "vt.precise_types-schema.sql": ddl,
            "vt.precise_types.sql": sql,
        },
    )
    summary, sink = _restore(spark, d)
    assert summary.ok, summary.report()
    row = sink.tables["vt.precise_types"].collect()[0]
    assert str(row["a"]) == "18446744073709551614"
    assert row["b"] == -9223372036854775806
    assert str(row["c"]) == "99999999999999999999.0"
    assert row["d"] == 1.8446744073709552e19


def test_vt_decimal_pk(spark):
    """DECIMAL(6,4) precision survives ingest (run.sh:35-41 shape)."""
    sql = (
        b"INSERT INTO `decimal` VALUES (1, -99.9990), (2, 99.9912), "
        b"(3, -9.1045);"
    )
    ddl = (
        b"create table `decimal` (ref int not null, "
        b"pk decimal(6,4) not null primary key);"
    )
    d = _dump(
        "vt_decimal",
        {
            "vt-schema-create.sql": b"CREATE DATABASE vt;",
            "vt.decimal-schema.sql": ddl,
            "vt.decimal.sql": sql,
        },
    )
    summary, sink = _restore(spark, d)
    assert summary.ok, summary.report()
    t = sink.tables["vt.decimal"]
    r = t.agg(
        F.min("pk").alias("mn"), F.max("pk").alias("mx"), F.sum("pk").alias("s")
    ).collect()[0]
    assert str(r["mn"]) == "-99.9990"
    assert str(r["mx"]) == "99.9912"
    assert str(r["s"]) == "-9.1123"


def test_vt_enum_set(spark):
    """ENUM/SET columns: member validation + SET canonical order."""
    sql = (
        b"INSERT INTO es (e, s) VALUES "
        b"('g01', 'x00,x50'), ('g02', 'x50'), ('gff', 'x63,x00');"
    )
    members = ",".join(f"'g{i:02x}'" for i in range(256)).encode()
    set_members = ",".join(f"'x{i:02d}'" for i in range(64)).encode()
    ddl = (
        b"create table es (e enum(" + members + b") , s set("
        + set_members + b"));"
    )
    d = _dump(
        "vt_enumset",
        {
            "vt-schema-create.sql": b"CREATE DATABASE vt;",
            "vt.es-schema.sql": ddl,
            "vt.es.sql": sql,
        },
    )
    summary, sink = _restore(spark, d)
    assert summary.ok, summary.report()
    t = sink.tables["vt.es"]
    # find_in_set('x50', s) analog
    assert t.filter(F.array_contains(F.split("s", ","), "x50")).count() == 2
    # SET stored in definition order: 'x63,x00' -> 'x00,x63'
    assert t.filter(F.col("e") == "gff").collect()[0]["s"] == "x00,x63"


# ---------------------------------------------------------------------------
# tests/sqlmode (run.sh:1-44)
# ---------------------------------------------------------------------------

_SQLMODE_FILES = {
    "sqlmodedb-schema-create.sql": b"CREATE DATABASE sqlmodedb;",
    "sqlmodedb.t-schema.sql": (
        b"create table t (id int primary key, a timestamp, b tinyint);"
    ),
    "sqlmodedb.t.sql": (
        b"INSERT INTO t VALUES "
        b"(1, '0000-00-00 00:00:00', 128), "
        b"(2, '2020-01-01 00:00:00', -129), "
        b"(3, 'invalid-date', 9000);"
    ),
}


def test_sqlmode_lenient(spark):
    """off.toml: bad values coerced — zero/invalid dates -> zero-date
    (NULL internally), out-of-range ints clamped to 127/-128."""
    d = _dump("sqlmode_off", _SQLMODE_FILES)
    summary, sink = _restore(
        spark, d, tidb=__import__(
            "tidb_lightning_release_4_0_spark.config", fromlist=["TiDBConfig"]
        ).TiDBConfig(sql_mode="")
    )
    assert summary.ok, summary.report()
    from tidb_lightning_release_4_0_spark.operators.cast import (
        format_mysql_datetime,
    )

    t = sink.tables["sqlmodedb.t"].select(
        "id", format_mysql_datetime(F.col("a")).alias("a"), "b"
    )
    rows = {r["id"]: r for r in t.collect()}
    assert rows[1]["a"] == "0000-00-00 00:00:00"
    assert rows[3]["a"] == "0000-00-00 00:00:00"
    assert rows[1]["b"] == 127
    assert rows[2]["b"] == -128
    assert rows[3]["b"] == 127


def test_sqlmode_strict(spark):
    """on.toml: import fails with a cast error (run.sh:30-44)."""
    d = _dump("sqlmode_on", _SQLMODE_FILES)
    summary, sink = _restore(spark, d)  # default sql_mode is strict
    assert not summary.ok
    err = summary.tables["sqlmodedb.t"].error
    assert "strict" in err.lower() or "bad value" in err.lower()


# ---------------------------------------------------------------------------
# tests/default-columns (run.sh:5-15)
# ---------------------------------------------------------------------------


def test_default_columns(spark):
    files = {
        "defcol-schema-create.sql": b"CREATE DATABASE defcol;",
        "defcol.t-schema.sql": (
            b"create table t (pk int primary key auto_increment, "
            b"x int null, y int not null default 123);"
        ),
        # data supplies only x -> pk auto-filled from rowid, y default
        "defcol.t.sql": b"INSERT INTO t (x) VALUES (NULL), (NULL), (NULL);",
        "defcol.u-schema.sql": (
            b"create table u (xx int unique auto_increment, "
            b"yy int primary key);"
        ),
        "defcol.u.sql": b"INSERT INTO u (yy) VALUES (40), (60);",
    }
    d = _dump("defcol", files)
    summary, sink = _restore(spark, d)
    assert summary.ok, summary.report()
    t = sink.tables["defcol.t"].orderBy("pk").collect()
    assert [r["pk"] for r in t] == [1, 2, 3]
    assert all(r["x"] is None for r in t)
    assert all(r["y"] == 123 for r in t)
    u = sink.tables["defcol.u"].orderBy("yy").collect()
    assert sorted(r["xx"] for r in u) == [1, 2]


# ---------------------------------------------------------------------------
# tests/tidb_rowid (run.sh:1-50)
# ---------------------------------------------------------------------------


def test_tidb_rowid(spark):
    files = {
        "rowid-schema-create.sql": b"CREATE DATABASE rowid;",
        "rowid.non_pk-schema.sql": (
            b"create table non_pk (pk varchar(10) primary key);"
        ),
        "rowid.non_pk.sql": (
            b"INSERT INTO non_pk VALUES ('a'), ('b'), ('c'), ('d');"
        ),
    }
    d = _dump("rowid", files)
    summary, sink = _restore(spark, d)
    assert summary.ok, summary.report()
    t = sink.tables["rowid.non_pk"]
    # varchar PK => not int-handle => hidden _tidb_rowid dense 1..N
    got = sorted(r["_tidb_rowid"] for r in t.collect())
    assert got == [1, 2, 3, 4]
    assert summary.tables["rowid.non_pk"].alloc_base == 5


# ---------------------------------------------------------------------------
# tests/routes
# ---------------------------------------------------------------------------


def test_routes(spark):
    files = {
        "routes_a0-schema-create.sql": b"CREATE DATABASE routes_a0;",
        "routes_a0.t0-schema.sql": b"create table t0 (x int);",
        "routes_a0.t0.sql": b"INSERT INTO t0 VALUES (1), (2);",
        "routes_a0.t1-schema.sql": b"create table t1 (x int);",
        "routes_a0.t1.sql": b"INSERT INTO t1 VALUES (4);",
        "routes_a1-schema-create.sql": b"CREATE DATABASE routes_a1;",
        "routes_a1.t2-schema.sql": b"create table t2 (x int);",
        "routes_a1.t2.sql": b"INSERT INTO t2 VALUES (252);",
        "routes_a1.s1-schema.sql": b"create table s1 (x int);",
        "routes_a1.s1.sql": b"INSERT INTO s1 VALUES (77);",
    }
    d = _dump("routes", files)
    summary, sink = _restore(
        spark,
        d,
        routes=[RouteRule("routes_a*", "t*", "routes_b", "u")],
    )
    assert summary.ok, summary.report()
    # merged: count=4, sum=259 (tests/routes/run.sh golden shape)
    u = sink.tables["routes_b.u"]
    assert u.count() == 4
    assert u.agg(F.sum("x")).collect()[0][0] == 259
    # s1 not routed, stays in routes_a1
    assert "routes_a1.s1" in sink.tables
    assert "routes_a0.t0" not in sink.tables


# ---------------------------------------------------------------------------
# tests/black-white-list
# ---------------------------------------------------------------------------


def test_black_white_list(spark):
    files = {
        "firstdb-schema-create.sql": b"CREATE DATABASE firstdb;",
        "firstdb.first-schema.sql": b"create table first (x int);",
        "firstdb.first.sql": b"INSERT INTO first VALUES (1);",
        "firstdb.second-schema.sql": b"create table second (x int);",
        "firstdb.second.sql": b"INSERT INTO second VALUES (2);",
        "seconddb-schema-create.sql": b"CREATE DATABASE seconddb;",
        "seconddb.third-schema.sql": b"create table third (x int);",
        "seconddb.third.sql": b"INSERT INTO third VALUES (3);",
        "mysql-schema-create.sql": b"CREATE DATABASE mysql;",
        "mysql.testtable-schema.sql": b"create table testtable (x int);",
        "mysql.testtable.sql": b"INSERT INTO testtable VALUES (9);",
    }
    d = _dump("bwlist", files)
    # whitelist firstdb only; mysql.* always ignored regardless
    summary, sink = _restore(
        spark, d, bw_list=FilterRule(do_dbs=["firstdb"])
    )
    assert summary.ok, summary.report()
    assert set(sink.tables) == {"firstdb.first", "firstdb.second"}

    # ignore-tables variant
    summary2, sink2 = _restore(
        spark, d, bw_list=FilterRule(ignore_tables=[("firstdb", "second")])
    )
    assert set(sink2.tables) == {
        "firstdb.first", "seconddb.third",
    }


# ---------------------------------------------------------------------------
# tests/character_sets (gb18030)
# ---------------------------------------------------------------------------


def test_character_sets_gb18030(spark):
    col = "主键"
    ddl = f"create table t ({col} int primary key);".encode("gb18030")
    data = f"INSERT INTO t VALUES (100), (150), (17);".encode("gb18030")
    files = {
        "charsets-schema-create.sql": "CREATE DATABASE charsets;".encode(
            "gb18030"
        ),
        "charsets.t-schema.sql": ddl,
        "charsets.t.sql": data,
    }
    d = _dump("charsets", files)
    summary, sink = _restore(spark, d, character_set="gb18030")
    assert summary.ok, summary.report()
    t = sink.tables["charsets.t"]
    assert t.columns == [col]
    assert t.agg(F.sum(col)).collect()[0][0] == 267  # sum(主键)=267 golden

    # auto detection must also work (utf8 fails -> gb18030 fallback)
    summary2, sink2 = _restore(spark, d, character_set="auto")
    assert summary2.ok
    assert sink2.tables["charsets.t"].columns == [col]


# ---------------------------------------------------------------------------
# tests/checkpoint_chunks: crash-resume (run.sh:1-30)
# ---------------------------------------------------------------------------


def test_examples_mocker_scale(spark):
    """tests/examples: tbl_autoid 10k rows with auto-inc PK —
    distinct-count 10000 golden (run.sh:20-24), compaction finalize."""
    import numpy as np
    import pandas as pd

    from tidb_lightning_release_4_0_spark.sinks.parquet_sink import ParquetSink
    from tidb_lightning_release_4_0_spark.sources.dump_writer import (
        write_dump_table,
    )

    d = os.path.join(TMP, "mocker")
    tgt = os.path.join(TMP, "mocker_sink")
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(tgt, ignore_errors=True)
    rng = np.random.default_rng(42)
    names = pd.DataFrame(
        {
            "ID": [None] * 10000,  # NULL auto-inc -> assigned from rowid
            "Name": ["u%06d" % i for i in rng.permutation(10000)],
        }
    )
    write_dump_table(
        d, "mocker", "tbl_autoid", names,
        "CREATE TABLE tbl_autoid (ID INT UNSIGNED AUTO_INCREMENT "
        "PRIMARY KEY, Name VARCHAR(64))",
        fmt="sql", parts=16,
    )
    sink = ParquetSink(tgt, on_duplicate="error")
    sink.target_file_bytes = 1 << 20  # force compaction on tiny files
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="parquet", target_dir=tgt, checkpoint_enable=False,
        compact=True,  # opt-in, like the reference's post-restore compact
    )
    s = RestoreController(spark, cfg, sink=sink).run()
    assert s.ok, s.report()
    t = spark.read.parquet(os.path.join(tgt, "mocker.tbl_autoid"))
    assert t.select("ID").distinct().count() == 10000
    assert t.select("Name").distinct().count() == 10000
    # alloc_base continues past every assigned id (gaps between
    # per-file reserved ranges are reference semantics,
    # region.go:146-170; the dense guarantee is per file only)
    assert s.tables["mocker.tbl_autoid"].alloc_base >= 10001
    assert (
        t.agg(F.max("ID")).collect()[0][0]
        < s.tables["mocker.tbl_autoid"].alloc_base
    )
    # finalize compacted the 16 task outputs into fewer files
    n_files = len(
        [f for f in os.listdir(os.path.join(tgt, "mocker.tbl_autoid"))
         if f.endswith(".parquet")]
    )
    assert n_files <= 8


class _FailOnceSink(MemorySink):
    """Fails the first write of a chosen table (failpoint analog)."""

    def __init__(self, fail_table: str):
        super().__init__(on_duplicate="error")
        self.fail_table = fail_table
        self.failed = False

    def write(self, df, table):
        if table == self.fail_table and not self.failed:
            self.failed = True
            raise RuntimeError("injected failure (failpoint analog)")
        return super().write(df, table)


def test_checkpoint_resume(spark):
    files = {
        "cpt-schema-create.sql": b"CREATE DATABASE cpt;",
        "cpt.tbl-schema.sql": (
            b"create table tbl (i bigint unsigned primary key);"
        ),
        "cpt.tbl.sql": b"INSERT INTO tbl VALUES (1), (2), (3), (4), (5);",
        "cpt.ok-schema.sql": b"create table ok (i int primary key);",
        "cpt.ok.sql": b"INSERT INTO ok VALUES (10);",
    }
    d = _dump("cpt", files)
    cp_path = os.path.join(TMP, "cpt_checkpoint.json")
    if os.path.exists(cp_path):
        os.remove(cp_path)

    sink = _FailOnceSink("cpt.tbl")
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="memory",
        checkpoint_path=cp_path,
        tidb=__import__(
            "tidb_lightning_release_4_0_spark.config", fromlist=["TiDBConfig"]
        ).TiDBConfig(sql_mode=""),
    )
    run1 = RestoreController(spark, cfg, sink=sink).run()
    assert not run1.ok
    assert run1.tables["cpt.tbl"].status == "failed"
    assert run1.tables["cpt.ok"].status == "restored"

    # resume: completed table skipped, failed table restored;
    # exact row accounting like checkpoint_chunks' sum(i) golden
    cp = CheckpointStore(cp_path)
    assert cp.table_status("cpt.ok") >= Status.CHECKSUMMED
    # the failed table left an errored checkpoint -> a blind rerun is
    # refused until ctl resolves it (tests/error_summary/run.sh part 2)
    import pytest as _pytest

    from tidb_lightning_release_4_0_spark.plans.pipeline import (
        CheckpointInvalidError,
    )

    with _pytest.raises(CheckpointInvalidError):
        RestoreController(spark, cfg, sink=sink, checkpoints=cp).run()
    cp.ignore_error("cpt.tbl")  # ctl checkpoint-error-ignore
    run2 = RestoreController(spark, cfg, sink=sink, checkpoints=cp).run()
    assert run2.ok, run2.report()
    assert run2.tables["cpt.ok"].status == "skipped"
    t = sink.tables["cpt.tbl"]
    assert t.agg(F.sum("i")).collect()[0][0] == 15  # sum 1..5
    # success cleans checkpoints ([6] cleanCheckpoints)
    assert not os.path.exists(cp_path)
