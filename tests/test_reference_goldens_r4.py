"""Round-4 reference golden parity: the error-handling suites.

- error_summary: checksum mismatch on 2 of 3 tables -> the run
  continues (O12), the summary reports both failures, and a SECOND
  run over the uncleaned checkpoint REFUSES to start ("failed last
  time ... resolve errors first") with per-table recommended ctl
  actions (tests/error_summary/run.sh; restore.go:345-358,597-653).
- checkpoint_error_destroy: repeated bad-data failures, ctl
  checkpoint-error-destroy=all drops the errored tables' checkpoints
  AND their sink data, then a good-data run succeeds
  (tests/checkpoint_error_destroy/run.sh; checkpoints.go:1053-1135).
- tool_241: a dump full of schema-only (empty) tables must create
  every table in the target with 0 rows and leave the one non-empty
  table intact (tests/tool_241/run.sh golden count/min/max).
- concurrent-restore: 8 tiny tables under table_concurrency > 1 all
  land with their exact contents (tests/concurrent-restore/run.sh).
- check_requirements: a failing sink preflight aborts the task
  BEFORE any table restore (tests/check_requirements/run.sh shape:
  the version gate rejects the whole run).

Fixtures are regenerated here (same value ranges / invariants the
reference suites assert), not copied.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.config import (
    Config,
    MydumperConfig,
    TiDBConfig,
)
from tidb_lightning_release_4_0_spark.plans.checkpoints import (
    CheckpointStore,
    Status,
)
from tidb_lightning_release_4_0_spark.plans.pipeline import (
    CheckpointInvalidError,
    RestoreController,
)
from tidb_lightning_release_4_0_spark.sinks.memory_sink import MemorySink
from tidb_lightning_release_4_0_spark.sinks.parquet_sink import ParquetSink

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "r4g"
)


def _dump(subdir: str, files: dict[str, bytes]) -> str:
    d = os.path.join(TMP, subdir)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for name, content in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(content)
    return d


# ---------------------------------------------------------------------------
# error_summary (run.sh:20-90)
# ---------------------------------------------------------------------------


class _PrepopulatedSink(MemorySink):
    """Tables listed in ``conflicts`` already hold rows in the target
    — delivery lands beside them, so the remote checksum mismatches.
    The same failure tests/error_summary/run.sh induces by INSERTing
    conflicting content into a and c before the run."""

    def __init__(self, spark, conflicts: dict[str, list[tuple[int, int]]]):
        super().__init__(on_duplicate="error")
        self._pre = {
            t: spark.createDataFrame(rows, "id int, k int")
            for t, rows in conflicts.items()
        }

    def read_back(self, spark, table):
        df = super().read_back(spark, table)
        if table in self._pre:
            df = df.unionByName(self._pre[table])
        return df


def _es_dump() -> str:
    return _dump(
        "error_summary",
        {
            "error_summary-schema-create.sql": (
                b"CREATE DATABASE error_summary;"
            ),
            "error_summary.a-schema.sql": (
                b"CREATE TABLE a (id INT NOT NULL PRIMARY KEY, "
                b"k INT NOT NULL);"
            ),
            "error_summary.a.sql": b"INSERT INTO a VALUES (1, 2), (3, 4);",
            "error_summary.b-schema.sql": (
                b"CREATE TABLE b (id INT NOT NULL PRIMARY KEY, "
                b"k INT NOT NULL);"
            ),
            # run.sh golden: sum(id)=28, sum(k)=32
            "error_summary.b.sql": b"INSERT INTO b VALUES (3, 7), (25, 25);",
            "error_summary.c-schema.sql": (
                b"CREATE TABLE c (id INT NOT NULL PRIMARY KEY, "
                b"k INT NOT NULL);"
            ),
            "error_summary.c.sql": b"INSERT INTO c VALUES (5, 6), (7, 8);",
        },
    )


def test_error_summary_and_rerun_refusal(spark):
    d = _es_dump()
    cp_path = os.path.join(TMP, "es_cp.json")
    if os.path.exists(cp_path):
        os.remove(cp_path)
    conflicts = {
        "error_summary.a": [(2, 4), (6, 8)],
        "error_summary.c": [(3, 9), (27, 81)],
    }

    def cfg():
        return Config(
            mydumper=MydumperConfig(source_dir=d),
            backend="memory",
            on_duplicate="error",
            checkpoint_path=cp_path,
            tidb=TiDBConfig(sql_mode=""),
        )

    sink = _PrepopulatedSink(spark, conflicts)
    run1 = RestoreController(spark, cfg(), sink=sink).run()
    assert not run1.ok

    # table b is indeed imported (sum goldens from run.sh)
    b = sink.tables["error_summary.b"]
    row = b.agg(F.sum("id"), F.sum("k")).collect()[0]
    assert (row[0], row[1]) == (28, 32)

    # a and c failed at the checksum step
    for t in ("error_summary.a", "error_summary.c"):
        assert run1.tables[t].status == "failed"
        assert "checksum mismatched" in run1.tables[t].error

    rep = run1.report()
    assert '["tables failed to be imported"] [count=2]' in rep
    assert "[table=error_summary.a] [status=checksum]" in rep
    assert "[table=error_summary.c] [status=checksum]" in rep
    assert "[table=error_summary.b] [status=checksum]" not in rep

    # the aborted step recorded invalid status 18 = CHECKSUMMED/10
    cp = CheckpointStore(cp_path)
    assert cp.table_status("error_summary.a") == 18
    assert cp.table_status("error_summary.c") == 18
    assert cp.table_status("error_summary.b") >= Status.CHECKSUMMED

    # second run refuses to start over the errored checkpoint
    with pytest.raises(CheckpointInvalidError) as ei:
        RestoreController(
            spark, cfg(), sink=_PrepopulatedSink(spark, conflicts),
            checkpoints=cp,
        ).run()
    msg = str(ei.value)
    assert "failed last time" in msg
    assert "[count=2]" in msg
    assert "[table=error_summary.a] [status=18]" in msg
    assert "[failedStep=checksum]" in msg
    assert "checkpoint-error-destroy --table='error_summary.a'" in msg
    assert "error_summary.b" not in msg

    # resolve via ctl error-destroy: only the errored tables go
    destroyed = cp.destroy_error("all")
    assert sorted(destroyed) == ["error_summary.a", "error_summary.c"]
    assert cp.table_status("error_summary.b") >= Status.CHECKSUMMED

    # a clean target (no conflicting rows) now restores a and c;
    # completed b is skipped
    run3 = RestoreController(
        spark, cfg(), sink=MemorySink(on_duplicate="error"), checkpoints=cp
    ).run()
    assert run3.ok, run3.report()
    assert run3.tables["error_summary.b"].status == "skipped"
    assert run3.tables["error_summary.a"].status == "restored"
    assert run3.tables["error_summary.c"].status == "restored"


# ---------------------------------------------------------------------------
# checkpoint_error_destroy (run.sh:18-47)
# ---------------------------------------------------------------------------


def test_checkpoint_error_destroy_then_good_data(spark):
    """Bad data fails the import; ctl checkpoint-error-destroy=all
    drops the errored table's checkpoint AND its sink directory; the
    good-data run then lands the run.sh golden value."""
    bad = _dump(
        "cped_bad",
        {
            "cped-schema-create.sql": b"CREATE DATABASE cped;",
            "cped.t-schema.sql": b"CREATE TABLE t (x DATETIME NOT NULL);",
            # strict mode rejects the zero date -> write-phase failure
            "cped.t.sql": b"INSERT INTO t VALUES ('0000-00-00 00:00:00');",
        },
    )
    good = _dump(
        "cped_good",
        {
            "cped-schema-create.sql": b"CREATE DATABASE cped;",
            "cped.t-schema.sql": b"CREATE TABLE t (x DATETIME NOT NULL);",
            "cped.t.sql": b"INSERT INTO t VALUES ('1999-09-09 09:09:09');",
        },
    )
    tgt = os.path.join(TMP, "cped_sink")
    cp_path = os.path.join(TMP, "cped_cp.json")
    shutil.rmtree(tgt, ignore_errors=True)
    if os.path.exists(cp_path):
        os.remove(cp_path)

    def cfg(src):
        return Config(
            mydumper=MydumperConfig(source_dir=src),
            backend="parquet",
            target_dir=tgt,
            checkpoint_path=cp_path,
            tidb=TiDBConfig(sql_mode="STRICT_TRANS_TABLES"),
        )

    # run.sh loops the fail+destroy cycle to prove ctl fully resets
    # state each time (it uses 8; 3 proves the same invariant)
    for _ in range(3):
        cp = CheckpointStore(cp_path)
        run = RestoreController(
            spark, cfg(bad), sink=ParquetSink(tgt, on_duplicate="error"),
            checkpoints=cp,
        ).run()
        assert not run.ok
        assert CheckpointStore(cp_path).table_status("cped.t") <= (
            Status.MAX_INVALID
        )
        destroyed = CheckpointStore(cp_path).destroy_error("all")
        assert destroyed == ["cped.t"]
        shutil.rmtree(os.path.join(tgt, "cped.t"), ignore_errors=True)

    run = RestoreController(
        spark, cfg(good), sink=ParquetSink(tgt, on_duplicate="error"),
        checkpoints=CheckpointStore(cp_path),
    ).run()
    assert run.ok, run.report()
    t = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(tgt, "cped.t")
    )
    rows = t.collect()
    assert len(rows) == 1
    assert str(rows[0]["x"]) == "1999-09-09 09:09:09"


# ---------------------------------------------------------------------------
# tool_241: lots of empty tables (run.sh:26-45)
# ---------------------------------------------------------------------------


def test_tool_241_empty_tables(spark):
    empty_tables = [
        "q_alarm_group",
        "q_alarm_message_log",
        "q_alarm_receiver",
        "q_config",
        "q_report_circular_data",
        "q_report_desc",
        "q_report_summary",
        "q_system_update",
        "q_user_log",
    ]
    files: dict[str, bytes] = {
        "qyjc-schema-create.sql": b"CREATE DATABASE qyjc;",
        "qyjc.q_fish_event-schema.sql": (
            b"CREATE TABLE q_fish_event (id BIGINT NOT NULL PRIMARY KEY, "
            b"v INT);"
        ),
        # run.sh golden: count=84, min=8343146, max=8343229
        "qyjc.q_fish_event.sql": (
            "INSERT INTO q_fish_event VALUES "
            + ", ".join(f"({i}, {i % 7})" for i in range(8343146, 8343230))
            + ";"
        ).encode(),
    }
    for i, t in enumerate(empty_tables):
        # alternate int-PK and no-PK shapes: the no-PK empty frame
        # must still carry the hidden _tidb_rowid column so the
        # delivered schema matches the catalog registration
        files[f"qyjc.{t}-schema.sql"] = (
            (
                f"CREATE TABLE {t} (id BIGINT NOT NULL PRIMARY KEY, "
                f"v VARCHAR(16));"
            )
            if i % 2 == 0
            else f"CREATE TABLE {t} (v VARCHAR(16));"
        ).encode()
        # half the empty tables have a data file with no rows, half
        # have no data file at all (TOOL-200 vs TOOL-241)
        if t[2] in "ac":
            files[f"qyjc.{t}.sql"] = b"/* no rows */\n"

    d = _dump("tool_241", files)
    sink = MemorySink(on_duplicate="error")
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="memory",
        checkpoint_enable=False,
        tidb=TiDBConfig(sql_mode=""),
    )
    run = RestoreController(spark, cfg, sink=sink).run()
    assert run.ok, run.report()

    # every empty table exists in the target with count 0; the no-PK
    # ones carry the hidden _tidb_rowid column (schema parity with
    # the catalog registration)
    for i, t in enumerate(empty_tables):
        name = f"qyjc.{t}"
        assert run.tables[name].status == "restored"
        assert run.tables[name].rows == 0
        assert sink.tables[name].count() == 0
        if i % 2 == 1:
            assert "_tidb_rowid" in sink.tables[name].columns

    # the non-empty table is not affected
    fe = sink.tables["qyjc.q_fish_event"]
    row = fe.agg(
        F.count("id"), F.min("id"), F.max("id")
    ).collect()[0]
    assert (row[0], row[1], row[2]) == (84, 8343146, 8343229)


# ---------------------------------------------------------------------------
# concurrent-restore (run.sh:16-45)
# ---------------------------------------------------------------------------


def test_concurrent_restore_eight_tables(spark):
    files: dict[str, bytes] = {
        "restore_conc-schema-create.sql": b"CREATE DATABASE restore_conc;",
    }
    for i in range(1, 9):
        files[f"restore_conc.tbl{i}-schema.sql"] = (
            f"CREATE TABLE tbl{i}(i TINYINT);".encode()
        )
        files[f"restore_conc.tbl{i}.sql"] = (
            f"INSERT INTO tbl{i} VALUES (1);".encode()
        )
    d = _dump("restore_conc", files)
    sink = MemorySink(on_duplicate="error")
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="memory",
        checkpoint_enable=False,
        table_concurrency=4,
        tidb=TiDBConfig(sql_mode=""),
    )
    run = RestoreController(spark, cfg, sink=sink).run()
    assert run.ok, run.report()
    for i in range(1, 9):
        t = sink.tables[f"restore_conc.tbl{i}"]
        assert t.agg(F.sum("i")).collect()[0][0] == 1


# ---------------------------------------------------------------------------
# check_requirements: preflight failure aborts before any table
# ---------------------------------------------------------------------------


class _UnreachableSink(MemorySink):
    writes = 0

    def probe(self, spark):
        raise ConnectionError("cluster version 2.0.0 < required 2.1.0")

    def write(self, df, table):
        type(self).writes += 1
        return super().write(df, table)


def test_check_requirements_gate_aborts_run(spark):
    d = _dump(
        "checkreq",
        {
            "checkreq-schema-create.sql": b"CREATE DATABASE checkreq;",
            "checkreq.t-schema.sql": b"CREATE TABLE t (i INT);",
            "checkreq.t.sql": b"INSERT INTO t VALUES (1);",
        },
    )
    sink = _UnreachableSink(on_duplicate="error")
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="memory",
        checkpoint_enable=False,
        tidb=TiDBConfig(sql_mode=""),
    )
    with pytest.raises(ConnectionError):
        RestoreController(spark, cfg, sink=sink).run()
    assert _UnreachableSink.writes == 0  # failed BEFORE any table


# ---------------------------------------------------------------------------
# row-format-v2 (run.sh:13-20): wide sparse rows
# ---------------------------------------------------------------------------


def test_row_format_v2_wide_sparse_table(spark):
    """Reference tests/row-format-v2 loads a 256-column table of 50
    mostly-NULL rows (the suite checks TiKV's v2 row encoding handles
    sparse wide rows; the engine-semantics golden is count=50 and
    DISTINCT col14 = {NULL, 39}). Exercises wide-row DDL parsing and
    the per-column cast ladder at width."""
    ncols = 256
    ddl = (
        "create table t1 (\n"
        + ",\n".join(f"    col{i} int" for i in range(ncols))
        + "\n);"
    ).encode()
    null_row = "(" + ", ".join(["NULL"] * ncols) + ")"
    v39 = ["NULL"] * ncols
    v39[14] = "39"
    row39 = "(" + ", ".join(v39) + ")"
    stmts = "INSERT INTO t1 VALUES\n" + ",\n".join(
        [row39 if i % 25 == 0 else null_row for i in range(50)]
    ) + ";"
    d = _dump(
        "rowformatv2",
        {
            "rowformatv2-schema-create.sql": b"create database rowformatv2;",
            "rowformatv2.t1-schema.sql": ddl,
            "rowformatv2.t1.1.sql": stmts.encode(),
        },
    )
    sink = MemorySink(on_duplicate="error")
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="memory",
        checkpoint_enable=False,
        tidb=TiDBConfig(sql_mode=""),
    )
    run = RestoreController(spark, cfg, sink=sink).run()
    assert run.ok, run.report()
    t = sink.tables["rowformatv2.t1"]
    assert t.count() == 50
    distinct = sorted(
        (r["col14"] for r in t.select("col14").distinct().collect()),
        key=lambda v: (v is not None, v),
    )
    assert distinct == [None, 39]


# ---------------------------------------------------------------------------
# restore: 35-table stress (run.sh:18-42)
# ---------------------------------------------------------------------------


def test_restore_35_table_stress(spark):
    """Reference tests/restore: 35 one-row tables restored under
    concurrency with checkpoints on; every table lands sum(i)=1 and
    the checkpoint store is cleaned on success."""
    files: dict[str, bytes] = {
        "restore_tsr-schema-create.sql": b"CREATE DATABASE restore_tsr;",
    }
    for i in range(1, 36):
        files[f"restore_tsr.tbl{i}-schema.sql"] = (
            f"CREATE TABLE tbl{i}(i TINYINT);".encode()
        )
        files[f"restore_tsr.tbl{i}.sql"] = (
            f"INSERT INTO tbl{i} VALUES (1);".encode()
        )
    d = _dump("restore_tsr", files)
    cp_path = os.path.join(TMP, "tsr_cp.json")
    if os.path.exists(cp_path):
        os.remove(cp_path)
    sink = MemorySink(on_duplicate="error")
    cfg = Config(
        mydumper=MydumperConfig(source_dir=d),
        backend="memory",
        checkpoint_path=cp_path,
        table_concurrency=8,
        tidb=TiDBConfig(sql_mode=""),
    )
    run = RestoreController(spark, cfg, sink=sink).run()
    assert run.ok, run.report()
    assert len(run.tables) == 35
    for i in range(1, 36):
        t = sink.tables[f"restore_tsr.tbl{i}"]
        assert t.agg(F.sum("i")).collect()[0][0] == 1
    assert not os.path.exists(cp_path)  # cleaned on success
