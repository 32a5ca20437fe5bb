"""Continuous-restore (streaming/restore.py): batch equivalence,
incremental file pickup, row-id continuity, replay idempotence.

Reference analog: server-mode task queue feeding batch pipelines
(lightning/lightning.go:149-167) — here the file source is the queue
and each micro-batch runs the batch ladder, so streaming results
must equal a one-shot batch restore of the same files."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.functions.checksum import checksum
from tidb_lightning_release_4_0_spark.sources.schema_reader import (
    parse_create_table,
)
from tidb_lightning_release_4_0_spark.streaming.restore import StreamingRestore

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    "stream_restore",
)

DDL = (
    "create table t (id int primary key, name varchar(20), v double)"
)
DDL_NOPK = "create table u (name varchar(10))"


def _fresh(name: str) -> tuple[str, str, str]:
    root = os.path.join(TMP, name)
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    os.makedirs(src, exist_ok=True)
    return (
        src,
        os.path.join(root, "sink"),
        os.path.join(root, "ckpt"),
    )


def _write(src: str, fname: str, text: str) -> None:
    with open(os.path.join(src, fname), "w", encoding="utf-8") as f:
        f.write(text)


def test_streaming_restore_drains_and_types(spark):
    src, sink, ckpt = _fresh("basic")
    _write(src, "t.0001.csv", "1,alpha,1.5\n2,beta,2.5\n")
    _write(src, "t.0002.csv", "3,gamma,3.5\n")
    sr = StreamingRestore(spark, parse_create_table(DDL), src, sink, ckpt)
    sr.run_until_complete()
    got = {
        r["id"]: (r["name"], r["v"]) for r in sr.result().collect()
    }
    assert got == {
        1: ("alpha", 1.5),
        2: ("beta", 2.5),
        3: ("gamma", 3.5),
    }
    # running ledger checksum == batch checksum over the final table
    assert sr.checksum() == checksum(sr.result())


def test_streaming_restore_picks_up_new_files(spark):
    src, sink, ckpt = _fresh("incremental")
    _write(src, "t.0001.csv", "1,a,1.0\n")
    sr = StreamingRestore(spark, parse_create_table(DDL), src, sink, ckpt)
    sr.run_until_complete()
    assert sr.result().count() == 1
    # new file arrives; a new drain consumes ONLY it (file-source
    # checkpoint = chunk checkpoint analog)
    _write(src, "t.0002.csv", "2,b,2.0\n")
    sr2 = StreamingRestore(spark, parse_create_table(DDL), src, sink, ckpt)
    sr2.run_until_complete()
    out = sr2.result()
    assert out.count() == 2
    assert {r["id"] for r in out.collect()} == {1, 2}
    assert sr2.checksum() == checksum(out)


def test_streaming_rowid_continuity_no_pk(spark):
    """_tidb_rowid stays dense 1..N across micro-batches and across
    stream restarts (AllocBase chaining via the ledger)."""
    src, sink, ckpt = _fresh("nopk")
    _write(src, "u.0001.csv", "a\nb\nc\n")
    schema = parse_create_table(DDL_NOPK)
    sr = StreamingRestore(spark, schema, src, sink, ckpt)
    sr.run_until_complete()
    _write(src, "u.0002.csv", "d\ne\n")
    sr2 = StreamingRestore(spark, schema, src, sink, ckpt)
    sr2.run_until_complete()
    rows = sr2.result().orderBy("_tidb_rowid").collect()
    assert [r["_tidb_rowid"] for r in rows] == [1, 2, 3, 4, 5]
    assert sorted(r["name"] for r in rows) == ["a", "b", "c", "d", "e"]


def test_streaming_replay_is_idempotent(spark):
    """A replayed micro-batch (crash between write and stream commit)
    reuses its row-id reservation and overwrites its own batch dir —
    table contents and checksum unchanged."""
    src, sink, ckpt = _fresh("replay")
    _write(src, "t.0001.csv", "1,a,1.0\n2,b,2.0\n")
    schema = parse_create_table(DDL)
    sr = StreamingRestore(spark, schema, src, sink, ckpt)
    sr.run_until_complete()
    before = sr.checksum()
    state = sr.ledger.load()
    # simulate foreachBatch replay of batch 0
    batch_df = (
        spark.read.schema("_c0 string, _c1 string, _c2 string")
        .option("encoding", "ISO-8859-1")
        .csv(src)
    )
    sr._process_batch(batch_df, 0)
    assert sr.ledger.load() == state
    assert sr.checksum() == before
    assert sr.result().count() == 2
    assert {r["id"] for r in sr.result().collect()} == {1, 2}


def test_streaming_restore_table_with_batch_column(spark):
    """A real column named `batch` must survive: the sink's partition
    dirs are namespaced (tlr4s_batch=N) to avoid the collision."""
    src, sink, ckpt = _fresh("batchcol")
    _write(src, "b.0001.csv", "1,7\n2,9\n")
    ddl = "create table b (id int primary key, batch int)"
    sr = StreamingRestore(spark, parse_create_table(ddl), src, sink, ckpt)
    sr.run_until_complete()
    got = {r["id"]: r["batch"] for r in sr.result().collect()}
    assert got == {1: 7, 2: 9}


def test_streaming_restore_jsonl_source(spark):
    """JSONL continuous restore: named-field micro-batches run the
    SAME cast ladder as CSV (values stream in as strings), pick up
    new files incrementally, and the running ledger checksum matches
    the batch checksum of the final table."""
    src, sink, ckpt = _fresh("jsonl")
    _write(
        src, "t.0001.jsonl",
        '{"id": 1, "name": "alpha", "v": 1.5}\n'
        '{"id": 2, "name": "beta", "v": 2.5}\n',
    )
    sr = StreamingRestore(
        spark, parse_create_table(DDL), src, sink, ckpt,
        source_format="jsonl",
    )
    sr.run_until_complete()
    got = {r["id"]: (r["name"], r["v"]) for r in sr.result().collect()}
    assert got == {1: ("alpha", 1.5), 2: ("beta", 2.5)}
    # non-ASCII text must survive (the JSON reader decodes real
    # UTF-8 — the latin1 re-decode path is CSV-only)
    _write(src, "t.0002.jsonl", '{"id": 3, "name": "caf\u00e9 \u4e2d", "v": 3.5}\n')
    sr2 = StreamingRestore(
        spark, parse_create_table(DDL), src, sink, ckpt,
        source_format="jsonl",
    )
    sr2.run_until_complete()
    got = {
        r["id"]: (r["name"], r["v"]) for r in sr2.result().collect()
    }
    assert got == {
        1: ("alpha", 1.5), 2: ("beta", 2.5), 3: ("caf\u00e9 \u4e2d", 3.5),
    }
    assert sr2.checksum() == checksum(sr2.result())


def test_streaming_jsonl_defaults_and_case_match_batch(spark):
    """Missing NOT NULL keys take column DEFAULTS and wrong-case keys
    resolve — identical to the batch JSONL path (v DOUBLE NOT NULL
    DEFAULT in DDL2)."""
    DDL2 = (
        "create table t (id int primary key, name varchar(20) not null,"
        " v double not null default '9.25')"
    )
    src, sink, ckpt = _fresh("jsonl_sem")
    _write(
        src, "t.0001.jsonl",
        '{"ID": 1, "Name": "a"}\n{"ID": 2, "Name": "b", "V": 2.0}\n',
    )
    sr = StreamingRestore(
        spark, parse_create_table(DDL2), src, sink, ckpt,
        source_format="jsonl",
    )
    sr.run_until_complete()
    got = {r["id"]: (r["name"], r["v"]) for r in sr.result().collect()}
    assert got == {1: ("a", 9.25), 2: ("b", 2.0)}
