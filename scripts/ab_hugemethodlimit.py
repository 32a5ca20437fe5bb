"""One driver-shaped ingest-family bench run for the
spark.sql.codegen.hugeMethodLimit A/B (r12 directive #1).

Replicates bench.py's graded ingest section EXACTLY — same dump
rendering, same per-config untimed warm-up, same rep counts, same
fresh-JVM shape (one process = one SparkSession at
local[$SPARK_GRAFT_CPUS]) — and prints one JSON line with the median
and min seconds per config plus the loadavg samples. The conf under
test comes from $SPARK_GRAFT_HUGE_METHOD_LIMIT (session.py honors
it); an outer loop alternates 8000 / 65535 across fresh processes in
interleaved pairs so ambient drift cancels.

Usage:  SPARK_GRAFT_HUGE_METHOD_LIMIT=8000 python scripts/ab_hugemethodlimit.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")), 1)
IREPS = max(REPS, int(os.environ.get("SPARK_GRAFT_BENCH_INGEST_REPS", "5")))
TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp", "bench",
)


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    from tidb_lightning_release_4_0_spark.config import (
        Config,
        CSVConfig,
        MydumperConfig,
    )
    from tidb_lightning_release_4_0_spark.plans.pipeline import (
        RestoreController,
    )
    from tidb_lightning_release_4_0_spark.session import get_spark
    from tidb_lightning_release_4_0_spark.sources.dump_writer import (
        write_dump_table,
    )
    from tidb_lightning_release_4_0_spark.sources.testdata import load_table

    load0 = os.getloadavg()
    spark = get_spark(app_name="ab_hml", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    hml = spark.conf.get("spark.sql.codegen.hugeMethodLimit")

    dump_dir = os.path.join(TMP, "dump")
    sink_dir = os.path.join(TMP, "sink")
    marker = os.path.join(dump_dir, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(dump_dir, ignore_errors=True)
        li = load_table(spark, SF_DIR, "lineitem").toPandas()
        write_dump_table(
            dump_dir, "tpch", "lineitem", li,
            """CREATE TABLE lineitem (
              l_orderkey BIGINT NOT NULL, l_partkey BIGINT NOT NULL,
              l_suppkey BIGINT NOT NULL, l_linenumber INT NOT NULL,
              l_quantity DOUBLE NOT NULL, l_extendedprice DOUBLE NOT NULL,
              l_discount DOUBLE NOT NULL, l_tax DOUBLE NOT NULL,
              l_returnflag VARCHAR(1) NOT NULL,
              l_linestatus VARCHAR(1) NOT NULL,
              l_shipdate DATETIME NOT NULL)""",
            fmt="csv", parts=CPUS,
        )
        open(marker, "w").write("ok")
    src_bytes = sum(
        os.path.getsize(os.path.join(dump_dir, f))
        for f in os.listdir(dump_dir)
        if f.endswith(".csv")
    )

    def restore(cfg) -> None:
        shutil.rmtree(cfg.target_dir, ignore_errors=True)
        s = RestoreController(spark, cfg).run()
        if not s.ok:
            raise RuntimeError(s.report())

    results: dict = {}

    cfg = Config(
        mydumper=MydumperConfig(source_dir=dump_dir),
        backend="parquet", target_dir=sink_dir,
        on_duplicate="physical", checkpoint_enable=False, checksum=True,
    )
    restore(cfg)  # untimed warm-up, same as bench.py
    ts = [_timed(lambda: restore(cfg)) for _ in range(IREPS)]
    results["ingest_csv_lineitem"] = ts

    cfg_w = Config(
        mydumper=MydumperConfig(source_dir=dump_dir),
        backend="parquet", target_dir=sink_dir,
        on_duplicate="physical", checkpoint_enable=False, checksum=False,
        analyze=False,
    )
    restore(cfg_w)
    ts = [_timed(lambda: restore(cfg_w)) for _ in range(IREPS)]
    results["ingest_csv_writephase"] = ts

    big_dump = os.path.join(TMP, "dump4x")
    big_sink = os.path.join(TMP, "sink4x")
    if not os.path.exists(os.path.join(big_dump, ".complete")):
        raise SystemExit("run bench.py once first to render dump4x")
    big_bytes = sum(
        os.path.getsize(os.path.join(big_dump, f))
        for f in os.listdir(big_dump)
        if f.endswith(".csv")
    )
    cfg3 = Config(
        mydumper=MydumperConfig(source_dir=big_dump),
        backend="parquet", target_dir=big_sink,
        on_duplicate="physical", checkpoint_enable=False, checksum=True,
    )
    ts = [_timed(lambda: restore(cfg3)) for _ in range(IREPS)]
    results["ingest_csv_4x"] = ts

    one_dump = os.path.join(TMP, "dump1file")
    one_sink = os.path.join(TMP, "sink1file")
    if os.path.exists(os.path.join(one_dump, ".complete")):
        one_bytes = os.path.getsize(
            os.path.join(one_dump, "tpch.lineitem.csv")
        )
        cfg1f = Config(
            mydumper=MydumperConfig(
                source_dir=one_dump, csv=CSVConfig(strict_format=True)
            ),
            backend="parquet", target_dir=one_sink,
            on_duplicate="physical", checkpoint_enable=False,
            checksum=True,
        )
        old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        block = max(
            (one_bytes // (CPUS * 3 // 2)) // 1024 * 1024, 64 << 10
        )
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(block))
        try:
            restore(cfg1f)
            ts = [_timed(lambda: restore(cfg1f)) for _ in range(IREPS)]
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        results["ingest_csv_split1file"] = ts

    out = {
        "hugeMethodLimit": hml,
        "cpus": CPUS,
        "loadavg_start": [round(x, 2) for x in load0],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "per_config": {
            k: {
                "median": round(statistics.median(v), 3),
                "min": round(min(v), 3),
                "reps": [round(t, 3) for t in v],
            }
            for k, v in results.items()
        },
        "mib_per_sec_best": {
            "ingest_csv_lineitem": round(
                src_bytes / min(results["ingest_csv_lineitem"]) / (1 << 20),
                2,
            ),
            "ingest_csv_4x": round(
                big_bytes / min(results["ingest_csv_4x"]) / (1 << 20), 2
            ),
        },
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
