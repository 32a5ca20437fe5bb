"""Corpus-size scale bench: full-pipeline restore throughput at an
N-times replicated sf0.1 lineitem corpus.

The grading driver benches at sf0.1 (37 MiB of lineitem CSV), where
fixed per-job costs dominate; the 100 TB design argument needs the
throughput CURVE, not one point. This harness replicates the same
dump N times (hardlinks, distinct part ids so the scanner maps every
copy to the one table — the same trick as bench.py's 4x config) and
times the identical full restore (parse -> cast -> rowid ->
write+observe -> checksum verification). N=10 puts the corpus at
~373 MiB, the lineitem CSV volume of TPC-H sf1 — one order of
magnitude above the graded point.

Usage:  python scripts/bench_scale.py [N ...]   (default: 1 4 10 16)

Prints ONE JSON line:
  {"metric": "ingest_scale_curve", "unit": "MiB/s",
   "points": {"1x": {...}, "10x": {...}}, "sf": 0.1, "reps": R}

Results are recorded in docs/SCALE.md; run uncontended (this box has
multi-x variance under concurrent load).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")), 1)
TMP = os.path.join(REPO, ".tmp", "bench_scale")


def build_dump(spark, base_dump: str) -> None:
    """Render sf0.1 lineitem to mydumper CSV layout once (the same
    dump bench.py uses, rebuilt here so the harness stands alone)."""
    from tidb_lightning_release_4_0_spark.sources.dump_writer import (
        write_dump_table,
    )
    from tidb_lightning_release_4_0_spark.sources.testdata import load_table

    marker = os.path.join(base_dump, ".complete")
    if os.path.exists(marker):
        return
    shutil.rmtree(base_dump, ignore_errors=True)
    li = load_table(spark, SF_DIR, "lineitem").toPandas()
    write_dump_table(
        base_dump, "tpch", "lineitem", li,
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


def replicate(base_dump: str, n: int) -> str:
    """Hardlink the base dump n times under distinct part ids."""
    if n == 1:
        return base_dump
    out = os.path.join(TMP, f"dump{n}x")
    marker = os.path.join(out, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)
        for f in glob.glob(os.path.join(base_dump, "*")):
            base = os.path.basename(f)
            if base.endswith(".csv"):
                stem, part = base[: -len(".csv")].rsplit(".", 1)
                for rep in range(n):
                    os.link(
                        f, os.path.join(out, f"{stem}.{rep:02d}{part}.csv")
                    )
            elif base != ".complete":
                shutil.copy(f, os.path.join(out, base))
        open(marker, "w").write("ok")
    return out


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 10, 16]
    from tidb_lightning_release_4_0_spark.config import (
        Config,
        MydumperConfig,
    )
    from tidb_lightning_release_4_0_spark.plans.pipeline import (
        RestoreController,
    )
    from tidb_lightning_release_4_0_spark.session import get_spark

    spark = get_spark(app_name="bench-scale", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    base_dump = os.path.join(TMP, "dump1x")
    build_dump(spark, base_dump)

    points: dict[str, dict] = {}
    for n in ns:
        dump = replicate(base_dump, n)
        nbytes = sum(
            os.path.getsize(os.path.join(dump, f))
            for f in os.listdir(dump)
            if f.endswith(".csv")
        )
        sink = os.path.join(TMP, f"sink{n}x")
        cfg = Config(
            mydumper=MydumperConfig(source_dir=dump),
            backend="parquet", target_dir=sink,
            on_duplicate="physical", checkpoint_enable=False,
            checksum=True,
        )

        def restore() -> None:
            shutil.rmtree(sink, ignore_errors=True)
            s = RestoreController(spark, cfg).run()
            if not s.ok:
                raise RuntimeError(s.report())

        restore()  # untimed warm-up per corpus size (new plan shape)
        ts = []
        for _ in range(REPS):
            t0 = time.monotonic()
            restore()
            ts.append(time.monotonic() - t0)
        med = statistics.median(ts)
        points[f"{n}x"] = {
            "mib": round(nbytes / (1 << 20), 1),
            "sec_med": round(med, 3),
            "sec_min": round(min(ts), 3),
            "mib_per_sec": round(nbytes / med / (1 << 20), 2),
            "mib_per_sec_best": round(nbytes / min(ts) / (1 << 20), 2),
        }
        print(f"# {n}x: {points[f'{n}x']}", file=sys.stderr)
        shutil.rmtree(sink, ignore_errors=True)

    print(json.dumps({
        "metric": "ingest_scale_curve", "unit": "MiB/s",
        "points": points, "sf": 0.1, "reps": REPS, "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
