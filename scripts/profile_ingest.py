"""Decompose one bench-identical CSV restore into driver-side phases.

Monkeypatches timing wrappers around the RestoreController phases and
the sink calls, runs the same lineitem-CSV restore bench.py times, and
prints a per-phase wall-time table for warm steady-state reps.

Usage: python scripts/profile_ingest.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp", "bench",
)

acc: dict[str, list[float]] = defaultdict(list)


def wrap(obj, name: str, label: str | None = None):
    fn = getattr(obj, name)
    lab = label or name

    def timed(*a, **kw):
        t0 = time.monotonic()
        try:
            return fn(*a, **kw)
        finally:
            acc[lab].append(time.monotonic() - t0)

    setattr(obj, name, timed)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from tidb_lightning_release_4_0_spark.session import get_spark
    from tidb_lightning_release_4_0_spark.config import (
        Config, MydumperConfig,
    )
    from tidb_lightning_release_4_0_spark.plans import pipeline as P
    from tidb_lightning_release_4_0_spark.sinks import parquet_sink as PS

    spark = get_spark(app_name="profile_ingest", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    dump_dir = os.path.join(TMP, "dump")
    sink_dir = os.path.join(TMP, "sink_profile")
    if not os.path.exists(os.path.join(dump_dir, ".complete")):
        print("run bench.py once first (needs .tmp/bench/dump)")
        return

    # phase wrappers (class-level: applies to every controller)
    for m in (
        "read_table", "_observe_write", "_restore_single",
        "_with_row_hash", "load_schemas", "restore_table",
    ):
        wrap(P.RestoreController, m)
    for m in ("write", "read_back", "analyze", "probe", "init_schema"):
        if hasattr(PS.ParquetSink, m):
            wrap(PS.ParquetSink, m, f"sink.{m}")

    cfg = Config(
        mydumper=MydumperConfig(source_dir=dump_dir),
        backend="parquet", target_dir=sink_dir,
        on_duplicate="physical", checkpoint_enable=False, checksum=True,
    )

    def restore() -> None:
        shutil.rmtree(cfg.target_dir, ignore_errors=True)
        s = P.RestoreController(spark, cfg).run()
        if not s.ok:
            raise RuntimeError(s.report())

    restore()  # warm-up (not recorded separately; drop below)
    for v in acc.values():
        v.clear()
    totals = []
    for _ in range(reps):
        t0 = time.monotonic()
        restore()
        totals.append(time.monotonic() - t0)

    print(f"\ntotals: {[round(t, 3) for t in totals]}")
    print(f"{'phase':28s} {'n':>3s} {'sum':>8s} {'per-rep':>8s}")
    for k, v in sorted(acc.items(), key=lambda kv: -sum(kv[1])):
        print(
            f"{k:28s} {len(v):3d} {sum(v):8.3f} {sum(v) / reps:8.3f}"
        )


if __name__ == "__main__":
    main()
