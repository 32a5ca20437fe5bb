"""Adversarial oracle sweep: run EVERY registry query against its
DuckDB twin at an arbitrary scale factor — including scales the
driver and the local gate never exercise (sf0.001 hits degenerate
corpora: near-empty groups, rounding half-way boundaries, dried-up
BPE merges). Queries without a twin just execute (crash check).

Usage:
    python scripts/sweep_oracles.py [sf_dir ...]
        default: /root/testdata/sf0.001

The pca_embeddings twin is generated against
$SPARK_GRAFT_ORACLE_SF_DIR (driver default sf0.01), so when sweeping
another dir this script re-exports that env var to match — set it
explicitly to observe the mismatch instead.

Round-6 provenance: this sweep found the dsir_select_docs half-way
rounding flip (round-after-double-cast) that all sf0.01 checks
missed. Round 7 closed the remaining residual: the per-bucket delta
is now quantized via floor(x*1e9 + 0.5) into int64 units (floor on a
binary double is bit-deterministic across engines, unlike
round(double, 9)) and the final 4-decimal round runs in exact
integer space — zero accepted residuals remain at any swept scale.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001"]
    if "SPARK_GRAFT_ORACLE_SF_DIR" not in os.environ and len(dirs) == 1:
        # generated twins (pca) must target the swept corpus
        os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = dirs[0]

    from tidb_lightning_release_4_0_spark.session import get_spark

    import __spark_entry__ as entry
    from tests.oracle import compare

    spark = get_spark(app_name="oracle-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    rc = 0
    for sf in dirs:
        fail, err = [], []
        for i, name in enumerate(qs):
            try:
                if name in osql:
                    compare(qs[name](spark, sf), osql[name], sf)
                else:
                    qs[name](spark, sf).count()
            except AssertionError as ex:
                fail.append(name)
                print(f"MISMATCH {name}: {str(ex)[:200]}", flush=True)
            except Exception as ex:  # noqa: BLE001 - report and continue
                err.append(name)
                print(
                    f"ERROR {name}: {type(ex).__name__} {str(ex)[:200]}",
                    flush=True,
                )
            if (i + 1) % 25 == 0:
                print(f"... {i + 1}/{len(qs)} @ {sf}", flush=True)
        print(f"{sf}: {len(qs)} swept, mismatches={fail} errors={err}")
        rc |= 1 if (fail or err) else 0
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
