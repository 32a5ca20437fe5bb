"""Kernel A/B for the kv_crc64 datum paths (round-10 done-bar for
VERDICT r9 missing #3): time kv_hash_columns over a 100k-row frame
for each column shape, numpy vs python kernel, and compare the JSON
worst cases against the all-scalar kernel baseline.

Shapes:
- scalar      : one BIGINT column (the all-scalar kernel baseline)
- json_scalar : all-DISTINCT scalar JSON texts (ints/floats/strings/
                literals round-robin) — the r10 vectorized tier
- json_flat   : all-DISTINCT flat scalar-only objects (the vt.json
                object shape) — tier 2 (json.loads + binary build)
- json_repeat : heavy-repeat objects — the r9 memo path

Usage: python scripts/ab_kv_kernels.py   (prints one JSON line; best
of 3 per cell, byte-parity asserted between kernels on every shape)
Run uncontended.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("AB_ROWS", "100000"))
REPS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        kv_hash_columns,
    )
    from tidb_lightning_release_4_0_spark.session import get_spark

    spark = get_spark(app_name="ab_kv_kernels", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(N).select(
        F.col("id").alias("h"),
        (F.col("id") * 37 + 11).alias("v_scalar"),
        # all-distinct scalar JSON: round-robin int / float / string /
        # literal so every tier-1 class carries weight
        F.when(F.col("id") % 4 == 0, (F.col("id") * 13).cast("string"))
        .when(
            F.col("id") % 4 == 1,
            F.concat(F.col("id").cast("string"), F.lit(".5e2")),
        )
        .when(
            F.col("id") % 4 == 2,
            F.concat(F.lit('"doc'), F.col("id").cast("string"), F.lit('"')),
        )
        .otherwise(F.when(F.col("id") % 8 == 3, F.lit("true")).otherwise(F.lit("null")))
        .alias("v_json_scalar"),
        # all-distinct flat scalar-only objects (vt.json object shape)
        F.concat(
            F.lit('{"a": '),
            F.col("id").cast("string"),
            F.lit(', "b": "s'),
            F.col("id").cast("string"),
            F.lit('", "c": '),
            (F.col("id") % 97).cast("string"),
            F.lit(".25}"),
        ).alias("v_json_flat"),
        # heavy repeats (97 distinct objects): the memo path
        F.concat(
            F.lit('{"k": '),
            (F.col("id") % 97).cast("string"),
            F.lit("}"),
        ).alias("v_json_repeat"),
    ).cache()
    base.count()

    shapes = {
        "scalar": ("v_scalar", None),
        "json_scalar": ("v_json_scalar", ("json",)),
        "json_flat": ("v_json_flat", ("json",)),
        "json_repeat": ("v_json_repeat", ("json",)),
    }
    out: dict = {"rows": N, "reps": REPS}
    parity: dict = {}
    for shape, (col, kind) in shapes.items():
        mk = {col: kind} if kind else None
        cell: dict = {}
        for kernel in ("numpy", "python"):
            pair = kv_hash_columns(
                base, [col], "h", col_ids=[2], table_id=41,
                mysql_kinds=mk, kernel=kernel,
            )
            agg = lambda: base.withColumn("_p", pair).agg(  # noqa: E731
                F.bit_xor("_p.h"), F.sum("_p.n")
            ).first()
            parity.setdefault(shape, {})[kernel] = tuple(agg())  # warm
            ts = []
            for _ in range(REPS):
                t0 = time.monotonic()
                agg()
                ts.append(time.monotonic() - t0)
            cell[kernel] = round(min(ts), 3)
        assert parity[shape]["numpy"] == parity[shape]["python"], (
            shape, parity[shape],
        )
        cell["speedup_vs_python"] = round(
            cell["python"] / cell["numpy"], 2
        )
        out[shape] = cell
    for shape in ("json_scalar", "json_flat", "json_repeat"):
        out[shape]["vs_all_scalar_kernel"] = round(
            out[shape]["numpy"] / out["scalar"]["numpy"], 2
        )
    out["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
