"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
tables and compares row count, column names, and an order-insensitive
value hash — so every queries()/oracle_sql() pair can be validated in
pytest before the driver sees it.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        # repr() is the shortest exact round-trip rendering — full
        # double fidelity. Integral floats are NOT collapsed to int:
        # the driver hashes the pandas rendering, so a DuckDB HUGEINT
        # sum landing as float64 ("1764.0") must mismatch an int64
        # ("1764") HERE first (the r5 priority_lines escape), and a
        # 7th-significant-digit divergence must not be masked by %.6g
        # (the r5 promo_share escape).
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, np.generic):
        return _norm_cell(v.item())
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Replica of the driver's canonicalization: sort by every column.

    This is intentionally stricter than normalize(): list/ndarray
    cells make pandas lexsort raise (unhashable type) exactly like
    the driver did on multimodal_features in round 1 — so any
    array-typed result column fails HERE, in pytest, first.
    """
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols).reset_index(drop=True)


def check_rows_only(spark_df) -> pd.DataFrame:
    """Validate a no-oracle query the way the driver does: it must
    collect and survive driver-style canonicalization."""
    sp = spark_df.toPandas()
    return driver_canon(sp)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert spark result == duckdb oracle result (order-insensitive)."""
    sp = spark_df.toPandas()
    driver_canon(sp)  # must never raise (driver sorts result cells)
    con = duck_con(sf_dir)
    du = con.execute(oracle_sql).fetchdf()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"row count: spark={len(sp)} duck={len(du)}"
    nsp, ndu = normalize(sp), normalize(du)
    mismatches = [
        (a, b) for a, b in zip(nsp, ndu) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
