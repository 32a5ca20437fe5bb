"""Render DataFrames into mydumper-layout dumps (test/bench utility).

Produces the reference's file naming convention
(lightning/mydump/loader.go:161-166):

    {db}-schema-create.sql
    {db}.{table}-schema.sql
    {db}.{table}.{part}.csv | .sql

Used to build ingest fixtures and the bench corpus from the driver's
parquet testdata; NOT part of the restore path itself (mydumper is
the producer in real deployments).
"""

from __future__ import annotations

import os

import pandas as pd
import numpy as np


def _sql_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
        .replace("\0", "\\0")
    )


def _csv_field(v, null: str = "\\N") -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return null
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.decode("latin-1")
    s = str(v)
    if any(c in s for c in (",", '"', "\n", "\r", "\\")):
        s = s.replace("\\", "\\\\").replace('"', '\\"')
        return f'"{s}"'
    return s


def _sql_literal(v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, bytes):
        return "x'" + v.hex() + "'"
    return "'" + _sql_escape(str(v)) + "'"


def _norm_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f").str.replace(
                r"\.?0+$", "", regex=True
            )
        else:
            pdf[c] = pdf[c].astype(object).where(pd.notna(pdf[c]), None)
    return pdf


def write_dump_table(
    out_dir: str,
    db: str,
    table: str,
    pdf: pd.DataFrame,
    ddl: str,
    fmt: str = "csv",
    parts: int = 1,
    with_header: bool = False,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    create_db = os.path.join(out_dir, f"{db}-schema-create.sql")
    if not os.path.exists(create_db):
        with open(create_db, "w") as f:
            f.write(f"CREATE DATABASE IF NOT EXISTS `{db}`;\n")
    with open(os.path.join(out_dir, f"{db}.{table}-schema.sql"), "w") as f:
        f.write(ddl.rstrip().rstrip(";") + ";\n")

    pdf = _norm_pdf(pdf)
    chunks = np.array_split(np.arange(len(pdf)), max(parts, 1))
    for pi, idx in enumerate(chunks):
        part = pdf.iloc[idx]
        suffix = f".{pi:04d}" if parts > 1 else ""
        path = os.path.join(out_dir, f"{db}.{table}{suffix}.{fmt}")
        if fmt == "csv":
            with open(path, "w", newline="") as f:
                if with_header:
                    f.write(",".join(part.columns) + "\n")
                for row in part.itertuples(index=False, name=None):
                    f.write(",".join(_csv_field(v) for v in row) + "\n")
        else:  # mydumper .sql
            with open(path, "w") as f:
                f.write(f"/*!40101 SET NAMES binary*/;\n")
                rows = list(part.itertuples(index=False, name=None))
                for i in range(0, len(rows), 200):
                    batch = rows[i : i + 200]
                    tuples = ",\n".join(
                        "(" + ",".join(_sql_literal(v) for v in row) + ")"
                        for row in batch
                    )
                    f.write(f"INSERT INTO `{table}` VALUES\n{tuples};\n")
