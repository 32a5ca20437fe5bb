"""Hash kernels used across checksum / dedup / similarity operators.

Two families:

1. ``crc64_ecma`` — bit-exact port of the checksum polynomial the
   reference uses (Go ``crc64.MakeTable(crc64.ECMA)``, i.e.
   CRC-64/XZ; lightning/verification/checksum.go:25-44 feeds
   key||value through it). Implemented as a slice-by-8 table kernel
   over numpy inside an Arrow-batched pandas UDF. This is the
   *parity* path; it exists so a user of the reference can reproduce
   its checksum numbers.

2. ``hash60`` — a portable 60-bit hash (top 15 hex chars of md5,
   parsed as an integer). Evaluated JVM-side by Spark built-ins
   (md5 + conv), and expressible in ANSI SQL for any oracle engine,
   which makes every operator built on it (checksum aggregate,
   MinHash, SimHash) independently verifiable. This is the *scale*
   path: md5/conv run inside whole-stage codegen, no Python exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# ---------------------------------------------------------------------------
# crc64-ecma (CRC-64/XZ): poly 0x42F0E1EBA9EA3693 reflected, init/xorout ~0.
# Check value: crc64("123456789") == 0x995DC9BBDF1939FA.
# ---------------------------------------------------------------------------

_POLY = np.uint64(0xC96C5795D7870F42)  # reflected ECMA-182 polynomial


def _make_tables() -> np.ndarray:
    """Slice-by-8 lookup tables, shape (8, 256), dtype uint64.

    Fully vectorized — this runs at import time in every Python
    worker, so scalar numpy loops here would tax task startup."""
    tables = np.zeros((8, 256), dtype=np.uint64)
    crc = np.arange(256, dtype=np.uint64)
    for _ in range(8):
        crc = (crc >> np.uint64(1)) ^ np.where(
            crc & np.uint64(1), _POLY, np.uint64(0)
        ).astype(np.uint64)
    tables[0] = crc
    for t in range(1, 8):
        prev = tables[t - 1]
        tables[t] = (prev >> np.uint64(8)) ^ tables[0][
            (prev & np.uint64(0xFF)).astype(np.int64)
        ]
    return tables


_TABLES = _make_tables()
_T0, _T1, _T2, _T3, _T4, _T5, _T6, _T7 = (_TABLES[i] for i in range(8))


def crc64_batch(values: list[bytes | None]) -> np.ndarray:
    """CRC-64/XZ of a BATCH of byte strings, vectorized across rows.

    The CRC chain is sequential WITHIN a row, so vectorization runs
    across the batch: rows are padded into an (n, maxlen) byte
    matrix, and each slice-by-8 step updates every still-active
    row's state with one set of numpy table lookups — O(maxlen/8)
    vectorized operations per batch instead of a Python-level loop
    per row. None rows yield 0 (the XOR identity).
    """
    n = len(values)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.int64)
    lens = np.array([0 if v is None else len(v) for v in values], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    pad = (maxlen + 7) // 8 * 8
    buf = np.zeros((n, max(pad, 8)), dtype=np.uint8)
    for i, v in enumerate(values):
        if v:
            buf[i, : len(v)] = np.frombuffer(v, dtype=np.uint8)
    crc = crc64_matrix(buf, lens)
    none_mask = np.array([v is None for v in values])
    crc[none_mask] = 0
    return crc.view(np.int64)


def crc64_matrix(buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """CRC-64/XZ of each row of a zero-padded (n, pad8) uint8 matrix,
    where row i's message is buf[i, :lens[i]]. Returns uint64 crcs.
    The vectorized core shared by crc64_batch and the numpy KV
    checksum kernel (kv_codec_np)."""
    n = len(lens)
    if buf.shape[1] % 8:  # pad to a whole number of u64 words
        buf = np.ascontiguousarray(
            np.pad(buf, ((0, 0), (0, 8 - buf.shape[1] % 8)))
        )
    if not buf.flags["C_CONTIGUOUS"]:
        buf = np.ascontiguousarray(buf)
    words = buf.view("<u8")  # (n, pad//8) little-endian words
    crc = np.full(n, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    nwords = lens // 8
    eight = np.uint64(8)
    mask = np.uint64(0xFF)
    for j in range(int(nwords.max()) if n else 0):
        act = nwords > j
        c = crc[act] ^ words[act, j]
        crc[act] = (
            _T7[(c & mask).astype(np.int64)]
            ^ _T6[((c >> eight) & mask).astype(np.int64)]
            ^ _T5[((c >> np.uint64(16)) & mask).astype(np.int64)]
            ^ _T4[((c >> np.uint64(24)) & mask).astype(np.int64)]
            ^ _T3[((c >> np.uint64(32)) & mask).astype(np.int64)]
            ^ _T2[((c >> np.uint64(40)) & mask).astype(np.int64)]
            ^ _T1[((c >> np.uint64(48)) & mask).astype(np.int64)]
            ^ _T0[(c >> np.uint64(56)).astype(np.int64)]
        )
    tails = lens % 8
    rowsel = np.arange(n)
    for k in range(7):
        act = tails > k
        if not act.any():
            break
        pos = (nwords * 8 + k)[act]
        b = buf[rowsel[act], pos].astype(np.uint64)
        c = crc[act]
        crc[act] = _T0[((c ^ b) & mask).astype(np.int64)] ^ (c >> eight)
    crc ^= np.uint64(0xFFFFFFFFFFFFFFFF)
    return crc


def crc64_bytes(data: bytes) -> int:
    """CRC-64/XZ of one byte string (slice-by-8)."""
    crc = np.uint64(0xFFFFFFFFFFFFFFFF)
    buf = np.frombuffer(data, dtype=np.uint8)
    n8 = len(buf) // 8 * 8
    eight = np.uint64(8)
    mask = np.uint64(0xFF)
    i = 0
    while i < n8:
        crc ^= np.uint64(
            int(buf[i])
            | (int(buf[i + 1]) << 8)
            | (int(buf[i + 2]) << 16)
            | (int(buf[i + 3]) << 24)
            | (int(buf[i + 4]) << 32)
            | (int(buf[i + 5]) << 40)
            | (int(buf[i + 6]) << 48)
            | (int(buf[i + 7]) << 56)
        )
        crc = (
            _T7[int(crc & mask)]
            ^ _T6[int((crc >> eight) & mask)]
            ^ _T5[int((crc >> np.uint64(16)) & mask)]
            ^ _T4[int((crc >> np.uint64(24)) & mask)]
            ^ _T3[int((crc >> np.uint64(32)) & mask)]
            ^ _T2[int((crc >> np.uint64(40)) & mask)]
            ^ _T1[int((crc >> np.uint64(48)) & mask)]
            ^ _T0[int(crc >> np.uint64(56))]
        )
        i += 8
    for b in buf[n8:]:
        crc = _T0[int((crc ^ np.uint64(b)) & mask)] ^ (crc >> eight)
    return int(crc ^ np.uint64(0xFFFFFFFFFFFFFFFF))


@pandas_udf(LongType())
def crc64_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched crc64-ecma over a string/binary column.

    Returns the CRC reinterpreted as a signed 64-bit long (Spark has
    no unsigned type); XOR-aggregation semantics are unaffected.
    """
    vals = [
        None
        if v is None
        else (v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8"))
        for v in s
    ]
    return pd.Series(crc64_batch(vals))


def crc64(col: Column | str) -> Column:
    """crc64-ecma of a column, as a signed long."""
    c = F.col(col) if isinstance(col, str) else col
    return crc64_udf(c)


# ---------------------------------------------------------------------------
# hash60: portable md5-prefix hash (JVM-side in Spark, ANSI-SQL oracle form)
# ---------------------------------------------------------------------------


def hash60(col: Column | str) -> Column:
    """60-bit hash of a string column, computed by Spark built-ins."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """Spark-SQL fragment for hash60 (for use inside spark.sql strings)."""
    return f"cast(conv(substr(md5(cast({expr} as string)),1,15),16,10) as bigint)"


def hash60_duckdb(expr: str) -> str:
    """DuckDB/ANSI fragment computing the identical hash60 value."""
    return f"(('0x' || substr(md5(cast({expr} as varchar)),1,15))::BIGINT)"


def hash60_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant used to derive the MinHash function family."""
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat(F.lit(f"s{seed}:"), c.cast("string")))


def hash60_seeded_duckdb(expr: str, seed: int) -> str:
    return hash60_duckdb(f"('s{seed}:' || cast({expr} as varchar))")
