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


_LITTLE_ENDIAN = np.dtype("<u8") == np.dtype(np.uint64).newbyteorder("=")


def _crc_word_step(c: np.ndarray) -> np.ndarray:
    """One slice-by-8 update of a (k,) uint64 state ^ message-word
    array. On little-endian hosts the eight table indexes come from a
    plain byte VIEW of the xored words (r12 opt, guide §1.2: the
    previous shift/mask/astype chain allocated 24 temporaries per
    word step — 3 per table — and profiled at ~20% of the kv
    kernel); the view exposes byte k as the k-th least significant
    byte, exactly the (c >> 8k) & 0xFF the tables expect. Big-endian
    hosts keep the arithmetic formulation."""
    if _LITTLE_ENDIAN:
        cb = c.view(np.uint8).reshape(-1, 8)
        return (
            _T7[cb[:, 0]]
            ^ _T6[cb[:, 1]]
            ^ _T5[cb[:, 2]]
            ^ _T4[cb[:, 3]]
            ^ _T3[cb[:, 4]]
            ^ _T2[cb[:, 5]]
            ^ _T1[cb[:, 6]]
            ^ _T0[cb[:, 7]]
        )
    eight = np.uint64(8)
    mask = np.uint64(0xFF)
    return (
        _T7[(c & mask).astype(np.int64)]
        ^ _T6[((c >> eight) & mask).astype(np.int64)]
        ^ _T5[((c >> np.uint64(16)) & mask).astype(np.int64)]
        ^ _T4[((c >> np.uint64(24)) & mask).astype(np.int64)]
        ^ _T3[((c >> np.uint64(32)) & mask).astype(np.int64)]
        ^ _T2[((c >> np.uint64(40)) & mask).astype(np.int64)]
        ^ _T1[((c >> np.uint64(48)) & mask).astype(np.int64)]
        ^ _T0[(c >> np.uint64(56)).astype(np.int64)]
    )


def crc64_matrix(buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """CRC-64/XZ of each row of a zero-padded (n, pad8) uint8 matrix,
    where row i's message is buf[i, :lens[i]]. Returns uint64 crcs.
    The vectorized core shared by crc64_batch and the numpy KV
    checksum kernel (kv_codec_np). When every row is still active at
    word j (the common fixed-schema case: row lengths differ by a few
    varint bytes, so most word steps cover all rows) the state
    updates column-wise without the boolean-mask gather/scatter pair
    (r12 opt — the masked form copies the state and the word column
    on every step)."""
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
    n_act_all = int((nwords > 0).sum())  # rows active at word 0
    for j in range(int(nwords.max()) if n else 0):
        if n_act_all == n:
            # every row active: no mask gather/scatter
            crc = _crc_word_step(crc ^ words[:, j])
            n_act_all = int((nwords > j + 1).sum())
            continue
        act = nwords > j
        c = crc[act] ^ words[act, j]
        crc[act] = _crc_word_step(c)
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


def _crc64_hex_fold() -> str:
    """The CRC-64/XZ fold over __hx (a hex string) and __n (its byte
    count), both expected let-bound by the caller; returns a SIGNED
    BIGINT expression (int64-reinterpreted like the crc64 column)."""
    table = "[" + ",".join(
        f"{int(v)}::UBIGINT" for v in _T0
    ) + "]"
    step = (
        "xor(__t[((xor(__a, __x) & 255)::INT) + 1], __a >> 8)"
    )
    bytes_list = (
        "list_transform(range(0, __n), "
        "__k -> ('0x' || substr(__hx, 2*__k+1, 2))::UBIGINT)"
    )
    fold = (
        f"list_reduce(list_prepend(18446744073709551615::UBIGINT, "
        f"{bytes_list}), (__a, __x) -> {step})"
    )
    out = _xx_let(
        "__u", f"xor({fold}, 18446744073709551615::UBIGINT)",
        "(__u::HUGEINT - CASE WHEN __u >= 9223372036854775808::UBIGINT"
        f" THEN {_XX_M} ELSE 0::HUGEINT END)::BIGINT",
    )
    return _xx_let("__t", table, out)


def crc64_duckdb(expr: str) -> str:
    """DuckDB fragment computing the crc64 column function's value —
    CRC-64/XZ of the utf-8 bytes, reinterpreted as a SIGNED BIGINT —
    bit-identical with ``crc64``/``crc64_bytes``. A byte-wise
    table-driven fold: the 256-entry lookup table rides along as a
    list literal and ``list_reduce`` chains the per-byte step
    (same let-binding construction as ``xxhash64_duckdb``)."""
    return _xx_let(
        "__hx", f"hex(encode({expr}))",
        _xx_let(
            "__n", f"octet_length(encode({expr}))", _crc64_hex_fold()
        ),
    )


def crc64_hex_duckdb(hex_expr: str) -> str:
    """CRC-64/XZ of ARBITRARY bytes given as an (uppercase or
    lowercase) hex string — lets SQL-composed binary layouts (e.g.
    the independently-encoded TiKV KV bytes of the kv_crc64 twin) be
    checksummed without a BLOB type in the expression path."""
    return _xx_let(
        "__hx", hex_expr,
        _xx_let("__n", "length(__hx) // 2", _crc64_hex_fold()),
    )


# ---------------------------------------------------------------------------
# xxhash64 as a pure DuckDB SQL expression: lets the oracle reproduce
# Spark's PRODUCTION hash family (F.xxhash64 = XXH64 over the utf-8
# bytes, seed 42) bit-for-bit, so xxhash64-based operators get a real
# hash-checked twin instead of a rows-only fallback.
#
# Construction notes: DuckDB's UBIGINT << raises on overflow, so
# left shifts/rotates ride HUGEINT multiply-mod-2^64; 64x64 multiply
# splits into 32-bit halves (HUGEINT is 128-bit signed — a full
# 64x64 product would overflow it); a single-element list_transform
# acts as a let-binding so the byte-hex source string is computed
# once per sub-expression instead of once per reference. The whole
# thing is one scalar expression (no subqueries), so it composes
# inside list_transform lambdas like the md5-based hash60 does.
# ---------------------------------------------------------------------------

_XX_M = "18446744073709551616::HUGEINT"  # 2^64
_XX_P1 = "11400714785074694791::UBIGINT"
_XX_P2 = "14029467366897019727::UBIGINT"
_XX_P3 = "1609587929392839161::UBIGINT"
_XX_P4 = "9650029242287828579::UBIGINT"
_XX_P5 = "2870177450012600261::UBIGINT"


def _xx_let(name: str, value: str, body: str) -> str:
    return f"list_transform([{value}], {name} -> {body})[1]"


def _xx_add(a: str, b: str) -> str:
    return f"((({a})::HUGEINT + ({b})::HUGEINT) % {_XX_M})::UBIGINT"


def _xx_sub(a: str, b: str) -> str:
    return (
        f"((({a})::HUGEINT - ({b})::HUGEINT + {_XX_M}) % {_XX_M})::UBIGINT"
    )


def _xx_mul(a: str, b: str) -> str:
    return _xx_let("__ma", a, _xx_let("__mb", b, (
        "(((__ma & 4294967295)::HUGEINT * (__mb & 4294967295)::HUGEINT"
        " + ((((__ma >> 32)::HUGEINT * (__mb & 4294967295)::HUGEINT"
        "     + (__ma & 4294967295)::HUGEINT * (__mb >> 32)::HUGEINT)"
        "    % 4294967296::HUGEINT) * 4294967296::HUGEINT))"
        f" % {_XX_M})::UBIGINT"
    )))


def _xx_rotl(x: str, r: int) -> str:
    return _xx_let("__r", x, (
        f"(((__r::HUGEINT * {1 << r}::HUGEINT) % {_XX_M})::UBIGINT"
        f" | (__r >> {64 - r}))"
    ))


def _xx_byte(off: str) -> str:
    return f"('0x' || substr(__hx, 2*({off})+1, 2))::UBIGINT"


def _xx_word(off: str, nbytes: int) -> str:
    # little-endian word: reversed byte order parsed as one hex literal
    parts = " || ".join(
        f"substr(__hx, 2*(({off})+{b})+1, 2)"
        for b in range(nbytes - 1, -1, -1)
    )
    return f"('0x' || {parts})::UBIGINT"


def _xx_round(acc: str, lane: str) -> str:
    return _xx_mul(
        _xx_rotl(_xx_add(acc, _xx_mul(lane, _XX_P2)), 31), _XX_P1
    )


def _xx_merge(h: str, v: str) -> str:
    return _xx_add(
        _xx_mul(f"xor({h}, {_xx_round('0::UBIGINT', v)})", _XX_P1), _XX_P4
    )


def _xx_reduce(init: str, elems: str, step: str) -> str:
    # step uses __a (acc) and __x (element); prepend carries the init
    # through (list_reduce has no init parameter and rejects empties)
    return (
        f"list_reduce(list_prepend({init}, {elems}), (__a, __x) -> {step})"
    )


def xxhash64_duckdb(expr: str, seed: int = 42) -> str:
    """DuckDB fragment computing Spark's xxhash64({expr}) — XXH64 of
    the utf-8 bytes with seed 42 — as a SIGNED BIGINT, bit-identical
    with ``F.xxhash64`` on a string column. Validated against the
    reference XXH64 vectors and Spark itself in
    tests/test_xxhash64_duckdb.py."""
    sd = f"{seed}::UBIGINT"

    def lane(i: int, init: str) -> str:
        elems = (
            "list_transform(range(0, __n // 32), "
            f"__k -> {_xx_word(f'32*__k + {8 * i}', 8)})"
        )
        return _xx_reduce(init, elems, _xx_round("__a", "__x"))

    big = _xx_let(
        "__v1", lane(0, _xx_add(_xx_add(sd, _XX_P1), _XX_P2)),
        _xx_let(
            "__v2", lane(1, _xx_add(sd, _XX_P2)),
            _xx_let(
                "__v3", lane(2, sd),
                _xx_let(
                    "__v4", lane(3, _xx_sub(sd, _XX_P1)),
                    _xx_merge(_xx_merge(_xx_merge(_xx_merge(
                        _xx_add(
                            _xx_add(
                                _xx_rotl("__v1", 1), _xx_rotl("__v2", 7)
                            ),
                            _xx_add(
                                _xx_rotl("__v3", 12), _xx_rotl("__v4", 18)
                            ),
                        ),
                        "__v1"), "__v2"), "__v3"), "__v4"),
                ),
            ),
        ),
    )
    h = f"CASE WHEN __n >= 32 THEN {big} ELSE {_xx_add(sd, _XX_P5)} END"
    h = _xx_add(h, "__n::UBIGINT")
    tail8 = (
        "list_transform(range(0, (__n - (__n // 32) * 32) // 8), "
        f"__k -> {_xx_word('(__n // 32) * 32 + 8*__k', 8)})"
    )
    h = _xx_reduce(
        h, tail8,
        _xx_add(
            _xx_mul(
                _xx_rotl(
                    f"xor(__a, {_xx_round('0::UBIGINT', '__x')})", 27
                ),
                _XX_P1,
            ),
            _XX_P4,
        ),
    )
    h = _xx_let(
        "__h8", h,
        "CASE WHEN __n - (__n // 8) * 8 >= 4 THEN "
        + _xx_add(
            _xx_mul(
                _xx_rotl(
                    f"xor(__h8, {_xx_mul(_xx_word('(__n // 8) * 8', 4), _XX_P1)})",
                    23,
                ),
                _XX_P2,
            ),
            _XX_P3,
        )
        + " ELSE __h8 END",
    )
    tailb = (
        "list_transform(range(0, __n - (__n // 4) * 4), "
        f"__k -> {_xx_byte('(__n // 4) * 4 + __k')})"
    )
    h = _xx_reduce(
        h, tailb,
        _xx_mul(
            _xx_rotl(f"xor(__a, {_xx_mul('__x', _XX_P5)})", 11), _XX_P1
        ),
    )
    h = _xx_let("__z1", h, _xx_mul("xor(__z1, __z1 >> 33)", _XX_P2))
    h = _xx_let("__z2", h, _xx_mul("xor(__z2, __z2 >> 29)", _XX_P3))
    h = _xx_let("__z3", h, "xor(__z3, __z3 >> 32)")
    # reinterpret the uint64 as Spark's signed int64
    h = _xx_let(
        "__u", h,
        "(__u::HUGEINT - CASE WHEN __u >= 9223372036854775808::UBIGINT"
        f" THEN {_XX_M} ELSE 0::HUGEINT END)::BIGINT",
    )
    return _xx_let(
        "__hx", f"hex(encode({expr}))",
        _xx_let("__n", f"octet_length(encode({expr}))", h),
    )


def hash60_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant used to derive the MinHash function family."""
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat(F.lit(f"s{seed}:"), c.cast("string")))


def hash60_seeded_duckdb(expr: str, seed: int) -> str:
    return hash60_duckdb(f"('s{seed}:' || cast({expr} as varchar))")
