"""xxhash64_duckdb must reproduce Spark's F.xxhash64 bit-for-bit:
checked against a pure-Python XXH64 reference (validated here
against Spark itself) over every tail-length class and a randomized
unicode sweep.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from tidb_lightning_release_4_0_spark.functions.hashing import (
    xxhash64_duckdb,
)

_M = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    11400714785074694791, 14029467366897019727, 1609587929392839161,
    9650029242287828579, 2870177450012600261,
)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc, lane):
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v = [
            (seed + _P1 + _P2) & _M, (seed + _P2) & _M,
            seed, (seed - _P1) & _M,
        ]
        while i + 32 <= n:
            for j in range(4):
                v[j] = _round(
                    v[j], int.from_bytes(data[i:i + 8], "little")
                )
                i += 8
        h = (
            _rotl(v[0], 1) + _rotl(v[1], 7)
            + _rotl(v[2], 12) + _rotl(v[3], 18)
        ) & _M
        for j in range(4):
            h = ((h ^ _round(0, v[j])) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (
            _rotl(h ^ _round(0, int.from_bytes(data[i:i + 8], "little")), 27)
            * _P1 + _P4
        ) & _M
        i += 8
    if i + 4 <= n:
        h = (
            _rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * _P1) & _M, 23)
            * _P2 + _P3
        ) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def _cases():
    rng = np.random.default_rng(3)
    fixed = [
        "", "a", "ab", "abc", "abcd", "abcde", "1234567", "12345678",
        "123456789", "123456789012", "héllo wörld ☃", "x" * 31,
        "y" * 32, "z" * 33, "q" * 39, "w" * 40, "v" * 63, "u" * 64,
        "t" * 100, "s" * 129, "\x00\x01\x02", "naïve🎉",
    ]
    rand = [
        "".join(chr(rng.integers(1, 0x500)) for _ in range(rng.integers(0, 90)))
        for _ in range(60)
    ]
    return fixed + rand


def test_reference_matches_spark(spark):
    cases = _cases()
    df = spark.createDataFrame([(s,) for s in cases], "s STRING")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in cases:
        assert got[s] == _signed(_xxh64(s.encode("utf-8"))), repr(s)


def test_duckdb_expr_matches_reference():
    cases = _cases()
    con = duckdb.connect()
    sql = xxhash64_duckdb("s")
    rows = con.execute(
        f"SELECT s, {sql} AS h FROM (SELECT unnest(?) AS s)", [cases]
    ).fetchall()
    assert len(rows) == len(cases)
    for s, h in rows:
        assert int(h) == _signed(_xxh64(s.encode("utf-8"))), repr(s)


def test_duckdb_expr_composes_in_lambda():
    # the minhash twin evaluates the hash inside list_transform — the
    # expression must be subquery-free and lambda-composable
    con = duckdb.connect()
    sql = xxhash64_duckdb("x")
    got = con.execute(
        f"SELECT list_transform(['ab', 'cd'], x -> {sql})"
    ).fetchall()[0][0]
    assert got == [
        _signed(_xxh64(b"ab")), _signed(_xxh64(b"cd"))
    ]


def test_crc64_duckdb_matches_kernel():
    from tidb_lightning_release_4_0_spark.functions.hashing import (
        crc64_bytes,
        crc64_duckdb,
    )

    cases = _cases()
    con = duckdb.connect()
    sql = crc64_duckdb("s")
    rows = con.execute(
        f"SELECT s, {sql} AS h FROM (SELECT unnest(?) AS s)", [cases]
    ).fetchall()
    for s, h in rows:
        assert int(h) == _signed(crc64_bytes(s.encode("utf-8"))), repr(s)


def test_duckdb_expr_null_propagates():
    con = duckdb.connect()
    sql = xxhash64_duckdb("s")
    got = con.execute(
        f"SELECT {sql} FROM (SELECT NULL::VARCHAR AS s)"
    ).fetchall()[0][0]
    assert got is None
