"""C1/C2/C3 checksum aggregate: known vectors, parity, oracle match."""

from __future__ import annotations

import pytest

from tidb_lightning_release_4_0_spark.functions.hashing import crc64_bytes
from tidb_lightning_release_4_0_spark.functions.checksum import (
    Checksum,
    checksum,
    checksum_df,
    checksum_oracle_sql,
    verify_checksum,
)
from tests.oracle import compare

LINEITEM_DUCK_TYPES = [
    ("l_orderkey", "BIGINT"),
    ("l_partkey", "BIGINT"),
    ("l_suppkey", "BIGINT"),
    ("l_linenumber", "INTEGER"),
    ("l_quantity", "DOUBLE"),
    ("l_extendedprice", "DOUBLE"),
    ("l_discount", "DOUBLE"),
    ("l_tax", "DOUBLE"),
    ("l_returnflag", "VARCHAR"),
    ("l_linestatus", "VARCHAR"),
    ("l_shipdate", "TIMESTAMP"),
]


def test_crc64_check_value():
    # CRC-64/XZ check value, same as Go crc64.ECMA table the reference
    # uses (lightning/verification/checksum.go:37).
    assert crc64_bytes(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64_bytes(b"") == 0


def test_crc64_not_linear():
    a, b = crc64_bytes(b"hello"), crc64_bytes(b"world")
    assert a != b
    assert crc64_bytes(b"helloworld") not in (a ^ b, a + b)


def test_checksum_monoid():
    a = Checksum(0b1010, 10, 2)
    b = Checksum(0b0110, 5, 1)
    assert a.add(b) == Checksum(0b1100, 15, 3)
    assert a.add(b) == b.add(a)


def test_checksum_lineitem_matches_oracle(tables, sf_dir):
    df = checksum_df(tables["lineitem"])
    compare(df, checksum_oracle_sql("lineitem", LINEITEM_DUCK_TYPES), sf_dir)


def test_checksum_partition_invariant(tables):
    """XOR-combine is order/partitioning independent."""
    li = tables["lineitem"]
    c1 = checksum(li)
    c2 = checksum(li.repartition(13))
    assert c1 == c2
    assert c1.total_kvs == li.count()


def test_verify_checksum_roundtrip(tables):
    li = tables["lineitem"].limit(100).cache()
    local = checksum(li)
    verify_checksum(local, li)  # same data -> ok
    with pytest.raises(ValueError, match="checksum mismatched"):
        verify_checksum(local, li.limit(99))


def test_checksum_crc64_backend(tables):
    li = tables["lineitem"].limit(50)
    c = checksum(li, algo="crc64")
    assert c.total_kvs == 50
    assert c.crc_xor != 0
