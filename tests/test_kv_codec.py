"""Byte-exact goldens for the TiKV row-KV codec (T6) and the KV
checksum (C1), pinned to the reference's own test fixtures:

- lightning/backend/sql2kv_test.go:105-130 (v1 rows + record key),
  :159-172 (row format v2), :202-208 (packed datetime)
- lightning/verification/checksum_test.go:52-72 (crc64 XOR monoid
  over KV pairs)
"""

import datetime as dt

from tidb_lightning_release_4_0_spark.functions.kv_codec import (
    encode_record,
    encode_row_v1,
    encode_row_v2,
    pack_datetime,
    record_key,
)
from tidb_lightning_release_4_0_spark.functions.hashing import crc64_bytes


GOLD_KEY = bytes(
    [0x74, 0x80, 0, 0, 0, 0, 0, 0, 0x1, 0x5F, 0x72, 0x80, 0, 0, 0, 0, 0, 0, 0x1]
)


def test_record_key_golden():
    # sql2kv_test.go:105 — table id 1, handle 1
    assert record_key(1, 1) == GOLD_KEY
    # TestEncodeTimestamp uses handle 70 (0x46)
    assert record_key(1, 70)[-1] == 0x46


def test_row_v1_int_golden():
    # sql2kv_test.go:105-110 — column id 1, TINYINT value 1
    key, val = encode_record(1, 1, [1], [1], row_format_version=1)
    assert key == GOLD_KEY
    assert val == bytes([0x8, 0x2, 0x8, 0x2])


def test_row_v1_clamped_tiny_golden():
    # sql2kv_test.go:125-130 — non-strict mode clamps 10000000 to the
    # TINYINT max 127; the encoder receives the already-cast 127
    # (the cast layer is T3's job, the codec encodes datums)
    assert encode_row_v1([1], [127]) == bytes([0x8, 0x2, 0x8, 0xFE, 0x1])


def test_row_v2_golden():
    # sql2kv_test.go:159-172
    assert encode_row_v2([1], [127]) == bytes(
        [0x80, 0x0, 0x1, 0x0, 0x0, 0x0, 0x1, 0x1, 0x0, 0x7F]
    )


def test_row_v1_timestamp_golden():
    # sql2kv_test.go:202-208 — DATETIME datum, row format v1. The
    # fixture bytes decode to wall-clock 2009-02-14 07:31:30: the
    # reference generated them under a UTC+8 session timezone with
    # the suite's FIRST session timestamp (1234567890 — the mock
    # session is shared across that file's encoders). The codec's
    # contract is "encode a given local datetime"; timezone and
    # default-fill policy are the cast layer's job (T3/T4).
    val = encode_row_v1([1], [dt.datetime(2009, 2, 14, 7, 31, 30)])
    assert val == bytes(
        [0x8, 0x2, 0x9, 0x80, 0x80, 0x80, 0xF0, 0xFD, 0x8E, 0xF7, 0xC0, 0x19]
    )


def test_null_and_multi_column_shapes():
    # NULL datum -> NilFlag byte; column order preserved in v1
    assert encode_row_v1([1, 2], [None, "ab"]) == bytes(
        [0x8, 0x2, 0x0, 0x8, 0x4, 0x2, 0x4]
    ) + b"ab"
    # v2: nulls listed after not-nulls, ascending ids
    v2 = encode_row_v2([2, 1], [None, 5])
    assert v2[:6] == bytes([0x80, 0x0, 0x1, 0x0, 0x1, 0x0])
    assert v2[6] == 1 and v2[7] == 2  # notnull id 1, null id 2


def test_can_skip_null_default_rule():
    # tables.CanSkip rule 2 (sql2kv.go:202 -> tbl.AddRecord): a NULL
    # datum in a column whose default is NULL vanishes from the
    # encoded value entirely
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        apply_can_skip,
    )

    # default: every column's default is NULL -> all NULLs dropped
    assert apply_can_skip([1, 2, 3], [None, "x", None]) == ([2], ["x"])
    # column 3 has a non-NULL default -> its NULL datum is KEPT
    assert apply_can_skip(
        [1, 2, 3], [None, "x", None], default_null_ids={1}
    ) == ([2, 3], ["x", None])
    # encode_record applies the rule before encoding (v1)
    _, v = encode_record(1, 7, [2, 3], [None, 5], 1)
    assert v == bytes([0x8, 0x6, 0x8, 0xA])  # only column 3 remains
    # v2: the skipped column is absent from the null-id section too
    _, v2 = encode_record(1, 7, [2, 3], [None, 5], 2)
    assert v2[2:6] == bytes([0x1, 0x0, 0x0, 0x0])  # 1 notnull, 0 null
    # with a non-NULL default the NULL datum lands in the null section
    _, v2k = encode_record(1, 7, [2, 3], [None, 5], 2,
                           default_null_ids=frozenset())
    assert v2k[2:6] == bytes([0x1, 0x0, 0x1, 0x0])  # 1 notnull, 1 null


def test_empty_row_encodes_single_nilflag():
    # TiDB EncodeOldRow: "We could not set nil value into kv" — an
    # empty datum list emits one NilFlag byte, hit by PK-only tables
    # (the PK lives in the key) and by all-NULL rows under CanSkip
    assert encode_row_v1([], []) == bytes([0x0])
    _, v = encode_record(42, 9, [2], [None], 1)
    assert v == bytes([0x0])


def test_kv_checksum_golden():
    # verification/checksum_test.go:52-72: crc64-ECMA(key || val) per
    # pair, XOR across pairs
    kvs = [
        (b"Cop", b"PingCAP"),
        (
            b"Introduction",
            b"Inspired by Google Spanner/F1, PingCAP develops TiDB.",
        ),
    ]
    total = 0
    for k, v in kvs:
        total ^= crc64_bytes(k + v)
    assert total == 4850203904608948940


def test_mydecimal_manual_golden():
    # the MySQL internals manual's published example: DECIMAL(14,4)
    # 1234567890.1234 -> 81 0D FB 38 D2 04 D2 (and the negation is
    # the bytewise inverse)
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_decimal_datum,
        encode_mydecimal,
    )

    gold = bytes([0x81, 0x0D, 0xFB, 0x38, 0xD2, 0x04, 0xD2])
    assert encode_mydecimal("1234567890.1234", 14, 4) == gold
    assert encode_mydecimal("-1234567890.1234", 14, 4) == bytes(
        b ^ 0xFF for b in gold
    )
    # TiDB datum wrapper: [flag 6, precision, frac, bin]
    assert encode_decimal_datum("1234567890.1234", 14, 4) == (
        bytes([0x6, 14, 4]) + gold
    )


def test_mydecimal_order_and_layout():
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_mydecimal,
    )

    # memcmp order == numeric order within one (precision, frac)
    vals = ["-99999.99", "-1.01", "-0.01", "0.00", "0.01", "1.50",
            "99999.99"]
    encs = [encode_mydecimal(v, 15, 2) for v in vals]
    assert encs == sorted(encs)
    # fixed layout: same byte length for every value of the type
    assert len({len(e) for e in encs}) == 1


def test_encode_bytes_comparable_group_shapes():
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_bytes_comparable,
    )

    # format-derived goldens (codec/bytes.go EncodeBytes): pad to 8,
    # marker = 0xFF - pad_count; a full group is followed by an
    # all-padding terminator group with marker 0xF7
    assert encode_bytes_comparable(b"") == b"\x00" * 8 + b"\xf7"
    assert encode_bytes_comparable(b"hello") == (
        b"hello\x00\x00\x00" + bytes([0xFF - 3])
    )
    assert encode_bytes_comparable(b"12345678") == (
        b"12345678\xff" + b"\x00" * 8 + b"\xf7"
    )
    assert encode_bytes_comparable(b"123456789") == (
        b"12345678\xff" + b"9" + b"\x00" * 7 + bytes([0xFF - 7])
    )


def test_encode_key_datum_order_preserving():
    import random

    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_key_datum,
    )

    rnd = random.Random(7)
    ints = sorted(rnd.randrange(-(2**63), 2**63) for _ in range(50))
    encs = [encode_key_datum(v) for v in ints]
    assert encs == sorted(encs)
    strs = sorted(
        "".join(rnd.choice("ab\x00ZZ") for _ in range(rnd.randrange(0, 20)))
        for _ in range(50)
    )
    encs = [encode_key_datum(s) for s in strs]
    assert encs == sorted(encs)
    # no encoded string is a strict prefix of another (self-terminating
    # groups): required for multi-column key comparability
    for i, a in enumerate(encs):
        for b in encs[i + 1:]:
            assert a == b or not b.startswith(a) or len(a) == len(b)
    floats = sorted(
        [-1e300, -2.5, -0.0, 0.0, 1e-9, 2.5, 1e300]
    )
    encs = [encode_key_datum(f) for f in floats]
    assert sorted(encs) == encs


def test_index_key_and_value_layout():
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_index_record,
        index_key,
    )

    # non-unique: handle appended to the key, value is the byte '0'
    k, v = encode_index_record(1, 2, ["ab"], 9, unique=False)
    assert k[:1] == b"t" and k[9:11] == b"_i"
    assert k[11:19] == bytes([0x80, 0, 0, 0, 0, 0, 0, 2])  # index id
    assert k[19] == 0x1  # bytesFlag
    # trailing handle: intFlag + comparable 9
    assert k[-9:] == bytes([0x3, 0x80, 0, 0, 0, 0, 0, 0, 9])
    assert v == b"0"

    # unique, no NULL -> distinct: no handle in key, value = BE handle
    k2, v2 = encode_index_record(1, 2, ["ab"], 9, unique=True)
    assert k2 == k[:-9]
    assert v2 == (9).to_bytes(8, "big", signed=True)
    # negative handles encode two's-complement
    _, vneg = encode_index_record(1, 2, ["ab"], -3, unique=True)
    assert vneg == (-3).to_bytes(8, "big", signed=True)

    # unique with a NULL datum -> NOT distinct: handle in key, '0' val
    k3, distinct = index_key(1, 2, [None], 9, unique=True)
    assert not distinct
    assert k3[19] == 0x0  # NilFlag datum
    assert k3[-9:] == k[-9:]


def test_encode_table_kvs_classify_shape():
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_table_kvs,
    )

    # one data KV + one per index; data keys carry '_r', index '_i'
    # (exactly what ClassifyAndAppend splits on, sql2kv.go:218-239)
    pairs = encode_table_kvs(
        5, 1, [2, 3], ["x", 7], 1,
        indexes=[(1, [0], False), (2, [1, -1], True)],
    )
    assert len(pairs) == 3
    assert pairs[0][0][9:11] == b"_r"
    assert pairs[1][0][9:11] == b"_i" and pairs[2][0][9:11] == b"_i"
    # the unique index (no NULLs) stores the handle as its value
    assert pairs[2][1] == (1).to_bytes(8, "big", signed=True)
    # index KVs are handle-sensitive: same row, different handle
    pairs2 = encode_table_kvs(
        5, 2, [2, 3], ["x", 7], 1,
        indexes=[(1, [0], False), (2, [1, -1], True)],
    )
    assert pairs[1][0] != pairs2[1][0]  # non-unique key embeds handle
    assert pairs[2][1] != pairs2[2][1]  # unique value embeds handle


def test_pack_datetime_roundtrip_fields():
    p = pack_datetime(dt.datetime(2009, 2, 13, 23, 31, 33))
    assert p & 0xFFFFFF == 0  # no microseconds
    hms = (p >> 24) & ((1 << 17) - 1)
    assert hms == (23 << 12) | (31 << 6) | 33
    ymd = p >> 41
    assert ymd == ((2009 * 13 + 2) << 5) | 13
