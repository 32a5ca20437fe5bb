"""The DuckDB-SQL KV encoder (kv_codec_duckdb) is a SECOND,
shared-nothing implementation of the TiKV byte layouts — these tests
pin it against the Python codec on a crafted matrix so the
kv_crc64_orders registry twin rests on two independently-derived
encoders.
"""

import datetime as dt

import duckdb

from tidb_lightning_release_4_0_spark.functions.hashing import crc64_bytes
from tidb_lightning_release_4_0_spark.functions.kv_codec import (
    encode_table_kvs,
)
from tidb_lightning_release_4_0_spark.functions.kv_codec_duckdb import (
    kv_checksum_sql_duckdb,
)

ROWS = [
    (1, 100, "alice", dt.datetime(2009, 2, 14, 7, 31, 30)),
    (2, None, "", dt.datetime(1999, 12, 31, 23, 59, 59, 999999)),
    (3, -(1 << 62), None, None),
    (4, (1 << 62) + 7, "héllo ☃ wörld beyond eight bytes",
     dt.datetime(1970, 1, 1)),
    (5, 0, "12345678", dt.datetime(9999, 12, 31, 23, 59, 59)),
    (-6, 127, "x", dt.datetime(2020, 2, 29, 12, 0, 0, 1)),
    (7, (1 << 63) - 1, "exactly16bytes__", dt.datetime(1899, 6, 3)),
    (8, -(1 << 63), None, dt.datetime(2262, 4, 12)),  # past pandas ns
]

IDX_PY = [
    (1, [0], False),
    (2, [1], True),
    (3, [2, -1], False),
    # prefix index: only the first 4 CHARACTERS of the string
    (4, [(1, 4)], False),
]
IDX_SQL = [
    (1, [("v", "BIGINT")], False),
    (2, [("s", "VARCHAR")], True),
    (3, [("ts", "TIMESTAMP"), ("h", "BIGINT")], False),
    (4, [("s", "VARCHAR", 4)], False),
]


def _python_triple(default_null_ids):
    crc, nbytes, kvs = 0, 0, 0
    for h, v, s, ts in ROWS:
        rc = 0
        for k, val in encode_table_kvs(
            9, h, [2, 3, 4], [v, s, ts], 1,
            default_null_ids=default_null_ids, indexes=IDX_PY,
        ):
            rc ^= crc64_bytes(k + val)
            nbytes += len(k) + len(val)
            kvs += 1
        crc ^= rc
    return crc, nbytes, kvs


def _sql_triple(value_cols):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (h BIGINT, v BIGINT, s VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    sql = kv_checksum_sql_duckdb("t", "h", value_cols, IDX_SQL, table_id=9)
    r = con.sql(sql).fetchall()[0]
    return int(r[0]) & (2**64 - 1), int(r[1]), int(r[2])


def test_sql_encoder_matches_python_codec_canskip_mixed():
    # column 3 (the string) keeps NULLs (has a default); 2/4 skip
    expect = _python_triple(frozenset({2, 4}))
    got = _sql_triple(
        [
            ("v", "BIGINT", 2, True),
            ("s", "VARCHAR", 3, False),
            ("ts", "TIMESTAMP", 4, True),
        ]
    )
    assert got == expect


def test_sql_encoder_uint64_kind():
    # BIGINT UNSIGNED (DECIMAL(20,0) engine-side) encodes as
    # KindUint64: uvarint row values, uintFlag + BE keys — incl. the
    # reference's various_types round-trip value 2^64 - 2
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        Uint64Datum,
    )

    rows = [(1, 18446744073709551614), (2, 0), (3, None), (4, 777)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (h BIGINT, u DECIMAL(20,0))")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = kv_checksum_sql_duckdb(
        "t", "h", [("u", "UINT64", 2, True)],
        [(1, [("u", "UINT64")], False), (2, [("u", "UINT64")], True)],
        table_id=9,
    )
    got = con.sql(sql).fetchall()[0]
    crc, nbytes = 0, 0
    for h, u in rows:
        v = None if u is None else Uint64Datum(u)
        rc = 0
        for k, val in encode_table_kvs(
            9, h, [2], [v], 1,
            indexes=[(1, [0], False), (2, [0], True)],
        ):
            rc ^= crc64_bytes(k + val)
            nbytes += len(k) + len(val)
        crc ^= rc
    assert (int(got[0]) & (2**64 - 1)) == crc
    assert int(got[1]) == nbytes


def test_sql_encoder_matches_python_codec_all_default_null():
    expect = _python_triple(None)
    got = _sql_triple(
        [
            ("v", "BIGINT", 2, True),
            ("s", "VARCHAR", 3, True),
            ("ts", "TIMESTAMP", 4, True),
        ]
    )
    assert got == expect


# ---------------------------------------------------------------------------
# round 8: row-format v2 + DOUBLE in the SQL twin
# ---------------------------------------------------------------------------

ROWS_F = [
    (1, 100, "alice", dt.datetime(2009, 2, 14, 7, 31, 30), 2.5),
    (2, None, "", dt.datetime(1999, 12, 31, 23, 59, 59, 999999), -1e308),
    (3, -(1 << 62), None, None, None),
    (4, (1 << 62) + 7, "héllo ☃", dt.datetime(1970, 1, 1), 5e-324),
    (5, 0, "12345678", dt.datetime(9999, 12, 31, 23, 59, 59), 0.0),
    (-6, 127, "x", dt.datetime(2020, 2, 29, 12, 0, 0, 1), -0.0),
    (7, 300, "y", dt.datetime(2000, 1, 1), 3.141592653589793),
    (8, -129, "zz", dt.datetime(2262, 4, 12), 2.0**-1022),
]
IDX_F_PY = [(1, [0], False), (2, [3], True), (3, [2, -1], False)]
IDX_F_SQL = [
    (1, [("v", "BIGINT")], False),
    (2, [("f", "DOUBLE")], True),
    (3, [("ts", "TIMESTAMP"), ("h", "BIGINT")], False),
]
VC_F_SQL = [
    ("v", "BIGINT", 2, True),
    ("s", "VARCHAR", 3, False),
    ("ts", "TIMESTAMP", 4, True),
    ("f", "DOUBLE", 5, True),
]


def _float_matrix_triples(rfv):
    crc, nbytes, kvs = 0, 0, 0
    for h, v, s, ts, f in ROWS_F:
        for k, val in encode_table_kvs(
            9, h, [2, 3, 4, 5], [v, s, ts, f], rfv,
            default_null_ids=frozenset({2, 4, 5}), indexes=IDX_F_PY,
        ):
            crc ^= crc64_bytes(k + val)
            nbytes += len(k) + len(val)
            kvs += 1
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (h BIGINT, v BIGINT, s VARCHAR, ts TIMESTAMP,"
        " f DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", ROWS_F)
    sql = kv_checksum_sql_duckdb(
        "t", "h", VC_F_SQL, IDX_F_SQL, table_id=9,
        row_format_version=rfv,
    )
    g = con.sql(sql).fetchall()[0]
    return (crc, nbytes, kvs), (
        int(g[0]) & (2**64 - 1), int(g[1]), int(g[2])
    )


def test_sql_encoder_v1_with_doubles():
    expect, got = _float_matrix_triples(1)
    assert got == expect


def test_sql_encoder_row_format_v2():
    """v2 sectioned layout end to end: counts, id sections (incl. a
    kept NULL — the string has a default), end offsets, smallest-int
    cells, comparable doubles in value AND key positions."""
    expect, got = _float_matrix_triples(2)
    assert got == expect


def test_sql_float_bits_sweep():
    """Pure-SQL IEEE-754 bits are byte-exact against the Python
    encoder across normals, subnormals, the denormal minimum, binade
    boundaries, ±0, ±inf and canonical NaN."""
    import math

    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_float_comparable,
    )
    from tidb_lightning_release_4_0_spark.functions.kv_codec_duckdb import (
        float_comparable_hex16,
    )

    vals = [
        0.0, -0.0, 1.0, -1.0, 2.5, -2.5, 1e308, -1e308, 5e-324,
        -5e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
        0.1, -0.1, 123456.789e-30, float("inf"), float("-inf"),
        float("nan"), 2.0**52, 2.0**52 + 1, 2.0**-1022,
        (2.0**-1022) * 0.5, 3.141592653589793, 2.0**1023, 2.0**-1074,
        1.5e-310,  # mid-subnormal
    ]
    con = duckdb.connect()
    for v in vals:
        lit = repr(v) if math.isfinite(v) else f"'{v}'::DOUBLE"
        got = con.execute(
            f"select {float_comparable_hex16(lit)}"
        ).fetchone()[0]
        assert got.lower() == encode_float_comparable(v).hex(), v


def test_sql_v2_small_layout_guards():
    import pytest

    from tidb_lightning_release_4_0_spark.functions.kv_codec_duckdb import (
        record_value_v2_hex,
    )

    with pytest.raises(AssertionError):
        record_value_v2_hex([("a", "BIGINT", 3, True), ("b", "BIGINT", 2, True)])
    with pytest.raises(AssertionError):
        record_value_v2_hex([("a", "BIGINT", 300, True)])


def test_sql_encoder_duration_kind():
    """KindMysqlDuration (TIME columns): durationFlag + comparable
    int64 nanoseconds in value and key positions — the SQL twin's
    DURATION_NS type vs the Python DurationDatum."""
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        DurationDatum,
        parse_duration_ns,
    )

    rows = [
        (1, "01:02:03"),
        (2, "-838:59:59"),
        (3, None),
        (4, "00:00:00.000001"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (h BIGINT, ns BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(h, None if s is None else parse_duration_ns(s)) for h, s in rows],
    )
    sql = kv_checksum_sql_duckdb(
        "t", "h", [("ns", "DURATION_NS", 2, True)],
        [(1, [("ns", "DURATION_NS")], False)], table_id=9,
    )
    got = con.sql(sql).fetchall()[0]
    crc, nbytes = 0, 0
    for h, s in rows:
        v = None if s is None else DurationDatum(parse_duration_ns(s))
        for k, val in encode_table_kvs(
            9, h, [2], [v], 1, indexes=[(1, [0], False)],
        ):
            crc ^= crc64_bytes(k + val)
            nbytes += len(k) + len(val)
    assert (int(got[0]) & (2**64 - 1)) == crc
    assert int(got[1]) == nbytes


def test_sql_mydecimal_property_matrix():
    """The pure-SQL myDecimal builder (mydecimal_hex) is bit-identical
    to the Python encoder across a (precision, frac) matrix covering
    every group shape: leading partials of 1..8 digits, multiple full
    9-digit groups, full + partial fraction groups, frac-0 and
    intg-0 ('0.xxx') layouts, negatives (whole-bytes-invert) and the
    zero/extreme boundaries — plus the MySQL internals manual's own
    golden, DECIMAL(14,4) 1234567890.1234 -> 81 0D FB 38 D2 04 D2."""
    import decimal
    import random

    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_mydecimal,
    )
    from tidb_lightning_release_4_0_spark.functions.kv_codec_duckdb import (
        mydecimal_hex,
    )

    assert (
        encode_mydecimal(decimal.Decimal("1234567890.1234"), 14, 4).hex()
        == "810dfb38d204d2"
    )

    con = duckdb.connect()
    rng = random.Random(8)
    shapes = [
        (12, 2), (14, 4), (25, 7), (20, 10), (5, 5), (9, 0),
        (18, 0), (38, 18), (4, 2), (1, 0), (10, 9), (27, 0), (19, 19),
    ]
    for p, f in shapes:
        intg = p - f
        vals = []
        for _ in range(15):
            i = rng.randint(0, 10**intg - 1) if intg else 0
            fr = rng.randint(0, 10**f - 1) if f else 0
            s = f"{i}.{str(fr).zfill(f)}" if f else str(i)
            if rng.random() < 0.5 and (i or fr):
                s = "-" + s
            vals.append(s)
        hi = str(10**intg - 1) if intg else "0"
        vals += ["0", hi, "-" + hi if hi != "0" else "0"]
        for s in vals:
            py = encode_mydecimal(decimal.Decimal(s), p, f).hex()
            got = con.sql(
                f"SELECT lower({mydecimal_hex('v', p, f)}) "
                f"FROM (SELECT {s}::DECIMAL({p},{f}) AS v)"
            ).fetchone()[0]
            assert got == py, (p, f, s, py, got)


def _decimal_rows():
    import decimal

    D = decimal.Decimal
    return [
        (1, D("1234.56"), D("-70.00"), D("123456789012345678.0000001")),
        (2, D("0.01"), D("9999999999.99"), D("-1.5000000")),
        (3, None, D("-0.01"), None),
        (4, D("0.00"), D("0.00"), D("0.0000000")),
        (5, D("9999999999.99"), D("-9999999999.99"),
         D("-999999999999999999.9999999")),
    ]


def test_sql_encoder_decimal_kind_v1_and_v2():
    """DECIMAL datums through the full twin, BOTH row formats: the
    record value (v1 flagged datum / v2 cell = [prec, frac,
    myDecimal]), a non-unique decimal index, a unique nullable
    decimal index (distinct + NULL branches) and a composite key
    with negative decimals — Python codec vs pure SQL."""
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        DecimalDatum,
    )

    rows = _decimal_rows()
    idx_py = [(1, [2], False), (2, [0], True), (3, [1, -1], False)]
    idx_sql = [
        (1, [("c", "DECIMAL(25,7)")], False),
        (2, [("a", "DECIMAL(12,2)")], True),
        (3, [("b", "DECIMAL(12,2)"), ("h", "BIGINT")], False),
    ]
    value_cols = [
        ("a", "DECIMAL(12,2)", 2, True),
        ("b", "DECIMAL(12,2)", 3, False),
        ("c", "DECIMAL(25,7)", 4, True),
    ]

    for ver in (1, 2):
        crc, nbytes, kvs = 0, 0, 0
        for h, a, b, c in rows:
            rc = 0
            vals = [
                None if a is None else DecimalDatum(a, 12, 2),
                None if b is None else DecimalDatum(b, 12, 2),
                None if c is None else DecimalDatum(c, 25, 7),
            ]
            for k, val in encode_table_kvs(
                15, h, [2, 3, 4], vals, ver,
                default_null_ids=frozenset({2, 4}),
                indexes=idx_py,
            ):
                rc ^= crc64_bytes(k + val)
                nbytes += len(k) + len(val)
                kvs += 1
            crc ^= rc

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (h BIGINT, a DECIMAL(12,2), "
            "b DECIMAL(12,2), c DECIMAL(25,7))"
        )
        con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
        sql = kv_checksum_sql_duckdb(
            "t", "h", value_cols, idx_sql, table_id=15,
            row_format_version=ver,
        )
        r = con.sql(sql).fetchall()[0]
        got = (int(r[0]) & (2**64 - 1), int(r[1]), int(r[2]))
        assert got == (crc, nbytes, kvs), (ver, got, (crc, nbytes, kvs))


def test_sql_json_string_object_kind():
    """Binary-JSON STRING values through the twin: the one-string-key
    object {k: s} — TypeCodeString entries, LEB128 length (1- and
    2-byte), unicode — byte-identical with the Python binary-JSON
    encoder, standalone and through the full KV checksum."""
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        JsonDatum,
        _encode_datum_v1,
    )
    from tidb_lightning_release_4_0_spark.functions.kv_codec_duckdb import (
        json_str_object_hex,
    )

    con = duckdb.connect()
    cases = [
        "", "x", "hello world", "héllo ☃ wörld",
        "a" * 127, "b" * 128, "c" * 300, 'quote"back\\slash',
    ]
    for s in cases:
        py = _encode_datum_v1(JsonDatum.from_value({"k": s})).hex()
        got = con.sql(
            f"SELECT lower({json_str_object_hex('k', 'v')}) "
            "FROM (SELECT ? AS v)",
            params=[s],
        ).fetchone()[0]
        assert got == py, s[:20]

    # through the full twin: record KV with a JSON-string column
    from tidb_lightning_release_4_0_spark.functions.kv_codec import (
        encode_table_kvs,
    )

    rows = [(i + 1, s) for i, s in enumerate(cases)]
    crc, nbytes, kvs = 0, 0, 0
    for h, s in rows:
        for k, val in encode_table_kvs(
            16, h, [2], [JsonDatum.from_value({"k": s})], 1,
        ):
            crc ^= crc64_bytes(k + val)
            nbytes += len(k) + len(val)
            kvs += 1
    con2 = duckdb.connect()
    con2.execute("CREATE TABLE t (h BIGINT, s VARCHAR)")
    con2.executemany("INSERT INTO t VALUES (?, ?)", rows)
    from tidb_lightning_release_4_0_spark.functions.kv_codec_duckdb import (
        json_str_object_hex as jso,
    )

    sql = kv_checksum_sql_duckdb(
        "t", "h", [(jso("k", "s"), "RAWHEX", 2, True)], [], table_id=16,
    )
    r = con2.sql(sql).fetchall()[0]
    got = (int(r[0]) & (2**64 - 1), int(r[1]), int(r[2]))
    assert got == (crc, nbytes, kvs)
