"""An INDEPENDENT DuckDB-SQL encoder for the TiKV KV bytes: builds
each row's record-KV and index-KV byte strings as hex text with pure
SQL arithmetic, checksums them with the pure-SQL CRC-64/XZ fold, and
aggregates the same (crc_xor, total_bytes, total_kvs) triple the
kv_crc64 pipeline computes.

Purpose: the round-6 ADVICE observed that the kv_crc64 e2e suites
verify the pipeline against expectations computed by the SAME Python
codec — a systematic codec bug would pass. This module is a second
implementation of the public formats (TiDB codec varint/flag datums,
record/index keys, packed datetimes, the CanSkip rule) sharing no
code or language with ``kv_codec``/``kv_codec_np``, so a registry
entry comparing the two attests the byte layout itself.

Scope (deliberate): BIGINT/INT, VARCHAR and DATETIME datums in the
row-format-v1 value — enough to cover keys, varints, compact bytes,
packed datetimes, the CanSkip rule, and both index value layouts.
DOUBLE is excluded because DuckDB SQL has no access to IEEE-754 bits
(no float-to-bits function); the Python-side property tests cover
floats instead.
"""

from __future__ import annotations

from .hashing import _xx_let, crc64_hex_duckdb

_M64 = f"{1 << 64}::HUGEINT"


def hex16_comparable(v_expr: str) -> str:
    """16 hex chars: big-endian of (int64 value XOR the sign bit) —
    the memory-comparable int encoding (kv_codec
    encode_int_comparable). XOR with 2^63 == +2^63 mod 2^64 in
    two's complement, which HUGEINT arithmetic can express."""
    u = (
        f"((({v_expr})::HUGEINT + 9223372036854775808::HUGEINT"
        f" + {_M64}) % {_M64})"
    )
    return f"lpad(hex({u}), 16, '0')"


def hex16_twos_complement(v_expr: str) -> str:
    """16 hex chars: big-endian two's complement of an int64 (the
    unique-index VALUE layout, kv_codec encode_index_record)."""
    u = f"((({v_expr})::HUGEINT + {_M64}) % {_M64})"
    return f"lpad(hex({u}), 16, '0')"


def _zigzag(v_expr: str) -> str:
    return (
        f"(CASE WHEN ({v_expr}) >= 0 THEN (2*({v_expr})::HUGEINT)"
        f" ELSE (-2*(({v_expr})::HUGEINT) - 1) END)::UBIGINT"
    )


def uvarint_hex(u_expr: str) -> str:
    """LEB128 bytes of a UBIGINT expression, as hex text."""
    thresholds = [1 << (7 * k) for k in range(1, 10)]
    nb = "CASE " + " ".join(
        f"WHEN __z < {t}::UBIGINT THEN {k}"
        for k, t in enumerate(thresholds, start=1)
    ) + " ELSE 10 END"
    byte = (
        "((__z >> (7*__k)::INT) & 127)::BIGINT"
        " + CASE WHEN __k < __nb - 1 THEN 128 ELSE 0 END"
    )
    return _xx_let(
        "__z", u_expr,
        _xx_let(
            "__nb", nb,
            "array_to_string(list_transform(range(0, __nb), "
            f"__k -> printf('%02x', {byte})), '')",
        ),
    )


def varint_hex(v_expr: str) -> str:
    """Zigzag varint (codec.EncodeVarint) of an int64, as hex."""
    return uvarint_hex(_zigzag(v_expr))


def packed_datetime_expr(ts_expr: str) -> str:
    """MySQL packed datetime (kv_codec.pack_datetime) of a TIMESTAMP
    column, as a UBIGINT expression."""
    y, m, d = f"year({ts_expr})", f"month({ts_expr})", f"day({ts_expr})"
    h, mi = f"hour({ts_expr})", f"minute({ts_expr})"
    s = f"extract(second FROM {ts_expr})::HUGEINT"
    us = f"(extract(microseconds FROM {ts_expr})::HUGEINT % 1000000)"
    ymd = f"(({y}::HUGEINT * 13 + {m}) * 32 + {d})"
    hms = f"(({h}::HUGEINT * 4096) + ({mi} * 64) + {s})"
    return (
        f"((((({ymd} * 131072) + {hms}) * 16777216) + {us}))::UBIGINT"
    )


def datum_hex(col: str, duck_type: str, cid: int, skip_null: bool) -> str:
    """One v1 row-value entry ([varint colID][flagged datum]) as hex;
    NULL follows the CanSkip rule (empty hex when the column's
    default is NULL, colID + NilFlag otherwise)."""
    prefix = "'08' || " + varint_hex(str(cid))
    t = duck_type.upper()
    if t in ("BIGINT", "INTEGER", "INT", "SMALLINT", "TINYINT"):
        body = "'08' || " + varint_hex(col)
    elif t == "UINT64":
        # KindUint64 (BIGINT UNSIGNED, DECIMAL(20,0) in the engines)
        body = "'09' || " + uvarint_hex(f"({col})::UBIGINT")
    elif t in ("VARCHAR", "TEXT"):
        # compact bytes: zigzag-varint of the byte length (zigzag of
        # a non-negative n is 2n — fed pre-doubled to the plain
        # LEB128 writer) then the raw bytes
        body = (
            "'02' || "
            + uvarint_hex(
                f"(2*octet_length(encode({col})))::UBIGINT"
            )
            + f" || hex(encode({col}))"
        )
    elif t in ("TIMESTAMP", "DATETIME"):
        body = "'09' || " + uvarint_hex(packed_datetime_expr(col))
    else:
        raise NotImplementedError(
            f"kv duckdb twin: unsupported type {duck_type}"
        )
    null_case = "''" if skip_null else f"({prefix} || '00')"
    return (
        f"CASE WHEN {col} IS NULL THEN {null_case}"
        f" ELSE ({prefix} || {body}) END"
    )


def key_datum_hex(col: str, duck_type: str, prefix_len=None) -> str:
    """One memory-comparable EncodeKey datum as hex (index keys);
    NULL encodes the NilFlag byte. ``prefix_len`` mirrors
    TruncateIndexValue for prefix indexes (substr is char-based in
    DuckDB, matching TiDB's utf8 rune truncation)."""
    t = duck_type.upper()
    if prefix_len is not None and t in ("VARCHAR", "TEXT"):
        col = f"substr({col}, 1, {int(prefix_len)})"
    if t in ("BIGINT", "INTEGER", "INT", "SMALLINT", "TINYINT"):
        body = "'03' || " + hex16_comparable(col)
    elif t == "UINT64":
        body = (
            "'04' || lpad(hex((("
            + col
            + ")::HUGEINT)), 16, '0')"
        )
    elif t in ("VARCHAR", "TEXT"):
        # EncodeBytes group-of-8: emit ceil((n+1)/8) groups, each 8
        # source/pad bytes + a marker 0xFF - pad
        group = (
            "array_to_string(list_transform(range(0, 8), __b -> "
            "CASE WHEN 8*__g + __b < __sn "
            "THEN substr(__sx, 2*(8*__g + __b)+1, 2) ELSE '00' END), '')"
            " || printf('%02x', 255 - CASE WHEN __sn - 8*__g >= 8 THEN 0 "
            "WHEN __sn - 8*__g < 0 THEN 8 ELSE 8 - (__sn - 8*__g) END)"
        )
        body = _xx_let(
            "__sx", f"hex(encode({col}))",
            _xx_let(
                "__sn", f"octet_length(encode({col}))",
                "'01' || array_to_string(list_transform("
                f"range(0, __sn // 8 + 1), __g -> {group}), '')",
            ),
        )
    elif t in ("TIMESTAMP", "DATETIME"):
        body = (
            "'04' || lpad(hex("
            + packed_datetime_expr(col)
            + "::HUGEINT), 16, '0')"
        )
    else:
        raise NotImplementedError(
            f"kv duckdb twin: unsupported index type {duck_type}"
        )
    return f"CASE WHEN {col} IS NULL THEN '00' ELSE ({body}) END"


def kv_checksum_sql_duckdb(
    table: str,
    handle_col: str,
    value_cols: list[tuple[str, str, int, bool]],
    indexes: list[tuple[int, list[tuple[str, str]], bool]],
    table_id: int = 1,
) -> str:
    """The full kv_crc64 twin for one table: per row, the record KV
    hex plus one index KV hex per index spec, each CRC-64/XZ-folded;
    aggregates (crc_xor, total_bytes, total_kvs) exactly like the
    pipeline's kv_hash_columns + bit_xor/sum/count.

    value_cols: (name, duck_type, col_id, default_is_null).
    indexes: (index_id, [(name, duck_type) or (name, duck_type,
    prefix_len)], unique) — the handle column may appear among the
    index columns."""
    tid_hex = hex16_comparable(str(table_id))
    rec_key = f"('74' || {tid_hex} || '5f72' || " + hex16_comparable(
        handle_col
    ) + ")"
    value_parts = " || ".join(
        datum_hex(c, t, cid, dn) for c, t, cid, dn in value_cols
    )
    # EncodeOldRow empty sentinel: all columns skipped -> one NilFlag
    rec_val = _xx_let(
        "__rv", f"({value_parts})",
        "CASE WHEN length(__rv) = 0 THEN '00' ELSE __rv END",
    )
    pair_hexes = [f"({rec_key} || {rec_val})"]
    for iid, icols, unique in indexes:
        icols = [
            (e[0], e[1], e[2] if len(e) > 2 else None) for e in icols
        ]
        ikey_datums = " || ".join(
            key_datum_hex(c, t, pl) for c, t, pl in icols
        )
        distinct_pred = (
            " AND ".join(f"{c} IS NOT NULL" for c, _, _ in icols)
            if unique
            else "FALSE"
        )
        prefix = (
            f"'74' || {tid_hex} || '5f69' || "
            + hex16_comparable(str(iid))
        )
        handle_tail = "'03' || " + hex16_comparable(handle_col)
        uval = hex16_twos_complement(handle_col)
        pair_hexes.append(
            f"({prefix} || {ikey_datums} || "
            f"CASE WHEN {distinct_pred} THEN {uval} "
            f"ELSE ({handle_tail}) || '30' END)"
        )
    crcs = [crc64_hex_duckdb(hx) for hx in pair_hexes]
    h = crcs[0]
    for c in crcs[1:]:
        h = f"xor({h}, {c})"
    nbytes = " + ".join(f"length({hx}) // 2" for hx in pair_hexes)
    return (
        f"SELECT bit_xor(__h) AS crc_xor, "
        f"sum(__nb)::BIGINT AS total_bytes, "
        f"(count(*) * {len(pair_hexes)})::BIGINT AS total_kvs "
        f"FROM (SELECT {h} AS __h, ({nbytes})::BIGINT AS __nb "
        f"FROM {table})"
    )
