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

Scope: BIGINT/INT, VARCHAR, DATETIME, (since round 8) DOUBLE and
DECIMAL (the MySQL myDecimal binary, exact — digits come from
DuckDB's DECIMAL->VARCHAR rendering, no floating arithmetic) datums,
in BOTH row-format versions — v1's [colID, flagged datum]
pairs and v2's sectioned small layout (version/flag, u16 counts,
ascending not-null/null ids, u16 end offsets, cells). DOUBLE gets
its IEEE-754 bits from pure SQL arithmetic (corrected floor(log2) +
exact power-of-two rescaling; see float_bits_hugeint) — closing the
round-7 note that v2 and floats were attested only by Python-side
fixtures. The v2 builder emits the SMALL layout (ids <= 255 and
value size <= 65535 — asserted at SQL-generation time for ids; the
big layout stays covered by the Python property tests).

NaN doubles encode as the canonical quiet NaN (0x7ff8…) — the bit
pattern Spark/Arrow carry; non-canonical NaN payloads would diverge
(documented, not reachable from the parquet fixtures).

Binary JSON covers the one-key object shapes the fixtures exercise —
int values (json_int_object_hex) and variable-length string values
(json_str_object_hex, LEB128 length + utf-8); deeper nesting stays
attested by the Python encoder's decode-roundtrip property tests.
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


_SIGN64 = "9223372036854775808::HUGEINT"  # 2^63
_EXP_INF = "9218868437227405312::HUGEINT"  # 0x7ff0... (inf, +sign below)
_NAN_BITS = "9221120237041090560::HUGEINT"  # 0x7ff8... canonical qNaN
_2P52 = "4503599627370496::HUGEINT"


def float_bits_hugeint(col: str) -> str:
    """IEEE-754 binary64 bits of a DOUBLE column as a HUGEINT
    expression, pure SQL. Exponent: floor(log2(|v|)) corrected by one
    exact rescale check (log2 is approximate only at binade
    boundaries). Mantissa: (frac-1)*2^52 where frac = |v| scaled by
    an EXACT power of two (two half-power steps keep pow() finite
    across the full exponent range); subnormals scale |v| by 2^1074
    the same way. Every arithmetic step is exact in binary64, so the
    bits are exact — not approximated."""
    scale = (
        "(__m * pow(2.0, (-__e0) // 2))"
        " * pow(2.0, (-__e0) - ((-__e0) // 2))"
    )
    mag_bits = _xx_let(
        "__m", f"abs({col})",
        _xx_let(
            "__e0", f"floor(log2(abs({col})))::BIGINT",
            _xx_let(
                "__f0", scale,
                _xx_let(
                    "__e",
                    "CASE WHEN __f0 >= 2 THEN __e0 + 1 "
                    "WHEN __f0 < 1 THEN __e0 - 1 ELSE __e0 END",
                    _xx_let(
                        "__f",
                        "CASE WHEN __f0 >= 2 THEN __f0 / 2 "
                        "WHEN __f0 < 1 THEN __f0 * 2 ELSE __f0 END",
                        "CASE WHEN __e < -1022 THEN "
                        "((__m * pow(2.0, 537)) * pow(2.0, 537))::HUGEINT "
                        f"ELSE (__e + 1023)::HUGEINT * {_2P52}"
                        f" + ((__f - 1) * 4503599627370496.0)::HUGEINT END",
                    ),
                ),
            ),
        ),
    )
    sign = f"CASE WHEN signbit({col}) THEN {_SIGN64} ELSE 0::HUGEINT END"
    return (
        f"(CASE WHEN isnan({col}) THEN {_NAN_BITS} "
        f"WHEN isinf({col}) THEN ({sign}) + {_EXP_INF} "
        f"WHEN {col} = 0 THEN ({sign}) "
        f"ELSE ({sign}) + ({mag_bits}) END)"
    )


def float_comparable_hex16(col: str) -> str:
    """16 hex chars: codec.EncodeFloat's memory-comparable double
    (bits | signbit for v >= 0, ~bits otherwise; NaN rides the invert
    branch like the Python/Go kernels, where NaN >= 0 is false)."""
    comp = _xx_let(
        "__fb", float_bits_hugeint(col),
        f"CASE WHEN isnan({col}) OR NOT ({col} >= 0) "
        f"THEN (18446744073709551615::HUGEINT - __fb) "
        f"ELSE __fb + (CASE WHEN __fb >= {_SIGN64} THEN 0::HUGEINT "
        f"ELSE {_SIGN64} END) END",
    )
    return f"lpad(hex({comp}), 16, '0')"


def json_int_object_hex(key: str, n_expr: str) -> str:
    """Flagged KindMysqlJSON datum hex for the one-int-key object
    {key: n} — the shape of the testdata `props` column. The binary
    JSON layout of a single-key object is CONSTANT except the int64
    payload, so the whole datum is jsonFlag + TypeCodeObject + fixed
    header/entries/key + little-endian n. Lets the twin attest the
    binary-JSON bytes without a full JSON encoder in SQL."""
    kb = key.encode("utf-8")
    hdr = 8 + 6 + 5  # header + 1 key entry + 1 value entry
    key_off, val_off = hdr, hdr + len(kb)
    total = val_off + 8
    fixed = (
        "0a01"
        + struct_hex_u32le(1)
        + struct_hex_u32le(total)
        + struct_hex_u32le(key_off)
        + struct_hex_u16le(len(kb))
        + "09"
        + struct_hex_u32le(val_off)
        + kb.hex()
    )
    u = f"((({n_expr})::HUGEINT + {_M64}) % {_M64})"
    le8 = _xx_let(
        "__hx16", f"lpad(hex({u}), 16, '0')",
        "array_to_string(list_transform(range(0, 8), "
        "__k -> substr(__hx16, 15 - 2*__k, 2)), '')",
    )
    return f"('{fixed}' || {le8})"


import re as _re

# bytes per partial group of n leading/trailing decimal digits — part
# of the PUBLIC myDecimal format spec (MySQL internals manual
# dig2bytes), re-stated here so the twin shares no code with kv_codec
_DEC_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]
_DECIMAL_RE = _re.compile(r"^DECIMAL\((\d+),\s*(\d+)\)$")


def mydecimal_hex(col: str, precision: int, frac: int) -> str:
    """MySQL myDecimal binary (the memcmp-able layout kv_codec.
    encode_mydecimal produces) as hex text, pure SQL. The group
    layout is FIXED by (precision, frac): a partial leading group of
    intg%9 digits, intg//9 full 9-digit groups, frac//9 full groups,
    a partial trailing group of frac%9 digits — each full group a
    4-byte big-endian base-10^9 word, partials in dig2bytes sizes;
    the first byte's MSB flips and a negative value inverts every
    byte. Digits come from DuckDB's exact DECIMAL->VARCHAR rendering
    (always full scale, never exponent notation), so no floating
    arithmetic ever touches the value. Every group word is <
    2^(8w-1), so the MSB flip is the addition of 0x80<<(8(w-1)) and
    the byte-wise NOT of a w-byte word is (2^8w - 1) - word."""
    intg = precision - frac
    groups = []  # (source, 1-based digit start, ndigits, byte width)
    pos = 1
    lead = intg % 9
    if lead:
        groups.append(("__dip", pos, lead, _DEC_DIG2BYTES[lead]))
        pos += lead
    for _ in range(intg // 9):
        groups.append(("__dip", pos, 9, 4))
        pos += 9
    pos = 1
    for _ in range(frac // 9):
        groups.append(("__dfp", pos, 9, 4))
        pos += 9
    tail = frac % 9
    if tail:
        groups.append(("__dfp", pos, tail, _DEC_DIG2BYTES[tail]))
    assert groups, "DECIMAL(0,0) columns do not occur"
    parts = []
    for gi, (src, start, nd, w) in enumerate(groups):
        v = f"substr({src}, {start}, {nd})::HUGEINT"
        if gi == 0:
            v = f"({v} + {0x80 << (8 * (w - 1))}::HUGEINT)"
        mask = (1 << (8 * w)) - 1
        v = f"(CASE WHEN __dng THEN {mask}::HUGEINT - {v} ELSE {v} END)"
        parts.append(f"lpad(hex({v}), {2 * w}, '0')")
    body = " || ".join(parts)
    int_digits = (
        "CASE WHEN strpos(__dst, '.') > 0 "
        "THEN substr(__dst, 1, strpos(__dst, '.') - 1) ELSE __dst END"
    )
    frac_digits = (
        "CASE WHEN strpos(__dst, '.') > 0 "
        "THEN substr(__dst, strpos(__dst, '.') + 1) ELSE '' END"
    )
    return _xx_let(
        "__dng", f"({col} < 0)",
        _xx_let(
            "__dst", f"CAST(abs({col}) AS VARCHAR)",
            _xx_let(
                "__dip", f"lpad({int_digits}, {max(intg, 1)}, '0')",
                _xx_let(
                    "__dfp", f"rpad({frac_digits}, {max(frac, 1)}, '0')",
                    f"({body})",
                ),
            ),
        ),
    )


def _decimal_prec_frac(duck_type: str) -> tuple[int, int] | None:
    m = _DECIMAL_RE.match(duck_type.upper().replace(" ", ""))
    if not m:
        return None
    return int(m.group(1)), int(m.group(2))


def decimal_datum_payload_hex(col: str, precision: int, frac: int) -> str:
    """codec.EncodeDecimal minus the flag byte: [precision u8,
    frac u8, myDecimal binary] — shared by the v1 value datum, the
    key datum (EncodeDecimal is memory-comparable, so key and value
    bytes coincide) and the v2 cell."""
    return (
        f"'{precision:02x}{frac:02x}' || "
        + mydecimal_hex(col, precision, frac)
    )


def json_str_object_hex(key: str, s_expr: str) -> str:
    """Flagged KindMysqlJSON datum hex for the one-STRING-key object
    {key: <s_expr>} — extends the twin's binary-JSON surface beyond
    the fixed-shape int object: the value entry carries
    TypeCodeString (0x0c) with a u32 offset, and the payload is the
    LEB128 byte length followed by the utf-8 bytes, so the total
    size varies per row and is computed in SQL."""
    kb = key.encode("utf-8")
    hdr = 8 + 6 + 5  # header + 1 key entry + 1 value entry
    key_off, val_off = hdr, hdr + len(kb)
    fixed = (
        "0a01"
        + struct_hex_u32le(1)
    )
    # total size = val_off + len(LEB128(n)) + n, little-endian u32
    total = (
        f"({val_off} + length(__jl) // 2 + __jn)"
    )
    tot_le = _xx_let(
        "__t", f"{total}::HUGEINT",
        "array_to_string(list_transform(range(0, 4), "
        "__k -> printf('%02x', ((__t >> (8*__k)::INT) & 255)::BIGINT))"
        ", '')",
    )
    tail = (
        struct_hex_u32le(key_off)
        + struct_hex_u16le(len(kb))
        + "0c"
        + struct_hex_u32le(val_off)
        + kb.hex()
    )
    return _xx_let(
        "__jn", f"octet_length(encode({s_expr}))::UBIGINT",
        _xx_let(
            "__jl", uvarint_hex("__jn"),
            f"('{fixed}' || {tot_le} || '{tail}' || __jl"
            f" || hex(encode({s_expr})))",
        ),
    )


def struct_hex_u32le(n: int) -> str:
    import struct as _s

    return _s.pack("<I", n).hex()


def struct_hex_u16le(n: int) -> str:
    import struct as _s

    return _s.pack("<H", n).hex()


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
    elif t in ("DOUBLE", "FLOAT8", "REAL"):
        body = "'05' || " + float_comparable_hex16(col)
    elif t == "RAWHEX":
        # caller-supplied full flagged-datum hex (e.g. a fixed-shape
        # binary JSON object via json_int_object_hex) — the column
        # expression yields flag + payload directly
        body = col
    elif t == "DURATION_NS":
        # KindMysqlDuration from a signed-nanoseconds BIGINT
        # expression: durationFlag + comparable int64 (codec.go
        # writes EncodeInt for durations in values AND keys)
        body = "'07' || " + hex16_comparable(col)
    elif (pf := _decimal_prec_frac(t)) is not None:
        body = "'06' || " + decimal_datum_payload_hex(col, *pf)
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
    elif t in ("DOUBLE", "FLOAT8", "REAL"):
        body = "'05' || " + float_comparable_hex16(col)
    elif t == "DURATION_NS":
        body = "'07' || " + hex16_comparable(col)
    elif (pf := _decimal_prec_frac(t)) is not None:
        # EncodeDecimal is already memory-comparable — identical
        # bytes in key and value positions (kv_codec encode_key_datum)
        body = "'06' || " + decimal_datum_payload_hex(col, *pf)
    else:
        raise NotImplementedError(
            f"kv duckdb twin: unsupported index type {duck_type}"
        )
    return f"CASE WHEN {col} IS NULL THEN '00' ELSE ({body}) END"


def _le_hex_from_be16(be16_expr: str, w_expr: str) -> str:
    """First ``w`` little-endian bytes of a 16-hex big-endian u64, as
    hex text (byte k from the LSB sits at BE position 15-2k)."""
    return _xx_let(
        "__hx16", be16_expr,
        _xx_let(
            "__wd", w_expr,
            "array_to_string(list_transform(range(0, __wd), "
            "__k -> substr(__hx16, 15 - 2*__k, 2)), '')",
        ),
    )


def _u16le_hex(n_expr: str) -> str:
    return f"printf('%02x%02x', ({n_expr}) % 256, ({n_expr}) // 256)"


def cell_v2_hex(col: str, duck_type: str) -> str:
    """One row-format-v2 CELL payload as hex (kv_codec
    _encode_cell_v2): smallest little-endian signed/unsigned ints,
    comparable big-endian doubles, raw utf-8 bytes, packed-datetime
    uints. NULL handling (id sections, not cells) is the caller's."""
    t = duck_type.upper()
    if t in ("BIGINT", "INTEGER", "INT", "SMALLINT", "TINYINT"):
        u = f"((({col})::HUGEINT + {_M64}) % {_M64})"
        w = (
            f"CASE WHEN {col} >= -128 AND {col} < 128 THEN 1 "
            f"WHEN {col} >= -32768 AND {col} < 32768 THEN 2 "
            f"WHEN {col} >= -2147483648 AND {col} < 2147483648 THEN 4 "
            "ELSE 8 END"
        )
        return _le_hex_from_be16(f"lpad(hex({u}), 16, '0')", w)
    if t == "UINT64":
        u = f"(({col})::HUGEINT)"
        w = (
            f"CASE WHEN {u} < 256 THEN 1 WHEN {u} < 65536 THEN 2 "
            f"WHEN {u} < 4294967296 THEN 4 ELSE 8 END"
        )
        return _le_hex_from_be16(f"lpad(hex({u}), 16, '0')", w)
    if t in ("VARCHAR", "TEXT"):
        return f"hex(encode({col}))"
    if t in ("TIMESTAMP", "DATETIME"):
        return _xx_let(
            "__pd", f"{packed_datetime_expr(col)}::HUGEINT",
            _le_hex_from_be16(
                "lpad(hex(__pd), 16, '0')",
                "CASE WHEN __pd < 256 THEN 1 WHEN __pd < 65536 THEN 2 "
                "WHEN __pd < 4294967296 THEN 4 ELSE 8 END",
            ),
        )
    if t in ("DOUBLE", "FLOAT8", "REAL"):
        # v2 keeps codec.EncodeFloat's comparable big-endian bytes
        return float_comparable_hex16(col)
    if (pf := _decimal_prec_frac(t)) is not None:
        # the design doc keeps EncodeDecimal's payload (precision,
        # frac, myDecimal binary) minus the flag byte
        return f"({decimal_datum_payload_hex(col, *pf)})"
    raise NotImplementedError(
        f"kv duckdb twin: unsupported v2 cell type {duck_type}"
    )


def record_value_v2_hex(
    value_cols: list[tuple[str, str, int, bool]],
) -> str:
    """The row-format-v2 VALUE as hex (kv_codec encode_row_v2, SMALL
    layout): '80' flag byte, u16 LE not-null/null counts, ascending
    not-null then null column ids (CanSkip drops NULLs whose default
    is NULL entirely), u16 LE end offsets per not-null cell, cells.
    value_cols must come ordered by ascending column id (TiDB's ids
    are DDL-positional, so this is the natural order) with every id
    <= 255 — asserted here; the big layout (u32 ids/offsets) stays on
    the Python side."""
    cids = [cid for _, _, cid, _ in value_cols]
    assert cids == sorted(cids), "value_cols must be id-ascending"
    assert all(c <= 0xFF for c in cids), "small layout needs ids <= 255"
    n = len(value_cols)
    # per-column cell hex lets: __vc0.., '' when NULL
    cells = [
        f"CASE WHEN {c} IS NULL THEN '' ELSE ({cell_v2_hex(c, t)}) END"
        for c, t, _, _ in value_cols
    ]
    nn = " + ".join(
        f"CASE WHEN {c} IS NOT NULL THEN 1 ELSE 0 END"
        for c, _, _, _ in value_cols
    )
    nu = " + ".join(
        "0"
        if default_null
        else f"CASE WHEN {c} IS NULL THEN 1 ELSE 0 END"
        for c, _, _, default_null in value_cols
    )
    ids_nn = " || ".join(
        f"CASE WHEN {c} IS NOT NULL THEN '{cid:02x}' ELSE '' END"
        for c, _, cid, _ in value_cols
    )
    ids_null = " || ".join(
        "''"
        if default_null
        else f"CASE WHEN {c} IS NULL THEN '{cid:02x}' ELSE '' END"
        for c, _, cid, default_null in value_cols
    )
    # end offsets: cumulative not-null cell byte lengths, in id order
    offs = []
    for i, (c, _, _, _) in enumerate(value_cols):
        cum = " + ".join(f"length(__vc{j}) // 2" for j in range(i + 1))
        offs.append(
            f"CASE WHEN {c} IS NOT NULL THEN {_u16le_hex(f'({cum})')} "
            "ELSE '' END"
        )
    body = (
        f"'8000' || {_u16le_hex(f'({nn})')} || {_u16le_hex(f'({nu})')}"
        f" || {ids_nn} || {ids_null} || "
        + " || ".join(offs)
        + " || "
        + " || ".join(f"__vc{i}" for i in range(n))
    )
    for i in range(n - 1, -1, -1):
        body = _xx_let(f"__vc{i}", cells[i], body)
    return f"({body})"


def kv_checksum_sql_duckdb(
    table: str,
    handle_col: str,
    value_cols: list[tuple[str, str, int, bool]],
    indexes: list[tuple[int, list[tuple[str, str]], bool]],
    table_id: int = 1,
    row_format_version: int = 1,
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
    if row_format_version == 2:
        rec_val = record_value_v2_hex(value_cols)
    else:
        value_parts = " || ".join(
            datum_hex(c, t, cid, dn) for c, t, cid, dn in value_cols
        )
        # EncodeOldRow empty sentinel: all columns skipped -> NilFlag
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
