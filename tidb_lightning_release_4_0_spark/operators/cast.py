"""T3: MySQL-compatible type casting with strict/lenient SQL modes.

The reference casts every parsed datum with ``table.CastValue`` under
session SQL-mode flags (lightning/backend/sql2kv.go:165-186,
lightning/backend/session.go:95-121): strict mode errors on bad
values, lenient mode truncates/clamps/zeroes with a warning
(behavior matrix exercised by tests/sqlmode/run.sh).

Spark-first design: everything is built-ins inside whole-stage
codegen — ``try_cast``-style parsing via regexp + cast, clamping via
least/greatest, strict-mode errors via ``raise_error`` guarded by a
filter. No Python UDFs in this path.

Documented deviations (SURVEY.md §7 known hard spots):
- MySQL zero-dates (``0000-00-00``) cannot exist in Spark's
  TimestampType; lenient mode maps them to NULL and
  ``format_mysql_datetime`` renders NULL back as the zero-date
  string for MySQL-facing output.
- Lenient float parse of trailing garbage ('12abc' -> 12) keeps the
  longest numeric prefix, like MySQL's truncating conversion.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.schema_reader import _BINARY_TYPES, _STRING_TYPES, ColumnSpec  # noqa: F401

_INT_RANGE = {
    "tinyint": (-128, 127, 255),
    "smallint": (-32768, 32767, 65535),
    "mediumint": (-8388608, 8388607, 16777215),
    "int": (-2147483648, 2147483647, 4294967295),
    "integer": (-2147483648, 2147483647, 4294967295),
    "bigint": (-9223372036854775808, 9223372036854775807, None),
}

_NUM_PREFIX = r"^\s*([+-]?[0-9]+(\.[0-9]*)?([eE][+-]?[0-9]+)?|[+-]?\.[0-9]+([eE][+-]?[0-9]+)?)"


def _numeric_prefix(c: Column) -> Column:
    """Longest numeric prefix of a string (MySQL truncating parse)."""
    return F.nullif(F.regexp_extract(c, _NUM_PREFIX, 1), F.lit(""))


def mysql_cast(
    raw: Column,
    spec: ColumnSpec,
    strict: bool = False,
    source_latin1: bool = False,
    charset: str = "utf8mb4",
) -> Column:
    """Cast a string column to spec's Spark type with MySQL semantics.

    ``source_latin1=True`` marks byte-faithful input (each char is one
    raw byte, from the ISO-8859-1 CSV read): binary columns re-encode
    those chars to the original bytes; text columns re-decode to the
    table charset (utf8mb4 / gb18030 / binary passthrough) — the
    Spark analog of the reference's byte-level parser + per-column
    charset cast.
    """
    t = spec.mysql_type
    dt = spec.spark_type

    if source_latin1:
        if isinstance(dt, T.BinaryType):
            return F.encode(raw, "ISO-8859-1")
        if t in _STRING_TYPES or t in ("enum", "set", "json"):
            cs = charset.lower()
            # ASCII fast path: a byte-faithful (latin1-read) string
            # whose UTF-8 octet count equals its char count is pure
            # ASCII, and the charset round-trip is an identity — skip
            # the two per-row re-encodes (they dominated cast cost on
            # text-heavy tables)
            is_ascii = F.octet_length(raw) == F.length(raw)
            if cs in ("utf8", "utf8mb4", "auto"):
                raw = F.when(is_ascii, raw).otherwise(
                    F.decode(F.encode(raw, "ISO-8859-1"), "UTF-8")
                )
            elif cs == "gb18030":
                raw = F.when(is_ascii, raw).otherwise(
                    F.decode(F.encode(raw, "ISO-8859-1"), "GB18030")
                )
            # 'binary'/'latin1': keep the 1:1 chars as-is

    if t in _INT_RANGE or t in ("bool", "boolean"):
        lo, hi, uhi = _INT_RANGE.get(t, (-128, 127, 255))
        if t == "bigint" and spec.unsigned:
            # uint64: Decimal(20,0), clamp [0, 2^64-1]
            dec = F.try_to_number(F.trim(raw), F.lit("999999999999999999999999"))
            num2 = F.coalesce(dec, _numeric_prefix(raw).cast("decimal(38,4)"))
            # uint64 max exceeds py4j's long; build from a string
            u64_max = F.lit("18446744073709551615").cast("decimal(38,4)")
            # greatest/least SKIP nulls (unlike MySQL), so guard NULL
            # and unparseable explicitly: NULL -> NULL, garbage -> 0
            # (lenient MySQL truncating parse)
            clamped = F.least(
                F.greatest(num2, F.lit(0).cast("decimal(38,4)")), u64_max
            )
            parsed = (
                F.when(raw.isNull(), F.lit(None).cast(dt.simpleString()))
                .when(num2.isNull(), F.lit(0).cast(dt.simpleString()))
                .otherwise(clamped.cast(dt))
            )
            if strict:
                # MySQL strict raises 'Out of range value' BEFORE the
                # clamp ('-1' must error, not become 0), and 'Incorrect
                # integer value' on unparseable input
                bad = raw.isNotNull() & (
                    num2.isNull()
                    | (F.round(num2) < F.lit(0).cast("decimal(38,4)"))
                    | (F.round(num2) > u64_max)
                )
                parsed = F.when(
                    bad,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"[strict sql_mode] bad value for {spec.name}: "
                            ),
                            raw,
                        )
                    ).cast(dt.simpleString()),
                ).otherwise(parsed)
            return parsed
        else:
            if spec.unsigned:
                lo2, hi2 = 0, (uhi if uhi is not None else hi)
            else:
                lo2, hi2 = lo, hi
            # COMPACT expression tree, deliberately: the previous
            # formulation repeated the numeric-prefix regexp ~16x per
            # column, blowing the generated projection method past
            # HotSpot's 8 KB JIT limit — the whole stage then ran
            # INTERPRETED (~3x slower end-to-end ingest). Every
            # subexpression below is referenced at most 3 times.
            #
            # Parse ladder (decimal(38,9) keeps full int64 precision;
            # double would corrupt values near +/-2^63):
            #   fl  — try_cast long: clean integral strings (fast path)
            #   fd  — try_cast decimal: any fully-numeric string
            #         (fractions, exponents); MySQL rounds these
            #   pfx — longest numeric prefix: garbage like '12abc'
            #         (rare; the only regexp, referenced twice)
            fl = raw.try_cast(T.LongType())
            fd = F.trim(raw).try_cast(T.DecimalType(38, 9))
            pfx = _numeric_prefix(raw)
            num = F.coalesce(fd, pfx.try_cast(T.DecimalType(38, 9)))
            lo_d = F.lit(str(lo2)).cast("decimal(38,9)")
            hi_d = F.lit(str(hi2)).cast("decimal(38,9)")
            rounded = F.round(num)  # MySQL rounds fractional strings
            clamped = (
                F.least(F.greatest(rounded, lo_d), hi_d)
                .cast("decimal(20,0)")
                .cast("long")
                .cast(dt)
            )
            # num NULL but prefix non-null => magnitude > 10^29:
            # clamp by sign (MySQL out-of-range clamp in lenient mode)
            parsed = (
                F.when(raw.isNull(), F.lit(None).cast(dt.simpleString()))
                .when(num.isNotNull(), clamped)
                .when(pfx.startswith("-"), F.lit(lo2).cast(dt.simpleString()))
                .when(pfx.isNotNull(), F.lit(hi2).cast(dt.simpleString()))
                # lenient MySQL: unparseable non-null -> 0 with warning
                .otherwise(F.lit(0).cast(dt.simpleString()))
            )
            if strict:
                # strict mode rejects unparseable AND out-of-range,
                # like MySQL's "Out of range value" error
                # (tests/sqlmode strict run)
                bad = raw.isNotNull() & (
                    F.when(
                        num.isNotNull(),
                        (rounded < lo_d) | (rounded > hi_d),
                    ).otherwise(F.lit(True))
                )
                parsed = F.when(
                    bad,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"[strict sql_mode] bad value for {spec.name}: "
                            ),
                            raw,
                        )
                    ).cast(dt.simpleString()),
                ).otherwise(parsed)
            # clean-value fast path: an in-range integral string casts
            # identically under MySQL semantics (no clamp, no error,
            # no fractional rounding). try_cast string->long accepts
            # only [ws][+-]digits[ws] and NULLs on overflow, so
            # fast-path hits are exactly the values both engines
            # agree on.
            fast_ok = fl.isNotNull() & (fl >= F.lit(lo2)) & (fl <= F.lit(hi2))
            return F.when(fast_ok, fl.cast(dt)).otherwise(parsed)

    if t in ("float", "double", "real", "double precision"):
        parsed = _numeric_prefix(raw).cast(dt)
        if strict:
            parsed = _raise_if(parsed, raw, spec.name)
        # clean-value fast path: Java's float parser agrees with the
        # MySQL numeric-prefix parse whenever it yields a finite
        # non-NaN value from a non-hex string ("12f" suffixes parse
        # to the same number; "NaN"/"Infinity"/"0x1.8p1"/overflow are
        # excluded and fall back to the slow path)
        fd = raw.try_cast(dt)
        inf = float("inf")
        # note: plain contains(), not lower().contains() — lower()
        # allocates a new string per row in the hot projection
        fast_ok = (
            fd.isNotNull()
            & ~F.isnan(fd)
            & (fd > F.lit(-inf))
            & (fd < F.lit(inf))
            & ~raw.contains("x")
            & ~raw.contains("X")
        )
        return F.when(fast_ok, fd).otherwise(parsed)

    if t in ("decimal", "numeric", "fixed", "dec"):
        parsed = _numeric_prefix(raw).try_cast(dt)  # rounds to scale
        if strict:
            parsed = _raise_if(parsed, raw, spec.name)
        # fast path: Spark's direct string->decimal parse succeeds
        # only on fully-numeric strings, where it matches the
        # numeric-prefix parse (same HALF_UP scale rounding)
        fd = raw.try_cast(dt)
        return F.when(fd.isNotNull(), fd).otherwise(parsed)

    if t in ("datetime", "timestamp", "date"):
        # try_cast rejects zero-dates ('0000-00-00...' has month 00)
        # by itself, so lenient mode needs no explicit zero-date
        # branch: invalid & zero dates -> NULL (documented deviation),
        # strict mode -> error (sqlmode/run.sh)
        parsed = raw.try_cast(dt)
        if strict:
            parsed = _raise_if(parsed, raw, spec.name)
        return parsed

    if t == "bit":
        # numeric string, 0x-hex literal (from the dump parser), or
        # raw bytes; BIT(n<=64) -> long (tidb.go:181-188 renders as int)
        hexed = F.when(
            raw.rlike("^0x[0-9A-Fa-f]*$"),
            F.conv(F.substring(raw, 3, 16), 16, 10).cast("long"),
        )
        parsed = F.coalesce(
            hexed,
            F.trim(raw).try_cast(T.LongType()),
            F.conv(F.hex(raw.cast("binary")), 16, 10).cast("long"),
        )
        return parsed

    if t in ("enum",):
        # valid member (case-insensitive in MySQL) or numeric ordinal
        members = spec.enum_members
        ordinal = F.trim(raw).try_cast(T.IntegerType())
        arr = F.array(*[F.lit(m) for m in members])
        by_ord = F.when(
            (ordinal >= 1) & (ordinal <= len(members)),
            F.element_at(arr, ordinal),
        )
        low = F.lower(F.trim(raw))
        match = F.array_position(
            F.transform(arr, lambda x: F.lower(x)), low
        )
        by_name = F.when(match > 0, F.element_at(arr, match.cast("int")))
        parsed = F.coalesce(by_name, by_ord)
        if strict:
            parsed = _raise_if(parsed, raw, spec.name)
        else:
            parsed = F.when(raw.isNull(), F.lit(None)).otherwise(
                F.coalesce(parsed, F.lit(""))  # invalid -> '' (ordinal 0)
            )
        return parsed

    if t in ("set",):
        members = spec.enum_members
        arr = F.array(*[F.lit(m) for m in members])
        low_members = F.transform(arr, lambda x: F.lower(x))
        toks = F.when(F.trim(raw) == "", F.array().cast("array<string>")).otherwise(
            F.split(F.trim(raw), ",")
        )
        # keep members in definition order that appear in the value
        kept = F.filter(
            arr,
            lambda m: F.array_contains(
                F.transform(toks, lambda s: F.lower(F.trim(s))), F.lower(m)
            ),
        )
        valid = F.size(
            F.filter(
                toks,
                lambda s: ~F.array_contains(low_members, F.lower(F.trim(s))),
            )
        ) == 0
        # numeric input = the member BITMASK (MySQL casts ints to SET
        # by bits; the reference's vt.enum-set fixture inserts the
        # uint64 11937444798263156608). Up to 64 members, so split the
        # Decimal(20,0) mask into two longs for the bit tests.
        mask = F.trim(raw).try_cast(T.DecimalType(20, 0))
        # both halves < 2^32, so the double-pow bit probe is exact
        mask_lo = (mask % F.lit(4294967296)).cast("double")
        # subtract the low half first: decimal division of an exact
        # multiple is exact (a bare decimal cast would ROUND, not floor)
        mask_hi = (
            (mask - mask % F.lit(4294967296)) / F.lit(4294967296)
        ).cast("double")
        by_mask = F.concat_ws(
            ",",
            F.filter(
                arr,
                lambda m, i: (
                    F.floor(
                        F.when(i < 32, mask_lo).otherwise(mask_hi)
                        / F.pow(
                            F.lit(2.0),
                            F.when(i < 32, i).otherwise(i - F.lit(32)),
                        )
                    )
                    % 2
                    == 1
                ),
            ),
        )
        # name match first (ParseSet tries names before numbers, so a
        # member literally named "123" still wins), then the bitmask
        parsed = F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(valid, F.concat_ws(",", kept)).when(
                mask.isNotNull(), by_mask
            )
        )
        if strict:
            parsed = _raise_if(parsed, raw, spec.name)
        else:
            parsed = F.when(raw.isNull(), F.lit(None)).otherwise(
                F.coalesce(parsed, F.lit(""))
            )
        return parsed

    if isinstance(dt, T.BinaryType):
        # 0x-hex literals from the dump parser decode to bytes
        # (parser.go:474-485); plain strings encode as UTF-8
        hexpart = F.substring(raw, 3, 1 << 30)
        padded = F.when(
            F.length(hexpart) % 2 == 1, F.concat(F.lit("0"), hexpart)
        ).otherwise(hexpart)
        return F.when(
            raw.rlike("^0x[0-9A-Fa-f]*$"), F.unhex(padded)
        ).otherwise(raw.cast("binary"))

    if t == "json":
        # validated canonical JSON string; invalid -> NULL (lenient) / error
        parsed = F.when(
            F.try_parse_json(raw).isNotNull(), raw
        ).otherwise(F.lit(None).cast("string"))
        if strict:
            parsed = _raise_if(parsed, raw, spec.name)
        return parsed

    if t == "year":
        y = F.trim(raw).try_cast(T.IntegerType())
        # MySQL YEAR: 2-digit 0-69 -> 2000s, 70-99 -> 1900s
        parsed = F.when((y >= 0) & (y <= 69) & (F.length(F.trim(raw)) <= 2), y + 2000) \
            .when((y >= 70) & (y <= 99) & (F.length(F.trim(raw)) <= 2), y + 1900) \
            .otherwise(y)
        return parsed.cast(dt)

    # string family: identity
    return raw.cast("string")


def _raise_if(parsed: Column, raw: Column, colname: str) -> Column:
    bad = raw.isNotNull() & parsed.isNull()
    return F.when(
        bad,
        F.raise_error(
            F.concat(F.lit(f"[strict sql_mode] bad value for {colname}: "), raw)
        ),
    ).otherwise(parsed)


def format_mysql_datetime(c: Column) -> Column:
    """Render a timestamp for MySQL-facing output; NULL (from a
    lenient zero-date) renders as the zero-date string."""
    return F.coalesce(
        F.date_format(c, "yyyy-MM-dd HH:mm:ss"), F.lit("0000-00-00 00:00:00")
    )
