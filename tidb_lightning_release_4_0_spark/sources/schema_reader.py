"""Schema-file reading (S2) and MySQL DDL -> Spark StructType.

The reference reads ``*-schema.sql`` files, strips comments, decodes
charset with UTF-8 -> GB18030 fallback (ExportStatement,
lightning/mydump/reader.go:35-114), parses the DDL with the TiDB
parser and uses the resulting TableInfo as the authoritative schema
(lightning/restore/tidb.go:129-208). Schemas are fixed and
DDL-driven, never inferred (SURVEY.md §1.3).

Here: a self-contained MySQL CREATE TABLE parser producing
``TableSchema`` (column specs + StructType + pk/index info). Type
mapping follows SURVEY.md §1.2, notably BIGINT UNSIGNED ->
DecimalType(20,0) for uint64 fidelity (tests/various_types
``precise_types`` requires 18446744073709551614 to round-trip).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# S2: statement reader with charset fallback (reader.go:35-65)
# ---------------------------------------------------------------------------


def export_statement(path: str, character_set: str = "auto") -> str:
    """Read a schema file to one SQL string, mirroring ExportStatement:
    join lines, drop ``/*..*/`` blocks and ``--`` comments, decode
    charset (auto = UTF-8 then GB18030 fallback; binary = latin-1
    passthrough keeping raw bytes)."""
    raw = open(path, "rb").read()
    cs = character_set.lower()
    if cs in ("utf8", "utf8mb4"):
        text = raw.decode("utf-8")  # hard error on bad data, like the ref
    elif cs == "gb18030":
        text = raw.decode("gb18030")
    elif cs == "binary":
        text = raw.decode("latin-1")
    else:  # auto: utf8 -> gb18030 -> binary (reader.go:40-61)
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            try:
                text = raw.decode("gb18030")
            except UnicodeDecodeError:
                text = raw.decode("latin-1")
    # strip /* ... */ blocks and line comments, preserve quoted strings
    out: list[str] = []
    i, n = 0, len(text)
    in_str: str | None = None
    while i < n:
        ch = text[i]
        if in_str:
            out.append(ch)
            if ch == "\\" and in_str != "`" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if ch == in_str:
                in_str = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            in_str = ch
            out.append(ch)
            i += 1
            continue
        if ch == "/" and text[i : i + 2] == "/*":
            end = text.find("*/", i + 2)
            i = n if end < 0 else end + 2
            continue
        if ch == "-" and text[i : i + 2] == "--":
            end = text.find("\n", i)
            i = n if end < 0 else end
            continue
        out.append(ch)
        i += 1
    return "".join(out).strip()


# ---------------------------------------------------------------------------
# MySQL type -> Spark type
# ---------------------------------------------------------------------------

_INT_TYPES = {
    "tinyint": (T.ByteType, T.ShortType),
    "smallint": (T.ShortType, T.IntegerType),
    "mediumint": (T.IntegerType, T.IntegerType),
    "int": (T.IntegerType, T.LongType),
    "integer": (T.IntegerType, T.LongType),
    "bigint": (T.LongType, None),  # unsigned handled specially
}

_STRING_TYPES = {
    "char", "varchar", "tinytext", "text", "mediumtext", "longtext",
}
_BINARY_TYPES = {
    "binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob",
}


@dataclass
class ColumnSpec:
    name: str
    mysql_type: str  # normalized base type, e.g. "bigint"
    spark_type: T.DataType
    nullable: bool = True
    unsigned: bool = False
    default: object | None = None  # parsed literal
    has_default: bool = False
    default_current_ts: bool = False
    auto_increment: bool = False
    enum_members: list[str] = field(default_factory=list)
    type_args: tuple[int, ...] = ()  # (p,s) / length / fsp

    def struct_field(self) -> T.StructField:
        return T.StructField(self.name, self.spark_type, self.nullable)


@dataclass
class IndexSpec:
    name: str
    columns: list[str]
    unique: bool = False
    primary: bool = False
    # per-column prefix lengths (`KEY k (col(10))`): None = whole
    # column; parallel to `columns`. TiDB truncates utf8 index
    # datums to this many CHARACTERS (TruncateIndexValue), which the
    # KV-parity checksum mirrors.
    prefix_lens: list = field(default_factory=list)

    def prefix_len(self, i: int):
        return self.prefix_lens[i] if i < len(self.prefix_lens) else None


@dataclass
class TableSchema:
    name: str
    columns: list[ColumnSpec]
    indexes: list[IndexSpec] = field(default_factory=list)
    partitioned: bool = False
    # hash/key partitioning spec (PARTITION BY HASH(col) PARTITIONS n,
    # tests/partitioned-table): the sink maps it to a partitioned
    # output layout; range/list clauses only set `partitioned`
    partition_col: str | None = None
    partition_count: int = 0
    # verbatim CREATE TABLE text (K5 schema passthrough); set by
    # load_table_schema so the pipeline needn't re-read the file
    raw_ddl: str | None = None

    @property
    def struct_type(self) -> T.StructType:
        return T.StructType([c.struct_field() for c in self.columns])

    @property
    def primary_key(self) -> list[str]:
        for ix in self.indexes:
            if ix.primary:
                return ix.columns
        for c in self.columns:
            if getattr(c, "_inline_pk", False):
                return [c.name]
        return []

    @property
    def auto_increment_column(self) -> str | None:
        for c in self.columns:
            if c.auto_increment:
                return c.name
        return None

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name.lower() == name.lower():
                return c
        raise KeyError(name)

    @property
    def has_int_pk(self) -> bool:
        """PK-is-handle: single-column integer primary key.

        Determines whether a hidden ``_tidb_rowid`` is synthesized
        (lightning/backend/sql2kv.go:167-200, SURVEY.md §2.3 T5).
        """
        pk = self.primary_key
        if len(pk) != 1:
            return False
        c = self.column(pk[0])
        return c.mysql_type in _INT_TYPES and not (
            c.mysql_type == "bigint" and c.unsigned
        )


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on sep at paren depth 0, respecting quotes/backquotes."""
    parts, buf, depth, in_str = [], [], 0, None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if in_str:
            buf.append(ch)
            if ch == "\\" and in_str != "`" and i + 1 < n:
                buf.append(s[i + 1])
                i += 2
                continue
            if ch == in_str:
                # doubled quote escape ('' or ``)
                if i + 1 < n and s[i + 1] == in_str:
                    buf.append(s[i + 1])
                    i += 2
                    continue
                in_str = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            in_str = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    if "".join(buf).strip():
        parts.append("".join(buf).strip())
    return parts


def _unquote_ident(s: str) -> str:
    s = s.strip()
    if s.startswith("`") and s.endswith("`"):
        return s[1:-1].replace("``", "`")
    return s


def _parse_string_literal(s: str) -> str:
    q = s[0]
    body = s[1:-1]
    body = body.replace(q + q, q)
    body = re.sub(
        r"\\(.)",
        lambda m: {
            "0": "\0", "b": "\b", "n": "\n", "r": "\r",
            "t": "\t", "Z": "\x1a", "\\": "\\", "'": "'", '"': '"',
        }.get(m.group(1), m.group(1)),
        body,
    )
    return body


def _map_type(
    base: str, args: list[str], unsigned: bool
) -> tuple[T.DataType, tuple[int, ...], list[str]]:
    base = base.lower()
    members: list[str] = []
    targs: tuple[int, ...] = ()
    if base in _INT_TYPES:
        if base == "bigint" and unsigned:
            return T.DecimalType(20, 0), (), []
        signed, up = _INT_TYPES[base]
        return (up() if unsigned and up else signed()), (), []
    if base in ("bool", "boolean"):
        return T.ByteType(), (), []
    if base in ("float",):
        return T.FloatType(), (), []
    if base in ("double", "real", "double precision"):
        return T.DoubleType(), (), []
    if base in ("decimal", "numeric", "fixed", "dec"):
        p = int(args[0]) if args else 10
        s = int(args[1]) if len(args) > 1 else 0
        return T.DecimalType(p, s), (p, s), []
    if base in _STRING_TYPES:
        ln = int(args[0]) if args and args[0].isdigit() else 0
        return T.StringType(), ((ln,) if ln else ()), []
    if base in _BINARY_TYPES:
        ln = int(args[0]) if args and args[0].isdigit() else 0
        return T.BinaryType(), ((ln,) if ln else ()), []
    if base == "bit":
        return T.LongType(), (int(args[0]) if args else 1,), []
    if base == "date":
        return T.DateType(), (), []
    if base in ("datetime", "timestamp"):
        fsp = int(args[0]) if args else 0
        return T.TimestampType(), (fsp,), []
    if base == "time":
        return T.StringType(), (), []  # canonical 'HH:MM:SS' string
    if base == "year":
        return T.IntegerType(), (), []
    if base in ("enum", "set"):
        members = [_parse_string_literal(a.strip()) for a in args]
        return T.StringType(), (), members
    if base == "json":
        return T.StringType(), (), []
    # unknown: keep as string (tolerant, like the ref's permissive parse)
    return T.StringType(), (), []


# unquoted identifiers may contain any unicode word char (MySQL
# allows e.g. Chinese column names — tests/character_sets)
_COL_START = re.compile(
    r"^(`[^`]+(?:``[^`]*)*`|[A-Za-z_-￿][\w$-￿]*)\s+(.*)$",
    re.S | re.UNICODE,
)
_TYPE_RE = re.compile(
    r"^([A-Za-z]+(?:\s+precision)?)\s*(\(((?:[^()']|'(?:[^'\\]|\\.)*')*)\))?\s*(.*)$",
    re.S | re.I,
)

_KEY_PREFIXES = (
    "primary key", "unique key", "unique index", "key ", "key(",
    "index ", "index(", "fulltext", "spatial", "constraint", "foreign key",
    "check ", "check(", "unique (",
)


def parse_create_table(sql: str) -> TableSchema:
    """Parse one CREATE TABLE statement into a TableSchema."""
    m = re.search(
        r"create\s+table\s+(?:if\s+not\s+exists\s+)?(.+?)\s*\(",
        sql, re.I | re.S,
    )
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    tbl_name = _unquote_ident(m.group(1).split(".")[-1])
    body_start = m.end() - 1
    # find matching close paren
    depth, i, in_str = 0, body_start, None
    n = len(sql)
    while i < n:
        ch = sql[i]
        if in_str:
            if ch == "\\" and in_str != "`":
                i += 2
                continue
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"', "`"):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = sql[body_start + 1 : i]
    tail = sql[i + 1 :]

    cols: list[ColumnSpec] = []
    indexes: list[IndexSpec] = []

    for item in _split_top_level(body):
        low = item.lower().lstrip()
        if any(low.startswith(p) for p in _KEY_PREFIXES) or low.startswith(
            ("primary", "unique")
        ):
            ix = _parse_index(item)
            if ix:
                indexes.append(ix)
            continue
        cm = _COL_START.match(item.strip())
        if not cm:
            continue
        name = _unquote_ident(cm.group(1))
        rest = cm.group(2).strip()
        tm = _TYPE_RE.match(rest)
        if not tm:
            continue
        base = tm.group(1).lower()
        raw_args = tm.group(3)
        args = _split_top_level(raw_args) if raw_args else []
        attrs = tm.group(4) or ""
        attrs_low = attrs.lower()
        unsigned = bool(re.search(r"\bunsigned\b", attrs_low))
        dtype, targs, members = _map_type(base, args, unsigned)
        spec = ColumnSpec(
            name=name,
            mysql_type=base,
            spark_type=dtype,
            unsigned=unsigned,
            enum_members=members,
            type_args=targs,
        )
        if re.search(r"\bnot\s+null\b", attrs_low):
            spec.nullable = False
        if re.search(r"\bauto_increment\b", attrs_low):
            spec.auto_increment = True
        if re.search(r"\bprimary\s+key\b", attrs_low):
            spec._inline_pk = True  # type: ignore[attr-defined]
            spec.nullable = False
            indexes.append(IndexSpec("PRIMARY", [name], True, True))
        elif re.search(r"\bunique\b", attrs_low):
            # inline UNIQUE column attribute creates a unique index
            # (various_types' `enum ... NOT NULL UNIQUE`) — without it
            # the KV-parity checksum misses that index's KVs
            indexes.append(IndexSpec(name, [name], True, False))
        dm = re.search(
            r"\bdefault\s+('(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.|\"\")*\""
            r"|current_timestamp(?:\s*\(\d*\))?|[^\s,]+)",
            attrs, re.I,
        )
        if dm:
            spec.has_default = True
            dv = dm.group(1)
            if dv.lower().startswith("current_timestamp"):
                spec.default_current_ts = True
            elif dv.upper() == "NULL":
                spec.default = None
            elif dv[0] in "'\"":
                spec.default = _parse_string_literal(dv)
            else:
                try:
                    spec.default = int(dv)
                except ValueError:
                    try:
                        spec.default = float(dv)
                    except ValueError:
                        spec.default = dv
        cols.append(spec)

    # hash/key partitioning maps to a partitioned sink layout; the
    # clause itself never affects row values (the reference loads
    # partitioned targets transparently, tests/partitioned-table)
    pm = re.search(
        r"\bpartition\s+by\s+(?:linear\s+)?(hash|key)\s*\(\s*`?(\w+)`?\s*\)"
        r"\s*(?:partitions\s+(\d+))?",
        tail,
        re.I,
    )
    return TableSchema(
        name=tbl_name,
        columns=cols,
        indexes=indexes,
        partitioned=bool(re.search(r"\bpartition\s+by\b", tail, re.I)),
        partition_col=pm.group(2) if pm else None,
        partition_count=int(pm.group(3) or 0) if pm else 0,
    )


def _parse_index(item: str) -> IndexSpec | None:
    low = item.lower()
    primary = low.startswith("primary")
    unique = primary or low.startswith("unique")
    # outermost paren group (columns may carry prefix lengths `c`(10))
    start, end = item.find("("), item.rfind(")")
    if start < 0 or end <= start:
        return None
    raw_cols = _split_top_level(item[start + 1 : end])
    cols = [
        # strip prefix lengths like `col`(10) and sort order
        _unquote_ident(re.sub(r"\(\d+\)|\s+(asc|desc)$", "", c.strip(), flags=re.I))
        for c in raw_cols
    ]
    prefix_lens = [
        (int(m.group(1)) if (m := re.search(r"\((\d+)\)", c)) else None)
        for c in raw_cols
    ]
    nm = re.match(
        r"(?:unique\s+)?(?:key|index)\s+(`[^`]+`|[A-Za-z_][A-Za-z0-9_$]*)",
        item.strip(), re.I,
    )
    name = "PRIMARY" if primary else (_unquote_ident(nm.group(1)) if nm else "")
    return IndexSpec(
        name=name, columns=cols, unique=unique, primary=primary,
        prefix_lens=prefix_lens,
    )


def load_table_schema(path: str, character_set: str = "auto") -> TableSchema:
    ddl = export_statement(path, character_set)
    schema = parse_create_table(ddl)
    schema.raw_ddl = ddl  # K5 passthrough: no second file read/decode
    return schema
