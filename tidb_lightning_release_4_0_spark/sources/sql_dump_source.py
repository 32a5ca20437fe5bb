"""S3/T1/T2: mydumper ``.sql`` dump source.

Spark has no built-in reader for mydumper dumps (``INSERT INTO tbl
(cols) VALUES (...),(...);`` text). The reference lexes them with a
Ragel state machine (lightning/mydump/parser.rl:36-160,
parser.go:293-495) that is *tolerant*: anything that is not an INSERT
statement (DDL, SET, comments) is skipped; literals are typed
(parser.go:442-493) and unescaped (parser.go:244-290).

This module re-expresses that as a Python tokenizer (regex DFA — the
moral equivalent of the Ragel-generated scanner) run inside
``mapInPandas`` over a plan-time DataFrame of file paths: one task
per data file, matching the reference's one-TableRegion-per-file
parallelization (lightning/mydump/region.go:135-176). mydumper
splits large tables into many ``{db}.{tbl}.{part}.sql`` files, so
file-level fan-out is the natural 100 TB strategy; rows never touch
the driver.

Row representation: ``array<string>`` in canonical text form —
NULL -> None, TRUE/FALSE -> '1'/'0', numbers as written, strings
unescaped, hex/bin literals -> ``0x<HEX>`` (the cast layer decodes
them for binary columns). Deterministic per-file row-id bases are
reserved at plan time like PrevRowIDMax chaining
(region.go:146-170), using file size as a safe upper bound on rows.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*|\#[^\n]*|/\*.*?\*/)
  | (?P<str>'(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.|"")*")
  | (?P<bq>`(?:[^`]|``)*`)
  | (?P<hex>0[xX][0-9a-fA-F]+|[xX]'[0-9a-fA-F]*')
  | (?P<bin>0[bB][01]+|[bB]'[01]*')
  | (?P<num>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
  | (?P<word>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<punct>.)
    """,
    re.S | re.X,
)

_TOKEN_NOESC = re.compile(
    # NO_BACKSLASH_ESCAPES flavor: backslash is literal in strings
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*|\#[^\n]*|/\*.*?\*/)
  | (?P<str>'(?:[^']|'')*'|"(?:[^"]|"")*")
  | (?P<bq>`(?:[^`]|``)*`)
  | (?P<hex>0[xX][0-9a-fA-F]+|[xX]'[0-9a-fA-F]*')
  | (?P<bin>0[bB][01]+|[bB]'[01]*')
  | (?P<num>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
  | (?P<word>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<punct>.)
    """,
    re.S | re.X,
)

_ESCAPES = {
    "0": "\0", "b": "\b", "n": "\n", "r": "\r", "t": "\t",
    "Z": "\x1a", "\\": "\\", "'": "'", '"': '"', "%": "\\%", "_": "\\_",
}


def _unescape(body: str, quote: str, backslash: bool) -> str:
    """T2: MySQL string unescape (parser.go:244-290)."""
    body = body.replace(quote + quote, quote)
    if backslash:
        body = re.sub(
            r"\\(.)", lambda m: _ESCAPES.get(m.group(1), m.group(1)), body, flags=re.S
        )
    return body


def parse_insert_statements(
    text: str, backslash_escape: bool = True
) -> Iterator[tuple[list[str] | None, list[list[str | None]]]]:
    """Yield (column_list_or_None, rows) per INSERT statement.

    Tolerant like the reference: non-INSERT statements are skipped
    (parser.rl:139-152 treats unknown keywords as comments).
    """
    tok = _TOKEN if backslash_escape else _TOKEN_NOESC
    pos, n = 0, len(text)
    # state: scan for INSERT/REPLACE ... VALUES
    while pos < n:
        m = tok.match(text, pos)
        if not m:
            pos += 1
            continue
        pos = m.end()
        kind = m.lastgroup
        if kind != "word":
            continue
        if m.group("word").upper() not in ("INSERT", "REPLACE"):
            continue
        # scan forward for VALUES/VALUE, collecting a possible (col,..)
        cols: list[str] | None = None
        pending: list[str] = []
        in_parens = False
        found_values = False
        while pos < n:
            m = tok.match(text, pos)
            if not m:
                pos += 1
                continue
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            if kind == "word":
                w = m.group("word").upper()
                if w in ("VALUES", "VALUE") and not in_parens:
                    found_values = True
                    break
                if in_parens:
                    pending.append(m.group("word"))
                continue
            if kind == "bq" and in_parens:
                pending.append(m.group("bq")[1:-1].replace("``", "`"))
                continue
            if kind == "punct":
                p = m.group("punct")
                if p == "(" and not in_parens:
                    in_parens, pending = True, []
                elif p == ")" and in_parens:
                    in_parens, cols = False, pending
                elif p == ";":
                    break
            # anything else inside the header is ignored
        if not found_values:
            continue
        rows, pos = _parse_tuples(text, pos, tok, backslash_escape)
        yield cols, rows


def _parse_tuples(
    text: str, pos: int, tok: re.Pattern, backslash: bool
) -> tuple[list[list[str | None]], int]:
    """Parse (v,v,..),(v,..)...; returning (rows, end_pos)."""
    n = len(text)
    rows: list[list[str | None]] = []
    row: list[str | None] = []
    depth = 0
    while pos < n:
        m = tok.match(text, pos)
        if not m:
            pos += 1
            continue
        kind = m.lastgroup
        if depth == 0 and kind == "word" and m.group("word").upper() in (
            "INSERT",
            "REPLACE",
        ):
            # missing ';' before the next statement: rewind, end here
            return rows, pos
        pos = m.end()
        if kind in ("ws", "comment"):
            continue
        if kind == "punct":
            p = m.group("punct")
            if p == "(":
                depth += 1
                if depth == 1:
                    row = []
                continue
            if p == ")":
                depth -= 1
                if depth == 0:
                    rows.append(row)
                continue
            if p == ",":
                continue
            if p == ";":
                return rows, pos
            continue
        if depth == 0:
            # junk between tuples (e.g. ON DUPLICATE KEY ...) — skip
            continue
        # T1: literal typing (parser.go:442-493)
        if kind == "str":
            s = m.group("str")
            row.append(_unescape(s[1:-1], s[0], backslash))
        elif kind == "num":
            row.append(m.group("num"))
        elif kind == "word":
            w = m.group("word").upper()
            if w == "NULL":
                row.append(None)
            elif w == "TRUE":
                row.append("1")
            elif w == "FALSE":
                row.append("0")
            else:
                row.append(m.group("word"))
        elif kind == "hex":
            h = m.group("hex")
            digits = h[2:] if h[1] in "xX" and h[0] == "0" else h[2:-1]
            row.append("0x" + digits.upper())
        elif kind == "bin":
            b = m.group("bin")
            digits = b[2:] if b[1] in "bB" and b[0] == "0" else b[2:-1]
            row.append("0x%X" % int(digits, 2) if digits else "0x")
        elif kind == "bq":
            row.append(m.group("bq")[1:-1].replace("``", "`"))
    return rows, pos


def _decode(raw: bytes, character_set: str) -> str:
    cs = character_set.lower()
    if cs in ("utf8", "utf8mb4"):
        return raw.decode("utf-8")
    if cs == "gb18030":
        return raw.decode("gb18030")
    if cs == "binary":
        return raw.decode("latin-1")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        try:
            return raw.decode("gb18030")
        except UnicodeDecodeError:
            return raw.decode("latin-1")


OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("_file", T.StringType(), False),
        T.StructField("_row_id", T.LongType(), False),
        T.StructField("_columns", T.ArrayType(T.StringType()), True),
        T.StructField("_fields", T.ArrayType(T.StringType()), True),
    ]
)


def read_sql_dump(
    spark: SparkSession,
    files: list[tuple[str, int]],
    character_set: str = "auto",
    backslash_escape: bool = True,
    num_columns: int | None = None,
) -> DataFrame:
    """Parse mydumper .sql data files into (file, row_id, fields) rows.

    ``files``: (path, size) pairs from the discovery step. Row-id
    bases are reserved per file at plan time with the reference's
    size/divisor estimate (divisor = #cols + 2 for .sql,
    region.go:146-170): ids are unique + deterministic, dense within
    a file, bounded gaps between files.
    """
    from ..operators.rowid import file_row_bases

    base_map = file_row_bases(files, num_columns or 0, is_sql=True)

    plan = spark.createDataFrame(
        [(p, base_map[p]) for p, _ in files],
        T.StructType(
            [
                T.StructField("path", T.StringType(), False),
                T.StructField("base", T.LongType(), False),
            ]
        ),
    ).repartition(max(len(files), 1))

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, rid_base in zip(pdf["path"], pdf["base"]):
                raw = open(path, "rb").read()
                text = _decode(raw, character_set)
                out_file, out_rid, out_cols, out_fields = [], [], [], []
                rid = int(rid_base)
                for cols, rows in parse_insert_statements(
                    text, backslash_escape
                ):
                    for r in rows:
                        rid += 1
                        out_file.append(path)
                        out_rid.append(rid)
                        out_cols.append(cols)
                        out_fields.append(r)
                yield pd.DataFrame(
                    {
                        "_file": out_file,
                        "_row_id": out_rid,
                        "_columns": out_cols,
                        "_fields": out_fields,
                    }
                )

    return plan.mapInPandas(parse_files, schema=OUTPUT_SCHEMA)


def project_fields(df: DataFrame, num_columns: int) -> DataFrame:
    """Explode the _fields array into positional string columns."""
    cols = [
        F.col("_fields").getItem(i).alias(f"_c{i}") for i in range(num_columns)
    ]
    return df.select(F.col("_row_id"), *cols)
