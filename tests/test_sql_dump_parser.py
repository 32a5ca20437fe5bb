"""Table-driven unit tests for the mydumper .sql lexer — the pytest
twin of lightning/mydump/parser_test.go (860 lines: INSERT lexing,
hex/bin literals, premature EOF, keywords-as-comments)."""

from __future__ import annotations

from tidb_lightning_release_4_0_spark.sources.sql_dump_source import (
    parse_insert_statements,
)


def parse_all(text: str, backslash: bool = True):
    return list(parse_insert_statements(text, backslash))


def rows_of(text: str):
    out = []
    for _, rows in parse_all(text):
        out.extend(rows)
    return out


def test_basic_insert():
    got = parse_all("INSERT INTO t VALUES (1, 'a'), (2, 'b');")
    assert got == [(None, [["1", "a"], ["2", "b"]])]


def test_column_list():
    cols, rows = parse_all(
        "INSERT INTO `t` (`a`, b, `weird``name`) VALUES (1, 2, 3);"
    )[0]
    assert cols == ["a", "b", "weird`name"]
    assert rows == [["1", "2", "3"]]


def test_literals():
    (_, rows), = parse_all(
        "INSERT INTO t VALUES (NULL, TRUE, FALSE, -123, 4.5, 1e10, .5);"
    )
    assert rows == [[None, "1", "0", "-123", "4.5", "1e10", ".5"]]


def test_hex_bin_literals():
    # parser.go:474-485 / parser.rl:64-65
    (_, rows), = parse_all(
        "INSERT INTO t VALUES (0xABcd, x'ff00', X'', 0b101, b'1', b'');"
    )
    assert rows == [["0xABCD", "0xFF00", "0x", "0x5", "0x1", "0x"]]


def test_string_escapes():
    (_, rows), = parse_all(
        r"INSERT INTO t VALUES ('a\nb', 'it''s', 'q\'q', 'tab\there', '\Z');"
    )
    assert rows == [["a\nb", "it's", "q'q", "tab\there", "\x1a"]]


def test_no_backslash_escapes_mode():
    # NO_BACKSLASH_ESCAPES: backslash is a plain char (parser.go:motes)
    (_, rows), = parse_all(
        r"INSERT INTO t VALUES ('a\nb', 'it''s');", backslash=False
    )
    assert rows == [["a\\nb", "it's"]]


def test_double_quoted_strings():
    (_, rows), = parse_all('INSERT INTO t VALUES ("x", "do""ble");')
    assert rows == [["x", 'do"ble']]


def test_non_insert_statements_skipped():
    # tolerant lexer: DDL/SET are treated like comments (parser.rl)
    text = """
    /*!40101 SET NAMES binary*/;
    DROP TABLE IF EXISTS `t`;
    CREATE TABLE t (x INT) /* inline comment */;
    -- a line comment with INSERT INTO words that must not trigger
    INSERT INTO t VALUES (7);
    ANALYZE TABLE t;
    INSERT INTO t VALUES (8);
    """
    assert rows_of(text) == [["7"], ["8"]]


def test_multiple_statements_and_replace():
    text = (
        "INSERT INTO a VALUES (1);\n"
        "REPLACE INTO b VALUES (2);\n"
        "INSERT INTO c (x) VALUES (3);"
    )
    got = parse_all(text)
    assert [r for _, rows in got for r in rows] == [["1"], ["2"], ["3"]]
    assert got[2][0] == ["x"]


def test_missing_semicolon_resync():
    # next INSERT begins before ';' — parser must resync
    text = "INSERT INTO a VALUES (1)\nINSERT INTO a VALUES (2);"
    assert rows_of(text) == [["1"], ["2"]]


def test_premature_eof():
    # parser_test.go exercises EOF mid-tuple: yield what was complete
    assert rows_of("INSERT INTO t VALUES (1, 'a'), (2,") == [["1", "a"]]


def test_values_keyword_caseless_and_value():
    assert rows_of("insert into t value (9);") == [["9"]]
    assert rows_of("InSeRt InTo t VaLuEs (10);") == [["10"]]


def test_strings_with_separators_inside():
    (_, rows), = parse_all(
        "INSERT INTO t VALUES ('a,b', 'c)d', '(e', ';f');"
    )
    assert rows == [["a,b", "c)d", "(e", ";f"]]


def test_comments_inside_statement():
    assert rows_of(
        "INSERT INTO t /* c */ VALUES /* c2 */ (1), -- tail\n (2);"
    ) == [["1"], ["2"]]


def test_unicode_values():
    (_, rows), = parse_all("INSERT INTO t VALUES ('中文', '🙂');")
    assert rows == [["中文", "🙂"]]


# -- fast path & byte-range split --------------------------------------------


def test_fast_path_equals_tokenizer_on_tricky_inputs():
    from tidb_lightning_release_4_0_spark.sources.sql_dump_source import (
        _parse_insert_statements_slow,
        parse_insert_statements,
    )

    cases = [
        "INSERT INTO `db`.`t` (a,`b`) VALUES (NULL,TRUE),(FALSE,-1.5e3);",
        r"INSERT INTO t VALUES ('it''s','a\nb'),('c\\d','e');",
        "INSERT INTO t VALUES (0x1A2b, x'4F', b'101', 0b11, x'', b'');",
        "-- c\nINSERT /*x*/ INTO t VALUES ('a;b','c,(d)');",
        "CREATE TABLE x (a int);\nINSERT INTO x VALUES (1);\nSET foo=1;",
        "INSERT INTO t VALUES (1,'a') ON DUPLICATE KEY UPDATE a=1;",
        'INSERT INTO t VALUES ("dq''","x""y");',
        "insert into t values (1),(2) insert into t values (3);",
    ]
    for c in cases:
        assert list(parse_insert_statements(c)) == list(
            _parse_insert_statements_slow(c)
        ), c
    for c in [r"INSERT INTO t VALUES ('a\nb','c''d');"]:
        assert list(parse_insert_statements(c, False)) == list(
            _parse_insert_statements_slow(c, False)
        )


def test_byte_range_split_matches_whole_file(spark, tmp_path):
    """Chunked .sql reads must yield identical field rows with unique
    ids for any split size, including splits landing mid-statement and
    mid-string."""
    import random

    from tidb_lightning_release_4_0_spark.sources.sql_dump_source import (
        read_sql_dump,
    )

    rng = random.Random(7)
    stmts = []
    for s in range(40):
        vals = ",".join(
            "(%d,'%s')"
            % (s * 100 + i, "v" + "x" * rng.randrange(0, 30) + "'',)(")
            for i in range(rng.randrange(1, 50))
        )
        stmts.append(f"INSERT INTO t VALUES {vals};")
    p = tmp_path / "tpch.t.sql"
    p.write_text("\n".join(stmts), encoding="utf-8")
    sz = p.stat().st_size
    files = [(str(p), sz)]

    def fetch(split):
        df = read_sql_dump(spark, files, "auto", num_columns=2, split_bytes=split)
        rows = df.collect()
        return (
            [r["_row_id"] for r in rows],
            sorted(tuple(r["_fields"]) for r in rows),
        )

    ids_w, f_w = fetch(sz * 2)
    for split in (256, 1000, sz // 3):
        ids, f = fetch(split)
        assert len(set(ids)) == len(ids) == len(ids_w)
        assert f == f_w, f"split={split} diverged"
