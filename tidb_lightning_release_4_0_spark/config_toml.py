"""TOML task-file loader — the ``tidb-lightning -config task.toml``
surface.

Parses the reference's TOML layout (lightning/config/config.go:83-160,
tidb-lightning.toml) into a ``Config``, with the reference's
unused-key check: unknown sections or keys FAIL the load, listing
every offender (lightning/config/config.go:300-320 strict decoding;
tests/unused_config_keys/run.sh asserts each typo'd key is named).

TiKV-physical keys (importer addr, region split sizes, security TLS
paths, cron switch-mode …) are ACCEPTED and ignored — they configure
the physical backend this engine maps to Spark (SURVEY.md §2.4);
accepting them keeps real task.toml files loadable unchanged.
"""

from __future__ import annotations

import tomllib

from .config import (
    Config,
    CSVConfig,
    FilterRule,
    MydumperConfig,
    RouteRule,
    TiDBConfig,
)

# section -> known keys. A key listed here may still be unused by the
# Spark engine (physical knobs) — "known" means it exists in the
# reference's config struct, so a real task.toml round-trips.
_KNOWN: dict[str, set[str]] = {
    "lightning": {
        "table-concurrency", "index-concurrency", "region-concurrency",
        "io-concurrency", "check-requirements", "file", "level",
        "max-size", "max-days", "max-backups", "pprof-port",
    },
    "tikv-importer": {"backend", "addr", "on-duplicate"},
    "mydumper": {
        "data-source-dir", "no-schema", "character-set",
        "read-block-size", "batch-size", "batch-import-ratio",
        "case-sensitive", "strict-format", "max-region-size", "filter",
    },
    "mydumper.csv": {
        "separator", "delimiter", "header", "not-null", "null",
        "backslash-escape", "trim-last-separator",
    },
    "tidb": {
        "host", "port", "user", "password", "status-port", "pd-addr",
        "sql-mode", "tls", "security", "max-allowed-packet",
        "distsql-scan-concurrency", "index-serial-scan-concurrency",
        "checksum-table-concurrency", "build-stats-concurrency",
        "log-level",
    },
    "checkpoint": {"enable", "schema", "driver", "dsn", "keep-after-success"},
    "post-restore": {"checksum", "compact", "level-1-compact", "analyze"},
    "black-white-list": {
        "do-dbs", "ignore-dbs", "do-tables", "ignore-tables",
    },
    "cron": {"switch-mode", "log-progress"},
    "security": {
        "ca-path", "cert-path", "key-path", "redact-info-log",
    },
    "routes": set(),  # array of route tables, validated separately
}
_ROUTE_KEYS = {
    "schema-pattern", "table-pattern", "target-schema", "target-table",
}


def _check_unknown(doc: dict) -> list[str]:
    bad: list[str] = []
    for section, body in doc.items():
        if section not in _KNOWN:
            bad.append(section)
            continue
        if section == "routes":
            for i, r in enumerate(body or []):
                bad += [
                    f"routes[{i}].{k}" for k in r if k not in _ROUTE_KEYS
                ]
            continue
        if not isinstance(body, dict):
            continue
        for k, v in body.items():
            if section == "mydumper" and k == "csv":
                bad += [
                    f"mydumper.csv.{ck}"
                    for ck in v
                    if ck not in _KNOWN["mydumper.csv"]
                ]
                continue
            if k not in _KNOWN[section]:
                bad.append(f"{section}.{k}")
    return bad


_BACKEND_MAP = {
    # physical backends map to the bulk-file sink; "tidb" is the
    # SQL-statement path -> JDBC sink
    "importer": "parquet",
    "local": "parquet",
    "tidb": "jdbc",
}


def load_toml(path: str) -> Config:
    """Load a reference-layout task.toml into a Config.

    Raises ValueError naming every unknown section/key (the
    reference's strict decode, tests/unused_config_keys)."""
    with open(path, "rb") as f:
        doc = tomllib.load(f)
    bad = _check_unknown(doc)
    if bad:
        raise ValueError(
            "unknown configuration keys: " + ", ".join(sorted(bad))
        )

    light = doc.get("lightning", {})
    imp = doc.get("tikv-importer", {})
    md = doc.get("mydumper", {})
    csv_d = md.get("csv", {})
    tidb = doc.get("tidb", {})
    ck = doc.get("checkpoint", {})
    post = doc.get("post-restore", {})
    bw = doc.get("black-white-list", {})

    csv = CSVConfig(
        separator=csv_d.get("separator", ","),
        delimiter=csv_d.get("delimiter", '"'),
        header=bool(csv_d.get("header", False)),
        not_null=bool(csv_d.get("not-null", False)),
        null=csv_d.get("null", "\\N"),
        backslash_escape=bool(csv_d.get("backslash-escape", True)),
        trim_last_sep=bool(csv_d.get("trim-last-separator", False)),
    )
    routes = [
        RouteRule(
            r["schema-pattern"],
            r.get("table-pattern", "*"),
            r["target-schema"],
            r.get("target-table", r.get("table-pattern", "*")),
        )
        for r in doc.get("routes", [])
    ]
    to_pair = lambda d: (d["db"], d["tbl"])  # noqa: E731
    cfg = Config(
        mydumper=MydumperConfig(
            source_dir=md.get("data-source-dir", ""),
            no_schema=bool(md.get("no-schema", False)),
            character_set=md.get("character-set", "auto"),
            read_block_size=int(md.get("read-block-size", 64 * 1024)),
            batch_size=int(md.get("batch-size", 100 << 30)),
            case_sensitive=bool(md.get("case-sensitive", False)),
            csv=csv,
        ),
        tidb=TiDBConfig(
            host=tidb.get("host", "127.0.0.1"),
            port=int(tidb.get("port", 4000)),
            user=tidb.get("user", "root"),
            password=str(tidb.get("password", "")),
            sql_mode=tidb.get(
                "sql-mode", "STRICT_TRANS_TABLES,NO_ENGINE_SUBSTITUTION"
            ),
        ),
        bw_list=FilterRule(
            do_dbs=list(bw.get("do-dbs", [])),
            ignore_dbs=list(bw.get("ignore-dbs", [])),
            do_tables=[to_pair(d) for d in bw.get("do-tables", [])],
            ignore_tables=[to_pair(d) for d in bw.get("ignore-tables", [])],
        ),
        routes=routes,
        backend=_BACKEND_MAP.get(imp.get("backend", "importer"), "parquet"),
        on_duplicate=imp.get("on-duplicate", "replace"),
        checkpoint_enable=bool(ck.get("enable", True)),
        checkpoint_path=ck.get("dsn", "") if ck.get("driver", "file") == "file" else "",
        checksum=bool(post.get("checksum", True)),
        compact=bool(post.get("compact", False)),
        analyze=bool(post.get("analyze", True)),
        table_concurrency=int(light.get("table-concurrency", 4)),
    )
    return cfg
