"""CLI entry point — the ``tidb-lightning -config task.toml`` twin.

    python -m tidb_lightning_release_4_0_spark \
        --source-dir /path/to/dump --target-dir /path/to/warehouse \
        [--backend parquet] [--on-duplicate replace|ignore|error|physical] \
        [--sql-mode "STRICT_TRANS_TABLES"] [--no-schema] \
        [--checkpoint PATH] [--character-set auto|utf8mb4|gb18030|binary] \
        [--csv-separator ,] [--csv-header] [--csv-strict] \
        [--filter-db PATTERN ...] [--route src_db src_tbl dst_db dst_tbl ...]

Exit code 0 when every table restores (error summary printed either
way, O12 style).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="tidb_lightning_release_4_0_spark", description=__doc__
    )
    ap.add_argument("--config", default="",
                    help="task.toml in the reference's layout "
                         "(config.go:83-160); explicit CLI flags override "
                         "file values (tests/cmdline_override/run.sh)")
    ap.add_argument("--source-dir", default="")
    ap.add_argument("--target-dir", default="")
    ap.add_argument("--backend", default="parquet",
                    choices=["parquet", "memory"])
    ap.add_argument("--on-duplicate", default="replace",
                    choices=["replace", "ignore", "error", "physical"])
    ap.add_argument("--sql-mode",
                    default="STRICT_TRANS_TABLES,NO_ENGINE_SUBSTITUTION")
    ap.add_argument("--no-schema", action="store_true")
    ap.add_argument("--no-checksum", action="store_true")
    ap.add_argument("--compact", action="store_true",
                    help="post-restore small-file compaction (default off, "
                         "like the reference's post-restore.compact)")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--character-set", default="auto")
    ap.add_argument("--csv-separator", default=",")
    ap.add_argument("--csv-header", action="store_true")
    ap.add_argument("--csv-strict", action="store_true")
    ap.add_argument("--table-concurrency", type=int, default=4)
    ap.add_argument("--filter-db", action="append", default=[])
    ap.add_argument("--route", nargs=4, action="append", default=[],
                    metavar=("SRC_DB", "SRC_TBL", "DST_DB", "DST_TBL"))
    ap.add_argument("--server-mode", action="store_true",
                    help="run as an HTTP task-queue server (RunServer, "
                         "lightning.go:149-167): tasks POSTed to /tasks "
                         "run sequentially; --target-dir becomes the "
                         "global warehouse root layered onto every task")
    ap.add_argument("--status-addr", default="127.0.0.1:8289",
                    help="listen address in server mode")
    args = ap.parse_args(argv)

    if args.server_mode:
        from .server import ConfigList, TaskRunner, TaskServer
        from .session import get_spark

        host, _, port = args.status_addr.partition(":")
        overrides = (
            {"target_dir": args.target_dir} if args.target_dir else {}
        )
        configs = ConfigList()
        server = TaskServer(
            configs, host=host or "127.0.0.1", port=int(port or 0),
            overrides=overrides,
        ).start()
        print(
            f"task server listening on {host}:{server.port} "
            f"(dashboard: http://{host or '127.0.0.1'}:{server.port}/web/)"
        )
        spark = get_spark(app_name="tidb-lightning-spark-server")
        spark.sparkContext.setLogLevel("WARN")
        runner = TaskRunner(
            spark, configs, server=server, pause_on_error=True
        )
        try:
            while True:  # RunServer loop: pop -> restore -> repeat
                runner.run_one(timeout=1.0)
        except KeyboardInterrupt:
            return 0
        finally:
            server.shutdown()

    from .config import (
        Config, CSVConfig, FilterRule, MydumperConfig, RouteRule, TiDBConfig,
    )
    from .plans.pipeline import CheckpointInvalidError, RestoreController
    from .session import get_spark

    if args.config:
        # task.toml as the base; ONLY explicitly-typed CLI flags
        # override it (the reference's cmdline_override semantics)
        from .config_toml import load_toml

        # detect which flags were EXPLICITLY typed: re-parse with all
        # defaults suppressed — robust against --opt=value forms and
        # argparse prefix abbreviations, which raw-token matching is not
        raw = argv if argv is not None else sys.argv[1:]
        saved_defaults = [(a, a.default) for a in ap._actions]
        try:
            for a in ap._actions:
                a.default = argparse.SUPPRESS
            provided = set(vars(ap.parse_args(raw)).keys())
        finally:
            for a, d in saved_defaults:
                a.default = d
        cfg = load_toml(args.config)
        if "source_dir" in provided:
            cfg.mydumper.source_dir = args.source_dir
        if "target_dir" in provided:
            cfg.target_dir = args.target_dir
        if "backend" in provided:
            cfg.backend = args.backend
        if "on_duplicate" in provided:
            cfg.on_duplicate = args.on_duplicate
        if "sql_mode" in provided:
            cfg.tidb.sql_mode = args.sql_mode
        if "no_schema" in provided:
            cfg.mydumper.no_schema = args.no_schema
        if "no_checksum" in provided:
            cfg.checksum = not args.no_checksum
        if "compact" in provided:
            cfg.compact = args.compact
        if "checkpoint" in provided:
            cfg.checkpoint_enable = bool(args.checkpoint)
            cfg.checkpoint_path = args.checkpoint
        if "character_set" in provided:
            cfg.mydumper.character_set = args.character_set
        if "csv_separator" in provided:
            cfg.mydumper.csv.separator = args.csv_separator
        if "csv_header" in provided:
            cfg.mydumper.csv.header = args.csv_header
        if "csv_strict" in provided:
            cfg.mydumper.csv.strict_parser = args.csv_strict
        if "table_concurrency" in provided:
            cfg.table_concurrency = args.table_concurrency
        if "filter_db" in provided:
            cfg.bw_list = FilterRule(do_dbs=args.filter_db)
        if "route" in provided:
            cfg.routes = [RouteRule(*r) for r in args.route]
    else:
        if not args.source_dir:
            ap.error("--source-dir is required (or pass --config task.toml)")
        csv = CSVConfig(
            separator=args.csv_separator,
            header=args.csv_header,
            strict_parser=args.csv_strict,
        )
        cfg = Config(
            mydumper=MydumperConfig(
                source_dir=args.source_dir,
                no_schema=args.no_schema,
                character_set=args.character_set,
                csv=csv,
            ),
            tidb=TiDBConfig(sql_mode=args.sql_mode),
            bw_list=FilterRule(do_dbs=args.filter_db),
            routes=[RouteRule(*r) for r in args.route],
            backend=args.backend,
            target_dir=args.target_dir,
            on_duplicate=args.on_duplicate,
            checksum=not args.no_checksum,
            compact=args.compact,
            checkpoint_enable=bool(args.checkpoint),
            checkpoint_path=args.checkpoint,
            table_concurrency=args.table_concurrency,
        )
    try:
        cfg.adjust()  # preflight validation before starting the JVM
        spark = get_spark(app_name="tidb-lightning-spark")
        spark.sparkContext.setLogLevel("WARN")
        summary = RestoreController(spark, cfg).run()
    except CheckpointInvalidError as e:
        # formatted refusal (failed last time; per-table ctl actions)
        print(f"error: {e}", file=sys.stderr)
        return 3
    except (ValueError, FileNotFoundError, NotImplementedError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(summary.report())
    return 0 if summary.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
