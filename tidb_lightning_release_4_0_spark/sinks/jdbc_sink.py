"""K3: TiDB/MySQL SQL sink over JDBC.

The reference's tidb backend renders multi-row
``REPLACE INTO / INSERT IGNORE INTO / INSERT INTO`` statements
(lightning/backend/tidb.go:271-316; dup modes tidb.go:54-62) in
1 MiB sub-batches (tidb.go:240-245) with 3 retries
(backend.go:218-238).

Spark-native: ``df.write.jdbc`` handles plain INSERT with
``batchsize`` batching and task-level retries
(spark.task.maxFailures). replace/ignore render the reference's
statement prefixes and execute them per partition through a DB-API
``connection_factory`` with the reference's sub-batching and
transient-only retry classifier (common/util.go:186-218). The full
delivery path — rendering (tidb.go:96-132 escaping), execution,
dup semantics, batch split, retries, read-back verification — is
exercised end-to-end against the fake MySQL-protocol endpoint in
``fake_mysql.py`` (tests/test_jdbc_delivery.py); a live TiDB/MySQL
takes the same factory (e.g. a pymysql lambda).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

from .base import Sink, SinkResult


def escape_sql_string(s: str) -> str:
    """MySQL string literal escaping (tidb.go:96-132)."""
    out = []
    for ch in s:
        if ch == "\0":
            out.append("\\0")
        elif ch == "\b":
            out.append("\\b")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\x1a":
            out.append("\\Z")
        elif ch == "'":
            out.append("\\'")
        elif ch == "\\":
            out.append("\\\\")
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


def render_sql_value(v: object) -> str:
    """Datum -> SQL literal (T7: tidb.go:136-202).

    The reference deliberately avoids prepared statements so BIT /
    BINARY values embed verbatim (tidb.go:300-301); we render the
    same literal forms.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return "x'" + v.hex() + "'"
    if isinstance(v, _dt.datetime):
        return "'" + v.strftime("%Y-%m-%d %H:%M:%S.%f").rstrip("0").rstrip(".") + "'"
    if isinstance(v, _dt.date):
        return f"'{v.isoformat()}'"
    return escape_sql_string(str(v))


def render_insert(
    table: str,
    columns: list[str],
    rows: list[tuple],
    on_duplicate: str = "replace",
) -> str:
    """Multi-row statement like (*tidbBackend).WriteRows
    (tidb.go:271-311)."""
    prefix = {
        "replace": "REPLACE INTO",
        "ignore": "INSERT IGNORE INTO",
        "error": "INSERT INTO",
        # the SQL path has no physical-overwrite concept: plain
        # INSERT, the DB's PK constraint reports duplicates
        "physical": "INSERT INTO",
    }[on_duplicate]
    collist = "(" + ",".join(f"`{c}`" for c in columns) + ")"
    tuples = ",".join(
        "(" + ",".join(render_sql_value(v) for v in row) + ")" for row in rows
    )
    return f"{prefix} `{table}` {collist} VALUES {tuples}"


# MySQL/TiDB errnos treated as transient. The reference's classifier
# (common/util.go:186-218 IsRetryableError) lists exactly: 1105
# unknown-error, 1213 deadlock, 8005 write-conflict, 9001-9005
# PD/TiKV timeout+busy classes. BEYOND-REFERENCE EXTENSIONS here:
# 1205 lock-wait-timeout, and client-side errnos 2002/2003/2006/2013
# (connection loss) — the Go side sees those as net.Error values,
# which util.go retries on timeout; a Python DBAPI driver surfaces
# them as errnos instead, so listing them restores the same
# behavior. Constraint violations (1062 Duplicate entry) and syntax
# errors are NOT here — retrying them can never succeed and hides
# real failures.
_RETRYABLE_ERRNOS = {
    1105, 1205, 1213, 2002, 2003, 2006, 2013,
    8005, 9001, 9002, 9003, 9004, 9005,
}


def is_retryable_error(exc: BaseException) -> bool:
    """The reference's retry classifier (common/util.go:186-218):
    driver bad-conn/net errors and the transient MySQL/TiDB errno set
    retry; everything else fails fast."""
    if isinstance(exc, (ConnectionError, TimeoutError)):
        return True  # driver.ErrBadConn / net.Error analogs
    errno = getattr(exc, "errno", None)
    if errno is None:
        args = getattr(exc, "args", ())
        if args and isinstance(args[0], int):
            errno = args[0]
    try:
        return int(errno) in _RETRYABLE_ERRNOS
    except (TypeError, ValueError):
        return False


class JDBCSink(Sink):
    """DataFrame -> SQL delivery; needs a reachable MySQL-protocol DB.

    Duplicate handling mirrors the reference's statement prefixes
    (tidb.go:54-62): ``error`` -> plain INSERT (Spark's built-in JDBC
    writer), ``replace``/``ignore`` -> REPLACE INTO / INSERT IGNORE
    rendered per partition (tidb.go:271-311) and executed through a
    picklable DBAPI ``connection_factory`` (e.g. a pymysql/mysql-
    connector lambda), with the reference's 3-attempt retry
    (backend.go:218-238). Without a factory those modes raise instead
    of silently appending."""

    def __init__(
        self,
        url: str,
        user: str,
        password: str,
        on_duplicate: str = "replace",
        batch_size: int = 10000,
        connection_factory=None,
        max_retries: int = 3,
        execute_ddl: bool = False,
    ):
        self.url = url
        self.user = user
        self.password = password
        self.on_duplicate = on_duplicate
        self.batch_size = batch_size
        self.connection_factory = connection_factory
        self.max_retries = max_retries
        # opt-in: init_schema executes the dump's (MySQL-dialect) DDL
        # on the DBAPI connection; off by default because test DBAPIs
        # (sqlite) cannot parse it
        self.execute_ddl = execute_ddl
        # DDL statements applied (or queued) by init_schema, in order
        self.applied_ddl: list[str] = []
        # table -> TableSchema recorded at init_schema; read_back uses
        # it to restore types from rendered literals on the DBAPI path
        self._schemas: dict[str, object] = {}

    def init_schema(self, spark, table, schema, ddl=None) -> None:
        """K5 passthrough: execute the dump's CREATE TABLE verbatim on
        the target connection (restoreSchema, restore.go:329-373).
        MySQL DDL is dialect-specific, so it only executes when a
        DBAPI ``connection_factory`` is configured AND
        ``execute_ddl`` is opted in (test DBAPIs like sqlite cannot
        parse it); either way the statement is recorded on
        ``applied_ddl`` for audit."""
        if schema is not None:
            self._schemas[table] = schema
        if not ddl:
            return
        self.applied_ddl.append(ddl)
        if self.connection_factory is None or not self.execute_ddl:
            return
        conn = self.connection_factory()
        try:
            cur = conn.cursor()
            cur.execute(ddl)
            conn.commit()
        finally:
            conn.close()

    @property
    def observes_write_action(self) -> bool:
        """False on the DBAPI path: delivery is a foreachPartition
        (RDD) action, which never fires DataFrame Observation
        listeners — the pipeline must aggregate write metrics eagerly
        instead of blocking on obs.get."""
        return self.connection_factory is None

    def _props(self) -> dict[str, str]:
        return {"user": self.user, "password": self.password}

    def write(self, df: DataFrame, table: str) -> SinkResult:
        # NO df.count() here: that would run the entire source
        # parse/cast pipeline an extra time before delivering a row
        # (for .sql dumps, a full Python-lexer re-read). The caller's
        # Observation reports rows for the built-in writer (rows=-1
        # sentinel); the DBAPI path counts via an accumulator inside
        # the single delivery pass.
        # "physical" maps to plain INSERT too: the SQL path has no
        # physical-overwrite concept, so it behaves like error-mode
        # delivery (the DB's own PK constraint reports duplicates)
        if "_row_id" in df.columns:
            # internal arrival-order column — never a target column
            # (rendering it yields 1054 Unknown column '_row_id' on a
            # real server); partition iteration order already IS the
            # in-file arrival order, which is all the statement-level
            # REPLACE/IGNORE semantics need
            df = df.drop("_row_id")
        if (
            self.on_duplicate in ("error", "physical")
            and self.connection_factory is None
        ):
            (
                df.write.mode("append")
                .option("batchsize", str(self.batch_size))
                .jdbc(self.url, table, properties=self._props())
            )
            return SinkResult(table=table, rows=-1)
        if self.connection_factory is None:
            # plain spark-jdbc append would silently violate
            # replace/ignore semantics — reject instead
            raise NotImplementedError(
                f"on_duplicate={self.on_duplicate!r} needs a DBAPI "
                "connection_factory (REPLACE INTO / INSERT IGNORE are "
                "not expressible through spark's plain JDBC writer)"
            )
        cols = list(df.columns)
        factory = self.connection_factory
        dup = self.on_duplicate
        bs = self.batch_size
        retries = self.max_retries
        # row count rides the delivery pass (single materialization)
        acc = df.sparkSession.sparkContext.accumulator(0)

        def deliver(rows) -> None:
            import time as _time

            conn = factory()
            try:
                cur = conn.cursor()
                buf: list[tuple] = []
                delivered = 0

                def flush() -> None:
                    if not buf:
                        return
                    stmt = render_insert(table, cols, buf, dup)
                    for attempt in range(retries):
                        try:
                            cur.execute(stmt)
                            break
                        except Exception as e:
                            # only the transient class retries
                            # (common/util.go:186-218); a duplicate-
                            # key or syntax error re-raised on first
                            # sight is the reference's behavior
                            if (
                                attempt == retries - 1
                                or not is_retryable_error(e)
                            ):
                                raise
                            _time.sleep(0.1 * (attempt + 1))
                    buf.clear()

                for r in rows:
                    buf.append(tuple(r))
                    delivered += 1
                    if len(buf) >= bs:
                        flush()
                flush()
                conn.commit()
                acc.add(delivered)
            finally:
                conn.close()

        df.foreachPartition(deliver)
        return SinkResult(table=table, rows=acc.value)

    def probe(self, spark: SparkSession) -> None:
        """O10: open (and close) one connection before any restore
        work — the reference pings the target during its requirement
        checks (restore.go:1117-1134)."""
        if self.connection_factory is None:
            return  # plain spark-jdbc path: no driver-side DBAPI
        conn = self.connection_factory()
        try:
            cur = conn.cursor()
            cur.execute("SELECT 1")
        finally:
            conn.close()

    def read_back(self, spark: SparkSession, table: str) -> DataFrame:
        """C2 read-back for verification (remote checksum, replace/
        ignore row counts, error-mode dup check — restore.go pass 2).

        Without a DBAPI factory this is Spark's partitioned JDBC read
        (the production path against a real server). With a factory,
        rows come back through a driver-side SELECT on the same
        connection kind that delivered them, and the literal-rendered
        values are coerced back to the DDL's types so checksum
        canonicalization sees what was written. Driver-side collect is
        fine here by construction: the factory path exists for local
        endpoints (tests/dev), not cluster-scale targets."""
        if self.connection_factory is None:
            return spark.read.jdbc(
                self.url, table, properties=self._props()
            )
        conn = self.connection_factory()
        try:
            cur = conn.cursor()
            cur.execute(f"SELECT * FROM `{table}`")
            cols = [d[0] for d in cur.description or []]
            rows = cur.fetchall()
        finally:
            conn.close()
        import datetime as _dtm

        from pyspark.sql import types as T

        from ..operators.permutation import ROWID_COL

        schema = self._schemas.get(table)
        fields, coercers = [], []
        for c in cols:
            sp = None
            if schema is not None:
                try:
                    sp = schema.column(c).spark_type
                except Exception:
                    sp = None
            if sp is None:
                sp = (
                    T.LongType() if c == ROWID_COL else T.StringType()
                )
            fields.append(T.StructField(c, sp, True))

            def _co(tp):
                def f(v):
                    if v is None:
                        return None
                    if isinstance(tp, T.TimestampType):
                        s = str(v)
                        fmt = (
                            "%Y-%m-%d %H:%M:%S.%f"
                            if "." in s
                            else "%Y-%m-%d %H:%M:%S"
                        )
                        return _dtm.datetime.strptime(s, fmt)
                    if isinstance(tp, T.DateType):
                        return _dtm.date.fromisoformat(str(v))
                    if isinstance(tp, T.DecimalType):
                        from decimal import Decimal

                        return Decimal(str(v))
                    if isinstance(tp, (T.DoubleType, T.FloatType)):
                        return float(v)
                    if isinstance(
                        tp, (T.LongType, T.IntegerType, T.ShortType,
                             T.ByteType)
                    ):
                        return int(v)
                    if isinstance(tp, T.BooleanType):
                        return bool(int(v))
                    if isinstance(tp, T.StringType):
                        return str(v)
                    return v

                return f

            coercers.append(_co(sp))
        data = [
            tuple(co(v) for co, v in zip(coercers, r)) for r in rows
        ]
        return spark.createDataFrame(data, T.StructType(fields))

    def finalize(self, spark: SparkSession, table: str) -> None:
        # ALTER TABLE AUTO_INCREMENT / ANALYZE would run here via a
        # driver-side connection (C4/C5, restore.go:998-1053).
        pass
