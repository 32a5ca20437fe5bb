"""O11: server mode — the HTTP task-queue front (SURVEY.md §3.2).

The reference's ``RunServer`` pops TOML task configs from a
``ConfigList`` queue fed over HTTP and runs each through the §3.1
restore pipeline (lightning/lightning.go:149-167; queue ops
lightning/config/configlist.go:38-153; endpoints
lightning.go:262-441). Reproduced surface:

    GET    /tasks                -> {"current": id|null, "queue": [ids]}
    GET    /tasks/<id>           -> task config summary (404 unknown)
    POST   /tasks  (TOML body)   -> {"id": N}; 400 on parse/validate
    DELETE /tasks/<id>           -> {} (404 unknown)
    PATCH  /tasks/<id>/front     -> {} reorder to head
    PATCH  /tasks/<id>/back      -> {} reorder to tail

The worker loop (``TaskRunner``) is the Spark analog of the restore
goroutine: pop -> RestoreController(spark, cfg).run() -> record the
RunSummary. DELETE of the *currently running* task preempts it (the
reference cancels via context, lightning.go:427-441): a cooperative
abort event stops the worker at the next table/engine boundary and
cancelJobGroup kills the in-flight Spark job. Task IDs are nanosecond
timestamps made strictly monotonic, like configlist.go:48-59.

Everything is stdlib (http.server + threading) — the queue is
driver-side metadata; the data plane stays in Spark.
"""

from __future__ import annotations

import json
import logging
import os
import tempfile
import threading
import time
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .config import Config
from .pause import Pauser

log = logging.getLogger("tidb_lightning_spark")


class ConfigList:
    """Thread-safe FIFO of task configs with stable unique IDs
    (configlist.go:38-153): push assigns a strictly increasing
    nanosecond ID; pop blocks until an item or timeout; remove and
    move-to-front/back address items by ID."""

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._items: OrderedDict[int, Config] = OrderedDict()
        self._last_id = 0

    def push(self, cfg: Config) -> int:
        with self._cond:
            tid = max(time.time_ns(), self._last_id + 1)
            self._last_id = tid
            cfg.task_id = tid  # like cfg.TaskID (configlist.go:49-56)
            self._items[tid] = cfg
            self._cond.notify_all()
            return tid

    def pop(self, timeout: float | None = None) -> Config | None:
        """Blocking pop of the front task; None on timeout."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cond:
            while not self._items:
                rem = None if deadline is None else deadline - time.monotonic()
                if rem is not None and rem <= 0:
                    return None
                if not self._cond.wait(timeout=rem):
                    return None
            tid = next(iter(self._items))
            return self._items.pop(tid)

    def remove(self, tid: int) -> bool:
        with self._cond:
            return self._items.pop(tid, None) is not None

    def move_to_front(self, tid: int) -> bool:
        with self._cond:
            if tid not in self._items:
                return False
            self._items.move_to_end(tid, last=False)
            return True

    def move_to_back(self, tid: int) -> bool:
        with self._cond:
            if tid not in self._items:
                return False
            self._items.move_to_end(tid, last=True)
            return True

    def all_ids(self) -> list[int]:
        with self._cond:
            return list(self._items)

    def get(self, tid: int) -> Config | None:
        with self._cond:
            return self._items.get(tid)


class TaskProgress:
    """web/progress.go:87-200 — the state behind GET /progress/task:
    per-table written/total bytes and status (0 not-started,
    1 running, 2 completed), plus the task-level status/message.
    Marshals to the reference's compact JSON shape
    {"t": {name: {"w","z","s","m"}}, "s", "m"}."""

    NOT_STARTED, RUNNING, COMPLETED = 0, 1, 2

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._tables: dict[str, dict] = {}
        self._status = self.NOT_STARTED
        self._message = ""
        #: table -> its checkpoint store, for GET /progress/table?t=
        #: (web/progress.go checkpointsMap; marshal-on-read replaces
        #: the reference's broadcast deep-copies)
        self._cp_stores: dict[str, object] = {}
        #: last marshaled ladder per table — survives the store's
        #: post-success cleanup (the reference serves its broadcast
        #: COPY after the run, so completed tables must still answer)
        self._cp_cache: dict[str, dict] = {}

    # -- broadcast hooks (BroadcastStartTask & friends) -----------------
    def start_task(self, table_sizes: dict[str, int]) -> None:
        with self._lock:
            self._status = self.RUNNING
            self._message = ""
            self._tables = {
                name: {"w": 0, "z": size, "s": self.NOT_STARTED, "m": ""}
                for name, size in table_sizes.items()
            }
            self._cp_stores = {}  # BroadcastStartTask clears the map
            self._cp_cache = {}

    def attach_checkpoints(self, name: str, store) -> None:
        with self._lock:
            self._cp_stores[name] = store

    def marshal_table(self, name: str) -> dict | None:
        """Reference-shaped TableCheckpoint JSON for one table, or
        None when no restore has touched it (-> 404, the
        errors.IsNotFound branch of handleProgressTable). Falls back
        to the table_end snapshot once the store is cleaned."""
        with self._lock:
            store = self._cp_stores.get(name)
        res = store.marshal_table(name) if store is not None else None
        with self._lock:
            if res is not None:
                return res
            return self._cp_cache.get(name)

    def table_end(self, name: str, error: str = "") -> None:
        # snapshot the final ladder BEFORE a successful run's
        # checkpoint cleanup wipes the store
        with self._lock:
            store = self._cp_stores.get(name)
        snap = store.marshal_table(name) if store is not None else None
        with self._lock:
            if snap is not None:
                self._cp_cache[name] = snap
            if name in self._tables:
                self._tables[name]["s"] = self.COMPLETED
                self._tables[name]["m"] = error

    def end_task(self, error: str = "") -> None:
        with self._lock:
            self._status = self.COMPLETED
            self._message = error

    def table_start(self, name: str) -> None:
        with self._lock:
            if name in self._tables:
                self._tables[name]["s"] = self.RUNNING

    def table_written(self, name: str, nbytes: int) -> None:
        with self._lock:
            if name in self._tables:
                self._tables[name]["w"] += int(nbytes)

    def marshal(self) -> dict:
        with self._lock:
            return {
                "t": {
                    n: {k: v for k, v in rec.items() if k != "m" or v}
                    for n, rec in self._tables.items()
                },
                "s": self._status,
                **({"m": self._message} if self._message else {}),
            }


def _cfg_summary(cfg: Config) -> dict:
    return {
        "id": getattr(cfg, "task_id", None),
        "source_dir": cfg.mydumper.source_dir,
        "backend": cfg.backend,
        "target_dir": cfg.target_dir,
        "checkpoint_enable": cfg.checkpoint_enable,
    }


class TaskServer:
    """HTTP front over a ConfigList (lightning.go:262-441)."""

    def __init__(self, configs: ConfigList, host: str = "127.0.0.1",
                 port: int = 0, overrides: dict | None = None):
        #: global-config layer applied to every posted task before
        #: validation — the analog of cfg.LoadFromGlobal(globalCfg)
        #: in handlePostTask (lightning.go:356-359), e.g. the server
        #: operator's target warehouse root
        self.overrides = overrides or {}
        self.configs = configs
        self.current: int | None = None  # running task id
        self.current_cfg: Config | None = None  # its config (for GET)
        self._cur_lock = threading.Lock()
        #: O4: the shared deliver pauser (restore.DeliverPauser) —
        #: PUT /pause parks restores at the next table/engine
        #: boundary, PUT /resume releases (lightning.go:483-516)
        self.pauser = Pauser()
        #: GET /progress/task state (web/progress.go currentProgress)
        self.progress = TaskProgress()
        #: GET /metrics counters (the reference serves Prometheus on
        #: the same mux, lightning.go:91; this is the text exposition
        #: of the engine's own counters, no client library)
        self.counters = {
            "tasks_total": 0,
            "tasks_failed_total": 0,
            "tables_restored_total": 0,
            "bytes_restored_total": 0,
        }
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                log.debug("taskserver: " + a[0] % a[1:])

            def _json(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Cache-Control", "no-store")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _task_id(self):
                parts = self.path.strip("/").split("/")
                # /tasks/<id>[/verb]
                if len(parts) < 2 or parts[0] != "tasks":
                    return None, None
                try:
                    tid = int(parts[1])
                except ValueError:
                    return None, None
                return tid, parts[2] if len(parts) > 2 else None

            def do_PUT(self):
                # lightning.go:483-516: PUT /pause parks progress at
                # the next boundary; PUT /resume releases it
                p = self.path.rstrip("/")
                if p == "/pause":
                    server.pauser.pause()
                    log.info("progress paused")
                    self._json(200, {})
                elif p == "/resume":
                    server.pauser.resume()
                    log.info("progress resumed")
                    self._json(200, {})
                else:
                    self._json(404, {"error": "not found"})

            def do_GET(self):
                if self.path == "/" or self.path == "":
                    # lightning.go:90: "/" redirects to the web app
                    self.send_response(302)
                    self.send_header("Location", "/web/")
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                if self.path.rstrip("/") == "/web":
                    # the dashboard (lightning.go:107-111 serves the
                    # bundled React app; here one self-contained page
                    # over the same JSON endpoints, web_ui.py)
                    from .web_ui import INDEX_HTML

                    body = INDEX_HTML.encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/html; charset=utf-8"
                    )
                    self.send_header("Cache-Control", "no-store")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path.rstrip("/") == "/pause":
                    self._json(200, {"paused": server.pauser.is_paused})
                    return
                if self.path.rstrip("/") == "/progress/task":
                    self._json(200, server.progress.marshal())
                    return
                if self.path.split("?")[0].rstrip("/") == "/progress/table":
                    # lightning.go:466-476 handleProgressTable: the
                    # table's checkpoint ladder, 404 when unknown
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    t = (q.get("t") or [""])[0]
                    res = server.progress.marshal_table(t)
                    if res is None:
                        self._json(404, f"table {t!r} not found")
                    else:
                        self._json(200, res)
                    return
                if self.path.rstrip("/") == "/metrics":
                    with server._cur_lock:
                        counters = dict(server.counters)
                    lines = []
                    for k, v in counters.items():
                        lines.append(f"# TYPE lightning_{k} counter")
                        lines.append(f"lightning_{k} {v}")
                    lines.append("# TYPE lightning_paused gauge")
                    lines.append(
                        f"lightning_paused "
                        f"{1 if server.pauser.is_paused else 0}"
                    )
                    body = ("\n".join(lines) + "\n").encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; version=0.0.4"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path.rstrip("/") == "/tasks":
                    with server._cur_lock:
                        cur = server.current
                    self._json(
                        200,
                        {"current": cur, "queue": server.configs.all_ids()},
                    )
                    return
                tid, _ = self._task_id()
                if tid is None:
                    self._json(400, {"error": "invalid task ID"})
                    return
                # the currently-running task is no longer queued but
                # must still be inspectable (handleGetOneTask checks
                # curTask first, lightning.go:309-320)
                with server._cur_lock:
                    cfg = (
                        server.current_cfg
                        if server.current == tid
                        else None
                    )
                if cfg is None:
                    cfg = server.configs.get(tid)
                if cfg is None:
                    self._json(404, {"error": "task ID not found"})
                    return
                self._json(200, _cfg_summary(cfg))

            def do_POST(self):
                if self.path.rstrip("/") != "/tasks":
                    self._json(404, {"error": "not found"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                try:
                    cfg = parse_task_toml(data, server.overrides)
                except Exception as e:
                    self._json(
                        400,
                        {"error": f"cannot parse task (must be TOML): {e}"},
                    )
                    return
                tid = server.configs.push(cfg)
                self._json(200, {"id": tid})

            def do_DELETE(self):
                tid, _ = self._task_id()
                if tid is None:
                    self._json(400, {"error": "invalid task ID"})
                    return
                if server.configs.remove(tid):
                    self._json(200, {})
                elif (
                    getattr(server, "runner", None) is not None
                    and server.runner.cancel(tid)
                ):
                    # the RUNNING task: preempted at the next table/
                    # engine boundary + in-flight Spark job cancelled
                    self._json(200, {"stopped": True})
                else:
                    self._json(404, {"error": "task ID not found"})

            def do_PATCH(self):
                tid, verb = self._task_id()
                if tid is None:
                    self._json(400, {"error": "invalid task ID"})
                    return
                if verb == "front":
                    ok = server.configs.move_to_front(tid)
                elif verb == "back":
                    ok = server.configs.move_to_back(tid)
                else:
                    self._json(400, {"error": "unknown patch action"})
                    return
                self._json(200, {}) if ok else self._json(
                    404, {"error": "task ID not found"}
                )

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "TaskServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def parse_task_toml(data: bytes, overrides: dict | None = None) -> Config:
    """POST /tasks body -> Config via the strict task.toml loader,
    with the server's global-config fields layered on top before
    validation (handlePostTask parses + validates before queueing,
    lightning.go:336-374)."""
    from .config_toml import load_toml

    fd, path = tempfile.mkstemp(suffix=".toml")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        cfg = load_toml(path)
    finally:
        os.unlink(path)
    for k, v in (overrides or {}).items():
        if not hasattr(cfg, k):
            raise ValueError(f"unknown global override {k!r}")
        setattr(cfg, k, v)
    cfg.adjust()
    return cfg


class TaskRunner:
    """The restore worker loop (RunServer, lightning.go:149-167):
    pop -> run the §3.1 pipeline -> record the summary; a failed task
    is recorded and the loop continues to the next (the per-table
    error summary already captured the failure)."""

    def __init__(self, spark, configs: ConfigList,
                 server: TaskServer | None = None, sink_factory=None,
                 pause_on_error: bool = False):
        self.spark = spark
        self.configs = configs
        self.server = server
        self.sink_factory = sink_factory  # tests inject sinks per task
        #: server mode force-pauses progress when a task errors, so
        #: the operator inspects before the queue continues
        #: (lightning.go:162-165)
        self.pause_on_error = pause_on_error
        #: last N task outcomes (RunSummary or exception) — bounded
        #: so the perpetual server loop cannot grow without limit
        self.results: OrderedDict[int, object] = OrderedDict()
        self.max_results = 128
        #: set while a task runs; DELETE of the running task flips it
        self.cancel_event: threading.Event | None = None
        if server is not None:
            server.runner = self  # lets DELETE preempt the worker

    def cancel(self, tid: int) -> bool:
        """Preempt the RUNNING task (the reference kills the import
        on DELETE of the current task, lightning.go:427-441): flip
        the cooperative abort event (honored at table and engine
        boundaries) and cancel the task's Spark job group so the
        in-flight job dies too."""
        if self.server is None:
            return False
        with self.server._cur_lock:
            if self.server.current != tid:
                return False
            ev = self.cancel_event
        if ev is not None:
            ev.set()
        try:
            self.spark.sparkContext.cancelJobGroup(f"tlr4s-task-{tid}")
        except Exception:  # the job may have just finished
            log.debug("cancelJobGroup failed", exc_info=True)
        return True

    def run_one(self, timeout: float | None = None) -> bool:
        """Pop and run a single task; False on queue-empty timeout."""
        from .plans.pipeline import RestoreController

        cfg = self.configs.pop(timeout=timeout)
        if cfg is None:
            return False
        tid = getattr(cfg, "task_id", 0)
        # the fresh cancel event must be visible BEFORE current is —
        # a DELETE racing this window must never grab the previous
        # task's (or no) event and report a preemption that was lost
        ev = threading.Event()
        if self.server:
            with self.server._cur_lock:
                self.cancel_event = ev
                self.server.current = tid
                self.server.current_cfg = cfg
        else:
            self.cancel_event = ev
        failed = False
        try:
            sink = self.sink_factory(cfg) if self.sink_factory else None
            summary = RestoreController(
                self.spark, cfg, sink=sink,
                pauser=self.server.pauser if self.server else None,
                progress=self.server.progress if self.server else None,
                cancel_event=self.cancel_event,
                job_group=f"tlr4s-task-{tid}",
            ).run()
            self.results[tid] = summary
            failed = not summary.ok
            if self.server:
                with self.server._cur_lock:
                    c = self.server.counters
                    for r in summary.tables.values():
                        if r.status == "restored":
                            c["tables_restored_total"] += 1
                            c["bytes_restored_total"] += r.source_bytes
            log.info("task %d finished ok=%s", tid, summary.ok)
        except Exception as e:  # queue survives a failed task
            self.results[tid] = e
            failed = True
            log.exception("task %d failed", tid)
        finally:
            if self.server:
                with self.server._cur_lock:
                    self.server.current = None
                    self.server.current_cfg = None
                    self.server.counters["tasks_total"] += 1
                    if failed:
                        self.server.counters["tasks_failed_total"] += 1
        while len(self.results) > self.max_results:
            self.results.popitem(last=False)
        if failed and self.pause_on_error and self.server:
            self.server.pauser.pause()  # lightning.go:163
        return True

    def drain(self) -> int:
        """Run queued tasks until the queue is empty (test/batch
        mode); returns the number of tasks run."""
        n = 0
        while self.run_one(timeout=0.01):
            n += 1
        return n
