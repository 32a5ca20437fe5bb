"""The status-server dashboard (lightning.go:90-111 mounts ``/`` ->
redirect ``/web/`` -> the bundled React app in /root/reference/web).

The analog is one dependency-free HTML document (vanilla JS, no build
step, no CDN) polling the same JSON endpoints the reference app calls
through ``web/src/api.ts``:

- ``GET /progress/task``   -> per-table cards with byte progress bars
  (ProgressPage.tsx / TableProgressCard.tsx)
- ``GET /progress/table?t=`` -> the engine/chunk ladder drill-down
  (TableProgressPage.tsx, EnginesProgressPanel / ChunksProgressPanel)
- ``GET /tasks`` + PATCH/DELETE -> queue panel with front/back/delete
  (TaskButton.tsx / MoveTaskButton.tsx)
- ``PUT /pause`` / ``PUT /resume`` + ``GET /pause`` -> the pause
  toggle (PauseButton.tsx)
- ``GET /metrics``        -> footer counters

Serving stays in server.py; this module only holds the document so
the handler stays readable.
"""

INDEX_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>tidb-lightning-spark</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
  :root { --bg:#fff; --fg:#1a1a1a; --muted:#6b6b6b; --card:#f5f5f7;
          --bar:#3b6ea5; --done:#2e7d32; --err:#b3261e; --edge:#e0e0e3; }
  @media (prefers-color-scheme: dark) {
    :root { --bg:#121316; --fg:#e8e8ea; --muted:#9a9aa2; --card:#1d1f24;
            --bar:#7aa2cc; --done:#81c784; --err:#f2b8b5; --edge:#2c2e33; }
  }
  body { margin:0; background:var(--bg); color:var(--fg);
         font:14px/1.45 system-ui, sans-serif; }
  header { display:flex; align-items:center; gap:12px;
           padding:10px 16px; border-bottom:1px solid var(--edge); }
  header h1 { font-size:16px; margin:0; font-weight:600; }
  header .spacer { flex:1; }
  main { max-width:880px; margin:0 auto; padding:16px; }
  h2 { font-size:13px; text-transform:uppercase; letter-spacing:.06em;
       color:var(--muted); margin:20px 0 8px; }
  .card { background:var(--card); border:1px solid var(--edge);
          border-radius:8px; padding:10px 12px; margin-bottom:8px; }
  .row { display:flex; align-items:baseline; gap:8px; }
  .row .name { font-weight:600; cursor:pointer; }
  .row .pct { margin-left:auto; font-variant-numeric:tabular-nums; }
  .bar { height:6px; border-radius:3px; background:var(--edge);
         overflow:hidden; margin-top:6px; }
  .bar > div { height:100%; background:var(--bar); width:0; }
  .done .bar > div { background:var(--done); }
  .msg { color:var(--err); font-size:12px; margin-top:4px;
         white-space:pre-wrap; }
  .muted { color:var(--muted); }
  button { font:inherit; padding:3px 10px; border-radius:6px;
           border:1px solid var(--edge); background:var(--card);
           color:var(--fg); cursor:pointer; }
  button:hover { border-color:var(--bar); }
  table { border-collapse:collapse; width:100%; font-size:13px; }
  td, th { text-align:left; padding:3px 8px;
           border-bottom:1px solid var(--edge);
           font-variant-numeric:tabular-nums; }
  #detail:empty, #queue:empty { display:none; }
  pre#metrics { font-size:12px; color:var(--muted); overflow:auto; }
</style>
</head>
<body>
<header>
  <h1>tidb-lightning-spark</h1>
  <span id="taskstate" class="muted"></span>
  <span class="spacer"></span>
  <button id="pausebtn" title="PUT /pause | /resume">pause</button>
</header>
<main>
  <h2>Tables</h2>
  <div id="tables" data-endpoint="/progress/task"><span class="muted">
    no restore has started yet</span></div>
  <h2 id="detailhead" style="display:none">Table detail</h2>
  <div id="detail" data-endpoint="/progress/table"></div>
  <h2>Task queue</h2>
  <div id="queue" data-endpoint="/tasks"></div>
  <h2>Metrics</h2>
  <pre id="metrics" data-endpoint="/metrics"></pre>
</main>
<script>
"use strict";
const $ = (id) => document.getElementById(id);
const fmtBytes = (n) => {
  if (!isFinite(n)) return "?";
  const u = ["B","KiB","MiB","GiB","TiB"];
  let i = 0; while (n >= 1024 && i < u.length-1) { n /= 1024; i++; }
  return n.toFixed(i ? 1 : 0) + " " + u[i];
};
let paused = false, detailTable = null;

async function jget(url) {
  const r = await fetch(url, {cache: "no-store"});
  if (!r.ok) throw new Error(url + " -> " + r.status);
  return r.json();
}

// ProgressPage: one card per table from /progress/task {"t":{name:
// {"w","z","s","m"}}, "s", "m"} (web/progress.go marshal shape)
async function refreshTables() {
  const p = await jget("/progress/task");
  $("taskstate").textContent =
    ["task: not started", "task: running", "task: completed"][p.s] +
    (p.m ? " — " + p.m : "");
  const names = Object.keys(p.t || {});
  if (!names.length) return;
  $("tables").innerHTML = "";
  for (const name of names.sort()) {
    const rec = p.t[name];
    const pct = rec.z ? Math.min(100, 100 * rec.w / rec.z) : 0;
    const card = document.createElement("div");
    card.className = "card" + (rec.s === 2 ? " done" : "");
    card.innerHTML =
      '<div class="row"><span class="name"></span>' +
      '<span class="muted">' + fmtBytes(rec.w) + " / " +
      fmtBytes(rec.z) + '</span>' +
      '<span class="pct">' + pct.toFixed(1) + "%</span></div>" +
      '<div class="bar"><div style="width:' + pct + '%"></div></div>' +
      (rec.m ? '<div class="msg"></div>' : "");
    card.querySelector(".name").textContent = name;
    if (rec.m) card.querySelector(".msg").textContent = rec.m;
    card.querySelector(".name").onclick = () => {
      detailTable = name; refreshDetail().catch(console.error);
    };
    $("tables").appendChild(card);
  }
}

// TableProgressPage: engine/chunk ladder from /progress/table?t=,
// shape TableCheckpoint {Status, AllocBase, Engines: {id: {Status,
// Chunks: [{Key:{Path,Offset}, Status}], Checksum?}}}
// (plans/checkpoints.py marshal_table; engine "-1" = not-yet-claimed)
const esc = (s) => String(s).replace(/[&<>"]/g, (c) =>
  ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;"}[c]));
async function refreshDetail() {
  if (!detailTable) return;
  $("detailhead").style.display = "";
  const d = await jget("/progress/table?t=" +
                       encodeURIComponent(detailTable));
  const rows = Object.entries(d.Engines || {}).map(([eid, e]) =>
    "<tr><td>" + esc(eid) + "</td><td>" + esc(e.Status) + "</td><td>" +
    (e.Checksum ? "crc " + esc(e.Checksum.checksum) + " · " +
     esc(e.Checksum.kvs) + " kvs" : "") + "</td><td>" +
    (e.Chunks || []).map((c) =>
      esc(c.Key.Path.split("/").pop()) + "@" + esc(c.Key.Offset) +
      " → " + esc(c.Status)
    ).join("<br>") + "</td></tr>").join("");
  $("detail").innerHTML =
    '<div class="card"><div class="row"><span class="name"></span>' +
    '<span class="muted">status ' + esc(d.Status ?? "?") +
    " · alloc_base " + esc(d.AllocBase ?? 0) + "</span></div>" +
    '<table><tr><th>engine</th><th>status</th><th>checksum</th>' +
    "<th>chunks</th></tr>" + rows + "</table></div>";
  $("detail").querySelector(".name").textContent = detailTable;
}

// TaskButton/MoveTaskButton: queue ops over /tasks
async function refreshQueue() {
  const q = await jget("/tasks");
  const el = $("queue");
  el.innerHTML = "";
  const mk = (tid, label, current) => {
    const div = document.createElement("div");
    div.className = "card row";
    div.innerHTML = '<span class="name">task ' + tid + "</span>" +
      (current ? '<span class="muted">running</span>' : "");
    if (!current) {
      for (const [txt, method, verb] of [
          ["front", "PATCH", "/front"], ["back", "PATCH", "/back"],
          ["delete", "DELETE", ""]]) {
        const b = document.createElement("button");
        b.textContent = txt;
        b.onclick = () => fetch("/tasks/" + tid + verb, {method})
          .then(refreshQueue);
        div.appendChild(b);
      }
    }
    el.appendChild(div);
  };
  if (q.current != null) mk(q.current, "", true);
  for (const tid of q.queue) mk(tid, "", false);
  if (q.current == null && !q.queue.length) {
    el.innerHTML = '<span class="muted">queue empty</span>';
  }
}

async function refreshMetrics() {
  const r = await fetch("/metrics", {cache: "no-store"});
  $("metrics").textContent = await r.text();
}

async function refreshPause() {
  const p = await jget("/pause");
  paused = !!p.paused;
  $("pausebtn").textContent = paused ? "resume" : "pause";
}
$("pausebtn").onclick = async () => {
  await fetch(paused ? "/resume" : "/pause", {method: "PUT"});
  await refreshPause();
};

function tick() {
  Promise.allSettled([
    refreshTables(), refreshQueue(), refreshMetrics(),
    refreshPause(), refreshDetail(),
  ]);
}
tick();
setInterval(tick, 2000);
</script>
</body>
</html>
"""
