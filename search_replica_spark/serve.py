"""K9 serving surface: live ``/metrics`` + ``/state`` HTTP endpoints.

The reference serves Prometheus metrics and a healthcheck over HTTP
(reference: main.go:100-107 mounts promhttp + /state; state.go:9-17 keeps
the tri-state health value the endpoint reports). The engine's metrics
already live in ``metrics.json`` next to the index (the durable form a
Spark driver can always write); this module puts the reference's serving
contract on top — a stdlib HTTP server a replica operator can scrape with
an unmodified Prometheus config.

Design: the server reads the files on every request (no shared state with
the streaming loop, no locking — the writes are atomic ``os.replace``),
so it can run in ANY process that sees the index directory: the driver, a
sidecar, or a health-probe container. Scrape cost is one small-file read.

Endpoints:
  - ``/metrics`` — Prometheus text exposition (``ssr_`` prefix), gauges
    from the metrics snapshot.
  - ``/state``   — JSON healthcheck: ``{"status": "ok"|"empty", ...}``
    mirroring state.go's liveness answer, plus generation/epoch progress.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from search_replica_spark.streaming.incremental import read_metrics

_NUMERIC = (int, float)


def _prometheus_text(m: dict) -> str:
    """Render numeric metrics as Prometheus gauges (text exposition v0)."""
    lines = []
    for k in sorted(m):
        v = m[k]
        if isinstance(v, bool):
            v = int(v)
        if isinstance(v, _NUMERIC):
            name = f"ssr_{k}"
            lines.append(f"# TYPE {name} gauge")
            lines.append(f"{name} {v}")
    return "\n".join(lines) + "\n"


def _state_doc(m: dict) -> dict:
    """state.go-shaped health answer derived from the commit log."""
    return {
        "status": "ok" if m.get("live_generations", 0) > 0 else "empty",
        "generations": m.get("generations", 0),
        "live_generations": m.get("live_generations", 0),
        "docs_indexed": m.get("docs_indexed", 0),
        "last_epoch": m.get("last_epoch"),
        "updated_unix": m.get("updated_unix"),
    }


class _Handler(BaseHTTPRequestHandler):
    index_dir: str = ""
    input_dir: str | None = None

    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler contract
        route = self.path.split("?")[0]
        try:
            m = read_metrics(self.index_dir)
            if self.input_dir is not None and route == "/metrics":
                # LIVE replication lag at scrape time (the reference's
                # GaugeFunc shape, slot_lag.go:15-39) — metrics.json only
                # refreshes per batch, but lag must be visible the moment
                # the source runs ahead of an idle stream. Only the
                # /metrics route pays the input-dir walk; /state and 404
                # probes stay one small-file read.
                from search_replica_spark.streaming.incremental import slot_lag

                m.update(slot_lag(self.index_dir, self.input_dir))
        except Exception as e:  # noqa: BLE001 — a scrape must never kill the server
            self._send(500, str(e).encode(), "text/plain")
            return
        if route == "/metrics":
            self._send(
                200, _prometheus_text(m).encode(), "text/plain; version=0.0.4"
            )
        elif route == "/state":
            self._send(200, json.dumps(_state_doc(m)).encode(), "application/json")
        else:
            self._send(404, b"not found\n", "text/plain")

    def log_message(self, *args):  # silence per-request stderr lines
        pass


def serve_state(index_dir: str, port: int = 0,
                input_dir: str | None = None) -> tuple[ThreadingHTTPServer, int]:
    """Start the metrics/health server on a daemon thread; returns
    ``(server, bound_port)`` (``port=0`` = ephemeral, the production
    default when the driver does not own a stable port — the bound port is
    what gets registered with service discovery). ``server.shutdown()``
    stops it. ``input_dir``: when given, every scrape also computes the
    LIVE slot-lag gauges (pending_input_files / seconds_behind_source)
    against that source directory."""
    handler = type("_BoundHandler", (_Handler,),
                   {"index_dir": index_dir, "input_dir": input_dir})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, name="ssr-state-http", daemon=True)
    t.start()
    return srv, srv.server_address[1]
