"""Serving layer — named queries over HTTP, stdlib-only.

The reference serves its metrics through Looker dashboards over the
Redshift serving table (README.md:112-116; static/dashboard.png) with
``monthly_count`` (api.py:9-24) as the canonical dashboard aggregate.
The engine's equivalent: a tiny HTTP endpoint that exposes registered
DataFrame-producing queries as JSON — the BI tool (or curl) hits
``GET /query/<name>``, the engine runs the Spark plan and returns rows.

Serving-sized results only: endpoints return aggregates (the monthly
rollup is ~tens of rows), so the driver-side ``collect`` here is the
correct topology — the heavy lifting happened distributed, upstream,
when the warehouse/serving tables were written. A ``limit`` query
parameter caps the transfer (default 1,000 rows) so a mis-registered
fact-table query cannot OOM the driver.

No Flask dependency: ``http.server.ThreadingHTTPServer`` from the
stdlib. Run via :meth:`ServingApi.serve_forever` or use
:meth:`ServingApi.start` / :meth:`ServingApi.stop` for an embedded
(test) server on an ephemeral port.
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import threading
import urllib.parse
from collections.abc import Callable, Mapping
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

DEFAULT_ROW_CAP = 1000


def _json_default(v):
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


class ServingApi:
    """Expose named DataFrame-producing callables as JSON endpoints.

    Routes:
      - ``GET /health``            → ``{"ok": true, "queries": [...]}``
      - ``GET /query/<name>``      → ``{"name": ..., "rows": [...],
        "n": int, "truncated": bool}``; optional ``?limit=N``.
      - unknown name → 404; query raising → 500 with the error message.
    """

    def __init__(self, queries: Mapping[str, Callable[[], DataFrame]], row_cap: int = DEFAULT_ROW_CAP):
        self.queries = dict(queries)
        self.row_cap = row_cap
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- request handling ---------------------------------------------------

    def _run_query(self, name: str, limit: int) -> tuple[int, dict]:
        fn = self.queries.get(name)
        if fn is None:
            return 404, {"error": f"unknown query '{name}'", "queries": sorted(self.queries)}
        try:
            cap = min(limit, self.row_cap)
            rows = fn().limit(cap + 1).collect()
        except Exception as exc:  # noqa: BLE001 — surfaced as a 500 body
            return 500, {"error": str(exc)}
        truncated = len(rows) > cap
        payload = [r.asDict(recursive=True) for r in rows[:cap]]
        return 200, {"name": name, "rows": payload, "n": len(payload), "truncated": truncated}

    def _make_handler(self):
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test output
                pass

            def _send(self, status: int, body: dict) -> None:
                data = json.dumps(body, default=_json_default).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self) -> None:  # noqa: N802 — http.server API
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path == "/health":
                    self._send(200, {"ok": True, "queries": sorted(api.queries)})
                    return
                if parsed.path.startswith("/query/"):
                    name = parsed.path[len("/query/") :]
                    params = urllib.parse.parse_qs(parsed.query)
                    try:
                        limit = int(params.get("limit", [api.row_cap])[0])
                    except ValueError:
                        self._send(400, {"error": "limit must be an integer"})
                        return
                    self._send(*api._run_query(name, limit))
                    return
                self._send(404, {"error": "not found"})

        return Handler

    # -- lifecycle ----------------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving on a background thread; returns the bound port."""
        self._server = ThreadingHTTPServer((host, port), self._make_handler())
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def serve_forever(self, host: str = "0.0.0.0", port: int = 8080) -> None:
        ThreadingHTTPServer((host, port), self._make_handler()).serve_forever()
