"""P19: thin HTTP trigger for the pipeline.

The reference is packaged as an HTTP server whose ``/fetch`` handler runs
the whole ETL and answers ``OK`` on success or 500 + the error text on
failure (fetch.go:267-276; port from ``$PORT``, fetch.go:287-299). Spark
jobs are normally triggered by a scheduler, so this stays deliberately
thin: a stdlib ``http.server`` wrapper around any zero-arg runner — no
framework, no routing beyond the one path the reference has.
"""

from __future__ import annotations

import os
import traceback
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_server(
    runner: Callable[[], object], port: int = 0, host: str = "127.0.0.1"
) -> ThreadingHTTPServer:
    """An HTTP server whose GET /fetch invokes ``runner``.

    200 ``OK`` on success, 500 + error text on exception (the reference's
    exact contract, fetch.go:268-273), 404 elsewhere. Port 0 binds an
    ephemeral port (tests); production passes ``$PORT`` via ``serve``.
    """

    class FetchHandler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
            if self.path.rstrip("/") != "/fetch":
                self.send_error(404)
                return
            try:
                runner()
            except Exception:  # noqa: BLE001 — mirror fetch.go:268-273
                body = traceback.format_exc().encode()
                self.send_response(500)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"OK")

        def log_message(self, *args):  # quiet: tests and batch logs
            pass

    return ThreadingHTTPServer((host, port), FetchHandler)


def serve(runner: Callable[[], object]) -> None:
    """Blocking entry point: port from ``$PORT`` (default 8080, like
    fetch.go:287-290)."""
    port = int(os.environ.get("PORT", "8080"))
    make_server(runner, port=port, host="0.0.0.0").serve_forever()  # noqa: S104
