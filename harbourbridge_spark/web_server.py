"""HTTP transport for the session API (W1-W9 over a real socket).

The reference serves its session routes on net/http
(/root/reference/web/routes.go:23-54 registers handlers,
web/web.go:1103 ``App`` binds the server). This is the stdlib
equivalent: a ``ThreadingHTTPServer`` whose handler decodes the URL
query and request body, dispatches to ``WebApi.handle`` (which owns
all route/semantics/error-code logic), and writes the (status,
payload) pair back as JSON. Keeping the transport this thin means the
serialized façade and the socket surface can never disagree.

Usage::

    server = serve(WebApi(session))       # binds an ephemeral port
    port = server.server_address[1]
    ... curl http://127.0.0.1:{port}/ddl ...
    server.shutdown()

Thread-safety: ThreadingHTTPServer handles each request on its own
thread; WebApi mutations are serialized with a lock so concurrent
edits cannot interleave snapshot/rollback windows.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .web_api import WebApi


class _Handler(BaseHTTPRequestHandler):
    api: WebApi = None          # injected by serve()
    lock: threading.Lock = None

    def _dispatch(self, method: str) -> None:
        u = urlparse(self.path)
        query = {k: v[-1] for k, v in parse_qs(u.query).items()}
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length).decode("utf-8") if length else None
        with self.lock:
            status, payload = self.api.handle(method, u.path, query, body)
        data = json.dumps(payload).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self) -> None:
        self._dispatch("GET")

    def do_POST(self) -> None:
        self._dispatch("POST")

    def log_message(self, fmt, *args) -> None:
        pass                    # quiet: no per-request stderr lines


def serve(api: WebApi, host: str = "127.0.0.1",
          port: int = 0) -> ThreadingHTTPServer:
    """Start the session API server on a background thread and return
    it. ``port=0`` binds an ephemeral port (read it from
    ``server.server_address``); call ``server.shutdown()`` to stop."""
    handler = type("SessionHandler", (_Handler,),
                   {"api": api, "lock": threading.Lock()})
    server = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True,
                         name="hb-spark-web")
    t.start()
    return server
