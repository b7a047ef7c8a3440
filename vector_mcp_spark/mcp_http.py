"""Streamable-HTTP MCP transport — JSON-RPC 2.0 over a single POST endpoint.

The reference serves ``streamable-http`` (and ``sse``) alongside stdio
(``vector_mcp/mcp_server.py:328-336``); this is the Spark-side equivalent,
built on the stdlib ``http.server`` so it carries no new dependencies. The
protocol layer is ``mcp_stdio.handle_message`` verbatim — the transport only
frames HTTP:

* ``POST <path>`` with a JSON-RPC request body → ``200 application/json``
  with the response body.
* ``POST`` with a notification (no ``id``) → ``202 Accepted``, empty body
  (side effects still run; JSON-RPC forbids responding to notifications).
* ``POST`` with unparseable JSON → 200 with a ``-32700`` parse error (the
  JSON-RPC error envelope, not an HTTP error, so strict clients can read it).
* ``GET`` → ``405`` — the optional server-push stream of the
  streamable-http spec is not served here; every exchange is
  request/response. The dedicated two-endpoint SSE transport lives in
  ``mcp_sse.py``.

``serve_http`` binds, reports the chosen port (for ``port=0`` loopback
tests), and blocks; ``start_http`` returns the live ``ThreadingHTTPServer``
for in-process tests to drive and shut down.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from vector_mcp_spark.mcp_stdio import PARSE_ERROR, _error, handle_message
from vector_mcp_spark.toolgate import ToolFilter, joined_headers

MAX_BODY_BYTES = 8 * 1024 * 1024  # one MCP message, not a bulk-data channel


def _make_handler(agent, path: str, tool_filter: ToolFilter | None = None, surface=None):
    static_filter = tool_filter or ToolFilter()
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # noqa: A003 - silence per-request stderr spam
            pass

        def _send(self, status: int, body: bytes, content_type: str = "application/json"):
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            # health probe parity with the reference's custom /health route
            # (vector_mcp/mcp_server.py + tests/test_mcp_server.py:44-52)
            if self.path.rstrip("/") == "/health":
                self._send(200, b'{"status": "ok"}')
                return
            self._send(405, b'{"error": "SSE stream not supported; POST JSON-RPC"}')

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                length = 0
            if length <= 0 or length > MAX_BODY_BYTES:
                # can't (or won't) drain the body — close so a keep-alive
                # client never sees the unread bytes parsed as its next request
                self.close_connection = True
                self._send(400, b'{"error": "missing or oversized body"}')
                return
            # drain the body BEFORE any error response: on an HTTP/1.1
            # keep-alive socket, unread body bytes would desynchronize the
            # connection for the client's next pooled request
            raw = self.rfile.read(length)
            url = urlparse(self.path)
            if url.path.rstrip("/") != path.rstrip("/"):
                self._send(404, b'{"error": "unknown endpoint"}')
                return
            # per-request tool visibility (reference README.md:100-106):
            # x-mcp-*-tools/tags headers and ?tools=/&tags= query params
            # NARROW the deployment's static filter for THIS request only
            req_filter = static_filter.narrowed(
                ToolFilter.from_request(joined_headers(self.headers), parse_qs(url.query))
            )
            try:
                msg = json.loads(raw)
            except json.JSONDecodeError:
                resp: dict | None = _error(None, PARSE_ERROR, "invalid JSON")
            else:
                resp = handle_message(agent, msg, req_filter, surface)
            if resp is None:
                self._send(202, b"")
            else:
                self._send(200, json.dumps(resp).encode())

    return Handler


def start_http(agent, host: str = "127.0.0.1", port: int = 0, path: str = "/mcp",
               tool_filter: ToolFilter | None = None, surface=None):
    """Bind and return a ready ``ThreadingHTTPServer`` (not yet serving).

    Callers run ``serve_forever()`` on a thread (tests) or inline (``main``);
    ``server.server_address[1]`` is the bound port when ``port=0``."""
    return ThreadingHTTPServer((host, port), _make_handler(agent, path, tool_filter, surface))


def serve_http(agent, host: str = "127.0.0.1", port: int = 8000, path: str = "/mcp",
               tool_filter: ToolFilter | None = None, surface=None) -> None:
    import sys

    server = start_http(agent, host, port, path, tool_filter, surface)
    bound = server.server_address[1]
    print(f"vector-mcp-spark MCP serving streamable-http on http://{host}:{bound}{path}",
          file=sys.stderr, flush=True)
    try:
        server.serve_forever()
    finally:
        server.server_close()
