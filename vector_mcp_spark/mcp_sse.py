"""HTTP+SSE MCP transport — the legacy two-endpoint MCP wire protocol.

The reference serves ``sse`` alongside ``streamable-http`` and stdio
(``vector_mcp/mcp_server.py:328-336``, delegated to FastMCP); this is the
Spark-side equivalent on the stdlib ``http.server``, completing transport
parity (stdio ``mcp_stdio.py``, streamable-http ``mcp_http.py``, sse here).
The protocol layer is ``mcp_stdio.handle_message`` verbatim — this module
only frames the two-endpoint SSE exchange:

* ``GET <sse_path>`` opens a ``text/event-stream`` response. The first
  event is ``event: endpoint`` whose data is the session-scoped POST URL
  (``<msg_path>?session_id=...``) — the MCP SSE handshake.
* ``POST <msg_path>?session_id=...`` carries one client JSON-RPC message;
  the server replies ``202 Accepted`` immediately and pushes the JSON-RPC
  response (if any — notifications produce none) onto the session's event
  stream as ``event: message``.
* Unknown/expired session ids → ``404``; unparseable JSON → the ``-32700``
  error envelope pushed on the stream (the POST is still 202, matching the
  asymmetric-channel design where all protocol traffic rides the stream).

Stream lifetime: between messages the handler emits a ``: ping`` comment
every ``KEEPALIVE_S`` so a vanished client surfaces as a broken pipe and the
session is reaped; there is no unbounded buffering — each session holds a
plain FIFO of pending responses only.
"""

from __future__ import annotations

import json
import queue
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from vector_mcp_spark.mcp_http import MAX_BODY_BYTES
from vector_mcp_spark.mcp_stdio import INTERNAL_ERROR, PARSE_ERROR, _error, handle_message
from vector_mcp_spark.toolgate import ToolFilter, joined_headers

KEEPALIVE_S = 15.0


def _sse_event(event: str, data: str) -> bytes:
    return f"event: {event}\ndata: {data}\n\n".encode()


def _make_handler(agent, sse_path: str, msg_path: str, keepalive_s: float,
                  tool_filter: ToolFilter | None = None, surface=None):
    static_filter = tool_filter or ToolFilter()
    # sid -> (response queue, the session's tool filter). The filter is
    # captured ONCE at stream connect (headers/query on the GET — the
    # reference's "during transport initialization" channel) and dies with
    # the session, so one client's restriction can never leak into another
    # session's visibility.
    sessions: dict[str, tuple[queue.Queue, ToolFilter]] = {}

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # noqa: A003 - silence stderr spam
            pass

        def _send(self, status: int, body: bytes):
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path.rstrip("/") == "/health":
                self._send(200, b'{"status": "ok"}')
                return
            if url.path.rstrip("/") != sse_path.rstrip("/"):
                self._send(404, b'{"error": "unknown endpoint"}')
                return
            sid = uuid.uuid4().hex
            q: queue.Queue = queue.Queue()
            session_filter = static_filter.narrowed(
                ToolFilter.from_request(joined_headers(self.headers), parse_qs(url.query))
            )
            sessions[sid] = (q, session_filter)
            # an event stream has no Content-Length; close delimits it
            self.close_connection = True
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            try:
                self.wfile.write(_sse_event("endpoint", f"{msg_path}?session_id={sid}"))
                self.wfile.flush()
                while True:
                    try:
                        item = q.get(timeout=keepalive_s)
                    except queue.Empty:
                        # liveness probe: a gone client raises on write below
                        self.wfile.write(b": ping\n\n")
                        self.wfile.flush()
                        continue
                    if item is None:  # explicit close (tests / shutdown)
                        break
                    self.wfile.write(_sse_event("message", json.dumps(item)))
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away; reap the session
            finally:
                sessions.pop(sid, None)

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                length = 0
            if length <= 0 or length > MAX_BODY_BYTES:
                self.close_connection = True  # cannot drain; never desync keep-alive
                self._send(400, b'{"error": "missing or oversized body"}')
                return
            raw = self.rfile.read(length)  # drain BEFORE any error response
            url = urlparse(self.path)
            if url.path.rstrip("/") != msg_path.rstrip("/"):
                self._send(404, b'{"error": "unknown endpoint"}')
                return
            post_query = parse_qs(url.query)
            sid = (post_query.get("session_id") or [""])[0]
            entry = sessions.get(sid)
            if entry is None:
                self._send(404, b'{"error": "unknown session"}')
                return
            q, session_filter = entry
            # a POST may narrow its session's filter further for this one
            # message (per-request headers/query), never widen it
            req_filter = session_filter.narrowed(
                ToolFilter.from_request(joined_headers(self.headers), post_query)
            )
            try:
                msg = json.loads(raw)
            except json.JSONDecodeError:
                q.put(_error(None, PARSE_ERROR, "invalid JSON"))
                self._send(202, b"")
                return
            # 202 FIRST, then dispatch on a worker: a tools/call can run a
            # long Spark job, and holding the POST open that long would trip
            # ordinary client HTTP timeouts (responses correlate by id on
            # the stream, so completion order need not match POST order)
            self._send(202, b"")

            def _dispatch(q=q, msg=msg, req_filter=req_filter):
                try:
                    resp = handle_message(agent, msg, req_filter, surface)
                except Exception as e:  # handle_message already contains
                    # dispatch errors; this guards the transport itself
                    resp = _error(msg.get("id") if isinstance(msg, dict) else None,
                                  INTERNAL_ERROR, f"{type(e).__name__}: {e}")
                if resp is not None:  # notifications push nothing
                    q.put(resp)

            threading.Thread(target=_dispatch, daemon=True).start()

    Handler._sessions = sessions  # exposed for tests / explicit close
    return Handler


def start_sse(
    agent,
    host: str = "127.0.0.1",
    port: int = 0,
    sse_path: str = "/sse",
    msg_path: str = "/messages",
    keepalive_s: float = KEEPALIVE_S,
    tool_filter: ToolFilter | None = None,
    surface=None,
) -> ThreadingHTTPServer:
    """Bind and return a ready ``ThreadingHTTPServer`` (not yet serving);
    ``server.server_address[1]`` is the bound port when ``port=0``. Handler
    threads are daemons so a test teardown never hangs on an open stream."""
    server = ThreadingHTTPServer(
        (host, port), _make_handler(agent, sse_path, msg_path, keepalive_s, tool_filter, surface)
    )
    server.daemon_threads = True
    return server


def serve_sse(
    agent, host: str = "127.0.0.1", port: int = 8001, sse_path: str = "/sse",
    msg_path: str = "/messages", tool_filter: ToolFilter | None = None, surface=None,
) -> None:
    import sys

    server = start_sse(agent, host, port, sse_path, msg_path, tool_filter=tool_filter,
                       surface=surface)
    bound = server.server_address[1]
    print(f"vector-mcp-spark MCP serving sse on http://{host}:{bound}{sse_path}",
          file=sys.stderr, flush=True)
    try:
        server.serve_forever()
    finally:
        server.server_close()
