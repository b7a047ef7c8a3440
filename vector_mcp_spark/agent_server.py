"""A2A agent serving loop — the card + invoke routes over real HTTP.

The reference's ``vector-agent`` console script serves a full chat-agent on
the external ``agent_utilities`` framework
(``vector_mcp/agent_server.py:26-92``, dep at ``pyproject.toml:33``): an
identity card, an HTTP host/port, and tool dispatch against the MCP config.
The framework wraps an LLM loop — not a query capability — so this module
serves the GOVERNED equivalent surface framework-free, on the same stdlib
``http.server`` plumbing the MCP streamable-HTTP transport uses
(``mcp_http.py``):

* ``GET /.well-known/agent-card.json`` (and ``/card``) — the A2A discovery
  document, entitlement-filtered per :meth:`AgentCardVeneer.card`.
* ``GET /health`` — liveness, same contract as the MCP transport.
* ``POST /invoke`` with ``{"tool", "action", "args"?}`` — one authenticated
  dispatch through :meth:`AgentCardVeneer.dispatch`; the calling principal
  is read from ``Authorization: Bearer <principal>`` so the Eunomia-shaped
  policy can scope rules per identity. Errors stay stable snake_case dicts
  (HTTP 200 with an ``error`` field — the governed-refusal contract), while
  transport-level problems (bad JSON, wrong route, oversized body) get
  4xx with a JSON body.

``start_agent_http`` binds and returns the server for in-process tests;
``serve_agent_http`` blocks — the deployment entry point.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from vector_mcp_spark.agent_card import AgentCardVeneer

MAX_BODY_BYTES = 1 * 1024 * 1024  # one dispatch request, not a data channel

CARD_PATHS = ("/.well-known/agent-card.json", "/card")


def _make_handler(agent: AgentCardVeneer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # noqa: A003 - silence request spam
            pass

        def _send(self, status: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            path = self.path.split("?", 1)[0].rstrip("/") or "/"
            if path == "/health":
                self._send(200, {"status": "ok"})
            elif path in [p.rstrip("/") for p in CARD_PATHS]:
                self._send(200, agent.card())
            else:
                self._send(404, {"error": "unknown endpoint", "routes": [*CARD_PATHS, "/invoke", "/health"]})

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                length = 0
            if length <= 0 or length > MAX_BODY_BYTES:
                # close: unread keep-alive body bytes would desync the socket
                self.close_connection = True
                self._send(400, {"error": "missing or oversized body"})
                return
            raw = self.rfile.read(length)  # drain BEFORE any error response
            if self.path.split("?", 1)[0].rstrip("/") != "/invoke":
                self._send(404, {"error": "unknown endpoint"})
                return
            try:
                req = json.loads(raw)
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON"})
                return
            if not isinstance(req, dict) or "tool" not in req or "action" not in req:
                self._send(400, {"error": "body must be {tool, action, args?}"})
                return
            args = req.get("args") or {}
            if not isinstance(args, dict):
                self._send(400, {"error": "args must be an object"})
                return
            # dispatch positional/keyword names a client-supplied kwarg must
            # never shadow (a duplicate would raise TypeError pre-call)
            reserved = {"tool", "action", "principal"} & set(args)
            if reserved:
                self._send(
                    200,
                    {"error": "arguments_invalid", "reserved_keys": sorted(reserved)},
                )
                return
            # client-argument validation (unknown kwargs → arguments_invalid)
            # happens INSIDE dispatch, after the authz/entitlement gates, so
            # an unauthenticated caller cannot probe valid parameter names
            # per tool (AgentCardVeneer._unknown_kwargs)
            principal = None
            auth = self.headers.get("Authorization") or ""
            if auth.startswith("Bearer "):
                principal = auth[len("Bearer "):].strip() or None
            try:
                out = agent.dispatch(
                    str(req["tool"]), str(req["action"]), principal=principal, **args
                )
            except Exception as e:
                # never leak a traceback onto the wire (mcp_stdio.py:79)
                out = {"error": "internal_error", "detail": f"{type(e).__name__}: {e}"[:200]}
            self._send(200, out)

    return Handler


def start_agent_http(agent: AgentCardVeneer, host: str = "127.0.0.1", port: int = 0):
    """Bind and return a ready ``ThreadingHTTPServer`` (not yet serving);
    ``server.server_address[1]`` is the bound port when ``port=0``."""
    return ThreadingHTTPServer((host, port), _make_handler(agent))


def serve_agent_http(
    agent: AgentCardVeneer, host: str = "127.0.0.1", port: int = 8001
) -> None:
    """Block serving the card + invoke routes (the ``vector-agent`` loop)."""
    import sys

    server = start_agent_http(agent, host, port)
    bound = server.server_address[1]
    print(
        f"vector-mcp-spark agent serving A2A card+invoke on http://{host}:{bound}/",
        file=sys.stderr,
        flush=True,
    )
    try:
        server.serve_forever()
    finally:
        server.server_close()
