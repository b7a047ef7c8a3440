"""Dynamic tool selection & visibility (reference README.md:91-106):
CLI/env startup filters, per-request header/query filters on the HTTP and
SSE transports, narrow-only composition, and session isolation."""

import json

import pytest

from vector_mcp_spark.api import VectorSearchApi
from vector_mcp_spark.engine import CollectionEngine
from vector_mcp_spark.mcp import McpVeneer
from vector_mcp_spark.toolgate import ToolFilter

ALL_TOOLS = {"vector_collection_management", "vector_search", "vector_backend_operations"}


def _rpc(method, msg_id=None, **params):
    msg = {"jsonrpc": "2.0", "method": method}
    if msg_id is not None:
        msg["id"] = msg_id
    if params:
        msg["params"] = params
    return msg


# -- ToolFilter value semantics ----------------------------------------------


def test_filter_noop_allows_everything():
    f = ToolFilter()
    assert f.is_noop()
    assert f.allows("vector_search", ("search", "read"))


def test_filter_enable_lists_are_opt_in():
    f = ToolFilter(enabled_tools=frozenset({"vector_search"}))
    assert f.allows("vector_search", ("search",))
    assert not f.allows("vector_collection_management", ("collections",))
    # a tag match also opts in when tag enable-list used
    g = ToolFilter(enabled_tags=frozenset({"read"}))
    assert g.allows("vector_search", ("search", "read"))
    assert not g.allows("vector_collection_management", ("collections", "write"))


def test_filter_deny_wins_over_enable():
    f = ToolFilter(
        enabled_tools=frozenset({"vector_search"}),
        disabled_tags=frozenset({"search"}),
    )
    assert not f.allows("vector_search", ("search", "read"))


def test_filter_narrowing_cannot_widen():
    static = ToolFilter(disabled_tools=frozenset({"vector_collection_management"}))
    # the request tries to enable the very tool the deployment disabled
    request = ToolFilter(enabled_tools=frozenset({"vector_collection_management"}))
    eff = static.narrowed(request)
    assert not eff.allows("vector_collection_management", ("collections",))
    # ... and narrowing with a noop filter is the static filter itself
    assert static.narrowed(None) is static
    assert static.narrowed(ToolFilter()) is static


def test_filter_channels_parse_and_union(monkeypatch):
    monkeypatch.setenv("MCP_DISABLED_TOOLS", "vector_backend_operations")
    monkeypatch.setenv("MCP_ENABLED_TAGS", " read , search ")
    f = ToolFilter.static_filter(tools="vector_collection_management", toolsets=None)
    assert f.enabled_tools == frozenset({"vector_collection_management"})
    assert f.enabled_tags == frozenset({"read", "search"})
    assert f.disabled_tools == frozenset({"vector_backend_operations"})
    # union of opt-ins: enabled by CLI name OR env tag — but env deny wins
    assert f.allows("vector_collection_management", ("collections", "write"))
    assert f.allows("vector_search", ("search", "read"))
    assert not f.allows("vector_backend_operations", ("backend", "read"))


def test_filter_from_request_headers_and_query():
    f = ToolFilter.from_request(
        {"X-MCP-Disabled-Tools": "vector_search"},  # header case-insensitive
        {"tools": ["vector_search,vector_backend_operations"]},
    )
    assert not f.allows("vector_search", ())  # deny wins
    assert f.allows("vector_backend_operations", ())
    assert not f.allows("vector_collection_management", ())  # not opted in


# -- protocol layer (shared by all three transports) --------------------------


@pytest.fixture()
def gate_agent(spark, tmp_path_factory):
    from vector_mcp_spark.agent_card import AgentCardVeneer

    eng = CollectionEngine(spark, str(tmp_path_factory.mktemp("toolgate_root")))
    return AgentCardVeneer(McpVeneer(eng, VectorSearchApi(eng)))


def test_disabled_tool_absent_from_tools_list(gate_agent):
    from vector_mcp_spark import mcp_stdio as t

    f = ToolFilter(disabled_tools=frozenset({"vector_collection_management"}))
    resp = t.handle_message(gate_agent, _rpc("tools/list", 1), f)
    names = {tool["name"] for tool in resp["result"]["tools"]}
    assert names == ALL_TOOLS - {"vector_collection_management"}
    # without the filter the full surface is unchanged
    resp = t.handle_message(gate_agent, _rpc("tools/list", 2))
    assert {tool["name"] for tool in resp["result"]["tools"]} == ALL_TOOLS


def test_toolset_tag_filtering(gate_agent):
    from vector_mcp_spark import mcp_stdio as t

    # a search-only endpoint: enable the "search" toolset
    f = ToolFilter(enabled_tags=frozenset({"search"}))
    resp = t.handle_message(gate_agent, _rpc("tools/list", 1), f)
    assert {tool["name"] for tool in resp["result"]["tools"]} == {"vector_search"}
    # a read-only endpoint: disable the "write" toolset
    g = ToolFilter(disabled_tags=frozenset({"write"}))
    resp = t.handle_message(gate_agent, _rpc("tools/list", 2), g)
    assert {tool["name"] for tool in resp["result"]["tools"]} == {
        "vector_search", "vector_backend_operations"}


def test_calling_filtered_tool_is_tool_invalid(gate_agent):
    from vector_mcp_spark import mcp_stdio as t

    f = ToolFilter(disabled_tools=frozenset({"vector_collection_management"}))
    resp = t.handle_message(gate_agent, _rpc(
        "tools/call", 1, name="vector_collection_management",
        arguments={"action": "list_collections"}), f)
    assert resp["result"]["isError"] is True
    out = json.loads(resp["result"]["content"][0]["text"])
    assert out["error"] == "tool_invalid"
    # allowed/did-you-mean only expose the VISIBLE surface
    assert set(out["allowed"]) == ALL_TOOLS - {"vector_collection_management"}
    assert "vector_collection_management" not in out["did_you_mean"]
    # did-you-mean stays helpful for typos of visible tools
    resp = t.handle_message(gate_agent, _rpc(
        "tools/call", 2, name="vector_serch", arguments={"action": "semantic_search"}), f)
    out = json.loads(resp["result"]["content"][0]["text"])
    assert out["error"] == "tool_invalid"
    assert "vector_search" in out["did_you_mean"]
    # a visible tool still dispatches normally under the same filter
    resp = t.handle_message(gate_agent, _rpc(
        "tools/call", 3, name="vector_backend_operations", arguments={"action": "doctor"}), f)
    assert resp["result"]["isError"] is False


def test_stdio_serve_honors_startup_filter(gate_agent):
    import io

    from vector_mcp_spark import mcp_stdio as t

    f = ToolFilter.static_filter(tools="vector_search", env={})
    out = io.StringIO()
    lines = [json.dumps(_rpc("tools/list", 1)), json.dumps(_rpc(
        "tools/call", 2, name="vector_collection_management",
        arguments={"action": "list_collections"}))]
    t.serve(gate_agent, io.StringIO("\n".join(lines) + "\n"), out, f)
    resps = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert {tool["name"] for tool in resps[0]["result"]["tools"]} == {"vector_search"}
    assert json.loads(resps[1]["result"]["content"][0]["text"])["error"] == "tool_invalid"


# -- HTTP transport: per-request headers/query --------------------------------


def _http_post(url, body: bytes, headers=None):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json", **(headers or {})}
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture()
def gated_http_server(gate_agent):
    import threading

    from vector_mcp_spark.mcp_http import start_http

    static = ToolFilter(disabled_tools=frozenset({"vector_backend_operations"}))
    server = start_http(gate_agent, port=0, tool_filter=static)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}/mcp"
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_http_per_request_filters(gated_http_server):
    url = gated_http_server
    # static (deployment) filter applies with no request filter
    _, body = _http_post(url, json.dumps(_rpc("tools/list", 1)).encode())
    names = {t["name"] for t in json.loads(body)["result"]["tools"]}
    assert names == ALL_TOOLS - {"vector_backend_operations"}

    # request header narrows further — for THIS request only
    _, body = _http_post(url, json.dumps(_rpc("tools/list", 2)).encode(),
                         headers={"x-mcp-disabled-tools": "vector_collection_management"})
    names = {t["name"] for t in json.loads(body)["result"]["tools"]}
    assert names == {"vector_search"}

    # query param enable-list narrows; cannot resurrect the static deny
    _, body = _http_post(url + "?tools=vector_search,vector_backend_operations",
                         json.dumps(_rpc("tools/list", 3)).encode())
    names = {t["name"] for t in json.loads(body)["result"]["tools"]}
    assert names == {"vector_search"}

    # ?tags= narrows by toolset
    _, body = _http_post(url + "?tags=search",
                         json.dumps(_rpc("tools/list", 4)).encode())
    names = {t["name"] for t in json.loads(body)["result"]["tools"]}
    assert names == {"vector_search"}

    # the narrowing did NOT stick: the next plain request sees the static view
    _, body = _http_post(url, json.dumps(_rpc("tools/list", 5)).encode())
    names = {t["name"] for t in json.loads(body)["result"]["tools"]}
    assert names == ALL_TOOLS - {"vector_backend_operations"}

    # calling a request-hidden tool is a tool_invalid tool result
    _, body = _http_post(url + "?tools=vector_search", json.dumps(_rpc(
        "tools/call", 6, name="vector_collection_management",
        arguments={"action": "list_collections"})).encode())
    resp = json.loads(body)
    assert resp["result"]["isError"] is True
    assert json.loads(resp["result"]["content"][0]["text"])["error"] == "tool_invalid"


# -- SSE transport: session-scoped filters, no cross-session leak -------------


def _sse_read_event(fp):
    event, data = None, []
    while True:
        line = fp.readline()
        if not line:
            return event, "\n".join(data)
        line = line.decode().rstrip("\n").rstrip("\r")
        if not line:
            if event or data:
                return event, "\n".join(data)
            continue
        if line.startswith(":"):
            continue
        if line.startswith("event:"):
            event = line.split(":", 1)[1].strip()
        elif line.startswith("data:"):
            data.append(line.split(":", 1)[1].strip())


@pytest.fixture()
def gated_sse_server(gate_agent):
    import threading

    from vector_mcp_spark.mcp_sse import start_sse

    server = start_sse(gate_agent, port=0, keepalive_s=0.2)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_sse_session_filters_do_not_leak(gated_sse_server):
    """Two concurrent SSE sessions: one opened with ?tools=vector_search is
    search-only for its whole lifetime; the other (no filter) keeps the full
    surface — the restriction is session state, never shared."""
    import http.client
    from urllib.parse import urlparse

    base = urlparse(gated_sse_server)

    def open_stream(path):
        conn = http.client.HTTPConnection(base.hostname, base.port, timeout=10)
        conn.request("GET", path)
        resp = conn.getresponse()
        assert resp.status == 200
        event, endpoint = _sse_read_event(resp.fp)
        assert event == "endpoint"
        return conn, resp, gated_sse_server + endpoint

    restricted_conn, restricted_stream, restricted_url = open_stream("/sse?tools=vector_search")
    open_conn, open_stream_resp, open_url = open_stream("/sse")

    # restricted session: management tool hidden and uncallable
    status, _ = _http_post(restricted_url, json.dumps(_rpc("tools/list", 1)).encode())
    assert status == 202
    _, data = _sse_read_event(restricted_stream.fp)
    assert {t["name"] for t in json.loads(data)["result"]["tools"]} == {"vector_search"}

    status, _ = _http_post(restricted_url, json.dumps(_rpc(
        "tools/call", 2, name="vector_collection_management",
        arguments={"action": "list_collections"})).encode())
    assert status == 202
    _, data = _sse_read_event(restricted_stream.fp)
    msg = json.loads(data)
    assert msg["result"]["isError"] is True
    assert json.loads(msg["result"]["content"][0]["text"])["error"] == "tool_invalid"

    # the OTHER concurrent session still sees and calls the full surface
    status, _ = _http_post(open_url, json.dumps(_rpc("tools/list", 3)).encode())
    assert status == 202
    _, data = _sse_read_event(open_stream_resp.fp)
    assert {t["name"] for t in json.loads(data)["result"]["tools"]} == ALL_TOOLS

    status, _ = _http_post(open_url, json.dumps(_rpc(
        "tools/call", 4, name="vector_collection_management",
        arguments={"action": "list_collections"})).encode())
    assert status == 202
    _, data = _sse_read_event(open_stream_resp.fp)
    msg = json.loads(data)
    assert msg["result"]["isError"] is False

    # a per-POST header narrows the open session for one message only
    status, _ = _http_post(open_url, json.dumps(_rpc("tools/list", 5)).encode(),
                           headers={"x-mcp-enabled-tags": "backend"})
    assert status == 202
    _, data = _sse_read_event(open_stream_resp.fp)
    assert {t["name"] for t in json.loads(data)["result"]["tools"]} == {
        "vector_backend_operations"}
    status, _ = _http_post(open_url, json.dumps(_rpc("tools/list", 6)).encode())
    assert status == 202
    _, data = _sse_read_event(open_stream_resp.fp)
    assert {t["name"] for t in json.loads(data)["result"]["tools"]} == ALL_TOOLS

    restricted_conn.close()
    open_conn.close()


def test_cli_flags_parse_into_static_filter():
    """main()'s --tools/--toolsets/--disabled-* flags land in the same
    static filter the env channel feeds (parsing only — no server spun)."""
    f = ToolFilter.static_filter(
        env={},
        tools="vector_search",
        toolsets="backend",
        disabled_tools="vector_collection_management",
        disabled_toolsets="write",
    )
    assert f.allows("vector_search", ("search", "read"))
    assert f.allows("vector_backend_operations", ("backend", "read"))
    assert not f.allows("vector_collection_management", ("collections", "write"))


def test_unknown_name_under_deny_filter_does_not_leak_hidden_tools(gate_agent):
    """Review r9: an UNKNOWN tool name trivially passes a deny-only filter;
    it must still take the visible-surface error path — falling through to
    dispatch would list every tool (and suggest the hidden one)."""
    from vector_mcp_spark import mcp_stdio as t

    f = ToolFilter(disabled_tools=frozenset({"vector_search"}))
    resp = t.handle_message(gate_agent, _rpc(
        "tools/call", 1, name="vector_searc",  # typo of the HIDDEN tool
        arguments={"action": "semantic_search"}), f)
    out = json.loads(resp["result"]["content"][0]["text"])
    assert out["error"] == "tool_invalid"
    assert "vector_search" not in out["allowed"]
    assert "vector_search" not in out["did_you_mean"]


def test_repeated_deny_headers_all_apply(gated_http_server):
    """Review r9: HTTP permits repeated headers (≡ comma-joined list);
    dropping all but one would silently WIDEN a deny-list."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(gated_http_server)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=10)
    body = json.dumps(_rpc("tools/list", 1)).encode()
    conn.putrequest("POST", u.path)
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length", str(len(body)))
    conn.putheader("x-mcp-disabled-tools", "vector_search")
    conn.putheader("x-mcp-disabled-tools", "vector_collection_management")
    conn.endheaders()
    conn.send(body)
    resp = json.loads(conn.getresponse().read())
    conn.close()
    # static filter already hides backend ops; BOTH repeated denies apply
    assert [t["name"] for t in resp["result"]["tools"]] == []


def test_joined_headers_unit():
    from email.message import Message

    from vector_mcp_spark.toolgate import joined_headers

    m = Message()
    m.add_header("X-MCP-Disabled-Tools", "a")
    m.add_header("X-MCP-Disabled-Tools", "b")
    m.add_header("Other", "z")
    j = joined_headers(m)
    assert sorted(j) == ["Other", "X-MCP-Disabled-Tools"]
    assert set(x.strip() for x in j["X-MCP-Disabled-Tools"].split(",")) == {"a", "b"}
