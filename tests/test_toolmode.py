"""MCP tool-surface selection (reference README.md:63-89,315-328):
``MCP_TOOL_MODE`` choosing condensed action-routed vs verbose 1:1 tools,
per-domain ``<DOMAIN>TOOL`` toggle env vars, identical stable error codes on
both surfaces, and composition with (never bypassing) the toolgate filters."""

import json

import pytest

from vector_mcp_spark.api import VectorSearchApi
from vector_mcp_spark.engine import CollectionEngine
from vector_mcp_spark.mcp import McpVeneer
from vector_mcp_spark.toolgate import ToolFilter
from vector_mcp_spark.toolmode import ToolSurface, domain_enabled, tool_mode

CONDENSED = {"vector_collection_management", "vector_search", "vector_backend_operations"}
VERBOSE = {
    "vector_add_documents",
    "vector_create_collection",
    "vector_delete_collection",
    "vector_lexical_search",
    "vector_list_collections",
    "vector_search",
    "vector_semantic_search",
}


def _rpc(method, msg_id=None, **params):
    msg = {"jsonrpc": "2.0", "method": method}
    if msg_id is not None:
        msg["id"] = msg_id
    if params:
        msg["params"] = params
    return msg


def _text(resp):
    return json.loads(resp["result"]["content"][0]["text"])


@pytest.fixture()
def agent(spark, tmp_path_factory):
    from vector_mcp_spark.agent_card import AgentCardVeneer

    eng = CollectionEngine(spark, str(tmp_path_factory.mktemp("toolmode_root")))
    return AgentCardVeneer(McpVeneer(eng, VectorSearchApi(eng)))


# -- mode + toggle parsing -----------------------------------------------------


def test_tool_mode_parsing():
    assert tool_mode({}) == "condensed"
    assert tool_mode({"MCP_TOOL_MODE": "verbose"}) == "verbose"
    assert tool_mode({"MCP_TOOL_MODE": " Both "}) == "both"
    with pytest.raises(ValueError, match="MCP_TOOL_MODE"):
        tool_mode({"MCP_TOOL_MODE": "verbos"})  # typo fails loudly, not silently


def test_domain_toggles_default_enabled():
    assert domain_enabled("API", {})
    assert domain_enabled("SEARCH", {"SEARCHTOOL": "true"})
    for off in ("false", "False", "0", "no", "OFF"):
        assert not domain_enabled("API", {"APITOOL": off})
    # any non-falsey value stays enabled (the reference documents 'set to false')
    assert domain_enabled("API", {"APITOOL": "1"})


# -- surface construction -------------------------------------------------------


def test_condensed_surface_is_the_default():
    s = ToolSurface.from_env({})
    assert set(s.names()) == CONDENSED
    listing = {t["name"]: t for t in s.listing()}
    # condensed tools keep the action-routed schema
    assert "action" in listing["vector_collection_management"]["inputSchema"]["properties"]
    assert listing["vector_search"]["inputSchema"]["required"] == ["action"]


def test_verbose_surface_is_the_reference_seven():
    s = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose"})
    assert set(s.names()) == VERBOSE
    listing = {t["name"]: t for t in s.listing()}
    # 1:1 tools carry NO action argument — the name is the action
    for name in VERBOSE:
        assert "action" not in listing[name]["inputSchema"]["properties"], name
    assert listing["vector_search"]["inputSchema"]["required"] == [
        "collection_name",
        "question",
    ]
    assert "semantic_weight" in listing["vector_search"]["inputSchema"]["properties"]
    assert listing["vector_delete_collection"]["inputSchema"]["required"] == [
        "collection_name",
        "confirm",
    ]


def test_both_mode_unions_and_condensed_wins_collision():
    s = ToolSurface.from_env({"MCP_TOOL_MODE": "both"})
    assert set(s.names()) == CONDENSED | VERBOSE
    # the name collision (vector_search) resolves to the condensed variant,
    # whose dispatch accepts every verbose call plus an explicit action
    assert s.get("vector_search")["route_action"] is None
    # ...which requires the union spec to default the missing action (the
    # verbose twin's routed action) and drop it from required — otherwise
    # a verbose-style call breaks the moment a deployment flips to 'both'
    assert s.get("vector_search")["default_action"] == "search"
    assert s.get("vector_search")["schema"]["required"] == []
    # condensed-only mode keeps the strict schema: action is required
    c = ToolSurface.from_env({"MCP_TOOL_MODE": "condensed"})
    assert "default_action" not in c.get("vector_search")
    assert c.get("vector_search")["schema"]["required"] == ["action"]


def test_both_mode_accepts_verbose_style_search_call(agent):
    """The collision-resolution contract end-to-end: in 'both' mode a
    verbose-style vector_search call (collection_name + question, NO
    action) runs the hybrid search instead of INVALID_PARAMS."""
    from vector_mcp_spark import mcp_stdio as t

    surf = ToolSurface.from_env({"MCP_TOOL_MODE": "both"})
    _text(
        t.handle_message(
            agent,
            _rpc("tools/call", 1, name="vector_collection_management",
                 arguments={"action": "create_collection", "collection_name": "bb",
                            "document_contents": ["gamma doc"]}),
            None, surf,
        )
    )
    out = _text(
        t.handle_message(
            agent,
            _rpc("tools/call", 2, name="vector_search",
                 arguments={"collection_name": "bb", "question": "gamma"}),
            None, surf,
        )
    )
    assert out["action"] == "search" and out["results"]
    # an explicit action still wins over the default
    out = _text(
        t.handle_message(
            agent,
            _rpc("tools/call", 3, name="vector_search",
                 arguments={"collection_name": "bb", "question": "gamma",
                            "action": "semantic_search"}),
            None, surf,
        )
    )
    assert out["action"] == "semantic_search"
    # a condensed-only surface still rejects the action-less call loudly
    strict = ToolSurface.from_env({"MCP_TOOL_MODE": "condensed"})
    resp = t.handle_message(
        agent,
        _rpc("tools/call", 4, name="vector_search",
             arguments={"collection_name": "bb", "question": "gamma"}),
        None, strict,
    )
    assert "error" in resp and resp["error"]["code"] == t.INVALID_PARAMS


def test_domain_toggles_shape_the_surface():
    s = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose", "APITOOL": "false"})
    assert set(s.names()) == {"vector_search"}  # SEARCH domain survives
    s = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose", "SEARCHTOOL": "false"})
    assert set(s.names()) == VERBOSE - {"vector_search"}
    s = ToolSurface.from_env({"COLLECTION_MANAGEMENTTOOL": "false"})
    assert set(s.names()) == CONDENSED - {"vector_collection_management"}
    s = ToolSurface.from_env(
        {"MCP_TOOL_MODE": "both", "APITOOL": "false", "BACKEND_OPERATIONSTOOL": "false"}
    )
    assert set(s.names()) == {"vector_collection_management", "vector_search"}


# -- stdio protocol: mode selection + identical error codes ---------------------


def test_stdio_verbose_mode_lists_and_calls(agent):
    from vector_mcp_spark import mcp_stdio as t

    surf = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose"})

    resp = t.handle_message(agent, _rpc("tools/list", 1), None, surf)
    assert {x["name"] for x in resp["result"]["tools"]} == VERBOSE

    # verbose calls route through the SAME validated veneer layer
    out = _text(
        t.handle_message(
            agent,
            _rpc(
                "tools/call",
                2,
                name="vector_create_collection",
                arguments={"collection_name": "kb"},
            ),
            None,
            surf,
        )
    )
    assert out["collection_name"].endswith("kb")
    out = _text(
        t.handle_message(
            agent,
            _rpc(
                "tools/call",
                3,
                name="vector_add_documents",
                arguments={
                    "collection_name": "kb",
                    "document_contents": ["alpha doc", "beta doc"],
                },
            ),
            None,
            surf,
        )
    )
    assert out["documents_added"] == 2
    out = _text(
        t.handle_message(
            agent,
            _rpc(
                "tools/call",
                4,
                name="vector_semantic_search",
                arguments={"collection_name": "kb", "question": "alpha", "number_results": 1},
            ),
            None,
            surf,
        )
    )
    assert out["action"] == "semantic_search" and len(out["results"]) == 1
    out = _text(
        t.handle_message(
            agent,
            _rpc(
                "tools/call",
                5,
                name="vector_search",
                arguments={"collection_name": "kb", "question": "beta"},
            ),
            None,
            surf,
        )
    )
    assert out["action"] == "search" and out["results"]

    # a condensed name does not exist on the verbose surface — and the
    # suggestions never leak it
    resp = t.handle_message(
        agent,
        _rpc(
            "tools/call",
            6,
            name="vector_collection_management",
            arguments={"action": "list_collections"},
        ),
        None,
        surf,
    )
    assert resp["result"]["isError"] is True
    err = _text_err(resp)
    assert err["error"] == "tool_invalid"
    assert set(err["allowed"]) == VERBOSE


def _text_err(resp):
    return json.loads(resp["result"]["content"][0]["text"])


def test_stdio_verbose_errors_match_condensed(agent):
    """The two surfaces are veneers over one validated layer: the same bad
    input produces the SAME stable snake_case error code on both."""
    from vector_mcp_spark import mcp_stdio as t

    verbose = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose"})
    condensed = ToolSurface.from_env({})

    def call(surf, name, arguments, msg_id):
        return _text_err(
            t.handle_message(
                agent, _rpc("tools/call", msg_id, name=name, arguments=arguments), None, surf
            )
        )

    # invalid collection name
    v = call(verbose, "vector_create_collection", {"collection_name": "9bad name"}, 1)
    c = call(
        condensed,
        "vector_collection_management",
        {"action": "create_collection", "collection_name": "9bad name"},
        2,
    )
    assert v["error"] == c["error"] and "error" in v

    # delete without confirm
    call(verbose, "vector_create_collection", {"collection_name": "keep"}, 3)
    v = call(verbose, "vector_delete_collection", {"collection_name": "keep"}, 4)
    c = call(
        condensed,
        "vector_collection_management",
        {"action": "delete_collection", "collection_name": "keep"},
        5,
    )
    assert v["error"] == c["error"] and "error" in v

    # unknown backend db_type fails closed identically
    v = call(
        verbose,
        "vector_semantic_search",
        {"collection_name": "keep", "question": "q", "db_type": "oracle23ai"},
        6,
    )
    c = call(
        condensed,
        "vector_search",
        {"action": "semantic_search", "collection_name": "keep", "question": "q",
         "db_type": "oracle23ai"},
        7,
    )
    assert v["error"] == c["error"] and "error" in v

    # a verbose 1:1 tool ignores a stray explicit action: the name IS the
    # action (lexical via vector_lexical_search even if action says search)
    out = _text(
        t.handle_message(
            agent,
            _rpc(
                "tools/call",
                8,
                name="vector_lexical_search",
                arguments={"collection_name": "keep", "question": "q", "action": "search"},
            ),
            None,
            verbose,
        )
    )
    assert out["action"] == "lexical_search"


def test_stdio_filter_composes_with_verbose_surface(agent):
    """toolgate narrows the verbose surface exactly like the condensed one:
    deny-lists hide tools, tag filters hit the routed tool's tags, and a
    hidden tool is tool_invalid with suggestions drawn from the visible set."""
    from vector_mcp_spark import mcp_stdio as t

    surf = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose"})

    f = ToolFilter(disabled_tools=frozenset({"vector_semantic_search"}))
    resp = t.handle_message(agent, _rpc("tools/list", 1), f, surf)
    assert {x["name"] for x in resp["result"]["tools"]} == VERBOSE - {"vector_semantic_search"}
    resp = t.handle_message(
        agent,
        _rpc("tools/call", 2, name="vector_semantic_search",
             arguments={"collection_name": "kb", "question": "q"}),
        f,
        surf,
    )
    err = _text_err(resp)
    assert err["error"] == "tool_invalid"
    assert "vector_semantic_search" not in err["allowed"]

    # toolset tags: verbose search tools inherit the routed tool's tags
    f = ToolFilter(enabled_tags=frozenset({"search"}))
    resp = t.handle_message(agent, _rpc("tools/list", 3), f, surf)
    names = {x["name"] for x in resp["result"]["tools"]}
    assert names == {"vector_search", "vector_semantic_search", "vector_lexical_search"}


# -- HTTP transport: mode + per-request narrowing --------------------------------


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
def verbose_http_server(agent):
    import threading

    from vector_mcp_spark.mcp_http import start_http

    surface = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose"})
    server = start_http(agent, port=0, surface=surface)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}/mcp"
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_http_verbose_mode_and_per_request_narrowing(verbose_http_server):
    url = verbose_http_server
    _, body = _http_post(url, json.dumps(_rpc("tools/list", 1)).encode())
    assert {t["name"] for t in json.loads(body)["result"]["tools"]} == VERBOSE

    # per-request narrowing works on the verbose surface
    _, body = _http_post(url + "?tools=vector_search,vector_list_collections",
                         json.dumps(_rpc("tools/list", 2)).encode())
    names = {t["name"] for t in json.loads(body)["result"]["tools"]}
    assert names == {"vector_search", "vector_list_collections"}

    _, body = _http_post(url, json.dumps(_rpc("tools/list", 3)).encode(),
                         headers={"x-mcp-disabled-tools": "vector_delete_collection"})
    names = {t["name"] for t in json.loads(body)["result"]["tools"]}
    assert names == VERBOSE - {"vector_delete_collection"}

    # narrowing is per-request only
    _, body = _http_post(url, json.dumps(_rpc("tools/list", 4)).encode())
    assert {t["name"] for t in json.loads(body)["result"]["tools"]} == VERBOSE

    # calling a request-hidden verbose tool is tool_invalid
    _, body = _http_post(url + "?tools=vector_search", json.dumps(_rpc(
        "tools/call", 5, name="vector_list_collections", arguments={})).encode())
    resp = json.loads(body)
    assert resp["result"]["isError"] is True
    assert json.loads(resp["result"]["content"][0]["text"])["error"] == "tool_invalid"

    # and a verbose call that IS visible routes end-to-end over HTTP
    _, body = _http_post(url, json.dumps(_rpc(
        "tools/call", 6, name="vector_create_collection",
        arguments={"collection_name": "http_kb"})).encode())
    out = json.loads(json.loads(body)["result"]["content"][0]["text"])
    assert out["collection_name"].endswith("http_kb")


# -- SSE transport: mode selection ----------------------------------------------


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


def test_sse_verbose_mode(agent):
    import http.client
    import threading

    from vector_mcp_spark.mcp_sse import start_sse

    surface = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose"})
    server = start_sse(agent, port=0, keepalive_s=0.2, surface=surface)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[0], server.server_address[1]
    try:
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.request("GET", "/sse")
        stream = conn.getresponse()
        event, endpoint = _sse_read_event(stream)
        assert event == "endpoint"
        post = http.client.HTTPConnection(host, port, timeout=10)
        body = json.dumps(_rpc("tools/list", 1))
        post.request("POST", endpoint, body=body,
                     headers={"Content-Type": "application/json",
                              "Content-Length": str(len(body))})
        assert post.getresponse().status == 202
        event, data = _sse_read_event(stream)
        assert event == "message"
        names = {t["name"] for t in json.loads(data)["result"]["tools"]}
        assert names == VERBOSE
        conn.close()
        post.close()
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_stdio_verbose_semantic_search_metric(agent):
    """The verbose 1:1 semantic tool declares and threads the metric
    selection (pgvector <=>/<#>/<-> over the wire)."""
    from vector_mcp_spark import mcp_stdio as t

    surf = ToolSurface.from_env({"MCP_TOOL_MODE": "verbose"})
    spec = surf.get("vector_semantic_search")
    assert "metric" in spec["schema"]["properties"]

    _text(
        t.handle_message(
            agent,
            _rpc("tools/call", 1, name="vector_create_collection",
                 arguments={"collection_name": "mq"}),
            None, surf,
        )
    )
    _text(
        t.handle_message(
            agent,
            _rpc("tools/call", 2, name="vector_add_documents",
                 arguments={"collection_name": "mq",
                            "document_contents": ["alpha beta", "gamma delta"]}),
            None, surf,
        )
    )
    out = _text(
        t.handle_message(
            agent,
            _rpc("tools/call", 3, name="vector_semantic_search",
                 arguments={"collection_name": "mq", "question": "alpha beta",
                            "number_results": 2, "metric": "l2"}),
            None, surf,
        )
    )
    assert "error" not in out and len(out["results"]) == 2
    # l2 scores ascend (lower distance = better)
    scores = [r["score"] for r in out["results"]]
    assert scores == sorted(scores)
    out = _text(
        t.handle_message(
            agent,
            _rpc("tools/call", 4, name="vector_semantic_search",
                 arguments={"collection_name": "mq", "question": "x",
                            "metric": "manhattan"}),
            None, surf,
        )
    )
    assert out["error"] == "metric_invalid"
