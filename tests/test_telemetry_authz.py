"""Telemetry + Eunomia-shaped authorization seams (reference
README.md:329-339): env contract, span lifecycle, policy evaluation, and
the dispatch wiring (denied calls return the stable error and the span
records the outcome). No network, no SDK — the export/remote sides are
injectable, everything else is real."""

from __future__ import annotations

import json

import pytest

from vector_mcp_spark.authz import AuthorizationPolicy
from vector_mcp_spark.telemetry import Telemetry, TelemetryConfig


def test_telemetry_config_env_contract():
    assert TelemetryConfig.from_env({}).enabled is True  # reference default
    assert TelemetryConfig.from_env({"ENABLE_OTEL": "false"}).enabled is False
    c = TelemetryConfig.from_env(
        {
            "ENABLE_OTEL": "true",
            "OTEL_EXPORTER_OTLP_ENDPOINT": "http://col:4318",
            "OTEL_EXPORTER_OTLP_PUBLIC_KEY": "pk",
            "OTEL_EXPORTER_OTLP_SECRET_KEY": "sk",
            "OTEL_EXPORTER_OTLP_PROTOCOL": "http/protobuf",
        }
    )
    assert c.endpoint == "http://col:4318" and c.protocol == "http/protobuf"
    assert c.public_key == "pk" and c.secret_key == "sk"


def test_telemetry_spans_record_and_never_break_serving():
    shipped = []
    t = Telemetry(TelemetryConfig(enabled=True), exporter=shipped.append)
    with t.span("tools/call", tool="vector_search", action="search"):
        pass
    with pytest.raises(RuntimeError):
        with t.span("tools/call", tool="x", action="y"):
            raise RuntimeError("boom")
    spans = t.spans()
    assert [s["status"] for s in spans] == ["ok", "error"]
    assert spans[0]["attributes"]["action"] == "search"
    assert "boom" in spans[1]["error"]
    assert all("duration_ms" in s for s in spans)
    assert shipped == spans  # exporter saw the same records

    # a raising exporter is swallowed — telemetry never takes serving down
    t2 = Telemetry(TelemetryConfig(enabled=True), exporter=lambda s: 1 / 0)
    with t2.span("tools/call", tool="a", action="b"):
        pass
    assert t2.spans()[0]["status"] == "ok"

    # disabled -> nothing recorded, body still runs
    t3 = Telemetry(TelemetryConfig(enabled=False))
    ran = []
    with t3.span("tools/call"):
        ran.append(1)
    assert ran == [1] and t3.spans() == []


def test_telemetry_buffer_bounded():
    t = Telemetry(TelemetryConfig(enabled=True), max_buffer=5)
    for i in range(12):
        with t.span("s", i=i):
            pass
    spans = t.spans()
    assert len(spans) == 5 and spans[-1]["attributes"]["i"] == 11


def test_authz_none_allows_everything():
    p = AuthorizationPolicy.from_env({})
    assert p.mode == "none"
    assert p.check("vector_search", "search") is True
    assert p.check("anything", "delete_collection", principal="rogue") is True


def test_authz_embedded_first_match_wins(tmp_path):
    policy = tmp_path / "mcp_policies.json"
    policy.write_text(
        json.dumps(
            {
                "default": "allow",
                "rules": [
                    {"effect": "allow", "actions": ["delete_collection"],
                     "principals": ["admin"]},
                    {"effect": "deny", "actions": ["delete_collection"]},
                    {"effect": "deny", "tools": ["vector_backend_operations"],
                     "principals": ["guest"]},
                ],
            }
        )
    )
    p = AuthorizationPolicy.from_env(
        {"EUNOMIA_TYPE": "embedded", "EUNOMIA_POLICY_FILE": str(policy)}
    )
    assert p.check("vector_collection_management", "delete_collection", "admin")
    assert not p.check("vector_collection_management", "delete_collection", "bob")
    assert not p.check("vector_collection_management", "delete_collection", None)
    assert not p.check("vector_backend_operations", "doctor", "guest")
    assert p.check("vector_backend_operations", "doctor", "admin")
    assert p.check("vector_search", "search", "bob")  # falls to default allow


def test_authz_embedded_default_deny(tmp_path):
    policy = tmp_path / "p.json"
    policy.write_text(
        json.dumps({"default": "deny",
                    "rules": [{"effect": "allow", "tools": ["vector_search"]}]})
    )
    p = AuthorizationPolicy.from_env(
        {"EUNOMIA_TYPE": "embedded", "EUNOMIA_POLICY_FILE": str(policy)}
    )
    assert p.check("vector_search", "search")
    assert not p.check("vector_collection_management", "list_collections")


def test_authz_misconfiguration_fails_loudly(tmp_path):
    with pytest.raises(ValueError, match="unreadable"):
        AuthorizationPolicy.from_env(
            {"EUNOMIA_TYPE": "embedded",
             "EUNOMIA_POLICY_FILE": str(tmp_path / "missing.json")}
        )
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"rules": [{"effect": "maybe"}]}))
    with pytest.raises(ValueError, match="effect"):
        AuthorizationPolicy.from_env(
            {"EUNOMIA_TYPE": "embedded", "EUNOMIA_POLICY_FILE": str(bad)}
        )
    with pytest.raises(ValueError, match="remote decider"):
        AuthorizationPolicy.from_env({"EUNOMIA_TYPE": "remote"})
    with pytest.raises(ValueError, match="invalid EUNOMIA_TYPE"):
        AuthorizationPolicy(mode="sideways")


def test_authz_remote_fails_closed():
    calls = []

    def decider(tool, action, principal):
        calls.append((tool, action, principal))
        return action != "delete_collection"

    p = AuthorizationPolicy.from_env({"EUNOMIA_TYPE": "remote"}, remote=decider)
    assert p.check("vector_search", "search", "a")
    assert not p.check("vector_collection_management", "delete_collection", "a")
    assert calls[0] == ("vector_search", "search", "a")

    def broken(tool, action, principal):
        raise ConnectionError("eunomia down")

    p2 = AuthorizationPolicy.from_env({"EUNOMIA_TYPE": "remote"}, remote=broken)
    assert p2.check("vector_search", "search") is False  # fail closed


def test_dispatch_gates_and_traces(spark, tmp_path_factory, tmp_path):
    """End-to-end through AgentCardVeneer.dispatch: a policy-denied action
    returns the stable authorization_denied error, an allowed one serves,
    and every call lands one span with the right status. A client-supplied
    'principal' argument is stripped at the transport, never trusted."""
    from vector_mcp_spark import mcp_stdio as t
    from vector_mcp_spark.agent_card import AgentCardVeneer
    from vector_mcp_spark.engine import CollectionEngine
    from vector_mcp_spark.mcp import McpVeneer

    policy = tmp_path / "mcp_policies.json"
    policy.write_text(
        json.dumps({"default": "allow",
                    "rules": [{"effect": "deny", "actions": ["delete_collection"]}]})
    )
    eng = CollectionEngine(spark, str(tmp_path_factory.mktemp("authz_root")))
    tele = Telemetry(TelemetryConfig(enabled=True))
    authz = AuthorizationPolicy.from_env(
        {"EUNOMIA_TYPE": "embedded", "EUNOMIA_POLICY_FILE": str(policy)}
    )
    agent = AgentCardVeneer(McpVeneer(eng), telemetry=tele, authz=authz)

    out = agent.dispatch(
        "vector_collection_management", "create_collection", collection_name="kb"
    )
    assert out["collection_name"].endswith("kb")
    denied = agent.dispatch(
        "vector_collection_management", "delete_collection",
        collection_name="kb", confirm=True,
    )
    assert denied == {
        "error": "authorization_denied",
        "tool": "vector_collection_management",
        "action": "delete_collection",
    }
    spans = tele.spans()
    assert [s["status"] for s in spans] == ["ok", "error"]
    assert spans[1]["error"] == "authorization_denied"

    # the wire cannot assert identity: arguments.principal is stripped
    msg = {
        "jsonrpc": "2.0", "id": 9, "method": "tools/call",
        "params": {"name": "vector_collection_management",
                   "arguments": {"action": "delete_collection",
                                 "collection_name": "kb", "confirm": True,
                                 "principal": "admin"}},
    }
    resp = t.handle_message(agent, msg, None, None)
    body = json.loads(resp["result"]["content"][0]["text"])
    assert body["error"] == "authorization_denied"
    # and the collection survived both denials
    assert agent.dispatch("vector_collection_management", "list_collections")[
        "collections"
    ]


def test_kwarg_validation_after_authz(spark, tmp_path_factory, tmp_path):
    """ADVICE r12: the unknown-kwargs check must run AFTER the authz gate so
    an unauthorized caller cannot probe valid parameter names per tool; and
    backend-operation args are validated too, so a client typo reports
    arguments_invalid instead of internal_error."""
    from vector_mcp_spark.agent_card import AgentCardVeneer
    from vector_mcp_spark.engine import CollectionEngine
    from vector_mcp_spark.mcp import McpVeneer

    policy = tmp_path / "probe_policies.json"
    policy.write_text(json.dumps({"default": "deny", "rules": []}))
    eng = CollectionEngine(spark, str(tmp_path_factory.mktemp("probe_root")))
    deny_all = AuthorizationPolicy.from_env(
        {"EUNOMIA_TYPE": "embedded", "EUNOMIA_POLICY_FILE": str(policy)}
    )
    locked = AgentCardVeneer(McpVeneer(eng), authz=deny_all)
    # probe with a bogus kwarg: the denial must win — the response must not
    # reveal whether 'bogus_kwarg' (or any name) is a valid parameter
    probed = locked.dispatch(
        "vector_collection_management", "create_collection",
        collection_name="x", bogus_kwarg=1,
    )
    assert probed["error"] == "authorization_denied"
    assert "unknown_keys" not in probed

    open_agent = AgentCardVeneer(McpVeneer(eng))
    # authorized caller with a typo'd kwarg: arguments_invalid, named keys
    out = open_agent.dispatch(
        "vector_collection_management", "create_collection",
        collection_name="x", bogus_kwarg=1,
    )
    assert out == {"error": "arguments_invalid", "unknown_keys": ["bogus_kwarg"]}
    # backend operations now validate args too (no veneer method to inspect)
    out = open_agent.dispatch("vector_backend_operations", "doctor", wrong_arg=1)
    assert out == {"error": "arguments_invalid", "unknown_keys": ["wrong_arg"]}
    out = open_agent.dispatch("vector_backend_operations", "backend_status", db_type="qdrant")
    assert "error" not in out or out.get("error") != "arguments_invalid"
    # unknown backend action still reports action_invalid with suggestions
    out = open_agent.dispatch("vector_backend_operations", "doctorr")
    assert out["error"] == "action_invalid"
