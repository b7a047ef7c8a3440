"""A2A-style agent card + authenticated action dispatch.

Mirrors the observable surface of the reference's agent server
(``vector_mcp/agent_server.py:1-98`` + ``auth.py:1-15``): an agent announces
an identity card — name, description, version, and the skill/capability
catalog (``vector_mcp/skills/*``) — and dispatches tool actions on behalf of
an authenticated identity. The reference delegates transport, identity
loading, and serving to an external agent framework; here the same contract
is a framework-free veneer over :class:`~vector_mcp_spark.mcp.McpVeneer`:

- ``card()`` — the discovery document. The skill list is filtered through
  the identity's entitlement resolver (namespace ``"skill"``), exactly like
  collection listings (``mcp_server.py:61-80``): no resolver or a broken
  resolver degrades to the full catalog, a working resolver strictly
  narrows it.
- ``dispatch(tool, action, ...)`` — auth'd action routing with the same
  stable snake_case error codes as the MCP veneer (never a traceback):
  ``tool_invalid`` with did-you-mean suggestions for unknown tools,
  ``action_forbidden`` when the identity's entitlements (namespace
  ``"action"``) exclude the action, and the underlying veneer's own codes
  for everything below that.

An A2A/HTTP server would serialize ``card()`` at its well-known endpoint
and call ``dispatch`` per request; both are transport-free and testable
with a fake identity.
"""

from __future__ import annotations

import difflib
from typing import Any

from vector_mcp_spark import __version__
from vector_mcp_spark.mcp import (
    COLLECTION_ACTIONS,
    SEARCH_ACTIONS,
    EntitlementResolver,
    McpVeneer,
)

DEFAULT_AGENT_NAME = "Vector MCP Spark"
DEFAULT_AGENT_DESCRIPTION = (
    "Agent for vector-store operations on a PySpark engine: collection "
    "lifecycle, bounded document ingestion, and semantic / lexical / "
    "hybrid-RRF retrieval."
)

# The reference ships four skills (vector_mcp/skills/*); each card entry is
# (id, description, tool, actions) in this engine's own words.
SKILL_CATALOG: tuple[dict[str, Any], ...] = (
    {
        "id": "vector-collection-management",
        "description": "Create, list, and delete collections; ingest "
        "documents with bounds and dedup on write.",
        "tool": "vector_collection_management",
        "tags": ("collections", "write"),
        "actions": list(COLLECTION_ACTIONS),
    },
    {
        "id": "vector-hybrid-search",
        "description": "Semantic, lexical, and hybrid-RRF retrieval over a "
        "collection with tunable weights and rrf_k.",
        "tool": "vector_search",
        "tags": ("search", "read"),
        "actions": list(SEARCH_ACTIONS),
    },
    {
        "id": "vector-backend-operations",
        "description": "Backend readiness: doctor report and fail-closed "
        "db_type policy checks.",
        "tool": "vector_backend_operations",
        "tags": ("backend", "read"),
        "actions": ["doctor", "backend_status"],
    },
)

TOOLS: tuple[str, ...] = tuple(s["tool"] for s in SKILL_CATALOG)


class AgentCardVeneer:
    """Identity-scoped agent card + dispatch over the MCP veneer."""

    def __init__(
        self,
        veneer: McpVeneer,
        name: str = DEFAULT_AGENT_NAME,
        description: str = DEFAULT_AGENT_DESCRIPTION,
        entitlements: EntitlementResolver | None = None,
        telemetry=None,
        authz=None,
    ):
        from vector_mcp_spark.authz import AuthorizationPolicy
        from vector_mcp_spark.telemetry import Telemetry

        self.veneer = veneer
        self.name = name
        self.description = description
        # default to the veneer's resolver so one identity scopes both
        # listings and the card
        self.entitlements = entitlements if entitlements is not None else veneer.entitlements
        # the deployment layers (reference README.md:329-339): OTel-shaped
        # span recording and the Eunomia-shaped policy gate, both built from
        # the reference's env contract when not injected. from_env fails
        # LOUDLY on a broken embedded policy — serving allow-all because the
        # policy file was unreadable is the failure mode this exists to stop
        self.telemetry = telemetry if telemetry is not None else Telemetry()
        self.authz = authz if authz is not None else AuthorizationPolicy.from_env()

    def _entitled(self, namespace: str, names: list[str]) -> list[str]:
        if self.entitlements is None:
            return list(names)
        try:
            allowed = set(self.entitlements(namespace, list(names)))
        except Exception:  # resolver outage must never break discovery
            return list(names)
        return [n for n in names if n in allowed]

    def card(self) -> dict[str, Any]:
        """The discovery document: identity + entitlement-filtered skills."""
        skill_ids = self._entitled("skill", [s["id"] for s in SKILL_CATALOG])
        skills = []
        for s in SKILL_CATALOG:
            if s["id"] not in skill_ids:
                continue
            actions = self._entitled("action", list(s["actions"]))
            if not actions:
                continue
            skills.append({**s, "actions": actions})
        return {
            "name": self.name,
            "description": self.description,
            "version": __version__,
            "skills": skills,
            "tools": [s["tool"] for s in skills],
        }

    def dispatch(
        self, tool: str, action: str, principal: str | None = None, **kwargs: Any
    ) -> dict[str, Any]:
        """Route one authenticated action; stable error dicts throughout.
        ``principal`` is the optional calling identity the Eunomia-shaped
        policy can scope rules to (a transport can thread it from auth)."""
        with self.telemetry.span("tools/call", tool=tool, action=action) as span:
            out = self._dispatch(tool, action, principal, kwargs)
            if span is not None and isinstance(out, dict) and "error" in out:
                span["status"] = "error"
                span["error"] = str(out["error"])[:200]
            return out

    def _dispatch(
        self, tool: str, action: str, principal: str | None, kwargs: dict[str, Any]
    ) -> dict[str, Any]:
        if tool not in TOOLS:
            return {
                "error": "tool_invalid",
                "allowed": list(TOOLS),
                "did_you_mean": difflib.get_close_matches(tool or "", TOOLS, n=3, cutoff=0.4),
            }
        # the Eunomia-shaped policy gate (fails closed in remote mode)
        if not self.authz.check(tool, action, principal):
            return {"error": "authorization_denied", "tool": tool, "action": action}
        # Authorization fails CLOSED: a resolver outage must deny actions
        # (including delete_collection), unlike discovery where _entitled
        # fail-opens so an outage never blanks the card.
        if self.entitlements is not None:
            try:
                allowed = set(self.entitlements("action", [action]))
            except Exception:
                return {"error": "entitlements_unavailable", "action": action}
            if action not in allowed:
                return {"error": "action_forbidden", "action": action}
        # Client-argument validation AFTER the authz/entitlement gates — an
        # unauthenticated caller must not be able to probe valid parameter
        # names per tool (ADVICE r12). Unknown kwargs are a caller mistake
        # reported as arguments_invalid; a TypeError DURING execution stays
        # an internal_error (server fault), never blamed on the client.
        bad = self._unknown_kwargs(tool, action, kwargs)
        if bad:
            return {"error": "arguments_invalid", "unknown_keys": bad}
        if tool == "vector_collection_management":
            return self.veneer.vector_collection_management(action, **kwargs)
        if tool == "vector_search":
            return self.veneer.vector_search(action, **kwargs)
        return self._backend_operations(action, **kwargs)

    # accepted kwargs per backend operation (no veneer method to inspect)
    _BACKEND_OP_KEYS = {
        "doctor": frozenset({"warehouse_root"}),
        "backend_status": frozenset({"db_type"}),
    }

    def _unknown_kwargs(
        self, tool: str, action: str, kwargs: dict[str, Any]
    ) -> list[str]:
        """Sorted client kwargs the routed handler does not accept
        (empty = fine). Backend operations validate against the accepted-key
        table; veneer tools against the method signature."""
        if tool == "vector_backend_operations":
            accepted = self._BACKEND_OP_KEYS.get(action)
            # unknown action: let _backend_operations report action_invalid
            return sorted(set(kwargs) - accepted) if accepted is not None else []
        import inspect

        method = getattr(self.veneer, tool, None)
        if not callable(method):
            return []
        params = inspect.signature(method).parameters
        if any(p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()):
            return []
        return sorted(set(kwargs) - set(params))

    def _backend_operations(self, action: str, **kwargs: Any) -> dict[str, Any]:
        from vector_mcp_spark.backend_policy import backend_status
        from vector_mcp_spark.doctor import doctor

        if action == "doctor":
            return doctor(kwargs.get("warehouse_root"))
        if action == "backend_status":
            return dict(backend_status(kwargs.get("db_type")))
        return {
            "error": "action_invalid",
            "allowed": ["doctor", "backend_status"],
            "did_you_mean": difflib.get_close_matches(
                action or "", ["doctor", "backend_status"], n=3, cutoff=0.4
            ),
        }
