"""MCP tool-surface selection — condensed action-routed vs verbose 1:1 tools.

The reference serves two tool surfaces selected by ``MCP_TOOL_MODE``
(``README.md:63-89`` and the env table at ``README.md:315-328``):

* ``condensed`` (default) — the action-routed tools, one per domain
  (``vector_collection_management``, ``vector_search``, ...), each taking an
  ``action`` argument.
* ``verbose`` — seven 1:1 API-mapped tools, one per public API method
  (``vector_add_documents``, ``vector_create_collection``,
  ``vector_delete_collection``, ``vector_lexical_search``,
  ``vector_list_collections``, ``vector_search``, ``vector_semantic_search``),
  with no ``action`` argument — the action is implied by the tool name.
* ``both`` — the union. ``vector_search`` exists on both surfaces; the union
  keeps the condensed (action-routed) variant, whose dispatch is a strict
  superset (a call without ``action`` defaults to the hybrid ``search``).

Every tool additionally honors its per-domain toggle env var
(``<DOMAIN>TOOL`` — ``COLLECTION_MANAGEMENTTOOL``, ``SEARCHTOOL``,
``APITOOL``, ...; ``README.md:320-328``): set to false/0/no/off the domain's
tools vanish from ``tools/list`` and calling one is ``tool_invalid``.

The surface composes with (never bypasses) ``toolgate.ToolFilter``: the
surface decides which tools EXIST for this deployment; the filter then
narrows which of those are VISIBLE (statically via CLI/env, per-request via
headers/query). Verbose tools route through the exact same validated veneer
layer as the condensed ones, so stable error codes are identical either way.
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field
from typing import Any

ENV_TOOL_MODE = "MCP_TOOL_MODE"
TOOL_MODES = ("condensed", "verbose", "both")

_FALSEY = {"false", "0", "no", "off"}

# condensed tool name → toggle domain (env var is f"{domain}TOOL")
CONDENSED_DOMAINS = {
    "vector_collection_management": "COLLECTION_MANAGEMENT",
    "vector_search": "SEARCH",
    "vector_backend_operations": "BACKEND_OPERATIONS",
}

_STR = {"type": "string"}
_INT = {"type": "integer"}
_NUM = {"type": "number"}
_BOOL = {"type": "boolean"}
_STR_LIST = {"type": "array", "items": {"type": "string"}}

# The verbose 1:1 surface (reference README.md:72-86): tool name →
# (domain, routed condensed tool, implied action, description, schema).
# Parameter names/bounds match the condensed veneer exactly — both surfaces
# land on the same validated methods.
VERBOSE_TOOLS: tuple[dict[str, Any], ...] = (
    {
        "name": "vector_add_documents",
        "domain": "API",
        "route_tool": "vector_collection_management",
        "route_action": "add_documents",
        "description": "Add documents.",
        "properties": {
            "collection_name": _STR,
            "document_contents": _STR_LIST,
            "document_paths": _STR_LIST,
            "include_configured_directory": _BOOL,
            "db_type": _STR,
        },
        "required": ["collection_name"],
    },
    {
        "name": "vector_create_collection",
        "domain": "API",
        "route_tool": "vector_collection_management",
        "route_action": "create_collection",
        "description": "Create a collection.",
        "properties": {
            "collection_name": _STR,
            "dimension": _INT,
            "overwrite": _BOOL,
            "document_contents": _STR_LIST,
            "db_type": _STR,
        },
        "required": ["collection_name"],
    },
    {
        "name": "vector_delete_collection",
        "domain": "API",
        "route_tool": "vector_collection_management",
        "route_action": "delete_collection",
        "description": "Delete a collection.",
        "properties": {"collection_name": _STR, "confirm": _BOOL, "db_type": _STR},
        "required": ["collection_name", "confirm"],
    },
    {
        "name": "vector_lexical_search",
        "domain": "API",
        "route_tool": "vector_search",
        "route_action": "lexical_search",
        "description": "Perform lexical search.",
        "properties": {
            "collection_name": _STR,
            "question": _STR,
            "number_results": _INT,
            "db_type": _STR,
        },
        "required": ["collection_name", "question"],
    },
    {
        "name": "vector_list_collections",
        "domain": "API",
        "route_tool": "vector_collection_management",
        "route_action": "list_collections",
        "description": "List collections.",
        "properties": {"db_type": _STR},
        "required": [],
    },
    {
        "name": "vector_search",
        "domain": "SEARCH",
        "route_tool": "vector_search",
        "route_action": "search",
        "description": "Perform hybrid search.",
        "properties": {
            "collection_name": _STR,
            "question": _STR,
            "number_results": _INT,
            "semantic_weight": _NUM,
            "lexical_weight": _NUM,
            "rrf_k": _INT,
            "db_type": _STR,
        },
        "required": ["collection_name", "question"],
    },
    {
        "name": "vector_semantic_search",
        "domain": "API",
        "route_tool": "vector_search",
        "route_action": "semantic_search",
        "description": "Perform semantic search.",
        "properties": {
            "collection_name": _STR,
            "question": _STR,
            "number_results": _INT,
            "db_type": _STR,
            # distance convention: cosine (default) | dot | l2 — the
            # pgvector <=>/<#>/<-> selection, validated downstream
            "metric": _STR,
        },
        "required": ["collection_name", "question"],
    },
)


def tool_mode(env: Mapping[str, str] | None = None) -> str:
    """The deployment's tool surface mode. An unknown value fails LOUDLY at
    startup — a typo'd ``MCP_TOOL_MODE=verbos`` silently serving the default
    surface would hide exactly the tools the operator meant to expose."""
    import os

    env = os.environ if env is None else env
    raw = (env.get(ENV_TOOL_MODE) or "condensed").strip().lower()
    if raw not in TOOL_MODES:
        raise ValueError(f"invalid {ENV_TOOL_MODE}: {raw!r} (expected one of {TOOL_MODES})")
    return raw


def domain_enabled(domain: str, env: Mapping[str, str] | None = None) -> bool:
    """``<DOMAIN>TOOL`` toggle: enabled unless explicitly false/0/no/off."""
    import os

    env = os.environ if env is None else env
    raw = env.get(f"{domain}TOOL")
    if raw is None:
        return True
    return raw.strip().lower() not in _FALSEY


def _condensed_specs() -> list[dict[str, Any]]:
    from vector_mcp_spark.agent_card import SKILL_CATALOG

    specs = []
    for skill in SKILL_CATALOG:
        name = skill["tool"]
        specs.append(
            {
                "name": name,
                "domain": CONDENSED_DOMAINS.get(name, name.upper()),
                "route_tool": name,
                "route_action": None,  # action comes from the arguments
                "description": skill["description"],
                "tags": tuple(skill.get("tags", ())),
                "schema": {
                    "type": "object",
                    "properties": {
                        "action": {"type": "string", "enum": list(skill["actions"])},
                    },
                    "required": ["action"],
                    "additionalProperties": True,
                },
            }
        )
    return specs


def _verbose_specs() -> list[dict[str, Any]]:
    from vector_mcp_spark.agent_card import SKILL_CATALOG

    catalog_tags = {s["tool"]: tuple(s.get("tags", ())) for s in SKILL_CATALOG}
    specs = []
    for t in VERBOSE_TOOLS:
        specs.append(
            {
                "name": t["name"],
                "domain": t["domain"],
                "route_tool": t["route_tool"],
                "route_action": t["route_action"],
                "description": t["description"],
                # toolset tags: the routed tool's tags + the domain + the
                # surface marker, so tag-based filters hit both surfaces
                "tags": catalog_tags.get(t["route_tool"], ())
                + (t["domain"].lower(), "verbose"),
                "schema": {
                    "type": "object",
                    "properties": dict(t["properties"]),
                    "required": list(t["required"]),
                    "additionalProperties": False,
                },
            }
        )
    return specs


@dataclass(frozen=True)
class ToolSurface:
    """The deployment's active tool set (mode + domain toggles applied).

    Built ONCE at server startup — per-request channels may only narrow it
    through a ``ToolFilter``, never change the mode."""

    mode: str = "condensed"
    _by_name: dict[str, dict[str, Any]] = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "ToolSurface":
        mode = tool_mode(env)
        specs: list[dict[str, Any]] = []
        if mode in ("condensed", "both"):
            specs.extend(_condensed_specs())
        if mode in ("verbose", "both"):
            seen = {s["name"] for s in specs}
            verbose = _verbose_specs()
            if mode == "both":
                # name collision (vector_search): the condensed action-routed
                # variant wins — and it absorbs the verbose twin's callers by
                # defaulting a missing ``action`` to the twin's routed action
                # (and dropping ``action`` from required), so a verbose-style
                # call keeps working when a deployment flips verbose -> both
                twins = {v["name"]: v for v in verbose if v["name"] in seen}
                for spec in specs:
                    twin = twins.get(spec["name"])
                    if twin is not None:
                        spec["default_action"] = twin["route_action"]
                        spec["schema"] = {**spec["schema"], "required": []}
            specs.extend(v for v in verbose if v["name"] not in seen)
        specs = [s for s in specs if domain_enabled(s["domain"], env)]
        return cls(mode=mode, _by_name={s["name"]: s for s in specs})

    def get(self, name: str) -> dict[str, Any] | None:
        return self._by_name.get(name)

    def names(self) -> list[str]:
        return list(self._by_name)

    def visible(self, tool_filter=None) -> list[str]:
        """Tool names that exist on this surface AND pass the filter."""
        if tool_filter is None:
            return self.names()
        return [
            n
            for n, s in self._by_name.items()
            if tool_filter.allows(n, s.get("tags", ()))
        ]

    def listing(self, tool_filter=None) -> list[dict[str, Any]]:
        """The MCP ``tools/list`` payload for the visible tools."""
        vis = set(self.visible(tool_filter))
        return [
            {
                "name": s["name"],
                "description": s["description"],
                "inputSchema": s["schema"],
            }
            for n, s in self._by_name.items()
            if n in vis
        ]
