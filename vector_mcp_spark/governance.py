"""Agent-governance artifacts: the prompt catalog served over MCP.

The reference ships agent-config sidecars — prompt descriptors
(``vector_mcp/prompts/retrieval_specialist.json``, ``main_agent.json``)
and per-tool skill cards (``vector_mcp/skills/*/SKILL.md``) — that tell a
connecting agent HOW to drive the tools. The Spark port carries the same
governance surface protocol-natively:

* skills → :data:`vector_mcp_spark.agent_card.SKILL_CATALOG` (the agent
  card's entitlement-filtered skill listing IS the SKILL.md mirror);
* prompts → this catalog, served through the standard MCP ``prompts/list``
  / ``prompts/get`` methods on both transports, so any MCP client gets
  them without reading repo files.

(The reference's ``ontology/vector.ttl`` RDF ontology has no Spark-side
behavior to mirror — it is knowledge-graph metadata for an external agent
framework, not query capability; documented non-goal.)

Prompt contents are original to this repo (the reference's texts describe
ITS deployment: llama-index backends, knowledge-graph tools); only the
catalog SHAPE (task/description/arguments + instruction text) follows the
reference's descriptor schema so a reference user's tooling maps over.
"""

from __future__ import annotations

from typing import Any

PROMPT_CATALOG: list[dict[str, Any]] = [
    {
        "name": "vector_retrieval_specialist",
        "description": (
            "Retrieval / RAG specialist for this server: choose between "
            "semantic, lexical BM25, and hybrid RRF search over a named "
            "collection and tune k / thresholds / weights."
        ),
        "arguments": [
            {"name": "collection_name", "description": "collection to search",
             "required": True},
            {"name": "question", "description": "the user's information need",
             "required": True},
        ],
        "template": (
            "You are a vector-retrieval specialist driving this MCP server.\n"
            "Task: answer from collection '{collection_name}' the question:\n"
            "{question}\n\n"
            "Strategy:\n"
            "- Start with vector_search action=search (hybrid RRF) at the\n"
            "  default weights; it is the robust first call.\n"
            "- Switch to action=lexical_search when the question contains\n"
            "  codes, identifiers, or rare exact terms (BM25 beats\n"
            "  embeddings there); to action=semantic_search for paraphrase\n"
            "  or concept questions.\n"
            "- Raise number_results only when synthesis needs breadth;\n"
            "  results are ranked, the head is the signal.\n"
            "- Error dicts are stable machine codes (collection_not_found,\n"
            "  question_invalid, ...) — branch on them, never on prose."
        ),
    },
    {
        "name": "collection_curator",
        "description": (
            "Collection lifecycle operator: create/populate/inspect/delete "
            "collections with the governance rails (bounds, confirm flags, "
            "dimension locks) this server enforces."
        ),
        "arguments": [
            {"name": "collection_name", "description": "collection to manage",
             "required": True},
        ],
        "template": (
            "You curate vector collections on this MCP server.\n"
            "Working collection: '{collection_name}'.\n\n"
            "Rails to respect:\n"
            "- create_collection is get-or-create by default; embedding\n"
            "  dimension locks on first write and drift is rejected.\n"
            "- add_documents is bounded (doc count and byte caps) and\n"
            "  deduplicates exact content; re-adding is an upsert.\n"
            "- delete_collection requires confirm=true — never pass it\n"
            "  without an explicit user instruction.\n"
            "- File ingestion is root-confined; paths outside the allowed\n"
            "  root fail with a stable error code."
        ),
    },
]


def list_prompts() -> list[dict[str, Any]]:
    """MCP ``prompts/list`` payload: catalog minus the template bodies."""
    return [
        {"name": p["name"], "description": p["description"], "arguments": p["arguments"]}
        for p in PROMPT_CATALOG
    ]


def get_prompt(name: str, arguments: dict[str, Any] | None = None) -> dict[str, Any] | None:
    """MCP ``prompts/get`` payload, or None for an unknown prompt name.

    Unknown placeholder arguments are ignored; missing required arguments
    render as the literal placeholder (the client sees what it owes)."""
    prompt = next((p for p in PROMPT_CATALOG if p["name"] == name), None)
    if prompt is None:
        return None

    class _Partial(dict):
        def __missing__(self, key: str) -> str:
            return "{" + key + "}"

    text = prompt["template"].format_map(_Partial(arguments or {}))
    return {
        "description": prompt["description"],
        "messages": [{"role": "user", "content": {"type": "text", "text": text}}],
    }
