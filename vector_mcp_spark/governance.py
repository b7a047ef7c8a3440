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

* ontology → :data:`ONTOLOGY_TTL`, an ORIGINAL Turtle description of this
  engine's concepts (same artifact role as the reference's
  ``ontology/vector.ttl``), served with the machine-readable skill catalog
  and tool-schema fingerprints through MCP ``resources/list`` /
  ``resources/read``.

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


# -- MCP resources: the ontology + machine-readable governance sidecars ------
#
# The reference ships an RDF ontology (``vector_mcp/ontology/vector.ttl``)
# describing its collection/chunk/backend/search concepts for
# knowledge-graph-aware agents. The Turtle below is ORIGINAL to this repo —
# same artifact role, this engine's own concepts and words — and is served
# through the standard MCP ``resources/list`` / ``resources/read`` methods
# rather than as a loose repo file.

ONTOLOGY_TTL = """\
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix : <urn:vector-mcp-spark:kg#> .

# Retrieval ontology for the PySpark collection engine: what a connecting
# agent can create, mutate, and search through vector_collection_management
# and vector_search.

:Collection a owl:Class ;
    rdfs:label "Collection" ;
    rdfs:comment "A named, tenant-scoped parquet table of documents with a locked embedding dimension; the unit of create/list/delete, indexing, counting, and time-travel reads." .

:Document a owl:Class ;
    rdfs:label "Document" ;
    rdfs:comment "One stored record: content-hash id, sanitized text content, string-map metadata (payload), optional float-array embedding." .

:SearchIndex a owl:Class ;
    rdfs:label "Search Index" ;
    rdfs:comment "A derived structure built from a collection snapshot (inverted postings for lexical, bucketed ANN tables for semantic) whose staleness is tracked against the table fingerprint." .

:Query a owl:Class ;
    rdfs:label "Query" ;
    rdfs:comment "A bounded retrieval request: semantic (cosine over embeddings), lexical (BM25 / term), hybrid (weighted RRF fusion), rerank, or federated across collections." .

:Changelog a owl:Class ;
    rdfs:label "Changelog" ;
    rdfs:comment "The append-only mutation sidecar per collection enabling as-of reads and history audits." .

:hasDocument a owl:ObjectProperty ;
    rdfs:domain :Collection ; rdfs:range :Document ;
    rdfs:comment "Membership of a document in a collection." .

:indexedBy a owl:ObjectProperty ;
    rdfs:domain :Collection ; rdfs:range :SearchIndex ;
    rdfs:comment "The indexes built over a collection snapshot." .

:answeredFrom a owl:ObjectProperty ;
    rdfs:domain :Query ; rdfs:range :Collection ;
    rdfs:comment "The collection(s) a query was served from." .

:dimension a owl:DatatypeProperty ;
    rdfs:domain :Collection ; rdfs:range xsd:integer ;
    rdfs:comment "The locked embedding dimension; ingests with a different dimension are rejected." .

:payloadKey a owl:DatatypeProperty ;
    rdfs:domain :Document ; rdfs:range xsd:string ;
    rdfs:comment "A metadata key; private path-like keys are stripped on ingest and on set_payload." .
"""


def list_resources() -> list[dict[str, Any]]:
    """MCP ``resources/list`` payload: the ontology plus the two
    machine-readable governance sidecars (skill catalog, tool-schema
    fingerprints), addressed under the server's own URI scheme."""
    return [
        {
            "uri": "vector-mcp-spark://ontology/vector.ttl",
            "name": "vector.ttl",
            "mimeType": "text/turtle",
            "description": "RDF ontology of the engine's collection / document / "
            "index / query concepts (reference ontology/vector.ttl parity).",
        },
        {
            "uri": "vector-mcp-spark://skills/catalog.json",
            "name": "skills-catalog",
            "mimeType": "application/json",
            "description": "The agent-card skill catalog: tool ids, action "
            "lists, and descriptions (reference skills/*/SKILL.md parity).",
        },
        {
            "uri": "vector-mcp-spark://schema/tool-fingerprints.json",
            "name": "tool-schema-fingerprints",
            "mimeType": "application/json",
            "description": "Stable hashes of each tool's calling schema for "
            "client compatibility pinning.",
        },
    ]


def read_resource(uri: str) -> dict[str, Any] | None:
    """MCP ``resources/read`` payload, or None for an unknown uri."""
    import json as _json

    if uri == "vector-mcp-spark://ontology/vector.ttl":
        text, mime = ONTOLOGY_TTL, "text/turtle"
    elif uri == "vector-mcp-spark://skills/catalog.json":
        from vector_mcp_spark.agent_card import SKILL_CATALOG

        text, mime = _json.dumps(list(SKILL_CATALOG), indent=2), "application/json"
    elif uri == "vector-mcp-spark://schema/tool-fingerprints.json":
        from vector_mcp_spark.connectors import tool_schema_fingerprints

        text, mime = _json.dumps(tool_schema_fingerprints(), indent=2), "application/json"
    else:
        return None
    return {"contents": [{"uri": uri, "mimeType": mime, "text": text}]}
