"""vector_mcp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference vector-MCP service
(collection management, bounded ingestion, semantic / lexical / hybrid-RRF
retrieval), re-expressed Spark-first for 100 TB scale.

Design stance (see SURVEY.md §7):

- Collections are columnar Parquet tables + a ``_catalog`` table, not
  row-stores (reference: ``vector_mcp/vectordb/base.py:12-24`` stores whole
  documents as rows in external engines).
- Every search operator is a *lazy DataFrame plan* — the reference's fixed
  Python pipeline (``vector_mcp/vector_api.py:518-566``) becomes a Catalyst
  DAG with pushdown, column pruning, and whole-stage codegen for free.
- No RDDs; Python only at Arrow-batched seams (embedding model calls).
"""

from vector_mcp_spark.engine import CollectionEngine
from vector_mcp_spark.session import get_spark


def __getattr__(name):
    # heavier surfaces load lazily so `import vector_mcp_spark` stays cheap
    if name == "VectorSearchApi":
        from vector_mcp_spark.api import VectorSearchApi

        return VectorSearchApi
    if name == "McpVeneer":
        from vector_mcp_spark.mcp import McpVeneer

        return McpVeneer
    if name == "AgentCardVeneer":
        from vector_mcp_spark.agent_card import AgentCardVeneer

        return AgentCardVeneer
    raise AttributeError(name)


__all__ = ["CollectionEngine", "get_spark", "VectorSearchApi", "McpVeneer", "AgentCardVeneer"]
__version__ = "0.1.0"
