from vector_mcp_spark.functions.vector import cosine_similarity, dot, l2_norm
from vector_mcp_spark.functions.text import TOKEN_PATTERN, tokens
from vector_mcp_spark.functions.hashing import content_hash_id
from vector_mcp_spark.functions.embedder import hash_embed

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "TOKEN_PATTERN",
    "tokens",
    "content_hash_id",
    "hash_embed",
]
