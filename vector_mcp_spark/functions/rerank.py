"""Deterministic rerank scorer — the offline twin of RemoteRerankClient.

``rerank_score_col`` maps (content, query) → a stable pseudo-relevance
score in [0, 1): the top 15 hex chars of sha256(content || '|rr|' || query)
scaled by 2^60. It plays the role the deterministic hash embedder plays
for the embedding seam — a stand-in whose exact values an ANSI-SQL oracle
replays (DuckDB: ``CAST('0x' || substring(sha256(...), 1, 15) AS BIGINT) /
2^60``), so the full shortlist → rerank pipeline is value-verified even
though the container has no cross-encoder model. ``rerank_score_py`` is
the Python twin used by tests and recorded-transport fakes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = float(2**60)
_SEP = "|rr|"


def rerank_score_col(content: Column | str, query: str) -> Column:
    content = F.col(content) if isinstance(content, str) else content
    h = F.conv(
        F.substring(F.sha2(F.concat(content, F.lit(_SEP + query)), 256), 1, 15), 16, 10
    ).cast("double")
    return h / F.lit(_SCALE)


def rerank_score_py(content: str, query: str) -> float:
    digest = hashlib.sha256((content + _SEP + query).encode("utf-8")).hexdigest()
    return int(digest[:15], 16) / _SCALE


def rerank_sql(content_expr: str, query_sql_literal: str) -> str:
    """The DuckDB expression computing the same score (query literal must
    already be SQL-quoted)."""
    return (
        f"CAST('0x' || substring(sha256({content_expr} || '|rr|' || "
        f"{query_sql_literal}), 1, 15) AS BIGINT) / {_SCALE!r}"
    )
