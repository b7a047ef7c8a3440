"""Maximal Marginal Relevance (MMR) diversified re-ranking.

Carbonell & Goldstein (SIGIR'98): greedily pick the candidate maximizing
``λ·relevance − (1−λ)·max_similarity_to_already_selected`` — the standard
diversified-retrieval layer over a vector search's top-n (the reference has
no diversification; this is a north-star extension of its Q1/Q2 surface).

Scale contract: MMR is inherently sequential in k, so it runs DRIVER-SIDE
over a **bounded candidate pool** (≤ ``MAX_POOL``, the engine's own top-k
bound) — the same shape as the reference's in-process RRF fusion loop
(``vector_mcp/vector_api.py:556-565``). The distributed work is producing
the pool (``semantic_topk`` — TakeOrderedAndProject over the full
collection); the greedy loop then touches k·n rounded similarities. A pool
above the bound raises ``mmr_pool_too_large`` rather than silently
collecting.

Determinism: relevance comes in rounded to 6 dp (the retrieval contract);
pairwise cosines are rounded to 6 dp; the combined MMR score is rounded to
6 dp; ties break on ascending id — so the greedy trajectory is an exact
function of the data and replayable as unrolled SQL (see
``suite_search.semantic_mmr_topk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from vector_mcp_spark.validation import EngineError

MAX_POOL = 1000
SCORE_DECIMALS = 6

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("relevance", T.DoubleType(), False),
        T.StructField("redundancy", T.DoubleType(), False),
        T.StructField("mmr_score", T.DoubleType(), False),
    ]
)


def mmr_rerank(
    pool: DataFrame,
    k: int,
    lam: float = 0.7,
    id_col: str = "id",
    emb_col: str = "embedding",
    rel_col: str = "score",
) -> DataFrame:
    """Greedy MMR over a bounded scored candidate pool.

    ``pool`` must be the (already ranked, ≤ MAX_POOL-row) output of a
    retrieval operator carrying ``(id, embedding, relevance score)``.
    Returns ``(rank, id, relevance, redundancy, mmr_score)`` where
    ``redundancy`` is the max rounded cosine to the earlier picks (0.0 for
    the first pick). The id column is stringified for a stable output
    schema across integer/string id collections.
    """
    import numpy as np

    if not 0.0 <= lam <= 1.0:
        raise EngineError("mmr_lambda_invalid")
    if not isinstance(k, int) or isinstance(k, bool) or k < 1:
        raise EngineError("number_results_invalid")
    rows = pool.select(id_col, emb_col, rel_col).limit(MAX_POOL + 1).collect()
    if len(rows) > MAX_POOL:
        raise EngineError("mmr_pool_too_large")
    spark = pool.sparkSession
    if not rows:
        return spark.createDataFrame([], _OUT_SCHEMA)

    ids = [r[0] for r in rows]
    embs = np.asarray([r[1] for r in rows], dtype=np.float64)
    rel = np.round(np.asarray([float(r[2]) for r in rows], dtype=np.float64), SCORE_DECIMALS)
    norms = np.sqrt((embs * embs).sum(axis=1))
    norms[norms == 0.0] = 1.0  # zero vectors: cosine defined as 0 via 0-dot
    n = len(ids)

    selected: list[int] = []
    out = []
    remaining = set(range(n))
    while len(selected) < min(k, n):
        best = None
        for i in sorted(remaining):
            if selected:
                sims = embs[selected] @ embs[i] / (norms[selected] * norms[i])
                red = float(np.max(np.round(sims, SCORE_DECIMALS)))
            else:
                red = 0.0
            ms = float(round(lam * float(rel[i]) - (1.0 - lam) * red, SCORE_DECIMALS))
            # ties: higher score first, then ascending id (ids are unique)
            key = (ms, _id_desc_key(ids[i]))
            if best is None or key > best[0]:
                best = (key, i, red, ms)
        _, i, red, ms = best
        selected.append(i)
        remaining.discard(i)
        out.append((len(selected), str(ids[i]), float(rel[i]), red, ms))
    return spark.createDataFrame(out, _OUT_SCHEMA)


class _id_desc_key:
    """Inverts id comparison so max() over (score, key) picks the SMALLEST
    id among equal scores, for both int and str ids."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __gt__(self, other):
        return self.v < other.v

    def __lt__(self, other):
        return self.v > other.v

    def __eq__(self, other):
        return self.v == other.v
