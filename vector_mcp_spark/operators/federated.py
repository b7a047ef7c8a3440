"""Cross-collection federated search — one query fanned across many
collections, fused into a single globally-ranked result.

The reference searches exactly one collection per call
(``vector_mcp/mcp_server.py:202-293`` routes ``collection_name`` → one
backend table); a user with per-tenant / per-corpus collections has to
loop client-side and merge by hand. This operator does the fan-out and
fusion engine-side, in one distributed plan.

Scale design: the input is ONE frame with a collection column (on a real
deployment, a union of per-collection scans — Spark unions are free, no
data movement). Scoring is map-side; the per-collection top-k window
shuffles only (collection, id, score) — never payloads — partitioned BY
COLLECTION, so every collection ranks in parallel and no single reducer
sees the full corpus. The global fuse then ranks |collections|·k_per rows:
a driver-trivial TakeOrdered regardless of corpus size. Scores are raw
cosine, so cross-collection comparison is well-defined (same query vector,
same metric — unlike score fusion across heterogeneous retrievers, which
is ``hybrid.py``'s RRF job).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_mcp_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_lit,
    query_vector_lit,
)

SCORE_DECIMALS = 6


def federated_topk(
    docs: DataFrame,
    query_vec: Sequence[float],
    k_per_collection: int,
    n: int,
    collection_col: str = "collection",
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-``k_per_collection`` per collection, fused to a global top-``n``.

    Returns (collection, id-named col, score, collection_rank, rank): the
    global ranking plus each hit's rank within its own collection, ties
    pinned by (collection, id) so results are deterministic.
    """
    # The guard must run BEFORE ranking (NaN orders ABOVE every double in
    # desc() windows, so an unfiltered NaN row would consume quota and
    # top-n slots), and Catalyst pushes it below the score projection by
    # re-inlining the scoring expression into the Filter — with the
    # unrolled codegen'd cosine that meant THREE textual copies of the
    # 64-dim tree in one whole-stage region, overflowing janino's 64 KB
    # method limit and dropping the stage to interpreted (r14). The guard
    # therefore tests the HOF-fold cosine: bit-identical value (same
    # left-associative fold over the same widened floats), constant-size
    # expression, so the pushed predicate stays small and the projected
    # unrolled score is the region's only big tree — whole-stage codegen
    # compiles again.
    guard = cosine_similarity(F.col(emb_col), query_vector_lit(query_vec))
    scored = docs.where(guard.isNotNull() & ~F.isnan(guard)).select(
        F.col(collection_col).alias("collection"),
        F.col(id_col),
        cosine_similarity_lit(F.col(emb_col), query_vec).alias("_score"),
    )
    w_local = Window.partitionBy("collection").orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    local = scored.withColumn("collection_rank", F.row_number().over(w_local)).where(
        F.col("collection_rank") <= k_per_collection
    )
    # |collections|·k_per rows remain; TakeOrdered-then-rank: the global
    # top-n is a per-partition partial top-k + driver merge (TakeOrdered),
    # and only those n rows pass through the unpartitioned rank window
    fused = local.orderBy(
        F.col("_score").desc(), F.col("collection").asc(), F.col(id_col).asc()
    ).limit(n)
    w_global = Window.orderBy(
        F.col("_score").desc(), F.col("collection").asc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_global))
        .select(
            "collection",
            id_col,
            F.round("_score", SCORE_DECIMALS).alias("score"),
            "collection_rank",
            "rank",
        )
    )
