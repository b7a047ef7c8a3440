"""Retrieval-evaluation metrics — the RAG-evaluation harness.

The reference exposes retrievers but no quality measurement; a user
operating its search surface (``vector_mcp/mcp_server.py:202-293``) tunes
k / thresholds blind. This operator closes the loop: given a SYSTEM ranking
(any retriever in this repo — ANN, BM25, hybrid, rerank) and a GOLD ranking
(exact cosine top-k, or human labels), it computes the standard IR metrics
per query — recall@k, MRR@k, NDCG@k — so retriever configurations can be
A/B-compared on corpus-scale runs.

Scale shape: both inputs are (query_id, rank, neighbor_id) frames of at
most |queries|·k rows — tiny relative to the corpus whatever the corpus
size — and the metric computation is one equi-join on (query_id,
neighbor_id) plus one groupBy(query_id), both map-side-combinable. The
order-sensitive DCG sum folds over a SORTED rank list (sort_array +
aggregate HOF) so the result is bit-deterministic regardless of partial-
aggregation order — the same fold a SQL oracle replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METRIC_DECIMALS = 6


def retrieval_metrics(
    system: DataFrame,
    gold: DataFrame,
    k: int,
    query_col: str = "query_id",
    rank_col: str = "rank",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query IR metrics of ``system`` against ``gold``.

    Both frames carry (query_col, rank_col, id_col); ``gold`` membership is
    what counts as relevant (binary gain). Returns one row per query:
    (query_id, n_gold, n_hits, recall_at_k, mrr_at_k, ndcg_at_k), metrics
    rounded to 6 dp. Queries present in ``gold`` but absent from ``system``
    score 0 on all three metrics.
    """
    g = gold.select(
        F.col(query_col).alias("query_id"), F.col(id_col).alias("_gold_id")
    )
    s = system.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(rank_col).alias("_rank"),
        F.col(id_col).alias("_sys_id"),
    )
    hits = s.join(
        g.withColumnRenamed("query_id", "_gq"),
        (s["query_id"] == F.col("_gq")) & (s["_sys_id"] == F.col("_gold_id")),
        "inner",
    ).select("query_id", "_rank")
    per_q_hits = hits.groupBy("query_id").agg(
        F.count("*").alias("n_hits"),
        F.min("_rank").alias("_first_hit"),
        # deterministic DCG: fold 1/log2(rank+1) over the SORTED hit ranks
        F.expr(
            "aggregate(sort_array(collect_list(_rank)), CAST(0.0 AS DOUBLE), "
            "(acc, r) -> acc + 1.0 / log2(CAST(r AS DOUBLE) + 1.0))"
        ).alias("_dcg"),
    )
    per_q_gold = g.groupBy("query_id").agg(F.count("*").alias("n_gold"))
    out = per_q_gold.join(per_q_hits, "query_id", "left").select(
        "query_id",
        "n_gold",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_gold"), METRIC_DECIMALS
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("_first_hit"), F.lit(0.0)), METRIC_DECIMALS
        ).alias("mrr_at_k"),
        # ideal DCG: all of the first least(n_gold, k) positions relevant
        F.round(
            F.coalesce(F.col("_dcg"), F.lit(0.0))
            / F.expr(
                f"aggregate(sequence(1, least(n_gold, {int(k)})), CAST(0.0 AS DOUBLE), "
                "(acc, r) -> acc + 1.0 / log2(CAST(r AS DOUBLE) + 1.0))"
            ),
            METRIC_DECIMALS,
        ).alias("ndcg_at_k"),
    )
    return out
