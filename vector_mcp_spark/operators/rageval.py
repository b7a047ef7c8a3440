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


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: list[int],
    k: int,
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """MRL truncation report (Kusupati et al. 2022, Matryoshka
    Representation Learning): for each prefix dimensionality in ``dims``,
    rank the corpus by cosine over only the FIRST d components and measure
    recall@k against the full-dimension exact ranking — the storage/recall
    trade curve that decides how many dims a 100 TB index must keep.

    Returns one row per dim: (dim, n_queries, mean_recall_at_k), where
    mean_recall = sum(hits) / (n_queries * k) — an integer-sum quotient, so
    no float-accumulation order can move it. The full dimension itself is
    the gold ranking (its row reads 1.0 — a built-in sanity check).

    Scale shape: per-dim scoring is the broadcast-queries map-side pass of
    ``cosine_self_join_topk`` (the slice prunes flops AND, with a columnar
    prefix layout, read bytes); rankings are |queries|·k rows; the recall
    join and groupBy are metric-sized, independent of corpus bytes.
    """
    from vector_mcp_spark.operators.similarity import cosine_self_join_topk

    full_dim = max(dims)
    actual = corpus.select(F.size(F.col(emb_col)).alias("d")).first()
    if actual is not None and actual.d != full_dim:
        # without this, "recall vs the full-dimension exact ranking" would
        # silently mean recall vs a TRUNCATED gold (whose own row reads a
        # meaningless 1.0) whenever the caller forgets the full width
        raise ValueError(
            f"max(dims)={full_dim} must equal the embedding dimensionality "
            f"({actual.d}) — the largest prefix is the gold ranking"
        )
    rankings = None
    for d in dims:
        sliced_q = queries.select(
            F.col(id_col), F.slice(F.col(emb_col), 1, d).alias(emb_col)
        )
        sliced_c = corpus.select(
            F.col(id_col), F.slice(F.col(emb_col), 1, d).alias(emb_col)
        )
        r = cosine_self_join_topk(
            sliced_q, sliced_c, k=k, id_col=id_col, emb_col=emb_col
        ).select(F.lit(d).alias("dim"), "query_id", "neighbor_id")
        rankings = r if rankings is None else rankings.unionByName(r)
    # Referenced twice below (as itself and as the gold slice): without a
    # leaf here the gold branch re-runs the full-dim scoring pass — one
    # whole extra corpus scan per call. The frame is metric-sized
    # (≤ |dims|·|queries|·k rows), so the materialization is bounded at
    # any corpus scale (r13, guide §2.4 multi-branch rule).
    rankings = rankings.localCheckpoint(eager=True)
    gold = rankings.where(F.col("dim") == full_dim).select(
        F.col("query_id").alias("_gq"), F.col("neighbor_id").alias("_gn")
    )
    hits = rankings.join(
        gold,
        (F.col("query_id") == F.col("_gq")) & (F.col("neighbor_id") == F.col("_gn")),
        "left",
    )
    n_q = queries.count()
    return (
        hits.groupBy("dim")
        .agg(F.sum(F.col("_gn").isNotNull().cast("long")).alias("_hits"))
        .select(
            "dim",
            F.lit(n_q).cast("long").alias("n_queries"),
            F.round(F.col("_hits") / F.lit(float(n_q * k)), 6).alias("mean_recall_at_k"),
        )
    )
