"""Interpolated bigram language-model scoring (CCNet-style, one level up).

``corpus_unigram_logprob`` (suite_pipeline.py) scores docs against the
corpus's own unigram model; real CCNet uses an n-gram LM. This is the
distributable middle step: a Jelinek–Mercer interpolated bigram model
estimated from the corpus itself,

    P(w2 | w1) = lam * c(w1 w2)/c(w1) + (1 - lam) * c(w2)/N

scored as the mean log-probability over each document's bigrams. All
counts come from two grouped passes over the same token explode; the score
join is bigram-keyed (co-partitioned, map-side partial upstream). Every
document bigram exists in the corpus counts by construction (the corpus
contains the document), so the join is inner and no smoothing floor is
needed for the self-scoring case — hold-out scoring would left-join with
an OOV floor instead. Public technique (Jelinek & Mercer 1980); no
reference counterpart (the reference delegates quality scoring entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.functions.text import tokens


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # pre-filter docs with < 2 tokens: slice(arr, 1, n-1) with n = 0 is an
    # illegal negative length and would abort the whole job for one empty
    # doc (the dedup.py:159 hazard); such docs have no bigrams anyway
    base = docs.select(F.col(id_col), tokens(text_col).alias("_toks")).where(
        F.size("_toks") >= 2
    )
    arr = F.col("_toks")
    n = F.size(arr)
    return base.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(F.slice(arr, 1, n - 1).alias("w1"), F.slice(arr, 2, n - 1).alias("w2"))
        ).alias("b"),
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))


def bigram_interpolated_logprob(
    docs: DataFrame, lam: float = 0.7, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc mean interpolated bigram log-prob: (id, n_bigrams, avg_logprob).

    Docs with fewer than two tokens have no bigrams and drop out (no
    score is defined for them); the mean log-prob rounds at 4 dp — it is a
    quotient of an order-dependent float sum, the rounding class where
    cross-engine 6 dp comparisons flake (the TWAP precedent).
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"bigram_interpolated_logprob: lam must be in (0, 1), got {lam}")
    ex = docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    uni = ex.groupBy("tok").agg(F.count("*").alias("c"))
    total = uni.agg(F.sum("c").alias("n"))
    bg = _doc_bigrams(docs, id_col, text_col)
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bg.join(bi, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(total))
        .withColumn(
            "lp",
            F.log(
                F.lit(lam) * F.col("c12") / F.col("c1")
                + F.lit(1.0 - lam) * F.col("c2") / F.col("n")
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


def bigram_heldout_logprob(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score held-out documents against a bigram model of a REFERENCE
    corpus — the actual CCNet shape (train on the reference, rank the
    candidates by perplexity): (id, n_bigrams, avg_logprob, ppl).

    Unseen mass is handled by add-one smoothing on the unigram backoff,
    P_uni(w) = (c(w) + 1) / (N + V + 1), with V the train vocabulary size
    (the +1 in the denominator is the OOV class), so every eval bigram has
    positive probability:

        P(w2 | w1) = lam * c12/c1  [0 when w1 or the pair is unseen]
                   + (1 - lam) * P_uni(w2)

    Model joins are left joins with coalesce-to-zero — an eval token never
    has to exist in the model. ppl = exp(-avg_logprob)."""
    if not 0.0 < lam < 1.0:
        raise ValueError(f"bigram_heldout_logprob: lam must be in (0, 1), got {lam}")
    ex = train_docs.select(F.explode(tokens(text_col)).alias("tok"))
    uni = ex.groupBy("tok").agg(F.count("*").alias("c"))
    consts = uni.agg(
        F.sum("c").alias("n_train"), F.count("*").alias("v_train")
    )
    bi = (
        _doc_bigrams(train_docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    eg = _doc_bigrams(eval_docs, id_col, text_col)
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    p_bi = F.coalesce(F.col("c12") / F.col("c1"), F.lit(0.0))
    p_uni = (F.coalesce(F.col("c2"), F.lit(0)) + 1.0) / (
        F.col("n_train") + F.col("v_train") + 1.0
    )
    scored = (
        eg.join(bi, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .join(F.broadcast(consts))
        .withColumn("lp", F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.avg("lp").alias("_alp"),
    )
    return agg.select(
        id_col,
        "n_bigrams",
        F.round("_alp", 4).alias("avg_logprob"),
        F.round(F.exp(-F.col("_alp")), 4).alias("ppl"),
    )
