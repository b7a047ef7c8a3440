"""DSIR-style importance weights for targeted data selection.

Data Selection with Importance Resampling (Xie et al. 2023) scores raw web
documents by the log-likelihood ratio of a target-domain bag-of-hashed-
n-grams model over a raw-corpus model, then resamples by weight. This is
the distributable scoring half: hashed unigram buckets (sha-derived, so an
ANSI-SQL oracle replays them bit-for-bit), Laplace-smoothed bucket
distributions for the target slice vs the whole corpus, and a per-document
sum of per-token log ratios. Resampling afterwards is a weighted draw —
``operators/packing.weighted_sample`` already provides it.

Scale shape: one tokenize+explode pass; both distributions come from the
same grouped count (conditional aggregation — the target count is a
filtered sum, not a second scan); the bucket→log-ratio table is exactly
``n_buckets`` rows (bounded, broadcast) joined back map-side; one final
groupBy(doc) sums token ratios. Two shuffles on uniform keys, corpus-size
independent state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.functions.text import tokens
from vector_mcp_spark.operators.partition import spread


def _bucket(tok: Column, n_buckets: int) -> Column:
    h = F.conv(F.substring(F.sha2(tok, 256), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def importance_weights(
    docs: DataFrame,
    is_target: Column,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, weight) per document.

    ``weight`` = Σ_tokens [ln p_target(bucket(tok)) − ln p_raw(bucket(tok))]
    with add-``alpha`` smoothing over ``n_buckets`` hashed unigram buckets;
    ``is_target`` marks the rows defining the target distribution (the raw
    distribution is the whole input). Positive = target-like."""
    # spread: the tokenize + explode + sha-bucket map stage must not be pinned
    # to a single-partition scan (guide §2.5); no-op at real scale
    ex = spread(docs).select(
        F.col(id_col).alias("id"),
        is_target.cast("long").alias("t"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("bucket", _bucket(F.col("tok"), n_buckets))
    # bounded (≤ n_buckets rows) but referenced by BOTH the totals aggregate
    # and the ratios join — checkpoint so the tokenize chain behind it runs
    # once, not once per reference (the standing multi-branch rule)
    counts = ex.groupBy("bucket").agg(
        F.count("*").alias("c_raw"), F.sum("t").alias("c_tgt")
    ).localCheckpoint(eager=True)
    totals = counts.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    ratios = (
        counts.join(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("c_tgt") + alpha) / (F.col("n_tgt") + alpha * n_buckets))
                - F.log((F.col("c_raw") + alpha) / (F.col("n_raw") + alpha * n_buckets))
            ).alias("lr"),
        )
    )
    # bounded: ≤ n_buckets rows regardless of corpus size
    return (
        ex.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("weight"),
        )
    )
