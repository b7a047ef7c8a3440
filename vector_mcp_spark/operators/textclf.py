"""Hashed-n-gram linear text classifier — fastText-shape, map-side.

A large-scale curation pipeline scores every document with a cheap linear
classifier over hashed token features (quality gates, language/domain
routing — the fastText pattern: Joulin et al. 2016, "Bag of Tricks for
Efficient Text Classification"). The Spark-first re-expression trains
multinomial Naive Bayes weights (closed form — one groupBy over the
training tokens, no iterative optimizer) on sha-hashed token buckets, so
train AND score are each a bounded number of scans and the whole pipeline
replays as SQL for the oracle gate.

Shapes that survive 100 TB:

* the weight table is ≤ ``n_buckets × n_classes`` rows regardless of corpus
  size — broadcastable;
* scoring is explode(tokens) → map-side bucket hash → one equi-join against
  the broadcast weights → one groupBy(doc, class) partial-agg sum → per-doc
  argmax window (partitioned by doc, never global);
* no pairwise stage anywhere.

Cross-engine float discipline: class scores are sums of per-token logs
whose accumulation order differs between engines — scores are ROUNDed to
4 dp before the argmax (the established quotient-of-sums rule), ties break
to the lowest class id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_mcp_spark.functions.text import tokens

N_BUCKETS = 1024


def token_buckets(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """Explode ``text_col`` into sha-hashed token buckets (one row per
    token occurrence). Zero-token documents drop out — mirror any oracle
    with UNNEST, which does the same."""
    return df.select(
        *keep, F.explode(tokens(F.col(text_col))).alias("_tok")
    ).select(
        *keep,
        (
            F.conv(F.substring(F.sha2(F.col("_tok"), 256), 1, 4), 16, 10).cast("long")
            % N_BUCKETS
        ).alias("bucket"),
    )


def nb_train(
    train: DataFrame, text_col: str = "text", label_col: str = "label"
) -> tuple[DataFrame, DataFrame]:
    """Multinomial NB sufficient statistics over hashed buckets.

    Returns (counts, classes): ``counts`` = (label, bucket, cnt) token
    occurrences; ``classes`` = (label, tot tokens, prior = ln(docs_c/docs)).
    Laplace-smoothed weights are derived at scoring time directly from the
    counts — ln((cnt+1)/(tot+B)) — so absent (bucket, label) pairs need no
    dense materialization.
    """
    toks = token_buckets(train, text_col, label_col)
    counts = toks.groupBy(label_col, "bucket").agg(F.count("*").alias("cnt"))
    totals = toks.groupBy(label_col).agg(F.count("*").alias("tot"))
    n_docs = train.count()
    priors = train.groupBy(label_col).agg(
        F.log(F.count("*") / F.lit(float(n_docs))).alias("prior")
    )
    classes = totals.join(priors, label_col)
    return counts, classes


def nb_classify(
    test: DataFrame,
    counts: DataFrame,
    classes: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Per-document argmax class: (id, predicted, score). Every test token
    is scored against ALL classes (the bounded 10-row broadcast cross) with
    the Laplace default for unseen (bucket, class) pairs."""
    toks = token_buckets(test, text_col, id_col)
    cls = classes.select(F.col(label_col).alias("_cls"), "tot", "prior")
    cnts = counts.select(
        F.col(label_col).alias("_cls"), "bucket", "cnt"
    )
    scored = (
        toks.crossJoin(F.broadcast(cls))
        .join(F.broadcast(cnts), ["bucket", "_cls"], "left")
        .withColumn(
            "_w",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))
                / (F.col("tot") + F.lit(float(N_BUCKETS)))
            ),
        )
        .groupBy(id_col, "_cls")
        .agg(F.sum("_w").alias("_s"), F.first("prior").alias("_p"))
        .withColumn("score", F.round(F.col("_s") + F.col("_p"), 4))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("_cls").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("_cls").alias("predicted"), "score")
    )
