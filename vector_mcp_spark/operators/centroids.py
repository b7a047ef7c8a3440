"""Per-label embedding centroids and distance-to-centroid outlier scoring.

The embedding-space quality signal a training-data pipeline runs after
labeling/clustering: compute each label's mean vector, then rank that
label's members by cosine similarity to their own centroid — the least
similar members are mislabeled/outlier candidates for human review or
automatic pruning. The reference has no aggregate-over-vectors surface
(its vector ops are per-query search); this is a corpus-level extension
(SURVEY.md §2.4).

Scale shape: the centroid build is posexplode → groupBy(label, dim) —
partial aggregation (map-side combine) makes the shuffle O(labels × dims)
regardless of corpus size. Per-dim means are ROUNDed to 8 dp, absorbing
cross-engine/partition-order float-sum noise (the IVF k-means convention,
suite_pipeline._ann_ivf_oracle). The centroid table is labels-sized —
broadcast back for scoring, so the scoring pass is map-side too; the only
full shuffle is the final per-label top-k rank window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from vector_mcp_spark.functions.vector import cosine_similarity

_ROUND_DP = 8


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per label: (label, centroid array<double>) — per-dim mean, 8 dp."""
    ex = df.select(F.col(label_col), F.posexplode(emb_col).alias("i", "x"))
    means = ex.groupBy(label_col, "i").agg(
        F.round(F.avg(F.col("x").cast("double")), _ROUND_DP).alias("m")
    )
    return means.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def centroid_outliers(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per label: the k members LEAST cosine-similar to their label's
    centroid — (label, rank, id, score 6 dp), rank 1 = most outlying,
    ties pinned by id."""
    cents = label_centroids(df, label_col=label_col, emb_col=emb_col)
    scored = df.join(broadcast(cents), label_col).select(
        label_col,
        F.col(id_col),
        cosine_similarity(emb_col, "centroid").alias("sim"),
    )
    w = Window.partitionBy(label_col).orderBy(F.col("sim").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            label_col,
            F.col("rank").cast("int").alias("rank"),
            id_col,
            F.round("sim", 6).alias("score"),
        )
    )


def nearest_centroid_confusion(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    emb_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid classification self-eval: assign every vector to
    its most cosine-similar label centroid and report the confusion matrix
    (true_label, pred_label, n). The diagonal mass is a one-number check
    of label/embedding coherence before training on the labels.

    Centroids are labels-sized and broadcast; the assignment pass is
    map-side (|labels| similarities per row). Ties break on the smaller
    predicted label; the 8 dp centroid rounding (IVF k-means convention)
    keeps both engines assigning from identical inputs."""
    cents = label_centroids(df, label_col=label_col, emb_col=emb_col).select(
        F.col(label_col).alias("pred"), "centroid"
    )
    scored = df.select(id_col, label_col, emb_col).crossJoin(broadcast(cents)).withColumn(
        "sim", cosine_similarity(F.col(emb_col).cast("array<double>"), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("pred").asc())
    best = scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return best.groupBy(
        F.col(label_col).alias("true_label"), F.col("pred").alias("pred_label")
    ).agg(F.count("*").alias("n"))
