"""Distributed PCA primitives: covariance + power-iteration top component.

The reference's vector stores treat embeddings as opaque payloads; a
training-data engine wants spectrum diagnostics (anisotropy, dominant
direction) and cheap linear compression. Everything here is built so ANSI
SQL can replay it (the suite carries full value oracles):

* ``embedding_covariance`` — population covariance cell table (i, j, cov),
  rounded to 6 dp. Two physical strategies with identical output:
  - explode form (default): posexplode twice → (i, j, xi·xj) rows, one
    hash aggregate. Map-side partial agg collapses each task to ≤dim²
    rows, so the shuffle is KB-sized regardless of corpus size; the ×dim²
    row expansion is compute, not network.
  - ``via_pandas=True`` (the 100 TB path): per-partition numpy outer-
    product accumulation in mapInPandas — each Arrow batch contributes one
    dim×dim partial (same trick as Spark MLlib's RowMatrix Gramian), then
    a dim²-row final agg. Use when dim² × corpus-rows compute dominates.
* ``top_pc_power_iteration`` — a FIXED number of power-iteration steps on
  the (rounded) covariance from the deterministic start v₀ = 1/√dim.
  The matrix is dim²-sized — corpus-independent — so it iterates on the
  driver under the same bounded-collect contract as the k-means centroids
  (operators/similarity.py). Rounding the covariance to 6 dp BEFORE
  iterating makes both engines iterate identical inputs, so the unrolled
  SQL replay agrees to well under the output rounding.

Power iteration (Mises–Geiringer 1929) and PCA are public knowledge; no
reference-repo counterpart (citation: absence — reference README's query
surface stops at similarity search).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    df: DataFrame, emb_col: str = "embedding", dim: int | None = None, via_pandas: bool = False
) -> DataFrame:
    """Population covariance cells: (i, j, cov) for all i, j (0-based),
    cov rounded to 6 dp. ``dim`` is required for the pandas path."""
    base = df.select(F.col(emb_col).cast("array<double>").alias("v"))
    if via_pandas:
        if dim is None:
            raise ValueError("embedding_covariance: dim is required when via_pandas=True")
        return _covariance_pandas(base, dim)
    ex = base.select("v", F.posexplode("v").alias("i", "xi"))
    pairs = ex.select("i", "xi", F.posexplode("v").alias("j", "xj"))
    mom = pairs.groupBy("i", "j").agg(
        F.sum(F.col("xi") * F.col("xj")).alias("sxy"), F.count("*").alias("n")
    )
    means = (
        base.select(F.posexplode("v").alias("i", "xi"))
        .groupBy("i")
        .agg(F.avg("xi").alias("mu"))
    )
    mi = means.select(F.col("i").alias("i"), F.col("mu").alias("mu_i"))
    mj = means.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    return (
        mom.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            F.round(F.col("sxy") / F.col("n") - F.col("mu_i") * F.col("mu_j"), 6).alias("cov"),
        )
    )


def _covariance_pandas(base: DataFrame, dim: int) -> DataFrame:
    """Per-partition Gramian accumulation: each Arrow batch emits one
    flattened dim×dim partial plus the coordinate sums, so the shuffle is
    a handful of dim²-length rows per partition."""
    import numpy as np
    import pandas as pd

    def acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy())
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        if n:
            yield pd.DataFrame({"g": [g.ravel().tolist()], "s": [s.tolist()], "n": [n]})

    partials = base.mapInPandas(acc, "g array<double>, s array<double>, n long")
    # dim²-sized final combine: explode the partials, sum element-wise
    gi = partials.select(F.posexplode("g").alias("k", "gk"), "n").groupBy("k").agg(
        F.sum("gk").alias("g")
    )
    si = partials.select(F.posexplode("s").alias("i", "si")).groupBy("i").agg(
        F.sum("si").alias("s")
    )
    total = partials.agg(F.sum("n").alias("n"))
    mi = si.crossJoin(F.broadcast(total)).select("i", (F.col("s") / F.col("n")).alias("mu_i"))
    mj = mi.select(F.col("i").alias("j"), F.col("mu_i").alias("mu_j"))
    return (
        gi.crossJoin(F.broadcast(total))
        .select(
            (F.col("k") / dim).cast("int").alias("i"),
            (F.col("k") % dim).alias("j"),
            (F.col("g") / F.col("n")).alias("exixj"),
        )
        .join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i", "j", F.round(F.col("exixj") - F.col("mu_i") * F.col("mu_j"), 6).alias("cov")
        )
    )


def top_pc_power_iteration(
    cov: DataFrame, dim: int, iters: int = 8
) -> tuple[list[float], float]:
    """Fixed-step power iteration on a rounded covariance cell table.

    Collects the dim² cells (bounded, corpus-independent) and iterates
    from v₀ = 1/√dim. Returns (loadings, rayleigh_eigenvalue), unrounded —
    callers round for presentation. Deterministic: fixed start, fixed step
    count, covariance pre-rounded at 6 dp by ``embedding_covariance``."""
    import numpy as np

    if not 1 <= iters <= 64:
        raise ValueError(f"top_pc_power_iteration: iters must be in [1, 64], got {iters}")
    c = np.zeros((dim, dim))
    for r in cov.collect():
        c[r.i][r.j] = r.cov
    v = np.full(dim, 1.0 / math.sqrt(dim))
    for _ in range(iters):
        w = c @ v
        nrm = float(np.sqrt((w * w).sum()))
        if nrm == 0.0:
            break
        v = w / nrm
    lam = float(v @ c @ v)
    return [float(x) for x in v], lam
