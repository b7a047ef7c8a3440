"""Distributed skyline (Pareto frontier) over numeric criteria.

The preference-query operator (Börzsönyi 2001, public): keep the rows no
other row dominates (≥ on every maximized dimension, > on at least one).
Skylines are DISTRIBUTIVE — the skyline of a union is a subset of the
union of partition skylines — which gives the classic two-phase plan:

1. local skyline per partition (Arrow-batched mapInPandas; a sort-based
   O(n log n) scan for 2-D, pairwise for higher dims over the already
   per-partition-bounded set);
2. global skyline of the unioned local skylines on one partition — the
   candidate set is Σ per-partition skyline sizes, typically tiny (for
   uniformly random dims the expected skyline is O(log^{d-1} n)).

Anti-monotone domination means phase 1 can only over-keep, never lose a
true skyline point, so the two-phase result is exact.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _skyline_mask_2d(vals) -> list[int]:
    """Exact 2-D skyline row indices in O(n log n): sort by x desc, a
    point survives iff its y equals its x-group's max AND that max beats
    the running max over strictly larger x (equal criterion vectors all
    survive — nothing strictly dominates its equal)."""
    import numpy as np

    order = np.lexsort((-vals[:, 1], -vals[:, 0]))
    keep: list[int] = []
    best_before = -float("inf")
    i = 0
    n = len(order)
    while i < n:
        j = i
        x = vals[order[i], 0]
        while j < n and vals[order[j], 0] == x:
            j += 1
        gmax = vals[order[i], 1]  # sorted y desc within the x group
        if gmax > best_before:
            k = i
            while k < n and k < j and vals[order[k], 1] == gmax:
                keep.append(order[k])
                k += 1
            best_before = gmax
        i = j
    return keep


def _skyline_mask_nd(vals) -> list[int]:
    keep = []
    n = len(vals)
    for i in range(n):
        dominated = False
        for j in range(n):
            if j != i and (vals[j] >= vals[i]).all() and (vals[j] > vals[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(i)
    return keep


def _local_skyline(cols: list[str]):
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            cur = pd.concat([best, pdf]) if best is not None else pdf
            vals = cur[cols].to_numpy()
            keep = _skyline_mask_2d(vals) if len(cols) == 2 else _skyline_mask_nd(vals)
            best = cur.iloc[sorted(keep)]
        if best is not None and len(best):
            yield best

    return run


def skyline(df: DataFrame, maximize: list[str], id_col: str) -> DataFrame:
    """Exact Pareto frontier maximizing every column in ``maximize``.

    Duplicate criterion vectors: all copies survive (none strictly
    dominates its equal), matching the NOT EXISTS formulation the oracle
    uses. Output schema is (id_col, *maximize) with the criteria cast to
    double — join back on id_col for payload columns. Rows with a NULL
    criterion carry no preference information and are dropped up front
    (a NaN would also wedge the 2-D sort-scan's group loop)."""
    if not maximize:
        raise ValueError("skyline: maximize must name at least one column")
    proj = df.select(id_col, *[F.col(c).cast("double").alias(c) for c in maximize])
    for c in maximize:
        proj = proj.where(F.col(c).isNotNull() & ~F.isnan(c))
    schema = proj.schema
    local = proj.mapInPandas(_local_skyline(list(maximize)), schema)
    # phase 2: the candidate set is the union of partition skylines —
    # small by construction — so one partition finishes it exactly
    return local.repartition(1).mapInPandas(_local_skyline(list(maximize)), schema)
