"""Data-layout keys: Z-order (Morton) interleaving for multi-column locality.

Writing a 100 TB table sorted by a Z-order key clusters rows that are close
in EVERY keyed dimension into the same files, so min/max file statistics
prune scans filtered on any keyed column — the technique behind Delta/
Iceberg `OPTIMIZE ZORDER BY`. Spark-side it is just `sortWithinPartitions`
(or repartitionByRange) on this key at write time; the key itself is pure
bit arithmetic inside whole-stage codegen.

Normalization uses global min/max (two scalar aggregates, broadcast as a
1-row join — one extra pass, no shuffle of the data itself). Everything is
integer bit math after that, so the DuckDB oracle replays keys exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton-interleave the low ``bits`` of each (already-normalized)
    integer column: bit i of column j lands at position i*len(cols)+j."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            out = out + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            ).cast("long")
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Adds ``out_col``: the Morton key over ``cols`` (each min-max
    normalized to [0, 2^bits)). Sort or range-partition the write on this
    key to get multi-dimensional file clustering."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
        ]
    stats = df.agg(*aggs)
    with_stats = df.join(broadcast(stats))
    top = float(2**bits - 1)
    norm = []
    for c in cols:
        span = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        frac = F.when(span > 0, (F.col(c).cast("double") - F.col(f"_min_{c}")) / span).otherwise(
            F.lit(0.0)
        )
        norm.append(F.floor(frac * top).cast("long"))
    return with_stats.withColumn(out_col, _interleave(norm, bits)).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )
