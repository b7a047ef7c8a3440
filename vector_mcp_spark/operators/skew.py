"""Skew-mitigation helpers: explicit salting for hot keys.

AQE's skew-join splitting (on in `session.py`) handles skewed JOINS at
runtime; skewed AGGREGATIONS over non-combinable functions still need
manual salting — one hot key (a bot user, an empty-string token) otherwise
pins its whole group on one task. These helpers make the two-phase pattern
a named operator instead of folklore.

Exactness: the salt is a pure function of the distinct-counted value, so
every value lands in exactly ONE (key, salt) bucket — phase-2 sums of
phase-1 distinct counts are exact, not approximate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str, n_salts: int = 8, out: str = "_salt") -> DataFrame:
    """Deterministic salt bucket derived from ``from_col`` (xxhash64 pmod
    n). Append to groupBy/join keys to spread one hot key over ``n_salts``
    tasks; aggregate per (key, salt) first, then merge per key."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(from_col)), F.lit(n_salts)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: replicate the small side ``n_salts`` times and
    spread the big side's hot keys over ``n_salts`` reducers.

    AQE's skew splitting handles MOST skewed joins at runtime; the manual
    form still matters when (a) the skew is known and extreme (one bot user
    = 30% of a 100 TB fact table pins one task), and (b) the small side is
    too big to broadcast, so the join is sort-merge and one merge task
    drowns. The big side's salt derives deterministically from
    ``salt_from`` (any well-distributed column — an event id), the small
    side carries every salt value, so each big row matches its partner
    exactly once: the result is row-identical to the unsalted join at the
    cost of an ``n_salts``× small-side replication.

    Only ``inner`` and ``left``/``left_outer`` are row-identical: a right or
    full outer join would emit every unmatched small-side row once per salt
    replica, so those modes are rejected rather than silently wrong.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left'|'left_outer', got {how!r}: "
            "outer modes would duplicate unmatched small-side rows n_salts times"
        )
    b = with_salt(big, salt_from, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = b.join(s, (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]), how)
    return out.drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    distinct_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per key, skew-proof.

    Phase 1 dedups + counts within (key, salt-of-value) — a hot key's work
    spreads over ``n_salts`` reducers; phase 2 sums the per-salt counts
    (exact: each distinct value belongs to exactly one salt). Output column:
    ``n_distinct``.
    """
    keys = list(key_cols)
    salted = with_salt(df.select(*keys, distinct_col), distinct_col, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.countDistinct(distinct_col).alias("_partial")
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias("n_distinct"))
