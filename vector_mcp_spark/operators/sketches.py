"""Deterministic cardinality sketches for 100 TB-scale aggregation.

``approx_count_distinct`` (HLL++) is Spark's built-in answer, but its
estimates are engine-specific — no cross-engine oracle can check them. KMV
(k-minimum-values, Bar-Yossef et al. 2002) gets the same O(k) memory /
mergeable-sketch properties from an engine-agnostic primitive: keep the k
smallest sha256 hashes of the distinct values; if fewer than k distinct
values exist the count is exact, otherwise estimate (k-1) / fraction(k-th
smallest hash). Because the hash is sha256 and the k-min selection is a
plain rank, DuckDB replays the estimate bit-for-bit — a *deterministic*
approximate operator (approximate in accuracy, exact as a function of the
data). The reference has no sketch surface (SURVEY.md §2.4); this is the
north-star extension a training-data pipeline uses for distinct-user /
distinct-document dashboards where exact COUNT(DISTINCT) shuffles too much.

Scale shape: one shuffle on (group, value) for the distinct, one narrow
rank window over ≤ k rows per group retained — the (group, hash) rows that
cross the wire are bounded by k per group after the rank filter, vs the
full value set for exact distinct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: fits a signed long exactly, matching the DuckDB
# replay (CAST('0x' || substring(sha256(v), 1, 15) AS BIGINT))
_HASH_BITS = 60


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per group: KMV-estimated distinct count of ``value_col``.

    Returns (group_cols…, n_kept, est_distinct) where ``n_kept`` = number
    of retained minimum hashes (< k ⇒ the estimate is exact) and
    ``est_distinct`` = the rounded KMV estimate.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    group_cols = list(group_cols)
    h = F.conv(F.substring(F.sha2(F.col(value_col).cast("string"), 256), 1, 15), 16, 10).cast(
        "long"
    )
    hashed = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    kept = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    frac = F.col("_kth").cast("double") / F.lit(float(2**_HASH_BITS))
    return (
        kept.groupBy(*group_cols)
        .agg(F.count("*").alias("n_kept"), F.max("_h").alias("_kth"))
        .select(
            *group_cols,
            F.col("n_kept").cast("int").alias("n_kept"),
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.round(F.lit(float(k - 1)) / frac))
            .cast("long")
            .alias("est_distinct"),
        )
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    presalt: int | None = None,
) -> DataFrame:
    """Per group: the KMV sketch itself — (group_cols…, ks) where ``ks`` is
    the ascending array of the ≤ k smallest value hashes. This is the
    MERGEABLE form: sketches roll up to coarser groupings losslessly
    (``kmv_merge``), the property that lets a 100 TB pipeline keep daily
    sketches and answer weekly/monthly distinct questions without
    re-scanning raw data.

    ``presalt=N`` computes the sketch in two phases — partial sketches per
    (group, hash-derived salt), then a lossless merge — so a heavy group's
    rank never funnels through ONE reducer (the plain window sends every
    distinct hash of a group to a single task: fine for thousands, a
    straggler for billions). The merge is exact (any global k-min hash is
    its own salt bucket's k-min), so the result is BIT-IDENTICAL to the
    single-phase sketch — callers flip it on for scale without touching
    any downstream estimate or oracle."""
    if k < 2:
        raise ValueError("k must be >= 2")
    group_cols = list(group_cols)
    h = F.conv(F.substring(F.sha2(F.col(value_col).cast("string"), 256), 1, 15), 16, 10).cast(
        "long"
    )
    hashed = df.select(*group_cols, h.alias("_h")).distinct()
    if presalt and presalt > 1:
        salted = hashed.withColumn("_salt", F.pmod(F.col("_h"), F.lit(presalt)))
        w1 = Window.partitionBy(*group_cols, "_salt").orderBy(F.col("_h").asc())
        partial = (
            salted.withColumn("_rn", F.row_number().over(w1))
            .where(F.col("_rn") <= k)
            .groupBy(*group_cols, "_salt")
            .agg(F.array_sort(F.collect_list("_h")).alias("ks"))
        )
        return kmv_merge(partial, group_cols, k=k)
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    kept = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return kept.groupBy(*group_cols).agg(F.array_sort(F.collect_list("_h")).alias("ks"))


def kmv_merge(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "ks",
    k: int = 64,
) -> DataFrame:
    """Merge fine-grained KMV sketches to a coarser grouping: union the
    retained hashes, keep the k smallest again. LOSSLESS: any hash among
    the global k smallest is necessarily among its own partition's k
    smallest, so the merged sketch equals the sketch computed directly on
    the union — merged estimates are bit-identical to direct ones."""
    group_cols = list(group_cols)
    ex = sketches.select(*group_cols, F.explode(sketch_col).alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    kept = ex.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return kept.groupBy(*group_cols).agg(F.array_sort(F.collect_list("_h")).alias(sketch_col))


def kmv_estimate(sketch_col: str = "ks", k: int = 64) -> F.Column:
    """Column expr turning a KMV sketch array into the distinct estimate:
    exact when the sketch holds fewer than k hashes."""
    n = F.size(sketch_col)
    frac = F.element_at(F.col(sketch_col), k).cast("double") / F.lit(float(2**_HASH_BITS))
    return (
        F.when(n < k, n.cast("double")).otherwise(F.round(F.lit(float(k - 1)) / frac))
    ).cast("long")


def kmv_set_estimates(
    pairs: DataFrame,
    a_col: str = "ks_a",
    b_col: str = "ks_b",
    k: int = 64,
) -> DataFrame:
    """Set algebra on pairs of KMV sketches: appends ``est_union`` and
    ``est_intersect`` (both BIGINT) to each row.

    The merged k smallest hashes of A ∪ B form a valid KMV sketch of the
    union, so ``est_union`` is the plain KMV estimate on it; the fraction
    of those merged hashes present in BOTH input sketches is an unbiased
    estimate of the Jaccard index, and ``est_intersect`` = ρ · est_union
    (Beyer et al., "On Synopses for Distinct-Value Estimation Under
    Multiset Operations", SIGMOD'07). Pure array expressions over already-
    tiny sketch rows — the 100 TB data never re-enters the picture; any
    pairwise overlap question is answered from k·8-byte sketches."""
    m = F.slice(F.array_sort(F.array_union(a_col, b_col)), 1, k)
    with_m = pairs.withColumn("_m", m)
    n = F.size("_m")
    union_est = (
        F.when(n < k, n.cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                / (F.element_at(F.col("_m"), k).cast("double") / F.lit(float(2**_HASH_BITS)))
            )
        )
        .cast("long")
    )
    with_union = with_m.withColumn("est_union", union_est)
    inter = F.size(F.array_intersect(F.array_intersect(F.col("_m"), F.col(a_col)), F.col(b_col)))
    inter_est = (
        F.when(n == 0, F.lit(0.0))
        .otherwise(
            F.round(
                inter.cast("double") * F.col("est_union").cast("double") / n.cast("double")
            )
        )
        .cast("long")
    )
    return with_union.withColumn("est_intersect", inter_est).drop("_m")


def _cms_bucket(value_col: str, row: int, width: int) -> F.Column:
    """Row-salted sha256 bucket — the d independent CMS hash functions."""
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.col(value_col).cast("string"), F.lit(f"|cms{row}")), 256), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of ``value_col`` frequencies: (row, bucket, cnt) —
    depth×width counters, the frequency twin of the KMV distinct sketch.

    Scale shape: explode to depth rows per input row, ONE hash-partitioned
    groupBy with map-side partial counts — the shuffle carries at most
    depth×width counter rows per partition regardless of input size, and
    sketches MERGE by adding counters (same rollup property as kmv_merge).
    sha256 bucketing keeps the whole structure engine-agnostic: DuckDB
    rebuilds the identical sketch, so estimates are deterministic."""
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cms_bucket(value_col, r, width).alias("bucket"))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_rb"))
        .select("_rb.row", "_rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each item's frequency from the sketch: min over the
    d counters it hashes into (classic CMS upper bound — overestimates only,
    never under). The sketch is depth×width rows — broadcast; the probe is
    a map-side join however large ``items`` is."""
    from pyspark.sql.functions import broadcast

    probes = items.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cms_bucket(value_col, r, width).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_rb"),
    ).select(value_col, "_rb.row", "_rb.bucket")
    return (
        probes.join(broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count"))
    )


def kmv_row_sample(df: DataFrame, id_col: str, k: int = 256) -> DataFrame:
    """Deterministic uniform row sample: the k rows whose sha256(id) ranks
    smallest — the sampling face of the KMV sketch. Same merge property
    (the k-min of a union is the k-min of per-shard k-mins), so per-shard
    samples roll up losslessly; downstream, exact statistics computed on the
    sample become mergeable estimates (quantiles, means) with ~1/sqrt(k)
    rank error. Plans as TakeOrderedAndProject — per-partition top-k plus a
    driver merge of k rows, never a global sort."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.sha2(F.col(id_col).cast("string"), 256)
    return df.withColumn("_kmv_h", h).orderBy("_kmv_h").limit(k).drop("_kmv_h")


def log_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    int_scale: int = 100,
    sub_bins: int = 4,
    strict: bool = True,
) -> DataFrame:
    """Mergeable log-spaced histogram sketch — the QUANTILE member of the
    sketch family (KMV = distinct, CMS = frequency, Bloom = membership):
    per group, (bin_id, cnt) rows over geometric bins with ``sub_bins``
    subdivisions per octave (relative bin width 2^(1/sub_bins) ≈ 19% at 4 —
    the HdrHistogram/DDSketch idea with a fixed relative error).

    Binning is INTEGER-EXACT, no libm: values scale to integers
    (``int_scale``, e.g. cents), the octave is the integer's bit length
    (``length(bin(c)) - 1`` — string ops, bit-identical in any engine), and
    the sub-bin is an integer division. A float log2 here would let two
    engines' last-ulp disagreement flip a boundary value's bin.

    Merging shards/days = summing cnt per (group, bin_id); bins per group
    are bounded by the value range (~sub_bins·64 max), so a year of daily
    sketches answers all-time quantiles without re-scanning raw data.

    ``strict`` (default) probes for non-positive values and raises — the
    geometric bins cover positives only; with ``strict=False`` such values
    clamp into the smallest bin (caller accepts the distortion).
    """
    if strict:
        # geometric bins only cover positives — folding zeros/negatives into
        # the smallest bin would silently corrupt every merged quantile
        # (DDSketch keeps a separate store for them; callers with such data
        # must split sign ranges first, or pass strict=False knowingly)
        bad = df.where(F.col(value_col) <= 0).limit(1).count()
        if bad:
            raise ValueError(
                f"log_histogram requires positive {value_col!r} values; "
                "split sign ranges or pass strict=False to clamp"
            )
    c = F.greatest(F.round(F.col(value_col) * int_scale).cast("long"), F.lit(1))
    e = (F.length(F.bin(c)) - 1).cast("long")
    # explicit floor of the double quotient: Spark's cast-to-long truncates
    # but DuckDB's rounds, so FLOOR on both sides is the only portable form
    # 2^e via pow: exact in double for any feasible e (≤52), matching the
    # oracle's (1 << e)::DOUBLE bit for bit; F.shiftleft only takes a
    # Python-int shift so it can't express a per-row exponent
    sub = (F.floor(c * sub_bins / F.pow(F.lit(2.0), e)) - sub_bins).cast("long")
    bin_id = (e * sub_bins + sub).cast("long")
    return (
        df.select(*group_cols, bin_id.alias("bin_id"))
        .groupBy(*group_cols, "bin_id")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: Sequence[str],
    ps: Sequence[float],
    int_scale: int = 100,
    sub_bins: int = 4,
) -> DataFrame:
    """Estimate quantiles from a ``log_histogram`` sketch: per group and
    probability p, find the first bin whose cumulative count reaches
    ``ceil(p·n)`` and interpolate linearly inside it. Output one row per
    (group, p): (…group, p, q_est), 6 dp. Window is partitioned per group
    over ≤ ~256 bins — never a data-sized sort."""
    from pyspark.sql import Window

    gc = list(group_cols)
    w = Window.partitionBy(*gc).orderBy("bin_id")
    cum = hist.select(
        *gc,
        "bin_id",
        "cnt",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy(*gc)).alias("_n"),
    )
    p_lits = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    probed = cum.select(*gc, "bin_id", "cnt", "_cum", "_n", p_lits).withColumn(
        "_target", F.ceil(F.col("p") * F.col("_n")).cast("long")
    )
    hit = (
        probed.where(F.col("_cum") >= F.col("_target"))
        .groupBy(*gc, "p")
        .agg(
            F.min(F.struct("bin_id", "cnt", "_cum", "_n", "_target")).alias("_h")
        )
        .select(*gc, "p", "_h.*")
    )
    e = F.floor(F.col("bin_id") / sub_bins)
    sub = F.col("bin_id") - e * sub_bins
    pow2e = F.pow(F.lit(2.0), e)
    lo = pow2e * (1.0 + sub / F.lit(float(sub_bins)))
    hi = pow2e * (1.0 + (sub + 1) / F.lit(float(sub_bins)))
    frac = (F.col("_target") - (F.col("_cum") - F.col("cnt"))) / F.col("cnt")
    return hit.select(
        *gc,
        "p",
        F.round((lo + (hi - lo) * frac) / int_scale, 6).alias("q_est"),
    )


# -- HyperLogLog (Flajolet et al. 2007) with a cross-engine-exact replay ------
#
# KMV above keeps k hashes per group; HLL keeps 2^b REGISTERS (max leading-
# zero run per hash bucket) — constant 2^b ints per group however many
# distinct values arrive, and two sketches merge by element-wise register
# max. Spark's approx_count_distinct is HLL++ but engine-private; this one
# is built from sha256 + integer ops both engines evaluate identically, so
# a DuckDB oracle replays the registers AND the estimate bit-for-bit.
#
# Hash layout: 36-bit sha prefix (9 hex chars — exact in doubles, so the
# oracle's arithmetic can't round); low b bits pick the register, the
# remaining 30 bits feed the rank rho = leading-zeros + 1 via
# length(bin(w)) (pure string/int, no float log2 edge cases).

_HLL_REMAIN_BITS = 36 - 6  # 30 usable bits with b=6 (m=64 registers)
_HLL_ALPHA_64 = 0.709  # Flajolet's alpha_m for m=64
# S = sum(2^-rho) over 64 registers, rho <= 31 → S*2^31 is an exact integer
_HLL_S_SCALE = 2**31


def hll_registers(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Per (group, register): the HLL register value (max rho). m=64
    registers (b=6). One shuffle on (group, register) — the aggregate is
    map-side partial, so executor output is ≤ 64 rows per group per task
    regardless of input size."""
    group_cols = list(group_cols)
    h = F.conv(
        F.substring(F.sha2(F.col(value_col).cast("string"), 256), 1, 9), 16, 10
    ).cast("long")
    w = (h / F.lit(64)).cast("long")  # h div 64: the 30 rank bits
    rho = F.when(w == 0, F.lit(_HLL_REMAIN_BITS + 1)).otherwise(
        F.lit(_HLL_REMAIN_BITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, F.pmod(h, F.lit(64)).alias("register"), rho.alias("_rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("_rho").cast("int").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Collapse (group, register, rho) rows into the HLL cardinality
    estimate: (group…, n_zero, s_scaled, est_distinct). Registers that
    never saw a value are implicit (64 - present) — they count as zero
    registers and contribute 2^0 to S. ``s_scaled`` = S * 2^31 is exact
    integer evidence (hash-stable across engines); the estimate applies
    Flajolet's small-range correction m*ln(m/V) when E <= 2.5m and V > 0,
    rounded to 2 dp (the only float-library op is that ln)."""
    group_cols = list(group_cols)
    m = 64
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s_present"),
    )
    s = F.col("_s_present") + (F.lit(m) - F.col("_present"))  # absent → 2^0
    v = (F.lit(m) - F.col("_present")).cast("int")
    e_raw = F.lit(_HLL_ALPHA_64 * m * m) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        v.alias("n_zero"),
        F.round(s * F.lit(_HLL_S_SCALE)).cast("long").alias("s_scaled"),
        F.round(est, 2).alias("est_distinct"),
    )


# -- t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
# using t-digests", 2019) — the mergeable QUANTILE sketch next to the
# cardinality (KMV/HLL/CMS) and log-histogram families ----------------------
#
# The streaming construction is order-dependent; this is the batch/sorted
# construction the paper's §2.2 describes, made DETERMINISTIC and therefore
# SQL-replayable: exact per-group ranks give each row its quantile
# q = (rank - 0.5)/n, the k1 arcsine scale function k(q) = asin(2q-1)/pi +
# 0.5 maps quantile space so centroid capacity shrinks toward the tails,
# and centroid id = floor(delta * k(q)) (the 6-dp-rounded key is the
# cross-engine float convention). Each (group, centroid) keeps (count,
# mean) — at most delta+1 centroids per group regardless of data size.

#: rows any digest-merge input can reach: 1024 source digests × (32+1)
#: centroids — the documented bound that lets the merge's single-task
#: ordered window pass the bounded-window rule honestly
TDIGEST_MERGE_CAP = 1024 * 33


def _tdigest_centroid(q: F.Column, delta: int) -> F.Column:
    import math

    key = F.round((F.asin(q * 2.0 - 1.0) / math.pi + 0.5) * delta, 6)
    return F.floor(key).cast("long")


def tdigest_build(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    delta: int = 32,
) -> DataFrame:
    """Per-group t-digest: (group…, centroid, cnt, mean_r). Means are
    rounded to 4 dp (the order-dependent-AVG convention). NULL values are
    excluded — they carry no quantile information.

    Scale shape: the per-group exact rank runs through
    operators/rank.py grouped_rank — bucketed two-phase, so a group never
    funnels into one window task (the naive per-group window probed 2.5×
    at 10× with 5 groups × 10× rows) — then a groupBy on
    (group, centroid); the output is ≤ delta+1 rows per group, so the
    digest, not the data, crosses every later stage."""
    from vector_mcp_spark.operators.rank import grouped_rank

    group_cols = list(group_cols)
    vals = df.where(F.col(value_col).isNotNull())
    ranked = grouped_rank(
        vals, value_col, group_cols, out_col="_rn", count_col="_n"
    )
    q = (F.col("_rn") - 0.5) / F.col("_n")
    return (
        ranked.withColumn("centroid", _tdigest_centroid(q, delta))
        .groupBy(*group_cols, "centroid")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg(value_col) + 0.0, 4).alias("mean_r"),
        )
    )


def tdigest_merge(
    centroids: DataFrame, delta: int = 32, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge digests: (group…, centroid, cnt, mean_r). The paper's merge —
    order the centroids by mean, give each its cumulative mid-quantile
    q = (cumw - w/2)/N, re-cluster through the same scale function, combine
    weighted means. With ``group_cols`` the merge runs independently per
    group (the streaming case: per-type batch digests fold into per-type
    digests). Input and output are digest-sized (≤ delta+1 rows per source
    digest), so the ordered windows rank a provably bounded set
    (TDIGEST_MERGE_CAP enforces it in-plan)."""
    group_cols = list(group_cols)
    # cnt joins the tie-break: rows tying on all three keys are identical,
    # so any residual order among them cannot change cumulative weights.
    # The cap is a loud contract, not a silent truncation: dropping
    # centroids would return a digest whose weights no longer sum to n
    # (every upper quantile silently wrong) — merge hierarchically instead
    # NOTE (r13): callers whose input is an expensive build lineage should
    # checkpoint it themselves (events_tdigest_quantiles does) — the
    # cap-check count() below otherwise re-executes that lineage. An
    # unconditional checkpoint HERE measured a net loss for the store-read
    # callers whose input is already a cheap parquet scan.
    n_in = centroids.count()
    if n_in > TDIGEST_MERGE_CAP:
        raise ValueError(
            f"tdigest_merge: {n_in} centroids exceeds TDIGEST_MERGE_CAP="
            f"{TDIGEST_MERGE_CAP}; merge in a tree (merge shards, then merge"
            " the merged digests)"
        )
    bounded = centroids.orderBy(
        *group_cols, "mean_r", "centroid", "cnt"
    ).limit(TDIGEST_MERGE_CAP)
    order = [F.col("mean_r").asc(), F.col("centroid").asc(), F.col("cnt").asc()]
    w = Window.partitionBy(*group_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    if group_cols:
        total = bounded.groupBy(*group_cols).agg(F.sum("cnt").alias("_t"))
        cum = bounded.withColumn("_cum", F.sum("cnt").over(w)).join(
            F.broadcast(total), group_cols
        )
    else:
        total = bounded.agg(F.sum("cnt").alias("_t"))
        cum = bounded.withColumn("_cum", F.sum("cnt").over(w)).crossJoin(
            F.broadcast(total)
        )
    q = (F.col("_cum") - F.col("cnt") / 2.0) / F.col("_t")
    # the weighted mean sums EXACT integers (means are 4-dp decimals, so
    # mean*10^4 is integral): the sum is order-independent, so the 4-dp
    # quotient can never flip on engine-specific float-sum order
    m_scaled = F.round(F.col("mean_r") * 10000.0).cast("long")
    # the weighted mean can land EXACTLY on a 4-dp half boundary (integer
    # numerator / integer weight), where Spark's ROUND (shortest-decimal
    # half-up) and an exact-binary round disagree — so round via
    # floor(x + 0.5) on the exactly-representable scaled quotient, the
    # cross-engine half-up convention
    num = F.sum(F.col("cnt") * m_scaled).cast("double")
    return (
        cum.withColumn("centroid2", _tdigest_centroid(q, delta))
        .groupBy(*group_cols, "centroid2")
        .agg(
            F.sum("cnt").alias("cnt"),
            (F.floor(num / F.sum("cnt") + 0.5) / 10000.0).alias("mean_r"),
        )
        .select(*group_cols, F.col("centroid2").alias("centroid"), "cnt", "mean_r")
    )
