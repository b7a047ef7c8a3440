"""Categorical association measures: chi-square crosstab and PMI collocations.

Governance-side analytics for corpus composition: is `lang` independent of
`source`? which token adjacencies are real collocations? Both are exact
one-pass aggregates — contingency cells / bigram counts are tiny relative
to the corpus, so everything after the first groupBy is broadcast-sized.
Pearson chi-square and PMI (Church & Hanks 1990) are public statistics; no
reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.functions.text import tokens


def crosstab_chi2(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square independence test over two categorical columns:
    one row (n, r, c, chi2, dof, cramers_v). Cells aggregate map-side;
    expected counts come from broadcast marginals. Structural zeros matter:
    the statistic sums over the FULL r×c category grid (a zero cell
    contributes its whole expected count), so the observed cells left-join
    onto the marginals' cross product."""
    cells = df.groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b")).agg(
        F.count("*").alias("o")
    )
    ra = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    # countDistinct ignores NULL, but NULL is a level of the table — add it
    # back so r/c (and the dof / Cramér denominator) count the NULL row/col
    tot = cells.agg(
        F.sum("o").alias("n"),
        (F.countDistinct("a") + F.max(F.col("a").isNull().cast("int"))).alias("r"),
        (F.countDistinct("b") + F.max(F.col("b").isNull().cast("int"))).alias("c"),
    )
    grid = ra.crossJoin(cb).alias("g")  # marginals are category-count-sized
    # null-safe match: NULL is a legitimate category level — a plain
    # equi-join would leave NULL-keyed observed counts permanently at 0
    # while their marginal mass still inflates the expected counts.
    # (grid derives from cells, so the self-join needs explicit aliases.)
    obs = cells.alias("c")
    cond = F.col("g.a").eqNullSafe(F.col("c.a")) & F.col("g.b").eqNullSafe(F.col("c.b"))
    e = (
        grid.join(obs, cond, "left")
        .select(
            F.col("g.a").alias("a"),
            F.col("g.b").alias("b"),
            "ra",
            "cb",
            F.coalesce(F.col("c.o"), F.lit(0)).alias("o"),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("exp", F.col("ra") * F.col("cb") / F.col("n"))
        .withColumn("cell", F.pow(F.col("o") - F.col("exp"), 2) / F.col("exp"))
    )
    return e.groupBy("n", "r", "c").agg(F.sum("cell").alias("chi2_raw")).select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("int").alias("r"),
        F.col("c").cast("int").alias("c"),
        F.round("chi2_raw", 6).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("int").alias("dof"),
        F.when(
            F.least(F.col("r") - 1, F.col("c") - 1) > 0,
            F.round(
                F.sqrt(
                    F.col("chi2_raw") / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                6,
            ),
        ).alias("cramers_v"),  # NULL for a single-level column (V undefined)
    )


def collocation_pmi(
    docs: DataFrame, min_count: int = 5, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k adjacency collocations by pointwise mutual information:
    PMI(w1, w2) = ln(c12 · N / (c1 · c2)) over corpus bigram counts,
    restricted to bigrams seen ≥ min_count times. Ties break on (w1, w2).

    Counts reuse the one token explode; the unigram join is vocab-sized
    (AQE-broadcast while it fits). TakeOrdered top-k — no global sort."""
    if min_count < 1 or k < 1:
        raise ValueError(f"collocation_pmi: min_count and k must be >= 1, got ({min_count}, {k})")
    # filter < 2-token docs BEFORE slicing: slice length n-1 < 0 aborts the
    # job for a single empty doc (same guard as lm._doc_bigrams)
    base = docs.select(tokens(text_col).alias("_toks")).where(F.size("_toks") >= 2)
    arr = F.col("_toks")
    n_ = F.size(arr)
    bg = base.select(
        F.explode(
            F.arrays_zip(F.slice(arr, 1, n_ - 1).alias("w1"), F.slice(arr, 2, n_ - 1).alias("w2"))
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12")).where(
        F.col("c12") >= min_count
    )
    uni = (
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    total = uni.agg(F.sum("c").alias("n"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c12").alias("pair_count"),
            F.round(
                F.log(F.col("c12") * F.col("n") / (F.col("c1") * F.col("c2"))), 6
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )
