"""Bucketed co-located joins — the shuffle-free join story at scale.

SURVEY §9 claims upserts/joins go shuffle-free when both sides are bucketed
by the join key; this proves it on the physical plan: two tables bucketed
by the same key join with ZERO Exchange operators, while the same join on
plain parquet shuffles both sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_mcp_spark.suite import load

SF_DIR = "/root/testdata/sf0.001"


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    docs = load(spark, SF_DIR, "documents")
    embs = load(spark, SF_DIR, "embeddings")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("b_docs")
    embs.withColumnRenamed("vec_id", "doc_id").write.bucketBy(8, "doc_id").sortBy(
        "doc_id"
    ).mode("overwrite").saveAsTable("b_embs")
    yield
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_embs")


def test_bucketed_join_is_shuffle_free(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table("b_docs").join(spark.table("b_embs"), "doc_id").select(
            "doc_id", "lang", F.size("embedding").alias("d")
        )
        assert _exchanges(joined) == 0  # bucket layout IS the partitioning
        assert joined.count() == 500

        plain = load(spark, SF_DIR, "documents").join(
            load(spark, SF_DIR, "embeddings").withColumnRenamed("vec_id", "doc_id"), "doc_id"
        )
        assert _exchanges(plain) >= 2  # both sides shuffle without buckets
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_is_shuffle_free(spark, warehouse):
    agg = spark.table("b_docs").groupBy("doc_id").agg(F.count("*").alias("n"))
    assert _exchanges(agg) == 0
    assert agg.count() == 500


# -- Z-order layout keys ------------------------------------------------------


def test_zorder_key_interleaves_bits(spark):
    from vector_mcp_spark.operators.layout import zorder_key

    # corners of a 2-bit grid: (min,min)->0, (max,min)->0b0101, (min,max)->0b1010, (max,max)->0b1111
    df = spark.createDataFrame(
        [(0, 0.0), (3, 0.0), (0, 3.0), (3, 3.0)], "a int, b double"
    )
    got = {
        (r.a, r.b): r.zkey for r in zorder_key(df, ["a", "b"], bits=2).collect()
    }
    assert got[(0, 0.0)] == 0b0000
    assert got[(3, 0.0)] == 0b0101   # a occupies even bit positions
    assert got[(0, 3.0)] == 0b1010   # b occupies odd bit positions
    assert got[(3, 3.0)] == 0b1111


def test_zorder_improves_file_skipping_locality(spark):
    """The point of Z-order: files cut from a z-sorted layout have tighter
    per-column min/max ranges than arrival order, so a filter on EITHER
    column prunes more files. Compare total per-file range span over
    equal-size file cuts."""
    from pyspark.sql import Window

    from vector_mcp_spark.operators.layout import zorder_key

    rows = [((i * 37) % 100, float((i * 53) % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "a int, b double")
    keyed = zorder_key(df, ["a", "b"], bits=8)

    def span_sum(ordered_col):
        files = (
            keyed.withColumn(
                "_file",
                F.floor(
                    (F.row_number().over(Window.orderBy(ordered_col)) - 1) / 200
                ),
            )
            .groupBy("_file")
            .agg(
                (F.max("a") - F.min("a")).alias("sa"),
                (F.max("b") - F.min("b")).alias("sb"),
            )
        )
        r = files.agg(F.sum("sa").alias("a"), F.sum("sb").alias("b")).first()
        return r.a, r.b

    za, zb = span_sum(F.col("zkey"))
    ra, rb = span_sum(F.monotonically_increasing_id())
    # z-sorted files must be much tighter on both dimensions than arrival order
    assert za < ra * 0.6 and zb < rb * 0.6
