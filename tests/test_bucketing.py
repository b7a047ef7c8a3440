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
