"""Declared mutation queries (SURVEY.md §2.2 T7-T10) expressed over the
driver's ``documents`` table so the DuckDB oracle can replay the same set
algebra: point lookup, delete-by-ids, upsert/MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_mcp_spark.operators.mutation import delete_by_ids, get_by_ids, upsert
from vector_mcp_spark.suite import load, register

_IDS = [3, 7, 11, 101, 202, 303]
_IDS_SQL = "(" + ", ".join(str(i) for i in _IDS) + ")"

# -- T10: get_documents_by_ids with include-projection ----------------------

_GET_ORACLE = f"""
SELECT doc_id, text, lang FROM documents WHERE doc_id IN {_IDS_SQL}
"""


@register("get_by_ids", _GET_ORACLE, "mutation", "parity")
def q_get_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return get_by_ids(docs, _IDS, id_col="doc_id", include=["text", "lang"])


# -- T9: delete_documents(ids) → remaining set ------------------------------

_DELETE_ORACLE = f"""
SELECT doc_id FROM documents WHERE doc_id NOT IN {_IDS_SQL}
"""


@register("delete_by_ids", _DELETE_ORACLE, "mutation", "parity")
def q_delete_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return delete_by_ids(docs, _IDS, id_col="doc_id").select("doc_id")


# -- T7: upsert/MERGE — update every doc_id % 97 == 0, insert one new row ---

_UPSERT_ORACLE = """
WITH upserts AS (
  SELECT doc_id, 'updated doc ' || CAST(doc_id AS VARCHAR) AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 97 = 0
  UNION ALL
  SELECT CAST(100000 AS BIGINT), 'brand new doc', 'en', 'manual', CAST(13 AS BIGINT)
),
merged AS (
  SELECT * FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM upserts u WHERE u.doc_id = d.doc_id)
  UNION ALL
  SELECT * FROM upserts
)
SELECT doc_id, text FROM merged WHERE doc_id % 97 = 0 OR doc_id >= 100000
"""


@register("upsert_merge", _UPSERT_ORACLE, "mutation", "parity")
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    updates = docs.where(F.col("doc_id") % 97 == 0).select(
        "doc_id",
        F.concat(F.lit("updated doc "), F.col("doc_id").cast("string")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    new_row = spark.createDataFrame(
        [(100000, "brand new doc", "en", "manual", 13)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    merged = upsert(docs, updates.unionByName(new_row), id_col="doc_id")
    return merged.where((F.col("doc_id") % 97 == 0) | (F.col("doc_id") >= 100000)).select(
        "doc_id", "text"
    )
