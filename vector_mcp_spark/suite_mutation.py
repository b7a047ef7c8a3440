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


# -- S1-S4 + T8 + §2.5: the engine/catalog surface as one declared query ----
#
# The DDL/catalog ops (create, get-or-create, overwrite, list, delete,
# duplicate guard, confirm gate, dimension lock) have no table-in/table-out
# shape, so the declared query RUNS the real CollectionEngine against a
# scratch root and returns the observable end state + the stable error codes
# each guard raised — all deterministic, so a VALUES oracle replays it.
# Reference: vector_api.py:413-476, postgres.py:150-186, qdrant.py:176-189.

_LIFECYCLE_ORACLE = """
SELECT * FROM (VALUES
  ('alpha_docs', '2'),
  ('beta_docs', '0'),
  ('collections', 'alpha,beta'),
  ('dim_drift', 'collection_vector_schema_mismatch'),
  ('dup_guard', 'document_exists'),
  ('gamma_exists', 'false'),
  ('no_confirm', 'delete_not_confirmed')
) AS t(item, detail)
"""


@register("engine_lifecycle", _LIFECYCLE_ORACLE, "engine", "parity")
def q_engine_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from vector_mcp_spark.engine import CollectionEngine
    from vector_mcp_spark.validation import EngineError

    root = tempfile.mkdtemp(prefix="vm_lifecycle_")

    def _code(fn):
        try:
            fn()
            return "no_error"
        except EngineError as e:
            return e.code

    try:
        eng = CollectionEngine(spark, root)
        eng.create_collection("alpha", dimension=8)
        eng.create_collection("beta", dimension=4)
        eng.create_collection("gamma")
        # 3 contents, 1 in-batch exact dup → 2 stored rows
        eng.add_documents("alpha", ["doc one", "doc two", "doc one"])
        dup = _code(lambda: eng.add_documents("alpha", ["doc one"], upsert=False))
        drift = _code(lambda: eng.create_collection("alpha", dimension=16))
        noconf = _code(lambda: eng.delete_collection("gamma"))
        eng.add_documents("beta", ["to be dropped"])
        eng.create_collection("beta", overwrite=True)  # overwrite drops docs
        eng.delete_collection("gamma", confirm=True)
        rows = [
            ("alpha_docs", str(eng.read("alpha").count())),
            ("beta_docs", str(eng.read("beta").count())),
            ("collections", ",".join(eng.get_collections())),
            ("dim_drift", drift),
            ("dup_guard", dup),
            ("gamma_exists", str(eng.collection_exists("gamma")).lower()),
            ("no_confirm", noconf),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "item string, detail string")


# -- collection aliases (qdrant update_collection_aliases parity) --------------
#
# An alias is a second name every read/search/mutation resolves through;
# re-pointing it is the atomic blue-green switch (build "green" offline,
# re-point "prod", drop "blue" — queries never see a half-built table).
# DDL never follows aliases and a live collection name always shadows one.
# Driver-side catalog ops → deterministic VALUES oracle, like
# engine_lifecycle above.

_ALIASES_ORACLE = """
SELECT * FROM (VALUES
  ('alias_conflict', 'alias_conflicts_with_collection'),
  ('alias_gone_after_drop', 'alias_not_found'),
  ('aliases_after_switch', 'prod->green'),
  ('ddl_via_alias', 'collection_not_found'),
  ('mutation_via_alias', '2'),
  ('read_via_alias_blue', 'blue doc'),
  ('read_via_alias_green', 'green doc')
) AS t(item, detail)
"""


@register("collection_aliases", _ALIASES_ORACLE, "engine", "parity")
def q_collection_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from vector_mcp_spark.engine import CollectionEngine
    from vector_mcp_spark.validation import EngineError

    root = tempfile.mkdtemp(prefix="vm_aliases_")

    def _code(fn):
        try:
            fn()
            return "no_error"
        except EngineError as e:
            return e.code

    try:
        eng = CollectionEngine(spark, root)
        eng.create_collection("blue")
        eng.create_collection("green")
        eng.add_documents("blue", ["blue doc"])
        eng.add_documents("green", ["green doc"])
        eng.create_alias("prod", "blue")
        via_blue = eng.read("prod").first().content
        eng.add_documents("prod", ["second blue doc"])  # mutates blue
        n_blue = eng.count_documents("blue")
        eng.create_alias("prod", "green")  # blue-green switch
        via_green = eng.read("prod").first().content
        conflict = _code(lambda: eng.create_alias("blue", "green"))
        ddl = _code(lambda: eng.delete_collection("prod", confirm=True))
        listed = ",".join(f"{a}->{t}" for a, t in eng.list_aliases())
        eng.delete_collection("green", confirm=True)
        gone = _code(lambda: eng.delete_alias("prod"))
        rows = [
            ("alias_conflict", conflict),
            ("alias_gone_after_drop", gone),
            ("aliases_after_switch", listed),
            ("ddl_via_alias", ddl),
            ("mutation_via_alias", str(n_blue)),
            ("read_via_alias_blue", via_blue),
            ("read_via_alias_green", via_green),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "item string, detail string")


# -- collection snapshots (qdrant create_snapshot / recover parity) ------------
#
# Freeze a collection into a portable dir (manifest + table partitions +
# changelog), keep mutating the source, restore the frozen state under a
# new name — with the dimension lock and time-travel history intact.

_SNAPSHOT_ORACLE = """
SELECT * FROM (VALUES
  ('bad_snapshot', 'snapshot_invalid'),
  ('independent_after_add', '3,3'),
  ('restore_clobber', 'collection_exists'),
  ('restored_dim_lock', 'collection_vector_schema_mismatch'),
  ('restored_docs', '2'),
  ('restored_history_batches', '1'),
  ('snapshots_after_delete', '0'),
  ('src_docs_after', '3')
) AS t(item, detail)
"""


@register("collection_snapshot", _SNAPSHOT_ORACLE, "engine", "parity")
def q_collection_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from vector_mcp_spark.engine import CollectionEngine
    from vector_mcp_spark.validation import EngineError

    root = tempfile.mkdtemp(prefix="vm_snapshot_")

    def _code(fn):
        try:
            fn()
            return "no_error"
        except EngineError as e:
            return e.code

    try:
        eng = CollectionEngine(spark, root)
        eng.create_collection("src", dimension=4)
        eng.add_documents("src", ["frozen one", "frozen two"])
        snap = eng.create_snapshot("src")
        eng.add_documents("src", ["post-snapshot doc"])
        eng.restore_snapshot(snap, "restored")
        dim_lock = _code(
            lambda: eng.add_documents("restored", ["bad vec"], embeddings=[[1.0, 2.0]])
        )
        clobber = _code(lambda: eng.restore_snapshot(snap, "src"))
        bad = _code(lambda: eng.restore_snapshot(tempfile.mkdtemp(), "x"))
        n_hist = eng.collection_history("restored").count()
        n_restored = eng.count_documents("restored")
        eng.add_documents("restored", ["only in restored"])
        independent = f"{eng.count_documents('restored')},{eng.count_documents('src')}"
        eng.delete_snapshot(snap.rsplit("/", 1)[-1])
        rows = [
            ("bad_snapshot", bad),
            ("independent_after_add", independent),
            ("restore_clobber", clobber),
            ("restored_dim_lock", dim_lock),
            ("restored_docs", str(n_restored)),
            ("restored_history_batches", str(n_hist)),
            ("snapshots_after_delete", str(len(eng.list_snapshots()))),
            ("src_docs_after", str(eng.count_documents("src"))),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "item string, detail string")
