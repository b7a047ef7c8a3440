"""Transactional-format MERGE seam — the 100 TB mutation upgrade path.

The engine's default mutation story is partition-pruned rewrite over plain
Parquet (`engine.py _rewrite_partitions`): correct and bounded, but a
rewrite is not atomic across concurrent writers and rewrites whole partition
directories. On a production lake the same T7/T9 semantics (reference:
pg ``ON CONFLICT DO UPDATE`` ``postgres.py:262-276``, mongo
``ReplaceOne(upsert=True)`` ``mongodb.py:216-227``) map to a transactional
table format's MERGE/DELETE — Delta Lake or Apache Iceberg, both of which
give ACID commits, file-level (not directory-level) rewrites, and
concurrent-writer safety.

This module is that seam, feature-flagged because neither format's runtime
jar ships in this environment:

- ``transactional_format()`` reads the ``VECTOR_MCP_SPARK_TABLE_FORMAT``
  env gate (unset/``parquet`` → None → callers keep the rewrite path).
- ``merge_into_sql`` / ``delete_where_sql`` build the exact ANSI
  ``MERGE INTO`` / ``DELETE FROM`` statements Spark executes against a v2
  transactional catalog — pure functions, unit-tested offline.
- ``merge_upsert`` / ``merge_delete`` run them, first probing that the
  session can actually plan a v2 MERGE; a missing runtime fails with the
  stable code ``table_format_unavailable`` instead of an AnalysisException
  traceback.

Scale: MERGE on Delta/Iceberg shuffles the (small) source side against only
the target files whose min/max id ranges overlap the batch — the same
pruning the parquet path does manually with hash-prefix directories, minus
the directory-granularity rewrite and plus snapshot isolation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from vector_mcp_spark.validation import EngineError

_FORMATS = ("delta", "iceberg")


def transactional_format(env: dict | None = None) -> str | None:
    """The feature gate: None (default) keeps the parquet rewrite path."""
    env = env if env is not None else dict(os.environ)
    fmt = (env.get("VECTOR_MCP_SPARK_TABLE_FORMAT") or "").strip().casefold()
    if not fmt or fmt == "parquet":
        return None
    if fmt not in _FORMATS:
        raise EngineError("table_format_unsupported")
    return fmt


def qualified_table(fmt: str, table_path: str) -> str:
    """Path-addressed v2 table identifier (``delta.`/path```); Iceberg
    deployments usually use a catalog name, which works here too since the
    caller can pass ``catalog.db.table`` as ``table_path``."""
    if "." in table_path and "/" not in table_path:
        return table_path  # already a catalog identifier
    return f"{fmt}.`{table_path}`"


def merge_into_sql(target: str, source_view: str, id_col: str = "id") -> str:
    """The T7 upsert as one ANSI MERGE: same-id rows replaced, new ids
    inserted — identical semantics to ``mutation.upsert``."""
    return (
        f"MERGE INTO {target} AS t\n"
        f"USING {source_view} AS s\n"
        f"ON t.{id_col} = s.{id_col}\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def delete_where_sql(target: str, source_view: str, id_col: str = "id") -> str:
    """The T9 delete as a subquery DELETE (id set is batch-bounded)."""
    return (
        f"DELETE FROM {target}\n"
        f"WHERE {id_col} IN (SELECT {id_col} FROM {source_view})"
    )


def _runtime_available(spark: SparkSession, fmt: str) -> bool:
    """Can this session plan v2 DML for `fmt`? Probe the extension wiring
    rather than importing format-specific Python packages."""
    cls = "io.delta.tables.DeltaTable" if fmt == "delta" else "org.apache.iceberg.Table"
    try:
        # Class.forName raises ClassNotFoundException when the runtime jar is
        # absent; a bare `spark._jvm.io...` attribute walk never raises (py4j
        # returns a JavaPackage placeholder), so it can't be the probe
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def merge_upsert(
    spark: SparkSession, fmt: str, table_path: str, updates: DataFrame, id_col: str = "id"
) -> None:
    """Execute the transactional T7 upsert, or fail with a stable code."""
    if not _runtime_available(spark, fmt):
        raise EngineError("table_format_unavailable")
    view = "_merge_src"
    updates.createOrReplaceTempView(view)
    spark.sql(merge_into_sql(qualified_table(fmt, table_path), view, id_col))


def merge_delete(
    spark: SparkSession, fmt: str, table_path: str, ids: DataFrame, id_col: str = "id"
) -> None:
    """Execute the transactional T9 delete, or fail with a stable code."""
    if not _runtime_available(spark, fmt):
        raise EngineError("table_format_unavailable")
    view = "_delete_src"
    ids.createOrReplaceTempView(view)
    spark.sql(delete_where_sql(qualified_table(fmt, table_path), view, id_col))
