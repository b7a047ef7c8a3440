"""SparkSession factory tuned for the engine.

Local testing runs ``local[N]``; the conf below is chosen so the same code
scales to a multi-executor cluster:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting means a
  plan tuned at sf0.1 survives a 1000× scale-up without re-tuning.
- Arrow on: every Pandas-UDF seam (embedding calls, multimodal decode) moves
  data in columnar batches, not pickled rows.
- ``shuffle.partitions`` defaults small for local runs; AQE coalesces further.
  On a real cluster this is overridden to ~2-3× total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vector_mcp_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    # Pandas-UDF seams pickle module functions BY REFERENCE, so Python
    # workers must be able to import this package. Local-mode workers
    # inherit the driver process env — exporting the package's parent dir
    # on PYTHONPATH covers callers that found us via a sys.path entry the
    # fork won't see (e.g. an embedding host importing from a checkout).
    # On a real cluster this is a no-op; ship the wheel with --py-files.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
