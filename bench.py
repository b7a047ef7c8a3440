"""Benchmark harness: runs the declared query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {name: sec}, "sf"}.

Each query is materialized through the noop sink so the full plan executes
(count() would let Catalyst prune the expensive columns away).

The suite runs TWICE: an untimed warm pass, then the timed pass that is
reported. A two-pass probe (82 queries, sf0.1, local[32]) measured 124.7 s
cold vs 92.8 s warm with no per-query slowdown anywhere in pass 2 — i.e.
~32 s of a cold run is one-time JVM JIT / whole-stage-codegen compilation,
Python-worker spin-up, and streaming-machinery init, billed to whichever
query happens to touch each codepath first. That attribution is an artifact
of suite *ordering* (it reshuffles whenever registration order rotates for
correctness-window coverage), so the steady-state pass is the comparable
per-query signal.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from vector_mcp_spark.session import get_spark
    from vector_mcp_spark.suite import SUITE

    spark = get_spark("vector_mcp_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # absorb session/JIT/read-path warm-up so it isn't billed to whichever
    # query happens to run first: a shuffle, a parquet scan, an HOF fold,
    # and a window — the code paths the whole suite exercises
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").selectExpr(
        "aggregate(sequence(0, 9), 0L, (a, x) -> a + x) AS s"
    ).groupBy("s").count().collect()
    # spin up the Python/Arrow worker pool so the first pandas-UDF query in
    # suite order isn't billed the ~1.5 s daemon startup
    try:
        import pandas as _pd
        from pyspark.sql import functions as _F

        _plus = _F.pandas_udf(lambda s: s + 1, "long")
        spark.range(1000).select(_plus("id")).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    # run the flagship once at the smallest SF: warms the vectorized parquet
    # reader, broadcast-join, HOF-cosine, and window codepaths end to end
    try:
        SUITE["semantic_topk"].spark_fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass  # warm-up is best-effort; never fail the bench

    # Failure-isolated: one broken query must never zero the whole perf
    # signal — record its error and keep timing the rest of the suite.
    # Pass 0 is the untimed warm pass (see module docstring); pass 1 is
    # the reported steady-state run.
    # Canonical ALPHABETICAL execution order, independent of SUITE's
    # registration order: registration rotates every round for correctness-
    # window coverage, and r6 showed per-query times moving >2x with no code
    # change when the rotation reshuffled who runs early — a fixed order
    # (plus the warm pass) makes per-query numbers comparable across rounds.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for timed in (False, True):
        for name, entry in sorted(SUITE.items()):
            if name in errors:
                continue  # failed in the warm pass; don't pay for it twice
            t0 = time.perf_counter()
            try:
                df = entry.spark_fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                if timed:
                    timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    print(line)
    # The driver keeps only the last 2000 chars of stdout; with 130+ queries
    # the JSON line outgrows that, so also persist the full result in-repo —
    # tools/bench_compare.py reads these for the per-round regression ritual.
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_LOCAL_LAST.json").write_text(line)
    except OSError:
        pass  # read-only checkout must not fail the bench
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
