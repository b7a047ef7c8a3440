"""Isolated per-query measurement for the optimization rounds.

For each named SUITE entry: run (fn + noop sink) REPS times after one warm
run, report min/median wall seconds plus the number of Spark jobs the timed
run launched (job-count is the local-mode overhead proxy: every job carries
fixed scheduling cost, so a query that launches 14 jobs for tiny frames is
paying overhead, not compute). Optionally dump .explain("formatted") to a
file per query.

Usage:
  python tools/opt_measure.py q1 q2 ...            # measure named queries
  python tools/opt_measure.py --plans DIR q1 ...   # also write DIR/<q>.txt
  python tools/opt_measure.py --reps 5 q1 ...
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    plans_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--plans":
            plans_dir = Path(args[i + 1])
            plans_dir.mkdir(parents=True, exist_ok=True)
            i += 2
        else:
            names.append(args[i])
            i += 1

    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from vector_mcp_spark.session import get_spark
    from vector_mcp_spark.suite import SUITE

    spark = get_spark("opt_measure")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # session warm-up matching bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        from pyspark.sql import functions as _F

        _plus = _F.pandas_udf(lambda s: s + 1, "long")
        spark.range(1000).select(_plus("id")).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    out = {}
    for name in names:
        if name not in SUITE:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        entry = SUITE[name]
        # warm (builds index caches, JIT)
        try:
            df = entry.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"!! {name} failed: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        walls = []
        jobs_seen = 0
        for r in range(reps):
            group = f"opt_{name}_{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = entry.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            jobs_seen = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("", "")
        if plans_dir is not None:
            try:
                plan = SUITE[name].spark_fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    SUITE[name].spark_fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    SUITE[name].spark_fn(spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            (plans_dir / f"{name}.txt").write_text(plan)
        rec = {
            "min": round(min(walls), 3),
            "median": round(statistics.median(walls), 3),
            "runs": [round(w, 3) for w in walls],
            "jobs": jobs_seen,
        }
        out[name] = rec
        print(f"{name:42s} min={rec['min']:7.3f} med={rec['median']:7.3f} jobs={rec['jobs']:3d} runs={rec['runs']}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
