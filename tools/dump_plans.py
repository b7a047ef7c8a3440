"""Dump `.explain("formatted")` for named suite entries to files.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX entry [entry ...]

Writes OUT_DIR/<entry>_<SUFFIX>.txt (or OUT_DIR/<entry>.txt when SUFFIX is
'-'). Streaming/engine entries execute eagerly — the returned sink table's
plan says nothing about the data path — so they are skipped with a note.
Plans are built at sf0.001 (planning only; plan shape is SF-independent
modulo AQE runtime decisions, and these dumps show the initial plan)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"
SKIP_PREFIXES = ("streaming_", "engine_")


def main() -> int:
    out_dir, suffix, *entries = sys.argv[1:]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    from vector_mcp_spark.session import get_spark
    from vector_mcp_spark.suite import SUITE

    spark = get_spark(app_name="dump_plans")
    for name in entries:
        fname = f"{name}.txt" if suffix == "-" else f"{name}_{suffix}.txt"
        if name.startswith(SKIP_PREFIXES):
            print(f"{name}: SKIP (eager-executing entry)")
            continue
        df = SUITE[name].spark_fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        (out / fname).write_text(plan)
        print(f"{name}: {len(plan.splitlines())} lines -> {out / fname}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
